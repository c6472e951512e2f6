package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ClassifierFunctions => Cls, DedupFunctions => D, RelevanceFunctions => R, SamplingFunctions => Sam, SimilarityFunctions => S, TextFunctions => T, UrlFunctions => U}
import graft.ops.{AsOfJoinOps, CrossValidationOps, EventAnalyticsOps, FeatureOps, GraphOps, HistoryOps, MacroOps, RangeJoinOps, SkewOps, ValidationOps}


/** Shared helpers for the per-family query files: base frames
  * (prices-with-returns, documents, events, planted corpora), shared
  * DuckDB oracle CTE blocks, and the generated-oracle builders. Split
  * out of the former monolithic Queries.scala (r12 verdict item 6) —
  * no behavior change.
  */
private[queries] object QHelpers {

  import Q.{money2, prices, pricesSql, revenueDec, t}

  val wTicker = Window.partitionBy("ticker").orderBy("date")

  def pricesWithRet(s: SparkSession, dir: String): DataFrame =
    prices(t(s, dir, "lineitem"))
      .withColumn("ret", col("close") / lag("close", 1).over(wTicker) - 1)

  /** DuckDB CTE for [[pricesWithRet]], appended to [[Q.pricesSql]]. */
  val retSql: String =
    """, r AS (
      |  SELECT ticker, "date", close, volume,
      |         close / lag(close) OVER (PARTITION BY ticker ORDER BY "date") - 1 AS ret
      |  FROM prices
      |)""".stripMargin

  /** The "Alpha Vantage" stand-in: gross (undiscounted) daily revenue for
    * one supplier in ten — a small secondary source that genuinely
    * disagrees with the net-revenue `close` (reference S-3,
    * `/root/reference/src/validation.py:126-185`).
    */
  def grossSubset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").filter(col("l_suppkey") % 10 === 0)
      .groupBy(col("l_suppkey").as("ticker"), to_date(col("l_shipdate")).as("date"))
      .agg(money2(sum(col("l_extendedprice").cast("decimal(12,4)"))).as("close"))

  val grossSql: String =
    """, gross AS (
      |  SELECT l_suppkey AS ticker, CAST(l_shipdate AS DATE) AS "date",
      |         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS close
      |  FROM lineitem WHERE l_suppkey % 10 = 0 GROUP BY 1, 2
      |)""".stripMargin

  def docs(s: SparkSession, dir: String) = t(s, dir, "documents")

  /** Generated oracle for `cls4_logreg_dense`: unrolls
    * [[graft.functions.ClassifierFunctions.trainLogisticDense]]'s batch
    * GD exactly — the 6dp-pinned dense feature frame (t2's
    * n_tok/punct/stopword formula conventions; label = the doc_id%7
    * curated stand-in d20 established), then per step one gradient CTE
    * (each component a data-sized sum rounded 6dp) and one weight CTE
    * (each weight re-rounded 6dp after the update), dot products
    * written as the explicit left-to-right w0·x0 + w1·x1 + … sum (the
    * trainer's documented order contract), then final log-loss (ln,
    * 6dp after the sum) and accuracy (the exact z ≥ 0 form — no
    * transcendental on the decision path).
    */
  def logregOracle(iters: Int, lr: Double): String = {
    def zOf(w: String) =
      s"($w.w0 * f.x0 + $w.w1 * f.x1 + $w.w2 * f.x2 + $w.w3 * f.x3)"
    val ctes = Seq.newBuilder[String]
    ctes += """f AS MATERIALIZED (
              |  SELECT CASE WHEN doc_id % 7 = 0 THEN 1.0 ELSE 0.0 END AS y,
              |    1.0 AS x0,
              |    round(least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              |        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE)
              |      / 100.0, 1.0), 6) AS x1,
              |    round(CASE WHEN length(text) = 0 THEN 0.0
              |        ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
              |          / length(text) END, 6) AS x2,
              |    round(CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
              |          x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
              |      / len(regexp_split_to_array(lower(trim(text)), '\s+')), 6) AS x3
              |  FROM documents)""".stripMargin
    ctes += "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f)"
    ctes += "w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"
    for (r <- 1 to iters) {
      val z = zOf("w")
      ctes += s"""g$r AS MATERIALIZED (
                 |  SELECT round(SUM((1.0 / (1.0 + exp(-$z)) - f.y) * f.x0), 6) AS g0,
                 |         round(SUM((1.0 / (1.0 + exp(-$z)) - f.y) * f.x1), 6) AS g1,
                 |         round(SUM((1.0 / (1.0 + exp(-$z)) - f.y) * f.x2), 6) AS g2,
                 |         round(SUM((1.0 / (1.0 + exp(-$z)) - f.y) * f.x3), 6) AS g3
                 |  FROM f, w${r - 1} w)""".stripMargin
      ctes += s"""w$r AS (
                 |  SELECT round(w.w0 - $lr * g.g0 / n.n, 6) AS w0,
                 |         round(w.w1 - $lr * g.g1 / n.n, 6) AS w1,
                 |         round(w.w2 - $lr * g.g2 / n.n, 6) AS w2,
                 |         round(w.w3 - $lr * g.g3 / n.n, 6) AS w3
                 |  FROM w${r - 1} w, g$r g, n)""".stripMargin
    }
    val zF = zOf("w")
    ctes += s"""zf AS MATERIALIZED (
               |  SELECT f.y, $zF AS z FROM f, w$iters w)""".stripMargin
    ctes += s"""m AS (
               |  SELECT round(SUM(-y * ln(1.0 / (1.0 + exp(-z)))
               |      - (1.0 - y) * ln(1.0 - 1.0 / (1.0 + exp(-z)))) / n.n, 6) AS log_loss,
               |    round(SUM(CASE WHEN (z >= 0) = (y = 1.0) THEN 1.0 ELSE 0.0 END) / n.n, 6) AS accuracy,
               |    CAST(n.n AS BIGINT) AS n
               |  FROM zf, n GROUP BY n.n)""".stripMargin
    s"""WITH ${ctes.result().mkString(",\n")}
       |SELECT CAST(t.j AS BIGINT) AS feature_idx,
       |  CASE t.j WHEN 0 THEN w.w0 WHEN 1 THEN w.w1 WHEN 2 THEN w.w2 ELSE w.w3 END AS weight,
       |  m.log_loss, m.accuracy, m.n
       |FROM range(0, 4) t(j), w$iters w, m ORDER BY feature_idx""".stripMargin
  }

  /** Generated oracle for `s3b_ivf_trained`: replays the ENTIRE
    * trained-IVF pipeline — [[graft.functions.SimilarityFunctions
    * .trainCentroidsReplayable]]'s pinned Lloyd rounds (lowest-id init;
    * argmax raw cosine with lower-cid ties, the s3 oracle precedent;
    * per-dim EXACT-DECIMAL means rounded 6dp; empty cells keep their
    * centroid), then `buildCoarseIndex`'s driver Lloyd over the trained
    * centroids (stride init, raw-cosine assignment with lower-group
    * ties, 6dp-rounded double means — the round absorbs summation-order
    * ulps per the documented replay contract), then the hierarchical
    * search: corpus/query rank the coarse means, candidates come from
    * the `wProbe` nearest groups, assignment/probing by raw cosine with
    * lower-id ties, scored cosines rounded 6dp before the final rank.
    * Each round is one MATERIALIZED CTE (the g1/kCore unroll pattern).
    */
  def s3bOracle(k: Int, dim: Int, trainIters: Int,
      coarseCells: Int, coarseIters: Int, wProbe: Int, nProbe: Int,
      topK: Int): String = {
    val stride = math.max(1, k / coarseCells)
    val ctes = Seq.newBuilder[String]
    ctes += s"""e AS MATERIALIZED (
               |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               |  FROM embeddings)""".stripMargin
    ctes += s"""c0 AS MATERIALIZED (
               |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
               |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k))""".stripMargin
    for (r <- 1 to trainIters) {
      ctes += s"""a$r AS MATERIALIZED (
                 |  SELECT vec_id, v, cid AS cell FROM (
                 |    SELECT e.vec_id, e.v, c.cid,
                 |      row_number() OVER (PARTITION BY e.vec_id
                 |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
                 |    FROM e, c${r - 1} c) WHERE rn = 1)""".stripMargin
      ctes += s"""u$r AS MATERIALIZED (
                 |  SELECT cid, list(m ORDER BY d) AS mv FROM (
                 |    SELECT cell AS cid, t.d,
                 |      round(CAST(SUM(CAST(v[t.d] AS DECIMAL(20,10))) AS DOUBLE)
                 |        / count(*), 6) AS m
                 |    FROM a$r, range(1, ${dim + 1}) t(d) GROUP BY cell, t.d)
                 |  GROUP BY cid)""".stripMargin
      ctes += s"""c$r AS MATERIALIZED (
                 |  SELECT p.cid, COALESCE(u.mv, p.cv) AS cv
                 |  FROM c${r - 1} p LEFT JOIN u$r u USING (cid))""".stripMargin
    }
    val cF = s"c$trainIters"
    ctes += s"""m0 AS MATERIALIZED (
               |  SELECT g.d AS g, c.cv AS mv
               |  FROM range(0, $coarseCells) g(d) JOIN $cF c
               |    ON c.cid = (g.d * $stride) % $k)""".stripMargin
    for (cr <- 1 to coarseIters) {
      ctes += s"""ca$cr AS MATERIALIZED (
                 |  SELECT cid, cv, g FROM (
                 |    SELECT c.cid, c.cv, m.g,
                 |      row_number() OVER (PARTITION BY c.cid
                 |        ORDER BY list_cosine_similarity(c.cv, m.mv) DESC, m.g) AS rn
                 |    FROM $cF c, m${cr - 1} m) WHERE rn = 1)""".stripMargin
      ctes += s"""m$cr AS MATERIALIZED (
                 |  SELECT p.g, COALESCE(u.mv, p.mv) AS mv
                 |  FROM m${cr - 1} p LEFT JOIN (
                 |    SELECT g, list(m ORDER BY d) AS mv FROM (
                 |      SELECT g, t.d, round(SUM(cv[t.d]) / count(*), 6) AS m
                 |      FROM ca$cr, range(1, ${dim + 1}) t(d) GROUP BY g, t.d)
                 |    GROUP BY g) u USING (g))""".stripMargin
    }
    val fm = s"m$coarseIters"
    val fa = s"ca$coarseIters"
    ctes += s"""cg AS MATERIALIZED (
               |  SELECT vec_id, g FROM (
               |    SELECT e.vec_id, m.g,
               |      row_number() OVER (PARTITION BY e.vec_id
               |        ORDER BY list_cosine_similarity(e.v, m.mv) DESC, m.g) AS rn
               |    FROM e, $fm m) WHERE rn <= $wProbe)""".stripMargin
    ctes += s"""asg AS MATERIALIZED (
               |  SELECT vec_id, cid AS cell FROM (
               |    SELECT vec_id, cid,
               |      row_number() OVER (PARTITION BY vec_id
               |        ORDER BY list_cosine_similarity(v, cv) DESC, cid) AS rn
               |    FROM cg JOIN $fa USING (g) JOIN e USING (vec_id))
               |  WHERE rn = 1)""".stripMargin
    ctes += s"""qg AS MATERIALIZED (
               |  SELECT query_id, qv, g FROM (
               |    SELECT e.vec_id AS query_id, e.v AS qv, m.g,
               |      row_number() OVER (PARTITION BY e.vec_id
               |        ORDER BY list_cosine_similarity(e.v, m.mv) DESC, m.g) AS rn
               |    FROM e, $fm m WHERE e.vec_id < 8) WHERE rn <= $wProbe)""".stripMargin
    ctes += s"""probes AS MATERIALIZED (
               |  SELECT query_id, qv, cid AS cell FROM (
               |    SELECT qg.query_id, qg.qv, ca.cid,
               |      row_number() OVER (PARTITION BY qg.query_id
               |        ORDER BY list_cosine_similarity(qg.qv, ca.cv) DESC, ca.cid) AS rn
               |    FROM qg JOIN $fa ca USING (g)) WHERE rn <= $nProbe)""".stripMargin
    ctes += s"""scored AS (
               |  SELECT p.query_id, a.vec_id,
               |    round(list_cosine_similarity(ev.v, p.qv), 6) AS cosine
               |  FROM asg a JOIN e ev USING (vec_id)
               |  JOIN probes p ON a.cell = p.cell
               |  WHERE a.vec_id <> p.query_id)""".stripMargin
    ctes += s"""ranked AS (
               |  SELECT query_id, vec_id, cosine,
               |    CAST(row_number() OVER (PARTITION BY query_id
               |      ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
               |  FROM scored)""".stripMargin
    "WITH " + ctes.result().mkString(",\n") +
      s"""\nSELECT query_id, vec_id, cosine, "rank"
         |FROM ranked WHERE "rank" <= $topK
         |ORDER BY query_id, "rank"""".stripMargin
  }

  /** ntile(k) replayed arithmetically from a 1-based global rank and
    * the population count: the first n mod k buckets get ⌈n/k⌉ rows,
    * the rest ⌊n/k⌋ — bit-identical to the window ntile over the same
    * total order, with the rank supplied by
    * [[graft.ops.RankOps.withGlobalRank]] instead of a
    * single-partition window.
    */
  def ntileFromRank(rank: String, n: String, k: Int): Column = expr(
    s"""CAST(CASE WHEN $rank - 1 < ($n % $k) * (($n div $k) + 1)
       |  THEN ($rank - 1) div (($n div $k) + 1) + 1
       |  ELSE ($n % $k) + ($rank - 1 - ($n % $k) * (($n div $k) + 1))
       |    div ($n div $k) + 1 END AS INT)""".stripMargin)

  /** Shared RFM base for seg1/seg2: per-customer recency/frequency/
    * monetary plus exact ntile-5 quintile codes on each axis, with
    * total (metric, cust) tie-breaks. The three global rankings run
    * through [[graft.ops.RankOps.withGlobalRank]] (range-partitioned
    * sort + zipWithIndex) instead of single-partition ntile windows —
    * identical bucket assignment (the ntile fill rule is replayed
    * arithmetically from rank and n), but no task ever holds the
    * customer population. Columns: cust, recency_days (int),
    * frequency (long), _m (exact decimal monetary), r_q/f_q/m_q (int).
    */
  def rfmQuintiles(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey").as("cust"),
        to_date(col("o_orderdate")).as("_od"),
        col("o_totalprice").cast("decimal(14,2)").as("_tp"))
    val cust = o.groupBy("cust").agg(
      max(col("_od")).as("_last"), count(lit(1)).as("frequency"),
      sum(col("_tp")).as("_m"))
    // dataset horizon + population in ONE single-row aggregate,
    // broadcast onto every customer (no whole-frame window)
    val mxn = cust.agg(max(col("_last")).as("_mx"), count(lit(1)).as("_n"))
    // pinned: each of the three rankings evaluates its input three
    // times (range-boundary sampling pass + zipWithIndex count job +
    // the data pass) — unpinned that would re-run the orders aggregate
    // nine times
    val r = graft.Caches.trackedPersist(cust.crossJoin(broadcast(mxn))
        .withColumn("recency_days", datediff(col("_mx"), col("_last"))),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // three independent slim (cust, rank) frames joined back on cust —
    // chaining the rankings instead would nest the RDD lineage and
    // compound the triple evaluation per level
    def rankOf(metric: Column, name: String): DataFrame =
      graft.ops.RankOps.withGlobalRank(
        r.select(col("cust"), metric.as("_metric")),
        Seq(col("_metric"), col("cust")), name)
        .select(col("cust"), col(name))
    val ranked = r
      .join(rankOf(col("recency_days"), "_rr"), "cust")
      .join(rankOf(-col("frequency"), "_rf"), "cust")
      .join(rankOf(-col("_m"), "_rm"), "cust")
    ranked.withColumn("r_q", ntileFromRank("_rr", "_n", 5))
      .withColumn("f_q", ntileFromRank("_rf", "_n", 5))
      .withColumn("m_q", ntileFromRank("_rm", "_n", 5))
      .select(col("cust"), col("recency_days"), col("frequency"),
        col("_m"), col("_n"), col("r_q"), col("f_q"), col("m_q"))
  }

  /** Generated oracle for the BPE queries (bpe1/bpe2) — k chained CTE
    * blocks replaying [[graft.functions.BpeFunctions]]'s pinned
    * semantics on a delimited-string rendering: each token wrapped in
    * U+001F separators, so one literal `replace('␟L␟␟R␟' → '␟LR␟')` is
    * exactly one leftmost-first non-overlapping merge pass (plain
    * string replace continues after the inserted text — the merged
    * token never re-merges within its pass, same as the Spark kernel's
    * scan). Pair counts index the split list (overlapping — the classic
    * BPE count), and each iteration's argmax feeds the next replace via
    * scalar subqueries, so the oracle derives the merges itself rather
    * than trusting Spark's.
    */
  def bpeOracle(k: Int, finalSelect: String): String = {
    val S = graft.functions.BpeFunctions.Sep
    val ctes = Seq.newBuilder[String]
    ctes += s"""enc0 AS MATERIALIZED (
               |  SELECT doc_id,
               |         regexp_replace(text, '(?s)(.)', '$S\\1$S', 'g') AS enc
               |  FROM documents)""".stripMargin
    for (i <- 1 to k) {
      val p = i - 1
      ctes += s"""p$i AS MATERIALIZED (
                 |  SELECT lt, rt, count(*) AS freq FROM (
                 |    SELECT unnest(lst[1:len(lst) - 1]) AS lt,
                 |           unnest(lst[2:len(lst)]) AS rt
                 |    FROM (SELECT string_split(trim(enc, '$S'), '$S$S') AS lst
                 |          FROM enc$p WHERE enc <> ''))
                 |  GROUP BY 1, 2)""".stripMargin
      ctes += s"""b$i AS MATERIALIZED (SELECT lt, rt, freq FROM p$i
                 |        ORDER BY freq DESC, lt, rt LIMIT 1)""".stripMargin
      ctes += s"""enc$i AS MATERIALIZED (
                 |  SELECT doc_id, replace(enc,
                 |           (SELECT '$S' || lt || '$S$S' || rt || '$S' FROM b$i),
                 |           (SELECT '$S' || lt || rt || '$S' FROM b$i)) AS enc
                 |  FROM enc$p)""".stripMargin
    }
    "WITH " + ctes.result().mkString(",\n") + "\n" + finalSelect
  }

  /** Generated oracle for `g1_pagerank` — the co-purchase graph
    * (distinct directed part pairs sharing an order) and `iters`
    * unrolled synchronous PageRank rounds, each rank rounded to 6 dp
    * (the cross-engine replay contract — see [[graft.ops.GraphOps
    * .pageRank]]). Damping arithmetic is forced through
    * `CAST(0.85 AS DOUBLE)`: DuckDB would otherwise fold `1 - 0.85` in
    * exact DECIMAL, landing on a different double than the JVM's
    * `1.0 - 0.85`. CTEs are MATERIALIZED — each round references its
    * predecessor twice, which inlining would re-evaluate exponentially
    * (the bpeOracle lesson).
    */
  /** Generated oracle for `g5_kcore` — the g3 co-purchase edge set
    * (canonical u<v, first two years), `rounds` unrolled synchronous
    * peel rounds of [[GraphOps.kCore]]'s contract: drop every node
    * with degree < k, restrict edges to survivors, repeat. All-integer
    * — exact replay, no rounding contract.
    */
  def kCoreOracle(k: Int, rounds: Int): String = {
    val ctes = Seq.newBuilder[String]
    ctes += """e0 AS MATERIALIZED (
              |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
              |  FROM lineitem a JOIN lineitem b
              |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
              |  WHERE a.l_shipdate < TIMESTAMP '1997-01-01'
              |    AND b.l_shipdate < TIMESTAMP '1997-01-01')""".stripMargin
    for (i <- 1 to rounds) {
      val p = i - 1
      ctes += s"""d$i AS MATERIALIZED (
                 |  SELECT node, count(*) AS deg FROM (
                 |    SELECT u AS node FROM e$p UNION ALL SELECT v FROM e$p)
                 |  GROUP BY 1)""".stripMargin
      ctes += s"""s$i AS MATERIALIZED (
                 |  SELECT node FROM d$i WHERE deg >= $k)""".stripMargin
      ctes += s"""e$i AS MATERIALIZED (
                 |  SELECT e.u, e.v FROM e$p e
                 |  JOIN s$i a ON e.u = a.node
                 |  JOIN s$i b ON e.v = b.node)""".stripMargin
    }
    "WITH " + ctes.result().mkString(",\n") +
      s"""\nSELECT node, count(*) AS deg FROM (
         |  SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds)
         |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Generated oracle for `g9_bfs_hops` — the full co-purchase graph
    * (canonical u<v, both orientations for expansion), seeds = parts
    * with `l_partkey % 199 = 0`, and `rounds` unrolled synchronous
    * frontier expansions of [[GraphOps.bfsHops]]'s contract: a node's
    * distance fixes the first round it is reached. All-integer — exact
    * replay, no rounding contract.
    */
  def bfsOracle(rounds: Int): String = {
    val ctes = Seq.newBuilder[String]
    ctes += """e AS MATERIALIZED (
              |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
              |  FROM lineitem a JOIN lineitem b
              |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""".stripMargin
    ctes += """dirs AS MATERIALIZED (
              |  SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)""".stripMargin
    ctes += """f0 AS MATERIALIZED (
              |  SELECT DISTINCT l_partkey AS node, 0 AS dist
              |  FROM lineitem WHERE l_partkey % 199 = 0)""".stripMargin
    ctes += """k0 AS MATERIALIZED (SELECT * FROM f0)""".stripMargin
    for (i <- 1 to rounds) {
      val p = i - 1
      ctes += s"""f$i AS MATERIALIZED (
                 |  SELECT DISTINCT d.v AS node, $i AS dist
                 |  FROM dirs d JOIN f$p f ON d.u = f.node
                 |  WHERE d.v NOT IN (SELECT node FROM k$p))""".stripMargin
      ctes += s"""k$i AS MATERIALIZED (
                 |  SELECT * FROM k$p UNION ALL SELECT * FROM f$i)""".stripMargin
    }
    "WITH " + ctes.result().mkString(",\n") +
      s"\nSELECT node, dist FROM k$rounds ORDER BY node"
  }

  /** Generated oracle for `g4_hits` — the directed supplier→part
    * supply graph (suppliers offset by 1e6 into a shared id space),
    * with `iters` unrolled HITS rounds replaying [[GraphOps.hits]]'s
    * contract exactly: raw sums rounded to 6dp, L2-normalized, rounded
    * again; authorities from the previous hubs, hubs from the NEW
    * authorities. MATERIALIZED so DuckDB doesn't inline a round's CTE
    * into both of its consumers.
    */
  def hitsOracle(iters: Int): String = {
    val ctes = Seq.newBuilder[String]
    ctes += """e AS MATERIALIZED (
              |  SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst
              |  FROM lineitem)""".stripMargin
    ctes += """nodes AS MATERIALIZED (
              |  SELECT src AS node FROM e UNION SELECT dst FROM e)""".stripMargin
    ctes += """h0 AS MATERIALIZED (
              |  SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM nodes)""".stripMargin
    for (i <- 1 to iters) {
      val p = i - 1
      ctes += s"""ar$i AS MATERIALIZED (
                 |  SELECT e.dst AS node, round(sum(h$p.hub), 6) AS raw
                 |  FROM e JOIN h$p ON e.src = h$p.node GROUP BY 1)""".stripMargin
      ctes += s"""an$i AS MATERIALIZED (
                 |  SELECT sqrt(sum(raw * raw)) AS nrm FROM ar$i)""".stripMargin
      ctes += s"""a$i AS MATERIALIZED (
                 |  SELECT nodes.node,
                 |         round(COALESCE(ar$i.raw, 0) / an$i.nrm, 6) AS authority
                 |  FROM nodes CROSS JOIN an$i
                 |  LEFT JOIN ar$i ON nodes.node = ar$i.node)""".stripMargin
      ctes += s"""hr$i AS MATERIALIZED (
                 |  SELECT e.src AS node, round(sum(a$i.authority), 6) AS raw
                 |  FROM e JOIN a$i ON e.dst = a$i.node GROUP BY 1)""".stripMargin
      ctes += s"""hn$i AS MATERIALIZED (
                 |  SELECT sqrt(sum(raw * raw)) AS nrm FROM hr$i)""".stripMargin
      ctes += s"""h$i AS MATERIALIZED (
                 |  SELECT nodes.node,
                 |         round(COALESCE(hr$i.raw, 0) / hn$i.nrm, 6) AS hub
                 |  FROM nodes CROSS JOIN hn$i
                 |  LEFT JOIN hr$i ON nodes.node = hr$i.node)""".stripMargin
    }
    "WITH " + ctes.result().mkString(",\n") +
      s"""\nSELECT h$iters.node, h$iters.hub, a$iters.authority
         |FROM h$iters JOIN a$iters ON h$iters.node = a$iters.node
         |ORDER BY 1""".stripMargin
  }

  def pageRankOracle(iters: Int): String = {
    val ctes = Seq.newBuilder[String]
    ctes += """pairs AS MATERIALIZED (
              |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              |  FROM lineitem a JOIN lineitem b
              |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)""".stripMargin
    ctes += """deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM pairs GROUP BY 1)""".stripMargin
    ctes += """nodes AS MATERIALIZED (
              |  SELECT src AS node FROM pairs UNION SELECT dst FROM pairs)""".stripMargin
    ctes += """nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)""".stripMargin
    ctes += """r0 AS MATERIALIZED (
              |  SELECT node, round(1.0 / nn.n, 6) AS r FROM nodes, nn)""".stripMargin
    for (i <- 1 to iters) {
      val p = i - 1
      ctes += s"""c$i AS MATERIALIZED (
                 |  SELECT p.dst AS node, sum(r$p.r / deg.deg) AS s
                 |  FROM pairs p JOIN deg USING (src) JOIN r$p ON p.src = r$p.node
                 |  GROUP BY 1)""".stripMargin
      ctes += s"""r$i AS MATERIALIZED (
                 |  SELECT nodes.node,
                 |         round((1 - CAST(0.85 AS DOUBLE)) / nn.n
                 |               + CAST(0.85 AS DOUBLE) * COALESCE(c$i.s, 0), 6) AS r
                 |  FROM nodes CROSS JOIN nn LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
    }
    "WITH " + ctes.result().mkString(",\n") +
      s"\nSELECT node, r AS rank FROM r$iters ORDER BY node"
  }

  /** Generated oracle for `g6_personalized_pagerank` — [[pageRankOracle]]
    * with the teleport mass on the literal seed set: p(v) = 1/|S| on
    * seeds, 0 elsewhere, r₀ = round(p, 6). `CAST(1.0 AS DOUBLE)/|S|`
    * (NOT the bare decimal literal — DuckDB would divide in decimal)
    * reproduces Spark's IEEE seed mass exactly.
    */
  def pprOracle(iters: Int, seeds: Seq[Long]): String = {
    val inList = seeds.mkString(", ")
    val pv = s"CASE WHEN %s IN ($inList) THEN CAST(1.0 AS DOUBLE) / ${seeds.size} ELSE CAST(0 AS DOUBLE) END"
    val ctes = Seq.newBuilder[String]
    ctes += """pairs AS MATERIALIZED (
              |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              |  FROM lineitem a JOIN lineitem b
              |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)""".stripMargin
    ctes += """deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM pairs GROUP BY 1)""".stripMargin
    ctes += """nodes AS MATERIALIZED (
              |  SELECT src AS node FROM pairs UNION SELECT dst FROM pairs)""".stripMargin
    ctes += s"""r0 AS MATERIALIZED (
               |  SELECT node, round(${pv.format("node")}, 6) AS r FROM nodes)""".stripMargin
    for (i <- 1 to iters) {
      val p = i - 1
      ctes += s"""c$i AS MATERIALIZED (
                 |  SELECT p.dst AS node, sum(r$p.r / deg.deg) AS s
                 |  FROM pairs p JOIN deg USING (src) JOIN r$p ON p.src = r$p.node
                 |  GROUP BY 1)""".stripMargin
      ctes += s"""r$i AS MATERIALIZED (
                 |  SELECT nodes.node,
                 |         round((1 - CAST(0.85 AS DOUBLE)) * ${pv.format("nodes.node")}
                 |               + CAST(0.85 AS DOUBLE) * COALESCE(c$i.s, 0), 6) AS r
                 |  FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
    }
    "WITH " + ctes.result().mkString(",\n") +
      s"\nSELECT node, r AS rank FROM r$iters ORDER BY node"
  }

  /** Generated oracle for `eval4_ranking_metrics` — per-term BM25
    * scoring (the r1 CTE shapes, one term per branch), top-k/ideal-k
    * rankings, and the NDCG/MRR/recall closing ratios, replaying
    * [[graft.functions.RelevanceFunctions.rankingMetrics]]'s exact
    * rounding pipeline (6dp scores before ranking, 6dp DCG terms
    * summed in exact decimal, 6dp ratios).
    */
  def ndcgOracle(terms: Seq[String], k: Int, relCap: Int): String = {
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      s"    CAST(sum(CASE WHEN list_contains(w, '$t') THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(",\n")
    val per = terms.zipWithIndex.map { case (t, i) =>
      s"""sc$i AS (
         |  SELECT doc_id, CAST(len(list_filter(w, x -> x = '$t')) AS BIGINT) AS tf,
         |    round(ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0)
         |          * (CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE) * 2.2)
         |          / (CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE)
         |             + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sumdl / n))), 6) AS score
         |  FROM d, st),
         |top$i AS (
         |  SELECT * FROM (
         |    SELECT doc_id, least(tf, $relCap) AS rel, score,
         |           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS pos
         |    FROM sc$i) WHERE pos <= $k),
         |ideal$i AS (
         |  SELECT * FROM (
         |    SELECT least(tf, $relCap) AS rel,
         |           CAST(row_number() OVER (ORDER BY least(tf, $relCap) DESC, doc_id)
         |                AS INTEGER) AS pos
         |    FROM sc$i WHERE tf > 0) WHERE pos <= $k),
         |agg$i AS (
         |  SELECT '$t' AS term,
         |    (SELECT count(*) FROM sc$i WHERE tf > 0) AS n_rel,
         |    (SELECT CAST(SUM(CAST(round((pow(CAST(2 AS DOUBLE), rel) - 1)
         |                                / log2(pos + 1), 6) AS DECIMAL(18,6))) AS DOUBLE)
         |     FROM top$i) AS dcg,
         |    (SELECT CAST(SUM(CAST(round((pow(CAST(2 AS DOUBLE), rel) - 1)
         |                                / log2(pos + 1), 6) AS DECIMAL(18,6))) AS DOUBLE)
         |     FROM ideal$i) AS idcg,
         |    (SELECT count(*) FROM top$i WHERE rel > 0) AS retr,
         |    (SELECT min(pos) FROM top$i WHERE rel > 0) AS minpos)""".stripMargin
    }.mkString(",\n")
    val unions = terms.indices.map(i => s"SELECT * FROM agg$i").mkString(" UNION ALL ")
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w,
       |         CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS dl
       |  FROM documents),
       |st AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS sumdl,
       |$dfCols
       |  FROM d),
       |$per
       |SELECT term, CAST(n_rel AS BIGINT) AS n_rel,
       |  CASE WHEN idcg IS NULL OR idcg = 0 THEN 0.0 ELSE round(dcg / idcg, 6) END AS ndcg,
       |  COALESCE(round(CAST(1.0 AS DOUBLE) / minpos, 6), 0.0) AS mrr,
       |  CASE WHEN n_rel = 0 THEN 0.0
       |       ELSE round(CAST(retr AS DOUBLE) / CAST(n_rel AS DOUBLE), 6) END AS recall
       |FROM ($unions) ORDER BY term""".stripMargin
  }

  /** Generated oracle for `g2_label_propagation` — the same co-purchase
    * graph as [[pageRankOracle]], symmetrized, with `iters` unrolled
    * synchronous LPA rounds (neighbor-mode labels, min-label
    * tie-break). All-integer: exact cross-engine replay, no rounding
    * contract. MATERIALIZED for the same inlining reason.
    */
  def lpaOracle(iters: Int, finalSelect: String = ""): String = {
    val ctes = Seq.newBuilder[String]
    ctes += """pairs AS MATERIALIZED (
              |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              |  FROM lineitem a JOIN lineitem b
              |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)""".stripMargin
    ctes += """sym AS MATERIALIZED (
              |  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs)""".stripMargin
    ctes += """l0 AS MATERIALIZED (
              |  SELECT DISTINCT dst AS node, dst AS community FROM sym)""".stripMargin
    for (i <- 1 to iters) {
      val p = i - 1
      ctes += s"""m$i AS MATERIALIZED (
                 |  SELECT s.dst AS node, l.community, count(*) AS c
                 |  FROM sym s JOIN l$p l ON s.src = l.node GROUP BY 1, 2)""".stripMargin
      ctes += s"""l$i AS MATERIALIZED (
                 |  SELECT node, community FROM (
                 |    SELECT node, community,
                 |           row_number() OVER (PARTITION BY node
                 |             ORDER BY c DESC, community) AS rn
                 |    FROM m$i) WHERE rn = 1)""".stripMargin
    }
    "WITH " + ctes.result().mkString(",\n") +
      "\n" + (if (finalSelect.nonEmpty) finalSelect
              else s"SELECT node, community FROM l$iters ORDER BY node")
  }

  /** `events.parquet`'s `ts` physical type varies by generator version:
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
    * nanos as long via `spark.sql.legacy.parquet.nanosAsLong=true` and
    * floor-convert, the same truncation DuckDB applies loading
    * nanosecond parquet into its µs timestamps) or TIMESTAMP(MICROS)
    * (read natively, surfacing as TIMESTAMP_NTZ — cast to TimestampType
    * under the UTC session, an identity re-labeling). Branching on the
    * OBSERVED schema keeps every consumer correct against either file
    * without session mutation; both arms end at a µs TimestampType.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Oracle for `s2_lsh_pairs`, generated — not hand-written — so the
    * hyperplane coefficients are the exact doubles Spark uses: Scala's
    * `Double.toString` is shortest-round-trip, and DuckDB's literal→DOUBLE
    * conversion is correctly rounded, so the planes survive the text
    * round-trip bit-for-bit. Sign bits therefore agree everywhere except
    * dot products within float noise of zero (probability ≈ 0 for unit
    * vectors), and the verify threshold compares 6-dp-rounded cosines.
    */
  /** The embeddings corpus with PLANTED near-duplicates (ids offset by
    * 100000, vectors perturbed +0.05 elementwise → planted cosine
    * ≈ 0.92–0.95): the data has no true near-dups, so s2/d4 create the
    * condition they test. Mirrored exactly by the `corpus` CTE of
    * [[s2OracleCtes]].
    */
  def plantedEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    base.unionAll(base.select(
      (col("id") + 100000).as("id"),
      transform(col("v"), x => x + lit(0.05)).as("v")))
  }

  /** Hyperplane literals the s2 family (16-bit) and c4 (32-bit) embed:
    * a pure function of the seed, so Spark, DuckDB and the spec all see
    * the identical coefficients.
    */
  def planesSqlLiteral(nBits: Int): String =
    S.hyperplanes(dim = 64, nBits = nBits)
      .map(row => row.mkString("[", ",", "]"))
      .mkString("CAST([", ",", "] AS DOUBLE[][])")

  lazy val planes64x16Sql: String = planesSqlLiteral(16)

  lazy val s2OracleCtes: String = {
    val planesSql = planes64x16Sql
    s"""WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |corpus AS (
       |  SELECT id, v FROM base
       |  UNION ALL
       |  SELECT id + 100000 AS id, list_transform(v, x -> x + 0.05) AS v FROM base),
       |pl AS (SELECT $planesSql AS planes),
       |sig AS (
       |  SELECT id, v,
       |    CAST(list_aggregate(list_transform(generate_series(0, 15), i ->
       |      CASE WHEN list_dot_product(v, planes[i+1]) >= 0
       |           THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT) AS sig
       |  FROM corpus, pl),
       |banded AS (
       |  SELECT id, b, (sig >> (b*4)) & 15 AS key
       |  FROM sig, UNNEST([0,1,2,3]) AS t(b)),
       |cands AS (
       |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |  FROM banded x JOIN banded y ON x.b = y.b AND x.key = y.key
       |  WHERE x.id < y.id),
       |verified AS (
       |  SELECT c.id_a, c.id_b, round(list_cosine_similarity(a.v, b.v), 6) AS cosine
       |  FROM cands c JOIN sig a ON a.id = c.id_a JOIN sig b ON b.id = c.id_b
       |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.8)""".stripMargin
  }

  lazy val s2OracleSql: String =
    s2OracleCtes + "\nSELECT id_a, id_b, cosine FROM verified\nORDER BY id_a, id_b"

  lazy val d4OracleSql: String =
    s2OracleCtes +
      """
        |SELECT id FROM corpus
        |WHERE id NOT IN (SELECT id_b FROM verified)
        |ORDER BY id""".stripMargin

  /** d7: the s2 CTEs plus a recursive min-reachability closure — DuckDB's
    * WITH RECURSIVE replays the same transitive clustering the
    * distributed clustering computes.
    */
  /** The cls1 NB classifier oracle's CTE chain (features -> hashed
    * buckets -> per-bucket counts -> log-odds weights -> per-doc mean
    * + bias), shared verbatim by `cls1` (scores) and `eval2` (AUC of
    * those scores). No leading WITH.
    */
  lazy val nbScoreCtes: String =
    raw"""tk AS (
      |  SELECT doc_id, lang,
      |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS w
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, lang, f FROM tk, UNNEST(list_concat(w,
      |    CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
      |         ELSE list_transform(generate_series(1, len(w) - 1),
      |                i -> w[i] || ' ' || w[i+1]) END)) AS u(f)),
      |fb AS (
      |  SELECT doc_id, lang,
      |    CAST(('0x' || substring(md5(f), 1, 15)) AS BIGINT) % 65536 AS b
      |  FROM feats),
      |cnt AS (
      |  SELECT b,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
      |    sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS nn
      |  FROM fb WHERE doc_id % 2 = 0 GROUP BY 1),
      |tot AS (SELECT sum(np) AS tp, sum(nn) AS tn FROM cnt),
      |wt AS (
      |  SELECT b, ln((np + 1.0) / (tp + 65536.0))
      |          - ln((nn + 1.0) / (tn + 65536.0)) AS w
      |  FROM cnt, tot),
      |sc AS (
      |  SELECT fb.doc_id, avg(coalesce(wt.w, 0.0)) AS m
      |  FROM fb LEFT JOIN wt USING (b) GROUP BY 1),
      |pr AS (SELECT ln(CAST(tp AS DOUBLE) / tn) AS bias FROM tot)""".stripMargin

  lazy val d7OracleSql: String =
    s2OracleCtes.replaceFirst("^WITH ", "WITH RECURSIVE ") +
      """,
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM verified
        |  UNION SELECT id_b, id_a FROM verified),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
        |cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT component AS cluster_id, count(*) AS n_members, max(id) AS max_id
        |FROM cc GROUP BY 1 ORDER BY 1""".stripMargin

  /** The composed corpus pipeline's text tiers (c3/c4): gates → PII
    * scrub → exact fingerprint dedup → md5-MinHash-LSH near-dup drop,
    * each CTE the already-hash-matched form from its standalone query
    * (t7 / c2 / d1 / m1b), stitched in [[graft.corpus.CorpusPipeline
    * .clean]]'s stage order. No leading WITH (c4 prefixes RECURSIVE).
    * Parameterized by the source relation so c5 can run the identical
    * chain over its batch CTE instead of the raw table.
    */
  def corpusTextCtesFrom(src: String): String =
    raw"""b AS (
      |  SELECT doc_id, text,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
      |         END AS punct_ratio,
      |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
      |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS w
      |  FROM $src),
      |g AS (
      |  SELECT doc_id, text, n_tok,
      |    (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
      |     + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
      |     + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality,
      |    CASE WHEN len(w) < 2 THEN 0.0
      |         ELSE 1.0 - CAST(len(list_distinct(list_transform(
      |                  generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1]))) AS DOUBLE)
      |              / (len(w) - 1) END AS dup_bg
      |  FROM b),
      |gated AS (
      |  SELECT doc_id, text FROM g
      |  WHERE n_tok >= 20 AND quality >= 50.0 AND dup_bg <= 0.3),
      |r1 AS (SELECT doc_id, regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<PII>', 'g') AS text FROM gated),
      |r2 AS (SELECT doc_id, regexp_replace(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<PII>', 'g') AS text FROM r1),
      |r3 AS (SELECT doc_id, regexp_replace(text, '\b\d{3}-\d{2}-\d{4}\b', '<PII>', 'g') AS text FROM r2),
      |scrubbed AS (SELECT doc_id, regexp_replace(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PII>', 'g') AS text FROM r3),
      |exact AS (
      |  SELECT doc_id, text,
      |    md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS fp
      |  FROM scrubbed
      |  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
      |toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
      |  FROM exact),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
      |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
      |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
      |  FROM toks),
      |sig AS (
      |  SELECT doc_id, shingles,
      |    list_transform(generate_series(0, 15), i ->
      |      list_aggregate(list_transform(shingles, s ->
      |        CAST(('0x' || substring(md5(s || '#' || i), 1, 15)) AS BIGINT)), 'min')) AS sg
      |  FROM sh),
      |banded AS (
      |  SELECT doc_id, b,
      |    CAST(('0x' || substring(md5(array_to_string(sg[b*4+1:b*4+4], ',') || '#b#' || b), 1, 15)) AS BIGINT) AS bucket
      |  FROM sig, UNNEST([0, 1, 2, 3]) AS t(b)),
      |cands AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |  FROM banded x JOIN banded y ON x.b = y.b AND x.bucket = y.bucket
      |  WHERE x.doc_id < y.doc_id),
      |doomed AS (
      |  SELECT DISTINCT c.id_b
      |  FROM cands c
      |  JOIN sh a ON a.doc_id = c.id_a
      |  JOIN sh b ON b.doc_id = c.id_b
      |  WHERE CAST(len(a.shingles) + len(b.shingles)
      |         - len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.7)""".stripMargin

  lazy val corpusTextCtes: String = corpusTextCtesFrom("documents")

  /** c5: the incremental-append composition ([[graft.corpus
    * .CorpusPipeline.appendBatch]]) — the batch (docs ≥ 250 plus
    * re-submitted copies of docs < 30 under shifted ids) runs the FULL
    * c3 text chain internally, then drops against the existing corpus
    * (docs < 250, raw): exact fingerprint anti-join, then the
    * cross-side banded MinHash-LSH join (m3's shape) with true-Jaccard
    * verification. Existing-side CTEs mirror the batch-side ones; the
    * batch side reuses `sh`/`banded` restricted to the exact-tier
    * survivors — the same per-doc values appendBatch computes.
    */
  lazy val c5OracleSql: String =
    "WITH batch0 AS (\n" +
      """|  SELECT doc_id, text FROM documents WHERE doc_id >= 250
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 30),
         |existing AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
         |""".stripMargin +
      corpusTextCtesFrom("batch0") + c5CrossSideCtes +
      """
        |SELECT a.doc_id, md5(a.text) AS text_md5
        |FROM afterexact a WHERE a.doc_id NOT IN (SELECT id_b FROM doomed2)
        |ORDER BY doc_id""".stripMargin

  /** c5's cross-side tail, shared with c11: batch-internal survivors →
    * exact-vs-existing fingerprint anti-join → cross-side banded LSH
    * with true-Jaccard verification (`afterexact` minus `doomed2` =
    * the text-safe batch).
    */
  lazy val c5CrossSideCtes: String =
      """,
        |bsurv AS (
        |  SELECT e.doc_id, e.text FROM exact e
        |  WHERE e.doc_id NOT IN (SELECT id_b FROM doomed)),
        |ex_fp AS (
        |  SELECT md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS fp
        |  FROM existing),
        |b_fp AS (
        |  SELECT doc_id, text,
        |    md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS fp
        |  FROM bsurv),
        |afterexact AS (
        |  SELECT doc_id, text FROM b_fp WHERE fp NOT IN (SELECT fp FROM ex_fp)),
        |etoks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        |  FROM existing),
        |esh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
        |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
        |  FROM etoks),
        |esig AS (
        |  SELECT doc_id, shingles,
        |    list_transform(generate_series(0, 15), i ->
        |      list_aggregate(list_transform(shingles, s ->
        |        CAST(('0x' || substring(md5(s || '#' || i), 1, 15)) AS BIGINT)), 'min')) AS sg
        |  FROM esh),
        |ebanded AS (
        |  SELECT doc_id, b,
        |    CAST(('0x' || substring(md5(array_to_string(sg[b*4+1:b*4+4], ',') || '#b#' || b), 1, 15)) AS BIGINT) AS bucket
        |  FROM esig, UNNEST([0, 1, 2, 3]) AS t(b)),
        |abanded AS (
        |  SELECT * FROM banded WHERE doc_id IN (SELECT doc_id FROM afterexact)),
        |cands2 AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM ebanded x JOIN abanded y ON x.b = y.b AND x.bucket = y.bucket),
        |doomed2 AS (
        |  SELECT DISTINCT c.id_b
        |  FROM cands2 c
        |  JOIN esh a ON a.doc_id = c.id_a
        |  JOIN sh y ON y.doc_id = c.id_b
        |  WHERE CAST(len(a.shingles) + len(y.shingles)
        |         - len(list_distinct(list_concat(a.shingles, y.shingles))) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, y.shingles))) >= 0.7)""".stripMargin

  /** c11: c5's append with the CONTAINMENT tier armed — the batch
    * carries verbatim EXCERPTS of existing docs (chars 40..179, ≈47% of
    * a doc: far below the 0.7-Jaccard LSH bar, so the symmetric tier
    * passes them) that must drop against the existing side's winnow
    * rows. Winnow replay = the t4/d22 md5 convention; the df-cap hot
    * set is provably empty at 250 existing docs and the 1000 default,
    * but the CTEs keep it for faithfulness.
    */
  lazy val c11OracleSql: String =
    "WITH batch0 AS (\n" +
      """|  SELECT doc_id, text FROM documents WHERE doc_id >= 250
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, substring(text, 40, 140) AS text
         |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 250),
         |existing AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
         |""".stripMargin +
      corpusTextCtesFrom("batch0") + c5CrossSideCtes +
      """,
        |textsafe AS (
        |  SELECT a.doc_id, a.text FROM afterexact a
        |  WHERE a.doc_id NOT IN (SELECT id_b FROM doomed2)),
        |xnorm AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t FROM existing),
        |xh AS (
        |  SELECT doc_id,
        |    CASE WHEN length(t) - 7 <= 0 THEN [md5(t)]
        |         ELSE list_transform(generate_series(1, length(t) - 7),
        |                i -> md5(substring(t, CAST(i AS INTEGER), 8))) END AS hs
        |  FROM xnorm),
        |xw AS (
        |  SELECT doc_id,
        |    CASE WHEN len(hs) - 3 <= 0 THEN [list_aggregate(hs, 'min')]
        |         ELSE list_transform(generate_series(1, len(hs) - 3),
        |                i -> list_aggregate(hs[i:i+3], 'min')) END AS mins
        |  FROM xh),
        |xfp AS (
        |  SELECT doc_id, f
        |  FROM (SELECT doc_id, unnest(list_distinct(mins)) AS f FROM xw)),
        |hot AS (SELECT f FROM xfp GROUP BY f HAVING count(*) > 1000),
        |bnorm AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t FROM textsafe),
        |bh AS (
        |  SELECT doc_id,
        |    CASE WHEN length(t) - 7 <= 0 THEN [md5(t)]
        |         ELSE list_transform(generate_series(1, length(t) - 7),
        |                i -> md5(substring(t, CAST(i AS INTEGER), 8))) END AS hs
        |  FROM bnorm),
        |bw AS (
        |  SELECT doc_id,
        |    CASE WHEN len(hs) - 3 <= 0 THEN [list_aggregate(hs, 'min')]
        |         ELSE list_transform(generate_series(1, len(hs) - 3),
        |                i -> list_aggregate(hs[i:i+3], 'min')) END AS mins
        |  FROM bh),
        |bfp AS (
        |  SELECT doc_id, f
        |  FROM (SELECT doc_id, unnest(list_distinct(mins)) AS f FROM bw)),
        |kb AS (SELECT * FROM bfp WHERE f NOT IN (SELECT f FROM hot)),
        |kx AS (SELECT * FROM xfp WHERE f NOT IN (SELECT f FROM hot)),
        |bsz AS (SELECT doc_id, count(*) AS n FROM kb GROUP BY 1),
        |cpair AS (
        |  SELECT b.doc_id AS bid, x.doc_id AS xid, count(*) AS s
        |  FROM kx x JOIN kb b ON x.f = b.f GROUP BY 1, 2),
        |contained AS (
        |  SELECT DISTINCT bid FROM cpair JOIN bsz ON bsz.doc_id = cpair.bid
        |  WHERE round(CAST(s AS DOUBLE) / bsz.n, 6) >= 0.7)
        |SELECT t.doc_id, md5(t.text) AS text_md5 FROM textsafe t
        |WHERE t.doc_id NOT IN (SELECT bid FROM contained)
        |ORDER BY doc_id""".stripMargin

  /** The c6 planted batch document: fresh prose that sails through every
    * text gate (29 tokens, zero punctuation, stopword-rich, all bigrams
    * distinct, no shingle overlap with the synthetic corpus) so the ONLY
    * stage that can drop it is the vs-corpus embedding arm its planted
    * chunk vectors (doc 7's, epsilon-shifted) aim at. No apostrophes —
    * it embeds in a SQL string literal verbatim.
    */
  /** Planted URL per document for the url* queries — documents has no
    * url column, so one derives deterministically from (doc_id, source),
    * cycling four shapes that exercise every normalizeUrl contract step:
    * shouting scheme/host + www + default port + tracking params +
    * fragment + trailing slash (0), default http port (1), query-only
    * with a tracker (2), and a bare non-URL string (3). The SQL twin
    * builds the identical strings.
    */
  def plantedUrls(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(lit("HTTPS://WWW."), col("source"), lit(".Example.CO.UK:443/Docs/"),
          col("doc_id"), lit("/?utm_source=feed&page="), col("doc_id") % 7,
          lit("#top")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("http://"), col("source"), lit(".example.com:80/A/"),
            col("doc_id")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://cdn."), col("source"), lit(".org?gclid=x&id="),
            col("doc_id")))
        .otherwise(concat(col("source"), lit(".com/bare/"), col("doc_id")))
        .as("url"))

  /** SQL CTE prefix shared by the url* oracles: plants the same URLs
    * and replays [[graft.functions.UrlFunctions.normalizeUrl]] /
    * [[graft.functions.UrlFunctions.registrableDomain]] step for step
    * (same regexes — the Java∩RE2 subset runs unchanged under RE2).
    */
  val urlOracleCtes: String =
    """WITH u AS (
      |  SELECT doc_id, CASE doc_id % 4
      |    WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.CO.UK:443/Docs/' || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&page=' || CAST(doc_id % 7 AS VARCHAR) || '#top'
      |    WHEN 1 THEN 'http://' || source || '.example.com:80/A/' || CAST(doc_id AS VARCHAR)
      |    WHEN 2 THEN 'https://cdn.' || source || '.org?gclid=x&id=' || CAST(doc_id AS VARCHAR)
      |    ELSE source || '.com/bare/' || CAST(doc_id AS VARCHAR) END AS url
      |  FROM documents),
      |p1 AS (SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS t FROM u),
      |p2 AS (
      |  SELECT doc_id, t,
      |    lower(regexp_extract(t, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(t, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS af
      |  FROM p1),
      |p3 AS (
      |  SELECT doc_id, t, scheme, af,
      |    CASE scheme WHEN 'http' THEN regexp_replace(h0, ':80$', '')
      |                WHEN 'https' THEN regexp_replace(h0, ':443$', '')
      |                ELSE h0 END AS host
      |  FROM (SELECT *, regexp_replace(lower(regexp_extract(af, '^([^/?]+)', 1)), '^www\.', '') AS h0 FROM p2)),
      |p4 AS (
      |  SELECT doc_id, t, scheme, host,
      |    regexp_replace(regexp_extract(af, '^[^/?]*([^?]*)', 1), '/+$', '') AS path,
      |    coalesce(array_to_string(list_filter(string_split(regexp_extract(af, '\?(.*)$', 1), '&'),
      |      p -> len(p) > 0 AND NOT regexp_matches(p, '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|igshid|ref|ref_src|mc_cid|mc_eid)=')), '&'), '') AS q
      |  FROM p3),
      |n AS (
      |  SELECT doc_id,
      |    CASE WHEN scheme = '' THEN t
      |         ELSE scheme || '://' || host || path ||
      |              CASE WHEN q = '' THEN '' ELSE '?' || q END END AS url_norm,
      |    CASE WHEN scheme = '' THEN '' ELSE host END AS host
      |  FROM p4),
      |dom AS (
      |  SELECT doc_id, url_norm, host,
      |    CASE WHEN nl >= 3 AND list_contains(['co.uk','org.uk','ac.uk','gov.uk','co.jp','ne.jp','or.jp','com.au','net.au','org.au','com.br','com.cn','com.mx','com.tr','com.ar','co.in','co.za','co.kr','com.sg','com.hk'], l2) THEN l3
      |         WHEN nl >= 2 THEN l2 ELSE host END AS domain
      |  FROM (SELECT doc_id, url_norm, host, len(ls) AS nl,
      |          array_to_string(list_slice(ls, greatest(len(ls)-1, 1), len(ls)), '.') AS l2,
      |          array_to_string(list_slice(ls, greatest(len(ls)-2, 1), len(ls)), '.') AS l3
      |        FROM (SELECT doc_id, url_norm, host, string_split(host, '.') AS ls FROM n)))""".stripMargin

  val c6PlantText: String =
    "the quiet harbor keeps a long record of tides and the old keeper " +
      "writes each level in a worn ledger while gulls circle over the " +
      "gray water at dawn"

  /** c6: c5's incremental append with BOTH semantic arms armed — the
    * batch runs the full two-tier clean internally (text CTEs + the c4
    * pooling/LSH/cosine/closure replay over its own chunks), then drops
    * against the corpus by exact fingerprint, cross-side text LSH, and
    * cross-side embedding LSH (the stored-SemanticIndex path: corpus
    * chunks pool once, batch pooled vectors join the corpus band keys).
    * A planted batch doc (900260 — fresh text, chunk vectors an epsilon
    * shift of existing doc 7's) proves the vs-corpus embedding arm
    * actually fires: it survives every text stage and must drop at the
    * last one.
    */
  lazy val c6OracleSql: String = {
    val planes = planesSqlLiteral(32)
    val sigExpr =
      """CAST(list_aggregate(list_transform(generate_series(0, 31), i ->
        |      CASE WHEN list_dot_product(v, planes[i+1]) >= 0
        |           THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT)""".stripMargin
    "WITH RECURSIVE batch0 AS (\n" +
      s"""|  SELECT doc_id, text FROM documents WHERE doc_id >= 250
          |  UNION ALL
          |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 30
          |  UNION ALL
          |  SELECT CAST(900260 AS BIGINT) AS doc_id, '$c6PlantText' AS text),
          |existing AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
          |""".stripMargin +
      corpusTextCtesFrom("batch0") +
      s""",
        |tsurv AS (
        |  SELECT e.doc_id, e.text FROM exact e
        |  WHERE e.doc_id NOT IN (SELECT id_b FROM doomed)),
        |bchunks AS (
        |  SELECT vec_id // 10 AS doc_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id // 10 >= 250
        |  UNION ALL
        |  SELECT CAST(900260 AS BIGINT) AS doc_id,
        |         list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.002) AS v
        |  FROM embeddings WHERE vec_id // 10 = 7),
        |aliveb AS (
        |  SELECT doc_id, v FROM bchunks
        |  WHERE doc_id IN (SELECT doc_id FROM tsurv)),
        |flatb AS (
        |  SELECT doc_id, generate_subscripts(v, 1) AS pos, unnest(v) AS val
        |  FROM aliveb),
        |pooledb AS (
        |  SELECT doc_id, list(m ORDER BY pos) AS v
        |  FROM (SELECT doc_id, pos, round(avg(val), 6) AS m
        |        FROM flatb GROUP BY 1, 2)
        |  GROUP BY doc_id),
        |pl AS (SELECT $planes AS planes),
        |sigb AS (
        |  SELECT doc_id, v, $sigExpr AS sig
        |  FROM pooledb, pl),
        |bandedb AS (
        |  SELECT doc_id, b, (sig >> (b*8)) & 255 AS key
        |  FROM sigb, UNNEST([0,1,2,3]) AS t(b)),
        |candsb AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM bandedb x JOIN bandedb y ON x.b = y.b AND x.key = y.key
        |  WHERE x.doc_id < y.doc_id),
        |verifiedb AS (
        |  SELECT c.id_a, c.id_b
        |  FROM candsb c JOIN sigb aa ON aa.doc_id = c.id_a
        |                JOIN sigb bb ON bb.doc_id = c.id_b
        |  WHERE round(list_cosine_similarity(aa.v, bb.v), 6) >= 0.9),
        |edgesb AS (
        |  SELECT id_a AS src, id_b AS dst FROM verifiedb
        |  UNION SELECT id_b, id_a FROM verifiedb),
        |reachb(id, r) AS (
        |  SELECT src, src FROM edgesb
        |  UNION
        |  SELECT reachb.id, e.dst FROM reachb JOIN edgesb e ON reachb.r = e.src),
        |ccb AS (SELECT id, min(r) AS component FROM reachb GROUP BY id),
        |doomedb AS (SELECT id FROM ccb WHERE id <> component),
        |bsurv AS (
        |  SELECT doc_id, text FROM tsurv
        |  WHERE doc_id NOT IN (SELECT id FROM doomedb)),
        |ex_fp AS (
        |  SELECT md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS fp
        |  FROM existing),
        |b_fp AS (
        |  SELECT doc_id, text,
        |    md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS fp
        |  FROM bsurv),
        |afterexact AS (
        |  SELECT doc_id, text FROM b_fp WHERE fp NOT IN (SELECT fp FROM ex_fp)),
        |etoks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
        |  FROM existing),
        |esh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
        |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
        |  FROM etoks),
        |esig AS (
        |  SELECT doc_id, shingles,
        |    list_transform(generate_series(0, 15), i ->
        |      list_aggregate(list_transform(shingles, s ->
        |        CAST(('0x' || substring(md5(s || '#' || i), 1, 15)) AS BIGINT)), 'min')) AS sg
        |  FROM esh),
        |ebanded AS (
        |  SELECT doc_id, b,
        |    CAST(('0x' || substring(md5(array_to_string(sg[b*4+1:b*4+4], ',') || '#b#' || b), 1, 15)) AS BIGINT) AS bucket
        |  FROM esig, UNNEST([0, 1, 2, 3]) AS t(b)),
        |abanded AS (
        |  SELECT * FROM banded WHERE doc_id IN (SELECT doc_id FROM afterexact)),
        |cands2 AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM ebanded x JOIN abanded y ON x.b = y.b AND x.bucket = y.bucket),
        |doomed2 AS (
        |  SELECT DISTINCT c.id_b
        |  FROM cands2 c
        |  JOIN esh aa ON aa.doc_id = c.id_a
        |  JOIN sh yy ON yy.doc_id = c.id_b
        |  WHERE CAST(len(aa.shingles) + len(yy.shingles)
        |         - len(list_distinct(list_concat(aa.shingles, yy.shingles))) AS DOUBLE)
        |      / len(list_distinct(list_concat(aa.shingles, yy.shingles))) >= 0.7),
        |textsafe AS (
        |  SELECT doc_id, text FROM afterexact
        |  WHERE doc_id NOT IN (SELECT id_b FROM doomed2)),
        |echunks AS (
        |  SELECT vec_id // 10 AS doc_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id // 10 < 250),
        |eflat AS (
        |  SELECT doc_id, generate_subscripts(v, 1) AS pos, unnest(v) AS val
        |  FROM echunks),
        |epooled AS (
        |  SELECT doc_id, list(m ORDER BY pos) AS v
        |  FROM (SELECT doc_id, pos, round(avg(val), 6) AS m
        |        FROM eflat GROUP BY 1, 2)
        |  GROUP BY doc_id),
        |esig2 AS (
        |  SELECT doc_id, v, $sigExpr AS sig
        |  FROM epooled, pl),
        |ebanded2 AS (
        |  SELECT doc_id, b, (sig >> (b*8)) & 255 AS key
        |  FROM esig2, UNNEST([0,1,2,3]) AS t(b)),
        |bband3 AS (
        |  SELECT * FROM bandedb WHERE doc_id IN (SELECT doc_id FROM textsafe)),
        |cands3 AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM ebanded2 x JOIN bband3 y ON x.b = y.b AND x.key = y.key),
        |verified3 AS (
        |  SELECT DISTINCT c.id_b
        |  FROM cands3 c JOIN esig2 aa ON aa.doc_id = c.id_a
        |                JOIN sigb bb ON bb.doc_id = c.id_b
        |  WHERE round(list_cosine_similarity(aa.v, bb.v), 6) >= 0.9)
        |SELECT t.doc_id, md5(t.text) AS text_md5
        |FROM textsafe t WHERE t.doc_id NOT IN (SELECT id_b FROM verified3)
        |ORDER BY doc_id""".stripMargin
  }

  lazy val c3OracleSql: String =
    "WITH " + corpusTextCtes +
      """
        |SELECT e.doc_id, md5(e.text) AS text_md5
        |FROM exact e WHERE e.doc_id NOT IN (SELECT id_b FROM doomed)
        |ORDER BY doc_id""".stripMargin

  /** c8: the c3 text chain with the duplicate-LINE removal stage armed
    * (cfg.lineDedupMinChars) over a corpus where every doc carries a
    * shared banner line and one doc in ten is re-crawled with the SAME
    * banner on the other side. The d14 line CTEs rebuild the cleaned
    * text; only doc 0 keeps the banner (lowest (id, pos)), every twin
    * collapses onto its original at the exact-dedup tier.
    */
  lazy val c8OracleSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |         'SHARED COOKIE BANNER TEXT HERE' || chr(10) || text AS text
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |         text || chr(10) || 'SHARED COOKIE BANNER TEXT HERE'
      |  FROM documents WHERE doc_id % 10 = 0),
      |lines AS (
      |  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS pos, unnest(ls) AS line
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM planted)),
      |keyed AS (SELECT doc_id, pos, line, trim(line) AS k FROM lines),
      |keep AS (
      |  SELECT k, doc_id AS kid, pos AS kpos FROM (
      |    SELECT k, doc_id, pos,
      |           row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) AS rn
      |    FROM keyed WHERE length(k) >= 10) WHERE rn = 1),
      |kept AS (
      |  SELECT l.doc_id, l.pos, l.line
      |  FROM keyed l LEFT JOIN keep ON l.k = keep.k
      |  WHERE length(l.k) < 10 OR (l.doc_id = keep.kid AND l.pos = keep.kpos)),
      |rebuilt AS (
      |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
      |  FROM kept GROUP BY doc_id),
      |ld AS (
      |  SELECT p.doc_id, coalesce(r.text, '') AS text
      |  FROM planted p LEFT JOIN rebuilt r USING (doc_id)),
      |""".stripMargin + corpusTextCtesFrom("ld") +
      """
        |SELECT e.doc_id, md5(e.text) AS text_md5
        |FROM exact e WHERE e.doc_id NOT IN (SELECT id_b FROM doomed)
        |ORDER BY doc_id""".stripMargin

  /** c7: the c3 text chain over the non-holdout corpus, then the c1
    * decontamination join as a DROP gate — survivors share ZERO word
    * 3-grams with the held-out suite (maxSharedGrams = 0). Survivor
    * grams come from the SCRUBBED text (the pipeline decontaminates
    * what it would ship); holdout grams from the raw benchmark text.
    */
  lazy val c7OracleSql: String =
    "WITH corpus_src AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),\n" +
      corpusTextCtesFrom("corpus_src") +
      """,
        |survivors AS (
        |  SELECT e.doc_id, e.text FROM exact e
        |  WHERE e.doc_id NOT IN (SELECT id_b FROM doomed)),
        |sgr AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_distinct(list_transform(generate_series(1, len(w) - 2),
        |                i -> array_to_string(w[i:i+2], ' '))) END) AS g
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |        FROM survivors)),
        |hgr AS (
        |  SELECT DISTINCT unnest(
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_distinct(list_transform(generate_series(1, len(w) - 2),
        |                i -> array_to_string(w[i:i+2], ' '))) END) AS g
        |  FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |        FROM documents WHERE doc_id % 50 = 0)),
        |contaminated AS (SELECT DISTINCT doc_id FROM sgr JOIN hgr USING (g))
        |SELECT s.doc_id, md5(s.text) AS text_md5 FROM survivors s
        |WHERE s.doc_id NOT IN (SELECT doc_id FROM contaminated)
        |ORDER BY doc_id""".stripMargin

  /** c4: the text tiers plus the embedding tier — s5's pooling (6dp),
    * the s2 hyperplane literals, exact-cosine verify, and the d7
    * recursive min-reachability closure, in [[graft.corpus
    * .CorpusPipeline.semanticDedup]]'s stage order.
    */
  lazy val c4OracleSql: String =
    "WITH RECURSIVE " + corpusTextCtes + s""",
        |survivors AS (
        |  SELECT e.doc_id, e.text FROM exact e
        |  WHERE e.doc_id NOT IN (SELECT id_b FROM doomed)),
        |chunks AS (
        |  SELECT vec_id // 10 AS doc_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id // 10 <> 23
        |  UNION ALL
        |  SELECT 23 AS doc_id, list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.002) AS v
        |  FROM embeddings WHERE vec_id // 10 = 7),
        |alive AS (
        |  SELECT doc_id, v FROM chunks
        |  WHERE doc_id IN (SELECT doc_id FROM survivors)),
        |flatc AS (
        |  SELECT doc_id, generate_subscripts(v, 1) AS pos, unnest(v) AS val
        |  FROM alive),
        |pooled AS (
        |  SELECT doc_id, list(m ORDER BY pos) AS v
        |  FROM (SELECT doc_id, pos, round(avg(val), 6) AS m
        |        FROM flatc GROUP BY 1, 2)
        |  GROUP BY doc_id),
        |pl AS (SELECT ${planesSqlLiteral(32)} AS planes),
        |sig2 AS (
        |  SELECT doc_id, v,
        |    CAST(list_aggregate(list_transform(generate_series(0, 31), i ->
        |      CASE WHEN list_dot_product(v, planes[i+1]) >= 0
        |           THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT) AS sig
        |  FROM pooled, pl),
        |banded2 AS (
        |  SELECT doc_id, b, (sig >> (b*8)) & 255 AS key
        |  FROM sig2, UNNEST([0,1,2,3]) AS t(b)),
        |cands2 AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM banded2 x JOIN banded2 y ON x.b = y.b AND x.key = y.key
        |  WHERE x.doc_id < y.doc_id),
        |verified2 AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cands2 c JOIN sig2 a ON a.doc_id = c.id_a JOIN sig2 b ON b.doc_id = c.id_b
        |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.9),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM verified2
        |  UNION SELECT id_b, id_a FROM verified2),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
        |cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
        |doomed2 AS (SELECT id FROM cc WHERE id <> component)
        |SELECT s.doc_id, md5(s.text) AS text_md5
        |FROM survivors s WHERE s.doc_id NOT IN (SELECT id FROM doomed2)
        |ORDER BY doc_id""".stripMargin

  /** Generated oracle for `e37_removal_attribution`, unrolling
    * [[graft.ops.EventAnalyticsOps.removalEffectAttribution]]'s fixed
    * `iters` exact-decimal absorption sweeps as chained CTEs (the
    * logregOracle pattern). Everything is data-driven SQL — journeys,
    * transition shares, scenarios (one per channel plus FULL), and the
    * per-sweep v(s) ← round₆(Σ P(s→t)·v(t)) updates in DECIMAL, so the
    * engines agree bit-for-bit at every sweep.
    */
  def removalAttributionOracle(convType: String, iters: Int): String = {
    val b = new StringBuilder
    b ++= s"""WITH ev AS (
             |  SELECT user_id, event_type,
             |         row_number() OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS rn
             |  FROM events),
             |us AS (SELECT user_id,
             |         min(CASE WHEN event_type = '$convType' THEN rn END) AS fcv
             |       FROM ev GROUP BY 1),
             |kept AS (
             |  SELECT e.user_id, e.event_type, e.rn, u.fcv
             |  FROM ev e JOIN us u USING (user_id)
             |  WHERE u.fcv IS NULL OR e.rn < u.fcv),
             |steps AS (
             |  SELECT event_type AS f,
             |    coalesce(lead(event_type) OVER (PARTITION BY user_id ORDER BY rn),
             |             CASE WHEN fcv IS NOT NULL THEN 'CONV' ELSE 'NULL' END) AS t
             |  FROM kept),
             |fst AS (SELECT user_id, arg_min(event_type, rn) AS t1
             |        FROM kept GROUP BY 1),
             |starts AS (
             |  SELECT 'START' AS f,
             |    coalesce(fs.t1,
             |             CASE WHEN u.fcv IS NOT NULL THEN 'CONV' ELSE 'NULL' END) AS t
             |  FROM us u LEFT JOIN fst fs USING (user_id)),
             |alltr AS (SELECT f, t FROM steps UNION ALL SELECT f, t FROM starts),
             |cnt AS (SELECT f, t, count(*) AS n FROM alltr GROUP BY 1, 2),
             |tt AS (SELECT f, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY 1),
             |bp AS (
             |  SELECT c.f, c.t,
             |    CAST(round(CAST(c.n AS DOUBLE) / CAST(tt.tot AS DOUBLE), 6)
             |      AS DECIMAL(18,6)) AS p
             |  FROM cnt c JOIN tt USING (f)),
             |ch AS (SELECT DISTINCT f AS c FROM bp WHERE f <> 'START'),
             |scen AS (SELECT 'FULL' AS s, CAST(NULL AS VARCHAR) AS rem
             |         UNION ALL SELECT c, c FROM ch),
             |pm AS (
             |  SELECT sc.s, b.f,
             |    CASE WHEN b.t = sc.rem THEN 'NULL' ELSE b.t END AS t, b.p
             |  FROM scen sc JOIN bp b ON sc.rem IS NULL OR b.f <> sc.rem),
             |pm2 AS MATERIALIZED (SELECT s, f, t, CAST(sum(p) AS DECIMAL(18,6)) AS p
             |        FROM pm GROUP BY 1, 2, 3),
             |v0 AS MATERIALIZED (
             |  SELECT DISTINCT s, f AS st, CAST(0 AS DECIMAL(18,6)) AS v FROM pm2
             |  UNION ALL SELECT s, 'CONV', CAST(1 AS DECIMAL(18,6)) FROM scen
             |  UNION ALL SELECT s, 'NULL', CAST(0 AS DECIMAL(18,6)) FROM scen),
             |""".stripMargin
    for (k <- 1 to iters) {
      b ++= s"""v$k AS MATERIALIZED (
               |  SELECT m.s, m.f AS st,
               |    CAST(round(sum(m.p * v.v), 6) AS DECIMAL(18,6)) AS v
               |  FROM pm2 m JOIN v${k - 1} v ON v.s = m.s AND v.st = m.t
               |  GROUP BY m.s, m.f
               |  UNION ALL SELECT s, st, v FROM v0 WHERE st IN ('CONV', 'NULL')),
               |""".stripMargin
    }
    b ++= s"""fin AS (SELECT s, CAST(v AS DOUBLE) AS pc FROM v$iters
             |        WHERE st = 'START'),
             |fl AS (SELECT pc FROM fin WHERE s = 'FULL'),
             |ef AS (
             |  SELECT f.s AS channel, f.pc AS p_conv_removed,
             |    round(1 - f.pc / (SELECT pc FROM fl), 6) AS removal_effect
             |  FROM fin f WHERE f.s <> 'FULL'),
             |te AS (SELECT CAST(sum(CAST(removal_effect AS DECIMAL(18,6)))
             |         AS DECIMAL(18,6)) AS tot FROM ef)
             |SELECT channel, (SELECT pc FROM fl) AS p_conv, p_conv_removed,
             |  removal_effect,
             |  round(CAST(CAST(removal_effect AS DECIMAL(18,6)) AS DOUBLE)
             |    / CAST(te.tot AS DOUBLE), 6) AS attribution_share
             |FROM ef, te ORDER BY channel""".stripMargin
    b.result()
  }
}
