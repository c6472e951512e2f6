package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ClassifierFunctions => Cls, DedupFunctions => D, RelevanceFunctions => R, SamplingFunctions => Sam, SimilarityFunctions => S, TextFunctions => T, UrlFunctions => U}
import graft.ops.{AsOfJoinOps, CrossValidationOps, EventAnalyticsOps, FeatureOps, GraphOps, HistoryOps, MacroOps, RangeJoinOps, SkewOps, ValidationOps}

/** One driver-verifiable query. `oracle` is the DuckDB-equivalent ANSI
  * SQL over the same parquet tables; None for ops whose hash seeds
  * (xxhash64) the oracle engine lacks — those get a rows-only check.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The oracle-checked query registry: one entry per operator of
  * SURVEY.md §2 plus the LLM-training-data operators (dedup, text
  * analysis, similarity search, event windows).
  *
  * Cross-engine determinism rules (see [[Q]]'s scaladoc): exact-decimal
  * money aggregation; counts as longs; floating aggregates rounded to 6
  * decimals; per-row IEEE chains left unrounded (bit-reproducible);
  * every result ends in a total deterministic ORDER BY.
  */
object Queries {
  import Q.{money2, prices, pricesSql, revenueDec, t}

  private val wTicker = Window.partitionBy("ticker").orderBy("date")

  private def pricesWithRet(s: SparkSession, dir: String): DataFrame =
    prices(t(s, dir, "lineitem"))
      .withColumn("ret", col("close") / lag("close", 1).over(wTicker) - 1)

  /** DuckDB CTE for [[pricesWithRet]], appended to [[Q.pricesSql]]. */
  private val retSql: String =
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
  private def grossSubset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").filter(col("l_suppkey") % 10 === 0)
      .groupBy(col("l_suppkey").as("ticker"), to_date(col("l_shipdate")).as("date"))
      .agg(money2(sum(col("l_extendedprice").cast("decimal(12,4)"))).as("close"))

  private val grossSql: String =
    """, gross AS (
      |  SELECT l_suppkey AS ticker, CAST(l_shipdate AS DATE) AS "date",
      |         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS close
      |  FROM lineitem WHERE l_suppkey % 10 = 0 GROUP BY 1, 2
      |)""".stripMargin

  private def docs(s: SparkSession, dir: String) = t(s, dir, "documents")

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
  private def s3bOracle(k: Int, dim: Int, trainIters: Int,
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
  private def ntileFromRank(rank: String, n: String, k: Int): Column = expr(
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
  private def rfmQuintiles(s: SparkSession, dir: String): DataFrame = {
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
  private def bpeOracle(k: Int, finalSelect: String): String = {
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
  private def kCoreOracle(k: Int, rounds: Int): String = {
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
  private def bfsOracle(rounds: Int): String = {
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
  private def hitsOracle(iters: Int): String = {
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

  private def pageRankOracle(iters: Int): String = {
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
  private def pprOracle(iters: Int, seeds: Seq[Long]): String = {
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
  private def ndcgOracle(terms: Seq[String], k: Int, relCap: Int): String = {
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
  private def lpaOracle(iters: Int): String = {
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
      s"\nSELECT node, community FROM l$iters ORDER BY node"
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
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
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
  private def plantedEmbeddings(s: SparkSession, dir: String): DataFrame = {
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
  private def planesSqlLiteral(nBits: Int): String =
    S.hyperplanes(dim = 64, nBits = nBits)
      .map(row => row.mkString("[", ",", "]"))
      .mkString("CAST([", ",", "] AS DOUBLE[][])")

  private lazy val planes64x16Sql: String = planesSqlLiteral(16)

  private lazy val s2OracleCtes: String = {
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

  private lazy val s2OracleSql: String =
    s2OracleCtes + "\nSELECT id_a, id_b, cosine FROM verified\nORDER BY id_a, id_b"

  private lazy val d4OracleSql: String =
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
  private lazy val nbScoreCtes: String =
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

  private lazy val d7OracleSql: String =
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
  private def corpusTextCtesFrom(src: String): String =
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

  private lazy val corpusTextCtes: String = corpusTextCtesFrom("documents")

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
  private lazy val c5OracleSql: String =
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
  private lazy val c5CrossSideCtes: String =
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
  private lazy val c11OracleSql: String =
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
  private def plantedUrls(s: SparkSession, dir: String): DataFrame =
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
  private val urlOracleCtes: String =
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

  private val c6PlantText: String =
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
  private lazy val c6OracleSql: String = {
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

  private lazy val c3OracleSql: String =
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
  private lazy val c8OracleSql: String =
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
  private lazy val c7OracleSql: String =
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
  private lazy val c4OracleSql: String =
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

  val registry: Seq[QueryDef] = Seq(

    // ───────── projections / filters ─────────

    QueryDef("p5_date_range",
      (s, dir) => t(s, dir, "orders")
        .withColumn("order_date", to_date(col("o_orderdate")))
        .filter(col("order_date").between(
          lit("1996-01-01").cast("date"), lit("1996-12-31").cast("date")))
        .select("o_orderkey", "order_date", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
             |       o_totalprice, o_orderpriority
             |FROM orders
             |WHERE CAST(o_orderdate AS DATE)
             |      BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
             |ORDER BY o_orderkey""".stripMargin)),

    // ───────── joins ─────────

    QueryDef("j1_cross_source",
      (s, dir) => CrossValidationOps.compareSources(
          prices(t(s, dir, "lineitem")), grossSubset(s, dir), "ticker", "date", 1.0)
        .orderBy("ticker", "date"),
      Some(pricesSql + grossSql +
        """
          |SELECT p.ticker, p."date" AS "date", p.close AS yahoo_close,
          |       g.close AS alpha_close, p.close - g.close AS price_diff,
          |       abs((p.close - g.close) / p.close * 100) AS diff_pct,
          |       abs((p.close - g.close) / p.close * 100) > 1.0 AS discrepancy_flag,
          |       p.close AS resolved_close
          |FROM prices p JOIN gross g ON p.ticker = g.ticker AND p."date" = g."date"
          |ORDER BY p.ticker, p."date"""".stripMargin)),

    QueryDef("j2_flag_enrich",
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
        val cmp = CrossValidationOps.compareSources(p, grossSubset(s, dir), "ticker", "date", 1.0)
        val flags = CrossValidationOps.discrepancies(cmp, 1.0)
          .select(col("ticker"), col("date"), col("discrepancy_flag"))
        CrossValidationOps.enrichWithFlags(p, flags, "ticker", "date")
          .select("ticker", "date", "close", "discrepancy_flag")
          .orderBy("ticker", "date")
      },
      Some(pricesSql + grossSql +
        """, flags AS (
          |  SELECT p.ticker, p."date", true AS discrepancy_flag
          |  FROM prices p JOIN gross g ON p.ticker = g.ticker AND p."date" = g."date"
          |  WHERE abs((p.close - g.close) / p.close * 100) > 1.0
          |)
          |SELECT p.ticker, p."date" AS "date", p.close,
          |       COALESCE(f.discrepancy_flag, false) AS discrepancy_flag
          |FROM prices p LEFT JOIN flags f ON p.ticker = f.ticker AND p."date" = f."date"
          |ORDER BY p.ticker, p."date"""".stripMargin)),

    QueryDef("j7_full_recon",
      // symmetric source reconciliation: FULL OUTER join of two feeds
      // on (ticker, date), every row classified present-in-both
      // (match/mismatch on the exact-decimal close) or one-sided, then
      // a per-ticker roll-up. The j1 family compares where both sides
      // exist; this is the completeness audit — which (key, day) cells
      // each feed is MISSING. One shuffle on the join key; the roll-up
      // reuses the same hashed distribution (no second exchange on
      // ticker beyond the agg). Presence = side's close IS NOT NULL
      // (non-null by construction when the row exists).
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem")).filter(col("ticker") % 7 === 0)
          .select(col("ticker"), col("date"), col("close").as("p_close"))
        val g = grossSubset(s, dir)
          .select(col("ticker"), col("date"), col("close").as("s_close"))
        p.join(g, Seq("ticker", "date"), "full_outer")
          .select(col("ticker"),
            when(col("p_close").isNotNull && col("s_close").isNotNull,
              when(col("p_close") === col("s_close"), "match")
                .otherwise("mismatch"))
            .when(col("p_close").isNotNull, lit("primary_only"))
            .otherwise(lit("secondary_only")).as("status"))
          .groupBy("ticker")
          .agg(count(lit(1)).as("n_days"),
            sum(when(col("status") === "match", 1L).otherwise(0L)).as("n_match"),
            sum(when(col("status") === "mismatch", 1L).otherwise(0L)).as("n_mismatch"),
            sum(when(col("status") === "primary_only", 1L).otherwise(0L)).as("n_primary_only"),
            sum(when(col("status") === "secondary_only", 1L).otherwise(0L)).as("n_secondary_only"))
          .orderBy("ticker")
      },
      Some(pricesSql + grossSql +
        """, p AS (SELECT ticker, "date", close AS p_close FROM prices
          |        WHERE ticker % 7 = 0),
          |j AS (
          |  SELECT COALESCE(p.ticker, g.ticker) AS ticker,
          |    CASE WHEN p.p_close IS NOT NULL AND g.close IS NOT NULL
          |           THEN (CASE WHEN p.p_close = g.close
          |                      THEN 'match' ELSE 'mismatch' END)
          |         WHEN p.p_close IS NOT NULL THEN 'primary_only'
          |         ELSE 'secondary_only' END AS status
          |  FROM p FULL OUTER JOIN gross g
          |    ON p.ticker = g.ticker AND p."date" = g."date")
          |SELECT ticker, count(*) AS n_days,
          |  CAST(SUM(CASE WHEN status = 'match' THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
          |  CAST(SUM(CASE WHEN status = 'mismatch' THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
          |  CAST(SUM(CASE WHEN status = 'primary_only' THEN 1 ELSE 0 END) AS BIGINT) AS n_primary_only,
          |  CAST(SUM(CASE WHEN status = 'secondary_only' THEN 1 ELSE 0 END) AS BIGINT) AS n_secondary_only
          |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("j3_dedup_antijoin",
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
        val incoming = p.filter(col("date") >= lit("1998-01-01").cast("date"))
        val existing = p.filter(col("date") >= lit("2000-01-01").cast("date"))
        incoming.join(existing.select("ticker", "date"), Seq("ticker", "date"), "left_anti")
          .select("ticker", "date", "close", "volume")
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """
          |SELECT i.ticker, i."date" AS "date", i.close, i.volume
          |FROM prices i
          |WHERE i."date" >= DATE '1998-01-01' AND NOT EXISTS (
          |  SELECT 1 FROM prices e
          |  WHERE e."date" >= DATE '2000-01-01'
          |    AND e.ticker = i.ticker AND e."date" = i."date")
          |ORDER BY i.ticker, i."date"""".stripMargin)),

    QueryDef("j4_asof_join",
      // daily closes as-of-joined to the latest quarterly benchmark —
      // the financial align operator the reference lacks; oracled
      // against DuckDB's NATIVE ASOF JOIN.
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
        val quarterly = p
          .groupBy(col("ticker"), to_date(date_trunc("quarter", col("date"))).as("qstart"))
          .agg(money2(sum(col("close").cast("decimal(18,2)"))).as("benchmark_close"))
        AsOfJoinOps.asOfJoinBackward(
          p.select("ticker", "date", "close"), quarterly,
          Seq("ticker"), "date", "qstart", Seq("benchmark_close"))
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """, qb AS (
          |  SELECT ticker, CAST(date_trunc('quarter', "date") AS DATE) AS qstart,
          |         CAST(ROUND(SUM(CAST(close AS DECIMAL(18,2))), 2) AS DOUBLE) AS benchmark_close
          |  FROM prices GROUP BY 1, 2)
          |SELECT p.ticker, p."date" AS "date", p.close, q.benchmark_close
          |FROM prices p ASOF JOIN qb q
          |  ON p.ticker = q.ticker AND p."date" >= q.qstart
          |ORDER BY p.ticker, p."date"""".stripMargin)),

    QueryDef("j5_asof_forward",
      // forward as-of: each daily close aligned to the NEXT quarter
      // start's benchmark — "next scheduled observation" alignment.
      // dropNoMatch gives inner semantics, matching DuckDB's native
      // (inner) ASOF JOIN with the comparison flipped; rows in a
      // ticker's last quarter have no future benchmark and drop out in
      // both engines.
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
        val quarterly = p
          .groupBy(col("ticker"), to_date(date_trunc("quarter", col("date"))).as("qstart"))
          .agg(money2(sum(col("close").cast("decimal(18,2)"))).as("benchmark_close"))
        AsOfJoinOps.asOfJoinForward(
          p.select("ticker", "date", "close"), quarterly,
          Seq("ticker"), "date", "qstart", Seq("benchmark_close"),
          dropNoMatch = true)
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """, qb AS (
          |  SELECT ticker, CAST(date_trunc('quarter', "date") AS DATE) AS qstart,
          |         CAST(ROUND(SUM(CAST(close AS DECIMAL(18,2))), 2) AS DOUBLE) AS benchmark_close
          |  FROM prices GROUP BY 1, 2)
          |SELECT p.ticker, p."date" AS "date", p.close, q.benchmark_close
          |FROM prices p ASOF JOIN qb q
          |  ON p.ticker = q.ticker AND p."date" <= q.qstart
          |ORDER BY p.ticker, p."date"""".stripMargin)),

    QueryDef("j6_salted_join",
      // the skew-salted join's correctness contract IS result-invariance:
      // salting the fact side and replicating the dimension must produce
      // exactly the plain join — so the oracle is the UNSALTED SQL join.
      // (SkewOpsSpec separately proves the hot key's rows actually spread
      // across salt buckets; this row proves the rewrite changes nothing.)
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
        val dim = t(s, dir, "supplier")
          .select(col("s_suppkey").as("ticker"), col("s_nationkey"))
        SkewOps.saltedJoin(p, dim, Seq("ticker"), salts = 8)
          .select("ticker", "date", "close", "s_nationkey")
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """
          |SELECT p.ticker, p."date" AS "date", p.close, s.s_nationkey
          |FROM prices p JOIN supplier s ON p.ticker = s.s_suppkey
          |ORDER BY p.ticker, p."date"""".stripMargin)),

    // ───────── aggregations ─────────

    QueryDef("a1_null_counts",
      (s, dir) => docs(s, dir).agg(
        count(lit(1)).as("n_rows"),
        sum(col("text").isNull.cast("long")).as("null_text"),
        sum(col("lang").isNull.cast("long")).as("null_lang"),
        sum(col("source").isNull.cast("long")).as("null_source"),
        sum(col("n_chars").isNull.cast("long")).as("null_n_chars")),
      Some("""SELECT count(*) AS n_rows,
             |  count(*) FILTER (WHERE text IS NULL) AS null_text,
             |  count(*) FILTER (WHERE lang IS NULL) AS null_lang,
             |  count(*) FILTER (WHERE source IS NULL) AS null_source,
             |  count(*) FILTER (WHERE n_chars IS NULL) AS null_n_chars
             |FROM documents""".stripMargin)),

    QueryDef("a2_duplicate_groups",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_orderkey", "l_partkey").agg(count(lit(1)).as("c"))
        .agg(
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_rows"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup_groups")),
      Some("""WITH g AS (
             |  SELECT l_orderkey, l_partkey, count(*) AS c
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS dup_rows,
             |       count(*) FILTER (WHERE c > 1) AS dup_groups
             |FROM g""".stripMargin)),

    QueryDef("a3_violation_counts",
      (s, dir) => t(s, dir, "lineitem").agg(
        sum((col("l_quantity") <= 0).cast("long")).as("nonpositive_qty"),
        sum((col("l_discount") > 0.08).cast("long")).as("high_discount"),
        sum((col("l_extendedprice") > 90000.0).cast("long")).as("big_price")),
      Some("""SELECT
             |  count(*) FILTER (WHERE l_quantity <= 0) AS nonpositive_qty,
             |  count(*) FILTER (WHERE l_discount > CAST(0.08 AS DOUBLE)) AS high_discount,
             |  count(*) FILTER (WHERE l_extendedprice > CAST(90000.0 AS DOUBLE)) AS big_price
             |FROM lineitem""".stripMargin)),

    QueryDef("a4_return_moments",
      (s, dir) => pricesWithRet(s, dir).agg(
        round(avg("ret"), 6).as("ret_mean"),
        round(stddev_samp("ret"), 6).as("ret_std"),
        count(col("ret")).as("n_ret")),
      Some(pricesSql + retSql +
        """
          |SELECT round(avg(ret), 6) AS ret_mean,
          |       round(stddev_samp(ret), 6) AS ret_std,
          |       count(ret) AS n_ret
          |FROM r""".stripMargin)),

    QueryDef("a5_ticker_span",
      (s, dir) => prices(t(s, dir, "lineitem"))
        .groupBy("ticker")
        .agg(min("date").as("first_date"), max("date").as("last_date"),
          count(lit(1)).as("n_days"))
        .orderBy("ticker"),
      Some(pricesSql +
        """
          |SELECT ticker, min("date") AS first_date, max("date") AS last_date,
          |       count(*) AS n_days
          |FROM prices GROUP BY ticker ORDER BY ticker""".stripMargin)),

    QueryDef("a10_percentiles",
      // exact interpolated percentiles per ticker (Spark `percentile` ≡
      // DuckDB `quantile_cont`; rounded to 6 dp because the interpolation
      // a + (b−a)·frac can differ by ulps across engines). The 100 TB
      // variant is `approx_percentile` (t-digest sketch, map-side
      // mergeable, no per-group sort) when ±ε quantiles suffice — exact
      // percentile buffers every value per group.
      (s, dir) => prices(t(s, dir, "lineitem"))
        .groupBy("ticker")
        .agg(
          round(expr("percentile(close, 0.5D)"), 6).as("p50_close"),
          round(expr("percentile(close, 0.95D)"), 6).as("p95_close"),
          round(expr("percentile(volume, 0.5D)"), 6).as("p50_volume"))
        .orderBy("ticker"),
      Some(pricesSql +
        """
          |SELECT ticker,
          |       round(quantile_cont(close, 0.5), 6) AS p50_close,
          |       round(quantile_cont(close, 0.95), 6) AS p95_close,
          |       round(quantile_cont(volume, 0.5), 6) AS p50_volume
          |FROM prices GROUP BY ticker ORDER BY ticker""".stripMargin)),

    QueryDef("a10b_approx_percentiles",
      // the declared 100 TB percentile path: `approx_percentile` is a
      // mergeable quantile sketch — map-side partials, no per-group
      // buffering of every value (exact `percentile` holds the whole
      // group in memory, which dies on a hot group at scale). Accuracy
      // 10000 → rank error ≤ n/10000 per group. The sketch is
      // Spark-specific, so no cross-engine oracle (rows-only check);
      // QueriesSpec bounds the sketch's error against the exact a10
      // percentiles at test scale instead.
      (s, dir) => prices(t(s, dir, "lineitem"))
        .groupBy("ticker")
        .agg(
          expr("approx_percentile(close, 0.5D, 10000)").as("p50_close"),
          expr("approx_percentile(close, 0.95D, 10000)").as("p95_close"),
          expr("approx_percentile(volume, 0.5D, 10000)").as("p50_volume"))
        .orderBy("ticker"),
      None),

    QueryDef("a11_vwap",
      // volume-weighted average price per ticker/day: both sums exact
      // decimal, ONE double division at the end, left UNROUNDED — the
      // inputs are bit-identical in both engines so the quotient is too,
      // and rounding would ADD a hazard (a quotient landing exactly on a
      // .5e-6 boundary splits Spark's HALF_UP from DuckDB's half-even —
      // observed live at sf0.001, 2058.8259375).
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("ticker"),
          to_date(col("l_shipdate")).as("date"))
        .agg((sum(col("l_extendedprice").cast("decimal(12,4)")).cast("double") /
            sum(col("l_quantity").cast("decimal(12,4)")).cast("double"))
          .as("vwap"))
        .orderBy("ticker", "date"),
      Some("""SELECT l_suppkey AS ticker, CAST(l_shipdate AS DATE) AS "date",
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
             |    / CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS vwap
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("a12_corr_matrix",
      // pairwise Pearson correlation of daily returns for a small ticker
      // universe: returns self-join on the date key, corr per pair,
      // 6dp-rounded (co-moment merge order costs ulps). The join shape is
      // right for small universes; a full market (10⁴ tickers) pivots to
      // a matrix and multiplies instead — pairs × days explodes as T².
      (s, dir) => {
        val r = pricesWithRet(s, dir)
          .filter(col("ticker") < 10 && col("ret").isNotNull)
          .select(col("ticker"), col("date"), col("ret"))
        val a = r.toDF("ta", "date", "ra")
        val b = r.toDF("tb", "date", "rb")
        a.join(b, Seq("date")).filter(col("ta") < col("tb"))
          .groupBy("ta", "tb")
          .agg(round(corr(col("ra"), col("rb")), 6).as("ret_corr"),
            count(lit(1)).as("n_days"))
          .orderBy("ta", "tb")
      },
      Some(pricesSql + retSql +
        """
          |SELECT a.ticker AS ta, b.ticker AS tb,
          |  round(corr(a.ret, b.ret), 6) AS ret_corr, count(*) AS n_days
          |FROM r a JOIN r b ON a."date" = b."date" AND a.ticker < b.ticker
          |WHERE a.ticker < 10 AND b.ticker < 10
          |  AND a.ret IS NOT NULL AND b.ret IS NOT NULL
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("a6_series_profile",
      (s, dir) => MacroOps.seriesProfile(
          events(s, dir).select(
            col("event_type").as("series_id"),
            to_date(col("ts")).as("date"),
            col("value")))
        .orderBy("series_id"),
      Some("""SELECT event_type AS series_id, count(*) AS record_count,
             |  count(*) FILTER (WHERE value IS NULL) AS null_values,
             |  min(value) AS min_value, max(value) AS max_value,
             |  min(CAST(ts AS DATE)) AS first_date, max(CAST(ts AS DATE)) AS last_date
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("a7_distinct_counts",
      (s, dir) => t(s, dir, "lineitem").agg(countDistinct("l_suppkey").as("n_suppliers"))
        .crossJoin(events(s, dir).agg(countDistinct("event_type").as("n_event_types")))
        .crossJoin(t(s, dir, "orders").agg(countDistinct("o_custkey").as("n_customers"))),
      Some("""SELECT
             |  (SELECT count(DISTINCT l_suppkey) FROM lineitem) AS n_suppliers,
             |  (SELECT count(DISTINCT event_type) FROM events) AS n_event_types,
             |  (SELECT count(DISTINCT o_custkey) FROM orders) AS n_customers""".stripMargin)),

    QueryDef("a7b_approx_distinct",
      // the 100 TB variant of a7: HyperLogLog++ sketches merge map-side
      // and shuffle O(sketch) per partition, where exact countDistinct
      // shuffles the full distinct-key set (its expand+two-phase agg is
      // the classic cardinality bottleneck). rsd 0.01 → ~1% standard
      // error. Sketch internals are engine-specific, so rows-only here;
      // QueriesSpec bounds the estimates against the exact a7 counts.
      (s, dir) => t(s, dir, "lineitem")
        .agg(approx_count_distinct(col("l_suppkey"), 0.01).as("n_suppliers"))
        .crossJoin(t(s, dir, "orders")
          .agg(approx_count_distinct(col("o_custkey"), 0.01).as("n_customers"))),
      None),

    QueryDef("a8_table_stats",
      (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("lineitem_rows"))
        .crossJoin(t(s, dir, "orders").agg(
          count(lit(1)).as("orders_rows"),
          min(to_date(col("o_orderdate"))).as("first_order"),
          max(to_date(col("o_orderdate"))).as("last_order")))
        .crossJoin(t(s, dir, "customer").agg(count(lit(1)).as("customer_rows"))),
      Some("""SELECT
             |  (SELECT count(*) FROM lineitem) AS lineitem_rows,
             |  (SELECT count(*) FROM orders) AS orders_rows,
             |  (SELECT min(CAST(o_orderdate AS DATE)) FROM orders) AS first_order,
             |  (SELECT max(CAST(o_orderdate AS DATE)) FROM orders) AS last_order,
             |  (SELECT count(*) FROM customer) AS customer_rows""".stripMargin)),

    // ───────── windows ─────────

    QueryDef("w2_pct_change",
      (s, dir) => pricesWithRet(s, dir)
        .select("ticker", "date", "close", "ret")
        .orderBy("ticker", "date"),
      Some(pricesSql + retSql +
        """
          |SELECT ticker, "date", close, ret FROM r ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("w5_features",
      (s, dir) => pricesWithRet(s, dir)
        .withColumn("ma20", FeatureOps.maExact2dp(col("close"), 20, wTicker))
        .withColumn("ma50", FeatureOps.maExact2dp(col("close"), 50, wTicker))
        .withColumn("vol20",
          round(FeatureOps.fullFrame((c: Column) => stddev_samp(c), col("ret"), 20, wTicker), 6))
        .select("ticker", "date", "close", "ret", "ma20", "ma50", "vol20")
        .orderBy("ticker", "date"),
      Some(pricesSql + retSql +
        """
          |SELECT ticker, "date", close, ret,
          |  CASE WHEN count(close) OVER w20 = 20
          |       THEN CAST(sum(CAST(close AS DECIMAL(18,2))) OVER w20 AS DOUBLE) / 20.0 END AS ma20,
          |  CASE WHEN count(close) OVER w50 = 50
          |       THEN CAST(sum(CAST(close AS DECIMAL(18,2))) OVER w50 AS DOUBLE) / 50.0 END AS ma50,
          |  CASE WHEN count(ret) OVER w20 = 20
          |       THEN round(stddev_samp(ret) OVER w20, 6) END AS vol20
          |FROM r
          |WINDOW
          |  w20 AS (PARTITION BY ticker ORDER BY "date" ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
          |  w50 AS (PARTITION BY ticker ORDER BY "date" ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
          |ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("w6_keep_last",
      (s, dir) => FeatureOps.keepLast(t(s, dir, "lineitem"), Seq("l_orderkey"),
          Seq("l_linenumber", "l_partkey", "l_suppkey", "l_quantity"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
             |FROM lineitem
             |QUALIFY row_number() OVER (PARTITION BY l_orderkey
             |  ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC, l_quantity DESC) = 1
             |ORDER BY l_orderkey""".stripMargin)),

    QueryDef("w7_zscore_outliers",
      (s, dir) => ValidationOps.withZScore(pricesWithRet(s, dir), "ret", "z").agg(
        sum((abs(col("z")) > 3.0).cast("long")).as("n_outliers"),
        count(col("ret")).as("n_scored")),
      Some(pricesSql + retSql +
        """, m AS (SELECT avg(ret) AS mu, stddev_samp(ret) AS sigma FROM r)
          |SELECT count(*) FILTER (WHERE abs((ret - mu) / sigma) > 3.0) AS n_outliers,
          |       count(ret) AS n_scored
          |FROM r, m""".stripMargin)),

    QueryDef("w8_missing_bdays",
      (s, dir) => ValidationOps.missingBusinessDays(
          prices(t(s, dir, "lineitem")).select("ticker", "date"), "ticker", "date")
        .orderBy("ticker"),
      Some(pricesSql +
        """, spans AS (SELECT ticker, min("date") AS d0, max("date") AS d1 FROM prices GROUP BY 1),
          |cal AS (
          |  SELECT ticker,
          |         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
          |  FROM spans),
          |missing AS (
          |  SELECT c.ticker, c.day FROM cal c
          |  WHERE isodow(c.day) <= 5 AND NOT EXISTS (
          |    SELECT 1 FROM prices p WHERE p.ticker = c.ticker AND p."date" = c.day))
          |SELECT ticker, count(*) AS missing_bdays
          |FROM missing GROUP BY 1 ORDER BY ticker""".stripMargin)),

    // ───────── set ops ─────────

    QueryDef("w9_gap_fill",
      // business-day gap repair: calendar-complete each ticker and
      // forward-fill close (values copied, never recomputed — bit-exact
      // cross-engine). w8 counts the gaps; w9 repairs them. The join is
      // FULL outer, so lineitem's weekend ship-dates stay in the series
      // (and fill forward into Monday) instead of being dropped.
      (s, dir) => FeatureOps.gapFillBusinessDays(
          prices(t(s, dir, "lineitem")).select("ticker", "date", "close"),
          "ticker", "date", "close")
        .orderBy("ticker", "date"),
      Some(pricesSql +
        """, spans AS (SELECT ticker, min("date") AS d0, max("date") AS d1 FROM prices GROUP BY 1),
          |cal AS (
          |  SELECT ticker,
          |         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS "date"
          |  FROM spans),
          |bd AS (SELECT ticker, "date" FROM cal WHERE isodow("date") <= 5),
          |j AS (
          |  SELECT COALESCE(b.ticker, p.ticker) AS ticker,
          |         COALESCE(b."date", p."date") AS "date", p.close
          |  FROM bd b FULL JOIN prices p
          |    ON b.ticker = p.ticker AND b."date" = p."date")
          |SELECT ticker, "date",
          |  last_value(close IGNORE NULLS) OVER (
          |    PARTITION BY ticker ORDER BY "date"
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled,
          |  close IS NULL AS was_missing
          |FROM j ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("w10_drawdown",
      // max drawdown per ticker: cumulative-max window then min of the
      // per-row ratio chain. Everything is exact-or-bit-identical (2dp
      // closes, one division, min picks an existing value) — UNROUNDED.
      (s, dir) => {
        val w = Window.partitionBy("ticker").orderBy("date")
          .rowsBetween(Window.unboundedPreceding, 0)
        prices(t(s, dir, "lineitem"))
          .withColumn("_runmax", max(col("close")).over(w))
          .withColumn("_dd", col("close") / col("_runmax") - 1)
          .groupBy("ticker")
          .agg(min(col("_dd")).as("max_drawdown"))
          .orderBy("ticker")
      },
      Some(pricesSql +
        """, dd AS (
          |  SELECT ticker,
          |    close / max(close) OVER (PARTITION BY ticker ORDER BY "date"
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS d
          |  FROM prices)
          |SELECT ticker, min(d) AS max_drawdown
          |FROM dd GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("w11_rsi",
      // RSI-14 (SMA variant): rolling mean gains vs losses over a FULL
      // 14-row frame (pandas min_periods parity — null until complete),
      // explicit zero-loss guard (100 by definition; double/0 is null in
      // Spark but inf in DuckDB, so the guard is also the portability
      // fix). Multi-term float means → final value rounded 6dp.
      (s, dir) => {
        val w14 = wTicker.rowsBetween(-13, 0)
        pricesWithRet(s, dir)
          // explicit null gate: greatest() IGNORES nulls in Spark (null
          // ret would become gain 0.0 and count toward the average) and
          // engines disagree on greatest(NULL, x) — null in, null out
          .withColumn("_gain",
            when(col("ret").isNull, lit(null)).otherwise(greatest(col("ret"), lit(0.0))))
          .withColumn("_loss",
            when(col("ret").isNull, lit(null)).otherwise(greatest(-col("ret"), lit(0.0))))
          .withColumn("_n", count(col("ret")).over(w14))
          .withColumn("_ag", avg(col("_gain")).over(w14))
          .withColumn("_al", avg(col("_loss")).over(w14))
          .select(col("ticker"), col("date"),
            round(when(col("_n") < 14, lit(null))
              .when(col("_al") === 0.0, lit(100.0))
              .otherwise(lit(100.0) -
                lit(100.0) / (lit(1.0) + col("_ag") / col("_al"))), 6)
              .as("rsi14"))
          .orderBy("ticker", "date")
      },
      Some(pricesSql + retSql +
        """, g AS (
          |  SELECT ticker, "date", ret,
          |    CASE WHEN ret IS NULL THEN NULL ELSE greatest(ret, 0.0) END AS gain,
          |    CASE WHEN ret IS NULL THEN NULL ELSE greatest(-ret, 0.0) END AS loss
          |  FROM r),
          |a AS (
          |  SELECT ticker, "date",
          |    count(ret) OVER w AS n,
          |    avg(gain) OVER w AS ag, avg(loss) OVER w AS al
          |  FROM g
          |  WINDOW w AS (PARTITION BY ticker ORDER BY "date"
          |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
          |SELECT ticker, "date",
          |  round(CASE WHEN n < 14 THEN NULL
          |             WHEN al = 0.0 THEN 100.0
          |             ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 6) AS rsi14
          |FROM a ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("w12_winsorize",
      // outlier winsorization: clamp close to its per-ticker [p05, p95].
      // Cut points broadcast back (the quantileBucket shape); cuts are
      // 6dp-rounded per the a10 interpolation contract, the clamp itself
      // picks existing exact values — no other rounding.
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
        val cuts = p.groupBy("ticker").agg(
          round(expr("percentile(close, 0.05D)"), 6).as("_lo"),
          round(expr("percentile(close, 0.95D)"), 6).as("_hi"))
        p.join(broadcast(cuts), Seq("ticker"))
          .select(col("ticker"), col("date"),
            least(greatest(col("close"), col("_lo")), col("_hi")).as("close_w"))
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """, cuts AS (
          |  SELECT ticker,
          |    round(quantile_cont(close, 0.05), 6) AS lo,
          |    round(quantile_cont(close, 0.95), 6) AS hi
          |  FROM prices GROUP BY 1)
          |SELECT p.ticker, p."date",
          |  least(greatest(p.close, c.lo), c.hi) AS close_w
          |FROM prices p JOIN cuts c USING (ticker)
          |ORDER BY 1, 2""".stripMargin)),

    QueryDef("w13_weekly_ohlc",
      // resampling daily bars to weekly OHLC: ordered-aggregation via
      // min_by/max_by on the date (DuckDB arg_min/arg_max) — one hash
      // aggregate, no window, no sort. Monday-start weeks in both
      // engines; all outputs are existing exact values or exact sums.
      (s, dir) => prices(t(s, dir, "lineitem"))
        .groupBy(col("ticker"),
          date_trunc("week", col("date")).cast("date").as("week"))
        .agg(
          min_by(col("close"), col("date")).as("open"),
          max(col("close")).as("high"),
          min(col("close")).as("low"),
          max_by(col("close"), col("date")).as("close"),
          sum(col("volume").cast("decimal(18,2)")).cast("double").as("volume"))
        .orderBy("ticker", "week"),
      Some(pricesSql +
        """
          |SELECT ticker, date_trunc('week', "date") AS week,
          |  arg_min(close, "date") AS open,
          |  max(close) AS high, min(close) AS low,
          |  arg_max(close, "date") AS close,
          |  CAST(SUM(CAST(volume AS DECIMAL(18,2))) AS DOUBLE) AS volume
          |FROM prices GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("w22_interpolate",
      // gap repair by linear interpolation ([[FeatureOps
      // .interpolateBusinessDays]]) — w9's forward fill estimates a
      // missing Tuesday as Monday's value; this one draws the line to
      // the next observation (pandas interpolate(method='time')). Day
      // deltas are exact ints and both engines run the identical IEEE
      // expression UNROUNDED — bit-exact by IEEE determinism (a 6dp
      // round re-introduced engine-specific boundary flips; measured:
      // exactly one row in 193k sat on a .5 boundary).
      (s, dir) => FeatureOps.interpolateBusinessDays(
          prices(t(s, dir, "lineitem")).select("ticker", "date", "close"),
          "ticker", "date", "close")
        .orderBy("ticker", "date"),
      Some(pricesSql +
        """, spans AS (SELECT ticker, min("date") AS d0, max("date") AS d1 FROM prices GROUP BY 1),
          |cal AS (
          |  SELECT ticker,
          |         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS "date"
          |  FROM spans),
          |bd AS (SELECT ticker, "date" FROM cal WHERE isodow("date") <= 5),
          |j AS (
          |  SELECT COALESCE(b.ticker, p.ticker) AS ticker,
          |         COALESCE(b."date", p."date") AS "date", p.close
          |  FROM bd b FULL JOIN prices p
          |    ON b.ticker = p.ticker AND b."date" = p."date"),
          |nb AS (
          |  SELECT ticker, "date", close,
          |    last_value(close IGNORE NULLS) OVER wb AS pv,
          |    last_value(CASE WHEN close IS NOT NULL THEN "date" END IGNORE NULLS)
          |      OVER wb AS pt,
          |    first_value(close IGNORE NULLS) OVER wf AS nv,
          |    first_value(CASE WHEN close IS NOT NULL THEN "date" END IGNORE NULLS)
          |      OVER wf AS nt
          |  FROM j
          |  WINDOW wb AS (PARTITION BY ticker ORDER BY "date"
          |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          |         wf AS (PARTITION BY ticker ORDER BY "date"
          |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
          |SELECT ticker, "date",
          |  CASE WHEN close IS NOT NULL THEN close
          |       WHEN pv IS NULL THEN nv
          |       WHEN nv IS NULL THEN pv
          |       ELSE pv + (nv - pv) *
          |              (CAST("date" - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
          |  END AS close_interp,
          |  close IS NULL AS was_missing
          |FROM nb ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("a20_fk_violations",
      // referential-integrity audit over the catalog's declared FKs —
      // one row per relationship with checked/orphan counts. Each
      // relationship is ONE fact scan with a broadcast left join
      // against the (distinct, key-only) dimension and a fused count/
      // sum aggregation; the five single-row results union. Zero
      // orphans is the passing grade — the audit exists to PROVE it
      // nightly, not assume it.
      (s, dir) => {
        def audit(rel: String, fact: DataFrame, key: String,
            dim: DataFrame, dimKey: String): DataFrame =
          fact.select(col(key))
            .join(broadcast(dim.select(col(dimKey).as(key)).distinct()
              .withColumn("_hit", lit(1))), Seq(key), "left")
            .agg(count(lit(1)).as("n_checked"),
              sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
            .select(lit(rel).as("relationship"), col("n_checked"), col("n_orphans"))
        audit("customer.nationkey->nation", t(s, dir, "customer"), "c_nationkey",
            t(s, dir, "nation"), "n_nationkey")
          .unionByName(audit("lineitem.partkey->part", t(s, dir, "lineitem"),
            "l_partkey", t(s, dir, "part"), "p_partkey"))
          .unionByName(audit("lineitem.suppkey->supplier", t(s, dir, "lineitem"),
            "l_suppkey", t(s, dir, "supplier"), "s_suppkey"))
          .unionByName(audit("nation.regionkey->region", t(s, dir, "nation"),
            "n_regionkey", t(s, dir, "region"), "r_regionkey"))
          .unionByName(audit("orders.custkey->customer", t(s, dir, "orders"),
            "o_custkey", t(s, dir, "customer"), "c_custkey"))
          .orderBy("relationship")
      },
      Some("""SELECT 'customer.nationkey->nation' AS relationship,
             |  count(*) AS n_checked,
             |  CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
             |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
             |UNION ALL
             |SELECT 'lineitem.partkey->part', count(*),
             |  CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
             |UNION ALL
             |SELECT 'lineitem.suppkey->supplier', count(*),
             |  CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |UNION ALL
             |SELECT 'nation.regionkey->region', count(*),
             |  CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
             |UNION ALL
             |SELECT 'orders.custkey->customer', count(*),
             |  CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
             |ORDER BY 1""".stripMargin)),

    QueryDef("a21_unpivot",
      // long-form melt of the weekly OHLC frame (the a17 pivot's
      // inverse): Spark's native unpivot — a scan-local generator
      // expression, 4 output rows per input row, no shuffle beyond
      // the OHLC aggregation it reads. The oracle melts with UNPIVOT.
      (s, dir) => prices(t(s, dir, "lineitem"))
        .groupBy(col("ticker"),
          date_trunc("week", col("date")).cast("date").as("week"))
        .agg(
          min_by(col("close"), col("date")).as("open"),
          max(col("close")).as("high"),
          min(col("close")).as("low"),
          max_by(col("close"), col("date")).as("close"))
        .unpivot(Array(col("ticker"), col("week")),
          Array(col("open"), col("high"), col("low"), col("close")),
          "field", "value")
        .orderBy("ticker", "week", "field"),
      Some(pricesSql +
        """, ohlc AS (
          |  SELECT ticker, date_trunc('week', "date") AS week,
          |    arg_min(close, "date") AS open,
          |    max(close) AS high, min(close) AS low,
          |    arg_max(close, "date") AS close
          |  FROM prices GROUP BY 1, 2)
          |SELECT ticker, week, field, value
          |FROM (UNPIVOT ohlc ON open, high, low, close
          |      INTO NAME field VALUE value)
          |ORDER BY ticker, week, field""".stripMargin)),

    QueryDef("w17_macd",
      // MACD through the truncated-EWMA machinery ([[FeatureOps
      // .withEwma]] composed three times): macd = ewma12 − ewma26 of
      // close, signal = ewma9 OF THE MACD COLUMN (an EWMA over a
      // derived series — the composition w14 pins the primitive for),
      // histogram = macd − signal. All three window passes share the
      // per-ticker exchange; every fold is ordered, so DuckDB replays
      // the doubles bit-for-bit through two stacked list windows.
      (s, dir) => {
        val base = prices(t(s, dir, "lineitem"))
        val e12 = FeatureOps.withEwma(base, "ticker", "date", "close",
          span = 12, lookback = 12, out = "e12")
        val e26 = FeatureOps.withEwma(e12, "ticker", "date", "close",
          span = 26, lookback = 26, out = "e26")
        val m = e26.withColumn("macd", col("e12") - col("e26"))
        val sig = FeatureOps.withEwma(m, "ticker", "date", "macd",
          span = 9, lookback = 9, out = "signal")
        sig.select(col("ticker"), col("date"),
            round(col("macd"), 6).as("macd"), col("signal"),
            round(col("macd") - col("signal"), 6).as("hist"))
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """, r2 AS (
          |  SELECT ticker, "date", close,
          |         row_number() OVER (PARTITION BY ticker ORDER BY "date") AS rn
          |  FROM prices),
          |l12 AS (
          |  SELECT ticker, "date", rn,
          |         list(struct_pack(rn := rn, c := close))
          |           OVER (PARTITION BY ticker ORDER BY "date"
          |                 ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS h
          |  FROM r2),
          |e12 AS (
          |  SELECT ticker, "date", rn,
          |    round(list_sum(list_transform(h, e -> e.c * pow(1.0 - 2.0/13.0, rn - e.rn)))
          |          / ((1 - pow(1.0 - 2.0/13.0, len(h))) / (2.0/13.0)), 6) AS v
          |  FROM l12),
          |l26 AS (
          |  SELECT ticker, "date", rn,
          |         list(struct_pack(rn := rn, c := close))
          |           OVER (PARTITION BY ticker ORDER BY "date"
          |                 ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) AS h
          |  FROM r2),
          |e26 AS (
          |  SELECT ticker, "date", rn,
          |    round(list_sum(list_transform(h, e -> e.c * pow(1.0 - 2.0/27.0, rn - e.rn)))
          |          / ((1 - pow(1.0 - 2.0/27.0, len(h))) / (2.0/27.0)), 6) AS v
          |  FROM l26),
          |m AS (
          |  SELECT e12.ticker, e12."date", e12.rn, e12.v - e26.v AS macd
          |  FROM e12 JOIN e26 ON e12.ticker = e26.ticker AND e12.rn = e26.rn),
          |l9 AS (
          |  SELECT ticker, "date", rn, macd,
          |         list(struct_pack(rn := rn, c := macd))
          |           OVER (PARTITION BY ticker ORDER BY "date"
          |                 ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS h
          |  FROM m),
          |sg AS (
          |  SELECT ticker, "date", macd,
          |    round(list_sum(list_transform(h, e -> e.c * pow(1.0 - 2.0/10.0, rn - e.rn)))
          |          / ((1 - pow(1.0 - 2.0/10.0, len(h))) / (2.0/10.0)), 6) AS s
          |  FROM l9)
          |SELECT ticker, "date", round(macd, 6) AS macd, s AS signal,
          |       round(macd - s, 6) AS hist
          |FROM sg ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("w16_standardize",
      // per-entity feature standardization: (close − mean)/stddev over
      // each ticker's own history — the preprocessing step before any
      // scale-sensitive model consumes a panel of heterogeneous price
      // levels. Per-ticker moments reduce in ONE hash aggregation and
      // broadcast back (the w12 cut-points shape — no window, no sort);
      // zero-variance tickers yield null visibly (both engines guard
      // double/0 the same way).
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
        val m = p.groupBy("ticker").agg(
          avg(col("close")).as("_mu"),
          stddev_samp(col("close")).as("_sd"))
        p.join(broadcast(m), Seq("ticker"))
          .select(col("ticker"), col("date"),
            round(when(col("_sd") === 0.0, lit(null))
              .otherwise((col("close") - col("_mu")) / col("_sd")), 6).as("z"))
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """, m AS (
          |  SELECT ticker, avg(close) AS mu, stddev_samp(close) AS sd
          |  FROM prices GROUP BY 1)
          |SELECT p.ticker, p."date",
          |  round(CASE WHEN m.sd = 0.0 THEN NULL
          |             ELSE (p.close - m.mu) / m.sd END, 6) AS z
          |FROM prices p JOIN m USING (ticker)
          |ORDER BY p.ticker, p."date"""".stripMargin)),

    QueryDef("w15_bollinger",
      // Bollinger bands: 20-day mid ± 2σ with pandas min_periods parity
      // (null until the frame is full — the w5/w11 guard). One window
      // spec serves count/avg/stddev, so Catalyst plans a single
      // exchange+sort; multi-term float moments → 6dp round.
      (s, dir) => {
        val w20 = wTicker.rowsBetween(-19, 0)
        prices(t(s, dir, "lineitem"))
          .withColumn("_n", count(col("close")).over(w20))
          .withColumn("_ma", avg(col("close")).over(w20))
          .withColumn("_sd", stddev_samp(col("close")).over(w20))
          .select(col("ticker"), col("date"),
            round(when(col("_n") < 20, lit(null)).otherwise(col("_ma")), 6).as("mid"),
            round(when(col("_n") < 20, lit(null))
              .otherwise(col("_ma") + lit(2.0) * col("_sd")), 6).as("upper"),
            round(when(col("_n") < 20, lit(null))
              .otherwise(col("_ma") - lit(2.0) * col("_sd")), 6).as("lower"))
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """, a AS (
          |  SELECT ticker, "date",
          |    count(close) OVER w AS n,
          |    avg(close) OVER w AS ma,
          |    stddev_samp(close) OVER w AS sd
          |  FROM prices
          |  WINDOW w AS (PARTITION BY ticker ORDER BY "date"
          |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
          |SELECT ticker, "date",
          |  round(CASE WHEN n < 20 THEN NULL ELSE ma END, 6) AS mid,
          |  round(CASE WHEN n < 20 THEN NULL ELSE ma + 2.0 * sd END, 6) AS upper,
          |  round(CASE WHEN n < 20 THEN NULL ELSE ma - 2.0 * sd END, 6) AS lower
          |FROM a ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("w14_ewma",
      // truncated EWMA-20 ([[graft.ops.FeatureOps.withEwma]], pandas
      // `ewm(span=20, adjust=True)` over the last 20 rows): the
      // weighted numerator is an ORDERED left fold over the frame's
      // (rn, close) structs and the denominator the closed-form
      // geometric sum — DuckDB folds the SAME list in the same order
      // (list window aggregate + list_transform/list_sum), so the
      // doubles agree bit-for-bit before the 6dp round. Bounded
      // 20-row frame: per-row state independent of history length.
      (s, dir) => FeatureOps.withEwma(prices(t(s, dir, "lineitem")),
          "ticker", "date", "close", span = 20, lookback = 20, out = "ewma20")
        .select("ticker", "date", "ewma20")
        .orderBy("ticker", "date"),
      Some(pricesSql +
        """, r2 AS (
          |  SELECT ticker, "date", close,
          |         row_number() OVER (PARTITION BY ticker ORDER BY "date") AS rn
          |  FROM prices),
          |l AS (
          |  SELECT ticker, "date", rn,
          |         list(struct_pack(rn := rn, c := close))
          |           OVER (PARTITION BY ticker ORDER BY "date"
          |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS h
          |  FROM r2)
          |SELECT ticker, "date",
          |  round(list_sum(list_transform(h, e -> e.c * pow(1.0 - 2.0/21.0, rn - e.rn)))
          |        / ((1 - pow(1.0 - 2.0/21.0, len(h))) / (2.0/21.0)), 6) AS ewma20
          |FROM l ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("a13_sharpe",
      // annualized Sharpe per ticker: mean/stddev of daily returns ×
      // √252. Multi-term float moments → 6dp round; explicit zero-vol
      // guard (double/0 is null in Spark, inf in DuckDB).
      (s, dir) => pricesWithRet(s, dir)
        .groupBy("ticker")
        .agg(round(
          when(stddev_samp(col("ret")) === 0.0, lit(null))
            .otherwise(avg(col("ret")) / stddev_samp(col("ret")) *
              lit(math.sqrt(252.0))), 6).as("sharpe"),
          count(col("ret")).as("n_days"))
        .orderBy("ticker"),
      Some(pricesSql + retSql +
        """
          |SELECT ticker,
          |  round(CASE WHEN stddev_samp(ret) = 0.0 THEN NULL
          |             ELSE avg(ret) / stddev_samp(ret) * sqrt(252.0) END, 6) AS sharpe,
          |  count(ret) AS n_days
          |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("a14_psi_drift",
      // Population Stability Index of the per-ticker daily-return
      // distribution, early era (before 1995-06-01) vs late — the
      // standard training-data drift monitor (PSI = Σ (p−q)·ln(p/q)
      // over histogram buckets; > 0.2 conventionally flags a shifted
      // feature). Buckets are a fixed literal CASE chain over the
      // bit-reproducible `ret`; fractions are Laplace-smoothed
      // (cnt+1)/(n+8) over the OBSERVED bucket set, which both engines
      // materialize identically because the exact counts do. Scale
      // shape: ONE data-sized aggregation to (ticker, bucket), then a
      // bounded window (≤ 8 rows per ticker) for the totals and the
      // per-ticker sum — history never shuffles twice. ln-sum → 6dp.
      (s, dir) => {
        val early = col("date") < lit("1995-06-01").cast("date")
        val bucket = when(col("ret") < -0.02, 0).when(col("ret") < -0.01, 1)
          .when(col("ret") < -0.005, 2).when(col("ret") < 0.0, 3)
          .when(col("ret") < 0.005, 4).when(col("ret") < 0.01, 5)
          .when(col("ret") < 0.02, 6).otherwise(7)
        val counts = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .groupBy(col("ticker"), bucket.as("bucket"))
          .agg(sum(when(early, 1L).otherwise(0L)).as("ca"),
            sum(when(early, 0L).otherwise(1L)).as("cb"))
        val wT = Window.partitionBy("ticker")
        val p = (col("ca") + 1).cast("double") / (sum("ca").over(wT) + 8)
        val q = (col("cb") + 1).cast("double") / (sum("cb").over(wT) + 8)
        counts.withColumn("term", (p - q) * log(p / q))
          .groupBy("ticker")
          .agg(round(sum(col("term")), 6).as("psi"),
            sum("ca").as("n_early"), sum("cb").as("n_late"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, bk AS (
          |  SELECT ticker,
          |    CASE WHEN ret < -0.02 THEN 0 WHEN ret < -0.01 THEN 1
          |         WHEN ret < -0.005 THEN 2 WHEN ret < 0.0 THEN 3
          |         WHEN ret < 0.005 THEN 4 WHEN ret < 0.01 THEN 5
          |         WHEN ret < 0.02 THEN 6 ELSE 7 END AS bucket,
          |    CASE WHEN "date" < DATE '1995-06-01' THEN 1 ELSE 0 END AS early
          |  FROM r WHERE ret IS NOT NULL),
          |c AS (
          |  SELECT ticker, bucket,
          |    CAST(SUM(early) AS BIGINT) AS ca,
          |    CAST(SUM(1 - early) AS BIGINT) AS cb
          |  FROM bk GROUP BY 1, 2),
          |tt AS (
          |  SELECT ticker, ca, cb,
          |    SUM(ca) OVER (PARTITION BY ticker) AS na,
          |    SUM(cb) OVER (PARTITION BY ticker) AS nb
          |  FROM c)
          |SELECT ticker,
          |  round(SUM((CAST(ca + 1 AS DOUBLE) / (na + 8)
          |             - CAST(cb + 1 AS DOUBLE) / (nb + 8))
          |        * ln((CAST(ca + 1 AS DOUBLE) / (na + 8))
          |             / (CAST(cb + 1 AS DOUBLE) / (nb + 8)))), 6) AS psi,
          |  CAST(SUM(ca) AS BIGINT) AS n_early,
          |  CAST(SUM(cb) AS BIGINT) AS n_late
          |FROM tt GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("a16_rollup",
      // hierarchical grouping-sets revenue: (region, nation) + region
      // subtotals + grand total in ONE pass — rollup expands to grouping
      // sets inside the same hash aggregation (map-side partials across
      // all levels), not three scans. Dimensions broadcast (region 5 /
      // nation 25 / supplier 100 rows — the canonical star-join shape).
      // NULL group keys mark subtotal rows; both engines order them
      // first explicitly.
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_suppkey"), revenueDec.as("_rev"))
        val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val reg = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_items"), money2(sum(col("_rev"))).as("revenue"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      },
      Some("""SELECT r_name, n_name, count(*) AS n_items,
             |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
             |      * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)
             |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)),

    QueryDef("a19_cube",
      // full CUBE over (region, nation) with an explicit grouping_id —
      // a16's rollup gives the hierarchy; CUBE adds the nation-level
      // slice ACROSS regions (gid=2), and the gid column is the
      // machine-readable subtotal marker (NULL-in-data vs NULL-as-
      // subtotal stay distinguishable). Same single hash aggregation
      // expanding to all four grouping sets with map-side partials;
      // Spark and DuckDB agree on the bit order (first column = MSB).
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_suppkey"), revenueDec.as("_rev"))
        val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val reg = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .cube(col("r_name"), col("n_name"))
          .agg(grouping_id().cast("int").as("gid"),
            count(lit(1)).as("n_items"), money2(sum(col("_rev"))).as("revenue"))
          .orderBy(col("gid"), col("r_name").asc_nulls_first,
            col("n_name").asc_nulls_first)
      },
      Some("""SELECT r_name, n_name,
             |  CAST(GROUPING_ID(r_name, n_name) AS INTEGER) AS gid,
             |  count(*) AS n_items,
             |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
             |      * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY CUBE (r_name, n_name)
             |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)),

    QueryDef("a17_pivot",
      // long→wide pivot: daily event matrix with one (count, decimal
      // value-sum) column pair per event type. The pivot VALUES are
      // pinned literals — Spark otherwise runs a distinct-scan job just
      // to discover them, and a pinned list keeps the output schema
      // stable when a day is missing a type (cells of an absent group
      // are NULL, which the oracle mirrors with NULLIF/FILTER). One
      // hash aggregation keyed by day — the pivot is column routing
      // inside the agg, not a join.
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .pivot("event_type", types)
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("val"))
          .orderBy("day")
      },
      Some {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val cols = types.map { ty =>
          s"""  NULLIF(count(*) FILTER (WHERE event_type = '$ty'), 0) AS ${ty}_n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = '$ty')
             |       AS DOUBLE) AS ${ty}_val""".stripMargin
        }.mkString(",\n")
        s"""SELECT CAST(ts AS DATE) AS day,
           |$cols
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    QueryDef("a18_trend",
      // per-entity OLS trend line (slope / intercept / R²) of close on
      // a day index — the drift detector next to a14's PSI. Spark's
      // regr_* aggregates are single-pass co-moment accumulators with
      // map-side partials (never a window, never a collect); co-moment
      // merge order costs ulps, so the 6dp round is the cross-engine
      // contract (the a12-corr precedent).
      (s, dir) => prices(t(s, dir, "lineitem"))
        .withColumn("x",
          datediff(col("date"), lit("1995-01-01").cast("date")).cast("double"))
        .groupBy("ticker")
        .agg(count(lit(1)).as("n_days"),
          round(expr("regr_slope(close, x)"), 6).as("slope"),
          round(expr("regr_intercept(close, x)"), 6).as("intercept"),
          round(expr("regr_r2(close, x)"), 6).as("r2"))
        .orderBy("ticker"),
      Some(pricesSql +
        """SELECT ticker, count(*) AS n_days,
          |  round(regr_slope(close, CAST("date" - DATE '1995-01-01' AS DOUBLE)), 6) AS slope,
          |  round(regr_intercept(close, CAST("date" - DATE '1995-01-01' AS DOUBLE)), 6) AS intercept,
          |  round(regr_r2(close, CAST("date" - DATE '1995-01-01' AS DOUBLE)), 6) AS r2
          |FROM prices GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("w21_seasonality",
      // trend-seasonality decomposition: per-ticker OLS detrend (the
      // a18 fit, UNROUNDED) then the weekday profile of the residuals —
      // mean residual per (ticker, weekday 0=Mon). The fit frame is
      // ticker-cardinality and broadcasts back onto the scan; one
      // further hash agg on (ticker, weekday). Engine co-moment ulps
      // (~1e-14 in slope, ~1e-12 in a residual mean) sit far under the
      // 6dp output rounding — the a12/a18 contract.
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
          .withColumn("x",
            datediff(col("date"), lit("1995-01-01").cast("date")).cast("double"))
        val fit = p.groupBy("ticker").agg(
          expr("regr_slope(close, x)").as("_m"),
          expr("regr_intercept(close, x)").as("_b"))
        p.join(broadcast(fit), "ticker")
          .withColumn("_r", col("close") - (col("_b") + col("_m") * col("x")))
          .groupBy(col("ticker"), weekday(col("date")).cast("int").as("wd"))
          .agg(count(lit(1)).as("n_days"),
            round(avg(col("_r")), 6).as("mean_resid"))
          .orderBy("ticker", "wd")
      },
      Some(pricesSql +
        """, px AS (SELECT ticker, "date", close,
          |    CAST("date" - DATE '1995-01-01' AS DOUBLE) AS x FROM prices),
          |fit AS (SELECT ticker, regr_slope(close, x) AS m,
          |          regr_intercept(close, x) AS b FROM px GROUP BY 1)
          |SELECT p.ticker, CAST(isodow(p."date") - 1 AS INTEGER) AS wd,
          |  count(*) AS n_days,
          |  round(avg(p.close - (f.b + f.m * p.x)), 6) AS mean_resid
          |FROM px p JOIN fit f USING (ticker)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("w23_rolling_corr",
      // 20-day rolling correlation of each ticker against the market
      // index (sum of all closes per day) — the time-varying-beta
      // signal next to a12's full-sample matrix. Determinism by EXACT
      // ARITHMETIC: all five co-moment sums (Σx Σy Σxy Σx² Σy²)
      // accumulate as DECIMAL inside the window (2dp closes cast back
      // to exact decimals; products sized to stay within 38 digits),
      // so both engines hold identical integers before the one double
      // formula + 6dp round. Full-frame guard (n=20) like w5; zero
      // variance → null.
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
          .select(col("ticker"), col("date"),
            col("close").cast("decimal(12,2)").as("x"))
        val idx = p.groupBy("date")
          .agg(sum(col("x")).cast("decimal(18,2)").as("y"))
        val w20 = org.apache.spark.sql.expressions.Window
          .partitionBy("ticker").orderBy("date").rowsBetween(-19, 0)
        p.join(idx, "date")
          .select(col("ticker"), col("date"),
            count(lit(1)).over(w20).as("_n"),
            sum(col("x")).over(w20).cast("double").as("_sx"),
            sum(col("y")).over(w20).cast("double").as("_sy"),
            sum(col("x") * col("y")).over(w20).cast("double").as("_sxy"),
            sum(col("x") * col("x")).over(w20).cast("double").as("_sxx"),
            sum(col("y") * col("y")).over(w20).cast("double").as("_syy"))
          .select(col("ticker"), col("date"),
            when(col("_n") === 20 &&
                (lit(20.0) * col("_sxx") - col("_sx") * col("_sx")) > 0 &&
                (lit(20.0) * col("_syy") - col("_sy") * col("_sy")) > 0,
              round((lit(20.0) * col("_sxy") - col("_sx") * col("_sy")) /
                sqrt((lit(20.0) * col("_sxx") - col("_sx") * col("_sx")) *
                     (lit(20.0) * col("_syy") - col("_sy") * col("_sy"))), 6))
              .as("corr20"))
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """, px AS (SELECT ticker, "date", CAST(close AS DECIMAL(12,2)) AS x
          |         FROM prices),
          |idx AS (SELECT "date", CAST(SUM(x) AS DECIMAL(18,2)) AS y
          |        FROM px GROUP BY 1),
          |co AS (
          |  SELECT px.ticker, px."date",
          |    count(*) OVER w AS n,
          |    CAST(SUM(x) OVER w AS DOUBLE) AS sx,
          |    CAST(SUM(y) OVER w AS DOUBLE) AS sy,
          |    CAST(SUM(x * y) OVER w AS DOUBLE) AS sxy,
          |    CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx,
          |    CAST(SUM(y * y) OVER w AS DOUBLE) AS syy
          |  FROM px JOIN idx USING ("date")
          |  WINDOW w AS (PARTITION BY ticker ORDER BY "date"
          |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
          |SELECT ticker, "date",
          |  CASE WHEN n = 20 AND (20.0 * sxx - sx * sx) > 0
          |            AND (20.0 * syy - sy * sy) > 0
          |       THEN round((20.0 * sxy - sx * sy) /
          |              sqrt((20.0 * sxx - sx * sx) * (20.0 * syy - sy * sy)), 6)
          |  END AS corr20
          |FROM co ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("w19_mad_outliers",
      // robust median/MAD outlier profile per ticker — the
      // breakdown-resistant twin of w7's pooled z-score. Exact
      // percentile both sides (identical lo + (hi−lo)·frac
      // interpolation); the outlier comparison runs on UNROUNDED
      // bit-identical doubles, only the reported stats round.
      (s, dir) => ValidationOps.madOutliers(
        prices(t(s, dir, "lineitem")), "ticker", "close", k = 5.0),
      Some(pricesSql +
        """, med AS (SELECT ticker, quantile_cont(close, 0.5) AS med
          |          FROM prices GROUP BY 1),
          |dev AS (SELECT p.ticker, abs(p.close - m.med) AS adev, m.med
          |        FROM prices p JOIN med m USING (ticker)),
          |mad AS (SELECT ticker, quantile_cont(adev, 0.5) AS mad
          |        FROM dev GROUP BY 1)
          |SELECT d.ticker, count(*) AS n, round(min(d.med), 6) AS median,
          |  round(min(m.mad), 6) AS mad,
          |  count(*) FILTER (WHERE d.adev > 5.0 * m.mad) AS n_outliers
          |FROM dev d JOIN mad m USING (ticker)
          |GROUP BY d.ticker ORDER BY d.ticker""".stripMargin)),

    QueryDef("scd1_scd2",
      // SCD type-2 history compression: each ticker's price-band series
      // collapses into validity intervals (gaps-and-islands — 1-lag
      // change flag, running-sum island id, one agg). All-integer/date:
      // exact cross-engine replay, no rounding contract.
      (s, dir) => HistoryOps.scd2Compress(
        prices(t(s, dir, "lineitem"))
          .withColumn("band", floor(col("close") / lit(1000.0)).cast("int")),
        "ticker", "date", "band"),
      Some(pricesSql +
        """, b AS (SELECT ticker, "date",
          |          CAST(FLOOR(close / 1000.0) AS INTEGER) AS band FROM prices),
          |f AS (SELECT ticker, "date", band,
          |  CASE WHEN lag(band) OVER (PARTITION BY ticker ORDER BY "date")
          |            IS NOT DISTINCT FROM band THEN 0 ELSE 1 END AS chg
          |  FROM b),
          |g AS (SELECT ticker, "date", band,
          |  SUM(chg) OVER (PARTITION BY ticker ORDER BY "date"
          |                 ROWS UNBOUNDED PRECEDING) AS grp FROM f)
          |SELECT ticker, min(band) AS band, min("date") AS valid_from,
          |  max("date") AS valid_to, count(*) AS n_periods
          |FROM g GROUP BY ticker, grp ORDER BY ticker, valid_from""".stripMargin)),

    QueryDef("d23_temporal_split",
      // walk-forward split with an embargo buffer (purged backtest
      // split): orders before the cutoff train, a 30-day quarantine
      // absorbs autocorrelation leakage, the rest test — plus the
      // leakage audit: how many of each split's customers also appear
      // in train (entity overlap is expected for a temporal split;
      // the audit MEASURES it instead of pretending a hash split's
      // disjointness). One scan-local projection + two key-sized aggs.
      (s, dir) => {
        val cutoff = lit("1999-01-01").cast("date")
        val o = t(s, dir, "orders").select(col("o_custkey"),
          Sam.temporalSplit(to_date(col("o_orderdate")), cutoff, 30).as("split"))
        val train = o.filter(col("split") === "train")
          .select("o_custkey").distinct()
        val perSplit = o.groupBy("split").agg(
          count(lit(1)).as("n_orders"),
          countDistinct("o_custkey").as("n_customers"))
        val overlap = o.select("split", "o_custkey").distinct()
          .join(train, Seq("o_custkey"), "left_semi")
          .groupBy("split").agg(count(lit(1)).as("n_train_overlap"))
        perSplit.join(overlap, Seq("split"), "left")
          .select(col("split"), col("n_orders"), col("n_customers"),
            coalesce(col("n_train_overlap"), lit(0L)).as("n_train_overlap"))
          .orderBy("split")
      },
      Some("""WITH o AS (SELECT o_custkey,
             |  CASE WHEN CAST(o_orderdate AS DATE) < DATE '1999-01-01' THEN 'train'
             |       WHEN CAST(o_orderdate AS DATE) < DATE '1999-01-31' THEN 'embargo'
             |       WHEN o_orderdate IS NOT NULL THEN 'test' END AS split
             |  FROM orders),
             |tr AS (SELECT DISTINCT o_custkey FROM o WHERE split = 'train'),
             |ps AS (SELECT split, count(*) AS n_orders,
             |         count(DISTINCT o_custkey) AS n_customers FROM o GROUP BY 1),
             |ov AS (SELECT d.split, count(*) AS n_train_overlap
             |       FROM (SELECT DISTINCT split, o_custkey FROM o) d
             |       JOIN tr USING (o_custkey) GROUP BY 1)
             |SELECT p.split, p.n_orders, p.n_customers,
             |  COALESCE(v.n_train_overlap, 0) AS n_train_overlap
             |FROM ps p LEFT JOIN ov v USING (split) ORDER BY p.split""".stripMargin)),

    QueryDef("d24_jaro_linkage",
      // graded record-linkage pairs ([[DedupFunctions.jaroWinklerPairs]],
      // native codegen'd [[graft.functions.JaroWinkler]] — SQL
      // `jaro_winkler`): the d15 planted titles rescored with the
      // front-weighted 0..1 comparator instead of a hard edit budget —
      // typo'd twins AND numbered series neighbors all clear θ=0.9,
      // ranked by how much of the front of the string agrees. Blocking
      // replays d15's q-gram + df-cap shape plus the PROVABLE
      // length-ratio cut (min/max ≥ 5θ−4 = 0.5). The kernel is
      // arithmetic-pinned to DuckDB's jaro_winkler_similarity
      // (bytes, window max/2−1, int-halved transpositions, boost only
      // past 0.7, prefix cap 4) — fuzz-verified bit-equal over 20k
      // random pairs — so the ≥θ filter and the 6dp-rounded score
      // hash-match with no tolerance.
      (s, dir) => {
        val titles = docs(s, dir).filter(col("doc_id") < 60)
          .select(col("doc_id"),
            when(col("doc_id") % 4 === 0,
              concat(lit("stochastic gradient descent overview "),
                expr("doc_id div 4")))
            .when(col("doc_id") % 4 === 1,
              concat(lit("stochastic gradient descent overviev "),
                expr("doc_id div 4")))
            .when(col("doc_id") % 4 === 2,
              concat(lit("complete treatise on offshore sailing "),
                expr("doc_id div 4")))
            .otherwise(
              concat(lit("cmplete treatise on offshore sailng "),
                expr("doc_id div 4")))
            .as("title"))
        D.jaroWinklerPairs(titles, "doc_id", "title",
            threshold = 0.9, q = 3, maxDf = 50L)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH titles AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 4 = 0
             |           THEN 'stochastic gradient descent overview ' || CAST(doc_id // 4 AS VARCHAR)
             |         WHEN doc_id % 4 = 1
             |           THEN 'stochastic gradient descent overviev ' || CAST(doc_id // 4 AS VARCHAR)
             |         WHEN doc_id % 4 = 2
             |           THEN 'complete treatise on offshore sailing ' || CAST(doc_id // 4 AS VARCHAR)
             |         ELSE 'cmplete treatise on offshore sailng ' || CAST(doc_id // 4 AS VARCHAR)
             |    END AS title
             |  FROM documents WHERE doc_id < 60),
             |g0 AS (
             |  SELECT doc_id, length(title) AS len, unnest(
             |    CASE WHEN length(title) <= 3 THEN [title]
             |         ELSE list_distinct(list_transform(
             |           generate_series(1, length(title) - 2),
             |           i -> substr(title, i, 3))) END) AS g
             |  FROM titles),
             |oc AS (SELECT g FROM g0 GROUP BY g HAVING count(*) > 50),
             |gf AS (SELECT g0.* FROM g0 LEFT JOIN oc USING (g) WHERE oc.g IS NULL),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM gf a JOIN gf b ON a.g = b.g
             |  WHERE a.doc_id < b.doc_id
             |    AND least(a.len, b.len) * 1.0 / greatest(a.len, b.len) >= 0.5),
             |v AS (
             |  SELECT c.id_a, c.id_b,
             |         jaro_winkler_similarity(ta.title, tb.title) AS sim
             |  FROM cand c
             |  JOIN titles ta ON ta.doc_id = c.id_a
             |  JOIN titles tb ON tb.doc_id = c.id_b)
             |SELECT id_a, id_b, round(sim, 6) AS jw FROM v WHERE sim >= 0.9
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("er1_entity_resolution",
      // end-to-end entity resolution composed from the session's parts:
      // block+score (d24's jaroWinklerPairs) → transitive closure
      // (connectedComponents — A~B, B~C merge even when (A,C) never
      // scored) → one canonical entity id per cluster (the component's
      // min member; unmatched records stay their own entity). The
      // per-entity roll-up counts merged records — the dedup-rate
      // report a mastering pipeline ships. Oracle replays pairs
      // verbatim then closes them with a recursive CTE.
      (s, dir) => {
        val titles = docs(s, dir).filter(col("doc_id") < 60)
          .select(col("doc_id"),
            when(col("doc_id") % 4 === 0,
              concat(lit("stochastic gradient descent overview "),
                expr("doc_id div 4")))
            .when(col("doc_id") % 4 === 1,
              concat(lit("stochastic gradient descent overviev "),
                expr("doc_id div 4")))
            .when(col("doc_id") % 4 === 2,
              concat(lit("complete treatise on offshore sailing "),
                expr("doc_id div 4")))
            .otherwise(
              concat(lit("cmplete treatise on offshore sailng "),
                expr("doc_id div 4")))
            .as("title"))
        val pairs = D.jaroWinklerPairs(titles, "doc_id", "title",
          threshold = 0.9, q = 3, maxDf = 50L)
        val cc = D.connectedComponents(pairs)
        titles.join(cc, titles("doc_id") === cc("id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("entity_id"))
          .groupBy("entity_id")
          .agg(count(lit(1)).as("n_records"), max(col("doc_id")).as("max_doc"))
          .orderBy("entity_id")
      },
      Some("""WITH RECURSIVE titles AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 4 = 0
             |           THEN 'stochastic gradient descent overview ' || CAST(doc_id // 4 AS VARCHAR)
             |         WHEN doc_id % 4 = 1
             |           THEN 'stochastic gradient descent overviev ' || CAST(doc_id // 4 AS VARCHAR)
             |         WHEN doc_id % 4 = 2
             |           THEN 'complete treatise on offshore sailing ' || CAST(doc_id // 4 AS VARCHAR)
             |         ELSE 'cmplete treatise on offshore sailng ' || CAST(doc_id // 4 AS VARCHAR)
             |    END AS title
             |  FROM documents WHERE doc_id < 60),
             |g0 AS (
             |  SELECT doc_id, length(title) AS len, unnest(
             |    CASE WHEN length(title) <= 3 THEN [title]
             |         ELSE list_distinct(list_transform(
             |           generate_series(1, length(title) - 2),
             |           i -> substr(title, i, 3))) END) AS g
             |  FROM titles),
             |oc AS (SELECT g FROM g0 GROUP BY g HAVING count(*) > 50),
             |gf AS (SELECT g0.* FROM g0 LEFT JOIN oc USING (g) WHERE oc.g IS NULL),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM gf a JOIN gf b ON a.g = b.g
             |  WHERE a.doc_id < b.doc_id
             |    AND least(a.len, b.len) * 1.0 / greatest(a.len, b.len) >= 0.5),
             |pairs AS (
             |  SELECT c.id_a, c.id_b FROM cand c
             |  JOIN titles ta ON ta.doc_id = c.id_a
             |  JOIN titles tb ON tb.doc_id = c.id_b
             |  WHERE jaro_winkler_similarity(ta.title, tb.title) >= 0.9),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
             |cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
             |SELECT COALESCE(cc.component, t.doc_id) AS entity_id,
             |  count(*) AS n_records, max(t.doc_id) AS max_doc
             |FROM titles t LEFT JOIN cc ON t.doc_id = cc.id
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("ivm1_incremental_agg",
      // incremental view maintenance: the monthly revenue summary is
      // maintained as MERGEABLE partial states — history partials (one
      // scan, the night they landed) + tonight's delta partials fold
      // with a key-sized merge; the oracle RECOMPUTES from scratch, so
      // a hash match proves merge(partials(A), partials(B)) ≡
      // partials(A ∪ B) — exact because the sum state is DECIMAL and
      // the rest are order-free monoids.
      (s, dir) => {
        import graft.warehouse.IncrementalAgg
        val li = t(s, dir, "lineitem").select(
          col("l_suppkey").as("ticker"),
          date_format(col("l_shipdate"), "yyyy-MM").as("month"),
          revenueDec.as("_rev"), col("l_shipdate"))
        val cut = lit("1998-01-01").cast("timestamp")
        val keys = Seq("ticker", "month")
        val hist = IncrementalAgg.partials(
          li.filter(col("l_shipdate") < cut), keys, col("_rev"))
        val delta = IncrementalAgg.partials(
          li.filter(col("l_shipdate") >= cut), keys, col("_rev"))
        IncrementalAgg.merge(keys, hist, delta)
          .select(col("ticker"), col("month"), col("n"),
            money2(col("sum")).as("revenue"),
            money2(col("min")).as("min_rev"),
            money2(col("max")).as("max_rev"))
          .orderBy("ticker", "month")
      },
      Some("""SELECT l_suppkey AS ticker, strftime(l_shipdate, '%Y-%m') AS month,
             |  count(*) AS n,
             |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
             |      * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue,
             |  CAST(ROUND(MIN(CAST(l_extendedprice AS DECIMAL(12,4))
             |      * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS min_rev,
             |  CAST(ROUND(MAX(CAST(l_extendedprice AS DECIMAL(12,4))
             |      * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS max_rev
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("t17_pmi",
      // within-document token-pair PMI (collocation mining) with the
      // df gate ahead of the pair join — exact longs everywhere, one
      // ln rounded to 6dp (the a14 contract).
      (s, dir) => R.pmiPairs(docs(s, dir), "doc_id", "text",
        minDf = 5L, minPairs = 5L),
      Some("""WITH dt AS (
             |  SELECT DISTINCT doc_id AS d,
             |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
             |  FROM documents),
             |dt2 AS (SELECT d, tok FROM dt WHERE tok <> ''),
             |fr AS (SELECT tok, count(*) AS df FROM dt2 GROUP BY 1),
             |k AS (SELECT d, tok, df FROM dt2 JOIN fr USING (tok)
             |      WHERE df >= 5 AND df <= 1000000)
             |SELECT a.tok AS tok_a, b.tok AS tok_b,
             |  min(a.df) AS n_a, min(b.df) AS n_b, count(*) AS n_ab,
             |  round(ln(CAST((SELECT count(DISTINCT doc_id) FROM documents) AS DOUBLE)
             |           * count(*) / (min(a.df) * min(b.df))), 6) AS pmi
             |FROM k a JOIN k b ON a.d = b.d AND a.tok < b.tok
             |GROUP BY 1, 2 HAVING count(*) >= 5 ORDER BY 1, 2""".stripMargin)),

    QueryDef("d25_tfidf_cosine",
      // sparse TF-IDF cosine pairs ([[RelevanceFunctions
      // .tfidfCosinePairs]]) over a bounded slice — the synthetic
      // corpus' tiny vocabulary makes every token a hub (Σ df² ~ N²),
      // so the query bounds the input the way d15/d24 do; on real text
      // the maxDf cap is the blocking. 6dp round absorbs libm-ln and
      // sum-order ulps (the a12 convention).
      (s, dir) => R.tfidfCosinePairs(
          docs(s, dir).filter(col("doc_id") < 300), "doc_id", "text",
          minSim = 0.5, maxDf = 1000L)
        .orderBy("id_a", "id_b"),
      Some("""WITH tk AS (
             |  SELECT doc_id AS id,
             |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
             |  FROM documents WHERE doc_id < 300),
             |tk2 AS (SELECT id, tok FROM tk WHERE tok <> ''),
             |tf AS (SELECT id, tok, count(*) AS tf FROM tk2 GROUP BY 1, 2),
             |nn AS (SELECT CAST(count(DISTINCT id) AS DOUBLE) AS n FROM tk2),
             |fr AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1
             |       HAVING count(*) <= 1000),
             |w AS (
             |  SELECT tf.id, tf.tok, tf.tf * ln(nn.n / fr.df) AS w
             |  FROM tf JOIN fr USING (tok) CROSS JOIN nn),
             |nrm AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
             |dt AS (
             |  SELECT a.id AS id_a, b.id AS id_b, sum(a.w * b.w) AS dot
             |  FROM w a JOIN w b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b,
             |  round(dot / (x.nrm * y.nrm), 6) AS sim
             |FROM dt JOIN nrm x ON dt.id_a = x.id JOIN nrm y ON dt.id_b = y.id
             |WHERE dot / (x.nrm * y.nrm) >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("t18_novelty",
      // per-document 3-gram novelty ([[TextFunctions.ngramNovelty]]):
      // the fraction of each doc's distinct shingles appearing nowhere
      // else — the upweight-the-novel curation signal next to the
      // pairwise dedup family. All-integer until one small-denominator
      // division (boundary-free at 6dp by construction).
      (s, dir) => T.ngramNovelty(docs(s, dir), "doc_id", "text", n = 3)
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |dg AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
             |dg2 AS (SELECT doc_id, g FROM dg WHERE g <> ''),
             |fr AS (SELECT g, count(*) AS df FROM dg2 GROUP BY 1),
             |pd AS (
             |  SELECT doc_id, count(*) AS n_grams,
             |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
             |  FROM dg2 JOIN fr USING (g) GROUP BY 1)
             |SELECT d.doc_id, COALESCE(pd.n_grams, 0) AS n_grams,
             |  COALESCE(pd.n_novel, 0) AS n_novel,
             |  CASE WHEN pd.n_grams IS NOT NULL
             |       THEN round(CAST(pd.n_novel AS DOUBLE) / pd.n_grams, 6) END AS novelty
             |FROM documents d LEFT JOIN pd USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("u1_union",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val x = o.filter(col("o_orderkey") % 3 === 0)
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
        val y = o.filter(col("o_orderkey") % 3 === 1)
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
        x.unionByName(y)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            money2(sum(col("o_totalprice").cast("decimal(15,4)"))).as("total_price"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH u AS (
             |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 3 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 3 = 1)
             |SELECT o_orderpriority, count(*) AS n,
             |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(15,4))), 2) AS DOUBLE) AS total_price
             |FROM u GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ───────── text analysis (documents) ─────────

    QueryDef("t5_heavy_hitters",
      // boilerplate detection: the 20 most frequent 3-shingles via the
      // native space-saving TypedImperativeAggregate. Run in the EXACT
      // regime (capacity far above the distinct-shingle count, so no
      // counter ever evicts and errors are all 0) — which makes it
      // oracle-checkable against a plain count/top-k; the approximate
      // regime is pinned by TopKFreqSpec's eviction-bound test.
      (s, dir) => {
        val sh = docs(s, dir).select(
          explode(D.wordShingles(col("text"), 3)).as("sh"))
        sh.agg(graft.functions.TopKFreq(col("sh"), k = 20, capacity = 200000).as("top"))
          .selectExpr("inline(top)")
          .select(col("value"), col("count").as("n"), col("error"))
          .orderBy(desc("n"), col("value"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |e AS (SELECT unnest(shingles) AS value FROM sh),
             |agg AS (SELECT value, count(*) AS n FROM e GROUP BY value)
             |SELECT value, n, CAST(0 AS BIGINT) AS error FROM agg
             |ORDER BY n DESC, value LIMIT 20""".stripMargin)),

    QueryDef("t1_token_counts",
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        T.tokenCount(col("text")).as("n_tokens"),
        T.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("t2_quality",
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        T.punctRatio(col("text")).as("punct_ratio"),
        T.stopwordRatio(col("text"), T.EnglishStopwords).as("stopword_ratio"),
        T.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio
             |  FROM documents)
             |SELECT doc_id, punct_ratio, stopword_ratio,
             |  (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |   + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |   + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality
             |FROM b ORDER BY doc_id""".stripMargin)),

    QueryDef("t3_language_id",
      (s, dir) => docs(s, dir).select(
        col("doc_id"), T.languageId(col("text")).as("lang_id"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |h AS (SELECT doc_id,
             |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |  len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |  len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |FROM t)
             |SELECT doc_id,
             |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |       WHEN h_es >= h_fr THEN 'es'
             |       ELSE 'fr' END AS lang_id
             |FROM h ORDER BY doc_id""".stripMargin)),

    QueryDef("t4_winnow_fingerprints",
      // md5-based rolling hash so the oracle engine computes identical
      // fingerprints (hex min is lexicographic in both engines); the
      // xxhash64 default is the production path.
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        size(T.winnowedFingerprints(col("text"), k = 8, window = 4,
          hash = c => md5(c.cast("binary")))).as("n_fingerprints"))
        .orderBy("doc_id"),
      Some("""WITH norm AS (
             |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
             |  FROM documents),
             |h AS (
             |  SELECT doc_id,
             |    CASE WHEN length(t) - 7 <= 0 THEN [md5(t)]
             |         ELSE list_transform(generate_series(1, length(t) - 7),
             |                i -> md5(substring(t, CAST(i AS INTEGER), 8))) END AS hs
             |  FROM norm),
             |w AS (
             |  SELECT doc_id,
             |    CASE WHEN len(hs) - 3 <= 0 THEN [list_aggregate(hs, 'min')]
             |         ELSE list_transform(generate_series(1, len(hs) - 3),
             |                i -> list_aggregate(hs[i:i+3], 'min')) END AS mins
             |  FROM h)
             |SELECT doc_id, CAST(len(list_distinct(mins)) AS INTEGER) AS n_fingerprints
             |FROM w ORDER BY doc_id""".stripMargin)),

    QueryDef("t6_repetition",
      // Gopher/C4-style repetition filter signals: duplicate word and
      // bigram fractions per document. Each fraction is ONE IEEE division
      // of two small exact counts, bit-identical in any engine — no
      // rounding needed.
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        T.duplicateNgramFraction(col("text"), 1).as("dup_word_frac"),
        T.duplicateNgramFraction(col("text"), 2).as("dup_bigram_frac"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    string_split_regex(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |grams AS (
             |  SELECT doc_id, w,
             |    CASE WHEN len(w) < 2 THEN []
             |         ELSE list_transform(generate_series(1, len(w) - 1),
             |                i -> w[i] || ' ' || w[i+1]) END AS bg
             |  FROM toks)
             |SELECT doc_id,
             |  CASE WHEN len(w) = 0 THEN 0.0
             |       ELSE 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
             |  END AS dup_word_frac,
             |  CASE WHEN len(bg) = 0 THEN 0.0
             |       ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
             |  END AS dup_bigram_frac
             |FROM grams ORDER BY doc_id""".stripMargin)),

    QueryDef("t7_filter_chain",
      // the C4/Gopher-style corpus filter CHAIN: length, quality,
      // repetition, and language gates composed into one keep decision,
      // with the per-gate flags kept for auditability (a real pipeline
      // reports WHY each document dropped). One projection pass — the
      // gates share the token split and nothing shuffles. Thresholds
      // chosen to split the synthetic corpus non-trivially on every
      // gate. Gate comparisons are on unrounded doubles — safe because
      // t2/t6 pin those chains bit-identical across engines.
      (s, dir) => docs(s, dir).select(col("doc_id"),
          T.tokenCount(col("text")).as("n_tokens"),
          T.qualityScore(col("text")).as("quality"),
          T.duplicateNgramFraction(col("text"), 2).as("dup_bg"),
          T.languageId(col("text")).as("lang_id"))
        .select(col("doc_id"),
          (col("n_tokens") >= 20 && col("n_tokens") <= 1000).as("len_ok"),
          (col("quality") >= 75.0).as("quality_ok"),
          (col("dup_bg") <= 0.05).as("rep_ok"),
          (col("lang_id") === "en").as("lang_ok"))
        .withColumn("keep",
          col("len_ok") && col("quality_ok") && col("rep_ok") && col("lang_ok"))
        .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio,
             |    regexp_split_to_array(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, n_tok, w,
             |    (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |     + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |     + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality,
             |    CASE WHEN len(w) < 2 THEN 0.0
             |         ELSE 1.0 - CAST(len(list_distinct(list_transform(
             |                  generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1]))) AS DOUBLE)
             |              / (len(w) - 1) END AS dup_bg,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |    len(list_filter(w, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |    len(list_filter(w, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |    len(list_filter(w, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |  FROM b),
             |f AS (
             |  SELECT doc_id,
             |    n_tok >= 20 AND n_tok <= 1000 AS len_ok,
             |    quality >= 75.0 AS quality_ok,
             |    dup_bg <= 0.05 AS rep_ok,
             |    (CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |          WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |          WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |          WHEN h_es >= h_fr THEN 'es'
             |          ELSE 'fr' END) = 'en' AS lang_ok
             |  FROM g)
             |SELECT doc_id, len_ok, quality_ok, rep_ok, lang_ok,
             |  len_ok AND quality_ok AND rep_ok AND lang_ok AS keep
             |FROM f ORDER BY doc_id""".stripMargin)),

    QueryDef("t14_perplexity_buckets",
      // CCNet perplexity bucketing ([[RelevanceFunctions
      // .perplexityBuckets]], Wenzek et al. 2020): every doc scored
      // under the corpus's own bigram LM (the r3 machinery), split at
      // the ln-perplexity tertiles into head/middle/tail — the
      // published keep-head-and-middle filter. Oracle = r3's CTEs +
      // negate/round + quantile_cont cuts + the comparison-count CASE;
      // both sides compare 6dp-rounded values against 6dp-rounded cuts
      // so percentile-interpolation ulps can't flip a label.
      (s, dir) => R.perplexityBuckets(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
             |  FROM tk, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
             |  WHERE len(w) >= 2),
             |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1),
             |sc AS (
             |  SELECT b.doc_id,
             |         avg(ln(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE))) AS lp
             |  FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
             |  GROUP BY 1),
             |scored AS (
             |  SELECT d.doc_id, round(-coalesce(sc.lp, -20.0), 6) AS log_ppl
             |  FROM documents d LEFT JOIN sc USING (doc_id)),
             |cuts AS (
             |  SELECT quantile_cont(log_ppl, [1.0/3, 2.0/3]) AS cs FROM scored)
             |SELECT doc_id, log_ppl,
             |  CASE len(list_filter(cs, c -> log_ppl > round(c, 6)))
             |    WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
             |  END AS ppl_bucket
             |FROM scored, cuts ORDER BY doc_id""".stripMargin)),

    QueryDef("t15_gopher_gates",
      // Gopher quality gates ([[TextFunctions.gopherGates]], Rae et al.
      // 2021 A1.1): every MassiveWeb rule's measured signal + verdict
      // per document, `passes` the conjunction — the observability-
      // first shape (see which rule kills what BEFORE dropping). All
      // scan-local expressions; the oracle replays each signal 6dp-
      // rounded and the verdicts compare the rounded values.
      (s, dir) => T.gopherGates(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, text,
             |    list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'),
             |      t -> len(t) > 0) AS w,
             |    string_split(coalesce(text, ''), chr(10)) AS ls
             |  FROM documents),
             |m AS (
             |  SELECT doc_id,
             |    CAST(len(w) AS BIGINT) AS n_words,
             |    round(CASE WHEN len(w) = 0 THEN 0.0
             |      ELSE CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE) / len(w)
             |      END, 6) AS mean_word_len,
             |    round(CASE WHEN len(w) = 0 THEN 0.0
             |      ELSE CAST(len(regexp_extract_all(text, '#'))
             |             + len(regexp_extract_all(text, '\.\.\.'))
             |             + len(regexp_extract_all(text, '…')) AS DOUBLE) / len(w)
             |      END, 6) AS symbol_ratio,
             |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•‣▪]'))) AS DOUBLE)
             |      / len(ls), 6) AS bullet_frac,
             |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
             |      / len(ls), 6) AS ellipsis_frac,
             |    round(CASE WHEN len(w) = 0 THEN 0.0
             |      ELSE CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(w)
             |      END, 6) AS alpha_frac,
             |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
             |      s -> list_contains(w, s))) AS BIGINT) AS stop_hits
             |  FROM tk)
             |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
             |  ellipsis_frac, alpha_frac, stop_hits,
             |  (n_words BETWEEN 50 AND 100000
             |   AND mean_word_len BETWEEN 3.0 AND 10.0
             |   AND symbol_ratio <= 0.1
             |   AND bullet_frac <= 0.9
             |   AND ellipsis_frac <= 0.3
             |   AND alpha_frac >= 0.8
             |   AND stop_hits >= 2) AS passes
             |FROM m ORDER BY doc_id""".stripMargin)),

    QueryDef("t16_gopher_repetition",
      // Gopher repetition gates ([[TextFunctions.gopherRepetition]],
      // Rae et al. 2021 A1.1 "repetition removal"): duplicate-line
      // fractions, top-{2,3,4}-gram char claims, duplicate-{5..10}-gram
      // char coverage (overlap counted once), paper thresholds. One
      // gram explode for all n; the oracle replays every signal
      // 6dp-rounded and the verdict compares the rounded values.
      (s, dir) => T.gopherRepetition(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
             |tk AS (
             |  SELECT doc_id, text,
             |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |      t -> len(t) > 0) AS w,
             |    string_split(text, chr(10)) AS ls
             |  FROM d),
             |tot AS (
             |  SELECT doc_id,
             |    coalesce(list_sum(list_transform(w, t -> len(t))), 0) AS tc
             |  FROM tk),
             |lcnt AS (
             |  SELECT doc_id, line, count(*) AS c, len(line) AS ll
             |  FROM (SELECT doc_id, unnest(ls) AS line FROM tk)
             |  GROUP BY doc_id, line),
             |lf AS (
             |  SELECT doc_id, sum(c) AS nl, sum(c*ll) AS lchars,
             |         sum(c-1) AS dl, sum((c-1)*ll) AS dlc
             |  FROM lcnt GROUP BY 1),
             |g AS (
             |  SELECT doc_id, n, pos,
             |         array_to_string(list_slice(w, pos, pos+n-1), ' ') AS gram
             |  FROM (
             |    SELECT tk.doc_id, tk.w, ns.n,
             |           unnest(generate_series(1, len(tk.w) - ns.n + 1)) AS pos
             |    FROM tk, (VALUES (2),(3),(4),(5),(6),(7),(8),(9),(10)) ns(n))),
             |c AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3),
             |top AS (
             |  SELECT doc_id, n, cov FROM (
             |    SELECT doc_id, n, c*(len(gram)-(n-1)) AS cov,
             |           row_number() OVER (PARTITION BY doc_id, n
             |             ORDER BY c*(len(gram)-(n-1)) DESC, gram) AS rn
             |    FROM c WHERE c >= 2 AND n <= 4) WHERE rn = 1),
             |dk AS (SELECT doc_id, n, gram FROM c WHERE c >= 2 AND n >= 5),
             |cp AS (
             |  SELECT DISTINCT doc_id, n, pos + off AS ti FROM (
             |    SELECT g.doc_id, g.n, g.pos,
             |           unnest(generate_series(0, g.n - 1)) AS off
             |    FROM g JOIN dk USING (doc_id, n, gram))),
             |tl AS (
             |  SELECT doc_id, i AS ti, len(w[i]) AS tl FROM (
             |    SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM tk)),
             |dc AS (
             |  SELECT doc_id, n, sum(tl) AS cov
             |  FROM cp JOIN tl USING (doc_id, ti) GROUP BY 1, 2),
             |m AS (
             |  SELECT d.doc_id,
             |    round(CASE WHEN lf.nl > 0 THEN least(1.0, CAST(lf.dl AS DOUBLE)/lf.nl) ELSE 0.0 END, 6) AS dup_line_frac,
             |    round(CASE WHEN lf.lchars > 0 THEN least(1.0, CAST(lf.dlc AS DOUBLE)/lf.lchars) ELSE 0.0 END, 6) AS dup_line_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(t2.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS top2_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(t3.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS top3_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(t4.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS top4_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c5.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup5_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c6.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup6_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c7.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup7_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c8.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup8_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c9.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup9_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c10.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup10_char_frac
             |  FROM d
             |  JOIN lf USING (doc_id) JOIN tot USING (doc_id)
             |  LEFT JOIN top t2 ON t2.doc_id = d.doc_id AND t2.n = 2
             |  LEFT JOIN top t3 ON t3.doc_id = d.doc_id AND t3.n = 3
             |  LEFT JOIN top t4 ON t4.doc_id = d.doc_id AND t4.n = 4
             |  LEFT JOIN dc c5 ON c5.doc_id = d.doc_id AND c5.n = 5
             |  LEFT JOIN dc c6 ON c6.doc_id = d.doc_id AND c6.n = 6
             |  LEFT JOIN dc c7 ON c7.doc_id = d.doc_id AND c7.n = 7
             |  LEFT JOIN dc c8 ON c8.doc_id = d.doc_id AND c8.n = 8
             |  LEFT JOIN dc c9 ON c9.doc_id = d.doc_id AND c9.n = 9
             |  LEFT JOIN dc c10 ON c10.doc_id = d.doc_id AND c10.n = 10)
             |SELECT m.*,
             |  (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
             |   AND top2_char_frac <= 0.20 AND top3_char_frac <= 0.18
             |   AND top4_char_frac <= 0.16 AND dup5_char_frac <= 0.15
             |   AND dup6_char_frac <= 0.14 AND dup7_char_frac <= 0.13
             |   AND dup8_char_frac <= 0.12 AND dup9_char_frac <= 0.11
             |   AND dup10_char_frac <= 0.10) AS passes
             |FROM m ORDER BY doc_id""".stripMargin)),

    QueryDef("url1_normalize",
      // URL canonicalization ([[UrlFunctions.normalizeUrl]] / [[urlHost]]
      // / [[registrableDomain]]) over deterministically planted URLs
      // (documents has no url column — see [[plantedUrls]]): every
      // contract step exercised across four URL shapes, oracle replays
      // the identical Java∩RE2 regex chain under DuckDB's RE2.
      (s, dir) => plantedUrls(s, dir).select(col("doc_id"),
          U.normalizeUrl(col("url")).as("url_norm"),
          U.urlHost(col("url")).as("host"),
          U.registrableDomain(U.urlHost(col("url"))).as("domain"))
        .orderBy("doc_id"),
      Some(urlOracleCtes +
        "\nSELECT doc_id, url_norm, host, domain FROM dom ORDER BY doc_id")),

    QueryDef("url2_domain_cap",
      // host-level corpus shaping composed ([[UrlFunctions
      // .domainBlocklistFilter]] → [[UrlFunctions.capPerDomain]]): gate
      // out a blocklisted registrable domain, then keep at most 10 docs
      // per domain (smallest doc_id first — KthSmallest bounded-heap
      // cuts, no window). The planted shapes make skewed domains
      // (example.co.uk / example.com collect a quarter of the corpus
      // each) and per-source cdn domains; oracle = the same CTEs + a
      // row_number replay of the cap.
      (s, dir) => U.capPerDomain(
          U.domainBlocklistFilter(plantedUrls(s, dir), "url", Seq("src3.org")),
          "url", "doc_id", cap = 10)
        .select("doc_id").orderBy("doc_id"),
      Some(urlOracleCtes +
        """
          |SELECT doc_id FROM (
          |  SELECT doc_id,
          |         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
          |  FROM dom WHERE domain <> 'src3.org')
          |WHERE rn <= 10 ORDER BY doc_id""".stripMargin)),

    QueryDef("cls1_quality_classifier",
      // fastText-shaped quality gate ([[ClassifierFunctions
      // .naiveBayesWeights]] + [[scoreLinear]]): closed-form NB
      // log-odds over hashed unigram+bigram features, trained on the
      // even-id half labeled "is English" (lang column), scored over
      // EVERY doc — sigmoid(mean weight + bias), 6dp. md5Hash60
      // bucketing so the oracle replays features → counts → weights →
      // scores end to end (the d20 hashing convention).
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        Cls.scoreLinear(d, "doc_id", "text", w, bias,
            buckets = 1 << 16, hash = D.md5Hash60)
          .orderBy("doc_id")
      },
      Some("WITH " + nbScoreCtes +
        """
          |SELECT d.doc_id,
          |  round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score
          |FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)
          |ORDER BY doc_id""".stripMargin)),

    QueryDef("d21_epoch_blend",
      // epoch-weighted mixture ([[SamplingFunctions.epochBlend]], the
      // Dolma/Megatron data-recipe step): high-value sources repeat
      // 2 full epochs + a hash-fixed quarter a third time, mid sources
      // exactly once, the tail keeps a fixed half. Scan-local explode,
      // md5 bucketing on the stringified id so the oracle replays the
      // fractional cut exactly.
      (s, dir) => Sam.epochBlend(docs(s, dir).select(col("doc_id"), col("source")),
          "doc_id",
          when(col("source").isin("src0", "src1", "src2"), 2.25)
            .when(col("source").isin("src3", "src4"), 1.0)
            .otherwise(0.5),
          hash = D.md5Hash60)
        .orderBy("doc_id", "copy"),
      Some("""WITH e AS (
             |  SELECT doc_id, source,
             |    CASE WHEN source IN ('src0','src1','src2') THEN 2.25
             |         WHEN source IN ('src3','src4') THEN 1.0
             |         ELSE 0.5 END AS eps,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |      % 1048576 AS b
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, source,
             |    CAST(floor(eps) AS BIGINT) +
             |      CASE WHEN CAST(b AS DOUBLE) < (eps - floor(eps)) * 1048576
             |           THEN 1 ELSE 0 END AS n
             |  FROM e)
             |SELECT doc_id, source, copy FROM (
             |  SELECT doc_id, source, unnest(generate_series(1, n)) AS copy
             |  FROM c WHERE n > 0)
             |ORDER BY doc_id, copy""".stripMargin)),

    QueryDef("c10_gopher_clean",
      // the COMPLETE Gopher filter as an actual gate ([[TextFunctions
      // .gopherFilter]]): quality rules AND repetition rules, survivors
      // only. Thresholds calibrated to this corpus where the paper's
      // assume web English (minWords 40, ≥1 stopword — the synthetic
      // vocabulary holds only one of Gopher's eight stop words);
      // everything else at paper defaults. Oracle = the t15 + t16
      // rule chains composed under one conjunction.
      (s, dir) => T.gopherFilter(docs(s, dir), "doc_id", "text",
          minWords = 40L, minStopwordHits = 1)
        .select("doc_id").orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
             |tkq AS (
             |  SELECT doc_id, text,
             |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |      t -> len(t) > 0) AS w,
             |    string_split(text, chr(10)) AS ls
             |  FROM d),
             |mq AS (
             |  SELECT doc_id,
             |    CAST(len(w) AS BIGINT) AS n_words,
             |    round(CASE WHEN len(w) = 0 THEN 0.0
             |      ELSE CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE) / len(w)
             |      END, 6) AS mean_word_len,
             |    round(CASE WHEN len(w) = 0 THEN 0.0
             |      ELSE CAST(len(regexp_extract_all(text, '#'))
             |             + len(regexp_extract_all(text, '\.\.\.'))
             |             + len(regexp_extract_all(text, '…')) AS DOUBLE) / len(w)
             |      END, 6) AS symbol_ratio,
             |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•‣▪]'))) AS DOUBLE)
             |      / len(ls), 6) AS bullet_frac,
             |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
             |      / len(ls), 6) AS ellipsis_frac,
             |    round(CASE WHEN len(w) = 0 THEN 0.0
             |      ELSE CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(w)
             |      END, 6) AS alpha_frac,
             |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
             |      s -> list_contains(w, s))) AS BIGINT) AS stop_hits
             |  FROM tkq),
             |tot AS (
             |  SELECT doc_id,
             |    coalesce(list_sum(list_transform(w, t -> len(t))), 0) AS tc
             |  FROM tkq),
             |lcnt AS (
             |  SELECT doc_id, line, count(*) AS c, len(line) AS ll
             |  FROM (SELECT doc_id, unnest(ls) AS line FROM tkq)
             |  GROUP BY doc_id, line),
             |lf AS (
             |  SELECT doc_id, sum(c) AS nl, sum(c*ll) AS lchars,
             |         sum(c-1) AS dl, sum((c-1)*ll) AS dlc
             |  FROM lcnt GROUP BY 1),
             |g AS (
             |  SELECT doc_id, n, pos,
             |         array_to_string(list_slice(w, pos, pos+n-1), ' ') AS gram
             |  FROM (
             |    SELECT tkq.doc_id, tkq.w, ns.n,
             |           unnest(generate_series(1, len(tkq.w) - ns.n + 1)) AS pos
             |    FROM tkq, (VALUES (2),(3),(4),(5),(6),(7),(8),(9),(10)) ns(n))),
             |c AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3),
             |top AS (
             |  SELECT doc_id, n, cov FROM (
             |    SELECT doc_id, n, c*(len(gram)-(n-1)) AS cov,
             |           row_number() OVER (PARTITION BY doc_id, n
             |             ORDER BY c*(len(gram)-(n-1)) DESC, gram) AS rn
             |    FROM c WHERE c >= 2 AND n <= 4) WHERE rn = 1),
             |dk AS (SELECT doc_id, n, gram FROM c WHERE c >= 2 AND n >= 5),
             |cp AS (
             |  SELECT DISTINCT doc_id, n, pos + off AS ti FROM (
             |    SELECT g.doc_id, g.n, g.pos,
             |           unnest(generate_series(0, g.n - 1)) AS off
             |    FROM g JOIN dk USING (doc_id, n, gram))),
             |tl AS (
             |  SELECT doc_id, i AS ti, len(w[i]) AS tl FROM (
             |    SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM tkq)),
             |dc AS (
             |  SELECT doc_id, n, sum(tl) AS cov
             |  FROM cp JOIN tl USING (doc_id, ti) GROUP BY 1, 2),
             |mr AS (
             |  SELECT d.doc_id,
             |    round(CASE WHEN lf.nl > 0 THEN least(1.0, CAST(lf.dl AS DOUBLE)/lf.nl) ELSE 0.0 END, 6) AS dup_line_frac,
             |    round(CASE WHEN lf.lchars > 0 THEN least(1.0, CAST(lf.dlc AS DOUBLE)/lf.lchars) ELSE 0.0 END, 6) AS dup_line_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(t2.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS top2_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(t3.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS top3_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(t4.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS top4_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c5.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup5_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c6.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup6_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c7.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup7_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c8.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup8_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c9.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup9_char_frac,
             |    round(CASE WHEN tot.tc > 0 THEN least(1.0, CAST(coalesce(c10.cov, 0) AS DOUBLE)/tot.tc) ELSE 0.0 END, 6) AS dup10_char_frac
             |  FROM d
             |  JOIN lf USING (doc_id) JOIN tot USING (doc_id)
             |  LEFT JOIN top t2 ON t2.doc_id = d.doc_id AND t2.n = 2
             |  LEFT JOIN top t3 ON t3.doc_id = d.doc_id AND t3.n = 3
             |  LEFT JOIN top t4 ON t4.doc_id = d.doc_id AND t4.n = 4
             |  LEFT JOIN dc c5 ON c5.doc_id = d.doc_id AND c5.n = 5
             |  LEFT JOIN dc c6 ON c6.doc_id = d.doc_id AND c6.n = 6
             |  LEFT JOIN dc c7 ON c7.doc_id = d.doc_id AND c7.n = 7
             |  LEFT JOIN dc c8 ON c8.doc_id = d.doc_id AND c8.n = 8
             |  LEFT JOIN dc c9 ON c9.doc_id = d.doc_id AND c9.n = 9
             |  LEFT JOIN dc c10 ON c10.doc_id = d.doc_id AND c10.n = 10)
             |SELECT d.doc_id FROM d
             |JOIN mq USING (doc_id) JOIN mr USING (doc_id)
             |WHERE mq.n_words BETWEEN 40 AND 100000
             |  AND mq.mean_word_len BETWEEN 3.0 AND 10.0
             |  AND mq.symbol_ratio <= 0.1 AND mq.bullet_frac <= 0.9
             |  AND mq.ellipsis_frac <= 0.3 AND mq.alpha_frac >= 0.8
             |  AND mq.stop_hits >= 1
             |  AND mr.dup_line_frac <= 0.30 AND mr.dup_line_char_frac <= 0.20
             |  AND mr.top2_char_frac <= 0.20 AND mr.top3_char_frac <= 0.18
             |  AND mr.top4_char_frac <= 0.16 AND mr.dup5_char_frac <= 0.15
             |  AND mr.dup6_char_frac <= 0.14 AND mr.dup7_char_frac <= 0.13
             |  AND mr.dup8_char_frac <= 0.12 AND mr.dup9_char_frac <= 0.11
             |  AND mr.dup10_char_frac <= 0.10
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("d22_containment",
      // asymmetric containment ([[DedupFunctions.containmentPairs]]):
      // the corpus has no planted quotes, so the query plants them —
      // every %25th doc contributes an excerpt (chars 50..209 verbatim)
      // under a shifted id. Each excerpt must flag against its source
      // (containment ≥ 0.7 of ITS fingerprints) while the source never
      // flags against the excerpt — the asymmetry Jaccard misses.
      // md5-hash winnowing (the t4 oracle convention) so the oracle
      // replays fingerprints → df-cap → pair join → ratio end to end.
      // maxDocFreq = 50 ≈ 1% of the corpus: this synthetic vocabulary
      // is tiny, so 8-char windows repeat across hundreds of docs —
      // at the 1000 default the pair join fans out 149M rows at sf0.1
      // (measured) vs 1.6M at 50; planted-pair containment is
      // unaffected (excerpt fps ⊂ source fps under any cap).
      (s, dir) => {
        val d = docs(s, dir)
        val planted = d.select(col("doc_id"), col("text"))
          .unionAll(d.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 200000L).as("doc_id"),
              substring(col("text"), 50, 160).as("text")))
        D.containmentPairs(planted, "doc_id", "text", threshold = 0.7,
            maxDocFreq = 50, hash = c => md5(c.cast("binary")))
          .orderBy("contained_id", "container_id")
      },
      Some("""WITH alld AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000, substring(text, 50, 160)
             |  FROM documents WHERE doc_id % 25 = 0),
             |norm AS (
             |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
             |  FROM alld),
             |h AS (
             |  SELECT doc_id,
             |    CASE WHEN length(t) - 7 <= 0 THEN [md5(t)]
             |         ELSE list_transform(generate_series(1, length(t) - 7),
             |                i -> md5(substring(t, CAST(i AS INTEGER), 8))) END AS hs
             |  FROM norm),
             |w AS (
             |  SELECT doc_id,
             |    CASE WHEN len(hs) - 3 <= 0 THEN [list_aggregate(hs, 'min')]
             |         ELSE list_transform(generate_series(1, len(hs) - 3),
             |                i -> list_aggregate(hs[i:i+3], 'min')) END AS mins
             |  FROM h),
             |fp AS (
             |  SELECT doc_id, f
             |  FROM (SELECT doc_id, unnest(list_distinct(mins)) AS f FROM w)),
             |hot AS (SELECT f FROM fp GROUP BY f HAVING count(*) > 50),
             |kept AS (SELECT * FROM fp WHERE f NOT IN (SELECT f FROM hot)),
             |sz AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
             |sh AS (
             |  SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
             |         count(*) AS s
             |  FROM kept a JOIN kept b ON a.f = b.f AND a.doc_id <> b.doc_id
             |  GROUP BY 1, 2)
             |SELECT contained_id, container_id,
             |       round(CAST(s AS DOUBLE) / sz.n, 6) AS containment
             |FROM sh JOIN sz ON sz.doc_id = sh.contained_id
             |WHERE round(CAST(s AS DOUBLE) / sz.n, 6) >= 0.7
             |ORDER BY contained_id, container_id""".stripMargin)),

    QueryDef("t13_c4_line_gate",
      // the C4 line gate (Raffel et al. JMLR 2020 §2.2) through the
      // scan-local [[TextFunctions.filterLines]] rewrite: keep only
      // lines ending in terminal punctuation with >= 3 words —
      // nav labels, button stubs, and survey fragments die; prose
      // survives. Planted six-line pages make every branch observable;
      // both engines rebuild the same pages and replay the gate.
      (s, dir) => {
        val d = docs(s, dir).filter(col("doc_id") < 40)
        val planted = d.select(col("doc_id"), concat_ws("\n",
          lit("Home"),
          lit("Read the full story here."),
          lit("Subscribe"),
          concat(col("text"), lit(".")),
          lit("Was this helpful? Yes No"),
          lit("He said \"stop now please.\"")).as("text"))
        T.filterLines(planted, "doc_id", "text", l => T.c4KeepLine(l))
          .orderBy("doc_id")
      },
      Some(("""WITH planted AS (
             |  SELECT doc_id,
             |    'Home' || chr(10) || 'Read the full story here.' || chr(10)
             |      || 'Subscribe' || chr(10) || text || '.' || chr(10)
             |      || 'Was this helpful? Yes No' || chr(10)
             |      || 'He said "stop now please."' AS text
             |  FROM documents WHERE doc_id < 40),
             |lines AS (
             |  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS pos, unnest(ls) AS line
             |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM planted)),
             |kept AS (
             |  SELECT doc_id, pos, line FROM lines
             |  WHERE regexp_matches(line, '[.!?"QUOTE]\s*$')
             |    AND (CASE WHEN length(trim(line)) = 0 THEN 0
             |              ELSE len(regexp_split_to_array(trim(line), '\s+'))
             |         END) >= 3),
             |rebuilt AS (
             |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
             |  FROM kept GROUP BY doc_id)
             |SELECT p.doc_id, coalesce(r.text, '') AS text
             |FROM planted p LEFT JOIN rebuilt r USING (doc_id)
             |ORDER BY p.doc_id""").stripMargin.replace("QUOTE", "\u201d"))),

    QueryDef("t12_normalize_text",
      // canonical text normalization ([[TextFunctions.normalizeText]]
      // over the native [[NfcNormalize]] expression): NFC composition →
      // lowercase → control-char strip → whitespace collapse → trim.
      // The planted rows make the POINT: "CAFE" + U+0301 (decomposed)
      // and "café" (precomposed) are different byte sequences that
      // normalize to the IDENTICAL string — byte-keyed dedup only works
      // downstream of this pass. Both engines implement Unicode NFC
      // (java.text.Normalizer / utf8proc), so the oracle replays
      // byte-for-byte.
      (s, dir) => docs(s, dir).filter(col("doc_id") < 30)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(lit("CAFE"), lit("\u0301"), lit(" LATTE\tMENU  du jour")))
          .when(col("doc_id") % 3 === 1,
            lit("caf\u00e9 latte menu du jour"))
          .otherwise(concat(
            lit("control\u0001chars\u0007here  "), col("text")))
          .as("text"))
        .select(col("doc_id"),
          T.normalizeText(col("text")).as("norm"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(
             |    lower(nfc_normalize(
             |      CASE WHEN doc_id % 3 = 0
             |             THEN 'CAFE' || chr(769) || ' LATTE' || chr(9) || 'MENU  du jour'
             |           WHEN doc_id % 3 = 1 THEN 'caf' || chr(233) || ' latte menu du jour'
             |           ELSE 'control' || chr(1) || 'chars' || chr(7) || 'here  ' || text
             |      END)),
             |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             |    '[ \t]+', ' ', 'g')) AS norm
             |FROM documents WHERE doc_id < 30 ORDER BY doc_id""".stripMargin)),

    QueryDef("t11_gate_report",
      // Per-source gate observability: how many documents each
      // C4/Gopher-style gate (t7's length / quality / repetition /
      // language thresholds) rejects per crawl source, and how many
      // pass all four — the report a nightly 100 TB clean publishes so
      // a drifting source is caught the day it drifts. ONE fused
      // projection + aggregation pass: the gates share the token split,
      // counts combine map-side onto a handful of source keys, no
      // second scan, no window. Gate comparisons are on unrounded
      // doubles — t2/t6 pin those chains bit-identical across engines.
      (s, dir) => {
        val flags = docs(s, dir).select(col("source"),
            T.tokenCount(col("text")).as("n_tokens"),
            T.qualityScore(col("text")).as("quality"),
            T.duplicateNgramFraction(col("text"), 2).as("dup_bg"),
            T.languageId(col("text")).as("lang_id"))
          .select(col("source"),
            (col("n_tokens") >= 20 && col("n_tokens") <= 1000).as("len_ok"),
            (col("quality") >= 75.0).as("quality_ok"),
            (col("dup_bg") <= 0.05).as("rep_ok"),
            (col("lang_id") === "en").as("lang_ok"))
        def fails(c: Column): Column = sum(when(!c, 1L).otherwise(0L))
        flags.groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            fails(col("len_ok")).as("n_len_fail"),
            fails(col("quality_ok")).as("n_quality_fail"),
            fails(col("rep_ok")).as("n_rep_fail"),
            fails(col("lang_ok")).as("n_lang_fail"),
            sum(when(col("len_ok") && col("quality_ok") && col("rep_ok")
              && col("lang_ok"), 1L).otherwise(0L)).as("n_pass"))
          .orderBy("source")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, source,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio,
             |    regexp_split_to_array(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, source, n_tok, w,
             |    (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |     + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |     + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality,
             |    CASE WHEN len(w) < 2 THEN 0.0
             |         ELSE 1.0 - CAST(len(list_distinct(list_transform(
             |                  generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1]))) AS DOUBLE)
             |              / (len(w) - 1) END AS dup_bg,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |    len(list_filter(w, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |    len(list_filter(w, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |    len(list_filter(w, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |  FROM b),
             |f AS (
             |  SELECT source,
             |    n_tok >= 20 AND n_tok <= 1000 AS len_ok,
             |    quality >= 75.0 AS quality_ok,
             |    dup_bg <= 0.05 AS rep_ok,
             |    (CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |          WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |          WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |          WHEN h_es >= h_fr THEN 'es'
             |          ELSE 'fr' END) = 'en' AS lang_ok
             |  FROM g)
             |SELECT source, count(*) AS n_docs,
             |  CAST(COALESCE(SUM(CASE WHEN NOT len_ok THEN 1 END), 0) AS BIGINT) AS n_len_fail,
             |  CAST(COALESCE(SUM(CASE WHEN NOT quality_ok THEN 1 END), 0) AS BIGINT) AS n_quality_fail,
             |  CAST(COALESCE(SUM(CASE WHEN NOT rep_ok THEN 1 END), 0) AS BIGINT) AS n_rep_fail,
             |  CAST(COALESCE(SUM(CASE WHEN NOT lang_ok THEN 1 END), 0) AS BIGINT) AS n_lang_fail,
             |  CAST(COALESCE(SUM(CASE WHEN len_ok AND quality_ok AND rep_ok AND lang_ok THEN 1 END), 0) AS BIGINT) AS n_pass
             |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("t8_quality_deciles",
      // curriculum binning: quality-score deciles via broadcast exact
      // cut points (never a global ntile sort — see quantileBucket's
      // scaladoc). Values are bit-reproducible chains; cuts are
      // compared 6dp-rounded, so the assignment is engine-portable.
      (s, dir) => Sam.quantileBucket(
          docs(s, dir).select(col("doc_id"),
            T.qualityScore(col("text")).as("quality")),
          "doc_id", "quality", nBuckets = 10)
        .select(col("doc_id"), col("bucket").as("decile"))
        .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio
             |  FROM documents),
             |q AS (
             |  SELECT doc_id,
             |    (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |     + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |     + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality
             |  FROM b),
             |cuts AS (
             |  SELECT quantile_cont(quality,
             |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cs
             |  FROM q)
             |SELECT doc_id,
             |  CAST(len(list_filter(cs, c -> quality > round(c, 6))) AS INTEGER) AS decile
             |FROM q, cuts ORDER BY doc_id""".stripMargin)),

    QueryDef("t10_lang_quartiles",
      // per-GROUP curriculum binning: quality quartiles WITHIN each
      // language (a pooled binning would grade every low-resource
      // language against the dominant one's distribution). Cuts reduce
      // per group and join back broadcast; same 6dp-rounded-cut
      // portability contract as t8.
      (s, dir) => Sam.quantileBucketByGroup(
          docs(s, dir).select(col("doc_id"), col("lang"),
            T.qualityScore(col("text")).as("quality")),
          "doc_id", "lang", "quality", nBuckets = 4)
        .select(col("doc_id"), col("lang"), col("bucket").as("quartile"))
        .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, lang,
             |    (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |     + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |     + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS quality
             |  FROM b),
             |cuts AS (
             |  SELECT lang, quantile_cont(quality, [0.25, 0.5, 0.75]) AS cs
             |  FROM q GROUP BY lang)
             |SELECT q.doc_id, q.lang,
             |  CAST(len(list_filter(cs, c -> quality > round(c, 6))) AS INTEGER) AS quartile
             |FROM q JOIN cuts ON q.lang = cuts.lang ORDER BY doc_id""".stripMargin)),

    QueryDef("t4b_winnow_native",
      // the PRODUCTION winnowing path: the native codegen expression over
      // xxhash64 — one compiled pass per document vs t4's interpreted
      // HOF + per-k-gram md5 (which exists so the oracle engine can
      // recompute it). xxhash64 is Spark-specific → rows-only here;
      // TextFunctionsSpec pins bit-parity with the HOF formulation whose
      // md5 twin t4 hash-matches DuckDB.
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        size(T.winnowedFingerprintsNative(col("text"), k = 8, window = 4))
          .as("n_fingerprints"))
        .orderBy("doc_id"),
      None),

    QueryDef("t9_chunk_documents",
      // fixed-size token windows with 50% overlap (32/16) — the front
      // half of the chunk → embed → pool loop (s5 is the back half).
      // Chunk membership is a pure row function: one projection + an
      // explode, no shuffle, and the oracle re-derives the identical
      // windows from the same token split.
      (s, dir) => T.chunkDocuments(docs(s, dir), "doc_id", "text",
          chunkSize = 32, stride = 16)
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
             |  FROM documents
             |  WHERE length(trim(text)) > 0)
             |SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
             |  array_to_string(w[i*16+1 : i*16+32], ' ') AS chunk_text,
             |  CAST(least(32, len(w) - i*16) AS INTEGER) AS n_tokens
             |FROM tk, UNNEST(generate_series(0,
             |  CAST(ceil(greatest(len(w) - 32, 0) / 16.0) AS BIGINT))) AS t(i)
             |ORDER BY doc_id, chunk_id""".stripMargin)),

    // ───────── dedup (documents) ─────────

    QueryDef("d1_exact_dedup",
      (s, dir) => D.dedupExact(
          docs(s, dir).select(col("doc_id"), T.fingerprint(col("text")).as("fingerprint")),
          "doc_id", "fingerprint")
        .orderBy("doc_id"),
      Some("""WITH fp AS (
             |  SELECT doc_id,
             |    md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS fingerprint
             |  FROM documents)
             |SELECT doc_id, fingerprint FROM fp
             |QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("d2_dup_groups",
      (s, dir) => D.exactDupGroups(
          docs(s, dir).select(col("doc_id"), T.fingerprint(col("text")).as("fingerprint")),
          "doc_id", "fingerprint")
        .orderBy("fingerprint"),
      Some("""WITH fp AS (
             |  SELECT doc_id,
             |    md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS fingerprint
             |  FROM documents)
             |SELECT fingerprint, count(*) AS group_size, min(doc_id) AS canonical_id
             |FROM fp GROUP BY 1 HAVING count(*) > 1
             |ORDER BY fingerprint""".stripMargin)),

    QueryDef("d3_jaccard_pairs",
      // maxDf=1000 is the boilerplate-shingle skew cap; at the sf0.01
      // oracle scale df <= n_docs = 500 so the cap provably never binds
      // and the capless DuckDB oracle still matches exactly.
      (s, dir) => D.jaccardPairs(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.8, maxDf = 1000L)
        .orderBy("id_a", "id_b"),
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |e AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sgl FROM sh),
             |p AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
             |         count(*) AS shared
             |  FROM e a JOIN e b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2, 3, 4)
             |SELECT id_a, id_b,
             |       round(CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE), 6) AS jaccard
             |FROM p
             |WHERE CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) >= 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("p4_coercion",
      (s, dir) => events(s, dir).selectExpr(
        "event_id",
        "try_cast(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT) AS k_value",
        "try_cast(event_type AS DOUBLE) AS bad_numeric")
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_value,
             |  TRY_CAST(event_type AS DOUBLE) AS bad_numeric
             |FROM events ORDER BY event_id""".stripMargin)),

    QueryDef("m1b_minhash_md5",
      // the MinHash-LSH pipeline verified END-TO-END: the md5-based
      // 60-bit hash is computable identically in DuckDB, so signature,
      // banding, candidate generation AND jaccard verification all
      // hash-check. Production keeps the xxhash64 default (m1).
      (s, dir) => D.minhashLshPairs(docs(s, dir), "doc_id", "text",
          n = 3, numHashes = 16, bands = 4, threshold = 0.7,
          hash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          bucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))))
        .orderBy("id_a", "id_b"),
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
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
             |verified AS (
             |  SELECT c.id_a, c.id_b,
             |    CAST(len(a.shingles) + len(b.shingles)
             |         - len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
             |  FROM cands c
             |  JOIN sh a ON a.doc_id = c.id_a
             |  JOIN sh b ON b.doc_id = c.id_b)
             |SELECT id_a, id_b, round(jaccard, 6) AS jaccard
             |FROM verified WHERE jaccard >= 0.7
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("m3_minhash_incremental",
      // INCREMENTAL near-dup check — a "new batch" (odd ids) against
      // the "already-ingested corpus" (even ids) without the
      // existing×existing self-join: per-side signatures + a banded
      // join BETWEEN the band tables, verify on candidates. The oracle
      // shares m1b's signature CTEs and swaps the ordering filter for
      // the side split.
      (s, dir) => {
        val d = docs(s, dir)
        def sh(f: org.apache.spark.sql.DataFrame) = f.select(
          col("doc_id").as("id"), D.wordShingles(col("text"), 3).as("shingles"))
        D.minhashLshPairsAgainst(
            sh(d.filter(col("doc_id") % 2 === 0)),
            sh(d.filter(col("doc_id") % 2 === 1)),
            numHashes = 16, bands = 4, threshold = 0.7,
            hash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
            bucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
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
             |  WHERE x.doc_id % 2 = 0 AND y.doc_id % 2 = 1),
             |verified AS (
             |  SELECT c.id_a, c.id_b,
             |    CAST(len(a.shingles) + len(b.shingles)
             |         - len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
             |  FROM cands c
             |  JOIN sh a ON a.doc_id = c.id_a
             |  JOIN sh b ON b.doc_id = c.id_b)
             |SELECT id_a, id_b, round(jaccard, 6) AS jaccard
             |FROM verified WHERE jaccard >= 0.7
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("m1_minhash_pairs",
      (s, dir) => D.minhashLshPairs(docs(s, dir), "doc_id", "text",
          n = 3, numHashes = 32, bands = 8, threshold = 0.7)
        .orderBy("id_a", "id_b"),
      None), // xxhash64 seeds not reproducible in the oracle engine

    QueryDef("m2_simhash_pairs",
      (s, dir) => D.simhashPairs(docs(s, dir), "doc_id", "text", n = 3, maxHamming = 3)
        .orderBy("id_a", "id_b"),
      None),

    QueryDef("m2b_simhash_md5",
      // the SimHash pipeline (per-bit votes -> signature -> 16-bit chunk
      // blocking -> hamming verify) hash-checked end-to-end via the
      // engine-shared md5 hash; production keeps xxhash64 (m2).
      (s, dir) => D.simhashPairs(docs(s, dir), "doc_id", "text",
          n = 3, maxHamming = 3, hash = D.md5Hash60)
        .orderBy("id_a", "id_b"),
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |hv AS (
             |  SELECT doc_id,
             |    list_transform(shingles, s ->
             |      CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT)) AS hs
             |  FROM sh),
             |sig AS (
             |  SELECT doc_id,
             |    list_aggregate(list_transform(generate_series(0, 63), j ->
             |      CASE WHEN list_aggregate(list_transform(hs, h ->
             |             CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0
             |           THEN (CAST(1 AS BIGINT) << j) ELSE 0 END), 'sum') AS sg
             |  FROM hv),
             |banded AS (
             |  SELECT doc_id, sg, c, (sg >> (c * 16)) & 65535 AS key
             |  FROM sig, UNNEST([0, 1, 2, 3]) AS t(c)),
             |cands AS (
             |  SELECT DISTINCT x.doc_id AS id_a, x.sg AS sig_a,
             |                  y.doc_id AS id_b, y.sg AS sig_b
             |  FROM banded x JOIN banded y ON x.c = y.c AND x.key = y.key
             |  WHERE x.doc_id < y.doc_id)
             |SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
             |FROM cands WHERE bit_count(xor(sig_a, sig_b)) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // ───────── similarity search (embeddings) ─────────

    QueryDef("s5_mean_pooling",
      // chunk→document embedding pooling: vec_id div 10 groups 10 chunk
      // vectors per pseudo-document; per-dimension means via the
      // explode + hash-agg shape (no vector ever buffered per group).
      // Rounded to 6dp: the 10-term sums are order-insensitive at that
      // precision (same contract as every float aggregate here).
      (s, dir) => S.meanPoolFlat(
          t(s, dir, "embeddings")
            .select(expr("vec_id div 10").as("doc_id"), col("embedding")),
          "doc_id", "embedding")
        .select(col("doc_id"), col("pos"), round(col("mean_v"), 6).as("mean_v"))
        .orderBy("doc_id", "pos"),
      Some("""WITH e AS (
             |  SELECT vec_id // 10 AS doc_id,
             |         CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |flat AS (
             |  SELECT doc_id, generate_subscripts(v, 1) - 1 AS pos,
             |         unnest(v) AS val
             |  FROM e)
             |SELECT doc_id, CAST(pos AS INTEGER) AS pos,
             |       round(avg(val), 6) AS mean_v
             |FROM flat GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("s4_quantized_knn",
      // exact KNN over the int8-QUANTIZED corpus: 4x/8x smaller vectors,
      // searched directly (cosine is scale-invariant, VecCosine widens
      // bytes) — the memory-bound 100 TB regime. FULLY oracled: the
      // quantization is deterministic double arithmetic (scale =
      // max|x|/127 floored at 1e-30; round is half-away-from-zero in
      // both engines), and the quantized dot products are sums of
      // integer products < 2^53 — EXACT in double — so the only FP in
      // the cosine is the final sqrt/divide, identical IEEE ops in both
      // engines, absorbed by the same 6 dp pre-rank rounding s1 uses.
      // SimilarityFunctionsSpec additionally bounds the round-trip
      // error and recall@5 against the exact s1 results.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val corpus = emb.select(col("vec_id"),
          S.quantizeInt8(col("embedding")).getField("q").as("embedding"))
        val q = corpus.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.bruteForceTopK(corpus, q, 5).orderBy("query_id", "rank")
      },
      Some("""WITH qz AS (
             |  SELECT vec_id,
             |         list_transform(CAST(embedding AS DOUBLE[]),
             |           x -> round(x / (greatest(list_max(list_transform(
             |                  CAST(embedding AS DOUBLE[]), y -> abs(y))), 1e-30) / 127.0))) AS qv
             |  FROM embeddings),
             |q AS (SELECT vec_id AS query_id, qv AS query_vec FROM qz WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(e.qv, q.query_vec), 6) AS cosine
             |  FROM qz e, q WHERE e.vec_id <> q.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("s1_knn_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.bruteForceTopK(emb, q, 5).orderBy("query_id", "rank")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, embedding AS query_vec
             |  FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             |                                      CAST(q.query_vec AS DOUBLE[])), 6) AS cosine
             |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("a9_reconciliation_summary",
      (s, dir) => CrossValidationOps.reconciliationSummary(
          CrossValidationOps.compareSources(
            prices(t(s, dir, "lineitem")), grossSubset(s, dir), "ticker", "date", 1.0))
        .orderBy("ticker"),
      Some(pricesSql + grossSql +
        """, cmp AS (
          |  SELECT p.ticker,
          |         abs((p.close - g.close) / p.close * 100) AS diff_pct,
          |         abs((p.close - g.close) / p.close * 100) > 1.0 AS discrepancy_flag
          |  FROM prices p JOIN gross g ON p.ticker = g.ticker AND p."date" = g."date")
          |SELECT ticker, count(*) AS comparisons,
          |       CAST(COALESCE(SUM(CASE WHEN discrepancy_flag THEN 1 END), 0) AS BIGINT) AS discrepancy_count,
          |       max(diff_pct) AS max_diff_pct
          |FROM cmp GROUP BY ticker ORDER BY ticker""".stripMargin)),

    QueryDef("s3_ivf_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val centroids = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfTopK(emb, q, centroids, k = 5, nProbe = 2).orderBy("query_id", "rank")
      },
      Some("""WITH c AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 4),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |assign AS (
             |  SELECT vec_id, v, cid FROM (
             |    SELECT e.vec_id, e.v, c.cid,
             |           row_number() OVER (PARTITION BY e.vec_id
             |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM e, c) WHERE rn = 1),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
             |probes AS (
             |  SELECT query_id, qv, cid FROM (
             |    SELECT q.query_id, q.qv, c.cid,
             |           row_number() OVER (PARTITION BY q.query_id
             |             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS rn
             |    FROM q, c) WHERE rn <= 2),
             |scored AS (
             |  SELECT p.query_id, a.vec_id,
             |         round(list_cosine_similarity(a.v, p.qv), 6) AS cosine
             |  FROM assign a JOIN probes p ON a.cid = p.cid
             |  WHERE a.vec_id <> p.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("s3b_ivf_trained",
      // the IVF path you'd actually run at 10^5 centroids: k-means-TRAINED
      // centroids (distributed Lloyd, only the k centers reach the driver)
      // searched through the two-level coarse quantizer, so assignment
      // costs O(wProbe*k/coarseCells) cosines per row instead of O(k).
      // Training uses [[graft.functions.SimilarityFunctions
      // .trainCentroidsReplayable]] — pinned iterations, lowest-id init,
      // exact-decimal mean updates rounded 6dp — so the FULL pipeline
      // (train → coarse build → assignment → probe → top-k) replays in
      // the generated oracle below (MLlib's k-means|| init was the one
      // black box; the r11 verdict's item 7). QueriesSpec additionally
      // bounds mean recall@5 against the exact s1 results. The synthetic
      // embeddings are near-uniform directions (max pairwise cosine <
      // 0.7, no cluster structure), so the probe budget here is wide —
      // nProbe 12/16 — to make the recall bound meaningful; real corpora
      // cluster, and proportionally smaller budgets hold the same recall.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val centroids = S.trainCentroidsReplayable(emb, k = 16, iters = 3)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfTopKHierarchical(emb, q, centroids, k = 5, nProbe = 12,
          coarseCells = 4, wProbe = 3).orderBy("query_id", "rank")
      },
      Some(s3bOracle(k = 16, dim = 64, trainIters = 3, coarseCells = 4,
        coarseIters = 10, wProbe = 3, nProbe = 12, topK = 5))),

    QueryDef("s6_lsh_incremental",
      // INCREMENTAL embedding near-dup: the perturbed copies (ids
      // +100000) play the "new batch" probing the original corpus —
      // cross-side banded join only, no existing x existing self-join.
      // Shares s2's generated-plane CTEs; the candidate filter swaps
      // the ordering predicate for the side split.
      (s, dir) => {
        val all = plantedEmbeddings(s, dir)
        S.lshNeighborPairsAgainst(
            all.filter(col("id") < 100000L), all.filter(col("id") >= 100000L),
            dim = 64, nBits = 16, bands = 4, minCosine = 0.8,
            idCol = "id", vecCol = "v")
          .orderBy("id_a", "id_b")
      },
      Some {
        // the oracle is s2's with only the candidate predicate swapped —
        // a reworded s2 must fail HERE, not silently no-op the replace
        // and degrade s6's oracle to self-join semantics
        require(s2OracleCtes.contains("WHERE x.id < y.id"),
          "s6's oracle rewrites s2's candidate predicate; update both together")
        s2OracleCtes.replace("WHERE x.id < y.id",
          "WHERE x.id < 100000 AND y.id >= 100000") +
          "\nSELECT id_a, id_b, cosine FROM verified\nORDER BY id_a, id_b"
      }),

    QueryDef("s7_ann_recall",
      // Recall@5 of the IVF index against the exact brute-force scan,
      // per query — the evaluation harness every ANN deployment ships
      // beside the index itself (an approximate index without a
      // measured recall is a guess). Reuses s1's and s3's operators
      // UNCHANGED and joins the two top-k sets on (query_id, vec_id);
      // both sides are k·|queries| rows — broadcast-sized by
      // construction at any corpus scale, so the recall overlay adds
      // no data-sized shuffle beyond what the two searches already do.
      // n_hits is an exact count; recall one exact IEEE division.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        val centroids = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
        val exact = S.bruteForceTopK(emb, q, 5).select("query_id", "vec_id")
        val approx = S.ivfTopK(emb, q, centroids, k = 5, nProbe = 2)
          .select("query_id", "vec_id")
        val hits = exact.join(approx, Seq("query_id", "vec_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
        q.select("query_id").join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .withColumn("recall", col("n_hits").cast("double") / 5.0)
          .orderBy("query_id")
      },
      Some("""WITH bq AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings WHERE vec_id < 8),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |bscored AS (
             |  SELECT bq.query_id, e.vec_id,
             |         round(list_cosine_similarity(e.v, bq.qv), 6) AS cosine
             |  FROM e, bq WHERE e.vec_id <> bq.query_id),
             |bf AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           row_number() OVER (PARTITION BY query_id
             |             ORDER BY cosine DESC, vec_id) AS rn
             |    FROM bscored) WHERE rn <= 5),
             |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |      FROM embeddings WHERE vec_id < 4),
             |assign AS (
             |  SELECT vec_id, v, cid FROM (
             |    SELECT e.vec_id, e.v, c.cid,
             |           row_number() OVER (PARTITION BY e.vec_id
             |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM e, c) WHERE rn = 1),
             |probes AS (
             |  SELECT query_id, qv, cid FROM (
             |    SELECT bq.query_id, bq.qv, c.cid,
             |           row_number() OVER (PARTITION BY bq.query_id
             |             ORDER BY list_cosine_similarity(bq.qv, c.cv) DESC, c.cid) AS rn
             |    FROM bq, c) WHERE rn <= 2),
             |ascored AS (
             |  SELECT p.query_id, a.vec_id,
             |         round(list_cosine_similarity(a.v, p.qv), 6) AS cosine
             |  FROM assign a JOIN probes p ON a.cid = p.cid
             |  WHERE a.vec_id <> p.query_id),
             |af AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           row_number() OVER (PARTITION BY query_id
             |             ORDER BY cosine DESC, vec_id) AS rn
             |    FROM ascored) WHERE rn <= 5),
             |hits AS (
             |  SELECT bf.query_id, count(*) AS n
             |  FROM bf JOIN af ON bf.query_id = af.query_id AND bf.vec_id = af.vec_id
             |  GROUP BY 1)
             |SELECT bq.query_id,
             |  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
             |  CAST(COALESCE(h.n, 0) AS DOUBLE) / 5.0 AS recall
             |FROM bq LEFT JOIN hits h ON bq.query_id = h.query_id
             |ORDER BY bq.query_id""".stripMargin)),

    QueryDef("s8_pq_adc_topk",
      // Product-quantized ANN (Jégou TPAMI 2011): the 64-dim corpus
      // compresses to 8 subspace codes per vector ([[SimilarityFunctions
      // .pqEncode]]) and queries scan the CODES, never the raw vectors,
      // via per-query ADC lookup tables ([[pqTopK]]) — the memory shape
      // that lets a 100 TB corpus's vectors serve ANN from executor RAM.
      // Codebooks here are data-derived, not trained (code c of subspace
      // s = dims [8s,8s+8) of embedding c, c < 4 — the same fixed-
      // centroid convention s3/s7 use), so DuckDB replays the ENTIRE
      // pipeline exactly: slice → argmin-L2 encode → reconstruct →
      // cosine → top-k. Recall vs the exact scan is pinned by the
      // trained-codebook spec; THIS query pins bit-level semantics.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val enc = S.pqEncode(emb, cb, dim = 64, m = 8, codes = 4)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.pqTopK(enc, q, cb, dim = 64, m = 8, codes = 4, k = 5)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |cb AS (
             |  SELECT s.subspace, CAST(c.vec_id AS INTEGER) AS code,
             |         list_slice(c.v, s.subspace * 8 + 1, s.subspace * 8 + 8) AS centroid_vec
             |  FROM e c, generate_series(0, 7) AS s(subspace)
             |  WHERE c.vec_id < 4),
             |enc AS (
             |  SELECT vec_id, subspace, centroid_vec FROM (
             |    SELECT e.vec_id, cb.subspace, cb.centroid_vec,
             |           row_number() OVER (PARTITION BY e.vec_id, cb.subspace
             |             ORDER BY list_distance(
             |               list_slice(e.v, cb.subspace * 8 + 1, cb.subspace * 8 + 8),
             |               cb.centroid_vec), cb.code) AS rn
             |    FROM e, cb) WHERE rn = 1),
             |recon AS (
             |  SELECT vec_id, flatten(list(centroid_vec ORDER BY subspace)) AS rv
             |  FROM enc GROUP BY vec_id),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, r.vec_id,
             |         round(list_cosine_similarity(r.rv, q.qv), 6) AS cosine
             |  FROM recon r, q WHERE r.vec_id <> q.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("s9_pq_rerank",
      // ADC candidates → exact re-rank ([[SimilarityFunctions
      // .pqTopKRerank]]): the compressed-code scan nominates each
      // query's 15 best approximate matches, ONLY those rows read their
      // raw vectors for an exact cosine, and the final top-5 ranks the
      // exact scores — the production ANN serving shape (compressed
      // index in RAM, exact precision on the head of the list). Same
      // fixed data-derived codebooks as s8, so DuckDB replays candidate
      // generation bit-for-bit and then the exact rescore join.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val enc = S.pqEncode(emb, cb, dim = 64, m = 8, codes = 4)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.pqTopKRerank(enc, emb, q, cb, dim = 64, m = 8, codes = 4,
            k = 5, rerank = 15)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |cb AS (
             |  SELECT s.subspace, CAST(c.vec_id AS INTEGER) AS code,
             |         list_slice(c.v, s.subspace * 8 + 1, s.subspace * 8 + 8) AS centroid_vec
             |  FROM e c, generate_series(0, 7) AS s(subspace)
             |  WHERE c.vec_id < 4),
             |enc AS (
             |  SELECT vec_id, subspace, centroid_vec FROM (
             |    SELECT e.vec_id, cb.subspace, cb.centroid_vec,
             |           row_number() OVER (PARTITION BY e.vec_id, cb.subspace
             |             ORDER BY list_distance(
             |               list_slice(e.v, cb.subspace * 8 + 1, cb.subspace * 8 + 8),
             |               cb.centroid_vec), cb.code) AS rn
             |    FROM e, cb) WHERE rn = 1),
             |recon AS (
             |  SELECT vec_id, flatten(list(centroid_vec ORDER BY subspace)) AS rv
             |  FROM enc GROUP BY vec_id),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
             |adc AS (
             |  SELECT q.query_id, r.vec_id,
             |         round(list_cosine_similarity(r.rv, q.qv), 6) AS acos
             |  FROM recon r, q WHERE r.vec_id <> q.query_id),
             |cand AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           row_number() OVER (PARTITION BY query_id
             |             ORDER BY acos DESC, vec_id) AS rn
             |    FROM adc) WHERE rn <= 15),
             |rescored AS (
             |  SELECT c.query_id, c.vec_id,
             |         round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
             |  FROM cand c
             |  JOIN e ON e.vec_id = c.vec_id
             |  JOIN q ON q.query_id = c.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM rescored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("s10_knn_label_vote",
      // KNN majority-vote auto-labeling ([[SimilarityFunctions
      // .knnLabelVote]]) over the labeled embeddings: each of the first
      // 20 vectors takes the label held by most of its 10 exact-cosine
      // nearest neighbors (self excluded, vote ties to the lower label)
      // — leave-one-out label propagation, the bootstrap for
      // classifying an unlabeled corpus from a seed set. The synthetic
      // labels are nearly geometry-free (within-label cosine ≈ 0.01 vs
      // ≈ 0 across), so this pins the vote SEMANTICS bit-for-bit, not
      // accuracy — the clustered-data behavior is spec-pinned with
      // controlled vectors. Full DuckDB replay: scan → top-k → label
      // join → argmax.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.knnLabelVote(emb, q, emb.select(col("vec_id"), col("label")), k = 10)
          .orderBy("query_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(e.v, q.qv), 6) AS cos
             |  FROM e, q WHERE e.vec_id <> q.query_id),
             |nn AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           row_number() OVER (PARTITION BY query_id
             |             ORDER BY cos DESC, vec_id) AS rn
             |    FROM scored) WHERE rn <= 10),
             |v AS (
             |  SELECT nn.query_id, e.label, count(*) AS votes
             |  FROM nn JOIN e ON e.vec_id = nn.vec_id
             |  WHERE e.label IS NOT NULL GROUP BY 1, 2),
             |w AS (
             |  SELECT query_id, label, votes,
             |         row_number() OVER (PARTITION BY query_id
             |           ORDER BY votes DESC, label) AS rn
             |  FROM v)
             |SELECT query_id, label, votes FROM w WHERE rn = 1
             |ORDER BY query_id""".stripMargin)),

    QueryDef("s11_ivfpq_topk",
      // IVF-PQ, the composition that serves ANN at 100 TB
      // ([[SimilarityFunctions.ivfPqIndex]]/[[ivfPqTopK]]): the stored
      // index is (cell, 8 codes) per vector — raw vectors never resident
      // at serve time — and each query ADC-scans ONLY its 2 nearest of 4
      // coarse cells. Fixed data-derived centroids (vec_id < 4, the
      // s3/s7 convention) and codebooks (s8's), so DuckDB replays
      // assignment, probing, encoding, reconstruction, and scoring
      // bit-for-bit.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").cast("array<double>").as("centroid_vec"))
        val idx = S.ivfPqIndex(emb, cents, cb, dim = 64, m = 8, codes = 4)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfPqTopK(idx, q, cents, cb, dim = 64, m = 8, codes = 4,
            k = 5, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |cb AS (
             |  SELECT s.subspace, CAST(c.vec_id AS INTEGER) AS code,
             |         list_slice(c.v, s.subspace * 8 + 1, s.subspace * 8 + 8) AS centroid_vec
             |  FROM e c, generate_series(0, 7) AS s(subspace)
             |  WHERE c.vec_id < 4),
             |enc AS (
             |  SELECT vec_id, subspace, centroid_vec FROM (
             |    SELECT e.vec_id, cb.subspace, cb.centroid_vec,
             |           row_number() OVER (PARTITION BY e.vec_id, cb.subspace
             |             ORDER BY list_distance(
             |               list_slice(e.v, cb.subspace * 8 + 1, cb.subspace * 8 + 8),
             |               cb.centroid_vec), cb.code) AS rn
             |    FROM e, cb) WHERE rn = 1),
             |recon AS (
             |  SELECT vec_id, flatten(list(centroid_vec ORDER BY subspace)) AS rv
             |  FROM enc GROUP BY vec_id),
             |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
             |cell AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT e.vec_id, c.cid,
             |           row_number() OVER (PARTITION BY e.vec_id
             |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM e, cents c) WHERE rn = 1),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
             |probe AS (
             |  SELECT query_id, cid FROM (
             |    SELECT q.query_id, c.cid,
             |           row_number() OVER (PARTITION BY q.query_id
             |             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS rn
             |    FROM q, cents c) WHERE rn <= 2),
             |scored AS (
             |  SELECT q.query_id, r.vec_id,
             |         round(list_cosine_similarity(r.rv, q.qv), 6) AS cosine
             |  FROM recon r
             |  JOIN cell ON cell.vec_id = r.vec_id
             |  JOIN probe p ON p.cid = cell.cid
             |  JOIN q ON q.query_id = p.query_id
             |  WHERE r.vec_id <> q.query_id),
             |ranked AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM scored)
             |SELECT query_id, vec_id, cosine, "rank" FROM ranked
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("s12_ivfpq_rerank",
      // the FULL serving composition ([[SimilarityFunctions
      // .ivfPqTopKRerank]], Jégou et al. TPAMI 2011 §V): probe 2 of 4
      // cells, ADC-score their index rows, widen to 10 candidates,
      // re-score the head EXACTLY from raw vectors, keep the true
      // top 5. Only candidate rows ever read a raw vector. Oracle =
      // s11's CTEs with the rank-10 cut plus the exact-cosine tail.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cb = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").cast("int").as("code"),
            col("embedding").cast("array<double>").as("v"))
          .select(explode(sequence(lit(0), lit(7))).as("subspace"),
            col("code"), col("v"))
          .select(col("subspace"), col("code"),
            slice(col("v"), col("subspace") * 8 + 1, lit(8)).as("centroid_vec"))
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").cast("array<double>").as("centroid_vec"))
        val idx = S.ivfPqIndex(emb, cents, cb, dim = 64, m = 8, codes = 4)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.ivfPqTopKRerank(idx, emb, q, cents, cb, dim = 64, m = 8,
            codes = 4, k = 5, rerank = 10, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |cb AS (
             |  SELECT s.subspace, CAST(c.vec_id AS INTEGER) AS code,
             |         list_slice(c.v, s.subspace * 8 + 1, s.subspace * 8 + 8) AS centroid_vec
             |  FROM e c, generate_series(0, 7) AS s(subspace)
             |  WHERE c.vec_id < 4),
             |enc AS (
             |  SELECT vec_id, subspace, centroid_vec FROM (
             |    SELECT e.vec_id, cb.subspace, cb.centroid_vec,
             |           row_number() OVER (PARTITION BY e.vec_id, cb.subspace
             |             ORDER BY list_distance(
             |               list_slice(e.v, cb.subspace * 8 + 1, cb.subspace * 8 + 8),
             |               cb.centroid_vec), cb.code) AS rn
             |    FROM e, cb) WHERE rn = 1),
             |recon AS (
             |  SELECT vec_id, flatten(list(centroid_vec ORDER BY subspace)) AS rv
             |  FROM enc GROUP BY vec_id),
             |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
             |cell AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT e.vec_id, c.cid,
             |           row_number() OVER (PARTITION BY e.vec_id
             |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM e, cents c) WHERE rn = 1),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
             |probe AS (
             |  SELECT query_id, cid FROM (
             |    SELECT q.query_id, c.cid,
             |           row_number() OVER (PARTITION BY q.query_id
             |             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS rn
             |    FROM q, cents c) WHERE rn <= 2),
             |scored AS (
             |  SELECT q.query_id, r.vec_id,
             |         round(list_cosine_similarity(r.rv, q.qv), 6) AS cosine
             |  FROM recon r
             |  JOIN cell ON cell.vec_id = r.vec_id
             |  JOIN probe p ON p.cid = cell.cid
             |  JOIN q ON q.query_id = p.query_id
             |  WHERE r.vec_id <> q.query_id),
             |cand AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |           row_number() OVER (PARTITION BY query_id
             |             ORDER BY cosine DESC, vec_id) AS rn
             |    FROM scored) WHERE rn <= 10),
             |ex AS (
             |  SELECT c.query_id, c.vec_id,
             |         round(list_cosine_similarity(ev.v, q.qv), 6) AS cosine
             |  FROM cand c
             |  JOIN e ev ON ev.vec_id = c.vec_id
             |  JOIN q ON q.query_id = c.query_id
             |  WHERE round(list_cosine_similarity(ev.v, q.qv), 6) IS NOT NULL),
             |rr AS (
             |  SELECT query_id, vec_id, cosine,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |           ORDER BY cosine DESC, vec_id) AS INTEGER) AS "rank"
             |  FROM ex)
             |SELECT query_id, vec_id, cosine, "rank" FROM rr
             |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    QueryDef("s2_lsh_pairs",
      // the embeddings table has NO true near-duplicates (max pairwise
      // cosine < 0.7), so the query plants them: union the corpus with a
      // deterministically perturbed copy (v + 0.05 elementwise → planted
      // cosine ≈ 0.92–0.95). Banded hyperplane LSH (4 bands × 4 bits)
      // must then recover the planted pairs — recall ≈ 0.97 at these
      // cosines, vs ≈ 0 for full-signature equality. Fully oracle-checked:
      // the hyperplane coefficients are a pure function of the seed
      // ([[SimilarityFunctions.hyperplanes]]), so [[s2OracleSql]] embeds
      // the IDENTICAL plane doubles as SQL literals and DuckDB replays
      // signature → banding → candidates → cosine verify end-to-end.
      (s, dir) => S.lshNeighborPairs(plantedEmbeddings(s, dir), dim = 64,
          nBits = 16, bands = 4, minCosine = 0.8, idCol = "id", vecCol = "v")
        .orderBy("id_a", "id_b"),
      Some(s2OracleSql)),

    QueryDef("d5_hash_split",
      // deterministic train/valid/test carving: split membership is a
      // pure hash of the stable doc id — reproducible across runs,
      // partitionings, and ENGINES (the md5-based hash lets DuckDB
      // recompute the identical assignment, which is the whole point:
      // every system touching the corpus agrees on the split).
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          graft.functions.SamplingFunctions.splitColumn(
            col("doc_id").cast("string"), pctTrain = 80, pctValid = 10,
            hash = D.md5Hash60).as("split"))
        .groupBy("split").agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("split"),
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
             |  FROM documents),
             |s AS (
             |  SELECT doc_id,
             |    CASE WHEN bucket < 80 THEN 'train'
             |         WHEN bucket < 90 THEN 'valid'
             |         ELSE 'test' END AS split
             |  FROM b)
             |SELECT split, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM s GROUP BY split ORDER BY split""".stripMargin)),

    QueryDef("d6_stratified_sample",
      // class-rebalancing: the dominant language keeps 10% while the
      // rest keep 50% — membership a pure row-local hash predicate
      // (pushes to the scan, no shuffle, no sampling state), md5-keyed
      // so DuckDB reproduces the identical kept-set.
      (s, dir) => {
        val d = docs(s, dir).withColumn("k", col("doc_id").cast("string"))
        Sam.stratifiedSampleByHash(d, "k", "lang",
          Map("en" -> 100), defaultPermille = 500, hash = D.md5Hash60)
          .groupBy("lang").agg(count(lit(1)).as("n"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy("lang")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, lang,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS bucket
             |  FROM documents),
             |s AS (
             |  SELECT doc_id, lang FROM b
             |  WHERE bucket < CASE WHEN lang = 'en' THEN 100 ELSE 500 END)
             |SELECT lang, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM s GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef("d8_source_cap",
      // per-domain cap (Gopher/C4 crawl hygiene): at most 15 documents
      // per source, first-by-id — one deterministic window, rank a pure
      // function of column values.
      (s, dir) => Sam.capPerGroup(docs(s, dir), "source", "doc_id", k = 15)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM documents
             |QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 15
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("d9_temperature_sample",
      // multilingual-LM temperature sampling (rates ∝ n^α, α = 0.5,
      // 40% target): data-derived per-language keep rates, applied as
      // the engine-portable md5 hash filter; the oracle re-derives the
      // identical rates and membership. 6dp rate rounding absorbs
      // pow/sum ulp differences across engines.
      (s, dir) => Sam.temperatureSample(
          docs(s, dir).withColumn("_k", col("doc_id").cast("string")),
          "_k", "lang", alpha = 0.5, targetFraction = 0.4,
          hash = D.md5Hash60(_))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("lang"),
      Some("""WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot,
             |             sum(pow(CAST(n AS DOUBLE), 0.5)) AS pw FROM n),
             |r AS (SELECT lang, round(least(1.0,
             |        0.4 * tot * pow(CAST(n AS DOUBLE), 0.5) / pw
             |          / CAST(n AS DOUBLE)), 6) AS rate
             |      FROM n, t),
             |k AS (
             |  SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
             |  WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |          % 1000000 < rate * 1e6)
             |SELECT lang, count(*) AS n_kept, min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM k GROUP BY 1 ORDER BY lang""".stripMargin)),

    QueryDef("d11_grouped_split",
      // leakage-safe split carving: the split key is the SOURCE, not
      // the doc id, so every document of a domain lands in the same
      // split — near-duplicates within a domain can never straddle
      // train/test. Membership stays the same pure md5-hash predicate
      // as d5; the oracle checks each source maps to exactly one split.
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), col("source"),
          graft.functions.SamplingFunctions.splitColumn(
            col("source"), pctTrain = 80, pctValid = 10,
            hash = D.md5Hash60).as("split"))
        .groupBy("split").agg(count(lit(1)).as("n_docs"),
          count_distinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("min_id"))
        .orderBy("split"),
      Some("""WITH b AS (
             |  SELECT doc_id, source,
             |    CAST(('0x' || substring(md5(source), 1, 15)) AS BIGINT) % 100 AS bucket
             |  FROM documents),
             |s AS (
             |  SELECT doc_id, source,
             |    CASE WHEN bucket < 80 THEN 'train'
             |         WHEN bucket < 90 THEN 'valid'
             |         ELSE 'test' END AS split
             |  FROM b)
             |SELECT split, count(*) AS n_docs,
             |       count(DISTINCT source) AS n_sources, min(doc_id) AS min_id
             |FROM s GROUP BY split ORDER BY split""".stripMargin)),

    QueryDef("d12_token_budget",
      // token-budget mixture downsampling: every source keeps rate
      // min(1, 1300 / its token mass) — over-budget sources thin toward
      // 1300 kept tokens, under-budget ones keep everything — applied
      // as the engine-portable md5 hash predicate. The oracle re-derives
      // the identical 6dp rates and membership from the same token CTE
      // d10 already hash-matches.
      (s, dir) => {
        val d = docs(s, dir)
          .select(col("doc_id"), col("source"),
            T.tokenCount(col("text")).as("n_tok"))
          .withColumn("_k", col("doc_id").cast("string"))
        Sam.tokenBudgetSample(d, "_k", "source", "n_tok", budgetTokens = 1300L,
            hash = D.md5Hash60(_))
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("kept_tokens"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy("source")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, source,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok
             |  FROM documents),
             |r AS (SELECT source,
             |        round(least(1.0, 1300.0 / CAST(sum(n_tok) AS DOUBLE)), 6) AS rate
             |      FROM b GROUP BY 1),
             |k AS (
             |  SELECT b.doc_id, b.source, b.n_tok FROM b JOIN r USING (source)
             |  WHERE CAST(('0x' || substring(md5(CAST(b.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |          % 1000000 < rate * 1e6)
             |SELECT source, count(*) AS n_kept,
             |       CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
             |       min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM k GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("d13_cluster_keep_best",
      // quality-canonical near-dup dedup: exact-jaccard clusters (d3's
      // pairs, d7's transitive closure) keep their HIGHEST-quality
      // member (min-id tiebreak) instead of min-id — the survivor of a
      // boilerplate cluster is its best rendering, not a crawl
      // accident. Oracle stitches the three already-hash-matched CTE
      // families and replays the argmax with a window.
      (s, dir) => {
        val d = docs(s, dir)
        val scored = d.select(col("doc_id"),
          T.qualityScore(col("text")).as("q"))
        val pairs = D.jaccardPairs(d, "doc_id", "text",
          n = 3, threshold = 0.8, maxDf = 1000L)
        D.keepBestPerCluster(scored, pairs, "doc_id", "q")
          .select(col("doc_id"), round(col("q"), 6).as("q"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sgl FROM sh),
             |p AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
             |         count(*) AS shared
             |  FROM ex a JOIN ex b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2, 3, 4),
             |v AS (
             |  SELECT id_a, id_b FROM p
             |  WHERE CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) >= 0.8),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM v
             |          UNION SELECT id_b, id_a FROM v),
             |reach(id, r) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT reach.id, e2.dst FROM reach JOIN edges e2 ON reach.r = e2.src),
             |cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
             |m AS (
             |  SELECT doc_id,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio
             |  FROM documents),
             |q0 AS (SELECT doc_id,
             |  (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |   + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |   + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS q
             |FROM m),
             |ranked AS (
             |  SELECT cc.id,
             |    row_number() OVER (PARTITION BY cc.component ORDER BY q0.q DESC, cc.id) AS rn
             |  FROM cc JOIN q0 ON q0.doc_id = cc.id),
             |doomed AS (SELECT id FROM ranked WHERE rn > 1)
             |SELECT doc_id, round(q, 6) AS q FROM q0
             |WHERE doc_id NOT IN (SELECT id FROM doomed)
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("d14_line_dedup",
      // C4-style duplicate-LINE removal ([[DedupFunctions
      // .removeDuplicateLines]]): boilerplate dies line-by-line inside
      // documents instead of dropping whole pages. The synthetic docs
      // are single-line and all-distinct, so the query plants the
      // boilerplate deterministically (cookie header on doc_id%3,
      // legal footer on doc_id%2, a short "--" separator everywhere —
      // below minChars, so it must SURVIVE everywhere); after removal
      // each planted line exists only at its lowest (doc, pos) and
      // every original text line is untouched. Both engines build the
      // same planted corpus, so the oracle replays end-to-end.
      (s, dir) => {
        val d = docs(s, dir)
        val planted = d.select(col("doc_id"),
          concat_ws("\n",
            when(col("doc_id") % 3 === 0,
              lit("COOKIE NOTICE: this site uses cookies to improve your experience")),
            lit("--"),
            col("text"),
            when(col("doc_id") % 2 === 0,
              lit("(c) example.com - all rights reserved - terms apply")))
            .as("text"))
        D.removeDuplicateLines(planted, "doc_id", "text", minChars = 10)
          .orderBy("doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id, concat_ws(chr(10),
             |    CASE WHEN doc_id % 3 = 0 THEN 'COOKIE NOTICE: this site uses cookies to improve your experience' END,
             |    '--',
             |    text,
             |    CASE WHEN doc_id % 2 = 0 THEN '(c) example.com - all rights reserved - terms apply' END) AS text
             |  FROM documents),
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
             |  FROM kept GROUP BY doc_id)
             |SELECT p.doc_id, coalesce(r.text, '') AS text
             |FROM planted p LEFT JOIN rebuilt r USING (doc_id)
             |ORDER BY p.doc_id""".stripMargin)),

    QueryDef("d15_title_dedup",
      // bounded-edit-distance near-dup pairs ([[DedupFunctions
      // .editDistancePairs]]) — the short-string dedup Jaccard is too
      // coarse for. The synthetic docs have no titles, so the query
      // plants them (typo'd twins at distance 1 and 2, plus numbered
      // series whose neighbors differ by a digit) over doc_id < 60;
      // candidates block on shared char trigrams (q-gram lemma — see
      // the operator doc), far grams df-capped, Levenshtein verified.
      // Both engines build the same titles and replay end-to-end.
      (s, dir) => {
        val titles = docs(s, dir).filter(col("doc_id") < 60)
          .select(col("doc_id"),
            when(col("doc_id") % 4 === 0,
              concat(lit("stochastic gradient descent overview "),
                expr("doc_id div 4")))
            .when(col("doc_id") % 4 === 1,
              concat(lit("stochastic gradient descent overviev "),
                expr("doc_id div 4")))
            .when(col("doc_id") % 4 === 2,
              concat(lit("complete treatise on offshore sailing "),
                expr("doc_id div 4")))
            .otherwise(
              concat(lit("cmplete treatise on offshore sailng "),
                expr("doc_id div 4")))
            .as("title"))
        D.editDistancePairs(titles, "doc_id", "title",
            maxDist = 2, q = 3, maxDf = 50L)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH titles AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 4 = 0
             |           THEN 'stochastic gradient descent overview ' || CAST(doc_id // 4 AS VARCHAR)
             |         WHEN doc_id % 4 = 1
             |           THEN 'stochastic gradient descent overviev ' || CAST(doc_id // 4 AS VARCHAR)
             |         WHEN doc_id % 4 = 2
             |           THEN 'complete treatise on offshore sailing ' || CAST(doc_id // 4 AS VARCHAR)
             |         ELSE 'cmplete treatise on offshore sailng ' || CAST(doc_id // 4 AS VARCHAR)
             |    END AS title
             |  FROM documents WHERE doc_id < 60),
             |g0 AS (
             |  SELECT doc_id, length(title) AS len, unnest(
             |    CASE WHEN length(title) <= 3 THEN [title]
             |         ELSE list_distinct(list_transform(
             |           generate_series(1, length(title) - 2),
             |           i -> substr(title, i, 3))) END) AS g
             |  FROM titles),
             |oc AS (SELECT g FROM g0 GROUP BY g HAVING count(*) > 50),
             |gf AS (SELECT g0.* FROM g0 LEFT JOIN oc USING (g) WHERE oc.g IS NULL),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM gf a JOIN gf b ON a.g = b.g
             |  WHERE a.doc_id < b.doc_id AND abs(a.len - b.len) <= 2),
             |v AS (
             |  SELECT c.id_a, c.id_b,
             |         CAST(levenshtein(ta.title, tb.title) AS INTEGER) AS dist
             |  FROM cand c
             |  JOIN titles ta ON ta.doc_id = c.id_a
             |  JOIN titles tb ON tb.doc_id = c.id_b)
             |SELECT id_a, id_b, dist FROM v WHERE dist <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("d18_substring_dedup",
      // exact duplicated-SPAN removal ([[DedupFunctions
      // .removeDuplicateSpans]], Lee et al. ACL 2022's ExactSubstr at
      // token granularity): the synthetic docs are distinct, so the
      // query plants a shared 12-token quote on doc_id%4 — with k=8
      // every 8-gram inside the quote is duplicated across ~125 docs,
      // only the lowest doc_id keeps its copy, and the cut-index union
      // removes the whole quote from everyone else while grams
      // straddling into each doc's own text stay unique and survive.
      // md5 hash form → DuckDB replays the identical gram table,
      // keeper rule, and token-union cut end-to-end.
      (s, dir) => {
        val quote =
          "the quick brown fox jumps over the lazy dog every single morning"
        val planted = docs(s, dir).select(col("doc_id"),
          when(col("doc_id") % 4 === 0, concat(col("text"), lit(" " + quote)))
            .otherwise(col("text")).as("text"))
        D.removeDuplicateSpans(planted, "doc_id", "text", k = 8,
            hash = D.md5Hash60)
          .orderBy("doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 4 = 0
             |      THEN text || ' the quick brown fox jumps over the lazy dog every single morning'
             |      ELSE text END AS text
             |  FROM documents),
             |tk AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
             |  FROM planted),
             |toks AS (
             |  SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos, unnest(t) AS tok
             |  FROM tk),
             |grams AS (
             |  SELECT doc_id, i - 1 AS pos,
             |    CAST(('0x' || substring(md5(array_to_string(t[i:i+7], ' ')), 1, 15)) AS BIGINT) AS h
             |  FROM tk, LATERAL unnest(generate_series(1, len(t) - 7)) AS u(i)
             |  WHERE len(t) >= 8),
             |keep AS (
             |  SELECT h, doc_id AS kid, pos AS kpos FROM (
             |    SELECT h, doc_id, pos,
             |           count(*) OVER (PARTITION BY h) AS c,
             |           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
             |    FROM grams) WHERE rn = 1 AND c > 1),
             |cuts AS (
             |  SELECT DISTINCT g.doc_id, g.pos + o.o AS cut
             |  FROM grams g
             |  JOIN keep ON g.h = keep.h
             |    AND NOT (g.doc_id = keep.kid AND g.pos = keep.kpos),
             |  LATERAL unnest(generate_series(0, 7)) AS o(o)),
             |kept AS (
             |  SELECT t.doc_id, t.pos, t.tok
             |  FROM toks t LEFT JOIN cuts c
             |    ON t.doc_id = c.doc_id AND t.pos = c.cut
             |  WHERE c.doc_id IS NULL),
             |rebuilt AS (
             |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
             |  FROM kept GROUP BY doc_id)
             |SELECT p.doc_id, coalesce(r.text, '') AS text
             |FROM planted p LEFT JOIN rebuilt r USING (doc_id)
             |ORDER BY p.doc_id""".stripMargin)),

    QueryDef("d19_semantic_dedup",
      // SemDeDup pairs ([[SimilarityFunctions.semanticDedupPairs]],
      // Abbas et al. 2023): cluster-bounded semantic near-dup pairs
      // over the planted embedding corpus — 8 deterministic centroids
      // (the s3 row-sample convention), argmax-cosine assignment with
      // lower-centroid ties, pairwise cosine ONLY within a cluster.
      // Every planted twin (cosine ≈ 0.92-0.95) co-clusters with its
      // original and surfaces; the oracle replays assignment, the
      // within-cluster join, and the 6dp-rounded threshold.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").cast("array<double>").as("centroid_vec"))
        S.semanticDedupPairs(plantedEmbeddings(s, dir), centroids,
            threshold = 0.9, idCol = "id", vecCol = "v")
          .orderBy("id_a", "id_b")
      },
      Some("""WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |corpus AS (
             |  SELECT id, v FROM base
             |  UNION ALL
             |  SELECT id + 100000 AS id, list_transform(v, x -> x + 0.05) AS v FROM base),
             |c AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 8),
             |assign AS (
             |  SELECT id, v, cid FROM (
             |    SELECT e.id, e.v, c.cid,
             |           row_number() OVER (PARTITION BY e.id
             |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM corpus e, c) WHERE rn = 1)
             |SELECT a.id AS id_a, b.id AS id_b,
             |       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
             |FROM assign a JOIN assign b ON a.cid = b.cid AND a.id < b.id
             |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.9
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("d20_dsir_sample",
      // DSIR importance resampling ([[SamplingFunctions.dsirSample]],
      // Xie et al. NeurIPS 2023): hashed unigram+bigram bag models for
      // a target subset (doc_id%7 — the "curated corpus" stand-in) and
      // the raw corpus, per-doc log likelihood-ratio, deterministic
      // Gumbel-top-k selection (noise from the md5 hash of the id).
      // The oracle replays features, both smoothed models, the summed
      // ratio, the hashed Gumbel, and the top-100 cut end-to-end.
      (s, dir) => {
        val d = docs(s, dir)
        Sam.dsirSample(d.select(col("doc_id"), col("text")),
            d.filter(col("doc_id") % 7 === 0), "doc_id", "text",
            k = 100, hash = D.md5Hash60)
          .select(col("doc_id"), col("log_ratio"), col("score"))
          .orderBy("doc_id")
      },
      Some("""WITH rtoks AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |      t -> len(t) > 0) AS tk
             |  FROM documents),
             |feats AS (
             |  SELECT doc_id, f FROM rtoks, UNNEST(list_concat(tk,
             |    CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
             |         ELSE list_transform(generate_series(1, len(tk) - 1),
             |                i -> tk[i] || ' ' || tk[i+1]) END)) AS u(f)),
             |fb AS (
             |  SELECT doc_id,
             |    CAST(('0x' || substring(md5(f), 1, 15)) AS BIGINT) % 65536 AS b
             |  FROM feats),
             |tm AS (SELECT b, count(*) AS nt FROM fb WHERE doc_id % 7 = 0 GROUP BY 1),
             |rm AS (SELECT b, count(*) AS nr FROM fb GROUP BY 1),
             |tt AS (SELECT sum(nt) AS ttot FROM tm),
             |rt AS (SELECT sum(nr) AS rtot FROM rm),
             |sc AS (
             |  SELECT r.doc_id,
             |    sum(ln((coalesce(tm.nt, 0) + 1.0) / (ttot + 65536.0))
             |      - ln((coalesce(rm.nr, 0) + 1.0) / (rtot + 65536.0))) AS lr
             |  FROM fb r LEFT JOIN tm ON r.b = tm.b LEFT JOIN rm ON r.b = rm.b, tt, rt
             |  GROUP BY 1),
             |w AS (
             |  SELECT d.doc_id, round(coalesce(sc.lr, 0.0), 6) AS log_ratio
             |  FROM documents d LEFT JOIN sc USING (doc_id)),
             |g AS (
             |  SELECT doc_id, log_ratio,
             |    round(log_ratio - ln(-ln(
             |      (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |         % 1000000 + 0.5) / 1000000.0)), 6) AS score
             |  FROM w),
             |sel AS (
             |  SELECT doc_id, log_ratio, score,
             |         row_number() OVER (ORDER BY score DESC, doc_id) AS rn
             |  FROM g)
             |SELECT doc_id, log_ratio, score FROM sel WHERE rn <= 100
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("c9_semantic_decontamination",
      // paraphrase-level decontamination ([[SimilarityFunctions
      // .semanticDedupPairsAgainst]] + greedy drop): the n-gram
      // decontamination gate (c1/c7) misses an eval item REWORDED into
      // the corpus; embeddings don't. Holdout = base vectors with
      // vec_id%10 (the "benchmark"), corpus = the planted twin corpus
      // — every corpus doc semantically matching a holdout doc (its
      // verbatim copy at cosine 1.0 AND its planted twin at ≈0.93)
      // drops; pairs form cross-side only, within shared clusters.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val corpus = plantedEmbeddings(s, dir)
        val holdout = emb.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("id"),
            col("embedding").cast("array<double>").as("v"))
        val centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").cast("array<double>").as("centroid_vec"))
        val pairs = S.semanticDedupPairsAgainst(holdout, corpus, centroids,
          threshold = 0.9, idCol = "id", vecCol = "v")
        D.dropNearDuplicates(corpus, pairs, "id").select("id").orderBy("id")
      },
      Some("""WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |corpus AS (
             |  SELECT id, v FROM base
             |  UNION ALL
             |  SELECT id + 100000 AS id, list_transform(v, x -> x + 0.05) AS v FROM base),
             |hold AS (SELECT id, v FROM base WHERE id % 10 = 0),
             |c AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 8),
             |ac AS (
             |  SELECT id, v, cid FROM (
             |    SELECT e.id, e.v, c.cid,
             |           row_number() OVER (PARTITION BY e.id
             |             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
             |    FROM corpus e, c) WHERE rn = 1),
             |ah AS (
             |  SELECT id, v, cid FROM (
             |    SELECT h.id, h.v, c.cid,
             |           row_number() OVER (PARTITION BY h.id
             |             ORDER BY list_cosine_similarity(h.v, c.cv) DESC, c.cid) AS rn
             |    FROM hold h, c) WHERE rn = 1),
             |p AS (
             |  SELECT h.id AS id_a, e.id AS id_b
             |  FROM ah h JOIN ac e ON h.cid = e.cid
             |  WHERE round(list_cosine_similarity(h.v, e.v), 6) >= 0.9)
             |SELECT id FROM corpus WHERE id NOT IN (SELECT id_b FROM p)
             |ORDER BY id""".stripMargin)),

    QueryDef("d17_split_leakage",
      // cross-split leakage audit ([[DedupFunctions.crossSplitLeakage]]):
      // near-dup pairs straddling train/valid/test make eval scores
      // lie. The query plants republished near-copies under shifted ids
      // (c5's batch pattern — a few appended words keep jaccard >= 0.8
      // for substantial docs), hash-splits 80/10/10 (d5's md5 form),
      // and reports every straddling pair with both labels. Oracle =
      // the d3 pair CTEs over the planted corpus + the d5 split CTE +
      // the straddle join.
      (s, dir) => {
        val d = docs(s, dir)
        val planted = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 9 === 0)
            .select((col("doc_id") + 100000).as("doc_id"),
              concat(col("text"), lit(" extracted republished copy")).as("text")))
        val pairs = D.jaccardPairs(planted, "doc_id", "text",
          n = 3, threshold = 0.8, maxDf = 2000L)
        val splits = planted.select(col("doc_id"),
          Sam.splitColumn(col("doc_id").cast("string"), pctTrain = 80,
            pctValid = 10, hash = D.md5Hash60).as("split"))
        D.crossSplitLeakage(pairs, splits, "doc_id")
          .orderBy("id_a", "id_b")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, text || ' extracted republished copy'
             |  FROM documents WHERE doc_id % 9 = 0),
             |toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM planted),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |e AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sgl FROM sh),
             |p AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
             |         count(*) AS shared
             |  FROM e a JOIN e b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2, 3, 4),
             |pairs AS (
             |  SELECT id_a, id_b,
             |         round(CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE), 6) AS jaccard
             |  FROM p
             |  WHERE CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) >= 0.8),
             |sp AS (
             |  SELECT doc_id,
             |    CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
             |         WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'valid'
             |         ELSE 'test' END AS split
             |  FROM planted)
             |SELECT pr.id_a, pr.id_b, pr.jaccard, sa.split AS split_a, sb.split AS split_b
             |FROM pairs pr
             |JOIN sp sa ON sa.doc_id = pr.id_a
             |JOIN sp sb ON sb.doc_id = pr.id_b
             |WHERE sa.split <> sb.split
             |ORDER BY pr.id_a, pr.id_b""".stripMargin)),

    QueryDef("d16_weighted_sample",
      // weighted sampling without replacement ([[SamplingFunctions
      // .weightedSamplePerGroup]], Efraimidis-Spirakis keys u^(1/w)):
      // each source keeps the 20 docs with the largest keys, weighted
      // by length (n_chars) — "prefer substantial documents" as a pure
      // deterministic draw. md5 hash form → DuckDB recomputes the
      // identical sample (the d5 portability contract).
      (s, dir) => Sam.weightedSamplePerGroup(
          docs(s, dir).withColumn("_k", col("doc_id").cast("string")),
          groupCol = "source", keyCol = "_k", weightCol = "n_chars",
          k = 20, hash = D.md5Hash60)
        .select(col("doc_id"), col("source"))
        .orderBy("source", "doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id, source,
             |    (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |       % 1000000 + 0.5) / 1000000.0 AS u,
             |    n_chars
             |  FROM documents
             |  WHERE n_chars IS NOT NULL AND n_chars > 0),
             |ek AS (
             |  SELECT doc_id, source, pow(u, 1.0 / n_chars) AS ekey FROM b),
             |r AS (
             |  SELECT doc_id, source,
             |         row_number() OVER (PARTITION BY source
             |           ORDER BY ekey DESC, CAST(doc_id AS VARCHAR)) AS rn
             |  FROM ek)
             |SELECT doc_id, source FROM r WHERE rn <= 20
             |ORDER BY source, doc_id""".stripMargin)),

    QueryDef("d10_quality_cap",
      // top-k-by-QUALITY per source — capPerGroup's struct-order path:
      // orderCol = struct(-quality, doc_id) maps "best first, id
      // tiebreak" onto the k-smallest cut, exercising the bounded-heap
      // aggregate's generic struct ordering end-to-end. Orderable
      // because quality doubles are bit-identical across engines (t2
      // hash-matches them UNROUNDED); rounding here is output-only.
      (s, dir) => {
        val d = docs(s, dir)
          .select(col("doc_id"), col("source"),
            T.qualityScore(col("text")).as("q"))
          .withColumn("_ord", struct((-col("q")).as("nq"), col("doc_id")))
        Sam.capPerGroup(d, "source", "_ord", k = 10)
          .select(col("doc_id"), col("source"), round(col("q"), 6).as("q"))
          .orderBy("doc_id")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, source,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             |    CASE WHEN length(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
             |         END AS punct_ratio,
             |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE)
             |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio
             |  FROM documents),
             |qq AS (SELECT doc_id, source,
             |  (least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
             |   + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
             |   + least(stopword_ratio * 5.0, 1.0) * 0.3) * 100.0 AS q
             |FROM b)
             |SELECT doc_id, source, round(q, 6) AS q FROM qq
             |QUALIFY row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) <= 10
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("d4_embed_dedup",
      // embedding-cosine near-duplicate DEDUP: the s2 pipeline's verified
      // pairs drive the greedy smallest-id-canonical drop — every planted
      // near-duplicate the LSH recovers disappears, originals survive.
      // Shares the generated-plane oracle CTEs with s2.
      (s, dir) => {
        val corpus = plantedEmbeddings(s, dir)
        val pairs = S.lshNeighborPairs(corpus, dim = 64, nBits = 16,
          bands = 4, minCosine = 0.8, idCol = "id", vecCol = "v")
        D.dropNearDuplicates(corpus, pairs, "id").select("id").orderBy("id")
      },
      Some(d4OracleSql)),

    QueryDef("d7_dedup_clusters",
      // transitive near-dup CLUSTERS: connected components (distributed
      // star contraction / union-find) over the verified LSH pairs — A~B, B~C
      // chains collapse into one cluster even when (A,C) was never a
      // candidate. Oracle replays the closure with a recursive CTE.
      (s, dir) => {
        val corpus = plantedEmbeddings(s, dir)
        val pairs = S.lshNeighborPairs(corpus, dim = 64, nBits = 16,
          bands = 4, minCosine = 0.8, idCol = "id", vecCol = "v")
        D.connectedComponents(pairs)
          .groupBy(col("component").as("cluster_id"))
          .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
          .orderBy("cluster_id")
      },
      Some(d7OracleSql)),

    // ───────── event windows ─────────

    QueryDef("e1_event_hourly",
      (s, dir) => events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |  count(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("e3_sliding_counts",
      // sliding 1-hour window advancing every 15 minutes, run in batch
      // mode: every event lands in exactly 4 windows whose starts are the
      // 15-min grid points in (ts - 1h, ts] — the oracle materializes
      // those 4 starts per event and re-aggregates.
      (s, dir) => graft.streaming.EventStreams.slidingCounts(events(s, dir))
        .orderBy("window_start", "event_type"),
      Some("""WITH off AS (SELECT UNNEST([0, 1, 2, 3]) AS k),
             |w AS (
             |  SELECT time_bucket(INTERVAL 15 MINUTE, ts)
             |           - k * INTERVAL 15 MINUTE AS window_start,
             |         event_type
             |  FROM events, off)
             |SELECT window_start, event_type, count(*) AS n_events
             |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("e4_stream_dedup",
      // watermark-bounded streaming dedup run in batch mode: the events
      // table has unique event_ids, so the query PLANTS duplicates by
      // unioning the stream with itself; the dedup must return exactly
      // the original rows (identical duplicates -> deterministic
      // survivor). The streaming counterpart of the warehouse anti-join.
      (s, dir) => {
        val ev = events(s, dir).select("event_id", "ts", "event_type", "value")
        graft.streaming.EventStreams.dedupedEvents(ev.unionAll(ev))
          .orderBy("event_id")
      },
      Some("""SELECT DISTINCT event_id, ts, event_type, value
             |FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
             |ORDER BY event_id""".stripMargin)),

    QueryDef("e2_user_sessions",
      // session_window sessionization (the streaming stateful op) run in
      // batch mode, oracled against a gaps-and-islands SQL: a new session
      // starts iff the gap since the previous event is >= 30 min, session
      // end = last event + gap.
      (s, dir) => graft.streaming.EventStreams.userSessions(events(s, dir))
        .orderBy("user_id", "session_start"),
      Some("""WITH m AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |g AS (
             |  SELECT user_id, ts, value,
             |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |           ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM m)
             |SELECT min(ts) AS session_start,
             |       max(ts) + INTERVAL 30 MINUTE AS session_end,
             |       user_id, count(*) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM g GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    QueryDef("e5_running_totals",
      // flatMapGroupsWithState custom-state checkpoints run in batch
      // mode: per-user lifetime (count, sum) state, a row emitted every
      // 10th event. The update fn pins its fold order to (event_id,
      // value), so the oracle is a windowed running sum over the same
      // total order, filtered to every 10th row per user. The running
      // total is a sequential double fold in both engines; rounded to
      // 6 dp (multi-term floating aggregate rule).
      (s, dir) => graft.streaming.EventStreams
        .userRunningTotals(events(s, dir), emitEvery = 10L)
        .select(col("user_id"), col("n_events"),
          round(col("running_total"), 6).as("running_total"))
        .orderBy("user_id", "n_events"),
      Some("""WITH r AS (
             |  SELECT user_id,
             |    row_number() OVER w AS rn,
             |    SUM(value) OVER (PARTITION BY user_id ORDER BY event_id, value
             |      ROWS UNBOUNDED PRECEDING) AS rt
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id, value))
             |SELECT user_id, rn AS n_events, round(rt, 6) AS running_total
             |FROM r WHERE rn % 10 = 0
             |ORDER BY user_id, n_events""".stripMargin)),

    QueryDef("e6_interval_join",
      // point-in-interval range join via bucket decomposition: clicks
      // matched into each same-user purchase's following hour, then
      // counted per purchase (zero-click purchases kept through a left
      // join against the purchase list). The bucketed equi-join shape —
      // never a per-key cross product — is the 100 TB path; the oracle
      // states the same containment as a plain BETWEEN-style join.
      (s, dir) => {
        val ev = events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"))
        // purchases feeds BOTH the interval join (exploded into cells)
        // and the zero-click left join — pin so the events scan +
        // filter + interval arithmetic run once, not twice; the tracked
        // persist lets a long-lived session reclaim the blocks via
        // graft.Caches.releaseAll() (Bench/Verify clearCache() also works)
        val purchases = graft.Caches.trackedPersist(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("event_id").as("purchase_id"),
              col("ts").as("t0"),
              (col("ts") + expr("INTERVAL 1 HOUR")).as("t1")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val matched = RangeJoinOps.intervalJoin(clicks, purchases,
          Seq("user_id"), "click_ts", "t0", "t1", bucketSeconds = 3600L)
        val counts = matched.groupBy("user_id", "purchase_id")
          .agg(count(lit(1)).as("n_clicks"))
        purchases.select("user_id", "purchase_id")
          .join(counts, Seq("user_id", "purchase_id"), "left")
          .select(col("user_id"), col("purchase_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
          .orderBy("user_id", "purchase_id")
      },
      Some("""WITH p AS (
             |  SELECT user_id, event_id AS purchase_id,
             |         ts AS t0, ts + INTERVAL 1 HOUR AS t1
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
             |SELECT p.user_id, p.purchase_id, count(c.ts) AS n_clicks
             |FROM p LEFT JOIN c
             |  ON c.user_id = p.user_id AND c.ts >= p.t0 AND c.ts < p.t1
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("e8_windowed_topk",
      // per-hour top event types through the space-saving sketch in the
      // EXACT regime (capacity >> distinct types), oracled against a
      // plain count + rank; the sketch-in-streaming parity is pinned by
      // EventStreamsSpec. errors are all 0 by the exact-regime invariant.
      (s, dir) => graft.streaming.EventStreams
        .windowedTopTypes(events(s, dir))
        .orderBy(col("window_start"), desc("n"), col("event_type")),
      Some("""WITH w AS (
             |  SELECT date_trunc('hour', ts) AS window_start, event_type,
             |         count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |r AS (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY window_start ORDER BY n DESC, event_type) AS rk
             |  FROM w)
             |SELECT window_start, event_type, n, CAST(0 AS BIGINT) AS error
             |FROM r WHERE rk <= 5
             |ORDER BY window_start, n DESC, event_type""".stripMargin)),

    QueryDef("e7_stream_attribution",
      // the watermarked stream-stream interval join run in batch mode:
      // row-level (purchase, click) attribution pairs. Same containment
      // semantics as e6's bucketed batch join, but through the streaming
      // operator whose state Spark bounds by watermark + range — batch
      // and stream agree by the unified-contract spec, and the oracle
      // states the containment directly.
      (s, dir) => graft.streaming.EventStreams
        .clickAttribution(events(s, dir))
        .orderBy("user_id", "purchase_id", "click_ts"),
      Some("""SELECT p.user_id, p.event_id AS purchase_id, c.ts AS click_ts
             |FROM events p JOIN events c
             |  ON p.event_type = 'purchase' AND c.event_type = 'click'
             | AND c.user_id = p.user_id
             | AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
             |ORDER BY 1, 2, 3""".stripMargin)),

    QueryDef("e13_outer_attribution",
      // e7's LEFT OUTER twin run in batch mode: every purchase appears,
      // matched clicks attach, no-click purchases carry a null click_ts
      // — the row the streaming operator emits only after the watermark
      // certifies no match can still arrive (spec-pinned in
      // EventStreamsSpec). The oracle is the plain left interval join.
      (s, dir) => graft.streaming.EventStreams
        .attributionOuter(events(s, dir))
        .orderBy("user_id", "purchase_id", "click_ts"),
      Some("""SELECT p.user_id, p.event_id AS purchase_id, c.ts AS click_ts
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON c.user_id = p.user_id
             | AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
             |ORDER BY 1, 2, 3""".stripMargin)),

    QueryDef("e9_funnel",
      // ordered conversion funnel: step i counts users whose first
      // step-i event is strictly after their first qualifying
      // step-(i-1) event. steps.length chained per-user min()
      // aggregations, all hash-partitioned on user_id — no windows.
      (s, dir) => EventAnalyticsOps
        .funnel(events(s, dir), Seq("view", "click", "purchase"))
        .orderBy("step_idx"),
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |s2 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id
             |  WHERE e.event_type = 'click' AND e.ts > s1.t
             |  GROUP BY e.user_id),
             |s3 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
             |  GROUP BY e.user_id),
             |c AS (
             |  SELECT 1 AS step_idx, 'view' AS step, count(*) AS users FROM s1
             |  UNION ALL SELECT 2, 'click', count(*) FROM s2
             |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
             |SELECT step_idx, step, users,
             |       round(CAST(CASE WHEN step_idx = 1 THEN 1.0
             |                       ELSE users / lag(users) OVER (ORDER BY step_idx)
             |                  END AS DOUBLE), 6) AS conv_rate
             |FROM c ORDER BY step_idx""".stripMargin)),

    QueryDef("e10_cohort_retention",
      // weekly cohort retention matrix: cohort = Monday-truncated week
      // of the user's first event; cell (cohort, offset) = distinct
      // users of that cohort active offset weeks later. Two hash aggs,
      // user-cardinality intermediate, weeks²-sized output.
      (s, dir) => EventAnalyticsOps.cohortRetention(events(s, dir))
        .orderBy("cohort_week", "week_offset"),
      Some("""WITH f AS (
             |  SELECT user_id,
             |         CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
             |  FROM events GROUP BY user_id),
             |sz AS (SELECT cohort_week, count(*) AS cohort_size
             |       FROM f GROUP BY cohort_week),
             |act AS (
             |  SELECT DISTINCT f.cohort_week,
             |    CAST(date_diff('day', f.cohort_week,
             |           CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INTEGER)
             |      AS week_offset,
             |    e.user_id
             |  FROM events e JOIN f ON e.user_id = f.user_id),
             |a AS (SELECT cohort_week, week_offset, count(*) AS active_users
             |      FROM act GROUP BY 1, 2)
             |SELECT a.cohort_week, a.week_offset, a.active_users,
             |       round(CAST(a.active_users AS DOUBLE) / sz.cohort_size, 6)
             |         AS retention_rate
             |FROM a JOIN sz USING (cohort_week)
             |ORDER BY cohort_week, week_offset""".stripMargin)),

    QueryDef("skew1_key_profile",
      // the diagnose-before-defending companion to SkewOps' salted
      // joins: per-key count distribution reduced to ONE row in two
      // chained aggregations (map-side partials; max_by for the hot
      // key — no sort anywhere).
      (s, dir) => SkewOps.keySkewProfile(t(s, dir, "lineitem"), "l_suppkey"),
      Some("""WITH c AS (SELECT l_suppkey AS k, count(*) AS cnt
             |          FROM lineitem GROUP BY 1)
             |SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             |       count(*) AS n_keys,
             |       max(cnt) AS max_cnt,
             |       round(avg(cnt), 6) AS avg_cnt,
             |       round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
             |       round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
             |       (SELECT CAST(k AS VARCHAR) FROM c
             |        ORDER BY cnt DESC, CAST(k AS VARCHAR) DESC LIMIT 1) AS top_key,
             |       round(CAST(max(cnt) AS DOUBLE) / sum(cnt) * 100, 6)
             |         AS top_share_pct
             |FROM c""".stripMargin)),

    QueryDef("skew2_top_keys",
      // heaviest keys with row share: TakeOrdered over the key-count
      // frame + a broadcast single-row total — never a global sort.
      (s, dir) => SkewOps.topKeys(events(s, dir), "user_id", k = 5)
        .orderBy(desc("cnt"), asc("key")),
      Some("""WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
             |                 count(*) AS cnt
             |          FROM events GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM events)
             |SELECT key, cnt,
             |       round(CAST(cnt AS DOUBLE) / tot * 100, 6) AS share_pct
             |FROM c, t ORDER BY cnt DESC, key LIMIT 5""".stripMargin)),

    QueryDef("e11_funnel_steps",
      // the stateful (flatMapGroupsWithState) funnel run in batch mode:
      // row-level (user, step, time) advances under the same
      // strictly-after semantics as e9 — the oracle states each step's
      // qualifying first event directly, so the state machine is
      // verified row-by-row, not just in aggregate.
      (s, dir) => graft.streaming.EventStreams
        .funnelSteps(events(s, dir), Seq("view", "click", "purchase"))
        .orderBy("user_id", "step_idx"),
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |s2 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id
             |  WHERE e.event_type = 'click' AND e.ts > s1.t
             |  GROUP BY e.user_id),
             |s3 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
             |  GROUP BY e.user_id)
             |SELECT user_id, 1 AS step_idx, 'view' AS step, t AS step_ts FROM s1
             |UNION ALL SELECT user_id, 2, 'click', t FROM s2
             |UNION ALL SELECT user_id, 3, 'purchase', t FROM s3
             |ORDER BY user_id, step_idx""".stripMargin)),

    QueryDef("bpe1_train_merges",
      // distributed BPE tokenizer training: 8 merge rounds, each one
      // corpus scan into a map-side-partial pair-count aggregate and a
      // TakeOrdered(1) argmax. The oracle re-derives every merge itself
      // (chained replace CTEs over the delimited-string rendering), so
      // rank, pair AND count are all cross-checked.
      (s, dir) => graft.functions.BpeFunctions
        .train(docs(s, dir), "text", numMerges = 8)
        .orderBy("rank"),
      Some(bpeOracle(8,
        "SELECT * FROM (\n" +
          (1 to 8).map(i => s"""SELECT $i AS "rank", lt, rt, freq FROM b$i""")
            .mkString("\nUNION ALL\n") +
          "\n) ORDER BY \"rank\""))),

    QueryDef("bpe2_encode",
      // the learned tokenizer applied corpus-wide: token counts plus an
      // md5 fingerprint of the full delimited encoding per document —
      // a value-level check that every token boundary agrees with the
      // oracle's replay. Encode is the scan-local native BpeEncode
      // expression (merge loop in compiled Scala, projection stays in
      // whole-stage codegen).
      (s, dir) => {
        val d = docs(s, dir)
        val merges = graft.functions.BpeFunctions
          .train(d, "text", numMerges = 8)
          .orderBy("rank").collect() // 8 rows — bounded by construction
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.functions.BpeFunctions.encode(d, "doc_id", "text", merges)
          .select(col("doc_id"), size(col("tokens")).as("n_tokens"),
            md5(graft.functions.BpeFunctions.encodedString(col("tokens")))
              .as("enc_md5"))
          .orderBy("doc_id")
      },
      Some(bpeOracle(8,
        s"""SELECT doc_id,
           |       CAST(CASE WHEN enc = '' THEN 0
           |                 ELSE len(string_split(trim(enc, '${graft.functions.BpeFunctions.Sep}'),
           |                          '${graft.functions.BpeFunctions.Sep}${graft.functions.BpeFunctions.Sep}'))
           |            END AS INTEGER) AS n_tokens,
           |       md5(enc) AS enc_md5
           |FROM enc8 ORDER BY doc_id""".stripMargin))),

    QueryDef("mix1_token_accounting",
      // training-mixture accounting: docs and LEARNED-tokenizer token
      // totals per (source, lang), with each cell's share of the global
      // token budget — the report a mixture-weighting pass consumes.
      // The per-group frame is aggregated once and pinned; the global
      // total is a broadcast single-row cross join, never a window.
      (s, dir) => {
        val d = docs(s, dir)
        val merges = graft.functions.BpeFunctions
          .train(d, "text", numMerges = 8)
          .orderBy("rank").collect() // 8 rows — bounded by construction
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val enc = graft.functions.BpeFunctions
          .encode(d, "doc_id", "text", merges)
          .select(col("doc_id"), size(col("tokens")).as("n_tokens"))
        val perCell = graft.Caches.trackedPersist(
          enc.join(d.select("doc_id", "source", "lang"), "doc_id")
            .groupBy("source", "lang")
            .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = perCell.agg(sum("tokens").as("_tot"))
        perCell.crossJoin(broadcast(tot))
          .select(col("source"), col("lang"), col("docs"), col("tokens"),
            round(col("tokens").cast("double") / col("_tot") * 100, 6)
              .as("token_share_pct"))
          .orderBy("source", "lang")
      },
      // the final segment rides the generated WITH-list: it starts with
      // ", tok AS (" so the extra CTEs chain onto the bpe blocks
      Some(bpeOracle(8,
        s""", tok AS (
           |  SELECT doc_id,
           |       CAST(CASE WHEN enc = '' THEN 0
           |                 ELSE len(string_split(trim(enc, '${graft.functions.BpeFunctions.Sep}'),
           |                          '${graft.functions.BpeFunctions.Sep}${graft.functions.BpeFunctions.Sep}'))
           |            END AS INTEGER) AS n FROM enc8),
           |g AS (
           |  SELECT d.source, d.lang, count(*) AS docs,
           |         CAST(sum(n) AS BIGINT) AS tokens
           |  FROM tok JOIN documents d USING (doc_id) GROUP BY 1, 2),
           |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot FROM g)
           |SELECT source, lang, docs, tokens,
           |       round(CAST(tokens AS DOUBLE) / tot * 100, 6) AS token_share_pct
           |FROM g, t ORDER BY source, lang""".stripMargin))),

    QueryDef("e12_stickiness",
      // DAU / trailing-7-day WAU per day: the day grid broadcasts into
      // a range join against the pinned (day, user) distinct frame —
      // no per-row count-distinct window.
      (s, dir) => EventAnalyticsOps.stickiness(events(s, dir))
        .orderBy("day"),
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
             |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
             |days AS (SELECT DISTINCT day AS d FROM du),
             |wau AS (
             |  SELECT d AS day, count(DISTINCT user_id) AS wau
             |  FROM days JOIN du
             |    ON du.day BETWEEN d - INTERVAL 6 DAY AND d
             |  GROUP BY d)
             |SELECT day, dau, wau,
             |       round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
             |FROM dau JOIN wau USING (day)
             |ORDER BY day""".stripMargin)),

    QueryDef("g1_pagerank",
      // PageRank over the co-purchase part graph: 5 synchronous rounds,
      // per round ONE edges⋈ranks equi-join + one map-side-partial sum
      // by dst (Pregel-shaped, like the connected-components rounds).
      // The oracle unrolls the identical recurrence in DuckDB, so every
      // node's rank after every round is value-checked.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        GraphOps.pageRank(pairs, "src", "dst", iterations = 5)
      },
      Some(pageRankOracle(5))),

    QueryDef("g2_label_propagation",
      // synchronous LPA communities over the (symmetrized) co-purchase
      // graph: per round one edges⋈labels join, one (node, label)
      // count, one min_by argmax — all-integer, so the unrolled oracle
      // replays exactly with no rounding contract.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        GraphOps.labelPropagation(pairs, "src", "dst", iterations = 4)
      },
      Some(lpaOracle(4))),

    QueryDef("g3_triangles",
      // per-node triangle counts + local clustering coefficient over the
      // first-two-years co-purchase graph (the shipdate cut bounds the
      // edge set; the operator itself is unbounded). Spark enumerates
      // degree-ORDERED (each triangle found once at its lowest-rank
      // vertex, wedge work O(m^1.5)); the oracle enumerates the naive
      // a<b<c form — orientation-invariant counts, so they must agree.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        GraphOps.triangleCounts(pairs, "src", "dst")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
             |            WHERE l_shipdate < TIMESTAMP '1997-01-01'),
             |e AS MATERIALIZED (
             |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |  FROM li a JOIN li b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |tri AS MATERIALIZED (
             |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
             |  FROM e e1 JOIN e e2 ON e2.u = e1.v
             |            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
             |pern AS (SELECT node, count(*) AS triangles FROM (
             |  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
             |  UNION ALL SELECT c FROM tri) GROUP BY 1),
             |deg AS (SELECT node, count(*) AS deg FROM (
             |  SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) GROUP BY 1)
             |SELECT d.node, d.deg, COALESCE(p.triangles, 0) AS triangles,
             |  CASE WHEN d.deg >= 2
             |       THEN round(2.0 * COALESCE(p.triangles, 0) / (d.deg * (d.deg - 1.0)), 6)
             |       ELSE 0.0 END AS clustering
             |FROM deg d LEFT JOIN pern p USING (node) ORDER BY node""".stripMargin)),

    QueryDef("g5_kcore",
      // 6-core of the first-two-years co-purchase graph: 6 synchronous
      // peel rounds (the graph's measured peel depth at this scale is
      // 5, so round 6 is the convergence witness — the state IS the
      // true 6-core here). All-integer: the unrolled oracle replays
      // every round exactly.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        GraphOps.kCore(pairs, "src", "dst", k = 6, rounds = 6)
      },
      Some(kCoreOracle(6, 6))),

    QueryDef("g4_hits",
      // HITS over the directed supplier→part supply graph (suppliers
      // offset into a shared id space): hub score ranks suppliers by
      // how much they stock authoritative parts, authority ranks parts
      // by how many strong suppliers stock them — the mutual-recursion
      // pair PageRank's single score can't express. 4 synchronous
      // rounds, every node's 6dp hub AND authority value-checked by
      // the unrolled oracle.
      (s, dir) => {
        val e = t(s, dir, "lineitem")
          .select((col("l_suppkey") + 1000000L).as("src"),
            col("l_partkey").as("dst"))
        GraphOps.hits(e, "src", "dst", iterations = 4)
      },
      Some(hitsOracle(4))),

    QueryDef("eval2_auc",
      // threshold-free classifier evaluation: ROC-AUC of the cls1 NB
      // scores against the gold is-English labels, via the rank
      // statistic AUC = (Σ ranks⁺ − P(P+1)/2) / (P·N) with AVERAGE
      // ranks on ties (the Mann-Whitney U normalization — exact, not
      // trapezoid-approximated). Ranks derive from the per-score-LEVEL
      // histogram: the average tie rank of a level with m rows and B
      // rows below it is B + (m+1)/2 exactly (what avg(row_number)
      // over the tie partition computes, tie-order invariant), so the
      // rank sum collapses to pos·(B+(m+1)/2) per level — every term
      // an exact multiple of 0.5 below 2^53, order-independent in
      // double. The only window left is over distinct 6dp score
      // levels (≤ 10⁶+1 regardless of corpus size — bounded; the r11
      // verdict's eval2 scale-tier item). AUC is a rational with
      // denominator 2PN ≪ 2·10⁶ — the 6dp round is boundary-free.
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        val lv = scored.join(lab, "doc_id")
          .groupBy("score")
          .agg(count(lit(1)).as("_lm"), sum(col("_y")).as("_pos"))
        val wL = Window.orderBy("score")
          .rowsBetween(Window.unboundedPreceding, 0)
        lv.withColumn("_cum", sum(col("_lm")).over(wL))
          .select(col("_lm"), col("_pos"),
            ((col("_cum") - col("_lm")).cast("double") +
              (col("_lm") + 1).cast("double") / 2.0).as("_r"))
          .agg(sum(col("_pos")).as("_p"),
            sum(col("_lm") - col("_pos")).as("_n"),
            sum(col("_pos").cast("double") * col("_r")).as("_s"))
          .select(col("_p").as("n_pos"), col("_n").as("n_neg"),
            round((col("_s") - (col("_p") * (col("_p") + 1)).cast("double") / 2.0) /
              (col("_p") * col("_n")).cast("double"), 6).as("auc"))
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    (d.lang = 'en') AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |rk AS (
          |  SELECT score, y, row_number() OVER (ORDER BY score) AS rn
          |  FROM scored),
          |ar AS (SELECT y, avg(rn) OVER (PARTITION BY score) AS r FROM rk),
          |agg AS (
          |  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS p,
          |         sum(CASE WHEN y THEN 0 ELSE 1 END) AS n,
          |         sum(CASE WHEN y THEN r END) AS s
          |  FROM ar)
          |SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
          |  round((s - CAST(p * (p + 1) AS DOUBLE) / 2.0)
          |        / CAST(p * n AS DOUBLE), 6) AS auc
          |FROM agg""".stripMargin)),

    QueryDef("eval3_calibration",
      // reliability diagram: cls1's scores bucketed into score deciles,
      // each reporting n, mean predicted probability, and observed
      // positive rate — "when the model says 0.8, is it right 80% of
      // the time?" (the eval the threshold-free AUC can't answer). One
      // hash agg on 10 buckets; frac_pos is a small-denominator
      // rational (boundary-free round), mean_score's float-sum ulps
      // sit far under 6dp (the a4 convention).
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        scored.join(lab, "doc_id")
          .groupBy(least(floor(col("score") * 10), lit(9)).cast("int").as("bucket"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("score")), 6).as("mean_score"),
            round(sum(col("_y")).cast("double") / count(lit(1)), 6).as("frac_pos"))
          .orderBy("bucket")
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id))
          |SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bucket,
          |  count(*) AS n,
          |  round(avg(score), 6) AS mean_score,
          |  round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_pos
          |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("eval1_langid_confusion",
      // classifier evaluation as a first-class op: the n-gram langid
      // heuristic scored against the gold labels — full confusion
      // matrix with per-gold recall. The matrix is langs²-sized and
      // pinned; per-gold totals derive from the matrix itself (no
      // second corpus pass) and broadcast into the recall join.
      (s, dir) => {
        val cells = graft.Caches.trackedPersist(
          docs(s, dir)
            .select(col("lang").as("gold"),
              T.languageId(col("text")).as("pred"))
            .groupBy("gold", "pred").agg(count(lit(1)).as("n")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val totals = cells.groupBy("gold").agg(sum("n").as("tot"))
        cells.join(broadcast(totals), "gold")
          .select(col("gold"), col("pred"), col("n"),
            round(col("n").cast("double") / col("tot"), 6).as("recall"))
          .orderBy("gold", "pred")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |h AS (SELECT doc_id,
             |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |  len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |  len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |FROM t),
             |p AS (SELECT doc_id,
             |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |       WHEN h_es >= h_fr THEN 'es'
             |       ELSE 'fr' END AS pred
             |FROM h),
             |c AS (SELECT d.lang AS gold, p.pred, count(*) AS n
             |      FROM p JOIN documents d USING (doc_id) GROUP BY 1, 2),
             |tt AS (SELECT gold, CAST(sum(n) AS BIGINT) AS tot
             |       FROM c GROUP BY 1)
             |SELECT c.gold, c.pred, c.n,
             |       round(CAST(c.n AS DOUBLE) / tt.tot, 6) AS recall
             |FROM c JOIN tt USING (gold) ORDER BY gold, pred""".stripMargin)),

    QueryDef("card1_corpus_card",
      // the one-row corpus "data card": volumes, language/source
      // diversity, token/char means, exact-dup rate (1 − distinct
      // normalized fingerprints ÷ docs), English share — ONE fused
      // aggregation pass over the corpus (the distincts expand
      // map-side; nothing user- or doc-sized leaves the executors).
      (s, dir) => docs(s, dir)
        .select(col("lang"), col("source"), col("n_chars"),
          T.tokenCount(col("text")).as("toks"),
          T.fingerprint(col("text")).as("fp"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          sum("toks").as("total_tokens"),
          round(avg("toks"), 6).as("avg_tokens"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          round(lit(1.0) - countDistinct(col("fp")).cast("double") / count(lit(1)), 6)
            .as("dup_rate"),
          round(sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("double")
            / count(lit(1)) * 100, 6).as("pct_english")),
      Some("""WITH d AS (
             |  SELECT lang, source, n_chars,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks,
             |    md5(regexp_replace(regexp_replace(lower(text),
             |        '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS fp
             |  FROM documents)
             |SELECT count(*) AS n_docs,
             |       count(DISTINCT lang) AS n_langs,
             |       count(DISTINCT source) AS n_sources,
             |       CAST(sum(toks) AS BIGINT) AS total_tokens,
             |       round(avg(toks), 6) AS avg_tokens,
             |       round(avg(n_chars), 6) AS avg_chars,
             |       round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6)
             |         AS dup_rate,
             |       round(CAST(COALESCE(SUM(CASE WHEN lang = 'en' THEN 1 END), 0)
             |               AS DOUBLE) / count(*) * 100, 6) AS pct_english
             |FROM d""".stripMargin)),

    QueryDef("sd1_semantic_decontaminate",
      // embedding-level holdout decontamination: the eval slice
      // (vec_id % 25 == 0) aggregates to ONE broadcast array row; the
      // corpus scan computes its max holdout cosine as a scan-local
      // fold over the codegen'd VecCosine kernel — no shuffle, corpus
      // read exactly once.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val hold = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
          .select(col("embedding"))
        S.semanticDecontaminate(
            emb.filter(pmod(col("vec_id"), lit(25)) =!= 0), hold, tau = 0.35)
          .select(col("vec_id"), col("max_holdout_cos"), col("contaminated"))
          .orderBy("vec_id")
      },
      Some("""WITH h AS (
             |  SELECT CAST(embedding AS DOUBLE[]) AS hv
             |  FROM embeddings WHERE vec_id % 25 = 0),
             |c AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id % 25 <> 0),
             |m AS (
             |  SELECT c.vec_id,
             |         max(round(list_cosine_similarity(c.v, h.hv), 6))
             |           AS max_holdout_cos
             |  FROM c, h GROUP BY c.vec_id)
             |SELECT vec_id, max_holdout_cos,
             |       max_holdout_cos >= 0.35 AS contaminated
             |FROM m ORDER BY vec_id""".stripMargin)),

    QueryDef("r2_unigram_lm",
      // CCNet-style LM quality filter, honest sandbox version: mean
      // ln P(token) under the corpus's own unigram model. Vocabulary
      // aggregates once and broadcasts; the per-doc mean is the only
      // data-sized shuffle.
      (s, dir) => R.unigramLogProb(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), round(col("log_prob"), 6).as("log_prob"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
             |  FROM documents),
             |tt AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
             |vocab AS (SELECT tok, count(*) AS n FROM tt GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM vocab),
             |sc AS (
             |  SELECT tt.doc_id,
             |         avg(ln(CAST(n AS DOUBLE) / total)) AS lp
             |  FROM tt JOIN vocab USING (tok), tot GROUP BY 1)
             |SELECT d.doc_id, round(coalesce(sc.lp, -20.0), 6) AS log_prob
             |FROM documents d LEFT JOIN sc USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("r3_bigram_lm",
      // one order up from r2: mean ln P(w2|w1) under the corpus's own
      // bigram model — scrambled-word gibberish that fools a unigram
      // model collapses here. Prefix counts make P sum to 1 per prefix.
      (s, dir) => R.bigramLogProb(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), round(col("log_prob"), 6).as("log_prob"))
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
             |  FROM tk, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
             |  WHERE len(w) >= 2),
             |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1),
             |sc AS (
             |  SELECT b.doc_id,
             |         avg(ln(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE))) AS lp
             |  FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
             |  GROUP BY 1)
             |SELECT d.doc_id, round(coalesce(sc.lp, -20.0), 6) AS log_prob
             |FROM documents d LEFT JOIN sc USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("c1_decontamination",
      // train/eval overlap audit: per training doc, distinct word
      // 3-grams shared with the held-out set (doc_id % 50 == 0 stands in
      // for the benchmark suite). The held-out gram set broadcasts, so
      // the corpus side joins map-side with no shuffle of train grams
      // until the per-doc count. n=3 on this synthetic vocab plays the
      // role 13-grams do on real text (standard published setting).
      (s, dir) => {
        val d = docs(s, dir)
        D.contaminationReport(
          d.filter(col("doc_id") % 50 =!= 0),
          d.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 3)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |grams AS (
             |  SELECT doc_id, unnest(
             |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(w) - 2),
             |                i -> array_to_string(w[i:i+2], ' '))) END) AS g
             |  FROM toks),
             |test AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
             |SELECT doc_id, count(*) AS n_shared_grams
             |FROM grams JOIN test USING (g)
             |WHERE doc_id % 50 <> 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("c2_pii_redaction",
      // PII scrub over a corpus with PLANTED emails/phones/IPs (the raw
      // synthetic docs carry none — planting creates the condition under
      // test, the s2 pattern): count matches and redact, as a pure
      // codegen regexp projection. The oracle replays the identical
      // plant + pattern chain in RE2 — the patterns are written in the
      // Java∩RE2 common subset so both engines see the same matches —
      // and compares the redacted text by md5.
      (s, dir) => {
        val planted = docs(s, dir).select(col("doc_id"), concat(
          col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" call 555-867-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(" from 192.168.1.77"))
            .otherwise(lit(""))).as("text"))
        planted.select(col("doc_id"),
          T.piiCount(col("text")).as("n_pii"),
          md5(T.redactPii(col("text"))).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id, text
             |    || CASE WHEN doc_id % 7 = 0
             |            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 5 = 0
             |            THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |            ELSE '' END
             |    || CASE WHEN doc_id % 11 = 0 THEN ' from 192.168.1.77' ELSE '' END
             |    AS text
             |  FROM documents),
             |p1 AS (SELECT doc_id, text,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS c1,
             |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g') AS t1,
             |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<PII>', 'g') AS r1
             |  FROM planted),
             |p2 AS (SELECT doc_id, c1,
             |  CAST(len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS c2,
             |  regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', ' ', 'g') AS t2,
             |  regexp_replace(r1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<PII>', 'g') AS r2
             |  FROM p1),
             |p3 AS (SELECT doc_id, c1, c2,
             |  CAST(len(regexp_extract_all(t2, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS c3,
             |  regexp_replace(t2, '\b\d{3}-\d{2}-\d{4}\b', ' ', 'g') AS t3,
             |  regexp_replace(r2, '\b\d{3}-\d{2}-\d{4}\b', '<PII>', 'g') AS r3
             |  FROM p2),
             |p4 AS (SELECT doc_id, c1, c2, c3,
             |  CAST(len(regexp_extract_all(t3, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS c4,
             |  regexp_replace(r3, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PII>', 'g') AS r4
             |  FROM p3)
             |SELECT doc_id, c1 + c2 + c3 + c4 AS n_pii, md5(r4) AS redacted_md5
             |FROM p4 ORDER BY doc_id""".stripMargin)),

    QueryDef("c3_corpus_clean_md5",
      // the COMPOSED corpus pipeline oracle-verified end-to-end: gates
      // (token count, quality, bigram repetition) -> PII scrub -> exact
      // fingerprint dedup -> MinHash-LSH near-dup drop, all through the
      // REAL CorpusPipeline.clean with only the near-dup hash swapped to
      // the engine-shared md5 form (the m1b twin pattern). Every stage's
      // SQL is the already-hash-matched CTE from its standalone query
      // (t7 gates, c2 scrub, d1 dedup, m1b LSH) stitched in clean()'s
      // order; output binds survivors AND their scrubbed bytes by md5.
      (s, dir) => {
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7,
          minhashHash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          minhashBucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))))
        graft.corpus.CorpusPipeline.clean(docs(s, dir), "doc_id", "text", cfg)
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some(c3OracleSql)),

    QueryDef("c3b_corpus_clean_prod",
      // the PRODUCTION twin of c3: identical gates, scrub, exact-dedup
      // and LSH geometry (16 hashes, 4 bands, 0.7), but the default
      // xxhash64 hash family instead of the oracle-replayable md5 form
      // — the number a user actually pays for the composed clean. No
      // oracle by the m1/m1b pattern (DuckDB lacks xxhash64 seeds);
      // candidate sets differ only by banding randomness and every
      // candidate is verified by EXACT Jaccard in both variants, so the
      // survivor sets agree wherever both bandings surface the same
      // true near-dup pairs. Rows-only driver check; c3 carries the
      // full hash-verified replay of the identical pipeline shape.
      (s, dir) => {
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7)
        graft.corpus.CorpusPipeline.clean(docs(s, dir), "doc_id", "text", cfg)
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      None),

    QueryDef("c4_corpus_semantic_md5",
      // c3 PLUS the embedding tier, still through the REAL clean():
      // chunk vectors (10 per doc, with doc 23's chunks overridden by a
      // perturbed copy of doc 7's so one semantic near-dup pair exists)
      // -> mean-pool (6dp) -> hyperplane LSH -> exact-cosine verify ->
      // transitive-cluster drop. The oracle continues c3's CTEs with
      // the s5 pooling, the s2 plane literals, and the d7 recursive
      // closure. quantize=false: int8 rounding is the one step held to
      // a recall bound rather than SQL equality (s4's contract).
      (s, dir) => {
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7,
          minhashHash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          minhashBucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))))
        val base = t(s, dir, "embeddings")
          .select(expr("vec_id div 10").as("doc_id"),
            col("embedding").cast("array<double>").as("embedding"))
        val chunks = base.filter(col("doc_id") =!= 23L)
          .unionAll(base.filter(col("doc_id") === 7L)
            .select(lit(23L).as("doc_id"),
              transform(col("embedding"), x => x + lit(0.002)).as("embedding")))
        // 32-bit signatures (8 bits/band): at sf0.1's 5,000 chunked
        // docs, 16-bit/4-band gives only 16 buckets per band and ~n²/32
        // false candidates; 256 buckets per band keeps the candidate
        // join linear-ish while the planted pair (cosine ~0.9999) still
        // matches a band with probability ~1 - 4e-7
        val sem = graft.corpus.SemanticConfig(dim = 64, nBits = 32,
          bands = 4, minCosine = 0.9, quantize = false)
        graft.corpus.CorpusPipeline.clean(docs(s, dir), "doc_id", "text", cfg,
          chunkEmbeddings = Some(chunks), semantic = Some(sem))
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some(c4OracleSql)),

    QueryDef("c8_line_dedup_clean",
      // the composed clean with stage-0 duplicate-LINE removal armed
      // (CorpusConfig.lineDedupMinChars): every doc carries a shared
      // cookie banner and one doc in ten is re-crawled with the banner
      // on the OTHER side — line dedup strips the boilerplate before
      // quality gating or fingerprinting, so each re-crawl collapses
      // onto its original at the exact tier (the reason real pipelines
      // run paragraph dedup first). Same md5 hash family and geometry
      // as c3; the oracle prefixes the d14 line CTEs onto the c3 chain.
      (s, dir) => {
        val d = docs(s, dir)
        val banner = "SHARED COOKIE BANNER TEXT HERE"
        val planted = d.select(col("doc_id"),
            concat(lit(banner), lit("\n"), col("text")).as("text"))
          .unionByName(d.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 100000).as("doc_id"),
              concat(col("text"), lit("\n"), lit(banner)).as("text")))
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7,
          minhashHash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          minhashBucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))),
          lineDedupMinChars = Some(10))
        graft.corpus.CorpusPipeline.clean(planted, "doc_id", "text", cfg)
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some(c8OracleSql)),

    QueryDef("c7_decontaminated_clean_md5",
      // the composed clean with the decontamination DROP gate armed:
      // docs ≢ 0 (mod 50) clean through the full c3 text chain, then
      // any survivor sharing a word 3-gram with the held-out suite
      // (doc_id % 50 == 0, the c1 convention) drops. The holdout gram
      // set broadcasts; nothing corpus-shaped moves for the gate.
      (s, dir) => {
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7,
          minhashHash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          minhashBucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))),
          decontamNgram = 3)
        val d = docs(s, dir)
        graft.corpus.CorpusPipeline.clean(
            d.filter(col("doc_id") % 50 =!= 0), "doc_id", "text", cfg,
            holdout = Some(d.filter(col("doc_id") % 50 === 0)))
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some(c7OracleSql)),

    QueryDef("c5_incremental_append_md5",
      // the INCREMENTAL ingest composition, oracle-verified end-to-end:
      // a new batch (docs >= 250 plus re-submitted copies of docs < 30
      // under shifted ids — the nightly re-crawl case) is cleaned
      // internally and then dropped against the already-ingested corpus
      // (docs < 250) by exact fingerprint anti-join + the cross-side
      // banded LSH join — the corpus is never re-paired with itself.
      // The md5-hash twin of the production xxhash64 path (m1b pattern).
      (s, dir) => {
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7,
          minhashHash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          minhashBucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))))
        val d = docs(s, dir)
        val existing = d.filter(col("doc_id") < 250)
          .select(col("doc_id"), col("text"))
        val batch = d.filter(col("doc_id") >= 250)
          .select(col("doc_id"), col("text"))
          .unionAll(d.filter(col("doc_id") < 30)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        graft.corpus.CorpusPipeline.appendBatch(
            existing, batch, "doc_id", "text", cfg)
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some(c5OracleSql)),

    QueryDef("c11_containment_append_md5",
      // c5's incremental append with the CONTAINMENT tier armed
      // ([[graft.corpus.CorpusPipeline.appendBatch]] +
      // [[DedupFunctions.containmentPairsAgainst]]): the batch carries
      // verbatim excerpts of existing docs (≈47% of a doc — under the
      // 0.7-Jaccard LSH bar, so only the containment tier can catch
      // them) alongside genuinely fresh docs. The md5 winnow twin of
      // the production xxhash64 path; the oracle replays clean →
      // exact → cross-LSH → stored-winnow containment end to end.
      (s, dir) => {
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7,
          minhashHash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          minhashBucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))),
          containmentThreshold = Some(0.7),
          winnowHash = c => md5(c.cast("binary")))
        val d = docs(s, dir)
        val existing = d.filter(col("doc_id") < 250)
          .select(col("doc_id"), col("text"))
        val batch = d.filter(col("doc_id") >= 250)
          .select(col("doc_id"), col("text"))
          .unionAll(d.filter(col("doc_id") % 25 === 0 && col("doc_id") < 250)
            .select((col("doc_id") + 100000).as("doc_id"),
              substring(col("text"), 40, 140).as("text")))
        graft.corpus.CorpusPipeline.appendBatch(
            existing, batch, "doc_id", "text", cfg)
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some(c11OracleSql)),

    QueryDef("c5c_append_bloom",
      // c5's append through the BLOOM-GATED exact tier: the corpus
      // fingerprint sketch proves most batch rows absent before the
      // anti-join, so only bloom hits touch the stored fingerprint
      // table. The gate is result-transparent by construction (misses
      // are proofs of absence; hits still verify against the real
      // index), so the full c5 oracle applies UNCHANGED — the
      // hash-match is the proof the gate never drops or admits a row
      // the anti-join wouldn't.
      (s, dir) => {
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7,
          minhashHash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          minhashBucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))))
        val d = docs(s, dir)
        val existing = d.filter(col("doc_id") < 250)
          .select(col("doc_id"), col("text"))
        val batch = d.filter(col("doc_id") >= 250)
          .select(col("doc_id"), col("text"))
          .unionAll(d.filter(col("doc_id") < 30)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        val idx = graft.corpus.CorpusPipeline.buildTextIndex(
          existing, "doc_id", "text", cfg)
        val bloom = D.fingerprintBloom(idx.fingerprints, "fp",
          expectedItems = 100000L)
        graft.corpus.CorpusPipeline.appendBatchIndexed(
            idx, batch, "doc_id", "text", cfg, fpBloom = Some(bloom))
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some(c5OracleSql)),

    QueryDef("c5b_append_prod",
      // the PRODUCTION twin of c5 (the c3b pattern): identical batch/
      // corpus split and LSH geometry, default xxhash64 hashes — the
      // incremental append cost a nightly job actually pays. Rows-only
      // driver check; exact-Jaccard verification makes the survivor set
      // agree with c5 wherever both bandings surface the true pairs.
      (s, dir) => {
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7)
        val d = docs(s, dir)
        val existing = d.filter(col("doc_id") < 250)
          .select(col("doc_id"), col("text"))
        val batch = d.filter(col("doc_id") >= 250)
          .select(col("doc_id"), col("text"))
          .unionAll(d.filter(col("doc_id") < 30)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        graft.corpus.CorpusPipeline.appendBatch(
            existing, batch, "doc_id", "text", cfg)
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      None),

    QueryDef("c6_semantic_append_md5",
      // c5's incremental append with BOTH semantic arms armed, oracle-
      // verified end-to-end: the batch cleans internally through text
      // AND embedding tiers, then drops against the corpus by exact
      // fingerprint, cross-side text LSH, and cross-side embedding LSH
      // — the stored-SemanticIndex shape (appendBatch derives the same
      // index buildSemanticIndex materializes). A planted doc (900260:
      // gate-proof fresh text, chunk vectors = existing doc 7's shifted
      // by 0.002) survives every text stage and MUST drop at the
      // vs-corpus embedding arm — proving that arm fires, not just
      // compiles. md5 hash twin + quantize=false, c4's oracle contract.
      (s, dir) => {
        import s.implicits._
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7,
          minhashHash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          minhashBucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))))
        val sem = graft.corpus.SemanticConfig(dim = 64, nBits = 32,
          bands = 4, minCosine = 0.9, quantize = false)
        val d = docs(s, dir)
        val existing = d.filter(col("doc_id") < 250)
          .select(col("doc_id"), col("text"))
        val batch = d.filter(col("doc_id") >= 250)
          .select(col("doc_id"), col("text"))
          .unionAll(d.filter(col("doc_id") < 30)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
          .unionAll(Seq((900260L, c6PlantText)).toDF("doc_id", "text"))
        val base = t(s, dir, "embeddings")
          .select(expr("vec_id div 10").as("doc_id"),
            col("embedding").cast("array<double>").as("embedding"))
        val exCh = base.filter(col("doc_id") < 250)
        val bCh = base.filter(col("doc_id") >= 250)
          .unionAll(base.filter(col("doc_id") === 7L)
            .select(lit(900260L).as("doc_id"),
              transform(col("embedding"), x => x + lit(0.002)).as("embedding")))
        graft.corpus.CorpusPipeline.appendBatch(
            existing, batch, "doc_id", "text", cfg,
            existingChunks = Some(exCh), batchChunks = Some(bCh),
            semantic = Some(sem))
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some(c6OracleSql)),

    QueryDef("mm1_media_dedup",
      // multimodal exact dedup with a REAL oracle: the media column is a
      // synthetic deterministic binary — the UTF-8 bytes of text#lang,
      // which DuckDB's encode() rebuilds identically — duplicated for
      // doc_id < 40 under shifted asset ids (the re-crawled-asset case).
      // dedupByFingerprint keys on xxhash64(media), which DuckDB lacks,
      // but the SURVIVOR SET depends only on byte-equality groups (min
      // id per group), so the hash function cancels out of the answer
      // and the oracle replays it with a min-per-payload window. Output
      // compares byte length and md5 of the surviving binaries.
      (s, dir) => {
        val d = docs(s, dir)
        def assets(f: DataFrame, shift: Long) = f.select(
          (col("doc_id") + shift).as("asset_id"),
          concat(col("text"), lit("#"), col("lang")).cast("binary").as("media"))
        val all = assets(d, 0L)
          .unionAll(assets(d.filter(col("doc_id") < 40), 100000L))
        graft.multimodal.Multimodal.dedupByFingerprint(all, "asset_id", "media")
          .select(col("asset_id"),
            length(col("media")).cast("long").as("n_bytes"),
            md5(col("media")).as("media_md5"))
          .orderBy("asset_id")
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS asset_id, text || '#' || lang AS payload
             |  FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, text || '#' || lang
             |  FROM documents WHERE doc_id < 40),
             |k AS (
             |  SELECT asset_id, payload,
             |         min(asset_id) OVER (PARTITION BY payload) AS keep
             |  FROM a)
             |SELECT asset_id,
             |       CAST(octet_length(encode(payload)) AS BIGINT) AS n_bytes,
             |       md5(payload) AS media_md5
             |FROM k WHERE asset_id = keep ORDER BY asset_id""".stripMargin)),

    QueryDef("mm2_thumbnails",
      // the thumbnail stage with a REAL oracle ([[Multimodal
      // .withThumbnails]]): synthetic ASCII media (text#lang bytes — the
      // mm1 trick, chars ≡ bytes so DuckDB can index them) with planted
      // dimensions from doc_id. The stub's contract is deterministic
      // arithmetic — long edge to 512, meta scaled via floor(x+0.5)
      // (Scala Math.round), byte payload strided down by the area
      // ratio — so the oracle replays resize math AND the exact
      // surviving bytes (md5 compare). Already-small media pass
      // through byte-identical.
      (s, dir) => {
        import s.implicits._
        val assets = docs(s, dir).select(col("doc_id").as("asset_id"),
            concat(col("text"), lit("#"), col("lang")).cast("binary").as("media"),
            struct(lit("image/png").as("mime"),
              (lit(400) + (col("doc_id") % 5).cast("int") * 200).as("width"),
              (lit(300) + (col("doc_id") % 3).cast("int") * 300).as("height"),
              lit(0L).as("durationMs")).as("meta"))
          .as[graft.multimodal.Multimodal.MediaAsset]
        graft.multimodal.Multimodal.withThumbnails(assets, maxDim = 512)
          .toDF()
          .select(col("asset_id"),
            col("meta.width").as("width"), col("meta.height").as("height"),
            length(col("media")).cast("long").as("n_bytes"),
            md5(col("media")).as("media_md5"))
          .orderBy("asset_id")
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS asset_id, text || '#' || lang AS payload,
             |         CAST(400 + (doc_id % 5) * 200 AS INTEGER) AS w,
             |         CAST(300 + (doc_id % 3) * 300 AS INTEGER) AS h,
             |         length(text || '#' || lang) AS len
             |  FROM documents),
             |s AS (
             |  SELECT asset_id, payload, w, h, len, greatest(w, h) AS lng,
             |         512.0 / greatest(w, h) AS sc
             |  FROM a),
             |small AS (
             |  SELECT asset_id, w AS width, h AS height,
             |         CAST(len AS BIGINT) AS n_bytes, md5(payload) AS media_md5
             |  FROM s WHERE lng <= 512),
             |big AS (
             |  SELECT asset_id, payload, len,
             |    greatest(1, CAST(floor(w * sc + 0.5) AS INTEGER)) AS width,
             |    greatest(1, CAST(floor(h * sc + 0.5) AS INTEGER)) AS height,
             |    greatest(1, CAST(floor(len * (sc * sc) + 0.5) AS BIGINT)) AS keep
             |  FROM s WHERE lng > 512),
             |bs AS (
             |  SELECT asset_id, payload, width, height, len,
             |         greatest(1, len // keep) AS step
             |  FROM big),
             |sub AS (
             |  SELECT asset_id, width, height,
             |         string_agg(substring(payload, p, 1), '' ORDER BY p) AS thumb
             |  FROM (SELECT asset_id, payload, width, height,
             |               unnest(generate_series(1, len, step)) AS p
             |        FROM bs)
             |  GROUP BY 1, 2, 3)
             |SELECT asset_id, CAST(width AS INTEGER) AS width,
             |       CAST(height AS INTEGER) AS height,
             |       CAST(length(thumb) AS BIGINT) AS n_bytes, md5(thumb) AS media_md5
             |FROM sub
             |UNION ALL
             |SELECT asset_id, CAST(width AS INTEGER), CAST(height AS INTEGER),
             |       n_bytes, media_md5 FROM small
             |ORDER BY asset_id""".stripMargin)),

    QueryDef("mm3_frame_sample",
      // frame sampling under oracle ([[Multimodal.sampleFrames]]):
      // planted durations (doc_id%7 × 4s — the %7==0 assets are stills
      // and must contribute NO rows), everyMs=2500. The stub's seek
      // contract is arithmetic — frame i at ts i·2500 ms, byte offset
      // ts·1024 — so the oracle replays the whole explode.
      (s, dir) => {
        import s.implicits._
        val assets = docs(s, dir).select(col("doc_id").as("asset_id"),
            lit("v").cast("binary").as("media"),
            struct(lit("video/mp4").as("mime"), lit(1).as("width"),
              lit(1).as("height"),
              ((col("doc_id") % 7) * 4000L).as("durationMs")).as("meta"))
          .as[graft.multimodal.Multimodal.MediaAsset]
        graft.multimodal.Multimodal.sampleFrames(assets, everyMs = 2500L)
          .orderBy("asset_id", "frame_idx")
      },
      Some("""WITH a AS (
             |  SELECT doc_id AS asset_id, (doc_id % 7) * 4000 AS dur
             |  FROM documents)
             |SELECT asset_id, CAST(i AS INTEGER) AS frame_idx,
             |       i * 2500 AS ts_ms, i * 2500 * 1024 AS byte_offset
             |FROM (SELECT asset_id,
             |        unnest(generate_series(0, CAST(ceil(dur / 2500.0) AS BIGINT) - 1)) AS i
             |      FROM a WHERE dur > 0)
             |ORDER BY asset_id, frame_idx""".stripMargin)),

    QueryDef("pack1_sequence_packing",
      // deterministic sequence packing: documents into 512-token training
      // packs across 8 shards; the full per-doc assignment is the result
      // (all-integer math — any engine replays it bit-identically).
      (s, dir) => Sam.packSequences(
        docs(s, dir).select(col("doc_id"), T.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budgetTokens = 512L, shards = 8)
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id % 8 AS shard,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, shard, tok,
             |    CAST(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      - tok AS prefix_tokens
             |  FROM t)
             |SELECT doc_id, shard,
             |  CAST(prefix_tokens // 512 AS BIGINT) AS pack_id, prefix_tokens
             |FROM p ORDER BY doc_id""".stripMargin)),

    QueryDef("pack2_packed_sequences",
      // the materialized training sequences pack1 assigns: per-pack doc
      // count, token total, and the id-ordered concatenated payload
      // (compared by md5 — the oracle replays the same string_agg).
      (s, dir) => Sam.materializePacks(
          docs(s, dir).select(col("doc_id"), col("text"),
            T.tokenCount(col("text")).as("n_tokens")),
          "doc_id", "text", "n_tokens", budgetTokens = 512L, shards = 8)
        .select(col("shard"), col("pack_id"), col("n_docs"),
          col("pack_tokens"), md5(col("packed_text")).as("packed_md5"))
        .orderBy("shard", "pack_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, text, doc_id % 8 AS shard,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, text, shard, tok,
             |    CAST(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      - tok AS prefix
             |  FROM t)
             |SELECT shard, CAST(prefix // 512 AS BIGINT) AS pack_id,
             |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS pack_tokens,
             |  md5(string_agg(text, chr(10) ORDER BY doc_id)) AS packed_md5
             |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("r1_bm25",
      // BM25 keyword relevance over the corpus: stats (N, Σdl, per-term
      // df) aggregate to ONE row and broadcast back, so scoring is a
      // shuffle-free projection. Score = fixed-order sum of per-term IEEE
      // chains, rounded to 6dp — cross-engine reproducible.
      (s, dir) => R.bm25(docs(s, dir), "doc_id", "text",
        Seq("filter", "stream", "customer")).orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w,
             |         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS dl
             |  FROM documents),
             |st AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS sumdl,
             |    CAST(sum(CASE WHEN list_contains(w, 'filter') THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             |    CAST(sum(CASE WHEN list_contains(w, 'stream') THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             |    CAST(sum(CASE WHEN list_contains(w, 'customer') THEN 1 ELSE 0 END) AS DOUBLE) AS df2
             |  FROM d),
             |sc AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(w, x -> x = 'filter')) AS DOUBLE) AS tf0,
             |    CAST(len(list_filter(w, x -> x = 'stream')) AS DOUBLE) AS tf1,
             |    CAST(len(list_filter(w, x -> x = 'customer')) AS DOUBLE) AS tf2,
             |    CAST(dl AS DOUBLE) AS dl, n, sumdl, df0, df1, df2
             |  FROM d, st)
             |SELECT doc_id, round(
             |    ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
             |      * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
             |  + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
             |      * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
             |  + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
             |      * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n))),
             |  6) AS bm25
             |FROM sc ORDER BY doc_id""".stripMargin)),

    QueryDef("a15_cms_freq",
      // count-min frequency estimates ([[SketchFunctions.cmsCounts]])
      // of the five event types — the fixed-few-KB answer to "how hot
      // is THIS key" that a drift alarm or skew probe asks at 100 TB
      // without materializing a data-sized exact count table. One
      // tree-aggregated pass, nothing keyed shuffles. NO DuckDB oracle
      // by the a7b/a10b sketch pattern (the sketch's hash layout is
      // JVM-implementation-specific); the spec pins the CMS bound
      // est ∈ [exact, exact + eps·N] against the exact counts and
      // seed-determinism.
      (s, dir) => graft.functions.SketchFunctions.cmsCounts(
          events(s, dir), "event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .orderBy("event_type"),
      None),

    QueryDef("z1_zvalue",
      // Morton z-value ([[graft.ops.ZOrderOps.zValue]]) over two
      // 8-bit-bucketed dimensions — the sort key behind multi-
      // dimensional scan pruning (Delta/Iceberg OPTIMIZE ZORDER).
      // Pure bit arithmetic, so the oracle recomputes it from the SAME
      // generated expression ([[ZOrderOps.zValueSql]] — the s2
      // generated-oracle pattern: the two engines cannot drift).
      // Layout effectiveness (tight per-partition bounding boxes in
      // BOTH dims after range-partitioning) is spec-pinned.
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.ops.ZOrderOps.zValue(Seq(
            pmod(col("l_suppkey"), lit(256)),
            pmod(col("l_partkey"), lit(256))), bits = 8).as("z"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  ${graft.ops.ZOrderOps.zValueSql(
                   Seq("l_suppkey % 256", "l_partkey % 256"), 8)} AS z
              |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef("r5_tfidf_keywords",
      // per-document keyword extraction ([[RelevanceFunctions
      // .topTfIdfTerms]]): top-5 terms by tf·ln(N/df) — the
      // corpus-exploration pass that tags what each document is about.
      // The per-doc top-k is capPerGroup's bounded KthSmallest heap on
      // struct(-tfidf, term) (no per-document sort, no window); the
      // oracle replays with a row_number window — semantics must agree
      // exactly, which is the point.
      (s, dir) => R.topTfIdfTerms(docs(s, dir), "doc_id", "text", k = 5)
        .orderBy(col("doc_id"), col("tfidf").desc, col("term")),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
             |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.term,
             |         CAST(tf.tf AS DOUBLE) * ln(n.n / CAST(dfc.df AS DOUBLE)) AS tfidf
             |  FROM tf JOIN dfc USING (term), n),
             |ranked AS (
             |  SELECT doc_id, term, tfidf,
             |         row_number() OVER (PARTITION BY doc_id
             |           ORDER BY tfidf DESC, term) AS rn
             |  FROM scored)
             |SELECT doc_id, term, round(tfidf, 6) AS tfidf FROM ranked
             |WHERE rn <= 5 ORDER BY doc_id, round(tfidf, 6) DESC, term""".stripMargin)),

    QueryDef("r4_hybrid_rrf",
      // hybrid retrieval: BM25 keyword top-20 fused with cosine vector
      // top-20 by reciprocal-rank fusion ([[RelevanceFunctions
      // .rrfFuse]], Cormack & Clarke SIGIR 2009) — no score calibration,
      // just 1/(60+rank) per list. The regenerated embeddings table is
      // 1:1 with documents (vec_id = doc_id), so the two rankings share
      // an id space; the vector query is document 0's own embedding
      // (self excluded by the top-k contract). Both engines derive both
      // lists and the fusion end-to-end.
      (s, dir) => {
        val kwW = Window.orderBy(col("bm25").desc, col("doc_id"))
        val kw = R.bm25(docs(s, dir), "doc_id", "text",
            Seq("filter", "stream", "customer"))
          .orderBy(col("bm25").desc, col("doc_id")).limit(20)
          .withColumn("rank", row_number().over(kwW))
          .select("doc_id", "rank")
        val emb = t(s, dir, "embeddings")
        val q0 = emb.filter(col("vec_id") === 0)
          .select(lit(0L).as("query_id"), col("embedding").as("query_vec"))
        val vec = S.bruteForceTopK(emb, q0, 20)
          .select(col("vec_id").as("doc_id"), col("rank"))
        R.rrfFuse(Seq(kw, vec), "doc_id", "rank", topK = 10)
          .orderBy("rank")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w,
             |         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS dl
             |  FROM documents),
             |st AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS sumdl,
             |    CAST(sum(CASE WHEN list_contains(w, 'filter') THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             |    CAST(sum(CASE WHEN list_contains(w, 'stream') THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             |    CAST(sum(CASE WHEN list_contains(w, 'customer') THEN 1 ELSE 0 END) AS DOUBLE) AS df2
             |  FROM d),
             |sc AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(w, x -> x = 'filter')) AS DOUBLE) AS tf0,
             |    CAST(len(list_filter(w, x -> x = 'stream')) AS DOUBLE) AS tf1,
             |    CAST(len(list_filter(w, x -> x = 'customer')) AS DOUBLE) AS tf2,
             |    CAST(dl AS DOUBLE) AS dl, n, sumdl, df0, df1, df2
             |  FROM d, st),
             |bm AS (
             |  SELECT doc_id, round(
             |      ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
             |        * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
             |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
             |        * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n)))
             |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
             |        * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumdl / n))),
             |    6) AS bm25
             |  FROM sc),
             |kw AS (
             |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
             |  FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
             |vs AS (
             |  SELECT e.vec_id AS doc_id, round(list_cosine_similarity(e.v, q.qv), 6) AS cos
             |  FROM e, q WHERE e.vec_id <> 0),
             |vec AS (
             |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r
             |  FROM vs ORDER BY cos DESC, doc_id LIMIT 20),
             |fused AS (
             |  SELECT coalesce(kw.doc_id, vec.doc_id) AS doc_id,
             |         round(coalesce(1.0 / (60 + kw.r), 0) + coalesce(1.0 / (60 + vec.r), 0), 6) AS rrf
             |  FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id),
             |ranked AS (
             |  SELECT doc_id, rrf,
             |         CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER) AS "rank"
             |  FROM fused)
             |SELECT doc_id, rrf, "rank" FROM ranked
             |WHERE "rank" <= 10 ORDER BY "rank"""".stripMargin)),

    QueryDef("w24_atr",
      // Average True Range (ATR-14, SMA variant) over the intraday-bar
      // OHLC adaptation ([[Q.ohlcBars]]): TR = max(high − low,
      // |high − prev_close|, |low − prev_close|), null until a full
      // 14-TR frame (pandas min_periods parity, the w11/w15 guard).
      // Inputs are bit-exact 2dp doubles, per-row TR one IEEE max chain
      // (identical cross-engine); the rolling mean is multi-term float
      // → 6dp round. lag/count/avg all ride the per-ticker window —
      // one exchange, one sort.
      (s, dir) => {
        val w14 = wTicker.rowsBetween(-13, 0)
        Q.ohlcBars(t(s, dir, "lineitem"))
          .withColumn("_pc", lag("close", 1).over(wTicker))
          .withColumn("_tr", when(col("_pc").isNull, lit(null)).otherwise(
            greatest(col("high") - col("low"),
              abs(col("high") - col("_pc")),
              abs(col("low") - col("_pc")))))
          .withColumn("_n", count(col("_tr")).over(w14))
          .select(col("ticker"), col("date"),
            round(when(col("_n") < 14, lit(null))
              .otherwise(avg(col("_tr")).over(w14)), 6).as("atr14"))
          .orderBy("ticker", "date")
      },
      Some(Q.ohlcSql +
        """, tr AS (
          |  SELECT ticker, "date",
          |    CASE WHEN lag(close) OVER wt IS NULL THEN NULL
          |         ELSE greatest(high - low,
          |                       abs(high - lag(close) OVER wt),
          |                       abs(low  - lag(close) OVER wt)) END AS tr
          |  FROM bars
          |  WINDOW wt AS (PARTITION BY ticker ORDER BY "date")),
          |a AS (
          |  SELECT ticker, "date",
          |    count(tr) OVER w AS n, avg(tr) OVER w AS atr
          |  FROM tr
          |  WINDOW w AS (PARTITION BY ticker ORDER BY "date"
          |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
          |SELECT ticker, "date",
          |  round(CASE WHEN n < 14 THEN NULL ELSE atr END, 6) AS atr14
          |FROM a ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("w25_stochastic",
      // stochastic oscillator: %K = 100·(close − min14(low)) /
      // (max14(high) − min14(low)) with the full-frame guard and an
      // explicit flat-range null (x/0 is null in Spark, inf in DuckDB —
      // the w11 portability rule); %D = 3-row mean of the ROUNDED %K
      // (so both engines average identical doubles), null until 3 %K
      // values exist. Both window layers share the per-ticker exchange.
      (s, dir) => {
        val w14 = wTicker.rowsBetween(-13, 0)
        val w3 = wTicker.rowsBetween(-2, 0)
        Q.ohlcBars(t(s, dir, "lineitem"))
          .withColumn("_n", count(col("close")).over(w14))
          .withColumn("_ll", min(col("low")).over(w14))
          .withColumn("_hh", max(col("high")).over(w14))
          .withColumn("pct_k", round(
            when(col("_n") < 14, lit(null))
              .when(col("_hh") === col("_ll"), lit(null))
              .otherwise((col("close") - col("_ll")) /
                (col("_hh") - col("_ll")) * 100.0), 6))
          .withColumn("_kn", count(col("pct_k")).over(w3))
          .select(col("ticker"), col("date"), col("pct_k"),
            round(when(col("_kn") < 3, lit(null))
              .otherwise(avg(col("pct_k")).over(w3)), 6).as("pct_d"))
          .orderBy("ticker", "date")
      },
      Some(Q.ohlcSql +
        """, a AS (
          |  SELECT ticker, "date", close,
          |    count(close) OVER w AS n,
          |    min(low)  OVER w AS ll,
          |    max(high) OVER w AS hh
          |  FROM bars
          |  WINDOW w AS (PARTITION BY ticker ORDER BY "date"
          |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
          |k AS (
          |  SELECT ticker, "date",
          |    round(CASE WHEN n < 14 THEN NULL
          |               WHEN hh = ll THEN NULL
          |               ELSE (close - ll) / (hh - ll) * 100.0 END, 6) AS pct_k
          |  FROM a),
          |d AS (
          |  SELECT ticker, "date", pct_k,
          |    count(pct_k) OVER w3 AS kn, avg(pct_k) OVER w3 AS kd
          |  FROM k
          |  WINDOW w3 AS (PARTITION BY ticker ORDER BY "date"
          |                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
          |SELECT ticker, "date", pct_k,
          |  round(CASE WHEN kn < 3 THEN NULL ELSE kd END, 6) AS pct_d
          |FROM d ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("w26_obv",
      // on-balance volume: cumulative sum of sign(close − prev_close) ·
      // volume (first row contributes 0). close deltas are exact IEEE on
      // identical 2dp doubles so the sign never flips cross-engine;
      // volumes are integral, so the running sum accumulates in EXACT
      // decimal and casts to double bit-identically — UNROUNDED.
      (s, dir) => prices(t(s, dir, "lineitem"))
        .withColumn("_pc", lag("close", 1).over(wTicker))
        .withColumn("_step", when(col("_pc").isNull, lit(0.0))
          .otherwise(signum(col("close") - col("_pc")) * col("volume")))
        .select(col("ticker"), col("date"),
          sum(col("_step").cast("decimal(28,2)"))
            .over(wTicker.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("obv"))
        .orderBy("ticker", "date"),
      Some(pricesSql +
        """, st AS (
          |  SELECT ticker, "date",
          |    CASE WHEN lag(close) OVER wt IS NULL THEN 0.0
          |         ELSE sign(close - lag(close) OVER wt) * volume END AS step
          |  FROM prices
          |  WINDOW wt AS (PARTITION BY ticker ORDER BY "date"))
          |SELECT ticker, "date",
          |  CAST(SUM(CAST(step AS DECIMAL(28,2)))
          |       OVER (PARTITION BY ticker ORDER BY "date"
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |       AS DOUBLE) AS obv
          |FROM st ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("a22_benford",
      // Benford first-digit audit over l_extendedprice — the classic
      // fabricated-data / feed-corruption screen. The leading digit is
      // taken from the EXACT decimal's string form (floor(log10) sits on
      // libm boundaries at powers of ten; substring of a 2dp decimal
      // does not). Benford probabilities round to 6dp before the χ²
      // arithmetic so libm log10 ulps can't propagate; χ² contributions
      // round to 6dp and sum in exact decimal (9 fixed terms — no
      // float accumulation order). One scan, two single-row broadcasts.
      (s, dir) => {
        val byDigit = t(s, dir, "lineitem")
          .select(substring(col("l_extendedprice").cast("decimal(12,2)")
            .cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val tot = byDigit.agg(sum(col("n")).as("_t"))
        val scored = byDigit.crossJoin(broadcast(tot))
          .withColumn("p_obs",
            round(col("n").cast("double") / col("_t").cast("double"), 6))
          .withColumn("p_benford",
            round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6))
          .withColumn("_chi", round(
            pow(col("n").cast("double") - col("_t").cast("double") * col("p_benford"), 2)
              / (col("_t").cast("double") * col("p_benford")), 6)
            .cast("decimal(18,6)"))
        val chi2 = scored.agg(sum(col("_chi")).cast("double").as("chi2"))
        scored.crossJoin(broadcast(chi2))
          .select(col("digit"), col("n"), col("p_obs"), col("p_benford"), col("chi2"))
          .orderBy("digit")
      },
      Some("""WITH d AS (
             |  SELECT CAST(substring(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR),
             |                        1, 1) AS INTEGER) AS digit
             |  FROM lineitem),
             |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
             |tt AS (SELECT CAST(SUM(n) AS DOUBLE) AS td FROM c),
             |s AS (
             |  SELECT digit, n,
             |    round(CAST(n AS DOUBLE) / td, 6) AS p_obs,
             |    round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS p_benford,
             |    td
             |  FROM c, tt),
             |x AS (
             |  SELECT digit, n, p_obs, p_benford,
             |    CAST(round(pow(CAST(n AS DOUBLE) - td * p_benford, 2)
             |               / (td * p_benford), 6) AS DECIMAL(18,6)) AS chi
             |  FROM s)
             |SELECT digit, n, p_obs, p_benford,
             |  (SELECT CAST(SUM(chi) AS DOUBLE) FROM x) AS chi2
             |FROM x ORDER BY digit""".stripMargin)),

    QueryDef("t19_readability",
      // Flesch reading ease over the documents table
      // ([[graft.functions.TextFunctions.fleschReadingEase]]): words =
      // \S+ runs, sentences = [.!?]+ runs (min 1 when words exist),
      // syllables = [aeiouy]+ vowel groups — every count an exact
      // integer in the Java∩RE2 regex subset, the score one IEEE chain
      // → 6dp round. Projection-only: no join, no shuffle beyond the
      // final order.
      (s, dir) => docs(s, dir).select(
          col("doc_id"),
          T.tokenCount(col("text")).as("words"),
          T.sentenceCount(col("text")).as("sentences"),
          T.syllableCount(col("text")).as("syllables"),
          round(T.fleschReadingEase(col("text")), 6).as("flesch"))
        .orderBy("doc_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS words,
             |    CASE WHEN text IS NULL THEN NULL
             |         ELSE greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
             |                       CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
             |                            THEN 1 ELSE 0 END) END AS sentences,
             |    CASE WHEN text IS NULL THEN NULL
             |         ELSE CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
             |    END AS syllables
             |  FROM documents)
             |SELECT doc_id, words, sentences, syllables,
             |  round(CASE WHEN words = 0 THEN NULL
             |             ELSE 206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences)
             |                          - 84.6 * (CAST(syllables AS DOUBLE) / words)
             |        END, 6) AS flesch
             |FROM m ORDER BY doc_id""".stripMargin)),

    QueryDef("d26_prefix_jaccard",
      // PPJoin-style prefix-filtered set-similarity self-join
      // ([[graft.functions.DedupFunctions.prefixJaccardPairs]]): the
      // COMPLETE Jaccard-pairs answer — candidates only from each
      // document's rarest-first shingle prefix, exact verification on
      // the full arrays. Same contract as d3 but with the prefix filter
      // replacing the lossy df-cap; at sf0.01 the two agree exactly.
      (s, dir) => D.prefixJaccardPairs(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.8)
        .orderBy("id_a", "id_b"),
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |e AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sgl FROM sh),
             |dfc AS (SELECT sgl, count(*) AS df FROM e GROUP BY 1),
             |rk AS (
             |  SELECT e.doc_id, e.n_sh, e.sgl,
             |         row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.sgl) AS rn
             |  FROM e JOIN dfc d USING (sgl)),
             |pre AS (
             |  SELECT doc_id, n_sh, sgl FROM rk
             |  WHERE rn <= n_sh - ceil(0.8 * CAST(n_sh AS DOUBLE) - 1e-9) + 1),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             |         a.n_sh AS n_a, b.n_sh AS n_b
             |  FROM pre a JOIN pre b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
             |  WHERE CAST(least(a.n_sh, b.n_sh) AS DOUBLE)
             |        >= 0.8 * CAST(greatest(a.n_sh, b.n_sh) AS DOUBLE) - 1e-9),
             |ver AS (
             |  SELECT c.id_a, c.id_b, c.n_a, c.n_b, count(*) AS shared
             |  FROM cand c
             |  JOIN e ea ON ea.doc_id = c.id_a
             |  JOIN e eb ON eb.doc_id = c.id_b AND eb.sgl = ea.sgl
             |  GROUP BY 1, 2, 3, 4)
             |SELECT id_a, id_b,
             |  round(CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE), 6) AS jaccard
             |FROM ver
             |WHERE CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) >= 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("w27_holt",
      // Holt double exponential smoothing per ticker ([[graft.ops
      // .FeatureOps.holtForecast]]): level/trend recursion in EXACT
      // decimal, 8dp HALF_UP per step — a float recursion amplifies
      // ulps, a decimal one has none, so the oracle's recursive CTE
      // replays every intermediate state bit-for-bit. One hash agg +
      // array-local fold; no window.
      (s, dir) => FeatureOps.holtForecast(prices(t(s, dir, "lineitem")),
          "ticker", "date", "close")
        .orderBy("ticker"),
      Some(pricesSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, r2 AS (
          |  SELECT ticker, CAST(CAST(close AS DECIMAL(12,2)) AS DECIMAL(20,8)) AS x,
          |         row_number() OVER (PARTITION BY ticker ORDER BY "date") AS rn
          |  FROM prices),
          |st AS (
          |  SELECT ticker, 1 AS rn, x AS l, CAST(0 AS DECIMAL(20,8)) AS b
          |  FROM r2 WHERE rn = 1
          |  UNION ALL
          |  SELECT r2.ticker, r2.rn,
          |    CASE WHEN r2.rn = 2 THEN r2.x
          |         ELSE CAST(round(0.5 * r2.x + 0.5 * (st.l + st.b), 8) AS DECIMAL(20,8)) END,
          |    CASE WHEN r2.rn = 2 THEN CAST(round(r2.x - st.l, 8) AS DECIMAL(20,8))
          |         ELSE CAST(round(
          |                0.3 * (CAST(round(0.5 * r2.x + 0.5 * (st.l + st.b), 8) AS DECIMAL(20,8))
          |                       - st.l)
          |                + 0.7 * st.b, 8) AS DECIMAL(20,8)) END
          |  FROM st JOIN r2 ON r2.ticker = st.ticker AND r2.rn = st.rn + 1),
          |fin AS (
          |  SELECT s.ticker, s.rn, s.l, s.b,
          |         row_number() OVER (PARTITION BY s.ticker ORDER BY s.rn DESC) AS rk
          |  FROM st s)
          |SELECT ticker, CAST(rn AS BIGINT) AS n,
          |       CAST(l AS DOUBLE) AS level, CAST(b AS DOUBLE) AS trend,
          |       CAST(l + 5 * b AS DOUBLE) AS forecast_5
          |FROM fin WHERE rk = 1 ORDER BY ticker""".stripMargin)),

    QueryDef("w28_cusum",
      // two-sided CUSUM drift monitor over daily returns ([[graft.ops
      // .ValidationOps.cusumDrift]]): μ/σ are 6dp-rounded float
      // aggregates (the a4/a13 convention); the whole recursion after
      // that is EXACT decimal, so max-state and alarm counts replay
      // exactly in the oracle's recursive CTE.
      (s, dir) => ValidationOps.cusumDrift(
          pricesWithRet(s, dir).select(col("ticker"), col("date"), col("ret")),
          "ticker", "date", "ret"),
      Some((pricesSql + retSql).replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, x AS (
          |  SELECT ticker, round(ret, 6) AS x6,
          |         row_number() OVER (PARTITION BY ticker ORDER BY "date") AS rn
          |  FROM r WHERE ret IS NOT NULL),
          |stats AS (
          |  SELECT ticker, count(*) AS n, round(avg(x6), 6) AS mu,
          |         round(coalesce(stddev_samp(x6), 0.0), 6) AS sigma
          |  FROM x GROUP BY 1),
          |par AS (
          |  SELECT ticker, CAST(mu AS DECIMAL(12,6)) AS mud,
          |         CAST(round(0.5 * sigma, 6) AS DECIMAL(12,6)) AS k,
          |         CAST(round(4.0 * sigma, 6) AS DECIMAL(12,6)) AS h
          |  FROM stats),
          |cu AS (
          |  SELECT ticker, 0 AS rn,
          |         CAST(0 AS DECIMAL(20,8)) AS sp, CAST(0 AS DECIMAL(20,8)) AS sn,
          |         CAST(0 AS DECIMAL(20,8)) AS maxp, CAST(0 AS DECIMAL(20,8)) AS maxn,
          |         CAST(0 AS BIGINT) AS alarms
          |  FROM stats
          |  UNION ALL
          |  SELECT cu.ticker, x.rn,
          |    greatest(CAST(0 AS DECIMAL(20,8)),
          |             CAST(cu.sp + (CAST(x.x6 AS DECIMAL(12,6)) - p.mud - p.k) AS DECIMAL(20,8))),
          |    greatest(CAST(0 AS DECIMAL(20,8)),
          |             CAST(cu.sn + (p.mud - CAST(x.x6 AS DECIMAL(12,6)) - p.k) AS DECIMAL(20,8))),
          |    greatest(cu.maxp,
          |             greatest(CAST(0 AS DECIMAL(20,8)),
          |               CAST(cu.sp + (CAST(x.x6 AS DECIMAL(12,6)) - p.mud - p.k) AS DECIMAL(20,8)))),
          |    greatest(cu.maxn,
          |             greatest(CAST(0 AS DECIMAL(20,8)),
          |               CAST(cu.sn + (p.mud - CAST(x.x6 AS DECIMAL(12,6)) - p.k) AS DECIMAL(20,8)))),
          |    cu.alarms + CASE WHEN
          |        greatest(CAST(0 AS DECIMAL(20,8)),
          |          CAST(cu.sp + (CAST(x.x6 AS DECIMAL(12,6)) - p.mud - p.k) AS DECIMAL(20,8))) > p.h
          |        OR greatest(CAST(0 AS DECIMAL(20,8)),
          |          CAST(cu.sn + (p.mud - CAST(x.x6 AS DECIMAL(12,6)) - p.k) AS DECIMAL(20,8))) > p.h
          |      THEN 1 ELSE 0 END
          |  FROM cu
          |  JOIN x ON x.ticker = cu.ticker AND x.rn = cu.rn + 1
          |  JOIN par p ON p.ticker = cu.ticker),
          |fin AS (
          |  SELECT cu.*, row_number() OVER (PARTITION BY ticker ORDER BY rn DESC) AS rk
          |  FROM cu)
          |SELECT f.ticker, s.n, s.mu, s.sigma,
          |       CAST(f.maxp AS DOUBLE) AS max_sp, CAST(f.maxn AS DOUBLE) AS max_sn,
          |       f.alarms AS n_alarms
          |FROM fin f JOIN stats s USING (ticker)
          |WHERE f.rk = 1 ORDER BY f.ticker""".stripMargin)),

    QueryDef("g6_personalized_pagerank",
      // personalized PageRank from seed parts {1,2,3} over the
      // co-purchase graph ([[graft.ops.GraphOps.personalizedPageRank]]):
      // teleport mass on the seeds only — "parts bought with THESE
      // parts". Same unrolled round-by-round oracle as g1; ranks decay
      // to 0 off the seeds' reachable set.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        GraphOps.personalizedPageRank(pairs, "src", "dst",
          seeds = Seq(1L, 2L, 3L), iterations = 5)
      },
      Some(pprOracle(5, Seq(1L, 2L, 3L)))),

    QueryDef("w29_theil_sen",
      // Theil-Sen robust trend per ticker over 1995H1 ([[graft.ops
      // .FeatureOps.theilSenTrend]]): median of pairwise slopes +
      // median residual intercept. The date cut bounds the O(n²) pair
      // set (the g3 convention); each slope is one IEEE division,
      // medians are the exact-interpolation percentile both engines
      // evaluate identically (w19 contract), outputs round 6dp.
      (s, dir) => FeatureOps.theilSenTrend(
          prices(t(s, dir, "lineitem"))
            .filter(col("date").between("1995-01-01", "1995-06-30")),
          "ticker", "date", "close"),
      Some(pricesSql +
        """, px AS (
          |  SELECT ticker, CAST("date" - DATE '1992-01-01' AS BIGINT) AS x, close AS y
          |  FROM prices
          |  WHERE "date" BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'),
          |sl AS (
          |  SELECT a.ticker, (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS m
          |  FROM px a JOIN px b ON a.ticker = b.ticker AND a.x < b.x),
          |fit AS (
          |  SELECT ticker, count(*) AS n_pairs, quantile_cont(m, 0.5) AS slope
          |  FROM sl GROUP BY 1),
          |res AS (
          |  SELECT p.ticker, f.n_pairs, f.slope,
          |         p.y - f.slope * CAST(p.x AS DOUBLE) AS r
          |  FROM px p JOIN fit f USING (ticker))
          |SELECT ticker, count(*) AS n, min(n_pairs) AS n_pairs,
          |  round(min(slope), 6) AS slope,
          |  round(quantile_cont(r, 0.5), 6) AS intercept
          |FROM res GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("w30_mann_kendall",
      // Mann-Kendall trend significance per ticker over the same 1995H1
      // cut ([[graft.ops.ValidationOps.mannKendall]]): S and the tie
      // correction are exact integers, Var(S) an exact difference over
      // 18.0, z one IEEE chain (sqrt is correctly rounded — unlike ln)
      // rounded 6dp, and the ±1.96 call reads the ROUNDED z.
      (s, dir) => ValidationOps.mannKendall(
          prices(t(s, dir, "lineitem"))
            .filter(col("date").between("1995-01-01", "1995-06-30")),
          "ticker", "date", "close"),
      Some(pricesSql +
        """, px AS (
          |  SELECT ticker, "date" AS t, close AS y
          |  FROM prices
          |  WHERE "date" BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'),
          |s AS (
          |  SELECT a.ticker,
          |         CAST(SUM(CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT) AS s_stat
          |  FROM px a JOIN px b ON a.ticker = b.ticker AND a.t < b.t
          |  GROUP BY 1),
          |nn AS (SELECT ticker, count(*) AS n FROM px GROUP BY 1),
          |tg AS (
          |  SELECT ticker, CAST(SUM(t3) AS BIGINT) AS tcorr FROM (
          |    SELECT ticker, y,
          |           count(*) * (count(*) - 1) * (2 * count(*) + 5) AS t3
          |    FROM px GROUP BY 1, 2 HAVING count(*) > 1)
          |  GROUP BY 1),
          |v AS (
          |  SELECT nn.ticker, nn.n, s.s_stat,
          |         CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
          |              - COALESCE(tg.tcorr, 0) AS DOUBLE) / 18.0 AS var_s
          |  FROM nn JOIN s USING (ticker) LEFT JOIN tg USING (ticker)),
          |zz AS (
          |  SELECT ticker, n, s_stat, var_s,
          |    round(CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
          |               WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
          |               ELSE 0.0 END, 6) AS z
          |  FROM v)
          |SELECT ticker, n, s_stat, var_s, z,
          |  CASE WHEN z > 1.96 THEN 'increasing'
          |       WHEN z < -1.96 THEN 'decreasing'
          |       ELSE 'no trend' END AS trend
          |FROM zz ORDER BY ticker""".stripMargin)),

    QueryDef("t20_zipf",
      // Zipf rank-frequency fit over the documents vocabulary
      // ([[graft.functions.RelevanceFunctions.zipfFit]]): top-100
      // tokens + the OLS line through (ln rank, ln freq). Per-point
      // lns round 6dp (the cls1/a14 libm convention), fit sums
      // accumulate in exact decimal, slope/intercept round 6dp.
      (s, dir) => R.zipfFit(docs(s, dir), "text", topK = 100),
      Some("""WITH tok AS (
             |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
             |  FROM documents WHERE text IS NOT NULL),
             |tok2 AS (SELECT token FROM tok WHERE length(token) > 0),
             |c AS (SELECT token, count(*) AS n FROM tok2 GROUP BY 1),
             |top AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT 100),
             |rk AS (
             |  SELECT token, n,
             |         CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) AS "rank"
             |  FROM top),
             |pts AS (
             |  SELECT token, n, "rank",
             |         round(ln(CAST("rank" AS DOUBLE)), 6) AS ln_rank,
             |         round(ln(CAST(n AS DOUBLE)), 6) AS ln_freq
             |  FROM rk),
             |sums AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS k,
             |    CAST(SUM(CAST(ln_rank AS DECIMAL(20,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(ln_freq AS DECIMAL(20,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(ln_rank * ln_freq AS DECIMAL(24,12))) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(ln_rank * ln_rank AS DECIMAL(24,12))) AS DOUBLE) AS sxx
             |  FROM pts),
             |fit AS (
             |  SELECT (k * sxy - sx * sy) / (k * sxx - sx * sx) AS slope,
             |         (sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k AS icept
             |  FROM sums)
             |SELECT "rank", token, n, ln_rank, ln_freq,
             |  round(slope, 6) AS slope, round(icept, 6) AS intercept
             |FROM pts, fit ORDER BY "rank"""".stripMargin)),

    QueryDef("e15_transition_matrix",
      // first-order Markov transitions over per-user event streams
      // ([[graft.ops.EventAnalyticsOps.transitionMatrix]]): USER-
      // partitioned lead window (bounded per user), two hash aggs to a
      // types²-sized matrix, broadcast row totals. (ts, event_id)
      // total tiebreak makes same-timestamp streams deterministic.
      (s, dir) => EventAnalyticsOps.transitionMatrix(events(s, dir)),
      Some("""WITH p AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id
             |                                ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |c AS (
             |  SELECT from_type, to_type, count(*) AS n
             |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
             |SELECT c.from_type, c.to_type, c.n,
             |  round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS p
             |FROM c JOIN t USING (from_type) ORDER BY 1, 2""".stripMargin)),

    QueryDef("a23_asof_snapshot",
      // point-in-time read over the scd1 history ([[graft.ops
      // .HistoryOps.asOfSnapshot]]): each ticker's price band AS OF
      // 1995-06-30 — the run with the latest valid_from ≤ T (SCD2
      // current-until-superseded). One max_by hash agg, no window.
      (s, dir) => HistoryOps.asOfSnapshot(
        HistoryOps.scd2Compress(
          prices(t(s, dir, "lineitem"))
            .withColumn("band", floor(col("close") / lit(1000.0)).cast("int")),
          "ticker", "date", "band"),
        "ticker", "valid_from", lit("1995-06-30").cast("date")),
      Some(pricesSql +
        """, b AS (SELECT ticker, "date",
          |          CAST(FLOOR(close / 1000.0) AS INTEGER) AS band FROM prices),
          |f AS (SELECT ticker, "date", band,
          |  CASE WHEN lag(band) OVER (PARTITION BY ticker ORDER BY "date")
          |            IS NOT DISTINCT FROM band THEN 0 ELSE 1 END AS chg
          |  FROM b),
          |g AS (SELECT ticker, "date", band,
          |  SUM(chg) OVER (PARTITION BY ticker ORDER BY "date"
          |                 ROWS UNBOUNDED PRECEDING) AS grp FROM f),
          |h AS (SELECT ticker, min(band) AS band, min("date") AS valid_from,
          |        max("date") AS valid_to, count(*) AS n_periods
          |      FROM g GROUP BY ticker, grp),
          |el AS (SELECT * FROM h WHERE valid_from <= DATE '1995-06-30'),
          |m AS (SELECT ticker, max(valid_from) AS mv FROM el GROUP BY 1)
          |SELECT el.ticker, el.band, el.valid_from, el.valid_to, el.n_periods
          |FROM el JOIN m ON el.ticker = m.ticker AND el.valid_from = m.mv
          |ORDER BY el.ticker""".stripMargin)),

    QueryDef("w31_kalman",
      // 1-D local-level Kalman filter per ticker ([[graft.ops
      // .FeatureOps.kalmanLevel]], q=0.01, r=1): exact-decimal state;
      // the gain's division is the one irrational step, closed by IEEE
      // floor-truncation at 8dp (round would be engine-divergent at .5
      // boundaries — the w22 measurement). The recursive CTE replays
      // every state bit-for-bit.
      (s, dir) => FeatureOps.kalmanLevel(prices(t(s, dir, "lineitem")),
        "ticker", "date", "close"),
      Some(pricesSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, r2 AS (
          |  SELECT ticker, CAST(CAST(close AS DECIMAL(12,2)) AS DECIMAL(20,8)) AS z,
          |         row_number() OVER (PARTITION BY ticker ORDER BY "date") AS rn
          |  FROM prices),
          |st AS (
          |  SELECT ticker, 1 AS rn, z AS x,
          |         CAST(1 AS DECIMAL(10,8)) AS p, CAST(NULL AS DECIMAL(10,8)) AS g
          |  FROM r2 WHERE rn = 1
          |  UNION ALL
          |  SELECT ticker, rn,
          |    CAST(x0 + CAST(round(CAST(g0 AS DECIMAL(20,8))
          |                          * CAST(z0 - x0 AS DECIMAL(16,8)), 8)
          |              AS DECIMAL(20,8)) AS DECIMAL(20,8)) AS x,
          |    CAST(round(CAST(CAST(1 AS DECIMAL(10,8)) - g0 AS DECIMAL(10,8)) * pp0, 8)
          |         AS DECIMAL(10,8)) AS p,
          |    g0 AS g
          |  FROM (
          |    SELECT r2.ticker, r2.rn, r2.z AS z0, st.x AS x0,
          |           CAST(st.p + 0.01 AS DECIMAL(10,8)) AS pp0,
          |           CAST(floor(CAST(st.p + 0.01 AS DOUBLE)
          |                      / CAST(st.p + 0.01 + 1.0 AS DOUBLE)
          |                      * 100000000.0) / 100000000.0 AS DECIMAL(10,8)) AS g0
          |    FROM st JOIN r2 ON r2.ticker = st.ticker AND r2.rn = st.rn + 1)),
          |fin AS (
          |  SELECT s.ticker, s.rn, s.x, s.p, s.g,
          |         row_number() OVER (PARTITION BY s.ticker ORDER BY s.rn DESC) AS rk
          |  FROM st s)
          |SELECT ticker, CAST(rn AS BIGINT) AS n,
          |       CAST(x AS DOUBLE) AS level, CAST(p AS DOUBLE) AS p_var,
          |       CAST(g AS DOUBLE) AS gain
          |FROM fin WHERE rk = 1 ORDER BY ticker""".stripMargin)),

    QueryDef("d27_negative_sampling",
      // deterministic contrastive negatives ([[graft.functions
      // .SamplingFunctions.negativeSample]]): per document, 5 negatives
      // from a 200-doc broadcast pool, different source only, both
      // draws pure md5 functions of the ids (the m1b replay pattern).
      (s, dir) => Sam.negativeSample(docs(s, dir), "doc_id", "source",
          k = 5, poolSize = 200)
        .orderBy("anchor_id", "skey", "neg_id"),
      Some("""WITH d AS (SELECT doc_id, source FROM documents),
             |pool AS (
             |  SELECT doc_id AS neg_id, source AS gb,
             |         CAST(('0x' || substring(md5('neg' || '#' || 'p' || '#'
             |                || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS pk
             |  FROM d ORDER BY pk, neg_id LIMIT 200),
             |cand AS (
             |  SELECT a.doc_id AS anchor_id, p.neg_id,
             |         CAST(('0x' || substring(md5('neg' || '#'
             |                || CAST(a.doc_id AS VARCHAR) || '#'
             |                || CAST(p.neg_id AS VARCHAR)), 1, 15)) AS BIGINT) AS skey
             |  FROM d a JOIN pool p
             |    ON a.source IS DISTINCT FROM p.gb AND a.doc_id <> p.neg_id),
             |rk AS (
             |  SELECT anchor_id, neg_id, skey,
             |         row_number() OVER (PARTITION BY anchor_id
             |                            ORDER BY skey, neg_id) AS rn
             |  FROM cand)
             |SELECT anchor_id, neg_id, skey FROM rk WHERE rn <= 5
             |ORDER BY anchor_id, skey, neg_id""".stripMargin)),

    QueryDef("a24_gini",
      // Gini concentration of daily volume per ticker ([[graft.ops
      // .SkewOps.giniIndex]]): exact-decimal rank-weighted sums (the
      // formula is tie-order-invariant, so the oracle's arbitrary tie
      // order cannot diverge), one closing division → 6dp.
      (s, dir) => SkewOps.giniIndex(prices(t(s, dir, "lineitem")),
        "ticker", "volume"),
      Some(pricesSql +
        """, rk AS (
          |  SELECT ticker, CAST(volume AS DECIMAL(18,2)) AS x,
          |         row_number() OVER (PARTITION BY ticker ORDER BY volume) AS i
          |  FROM prices)
          |SELECT ticker, count(*) AS n,
          |  CAST(SUM(x) AS DOUBLE) AS total,
          |  round(CASE WHEN SUM(x) = 0 THEN NULL
          |             ELSE CAST(2 * SUM(x * i) - (count(*) + 1) * SUM(x) AS DOUBLE)
          |                  / CAST(count(*) * SUM(x) AS DOUBLE) END, 6) AS gini
          |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("a25_histogram",
      // exact equi-width histogram of l_quantity over [1, 50] in 7 bins
      // ([[graft.ops.ValidationOps.histogramInt]]): all-integer bucket
      // map and edge inversion — no float boundary anywhere. 7 bins
      // over 50 values exercises the non-divisible ceil-edge math.
      (s, dir) => ValidationOps.histogramInt(
        t(s, dir, "lineitem").select(col("l_quantity").as("q")),
        "q", lo = 1L, hi = 50L, buckets = 7),
      Some("""WITH b AS (
             |  SELECT ((least(greatest(CAST(q AS BIGINT), 1), 50) - 1) * 7) // 50 AS bucket,
             |         (CAST(q AS BIGINT) < 1 OR CAST(q AS BIGINT) > 50) AS clip
             |  FROM (SELECT l_quantity AS q FROM lineitem) WHERE q IS NOT NULL)
             |SELECT bucket,
             |  1 + (bucket * 50 + 6) // 7 AS lo_edge,
             |  1 + ((bucket + 1) * 50 + 6) // 7 - 1 AS hi_edge,
             |  count(*) AS n,
             |  CAST(SUM(CASE WHEN clip THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("g7_neighbor_jaccard",
      // neighbor-set Jaccard per co-purchase edge ([[graft.ops
      // .GraphOps.neighborJaccard]], first-two-years cut like g3):
      // common neighbors = per-edge triangle count, denominator the
      // standard N(u)∪N(v). All-integer until one division → 6dp.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        GraphOps.neighborJaccard(pairs, "src", "dst")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
             |            WHERE l_shipdate < TIMESTAMP '1997-01-01'),
             |e AS MATERIALIZED (
             |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |  FROM li a JOIN li b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |sym AS MATERIALIZED (
             |  SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
             |deg AS (SELECT a AS node, count(*) AS deg FROM sym GROUP BY 1),
             |cn AS (
             |  SELECT n1.a AS u, n2.a AS v, count(*) AS cn
             |  FROM sym n1 JOIN sym n2 ON n1.b = n2.b AND n1.a < n2.a
             |  WHERE EXISTS (SELECT 1 FROM e WHERE e.u = n1.a AND e.v = n2.a)
             |  GROUP BY 1, 2)
             |SELECT e.u, e.v, COALESCE(cn.cn, 0) AS cn,
             |  du.deg AS deg_u, dv.deg AS deg_v,
             |  round(CAST(COALESCE(cn.cn, 0) AS DOUBLE)
             |        / CAST(du.deg + dv.deg - COALESCE(cn.cn, 0) AS DOUBLE), 6) AS jaccard
             |FROM e LEFT JOIN cn ON e.u = cn.u AND e.v = cn.v
             |JOIN deg du ON du.node = e.u
             |JOIN deg dv ON dv.node = e.v
             |ORDER BY e.u, e.v""".stripMargin)),

    QueryDef("t21_concordance",
      // keyword-in-context for 'spark' over the documents table
      // ([[graft.functions.TextFunctions.concordance]]): one row per
      // occurrence with ±3 tokens of context — scan-local, no shuffle.
      (s, dir) => T.concordance(docs(s, dir), "doc_id", "text",
          term = "spark", window = 3)
        .orderBy("doc_id", "pos"),
      Some("""WITH tk AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
             |  FROM documents WHERE text IS NOT NULL),
             |occ AS (
             |  SELECT doc_id, w,
             |         CAST(unnest(list_filter(generate_series(1, len(w)),
             |                                 i -> w[i] = 'spark')) AS INTEGER) AS pos
             |  FROM tk)
             |SELECT doc_id, pos,
             |  COALESCE(array_to_string(w[greatest(pos - 3, 1):pos - 1], ' '), '') AS before,
             |  COALESCE(array_to_string(w[pos + 1:least(pos + 3, len(w))], ' '), '') AS after
             |FROM occ ORDER BY doc_id, pos""".stripMargin)),

    QueryDef("eval4_ranking_metrics",
      // NDCG@10 / MRR / recall@10 per query term over the BM25 stack
      // ([[graft.functions.RelevanceFunctions.rankingMetrics]], graded
      // self-relevance = capped term occurrences): one pinned corpus
      // scan for all terms; bounded-heap top-k; 6dp-rounded DCG terms
      // summed in exact decimal.
      (s, dir) => R.rankingMetrics(docs(s, dir), "doc_id", "text",
        Seq("filter", "stream", "customer"), k = 10),
      Some(ndcgOracle(Seq("filter", "stream", "customer"), k = 10, relCap = 4))),

    QueryDef("w32_acf",
      // return autocorrelation at lags 1..5 per ticker — the
      // market-efficiency / seasonality diagnostic next to w23's
      // rolling cross-correlation. corr is the engine co-moment
      // aggregate (the a12 merge-order-under-6dp contract); all five
      // lag columns share ONE per-ticker window exchange; the
      // wide→long unpivot is a scan-local stack.
      (s, dir) => {
        val base = pricesWithRet(s, dir)
        val withLags = (1 to 5).foldLeft(base)((d, l) =>
          d.withColumn(s"_l$l", lag(col("ret"), l).over(wTicker)))
        withLags.groupBy("ticker")
          .agg(round(corr(col("ret"), col("_l1")), 6).as("acf1"),
            round(corr(col("ret"), col("_l2")), 6).as("acf2"),
            round(corr(col("ret"), col("_l3")), 6).as("acf3"),
            round(corr(col("ret"), col("_l4")), 6).as("acf4"),
            round(corr(col("ret"), col("_l5")), 6).as("acf5"))
          .selectExpr("ticker",
            "stack(5, 1, acf1, 2, acf2, 3, acf3, 4, acf4, 5, acf5) AS (lag, acf)")
          .orderBy("ticker", "lag")
      },
      Some(pricesSql + retSql +
        """, l AS (
          |  SELECT ticker, ret,
          |    lag(ret, 1) OVER w AS l1, lag(ret, 2) OVER w AS l2,
          |    lag(ret, 3) OVER w AS l3, lag(ret, 4) OVER w AS l4,
          |    lag(ret, 5) OVER w AS l5
          |  FROM r
          |  WINDOW w AS (PARTITION BY ticker ORDER BY "date")),
          |a AS (
          |  SELECT ticker,
          |    round(corr(ret, l1), 6) AS a1, round(corr(ret, l2), 6) AS a2,
          |    round(corr(ret, l3), 6) AS a3, round(corr(ret, l4), 6) AS a4,
          |    round(corr(ret, l5), 6) AS a5
          |  FROM l GROUP BY 1)
          |SELECT ticker, "lag", acf FROM (
          |  SELECT ticker, 1 AS "lag", a1 AS acf FROM a
          |  UNION ALL SELECT ticker, 2, a2 FROM a
          |  UNION ALL SELECT ticker, 3, a3 FROM a
          |  UNION ALL SELECT ticker, 4, a4 FROM a
          |  UNION ALL SELECT ticker, 5, a5 FROM a)
          |ORDER BY ticker, "lag"""".stripMargin)),

    QueryDef("s13_range_search",
      // cosine RANGE search ([[graft.functions.SimilarityFunctions
      // .cosineRangeSearch]]): every corpus vector within radius of
      // each query — fixed radius, unknown k (the dedup-probe /
      // policy-lookup serving mode). Queries broadcast; one narrow
      // corpus scan through the codegen'd VecCosine kernel, no
      // shuffle; 6dp cosines before the cut (the s1 contract).
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        S.cosineRangeSearch(emb, q, threshold = 0.2)
          .orderBy("query_id", "vec_id")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, embedding AS query_vec
             |  FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             |                                      CAST(q.query_vec AS DOUBLE[])), 6) AS cosine
             |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
             |SELECT query_id, vec_id, cosine FROM scored
             |WHERE cosine >= 0.2 ORDER BY query_id, vec_id""".stripMargin)),

    QueryDef("j8_temporal_join",
      // SCD2 point-in-time join: each lineitem fact (by SETTLEMENT
      // date, ship + 30 days — deliberately a different clock than the
      // shipdate-built history)
      // picks the band run in force at ITS time via the as-of backward
      // join against the compressed history ([[graft.ops.AsOfJoinOps]]
      // over [[graft.ops.HistoryOps.scd2Compress]]) — the canonical
      // "join facts to the dimension as it WAS" move; a23 is the
      // single-T snapshot, this is per-row T. Facts before a ticker's
      // first run keep a null band (left semantics).
      (s, dir) => {
        val hist = HistoryOps.scd2Compress(
          prices(t(s, dir, "lineitem"))
            .withColumn("band", floor(col("close") / lit(1000.0)).cast("int")),
          "ticker", "date", "band")
        val fact = t(s, dir, "lineitem")
          .filter(col("l_linenumber") === 1)
          .select(col("l_suppkey").as("ticker"),
            date_add(to_date(col("l_shipdate")), 30).as("cdate"),
            col("l_orderkey"))
        AsOfJoinOps.asOfJoinBackward(fact, hist.select("ticker", "valid_from", "band"),
            Seq("ticker"), "cdate", "valid_from", Seq("band"))
          .orderBy("ticker", "cdate", "l_orderkey")
      },
      Some(pricesSql +
        """, b AS (SELECT ticker, "date",
          |          CAST(FLOOR(close / 1000.0) AS INTEGER) AS band FROM prices),
          |f2 AS (SELECT ticker, "date", band,
          |  CASE WHEN lag(band) OVER (PARTITION BY ticker ORDER BY "date")
          |            IS NOT DISTINCT FROM band THEN 0 ELSE 1 END AS chg
          |  FROM b),
          |g AS (SELECT ticker, "date", band,
          |  SUM(chg) OVER (PARTITION BY ticker ORDER BY "date"
          |                 ROWS UNBOUNDED PRECEDING) AS grp FROM f2),
          |h AS (SELECT ticker, min(band) AS band, min("date") AS valid_from
          |      FROM g GROUP BY ticker, grp),
          |fact AS (
          |  SELECT l_suppkey AS ticker,
          |         CAST(l_shipdate AS DATE) + INTERVAL 30 DAY AS cdate, l_orderkey
          |  FROM lineitem WHERE l_linenumber = 1),
          |sel AS (
          |  SELECT f.ticker, f.cdate, f.l_orderkey, h.band,
          |         row_number() OVER (PARTITION BY f.ticker, f.cdate, f.l_orderkey
          |                            ORDER BY h.valid_from DESC) AS rn
          |  FROM fact f LEFT JOIN h
          |    ON h.ticker = f.ticker AND h.valid_from <= f.cdate)
          |SELECT ticker, cdate, l_orderkey, band FROM sel WHERE rn = 1
          |ORDER BY ticker, cdate, l_orderkey""".stripMargin)),

    QueryDef("j9_star_join",
      // TPC-H Q5-shaped star join: 1996 revenue by ASIA nation over
      // customer⋈orders⋈lineitem⋈supplier⋈nation⋈region with the
      // local-supplier condition. The region→nation dimension chain
      // BROADCASTS (catalog-sized); the fact side shuffles only on its
      // join keys; revenue aggregates in exact decimal (the Q rule).
      // The registry's multi-way join-planning exhibit.
      (s, dir) => {
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA" &&
            to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
            to_date(col("o_orderdate")) < lit("1997-01-01").cast("date"))
          .groupBy(col("n_name"))
          .agg(money2(sum(revenueDec)).as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
             |                  * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
             |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
             |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin)),

    QueryDef("a26_coverage",
      // completeness over time: per (ticker, observed month), rows
      // present vs business days in the month — the data-freshness
      // audit behind w8's day-level anti-join, rolled to the grain a
      // dashboard reads. The calendar is a scan-local sequence
      // (bounded by month length); counts exact, one division → 6dp.
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
          .select(col("ticker"), trunc(col("date"), "month").as("month"))
        p.groupBy("ticker", "month")
          .agg(count(lit(1)).as("n_obs"))
          .withColumn("n_bdays",
            size(filter(sequence(col("month"), last_day(col("month"))),
              d => weekday(d) < 5)).cast("long"))
          .withColumn("coverage",
            round(col("n_obs").cast("double") / col("n_bdays").cast("double"), 6))
          .orderBy("ticker", "month")
      },
      Some(pricesSql +
        """, m AS (
          |  SELECT ticker, CAST(date_trunc('month', "date") AS DATE) AS month,
          |         count(*) AS n_obs
          |  FROM prices GROUP BY 1, 2),
          |bd AS (
          |  SELECT month,
          |         CAST(len(list_filter(
          |           generate_series(month, last_day(month), INTERVAL 1 DAY),
          |           d -> isodow(d) <= 5)) AS BIGINT) AS n_bdays
          |  FROM (SELECT DISTINCT month FROM m))
          |SELECT m.ticker, m.month, m.n_obs, bd.n_bdays,
          |  round(CAST(m.n_obs AS DOUBLE) / CAST(bd.n_bdays AS DOUBLE), 6) AS coverage
          |FROM m JOIN bd USING (month)
          |ORDER BY m.ticker, m.month""".stripMargin)),

    QueryDef("w33_drawdown_duration",
      // drawdown SPELLS per ticker (w10 gives depth; this gives
      // duration): a spell = a maximal run of days strictly below the
      // running peak. Gaps-and-islands on the below-peak flag —
      // all-integer, exact cross-engine replay, no rounding contract.
      (s, dir) => {
        val wCum = wTicker.rowsBetween(Window.unboundedPreceding, 0)
        prices(t(s, dir, "lineitem"))
          .withColumn("_peak", max(col("close")).over(wCum))
          .withColumn("_below", col("close") < col("_peak"))
          .withColumn("_grp",
            sum(when(col("_below"), 0L).otherwise(1L)).over(wCum))
          .filter(col("_below"))
          .groupBy("ticker", "_grp")
          .agg(count(lit(1)).as("_len"))
          .groupBy("ticker")
          .agg(count(lit(1)).as("n_spells"), max(col("_len")).as("max_len"))
          .orderBy("ticker")
      },
      Some(pricesSql +
        """, pk AS (
          |  SELECT ticker, "date", close,
          |    max(close) OVER w AS peak,
          |    CASE WHEN close < max(close) OVER w THEN 1 ELSE 0 END AS below
          |  FROM prices
          |  WINDOW w AS (PARTITION BY ticker ORDER BY "date"
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |gi AS (
          |  SELECT ticker, "date", below,
          |    SUM(CASE WHEN below = 1 THEN 0 ELSE 1 END)
          |      OVER (PARTITION BY ticker ORDER BY "date"
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
          |  FROM pk),
          |sp AS (
          |  SELECT ticker, grp, count(*) AS len
          |  FROM gi WHERE below = 1 GROUP BY 1, 2)
          |SELECT ticker, count(*) AS n_spells, max(len) AS max_len
          |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("a27_ks_drift",
      // exact two-sample Kolmogorov–Smirnov drift per ticker
      // ([[graft.ops.ValidationOps.ksTwoSample]]): 1995 close
      // distribution vs 1996. The sup |F_A − F_B| is found in
      // ALL-INTEGER arithmetic (max |cumA·m − cumB·n|) so both engines
      // agree on the attaining value; the single division rounds 6dp.
      (s, dir) => ValidationOps.ksTwoSample(
        prices(t(s, dir, "lineitem"))
          .filter(year(col("date")).isin(1995, 1996))
          .withColumn("_b", year(col("date")) === 1996),
        "ticker", "close", "_b"),
      Some(pricesSql +
        """, px AS (
          |  SELECT ticker, close AS v,
          |         (EXTRACT(year FROM "date") = 1996) AS b
          |  FROM prices WHERE EXTRACT(year FROM "date") IN (1995, 1996)),
          |pv AS (
          |  SELECT ticker, v,
          |    CAST(count(*) FILTER (WHERE NOT b) AS BIGINT) AS ca,
          |    CAST(count(*) FILTER (WHERE b) AS BIGINT) AS cb
          |  FROM px GROUP BY 1, 2),
          |cum AS (
          |  SELECT ticker, v,
          |    SUM(ca) OVER (PARTITION BY ticker ORDER BY v
          |                  ROWS UNBOUNDED PRECEDING) AS cuma,
          |    SUM(cb) OVER (PARTITION BY ticker ORDER BY v
          |                  ROWS UNBOUNDED PRECEDING) AS cumb
          |  FROM pv),
          |nn AS (
          |  SELECT ticker,
          |    CAST(count(*) FILTER (WHERE NOT b) AS BIGINT) AS n,
          |    CAST(count(*) FILTER (WHERE b) AS BIGINT) AS m
          |  FROM px GROUP BY 1 HAVING n > 0 AND m > 0)
          |SELECT ticker, n, m,
          |  CAST(max(abs(cuma * m - cumb * n)) AS BIGINT) AS d_num,
          |  round(CAST(max(abs(cuma * m - cumb * n)) AS DOUBLE)
          |        / CAST(n * m AS DOUBLE), 6) AS ks
          |FROM cum JOIN nn USING (ticker)
          |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin)),

    QueryDef("a28_chisq_independence",
      // chi-square independence + Cramér's V between order priority and
      // order status ([[graft.ops.ValidationOps.chiSquareIndependence]]):
      // exact-long contingency table and marginals, 6dp-rounded cell
      // terms summed in exact decimal (the t20 fit-sum contract), V
      // from the ROUNDED chi2 (the w30 rounded-z convention).
      (s, dir) => ValidationOps.chiSquareIndependence(
        t(s, dir, "orders"), "o_orderpriority", "o_orderstatus"),
      Some("""WITH cells AS (
             |  SELECT o_orderpriority AS a, o_orderstatus AS b,
             |         count(*) AS o
             |  FROM orders
             |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
             |  GROUP BY 1, 2),
             |ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
             |cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
             |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
             |               CAST(count(DISTINCT a) AS BIGINT) AS r,
             |               CAST(count(DISTINCT c2.b) AS BIGINT) AS c
             |        FROM cells c2),
             |grid AS (
             |  SELECT ra.a, cb.b, ra.ra, cb.cb, COALESCE(cells.o, 0) AS o
             |  FROM ra CROSS JOIN cb
             |  LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b),
             |term AS (
             |  SELECT n, r, c,
             |    round((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e,
             |          6) AS term
             |  FROM (SELECT o, n, r, c,
             |          CAST(ra * cb AS DOUBLE) / CAST(n AS DOUBLE) AS e
             |        FROM grid, tot))
             |SELECT n, (r - 1) * (c - 1) AS dof,
             |  CAST(SUM(CAST(term AS DECIMAL(24,6))) AS DOUBLE) AS chi2,
             |  round(sqrt(CAST(SUM(CAST(term AS DECIMAL(24,6))) AS DOUBLE)
             |             / CAST(n * least(r - 1, c - 1) AS DOUBLE)), 6)
             |    AS cramers_v
             |FROM term GROUP BY n, r, c""".stripMargin)),

    QueryDef("a29_weighted_median",
      // exact lower weighted median of close weighted by share volume
      // per ticker ([[graft.ops.ValidationOps.weightedMedian]]): the
      // 2·cumW ≥ totW crossing in exact integers — no float half-total.
      (s, dir) => ValidationOps.weightedMedian(
        prices(t(s, dir, "lineitem")), "ticker", "close", "volume"),
      Some(pricesSql +
        """, p2 AS (
          |  SELECT ticker, close AS v, CAST(volume AS BIGINT) AS w
          |  FROM prices
          |  WHERE close IS NOT NULL AND CAST(volume AS BIGINT) > 0),
          |pv AS (SELECT ticker, v, CAST(SUM(w) AS BIGINT) AS wv
          |       FROM p2 GROUP BY 1, 2),
          |cum AS (
          |  SELECT ticker, v,
          |    CAST(SUM(wv) OVER (PARTITION BY ticker ORDER BY v
          |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
          |  FROM pv),
          |tot AS (SELECT ticker, CAST(SUM(w) AS BIGINT) AS total_w
          |        FROM p2 GROUP BY 1)
          |SELECT ticker, total_w, min(v) AS wmedian
          |FROM cum JOIN tot USING (ticker)
          |WHERE cw * 2 >= total_w
          |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    QueryDef("mix2_domain_kl",
      // KL / Jensen-Shannon divergence between the train and valid
      // splits' SOURCE distributions — the mixture-drift audit a
      // sampling pass runs before trusting a carved split (a skewed
      // carve silently changes the training mixture). Splits are the
      // d5 md5 hash carve; fractions are Laplace-smoothed (+1 over the
      // observed source set, the a14 convention); each per-source term
      // rounds 6dp and the terms SUM IN EXACT DECIMAL (the t20 fit-sum
      // contract). One data-sized agg to a |sources|-sized table;
      // totals broadcast back.
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), col("source"),
          Sam.splitColumn(col("doc_id").cast("string"), pctTrain = 80,
            pctValid = 10, hash = D.md5Hash60).as("split"))
          .filter(col("split").isin("train", "valid"))
        val counts = d.groupBy("source")
          .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("ca"),
            sum(when(col("split") === "valid", 1L).otherwise(0L)).as("cb"))
        val tot = counts.agg(sum("ca").as("na"), sum("cb").as("nb"),
          count(lit(1)).as("k"))
        val terms = counts.crossJoin(broadcast(tot))
          .withColumn("p", (col("ca") + 1).cast("double")
            / (col("na") + col("k")).cast("double"))
          .withColumn("q", (col("cb") + 1).cast("double")
            / (col("nb") + col("k")).cast("double"))
          .withColumn("m", (col("p") + col("q")) / 2)
          .withColumn("t_pq",
            round(col("p") * log(col("p") / col("q")), 6).cast("decimal(24,6)"))
          .withColumn("t_qp",
            round(col("q") * log(col("q") / col("p")), 6).cast("decimal(24,6)"))
          .withColumn("t_js",
            round((col("p") * log(col("p") / col("m"))
              + col("q") * log(col("q") / col("m"))) / 2, 6)
              .cast("decimal(24,6)"))
        terms.groupBy(col("na").as("n_train"), col("nb").as("n_valid"),
            col("k").as("n_sources"))
          .agg(sum("t_pq").cast("double").as("kl_train_valid"),
            sum("t_qp").cast("double").as("kl_valid_train"),
            sum("t_js").cast("double").as("js"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id, source,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
             |  FROM documents),
             |d AS (
             |  SELECT source,
             |    CASE WHEN bucket < 80 THEN 'train'
             |         WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split
             |  FROM sp),
             |c AS (
             |  SELECT source,
             |    CAST(count(*) FILTER (WHERE split = 'train') AS BIGINT) AS ca,
             |    CAST(count(*) FILTER (WHERE split = 'valid') AS BIGINT) AS cb
             |  FROM d WHERE split IN ('train', 'valid') GROUP BY 1),
             |tt AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
             |              CAST(SUM(cb) AS BIGINT) AS nb,
             |              count(*) AS k FROM c),
             |pq AS (
             |  SELECT CAST(ca + 1 AS DOUBLE) / CAST(na + k AS DOUBLE) AS p,
             |         CAST(cb + 1 AS DOUBLE) / CAST(nb + k AS DOUBLE) AS q,
             |         na, nb, k
             |  FROM c, tt),
             |t2 AS (
             |  SELECT na, nb, k,
             |    CAST(round(p * ln(p / q), 6) AS DECIMAL(24,6)) AS t_pq,
             |    CAST(round(q * ln(q / p), 6) AS DECIMAL(24,6)) AS t_qp,
             |    CAST(round((p * ln(p / ((p + q) / 2))
             |                + q * ln(q / ((p + q) / 2))) / 2, 6)
             |         AS DECIMAL(24,6)) AS t_js
             |  FROM pq)
             |SELECT na AS n_train, nb AS n_valid, k AS n_sources,
             |  CAST(SUM(t_pq) AS DOUBLE) AS kl_train_valid,
             |  CAST(SUM(t_qp) AS DOUBLE) AS kl_valid_train,
             |  CAST(SUM(t_js) AS DOUBLE) AS js
             |FROM t2 GROUP BY 1, 2, 3""".stripMargin)),

    QueryDef("e16_conversion_latency",
      // first-view → first-subsequent-purchase latency distribution by
      // weekday of the first view: the product-analytics companion to
      // the e9/e11 funnels (they count conversions; this measures HOW
      // LONG). Latencies are exact integer SECONDS (a µs difference
      // `div` 10⁶ — µs magnitudes would push the 6dp round past
      // double's exact-multiply range and the engines would disagree
      // in the 11th significant digit); p50/p90 are the
      // exact-interpolation percentile (w19 contract); the mean
      // divides an exact long sum once. Per-user mins are one hash agg
      // each; the join shuffles purchases once on user_id.
      (s, dir) => {
        val e = events(s, dir)
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("tv"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("tp"))
        val conv = v.join(p, Seq("user_id"))
          .filter(col("tp") >= col("tv"))
          .groupBy(col("user_id"), col("tv")).agg(min(col("tp")).as("tp"))
          .withColumn("lat_s",
            expr("(unix_micros(tp) - unix_micros(tv)) div 1000000L"))
        conv.groupBy(weekday(col("tv")).as("dow"))
          .agg(count(lit(1)).as("n_converted"),
            round(expr("percentile(lat_s, 0.5D)"), 6).as("p50_s"),
            round(expr("percentile(lat_s, 0.9D)"), 6).as("p90_s"),
            round(sum("lat_s").cast("double") / count(lit(1)).cast("double"), 6)
              .as("mean_s"))
          .orderBy("dow")
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS tv FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (
             |  SELECT e.user_id, v.tv, min(e.ts) AS tp
             |  FROM events e JOIN v USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts >= v.tv
             |  GROUP BY 1, 2),
             |l AS (
             |  SELECT CAST(isodow(tv) - 1 AS INTEGER) AS dow,
             |         date_diff('microsecond', tv, tp) // 1000000 AS lat_s
             |  FROM c)
             |SELECT dow, count(*) AS n_converted,
             |  round(quantile_cont(lat_s, 0.5), 6) AS p50_s,
             |  round(quantile_cont(lat_s, 0.9), 6) AS p90_s,
             |  round(CAST(SUM(lat_s) AS DOUBLE) / count(*), 6) AS mean_s
             |FROM l GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("w34_spearman",
      // Spearman rank correlation of close vs volume per ticker
      // ([[graft.ops.FeatureOps.spearmanCorr]]): average ranks built
      // from exact integers ((rank_min + rank_max)/2 — the RANGE-framed
      // count gives rank_max), so the rank vectors are bit-identical
      // cross-engine; corr rounds 6dp (a12 convention). All four
      // windows share the ticker exchange.
      (s, dir) => FeatureOps.spearmanCorr(
        prices(t(s, dir, "lineitem")), "ticker", "close", "volume"),
      Some(pricesSql +
        """, rk AS (
          |  SELECT ticker,
          |    (rank() OVER wc + count(*) OVER wcr) / 2.0 AS rx,
          |    (rank() OVER wv + count(*) OVER wvr) / 2.0 AS ry
          |  FROM prices
          |  WINDOW
          |    wc AS (PARTITION BY ticker ORDER BY close),
          |    wcr AS (PARTITION BY ticker ORDER BY close
          |            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          |    wv AS (PARTITION BY ticker ORDER BY volume),
          |    wvr AS (PARTITION BY ticker ORDER BY volume
          |            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |SELECT ticker, count(*) AS n, round(corr(rx, ry), 6) AS spearman
          |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("w35_lead_lag",
      // lead–lag cross-correlation of daily returns for the first five
      // tickers at |k| ≤ 3 observations ([[graft.ops.FeatureOps
      // .leadLagCorr]]): one lag window per k on a single ticker
      // exchange, scan-local 7-way stack, date equi-join, co-moments
      // reduce to pairs × lags rows; corr rounds 6dp (a12 convention).
      (s, dir) => FeatureOps.leadLagCorr(
        pricesWithRet(s, dir).filter(col("ticker") < 5 && col("ret").isNotNull)
          .select(col("ticker"), col("date"), col("ret")),
        "ticker", "date", "ret", maxLag = 3),
      Some {
        val arms = (-3 to 3).map(k =>
          s"""SELECT ticker AS tb, "date", $k AS k,
             |  lag(ret, $k) OVER (PARTITION BY ticker ORDER BY "date") AS vb
             |FROM rr""".stripMargin).mkString("\nUNION ALL\n")
        pricesSql + retSql +
          s""", rr AS (
             |  SELECT ticker, "date", ret FROM r
             |  WHERE ret IS NOT NULL AND ticker < 5),
             |un AS (
             |$arms)
             |SELECT a.ticker AS ta, un.tb, un.k, count(*) AS n,
             |  round(corr(a.ret, un.vb), 6) AS xcorr
             |FROM rr a JOIN un ON a."date" = un."date" AND a.ticker < un.tb
             |WHERE un.vb IS NOT NULL
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
      }),

    QueryDef("ivm2_incremental_join",
      // incremental JOIN-view maintenance ([[graft.warehouse
      // .IncrementalJoin]]): the orders⋈customer view is maintained as
      // V_old ∪ (ΔR⋈S_old) ∪ (R_old⋈ΔS) ∪ (ΔR⋈ΔS) — orders split at a
      // date cut, customers at an even/odd "signup wave" — and the
      // oracle RECOMPUTES the full join from scratch, so a hash match
      // proves the Griffin–Libkin insert-only delta algebra end to
      // end. Every delta term broadcasts its delta side; V_old and the
      // history tables are never re-shuffled. Revenue sums in exact
      // decimal (money2).
      (s, dir) => {
        import graft.warehouse.IncrementalJoin
        val cut = lit("1998-01-01").cast("timestamp")
        val o = t(s, dir, "orders").select(
          col("o_custkey").as("custkey"), col("o_orderdate"),
          col("o_totalprice").cast("decimal(12,2)").as("_price"))
        val rOld = o.filter(col("o_orderdate") < cut)
        val rDelta = o.filter(col("o_orderdate") >= cut)
        val c = t(s, dir, "customer").select(
          col("c_custkey").as("custkey"), col("c_nationkey"))
        val sOld = c.filter(col("custkey") % 2 === 0)
        val sDelta = c.filter(col("custkey") % 2 === 1)
        val viewOld = rOld.join(sOld, Seq("custkey"))
        IncrementalJoin.maintain(viewOld, rOld, rDelta, sOld, sDelta,
            Seq("custkey"))
          .groupBy(col("c_nationkey").as("nation"))
          .agg(count(lit(1)).as("n_orders"),
            money2(sum(col("_price"))).as("revenue"))
          .orderBy("nation")
      },
      Some("""SELECT c.c_nationkey AS nation, count(*) AS n_orders,
             |  CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2)
             |       AS DOUBLE) AS revenue
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("r6_mmr_rerank",
      // MMR diversified reranking ([[graft.functions.RelevanceFunctions
      // .mmrRerank]], λ=0.7): 4 picks from each query's top-10 cosine
      // candidates, greedy λ·rel − (1−λ)·max-sim-to-selected in EXACT
      // DECIMAL (λ scale 3, rel/sims scale 6 → scale-9 scores, no
      // rounding step to straddle). The oracle unrolls the four greedy
      // steps as chained CTEs and derives every pick itself.
      (s, dir) => R.mmrRerank(
        t(s, dir, "embeddings"),
        t(s, dir, "embeddings").filter(col("vec_id") < 4)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec")),
        topR = 10, k = 4, lambda = 0.7),
      Some {
        val steps = (1 to 4).map { i =>
          val prev = s"sel${i - 1}"
          s"""pick$i AS MATERIALIZED (
             |  SELECT query_id, vec_id, v, rel, mmr FROM (
             |    SELECT c.query_id, c.vec_id, c.v, c.rel,
             |      CAST(CAST(0.700 AS DECIMAL(4,3)) * CAST(c.rel AS DECIMAL(10,6))
             |           - CAST(0.300 AS DECIMAL(4,3)) * coalesce(
             |        (SELECT max(CAST(round(list_cosine_similarity(c.v, s.v), 6)
             |                         AS DECIMAL(10,6)))
             |         FROM $prev s WHERE s.query_id = c.query_id),
             |        CAST(0 AS DECIMAL(10,6))) AS DOUBLE) AS mmr
             |    FROM cand c
             |    WHERE NOT EXISTS (SELECT 1 FROM $prev s
             |      WHERE s.query_id = c.query_id AND s.vec_id = c.vec_id))
             |  QUALIFY row_number() OVER (PARTITION BY query_id
             |                             ORDER BY mmr DESC, vec_id) = 1),
             |sel$i AS MATERIALIZED (
             |  SELECT * FROM sel${i - 1} UNION ALL
             |  SELECT query_id, vec_id, v, rel, mmr, $i AS rank
             |  FROM pick$i)""".stripMargin
        }.mkString(",\n")
        s"""WITH q AS (
           |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           |  FROM embeddings WHERE vec_id < 4),
           |cand AS MATERIALIZED (
           |  SELECT * FROM (
           |    SELECT q.query_id, e.vec_id,
           |      CAST(e.embedding AS DOUBLE[]) AS v,
           |      round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
           |                                   q.qv), 6) AS rel
           |    FROM embeddings e, q WHERE e.vec_id <> q.query_id)
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |                             ORDER BY rel DESC, vec_id) <= 10),
           |sel0 AS (SELECT query_id, vec_id, v, rel,
           |           CAST(0.0 AS DOUBLE) AS mmr, 0 AS rank
           |         FROM cand WHERE false),
           |$steps
           |SELECT query_id, rank, vec_id, rel, mmr FROM sel4
           |ORDER BY query_id, rank""".stripMargin
      }),

    QueryDef("d28_density_clusters",
      // DBSCAN over the embedding ε-graph ([[graft.functions
      // .SimilarityFunctions.densityClusters]], ε = cos ≥ 0.35,
      // minPts = 2): banded hyperplane-LSH pairs feed degree → core →
      // star-contraction components over CORE–CORE edges only; border
      // points attach to the MIN neighboring cluster id (the
      // order-invariant fixup of textbook DBSCAN's scan-order tie).
      // The oracle replays signatures, banding, verification, degrees,
      // the recursive closure, and the border attach end to end.
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        val pairs = S.lshNeighborPairs(emb, dim = 64, nBits = 16,
          bands = 4, minCosine = 0.35)
        S.densityClusters(pairs, minPts = 2)
          .groupBy(col("cluster_id"))
          .agg(sum(when(col("role") === "core", 1L).otherwise(0L)).as("n_core"),
            sum(when(col("role") === "border", 1L).otherwise(0L)).as("n_border"),
            max(col("id")).as("max_id"))
          .orderBy("cluster_id")
      },
      Some(
        s"""WITH RECURSIVE corpus AS (
           |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings),
           |pl AS (SELECT $planes64x16Sql AS planes),
           |sig AS (
           |  SELECT id, v,
           |    CAST(list_aggregate(list_transform(generate_series(0, 15), i ->
           |      CASE WHEN list_dot_product(v, planes[i+1]) >= 0
           |           THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END),
           |      'sum') AS BIGINT) AS sig
           |  FROM corpus, pl),
           |banded AS (
           |  SELECT id, b, (sig >> (b*4)) & 15 AS key
           |  FROM sig, UNNEST([0,1,2,3]) AS t(b)),
           |cands AS (
           |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
           |  FROM banded x JOIN banded y ON x.b = y.b AND x.key = y.key
           |  WHERE x.id < y.id),
           |verified AS MATERIALIZED (
           |  SELECT c.id_a, c.id_b
           |  FROM cands c JOIN sig a ON a.id = c.id_a
           |                JOIN sig b ON b.id = c.id_b
           |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35),
           |edges AS MATERIALIZED (
           |  SELECT id_a AS src, id_b AS dst FROM verified
           |  UNION ALL SELECT id_b, id_a FROM verified),
           |core AS MATERIALIZED (
           |  SELECT src AS id FROM edges GROUP BY 1 HAVING count(*) >= 2),
           |cedges AS MATERIALIZED (
           |  SELECT v.id_a, v.id_b FROM verified v
           |  JOIN core a ON v.id_a = a.id JOIN core b ON v.id_b = b.id),
           |csym AS (SELECT id_a AS src, id_b AS dst FROM cedges
           |         UNION SELECT id_b, id_a FROM cedges),
           |reach(id, r) AS (
           |  SELECT src, src FROM csym
           |  UNION
           |  SELECT reach.id, e.dst FROM reach JOIN csym e ON reach.r = e.src),
           |cc0 AS MATERIALIZED (
           |  SELECT id, min(r) AS component FROM reach GROUP BY 1),
           |cc AS MATERIALIZED (
           |  SELECT * FROM cc0
           |  UNION ALL
           |  SELECT id, id FROM core WHERE id NOT IN (SELECT id FROM cc0)),
           |border AS (
           |  SELECT e.src AS id, min(cc.component) AS component
           |  FROM edges e JOIN cc ON e.dst = cc.id
           |  WHERE e.src NOT IN (SELECT id FROM core)
           |  GROUP BY 1)
           |SELECT component AS cluster_id,
           |  CAST(count(*) FILTER (WHERE role = 'core') AS BIGINT) AS n_core,
           |  CAST(count(*) FILTER (WHERE role = 'border') AS BIGINT) AS n_border,
           |  max(id) AS max_id
           |FROM (SELECT id, component, 'core' AS role FROM cc
           |      UNION ALL SELECT id, component, 'border' FROM border)
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("pca1_power_iteration",
      // dominant principal direction of the embedding corpus
      // ([[graft.functions.SimilarityFunctions.topPrincipalComponent]],
      // 3 power-iteration rounds on XᵀX from e₀): per-row dots are
      // scan-local 6dp folds, the matvec accumulates 6dp terms in
      // EXACT DECIMAL onto 64 keys, normalization replays driver-side
      // with an ascending-dim square-sum fold. The oracle unrolls the
      // three rounds as chained array CTEs.
      (s, dir) => S.topPrincipalComponent(
        t(s, dir, "embeddings"), "embedding", dim = 64, iters = 3),
      Some {
        val rounds = (1 to 3).map { r =>
          s"""sc$r AS MATERIALIZED (
             |  SELECT x,
             |    round(list_dot_product(x, (SELECT v FROM v${r - 1})), 6) AS s
             |  FROM emb),
             |w$r AS MATERIALIZED (
             |  SELECT d,
             |    CAST(SUM(CAST(round(x[d] * s, 6) AS DECIMAL(24,6)))
             |         AS DOUBLE) AS w
             |  FROM sc$r, generate_series(1, 64) AS g(d)
             |  GROUP BY 1),
             |n$r AS (
             |  SELECT sqrt(list_aggregate(
             |    list_transform(list(w ORDER BY d), y -> y * y), 'sum')) AS nrm
             |  FROM w$r),
             |v$r AS MATERIALIZED (
             |  SELECT list(round(w / (SELECT nrm FROM n$r), 6) ORDER BY d) AS v
             |  FROM w$r)""".stripMargin
        }.mkString(",\n")
        s"""WITH emb AS (
           |  SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings
           |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
           |v0 AS (
           |  SELECT list_transform(generate_series(1, 64),
           |    i -> CAST(CASE WHEN i = 1 THEN 1 ELSE 0 END AS DOUBLE)) AS v),
           |$rounds
           |SELECT CAST(d - 1 AS INTEGER) AS d,
           |  round(w / (SELECT nrm FROM n3), 6) AS loading,
           |  round((SELECT nrm FROM n3), 6) AS sigma
           |FROM w3 ORDER BY d""".stripMargin
      }),

    QueryDef("e17_kaplan_meier",
      // Kaplan–Meier conversion-survival curves by weekday of first
      // view ([[graft.ops.EventAnalyticsOps.kaplanMeier]]): lifetimes
      // are first-view → first-subsequent-purchase in exact integer
      // seconds (the e16 contract), right-censored at the global max
      // event time for users who never purchased. Factors close by
      // IEEE floor-truncation at 8dp, the running product lives in
      // decimal(20,8) (the w31 recursion discipline), and the oracle's
      // recursive CTE replays every curve step bit-for-bit.
      (s, dir) => {
        val e = events(s, dir)
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("tv"))
        val firstP = v.join(
            e.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts").as("_tp")), Seq("user_id"))
          .filter(col("_tp") >= col("tv"))
          .groupBy("user_id").agg(min(col("_tp")).as("tp"))
        val mx = e.agg(max(col("ts")).as("_mx"))
        val lt = v.join(firstP, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(weekday(col("tv")).as("dow"),
            expr("(unix_micros(coalesce(tp, _mx)) - unix_micros(tv))" +
              " div 1000000L").as("dur"),
            col("tp").isNotNull.as("ev"))
        EventAnalyticsOps.kaplanMeier(lt, "dow", "dur", "ev")
      },
      Some("""WITH RECURSIVE v AS (
             |  SELECT user_id, min(ts) AS tv FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |fp AS (
             |  SELECT e.user_id, min(e.ts) AS tp
             |  FROM events e JOIN v USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts >= v.tv
             |  GROUP BY 1),
             |mx AS (SELECT max(ts) AS m FROM events),
             |lt AS (
             |  SELECT CAST(isodow(tv) - 1 AS INTEGER) AS g,
             |    date_diff('microsecond', tv,
             |              coalesce(tp, (SELECT m FROM mx))) // 1000000 AS t,
             |    (tp IS NOT NULL) AS e
             |  FROM v LEFT JOIN fp USING (user_id)),
             |pt AS (
             |  SELECT g, t,
             |    CAST(count(*) FILTER (WHERE e) AS BIGINT) AS d,
             |    CAST(count(*) FILTER (WHERE NOT e) AS BIGINT) AS c
             |  FROM lt GROUP BY 1, 2),
             |n0 AS (SELECT g, count(*) AS n0 FROM lt GROUP BY 1),
             |st0 AS (
             |  SELECT pt.g, pt.t, pt.d,
             |    n0.n0 - (SUM(pt.d + pt.c) OVER (PARTITION BY pt.g
             |      ORDER BY pt.t ROWS UNBOUNDED PRECEDING) - pt.d - pt.c) AS n
             |  FROM pt JOIN n0 USING (g)),
             |steps AS MATERIALIZED (
             |  SELECT g, t, d, CAST(n AS BIGINT) AS n,
             |    CAST(row_number() OVER (PARTITION BY g ORDER BY t)
             |         AS BIGINT) AS idx
             |  FROM st0 WHERE d > 0),
             |km(g, idx, t, d, n, s) AS (
             |  SELECT g, idx, t, d, n,
             |    CAST(round(CAST(1 AS DECIMAL(20,8)) *
             |      CAST(floor(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)
             |                 * 100000000.0) / 100000000.0
             |           AS DECIMAL(10,8)), 8) AS DECIMAL(20,8))
             |  FROM steps WHERE idx = 1
             |  UNION ALL
             |  SELECT st.g, st.idx, st.t, st.d, st.n,
             |    CAST(round(km.s *
             |      CAST(floor(CAST(st.n - st.d AS DOUBLE)
             |                 / CAST(st.n AS DOUBLE) * 100000000.0)
             |           / 100000000.0 AS DECIMAL(10,8)), 8) AS DECIMAL(20,8))
             |  FROM km JOIN steps st ON st.g = km.g AND st.idx = km.idx + 1)
             |SELECT g AS dow, t, n AS n_at_risk, d,
             |  CAST(s AS DOUBLE) AS survival
             |FROM km ORDER BY dow, t""".stripMargin)),

    QueryDef("eval5_isotonic",
      // isotonic calibration of the cls1 scores ([[graft.functions
      // .ClassifierFunctions.isotonicCalibration]]): the best MONOTONE
      // bin→rate map via the exact minimax characterization
      // ŷ_k = max_{i≤k} min_{j≥k} avg(i..j) — purely relational (no
      // PAVA fold), every interval average one IEEE division of exact
      // longs, so both engines pick identical extrema. Same score
      // deciles and labels as eval3's reliability diagram.
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        Cls.isotonicCalibration(scored.join(lab, "doc_id"),
          "score", "_y", bins = 10)
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |bk AS (
          |  SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bucket,
          |    CAST(SUM(y) AS BIGINT) AS sy, count(*) AS n
          |  FROM scored GROUP BY 1),
          |pref AS (
          |  SELECT bucket, sy, n,
          |    CAST(row_number() OVER (ORDER BY bucket) AS BIGINT) AS r,
          |    CAST(SUM(sy) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
          |         AS BIGINT) AS s,
          |    CAST(SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
          |         AS BIGINT) AS nn
          |  FROM bk),
          |bounds AS (SELECT r, s, nn FROM pref
          |           UNION ALL SELECT 0, 0, 0),
          |avgs AS (
          |  SELECT b0.r + 1 AS i, pj.r AS j,
          |    CAST(pj.s - b0.s AS DOUBLE) / CAST(pj.nn - b0.nn AS DOUBLE) AS a
          |  FROM bounds b0 JOIN pref pj ON pj.r > b0.r),
          |inn AS (
          |  SELECT k.r AS k, avgs.i, min(avgs.a) AS ia
          |  FROM pref k JOIN avgs ON avgs.i <= k.r AND avgs.j >= k.r
          |  GROUP BY 1, 2),
          |iso AS (SELECT k, max(ia) AS iso FROM inn GROUP BY 1)
          |SELECT p.bucket, p.n,
          |  round(CAST(p.sy AS DOUBLE) / p.n, 6) AS raw_rate,
          |  round(iso.iso, 6) AS iso_rate
          |FROM pref p JOIN iso ON iso.k = p.r ORDER BY p.bucket""".stripMargin)),

    QueryDef("t22_sttr",
      // segmental type-token ratio ([[graft.functions.TextFunctions
      // .sttr]], 25-token segments): lexical diversity that doesn't
      // collapse with length — the template-spam signal token-count
      // gates miss. Entirely scan-local (no explode, no shuffle);
      // Σ segment distinct counts are exact ints, ONE division, 6dp.
      (s, dir) => docs(s, dir).select(col("doc_id"),
          T.tokenCount(col("text")).as("n_tokens"),
          T.sttr(col("text"), window = 25).as("sttr"))
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, text,
             |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |                t -> length(t) > 0) AS toks
             |  FROM documents),
             |b AS (
             |  SELECT doc_id, text,
             |    CASE WHEN length(trim(text)) = 0 THEN 0
             |         ELSE len(regexp_split_to_array(trim(text), '\s+'))
             |    END AS n_tokens,
             |    toks, len(toks) AS n
             |  FROM tk)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CASE WHEN text IS NULL OR n = 0 THEN NULL
             |       WHEN n < 25 THEN
             |         round(CAST(len(list_distinct(toks)) AS DOUBLE) / n, 6)
             |       ELSE round(CAST(list_aggregate(
             |           list_transform(generate_series(0, n // 25 - 1),
             |             i -> len(list_distinct(toks[i*25+1 : i*25+25]))),
             |           'sum') AS DOUBLE) / ((n // 25) * 25), 6)
             |  END AS sttr
             |FROM b ORDER BY doc_id""".stripMargin)),

    QueryDef("w36_cross_rank",
      // cross-sectional momentum quintiles — the OTHER partition axis
      // (by DATE, not ticker): each day ranks tickers by return into
      // ntile(5) buckets (deterministic ticker tiebreak), and each
      // bucket reports its mean NEXT-observation return — the
      // factor-portfolio diagnostic ("do today's winners win
      // tomorrow?"). Returns round 6dp per row and SUM IN EXACT
      // DECIMAL per bucket (merge-order-proof), one division each.
      // Two exchanges are inherent: one ticker-partitioned (the
      // forward shift), one date-partitioned (the ranking).
      (s, dir) => {
        val withFwd = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .withColumn("fwd", lead(col("ret"), 1).over(wTicker))
          .filter(col("fwd").isNotNull)
        val wD = Window.partitionBy("date")
          .orderBy(col("ret").desc, col("ticker"))
        withFwd.withColumn("q", ntile(5).over(wD))
          .groupBy("q")
          .agg(count(lit(1)).as("n"),
            round(sum(round(col("ret"), 6).cast("decimal(16,6)"))
              .cast("double") / count(lit(1)).cast("double"), 6).as("mean_ret"),
            round(sum(round(col("fwd"), 6).cast("decimal(16,6)"))
              .cast("double") / count(lit(1)).cast("double"), 6).as("mean_fwd"))
          .orderBy("q")
      },
      Some(pricesSql + retSql +
        """, f AS (
          |  SELECT ticker, "date", ret,
          |    lead(ret) OVER (PARTITION BY ticker ORDER BY "date") AS fwd
          |  FROM r WHERE ret IS NOT NULL),
          |qq AS (
          |  SELECT ret, fwd,
          |    CAST(ntile(5) OVER (PARTITION BY "date"
          |                        ORDER BY ret DESC, ticker) AS INTEGER) AS q
          |  FROM f WHERE fwd IS NOT NULL)
          |SELECT q, count(*) AS n,
          |  round(CAST(SUM(CAST(round(ret, 6) AS DECIMAL(16,6))) AS DOUBLE)
          |        / count(*), 6) AS mean_ret,
          |  round(CAST(SUM(CAST(round(fwd, 6) AS DECIMAL(16,6))) AS DOUBLE)
          |        / count(*), 6) AS mean_fwd
          |FROM qq GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("a30_expectations",
      // declarative data-quality expectation suite ([[graft.ops
      // .ValidationOps.expectations]]): six constraints over lineitem —
      // the row-local ones (not_null / two in_range / matches) FUSE
      // into one scan; unique adds one keys-sized agg; ref_in one
      // broadcast anti-join against orders. The tight l_discount range
      // plants real violations so pass AND fail paths are exercised.
      (s, dir) => {
        import graft.ops.ValidationOps._
        expectations(t(s, dir, "lineitem"), Seq(
          ExpectNotNull("l_returnflag"),
          ExpectInRange("l_quantity", 1, 50),
          ExpectInRange("l_discount", 0, 0.08),
          ExpectMatches("l_linestatus", "[A-Z]+"),
          ExpectUnique(Seq("l_orderkey", "l_linenumber")),
          ExpectRefIn("l_orderkey", t(s, dir, "orders"), "o_orderkey")))
      },
      Some("""WITH v AS (
             |  SELECT 'not_null' AS expectation, 'l_returnflag' AS "column",
             |    CAST(count(*) FILTER (WHERE l_returnflag IS NULL) AS BIGINT)
             |      AS n_violations
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'in_range', 'l_quantity',
             |    CAST(count(*) FILTER (WHERE l_quantity IS NOT NULL
             |      AND NOT (l_quantity BETWEEN 1 AND 50)) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'in_range', 'l_discount',
             |    CAST(count(*) FILTER (WHERE l_discount IS NOT NULL
             |      AND NOT (l_discount BETWEEN 0 AND 0.08)) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'matches', 'l_linestatus',
             |    CAST(count(*) FILTER (WHERE l_linestatus IS NOT NULL
             |      AND NOT regexp_full_match(l_linestatus, '[A-Z]+')) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'unique', 'l_orderkey,l_linenumber',
             |    CAST(coalesce(SUM(c), 0) AS BIGINT)
             |  FROM (SELECT count(*) AS c FROM lineitem
             |        GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
             |  UNION ALL
             |  SELECT 'ref_in', 'l_orderkey', CAST(count(*) AS BIGINT)
             |  FROM lineitem
             |  WHERE l_orderkey IS NOT NULL
             |    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
             |SELECT expectation, "column", n_violations,
             |  n_violations = 0 AS passed
             |FROM v ORDER BY expectation, "column"""".stripMargin)),

    QueryDef("e18_rate_limit",
      // per-user token-bucket rate limiting ([[graft.streaming
      // .EventStreams.rateLimit]], capacity 3, 1 token/s) run in batch
      // mode: ALL-INTEGER millitoken state (refill = Δµs·rate/1000
      // integer division, bucket starts full), so the recursive-CTE
      // oracle replays every verdict bit-for-bit. The same function is
      // the streaming stateful op (flatMapGroupsWithState) — spec pins
      // stream/batch parity.
      (s, dir) => graft.streaming.EventStreams
        .rateLimit(events(s, dir), capacity = 3, tokensPerSec = 1)
        .orderBy("user_id", "ts_us", "event_id"),
      Some("""WITH RECURSIVE ev AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us,
             |    CAST(row_number() OVER (PARTITION BY user_id
             |                            ORDER BY ts, event_id)
             |         AS BIGINT) AS idx
             |  FROM events),
             |rl(user_id, idx, event_id, us, tok, allowed) AS (
             |  SELECT user_id, idx, event_id, us,
             |    CAST(2000 AS BIGINT), true
             |  FROM ev WHERE idx = 1
             |  UNION ALL
             |  SELECT user_id, idx, event_id, us,
             |    CASE WHEN ref >= 1000 THEN ref - 1000 ELSE ref END,
             |    ref >= 1000
             |  FROM (
             |    SELECT e.user_id, e.idx, e.event_id, e.us,
             |      least(CAST(3000 AS BIGINT),
             |        rl.tok + CASE WHEN e.us > rl.us
             |                      THEN (e.us - rl.us) * 1 // 1000
             |                      ELSE 0 END) AS ref
             |    FROM rl JOIN ev e
             |      ON e.user_id = rl.user_id AND e.idx = rl.idx + 1))
             |SELECT user_id, event_id, us AS ts_us, allowed
             |FROM rl ORDER BY user_id, ts_us, event_id""".stripMargin)),

    QueryDef("c12_classifier_gated_clean",
      // the quality-classifier tier COMPOSED into the corpus pipeline
      // (the RefinedWeb/LLaMA shape: model gate between rule filters
      // and dedup): cls1's NB scores gate the corpus at its own MEDIAN
      // (exact-interpolation percentile — a fixed τ can't track the
      // score drift across SFs), and the survivors run the full c3
      // text chain (gates → PII scrub → exact dedup → md5-form
      // MinHash-LSH). The oracle stitches the
      // already-hash-matched cls1 scoring CTEs in front of the c3
      // chain re-rooted at the gated table — every tier's SQL is the
      // one its standalone query verified.
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val med = scored.agg(expr("percentile(score, 0.5D)").as("_tau"))
        val kept = d.join(scored, Seq("doc_id")).crossJoin(broadcast(med))
          .filter(col("score") >= col("_tau"))
          .select(col("doc_id"), col("text"))
        val cfg = graft.corpus.CorpusConfig(
          minTokens = 20, minQuality = 50.0, maxDupBigramFrac = 0.3,
          numHashes = 16, bands = 4, nearDupThreshold = 0.7,
          minhashHash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          minhashBucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))))
        graft.corpus.CorpusPipeline.clean(kept, "doc_id", "text", cfg)
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |clsgated AS (
          |  SELECT d.doc_id, d.text
          |  FROM documents d JOIN scored USING (doc_id)
          |  WHERE scored.score >= (SELECT quantile_cont(score, 0.5)
          |                         FROM scored)),
          |""".stripMargin +
        corpusTextCtesFrom("clsgated") +
        """
          |SELECT e.doc_id, md5(e.text) AS text_md5
          |FROM exact e WHERE e.doc_id NOT IN (SELECT id_b FROM doomed)
          |ORDER BY doc_id""".stripMargin)),

    QueryDef("a31_risk_ratios",
      // the full risk-adjusted-return panel per ticker: Sharpe (a13's
      // form), Sortino (downside deviation: √(Σ min(ret,0)²/n), MAR=0),
      // max drawdown (the w10 running-peak shape) and Calmar
      // (arithmetic-annualized mean return over MDD). One window pass
      // for the peak + one fused aggregation; every ratio is a float
      // chain rounded 6dp with explicit zero-denominator guards
      // (double/0 is null in Spark, inf in DuckDB — the a13 lesson).
      (s, dir) => {
        val wCum = wTicker.rowsBetween(Window.unboundedPreceding, 0)
        val r = pricesWithRet(s, dir)
          .withColumn("_peak", max(col("close")).over(wCum))
          .withColumn("_dd", (col("_peak") - col("close")) / col("_peak"))
          .filter(col("ret").isNotNull)
        val dvar = sum(col("ret") * col("ret") *
          when(col("ret") < 0, 1.0).otherwise(0.0)) / count(col("ret"))
        r.groupBy("ticker")
          .agg(count(col("ret")).as("n_days"),
            round(when(stddev_samp(col("ret")) === 0.0, lit(null))
              .otherwise(avg(col("ret")) / stddev_samp(col("ret")) *
                lit(math.sqrt(252.0))), 6).as("sharpe"),
            round(when(sqrt(dvar) === 0.0, lit(null))
              .otherwise(avg(col("ret")) / sqrt(dvar) *
                lit(math.sqrt(252.0))), 6).as("sortino"),
            round(max(col("_dd")), 6).as("mdd"),
            round(when(max(col("_dd")) === 0.0, lit(null))
              .otherwise(avg(col("ret")) * lit(252.0) / max(col("_dd"))), 6)
              .as("calmar"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, d AS (
          |  SELECT ticker, ret,
          |    (peak - close) / peak AS dd
          |  FROM (SELECT ticker, close, ret,
          |          max(close) OVER (PARTITION BY ticker ORDER BY "date"
          |            ROWS UNBOUNDED PRECEDING) AS peak
          |        FROM r)
          |  WHERE ret IS NOT NULL)
          |SELECT ticker, count(ret) AS n_days,
          |  round(CASE WHEN stddev_samp(ret) = 0.0 THEN NULL
          |             ELSE avg(ret) / stddev_samp(ret) * sqrt(252.0)
          |        END, 6) AS sharpe,
          |  round(CASE WHEN sqrt(SUM(ret * ret * CASE WHEN ret < 0 THEN 1.0
          |                                            ELSE 0.0 END)
          |                       / count(ret)) = 0.0 THEN NULL
          |             ELSE avg(ret) / sqrt(SUM(ret * ret *
          |                    CASE WHEN ret < 0 THEN 1.0 ELSE 0.0 END)
          |                    / count(ret)) * sqrt(252.0)
          |        END, 6) AS sortino,
          |  round(max(dd), 6) AS mdd,
          |  round(CASE WHEN max(dd) = 0.0 THEN NULL
          |             ELSE avg(ret) * 252.0 / max(dd) END, 6) AS calmar
          |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("d29_lsh_recall",
      // recall audit of the MinHash-LSH dedup tier against the
      // COMPLETE answer (s7's dedup twin): truth = the lossless
      // prefix-filtered exact Jaccard pairs (d26's operator at 0.7),
      // prediction = the banded m1b pipeline at the same threshold.
      // LSH verifies TRUE Jaccard on its candidates, so pred ⊆ truth
      // and precision is 1 by construction — the number that needs
      // watching is RECALL (pairs whose bands never collided). All
      // counts exact longs; one small-denominator division.
      (s, dir) => {
        val truth = D.prefixJaccardPairs(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.7).select("id_a", "id_b")
        val pred = D.minhashLshPairs(docs(s, dir), "doc_id", "text",
          n = 3, numHashes = 16, bands = 4, threshold = 0.7,
          hash = (c, i) => D.md5Hash60(concat(c, lit("#"), lit(i))),
          bucketHash = (c, b) => D.md5Hash60(concat(c, lit("#b#"), lit(b))))
          .select("id_a", "id_b")
        val nT = truth.agg(count(lit(1)).as("n_truth"))
        val nP = pred.agg(count(lit(1)).as("n_pred"))
        val nM = truth.join(pred, Seq("id_a", "id_b"), "left_anti")
          .agg(count(lit(1)).as("n_missed"))
        nT.crossJoin(nP).crossJoin(nM)
          .select(col("n_truth"), col("n_pred"), col("n_missed"),
            when(col("n_truth") === 0, lit(null)).otherwise(
              round((col("n_truth") - col("n_missed")).cast("double")
                / col("n_truth").cast("double"), 6)).as("recall"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |e AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sgl FROM sh),
             |dfc AS (SELECT sgl, count(*) AS df FROM e GROUP BY 1),
             |rk AS (
             |  SELECT e.doc_id, e.n_sh, e.sgl,
             |         row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.sgl) AS rn
             |  FROM e JOIN dfc d USING (sgl)),
             |pre AS (
             |  SELECT doc_id, n_sh, sgl FROM rk
             |  WHERE rn <= n_sh - ceil(0.7 * CAST(n_sh AS DOUBLE) - 1e-9) + 1),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             |         a.n_sh AS n_a, b.n_sh AS n_b
             |  FROM pre a JOIN pre b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
             |  WHERE CAST(least(a.n_sh, b.n_sh) AS DOUBLE)
             |        >= 0.7 * CAST(greatest(a.n_sh, b.n_sh) AS DOUBLE) - 1e-9),
             |ver AS (
             |  SELECT c.id_a, c.id_b, c.n_a, c.n_b, count(*) AS shared
             |  FROM cand c
             |  JOIN e ea ON ea.doc_id = c.id_a
             |  JOIN e eb ON eb.doc_id = c.id_b AND eb.sgl = ea.sgl
             |  GROUP BY 1, 2, 3, 4),
             |truth AS (
             |  SELECT id_a, id_b FROM ver
             |  WHERE CAST(shared AS DOUBLE)
             |        / CAST(n_a + n_b - shared AS DOUBLE) >= 0.7),
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
             |pred AS (
             |  SELECT c.id_a, c.id_b
             |  FROM cands c
             |  JOIN sh a ON a.doc_id = c.id_a
             |  JOIN sh b ON b.doc_id = c.id_b
             |  WHERE CAST(len(a.shingles) + len(b.shingles)
             |         - len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
             |      / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.7),
             |nm AS (
             |  SELECT count(*) AS n_missed
             |  FROM truth t LEFT JOIN pred p USING (id_a, id_b)
             |  WHERE p.id_a IS NULL)
             |SELECT (SELECT count(*) FROM truth) AS n_truth,
             |  (SELECT count(*) FROM pred) AS n_pred,
             |  nm.n_missed,
             |  CASE WHEN (SELECT count(*) FROM truth) = 0 THEN NULL
             |       ELSE round(CAST((SELECT count(*) FROM truth) - nm.n_missed
             |                       AS DOUBLE)
             |                  / (SELECT count(*) FROM truth), 6) END AS recall
             |FROM nm""".stripMargin)),

    QueryDef("w37_rolling_beta",
      // 20-day rolling CAPM beta + alpha of each ticker vs the market
      // index (sum of all closes per day) — the time-varying regression
      // pair next to w23's correlation. Determinism: RETURNS (IEEE
      // ratios of identical doubles) round to 6dp and cast to
      // DECIMAL(16,6), so all four co-moment sums (Σx Σy Σxy Σx²)
      // accumulate EXACTLY inside the window (the w36 sum convention
      // applied to the w23 frame); both engines then run one identical
      // double formula + 6dp round. The market-return lag is a single
      // unpartitioned window over the per-day index — bounded by the
      // CALENDAR, not the data (one row per trading day). Full-frame
      // guard (n=20); zero market variance → null.
      (s, dir) => {
        // pinned: index and per-ticker returns share the price frame —
        // unpinned the lineitem agg runs twice
        val p = graft.Caches.trackedPersist(prices(t(s, dir, "lineitem")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val idx = p.groupBy("date")
          .agg(sum(col("close").cast("decimal(12,2)")).cast("decimal(18,2)").as("_ic"))
        val wD = Window.orderBy("date")
        val mret = idx
          .withColumn("x", round(col("_ic").cast("double") /
            lag(col("_ic"), 1).over(wD).cast("double") - 1, 6)
            .cast("decimal(16,6)"))
          .select("date", "x")
        val tret = p
          .withColumn("y", round(col("close") /
            lag(col("close"), 1).over(wTicker) - 1, 6).cast("decimal(16,6)"))
          .select("ticker", "date", "y")
        val w20 = Window.partitionBy("ticker").orderBy("date").rowsBetween(-19, 0)
        tret.join(mret, "date")
          .filter(col("x").isNotNull && col("y").isNotNull)
          .select(col("ticker"), col("date"),
            count(lit(1)).over(w20).as("_n"),
            sum(col("x")).over(w20).cast("double").as("_sx"),
            sum(col("y")).over(w20).cast("double").as("_sy"),
            sum(col("x") * col("y")).over(w20).cast("double").as("_sxy"),
            sum(col("x") * col("x")).over(w20).cast("double").as("_sxx"))
          .withColumn("_den", lit(20.0) * col("_sxx") - col("_sx") * col("_sx"))
          .select(col("ticker"), col("date"),
            when(col("_n") === 20 && col("_den") > 0,
              round((lit(20.0) * col("_sxy") - col("_sx") * col("_sy")) /
                col("_den"), 6)).as("beta20"),
            when(col("_n") === 20 && col("_den") > 0,
              round((col("_sy") - ((lit(20.0) * col("_sxy") -
                col("_sx") * col("_sy")) / col("_den")) * col("_sx")) /
                lit(20.0), 6)).as("alpha20"))
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """, idx AS (
          |  SELECT "date", CAST(SUM(CAST(close AS DECIMAL(12,2)))
          |                      AS DECIMAL(18,2)) AS ic
          |  FROM prices GROUP BY 1),
          |mret AS (
          |  SELECT "date",
          |    CAST(round(CAST(ic AS DOUBLE) /
          |      CAST(lag(ic) OVER (ORDER BY "date") AS DOUBLE) - 1, 6)
          |      AS DECIMAL(16,6)) AS x
          |  FROM idx),
          |tret AS (
          |  SELECT ticker, "date",
          |    CAST(round(close / lag(close) OVER (PARTITION BY ticker
          |                                        ORDER BY "date") - 1, 6)
          |      AS DECIMAL(16,6)) AS y
          |  FROM prices),
          |co AS (
          |  SELECT ticker, "date",
          |    count(*) OVER w AS n,
          |    CAST(SUM(x) OVER w AS DOUBLE) AS sx,
          |    CAST(SUM(y) OVER w AS DOUBLE) AS sy,
          |    CAST(SUM(x * y) OVER w AS DOUBLE) AS sxy,
          |    CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx
          |  FROM tret JOIN mret USING ("date")
          |  WHERE x IS NOT NULL AND y IS NOT NULL
          |  WINDOW w AS (PARTITION BY ticker ORDER BY "date"
          |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
          |SELECT ticker, "date",
          |  CASE WHEN n = 20 AND (20.0 * sxx - sx * sx) > 0
          |       THEN round((20.0 * sxy - sx * sy)
          |                  / (20.0 * sxx - sx * sx), 6)
          |  END AS beta20,
          |  CASE WHEN n = 20 AND (20.0 * sxx - sx * sx) > 0
          |       THEN round((sy - ((20.0 * sxy - sx * sy)
          |                         / (20.0 * sxx - sx * sx)) * sx)
          |                  / 20.0, 6)
          |  END AS alpha20
          |FROM co ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("w38_rolling_skew",
      // 20-day rolling return skewness per ticker — the crash-asymmetry
      // signal next to w23/w37 (third central moment over the same
      // frame). The w23 exact-arithmetic discipline one power higher:
      // closes as DECIMAL(12,2), Σx Σx² Σx³ all exact decimal window
      // sums (x³ is (38,6) — within decimal range; x⁴ would overflow,
      // which is why kurtosis isn't here), then ONE double formula.
      // m2^1.5 is spelled m2·√m2 — sqrt is correctly-rounded IEEE
      // everywhere, pow is not. Full-frame guard; zero variance → null.
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
          .select(col("ticker"), col("date"),
            col("close").cast("decimal(12,2)").as("x"))
        val w20 = Window.partitionBy("ticker").orderBy("date").rowsBetween(-19, 0)
        p.select(col("ticker"), col("date"),
            count(lit(1)).over(w20).as("_n"),
            sum(col("x")).over(w20).cast("double").as("_sx"),
            sum(col("x") * col("x")).over(w20).cast("double").as("_sxx"),
            sum(col("x") * col("x") * col("x")).over(w20).cast("double").as("_sxxx"))
          .withColumn("_mu", col("_sx") / lit(20.0))
          .withColumn("_m2", col("_sxx") / lit(20.0) - col("_mu") * col("_mu"))
          .select(col("ticker"), col("date"),
            when(col("_n") === 20 && col("_m2") > 0,
              round((col("_sxxx") / lit(20.0) -
                lit(3.0) * col("_mu") * (col("_sxx") / lit(20.0)) +
                lit(2.0) * col("_mu") * col("_mu") * col("_mu")) /
                (col("_m2") * sqrt(col("_m2"))), 6)).as("skew20"))
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """, px AS (SELECT ticker, "date", CAST(close AS DECIMAL(12,2)) AS x
          |         FROM prices),
          |co AS (
          |  SELECT ticker, "date",
          |    count(*) OVER w AS n,
          |    CAST(SUM(x) OVER w AS DOUBLE) AS sx,
          |    CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(CAST(x * x AS DECIMAL(26,4)) * x
          |                  AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxxx
          |  FROM px
          |  WINDOW w AS (PARTITION BY ticker ORDER BY "date"
          |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
          |m AS (
          |  SELECT ticker, "date", n, sx, sxx, sxxx,
          |    sx / 20.0 AS mu,
          |    sxx / 20.0 - (sx / 20.0) * (sx / 20.0) AS m2
          |  FROM co)
          |SELECT ticker, "date",
          |  CASE WHEN n = 20 AND m2 > 0
          |       THEN round((sxxx / 20.0 - 3.0 * mu * (sxx / 20.0)
          |                   + 2.0 * mu * mu * mu)
          |                  / (m2 * sqrt(m2)), 6)
          |  END AS skew20
          |FROM m ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("a32_amihud",
      // monthly Amihud illiquidity per ticker: mean of |ret| per million
      // of dollar volume over each calendar month — the price-impact
      // proxy (Amihud, J. Financial Markets 2002) that turns the raw
      // volume column into a tradability signal. Per-row values are one
      // IEEE chain over bit-identical inputs; the per-month MEAN sums
      // 6dp-rounded terms in exact decimal (the w36 convention — float
      // sum order never leaks). The final mean rounds in EXACT INTEGER
      // half-up arithmetic ((2·S·10⁶ + n) div 2n): a 6dp sum over a
      // ~20-day month lands on x.xxxxxx5 quotients CONSTANTLY, exactly
      // where double rounding is engine-dependent (the w22 boundary
      // lesson — a float round(÷,6) here flipped 13 rows at sf0.01).
      (s, dir) => {
        val r = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .withColumn("_il", round(abs(col("ret")) /
            (col("close") * col("volume")) * lit(1e6), 6)
            .cast("decimal(18,6)"))
        r.groupBy(col("ticker"), trunc(col("date"), "month").as("month"))
          .agg(count(lit(1)).as("n_days"), sum(col("_il")).as("_s"))
          .select(col("ticker"), col("month"), col("n_days"),
            (expr("(2 * CAST(_s * 1000000 AS BIGINT) + n_days)" +
              " div (2 * n_days)").cast("double") / lit(1e6)).as("amihud"))
          .orderBy("ticker", "month")
      },
      Some(pricesSql + retSql +
        """, il AS (
          |  SELECT ticker, date_trunc('month', "date") AS month,
          |    CAST(round(abs(ret) / (close * volume) * 1000000.0, 6)
          |         AS DECIMAL(18,6)) AS il
          |  FROM r WHERE ret IS NOT NULL),
          |ag AS (
          |  SELECT ticker, month, count(*) AS n_days, SUM(il) AS s
          |  FROM il GROUP BY 1, 2)
          |SELECT ticker, month, n_days,
          |  CAST((2 * CAST(s * 1000000 AS BIGINT) + n_days)
          |       // (2 * n_days) AS DOUBLE) / 1000000.0 AS amihud
          |FROM ag ORDER BY 1, 2""".stripMargin)),

    QueryDef("g8_assortativity",
      // degree assortativity of the co-purchase graph ([[graft.ops
      // .GraphOps.degreeAssortativity]]): does this graph wire hubs to
      // hubs or hubs to leaves? — the one-scalar skew diagnostic for
      // any operator that joins over it. Exact-integer co-moments,
      // one IEEE closing formula, 6dp.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        GraphOps.degreeAssortativity(pairs, "src", "dst")
      },
      Some("""WITH e AS MATERIALIZED (
             |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |dirs AS MATERIALIZED (
             |  SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
             |deg AS MATERIALIZED (
             |  SELECT u AS node, count(*) AS deg FROM dirs GROUP BY 1),
             |x AS (
             |  SELECT du.deg AS dx, dv.deg AS dy
             |  FROM dirs JOIN deg du ON dirs.u = du.node
             |            JOIN deg dv ON dirs.v = dv.node),
             |ag AS (
             |  SELECT count(*) AS m2,
             |    SUM(dx) AS sx, SUM(dy) AS sy, SUM(dx * dy) AS sxy,
             |    SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy
             |  FROM x),
             |d AS (
             |  SELECT m2, sxy, sx, sy,
             |    CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dxx,
             |    CAST(m2 AS DOUBLE) * CAST(syy AS DOUBLE)
             |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dyy
             |  FROM ag)
             |SELECT (SELECT count(*) FROM deg) AS n_nodes,
             |  CAST(m2 / 2 AS BIGINT) AS n_edges,
             |  CASE WHEN dxx > 0 AND dyy > 0
             |       THEN round((CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
             |                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |                  / sqrt(dxx * dyy), 6)
             |  END AS assortativity
             |FROM d""".stripMargin)),

    QueryDef("g9_bfs_hops",
      // multi-source BFS hop distances from the planted seed set
      // (every 199th part) out to 3 hops over the co-purchase graph
      // ([[graft.ops.GraphOps.bfsHops]]) — the "distance from trusted
      // set" propagation signal. All-integer; the unrolled oracle
      // replays every frontier exactly.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        val seeds = t(s, dir, "lineitem")
          .filter(col("l_partkey") % 199 === 0)
          .select(col("l_partkey").as("seed"))
        GraphOps.bfsHops(pairs, "src", "dst", seeds, "seed", rounds = 3)
      },
      Some(bfsOracle(3))),

    QueryDef("eval6_pr_auc",
      // average precision (PR-AUC) of the cls1 NB scores — the
      // imbalance-honest companion to eval2's ROC-AUC: AP =
      // Σ_t Δrecall·precision over DISTINCT 6dp score thresholds
      // (tie-grouped, so the value is tie-order invariant). Every term
      // is the rational d_pos·TP/(P·TOT) — rounded to 12dp by EXACT
      // INTEGER half-up division (the a32 boundary lesson: count
      // products are routinely pure 2^a·5^b, exactly where float
      // rounding splits engines), summed as longs, final 6dp round in
      // integer too. The threshold window is bounded by the eval set
      // (the rrfFuse convention).
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        val g = scored.join(lab, "doc_id")
          .groupBy("score")
          .agg(sum(col("_y")).as("_dp"), count(lit(1)).as("_dt"))
        val wCum = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val p = g.agg(sum(col("_dp")).as("_p"), sum(col("_dt")).as("_n"))
        g.select(col("_dp"),
            sum(col("_dp")).over(wCum).as("_tp"),
            sum(col("_dt")).over(wCum).as("_tot"))
          .filter(col("_dp") > 0)
          .crossJoin(broadcast(p))
          .withColumn("_t12", expr(
            "(2 * CAST(_dp AS DECIMAL(38,0)) * CAST(_tp AS DECIMAL(38,0))" +
            " * 1000000000000 + CAST(_p AS DECIMAL(38,0)) * CAST(_tot AS DECIMAL(38,0)))" +
            " div (2 * CAST(_p AS DECIMAL(38,0)) * CAST(_tot AS DECIMAL(38,0)))"))
          .agg(min(col("_p")).as("_pp"), min(col("_n")).as("_nn"),
            sum(col("_t12")).as("_s12"))
          .select(col("_pp").as("n_pos"), (col("_nn") - col("_pp")).as("n_neg"),
            (expr("(2 * _s12 + 1000000) div 2000000").cast("double") /
              lit(1e6)).as("ap"))
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |g AS (
          |  SELECT score, CAST(SUM(y) AS BIGINT) AS dp, count(*) AS dt
          |  FROM scored GROUP BY 1),
          |c AS (
          |  SELECT dp,
          |    CAST(SUM(dp) OVER (ORDER BY score DESC
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
          |    CAST(SUM(dt) OVER (ORDER BY score DESC
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tot
          |  FROM g),
          |p AS (SELECT CAST(SUM(dp) AS BIGINT) AS p,
          |             CAST(SUM(dt) AS BIGINT) AS n FROM g),
          |terms AS (
          |  SELECT (2 * CAST(c.dp AS HUGEINT) * CAST(c.tp AS HUGEINT)
          |            * 1000000000000
          |          + CAST(p.p AS HUGEINT) * CAST(c.tot AS HUGEINT))
          |         // (2 * CAST(p.p AS HUGEINT) * CAST(c.tot AS HUGEINT)) AS t12
          |  FROM c, p WHERE c.dp > 0),
          |s AS (SELECT CAST(SUM(t12) AS BIGINT) AS s12 FROM terms)
          |SELECT p.p AS n_pos, p.n - p.p AS n_neg,
          |  CAST((2 * s.s12 + 1000000) // 2000000 AS DOUBLE) / 1000000.0 AS ap
          |FROM p, s""".stripMargin)),

    QueryDef("eval7_kappa",
      // chance-corrected agreement of the langid heuristic vs the gold
      // labels: Cohen's kappa + macro-F1 over eval1's confusion matrix
      // (the single-scalar pair eval1's per-cell view doesn't give).
      // The matrix is langs²-sized and pinned once; every statistic is
      // a ratio of EXACT integer sums shipped as ONE unrounded IEEE
      // division chain (the w22 rule: raw quotients replay bit-for-bit
      // — rounding near count-product boundaries is what flips).
      // Per-class F1 quantizes through exact integer micro-units
      // before the macro mean so the sum order can't leak.
      (s, dir) => {
        val cells = graft.Caches.trackedPersist(
          docs(s, dir)
            .select(col("lang").as("gold"),
              T.languageId(col("text")).as("pred"))
            .groupBy("gold", "pred").agg(count(lit(1)).as("n")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rows = cells.groupBy(col("gold").as("cls")).agg(sum("n").as("_row"))
        val cols = cells.groupBy(col("pred").as("cls")).agg(sum("n").as("_col"))
        val diag = cells.filter(col("gold") === col("pred"))
          .select(col("gold").as("cls"), col("n").as("_tp"))
        val perClass = rows
          .join(cols, Seq("cls"), "left")
          .join(diag, Seq("cls"), "left")
          .select(col("cls"), col("_row"),
            coalesce(col("_col"), lit(0L)).as("_colf"),
            coalesce(col("_tp"), lit(0L)).as("_tpf"))
          .withColumn("_f1u", expr(
            "(2 * (2 * _tpf) * 1000000 + (_row + _colf)) div (2 * (_row + _colf))"))
        val peNum = rows.join(cols, Seq("cls"), "full")
          .agg(sum(coalesce(col("_row"), lit(0L)) *
            coalesce(col("_col"), lit(0L))).as("_pe"))
        val base = cells.agg(sum("n").as("_n"),
          sum(when(col("gold") === col("pred"), col("n"))).as("_diag"))
        val macros = perClass.agg(count(lit(1)).as("_k"), sum("_f1u").as("_f1s"))
        base.crossJoin(broadcast(peNum)).crossJoin(broadcast(macros))
          .withColumn("_po", col("_diag").cast("double") / col("_n").cast("double"))
          .withColumn("_pex", col("_pe").cast("double") /
            (col("_n") * col("_n")).cast("double"))
          .select(col("_n").as("n"), col("_k").as("n_classes"),
            col("_po").as("accuracy"),
            col("_pex").as("expected_accuracy"),
            ((col("_po") - col("_pex")) / (lit(1.0) - col("_pex"))).as("kappa"),
            (col("_f1s").cast("double") /
              (col("_k") * lit(1000000L)).cast("double")).as("macro_f1"))
      },
      Some(raw"""WITH t AS (
             |  SELECT doc_id, lang,
             |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |h AS (SELECT doc_id, lang,
             |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |  len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |  len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |FROM t),
             |pd AS (SELECT doc_id, lang AS gold,
             |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |       WHEN h_es >= h_fr THEN 'es'
             |       ELSE 'fr' END AS pred
             |FROM h),
             |cells AS (SELECT gold, pred, count(*) AS n FROM pd GROUP BY 1, 2),
             |rws AS (SELECT gold AS cls, CAST(SUM(n) AS BIGINT) AS r
             |        FROM cells GROUP BY 1),
             |cls AS (SELECT pred AS cls, CAST(SUM(n) AS BIGINT) AS c
             |        FROM cells GROUP BY 1),
             |dg AS (SELECT gold AS cls, n AS tp FROM cells WHERE gold = pred),
             |pc AS (
             |  SELECT rws.cls, rws.r, coalesce(cls.c, 0) AS c,
             |    coalesce(dg.tp, 0) AS tp
             |  FROM rws LEFT JOIN cls USING (cls) LEFT JOIN dg USING (cls)),
             |f1 AS (
             |  SELECT cls,
             |    (2 * (2 * tp) * 1000000 + (r + c)) // (2 * (r + c)) AS f1u
             |  FROM pc),
             |pe AS (
             |  SELECT CAST(SUM(coalesce(rws.r, 0) * coalesce(cls.c, 0)) AS BIGINT)
             |    AS pe
             |  FROM rws FULL JOIN cls USING (cls)),
             |base AS (
             |  SELECT CAST(SUM(n) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN gold = pred THEN n ELSE 0 END) AS BIGINT)
             |      AS diag
             |  FROM cells),
             |mac AS (SELECT count(*) AS k, CAST(SUM(f1u) AS BIGINT) AS f1s FROM f1)
             |SELECT base.n, mac.k AS n_classes,
             |  CAST(base.diag AS DOUBLE) / CAST(base.n AS DOUBLE) AS accuracy,
             |  CAST(pe.pe AS DOUBLE) / CAST(base.n * base.n AS DOUBLE)
             |    AS expected_accuracy,
             |  (CAST(base.diag AS DOUBLE) / CAST(base.n AS DOUBLE)
             |   - CAST(pe.pe AS DOUBLE) / CAST(base.n * base.n AS DOUBLE))
             |  / (1.0 - CAST(pe.pe AS DOUBLE) / CAST(base.n * base.n AS DOUBLE))
             |    AS kappa,
             |  CAST(mac.f1s AS DOUBLE) / CAST(mac.k * 1000000 AS DOUBLE)
             |    AS macro_f1
             |FROM base, pe, mac""".stripMargin)),

    QueryDef("eval8_lift",
      // decile lift & cumulative-gains table for the cls1 scores — the
      // campaign-targeting eval ("how concentrated are the positives in
      // the top-scored slices?"). Deciles come from ntile(10) over a
      // TOTAL order (score desc, doc_id — both engines split remainders
      // identically); every reported ratio is one unrounded IEEE
      // division of exact long products (< 2^53). The global ntile is
      // bounded by the eval set (the rrfFuse convention).
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        // deciles from the distributed exact rank + the ntile fill
        // rule (the seg1 shape — no single-partition ntile window);
        // pinned: the count and the ranking's three input evaluations
        // read the scored join
        val base = graft.Caches.trackedPersist(
          scored.join(lab, "doc_id")
            .select(col("doc_id"), col("score"), col("_y")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nn = base.agg(count(lit(1)).as("_n"))
        val deciles = graft.ops.RankOps.withGlobalRank(base,
            Seq(col("score").desc, col("doc_id")), "_rn")
          .crossJoin(broadcast(nn))
          .withColumn("decile", ntileFromRank("_rn", "_n", 10))
          .groupBy("decile")
          .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"))
        val tot = deciles.agg(sum("n").as("_nn"), sum("n_pos").as("_pp"))
        val wCum = org.apache.spark.sql.expressions.Window
          .orderBy("decile")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        deciles
          .withColumn("_cum", sum(col("n_pos")).over(wCum))
          .crossJoin(broadcast(tot))
          .select(col("decile"), col("n"), col("n_pos"),
            (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"),
            ((col("n_pos") * col("_nn")).cast("double") /
              (col("n") * col("_pp")).cast("double")).as("lift"),
            (col("_cum").cast("double") / col("_pp").cast("double")).as("cum_gain"))
          .orderBy("decile")
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |dec AS (
          |  SELECT CAST(ntile(10) OVER (ORDER BY score DESC, doc_id)
          |              AS INTEGER) AS decile, y
          |  FROM scored),
          |g AS (
          |  SELECT decile, count(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
          |  FROM dec GROUP BY 1),
          |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
          |              CAST(SUM(n_pos) AS BIGINT) AS pp FROM g),
          |c AS (
          |  SELECT decile, n, n_pos,
          |    CAST(SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
          |         AS BIGINT) AS cum
          |  FROM g)
          |SELECT decile, n, n_pos,
          |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
          |  CAST(n_pos * tt.nn AS DOUBLE) / CAST(n * tt.pp AS DOUBLE) AS lift,
          |  CAST(cum AS DOUBLE) / CAST(tt.pp AS DOUBLE) AS cum_gain
          |FROM c, tt ORDER BY decile""".stripMargin)),

    QueryDef("port1_momentum_backtest",
      // monthly-rebalanced cross-sectional momentum long-short backtest
      // — w36's daily diagnostic promoted to the full factor-portfolio
      // loop: month-end closes → monthly returns → quintile formation
      // on LAST month's return (ntile over a total order) → equal-weight
      // NEXT-month returns for the winner (q1) and loser (q5) books →
      // the q1−q5 spread compounded into an equity curve at 10% book
      // exposure with the spread winsorized to ±90%/month (the
      // position-sizing discipline that also keeps the exact state in
      // decimal(20,8) range — revenue-proxy "returns" swing far wider
      // than real prices). Determinism end-to-end: month closes are
      // exact 2dp decimals, monthly returns round 6dp to micro-units,
      // the per-book MEAN uses the a32 exact-integer half-up division
      // (shifted +10⁷ micro so the sign never changes the truncation;
      // a book month can lose at most 100%), and the equity curve is
      // the e17 exact-decimal product recursion — factor (1 + ls/10)
      // built by exact decimal MULTIPLICATION (×1e-7), never a decimal
      // division. The global month fold is bounded by the calendar.
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
        val mc = p.groupBy(col("ticker"), trunc(col("date"), "month").as("month"))
          .agg(max(struct(col("date").as("d"), col("close").as("c")))
            .getField("c").cast("decimal(12,2)").as("mclose"))
        val wT = Window.partitionBy("ticker").orderBy("month")
        val mr = mc
          .withColumn("mret", round(col("mclose").cast("double") /
            lag(col("mclose"), 1).over(wT).cast("double") - 1, 6)
            .cast("decimal(10,6)"))
          .withColumn("fwd", lead(col("mret"), 1).over(wT))
          .filter(col("mret").isNotNull && col("fwd").isNotNull)
        val wM = Window.partitionBy("month")
          .orderBy(col("mret").desc, col("ticker"))
        val books = mr.withColumn("q", ntile(5).over(wM))
          .filter(col("q") === 1 || col("q") === 5)
          .groupBy("month", "q")
          .agg(count(lit(1)).as("n"),
            sum((col("fwd") * lit(1000000)).cast("long")).as("_s6"))
          .withColumn("_mu", expr(
            "(2 * (_s6 + n * 10000000) + n) div (2 * n) - 10000000"))
        val piv = books.groupBy("month")
          .agg(max(when(col("q") === 1, col("_mu"))).as("a"),
            max(when(col("q") === 5, col("_mu"))).as("b"),
            max(when(col("q") === 1, col("n"))).as("na"),
            max(when(col("q") === 5, col("n"))).as("nb"))
          .filter(col("a").isNotNull && col("b").isNotNull)
          .withColumn("l", least(greatest(col("a") - col("b"),
            lit(-900000L)), lit(900000L)))
        val arr = piv.agg(array_sort(collect_list(struct(
          col("month").as("m"), col("a").as("a"), col("b").as("b"),
          col("na").as("na"), col("nb").as("nb"), col("l").as("l")))).as("_xs"))
        val dec = "decimal(20,8)"
        val micro = lit(new java.math.BigDecimal("0.0000001")).cast("decimal(8,7)")
        val init = struct(
          lit(java.math.BigDecimal.ONE).cast(dec).as("eq"),
          slice(transform(col("_xs"), a => struct(a.getField("m").as("m"),
            a.getField("a").as("a"), a.getField("b").as("b"),
            a.getField("na").as("na"), a.getField("nb").as("nb"),
            a.getField("l").as("l"), lit(0.0).as("e"))), 1, 0).as("out"))
        val folded = aggregate(col("_xs"), init, (acc, a) => {
          val f = ((lit(10000000L) + a.getField("l")).cast("decimal(16,0)") *
            micro).cast("decimal(16,7)")
          val eq2 = round(acc.getField("eq") * f, 8).cast(dec)
          struct(eq2.as("eq"),
            concat(acc.getField("out"), array(struct(a.getField("m").as("m"),
              a.getField("a").as("a"), a.getField("b").as("b"),
              a.getField("na").as("na"), a.getField("nb").as("nb"),
              a.getField("l").as("l"), eq2.cast("double").as("e")))).as("out"))
        })
        arr.select(explode(folded.getField("out")).as("_r"))
          .select(col("_r.m").as("month"),
            col("_r.na").as("n_q1"), col("_r.nb").as("n_q5"),
            (col("_r.a").cast("double") / lit(1e6)).as("q1_ret"),
            (col("_r.b").cast("double") / lit(1e6)).as("q5_ret"),
            (col("_r.l").cast("double") / lit(1e6)).as("long_short"),
            col("_r.e").as("equity"))
          .orderBy("month")
      },
      Some(pricesSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, mc AS (
          |  SELECT ticker, date_trunc('month', "date") AS month,
          |    CAST((MAX({'d': "date", 'c': close})).c AS DECIMAL(12,2))
          |      AS mclose
          |  FROM prices GROUP BY 1, 2),
          |mr0 AS (
          |  SELECT ticker, month,
          |    CAST(round(CAST(mclose AS DOUBLE) /
          |      CAST(lag(mclose) OVER (PARTITION BY ticker ORDER BY month)
          |           AS DOUBLE) - 1, 6) AS DECIMAL(10,6)) AS mret
          |  FROM mc),
          |mr AS (
          |  SELECT ticker, month, mret,
          |    lead(mret) OVER (PARTITION BY ticker ORDER BY month) AS fwd
          |  FROM mr0),
          |qq AS (
          |  SELECT month, mret, fwd,
          |    ntile(5) OVER (PARTITION BY month
          |                   ORDER BY mret DESC, ticker) AS q
          |  FROM mr WHERE mret IS NOT NULL AND fwd IS NOT NULL),
          |books AS (
          |  SELECT month, q, count(*) AS n,
          |    CAST(SUM(CAST(fwd * 1000000 AS BIGINT)) AS BIGINT) AS s6
          |  FROM qq WHERE q IN (1, 5) GROUP BY 1, 2),
          |mu AS (
          |  SELECT month, q, n,
          |    (2 * (s6 + n * 10000000) + n) // (2 * n) - 10000000 AS mu
          |  FROM books),
          |piv AS (
          |  SELECT month,
          |    max(CASE WHEN q = 1 THEN mu END) AS a,
          |    max(CASE WHEN q = 5 THEN mu END) AS b,
          |    max(CASE WHEN q = 1 THEN n END) AS na,
          |    max(CASE WHEN q = 5 THEN n END) AS nb
          |  FROM mu GROUP BY 1),
          |mm AS MATERIALIZED (
          |  SELECT month, a, b, na, nb,
          |    least(greatest(a - b, -900000), 900000) AS l,
          |    CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS idx
          |  FROM piv WHERE a IS NOT NULL AND b IS NOT NULL),
          |eqr(idx, month, a, b, na, nb, l, eq) AS (
          |  SELECT idx, month, a, b, na, nb, l,
          |    CAST(round(CAST(1 AS DECIMAL(20,8)) *
          |      CAST(CAST(10000000 + l AS DECIMAL(16,0))
          |           * CAST(0.0000001 AS DECIMAL(8,7)) AS DECIMAL(16,7)), 8)
          |      AS DECIMAL(20,8))
          |  FROM mm WHERE idx = 1
          |  UNION ALL
          |  SELECT s.idx, s.month, s.a, s.b, s.na, s.nb, s.l,
          |    CAST(round(eqr.eq *
          |      CAST(CAST(10000000 + s.l AS DECIMAL(16,0))
          |           * CAST(0.0000001 AS DECIMAL(8,7)) AS DECIMAL(16,7)), 8)
          |      AS DECIMAL(20,8))
          |  FROM eqr JOIN mm s ON s.idx = eqr.idx + 1)
          |SELECT month, na AS n_q1, nb AS n_q5,
          |  CAST(a AS DOUBLE) / 1000000.0 AS q1_ret,
          |  CAST(b AS DOUBLE) / 1000000.0 AS q5_ret,
          |  CAST(l AS DOUBLE) / 1000000.0 AS long_short,
          |  CAST(eq AS DOUBLE) AS equity
          |FROM eqr ORDER BY month""".stripMargin)),

    QueryDef("a33_welch_ttest",
      // Welch's unequal-variance two-sample t-test over purchase values
      // (hash-split A/B arms by user id parity) — the experiment-eval
      // primitive next to a27's KS distance: group moments from EXACT
      // decimal sums of 6dp-rounded values, then ONE unrounded IEEE
      // chain for t and the Welch–Satterthwaite df (the w22 rule: raw
      // quotients of identical inputs replay bit-for-bit; the p-value
      // lookup belongs to the caller's stats library, not the engine).
      (s, dir) => {
        val x = events(s, dir).filter(col("event_type") === "purchase")
          .select((col("user_id") % 2 === 0).as("_a"),
            col("value").cast("decimal(18,2)").as("_x"))
        val g = x.groupBy("_a")
          .agg(count(lit(1)).as("_n"),
            sum(col("_x")).cast("double").as("_sx"),
            sum(col("_x") * col("_x")).cast("double").as("_sxx"))
          .withColumn("_m", col("_sx") / col("_n").cast("double"))
          .withColumn("_v", (col("_sxx") - col("_sx") * col("_sx") /
            col("_n").cast("double")) / (col("_n").cast("double") - lit(1.0)))
        val a = g.filter(col("_a")).select(col("_n").as("n_a"),
          col("_m").as("mean_a"), col("_v").as("_va"))
        val b = g.filter(!col("_a")).select(col("_n").as("n_b"),
          col("_m").as("mean_b"), col("_v").as("_vb"))
        a.crossJoin(b)
          .withColumn("_wa", col("_va") / col("n_a").cast("double"))
          .withColumn("_wb", col("_vb") / col("n_b").cast("double"))
          .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
            ((col("mean_a") - col("mean_b")) /
              sqrt(col("_wa") + col("_wb"))).as("t_stat"),
            (((col("_wa") + col("_wb")) * (col("_wa") + col("_wb"))) /
              (col("_wa") * col("_wa") / (col("n_a").cast("double") - lit(1.0)) +
               col("_wb") * col("_wb") / (col("n_b").cast("double") - lit(1.0))))
              .as("df"))
      },
      Some("""WITH x AS (
             |  SELECT (user_id % 2 = 0) AS a,
             |    CAST(value AS DECIMAL(18,2)) AS x
             |  FROM events WHERE event_type = 'purchase'),
             |g AS (
             |  SELECT a, count(*) AS n,
             |    CAST(SUM(x) AS DOUBLE) AS sx,
             |    CAST(SUM(x * x) AS DOUBLE) AS sxx
             |  FROM x GROUP BY 1),
             |m AS (
             |  SELECT a, n, sx / CAST(n AS DOUBLE) AS mean,
             |    (sxx - sx * sx / CAST(n AS DOUBLE))
             |      / (CAST(n AS DOUBLE) - 1.0) AS v
             |  FROM g),
             |w AS (
             |  SELECT ga.n AS n_a, gb.n AS n_b,
             |    ga.mean AS mean_a, gb.mean AS mean_b,
             |    ga.v / CAST(ga.n AS DOUBLE) AS wa,
             |    gb.v / CAST(gb.n AS DOUBLE) AS wb,
             |    CAST(ga.n AS DOUBLE) AS na, CAST(gb.n AS DOUBLE) AS nb
             |  FROM m ga, m gb WHERE ga.a AND NOT gb.a)
             |SELECT n_a, n_b, mean_a, mean_b,
             |  (mean_a - mean_b) / sqrt(wa + wb) AS t_stat,
             |  ((wa + wb) * (wa + wb))
             |  / (wa * wa / (na - 1.0) + wb * wb / (nb - 1.0)) AS df
             |FROM w""".stripMargin)),

    QueryDef("w39_streaks",
      // longest up/down run per ticker (gaps-and-islands on the SIGN of
      // the daily move — the scd1 island machinery pointed at momentum
      // persistence). All-integer: sign, 1-lag change flag, running
      // island id, one agg — exact cross-engine replay, no rounding
      // contract. Flat days (ret = 0) break both kinds of streak.
      (s, dir) => {
        val r = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .withColumn("_sgn", signum(col("ret")).cast("int"))
        val w = Window.partitionBy("ticker").orderBy("date")
        val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
        val isl = r
          .withColumn("_chg", when(lag(col("_sgn"), 1).over(w)
            .isNotNull && lag(col("_sgn"), 1).over(w) === col("_sgn"), 0)
            .otherwise(1))
          .withColumn("_grp", sum(col("_chg")).over(wCum))
        val runs = isl.filter(col("_sgn") =!= 0)
          .groupBy("ticker", "_grp", "_sgn")
          .agg(count(lit(1)).as("_len"))
        runs.groupBy("ticker")
          .agg(max(when(col("_sgn") === 1, col("_len"))).as("longest_up"),
            max(when(col("_sgn") === -1, col("_len"))).as("longest_down"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, sg AS (
          |  SELECT ticker, "date", CAST(sign(ret) AS INTEGER) AS sgn
          |  FROM r WHERE ret IS NOT NULL),
          |f AS (
          |  SELECT ticker, "date", sgn,
          |    CASE WHEN lag(sgn) OVER (PARTITION BY ticker ORDER BY "date")
          |              = sgn THEN 0 ELSE 1 END AS chg
          |  FROM sg),
          |g AS (
          |  SELECT ticker, sgn,
          |    SUM(chg) OVER (PARTITION BY ticker ORDER BY "date"
          |                   ROWS UNBOUNDED PRECEDING) AS grp
          |  FROM f),
          |runs AS (
          |  SELECT ticker, grp, sgn, count(*) AS len
          |  FROM g WHERE sgn <> 0 GROUP BY 1, 2, 3)
          |SELECT ticker,
          |  max(CASE WHEN sgn = 1 THEN len END) AS longest_up,
          |  max(CASE WHEN sgn = -1 THEN len END) AS longest_down
          |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("e19_path_trigrams",
      // top-20 behavioral trigrams: the most common 3-step event-type
      // paths across user sessions (transition-matrix e15 stretched to
      // path mining). Two leads over the per-user time order, one
      // count, one bounded TakeOrdered (ORDER BY n DESC + full type
      // tiebreak → deterministic top-k, never a global sort of the
      // path space). All-integer.
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        events(s, dir)
          .withColumn("_e2", lead(col("event_type"), 1).over(w))
          .withColumn("_e3", lead(col("event_type"), 2).over(w))
          .filter(col("_e2").isNotNull && col("_e3").isNotNull)
          .groupBy(col("event_type").as("step1"), col("_e2").as("step2"),
            col("_e3").as("step3"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
          .limit(20)
      },
      Some("""WITH p AS (
             |  SELECT event_type AS step1,
             |    lead(event_type, 1) OVER w AS step2,
             |    lead(event_type, 2) OVER w AS step3
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT step1, step2, step3, count(*) AS n
             |FROM p WHERE step2 IS NOT NULL AND step3 IS NOT NULL
             |GROUP BY 1, 2, 3
             |ORDER BY n DESC, step1, step2, step3 LIMIT 20""".stripMargin)),

    QueryDef("g10_two_hop_reach",
      // exact 2-hop neighborhood size per node over the first-two-years
      // co-purchase graph — the friend-of-a-friend reach metric (how
      // much of the catalog is "two purchases away"). The Σ deg² wedge
      // join is bounded by the same shipdate cut as g3 (the convention
      // for quadratic-in-degree graph ops); reach counts DISTINCT
      // nodes, excluding self and direct neighbors. All-integer.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
        val two = pairs.as("x").join(pairs.as("y"), col("x.v") === col("y.u"))
          .select(col("x.u").as("u"), col("y.v").as("w"))
          .filter(col("u") =!= col("w"))
          .distinct()
          .join(pairs.select(col("u"), col("v").as("w")),
            Seq("u", "w"), "left_anti")
          .groupBy("u").agg(count(lit(1)).as("n2"))
        pairs.groupBy("u").agg(count(lit(1)).as("deg"))
          .join(two, Seq("u"), "left")
          .select(col("u").as("node"), col("deg"),
            (col("deg") + coalesce(col("n2"), lit(0L))).as("reach2"))
          .orderBy("node")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
             |            WHERE l_shipdate < TIMESTAMP '1997-01-01'),
             |e AS MATERIALIZED (
             |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |  FROM li a JOIN li b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
             |two AS (
             |  SELECT x.u, count(*) AS n2 FROM (
             |    SELECT DISTINCT x.u, y.v AS w
             |    FROM e x JOIN e y ON x.v = y.u
             |    WHERE x.u <> y.v) x
             |  WHERE NOT EXISTS (SELECT 1 FROM e
             |                    WHERE e.u = x.u AND e.v = x.w)
             |  GROUP BY 1),
             |deg AS (SELECT u, count(*) AS deg FROM e GROUP BY 1)
             |SELECT deg.u AS node, deg.deg,
             |  deg.deg + coalesce(two.n2, 0) AS reach2
             |FROM deg LEFT JOIN two USING (u) ORDER BY node""".stripMargin)),

    QueryDef("a34_association_rules",
      // market-basket association rules over orders: every directed
      // part pair with co-occurrence support ≥ 5 orders, with
      // confidence n_ab/n_a and lift n_ab·N/(n_a·n_b) — the
      // recommender-rule primitive the g-family's edge lists feed.
      // Per-order pair fan-out is bounded by order SIZE (≤7 lines in
      // this schema), never by part popularity; supports are exact
      // longs and both ratios ship as single unrounded IEEE divisions
      // of sub-2⁵³ integer products (the a33 convention).
      (s, dir) => {
        // pinned: the self-join sides, the part counts and the order
        // count all read this distinct — unpinned it shuffles 4×
        val op = graft.Caches.trackedPersist(t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct(),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nOrders = op.select("ok").distinct().agg(count(lit(1)).as("_N"))
        val partN = op.groupBy(col("pk")).agg(count(lit(1)).as("_np"))
        val pairN = op.as("a").join(op.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .groupBy(col("a.pk").as("ante"), col("b.pk").as("cons"))
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5)
        pairN
          .join(partN.select(col("pk").as("ante"), col("_np").as("_na")), "ante")
          .join(partN.select(col("pk").as("cons"), col("_np").as("_nb")), "cons")
          .crossJoin(broadcast(nOrders))
          .select(col("ante"), col("cons"), col("n_ab"),
            col("_na").as("n_ante"), col("_nb").as("n_cons"),
            (col("n_ab").cast("double") / col("_na").cast("double"))
              .as("confidence"),
            ((col("n_ab") * col("_N")).cast("double") /
              (col("_na") * col("_nb")).cast("double")).as("lift"))
          .orderBy("ante", "cons")
      },
      Some("""WITH op AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             |  FROM lineitem),
             |nn AS (SELECT count(DISTINCT ok) AS n FROM op),
             |pn AS (SELECT pk, count(*) AS np FROM op GROUP BY 1),
             |pr AS (
             |  SELECT a.pk AS ante, b.pk AS cons, count(*) AS n_ab
             |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk <> b.pk
             |  GROUP BY 1, 2 HAVING count(*) >= 5)
             |SELECT pr.ante, pr.cons, pr.n_ab,
             |  pa.np AS n_ante, pb.np AS n_cons,
             |  CAST(pr.n_ab AS DOUBLE) / CAST(pa.np AS DOUBLE) AS confidence,
             |  CAST(pr.n_ab * nn.n AS DOUBLE)
             |    / CAST(pa.np * pb.np AS DOUBLE) AS lift
             |FROM pr JOIN pn pa ON pr.ante = pa.pk
             |        JOIN pn pb ON pr.cons = pb.pk
             |        CROSS JOIN nn
             |ORDER BY ante, cons""".stripMargin)),

    QueryDef("w40_garch_filter",
      // GARCH(1,1) conditional-variance filter per ticker with pinned
      // parameters (ω=2e-6, α=0.10, β=0.85 — the filter-given-params
      // op; calibration belongs to a stats library): v_t = ω +
      // α·r²_{t-1} + β·v_{t-1}, seeded at the ticker's mean squared
      // return, inputs winsorized to ±1000% (the port1 discipline —
      // revenue-proxy returns have wild tails; the clamp also bounds
      // the integer state). The ENTIRE recursion runs in exact integer picounits
      // (α,β are rationals — each term one half-up integer division,
      // the a32 discipline), so every step replays bit-for-bit in the
      // oracle's recursive CTE; only the final σ = √v is IEEE (sqrt is
      // correctly rounded). O(n) per-ticker sorted-stream fold
      // ([[graft.ops.GarchOps]]) — one shuffle, one pass; the earlier
      // `aggregate`-fold with `concat(acc.out, array(...))` was O(n²)
      // element copies per entity and GC-bound on a loaded JVM
      // (59 s driver-gate min vs 3 s idle-box — the r11 verdict flag).
      (s, dir) => {
        val r6 = round(col("ret"), 6).cast("decimal(10,6)")
        val rc = least(greatest(r6, lit(-10).cast("decimal(10,6)")),
          lit(10).cast("decimal(10,6)"))
        val base = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .select(col("ticker"), col("date"),
            (rc * rc * lit(1000000000000L)).cast("long").as("_r2p"))
        graft.ops.GarchOps.garchVariancePicounits(base)
          .select(col("ticker"), col("date"),
            (col("_v").cast("double") / lit(1e12)).as("var_garch"),
            sqrt(col("_v").cast("double") / lit(1e12)).as("sigma"))
          .orderBy("ticker", "date")
      },
      Some((pricesSql + retSql).replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, x AS (
          |  SELECT ticker, "date",
          |    least(greatest(CAST(round(ret, 6) AS DECIMAL(10,6)),
          |      CAST(-10 AS DECIMAL(10,6))), CAST(10 AS DECIMAL(10,6))) AS rc,
          |    CAST(row_number() OVER (PARTITION BY ticker ORDER BY "date")
          |         AS BIGINT) AS rn
          |  FROM r WHERE ret IS NOT NULL),
          |r2 AS (
          |  SELECT ticker, "date", rn,
          |    CAST(rc * rc * 1000000000000 AS BIGINT) AS r2p
          |  FROM x),
          |sd AS (SELECT ticker, count(*) AS n, CAST(SUM(r2p) AS BIGINT) AS s
          |       FROM r2 GROUP BY 1),
          |v0 AS (SELECT ticker, (2 * s + n) // (2 * n) AS v0 FROM sd),
          |g(ticker, rn, d, v, pr2) AS (
          |  SELECT r2.ticker, r2.rn, r2."date", v0.v0, r2.r2p
          |  FROM r2 JOIN v0 USING (ticker) WHERE rn = 1
          |  UNION ALL
          |  SELECT nx.ticker, nx.rn, nx."date",
          |    2000000 + (2 * g.pr2 + 10) // 20 + (170 * g.v + 100) // 200,
          |    nx.r2p
          |  FROM g JOIN r2 nx ON nx.ticker = g.ticker AND nx.rn = g.rn + 1)
          |SELECT ticker, d AS "date",
          |  CAST(v AS DOUBLE) / 1000000000000.0 AS var_garch,
          |  sqrt(CAST(v AS DOUBLE) / 1000000000000.0) AS sigma
          |FROM g ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("e20_active_users",
      // rolling engagement: DAU / trailing-7-day WAU / trailing-28-day
      // MAU per calendar day. Each (user, active-day) row fans out to
      // the FIXED number of window days it covers (7 and 28 — bounded
      // explode, the scalable rolling-distinct shape; never a per-day
      // distinct scan over the raw log), then two-level aggs dedup
      // (day, user) before counting. All-integer.
      (s, dir) => {
        // pinned: span, dau and both rolling fans read this distinct —
        // unpinned the event log dedups 4×
        val act = graft.Caches.trackedPersist(events(s, dir)
          .select(col("user_id").as("u"), to_date(col("ts")).as("d"))
          .distinct(),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val span = act.agg(min(col("d")).as("_lo"), max(col("d")).as("_hi"))
        val dau = act.groupBy(col("d").as("day"))
          .agg(count(lit(1)).as("dau"))
        def rolling(win: Int, name: String) = act
          .select(col("u"), explode(sequence(col("d"),
            date_add(col("d"), win - 1))).as("day"))
          .distinct()
          .groupBy("day").agg(count(lit(1)).as(name))
        dau.join(rolling(7, "wau"), Seq("day"))
          .join(rolling(28, "mau"), Seq("day"))
          .crossJoin(broadcast(span))
          .filter(col("day").between(col("_lo"), col("_hi")))
          .select(col("day"), col("dau"), col("wau"), col("mau"))
          .orderBy("day")
      },
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
             |  FROM events),
             |span AS (SELECT min(d) AS lo, max(d) AS hi FROM act),
             |dau AS (SELECT d AS day, count(*) AS dau FROM act GROUP BY 1),
             |wau AS (
             |  SELECT day, count(*) AS wau FROM (
             |    SELECT DISTINCT u, unnest(generate_series(d, d + 6,
             |      INTERVAL 1 DAY))::DATE AS day
             |    FROM act) GROUP BY 1),
             |mau AS (
             |  SELECT day, count(*) AS mau FROM (
             |    SELECT DISTINCT u, unnest(generate_series(d, d + 27,
             |      INTERVAL 1 DAY))::DATE AS day
             |    FROM act) GROUP BY 1)
             |SELECT dau.day, dau.dau, wau.wau, mau.mau
             |FROM dau JOIN wau USING (day) JOIN mau USING (day)
             |         CROSS JOIN span
             |WHERE dau.day BETWEEN span.lo AND span.hi
             |ORDER BY day""".stripMargin)),

    QueryDef("e21_user_concentration",
      // activity-concentration audit ([[graft.ops.EventAnalyticsOps
      // .activityConcentration]]): exact Gini of per-user event counts
      // + share of events from the top 1/5/10% of users, all computed
      // from the count-of-counts histogram so nothing user-cardinality
      // sorts. Integers/decimal throughout; each emitted ratio is one
      // division of exact-decimal casts.
      (s, dir) => EventAnalyticsOps.activityConcentration(events(s, dir)),
      Some("""WITH uc AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
             |h AS (SELECT c, count(*) AS m FROM uc GROUP BY 1),
             |r AS (
             |  SELECT c, m,
             |    sum(m) OVER (ORDER BY c
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m AS bef
             |  FROM h),
             |tot AS (SELECT CAST(sum(m) AS BIGINT) AS n,
             |               CAST(sum(c * m) AS BIGINT) AS s FROM r),
             |agg AS (
             |  SELECT
             |    sum(CAST(c AS HUGEINT) * (CAST(m AS HUGEINT) * bef
             |        + (CAST(m AS HUGEINT) * (m + 1)) // 2)) AS a,
             |    sum(CAST(c AS HUGEINT) * greatest(0, least(m,
             |        n - greatest(1, n * 1 // 100) - bef))) AS cut1,
             |    sum(CAST(c AS HUGEINT) * greatest(0, least(m,
             |        n - greatest(1, n * 5 // 100) - bef))) AS cut5,
             |    sum(CAST(c AS HUGEINT) * greatest(0, least(m,
             |        n - greatest(1, n * 10 // 100) - bef))) AS cut10
             |  FROM r CROSS JOIN tot)
             |SELECT tot.n AS n_entities, tot.s AS n_events,
             |  round(CAST(2 * a - (CAST(tot.n AS HUGEINT) + 1) * tot.s AS DOUBLE)
             |    / CAST(CAST(tot.n AS HUGEINT) * tot.s AS DOUBLE), 6) AS gini,
             |  round(CAST(CAST(tot.s AS HUGEINT) - cut1 AS DOUBLE)
             |    / CAST(tot.s AS DOUBLE), 6) AS share_top1,
             |  round(CAST(CAST(tot.s AS HUGEINT) - cut5 AS DOUBLE)
             |    / CAST(tot.s AS DOUBLE), 6) AS share_top5,
             |  round(CAST(CAST(tot.s AS HUGEINT) - cut10 AS DOUBLE)
             |    / CAST(tot.s AS DOUBLE), 6) AS share_top10
             |FROM agg CROSS JOIN tot""".stripMargin)),

    QueryDef("e22_volume_anomalies",
      // robust daily-volume anomaly flags per event type
      // ([[EventAnalyticsOps.dailyCountAnomalies]]): |n − median| >
      // 3·1.4826·MAD decided ENTIRELY in integer cross-products (the
      // exact median/MAD carried ×2/×4) — no float in the flag.
      (s, dir) => EventAnalyticsOps.dailyCountAnomalies(events(s, dir)),
      Some("""WITH d AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |med AS (SELECT event_type,
             |          CAST(quantile_cont(n, 0.5) * 2 AS BIGINT) AS med2
             |        FROM d GROUP BY 1),
             |dev AS (SELECT d.event_type, d.day, d.n, med.med2,
             |          abs(d.n * 2 - med.med2) AS dev2
             |        FROM d JOIN med USING (event_type)),
             |mad AS (SELECT event_type,
             |          CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
             |        FROM dev GROUP BY 1)
             |SELECT dev.event_type, dev.day, dev.n,
             |  CAST(med2 AS DOUBLE) / 2 AS median_n,
             |  CAST(mad4 AS DOUBLE) / 4 AS mad,
             |  CAST(dev2 AS HUGEINT) * 20000
             |    > CAST(mad4 AS HUGEINT) * 44478 AS is_anomaly
             |FROM dev JOIN mad USING (event_type)
             |ORDER BY event_type, day""".stripMargin)),

    QueryDef("e23_burstiness",
      // per-user inter-arrival statistics + Goh–Barabási burstiness
      // ([[EventAnalyticsOps.interArrivalStats]]): exact integer µs
      // gap moments (Σd long, Σd² decimal), then a fixed IEEE chain —
      // mean/sd ship unrounded (µs magnitudes, the e16 2⁵³ lesson),
      // cv/burstiness round 6dp.
      (s, dir) => EventAnalyticsOps.interArrivalStats(events(s, dir)),
      Some("""WITH g AS (
             |  SELECT user_id,
             |    date_diff('microsecond',
             |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
             |      ts) AS d
             |  FROM events),
             |a AS (
             |  SELECT user_id, count(*) AS n, CAST(sum(d) AS BIGINT) AS s,
             |         sum(CAST(d AS HUGEINT) * d) AS s2
             |  FROM g WHERE d IS NOT NULL GROUP BY 1 HAVING count(*) >= 5),
             |m AS (
             |  SELECT user_id, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_us,
             |    sqrt(CAST(s2 * n - CAST(s AS HUGEINT) * s AS DOUBLE)
             |         / (CAST(n AS DOUBLE) * (n - 1))) AS sd_us
             |  FROM a)
             |SELECT user_id, n AS n_gaps, mean_us, sd_us,
             |  round(sd_us / mean_us, 6) AS cv,
             |  round((sd_us - mean_us) / (sd_us + mean_us), 6) AS burstiness
             |FROM m ORDER BY user_id""".stripMargin)),

    QueryDef("a35_var_es",
      // historical 95% Value-at-Risk and Expected Shortfall per ticker:
      // VaR = −(k-th smallest return), k = ⌈n/20⌉ — an exact ORDER
      // STATISTIC, no quantile interpolation — and ES = −mean of the k
      // tail returns. Returns are 6dp exact decimals (the a32
      // convention) so the order statistic, the tie-break (date), and
      // the tail sum are all exact; ES's one division is the only IEEE
      // op. The per-ticker rank window is entity-bounded (the w-family
      // shape).
      (s, dir) => {
        val wt = Window.partitionBy("ticker")
        val x = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .select(col("ticker"), col("date"),
            round(col("ret"), 6).cast("decimal(10,6)").as("r6"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("ticker").orderBy("r6", "date")))
          .withColumn("k", expr("(count(*) OVER (PARTITION BY ticker) + 19) div 20"))
        x.groupBy("ticker")
          .agg(count(lit(1)).as("n"),
            (-max(when(col("rn") === col("k"), col("r6"))))
              .cast("double").as("var95"),
            (-(sum(when(col("rn") <= col("k"), col("r6"))).cast("double") /
              max(col("k")).cast("double"))).as("es95"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, x AS (
          |  SELECT ticker, "date", CAST(round(ret, 6) AS DECIMAL(10,6)) AS r6
          |  FROM r WHERE ret IS NOT NULL),
          |y AS (
          |  SELECT ticker, r6,
          |    row_number() OVER (PARTITION BY ticker ORDER BY r6, "date") AS rn,
          |    (count(*) OVER (PARTITION BY ticker) + 19) // 20 AS k
          |  FROM x)
          |SELECT ticker, count(*) AS n,
          |  CAST(-max(CASE WHEN rn = k THEN r6 END) AS DOUBLE) AS var95,
          |  -(CAST(sum(CASE WHEN rn <= k THEN r6 END) AS DOUBLE)
          |    / CAST(max(k) AS DOUBLE)) AS es95
          |FROM y GROUP BY ticker ORDER BY ticker""".stripMargin)),

    QueryDef("w41_variance_ratio",
      // Lo–MacKinlay variance-ratio statistic per ticker at horizon
      // q = 5: VR = Var(5-day additive return) / (5·Var(1-day)) — the
      // random-walk diagnostic (VR < 1 mean reversion, > 1 momentum;
      // the overlapping-window simple-return variant, no bias
      // correction — that belongs to a stats library). Returns become
      // exact 6dp µunit INTEGERS, so every moment (Σx, Σx², and the
      // 5-day rolling sums' moments) is exact long/decimal arithmetic;
      // VR is then a fixed IEEE chain over exact casts, rounded 6dp.
      // One per-ticker sort serves both the rolling sum and the row
      // index; everything else is one hash agg.
      (s, dir) => {
        val wd = Window.partitionBy("ticker").orderBy("date")
        val x = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .select(col("ticker"), col("date"),
            (round(col("ret"), 6).cast("decimal(10,6)") * 1000000)
              .cast("long").as("x"))
          .withColumn("rn", row_number().over(wd))
          .withColumn("sq", sum(col("x")).over(wd.rowsBetween(-4, 0)))
        val q5 = when(col("rn") >= 5, col("sq"))
        val a = x.groupBy("ticker").agg(
          count(lit(1)).as("n1"),
          sum(col("x")).as("s1"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("q1"),
          count(when(col("rn") >= 5, lit(1))).as("nq"),
          sum(q5).as("sq1"),
          sum(q5.cast("decimal(38,0)") * q5).as("qq"))
        val var1 = (col("q1") * col("n1") -
            col("s1").cast("decimal(38,0)") * col("s1")).cast("double") /
          (col("n1").cast("double") * (col("n1") - 1).cast("double"))
        val varq = (col("qq") * col("nq") -
            col("sq1").cast("decimal(38,0)") * col("sq1")).cast("double") /
          (col("nq").cast("double") * (col("nq") - 1).cast("double"))
        a.filter(col("n1") >= 2 && col("nq") >= 2)
          .select(col("ticker"), col("n1").as("n_ret"), col("nq").as("n_q"),
            round(varq / (var1 * lit(5.0)), 6).as("vr"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, x AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(round(ret, 6) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS x
          |  FROM r WHERE ret IS NOT NULL),
          |y AS (
          |  SELECT ticker, x,
          |    row_number() OVER (PARTITION BY ticker ORDER BY "date") AS rn,
          |    sum(x) OVER (PARTITION BY ticker ORDER BY "date"
          |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sq
          |  FROM x),
          |a AS (
          |  SELECT ticker, count(*) AS n1, CAST(sum(x) AS BIGINT) AS s1,
          |    sum(CAST(x AS HUGEINT) * x) AS q1,
          |    count(CASE WHEN rn >= 5 THEN 1 END) AS nq,
          |    CAST(sum(CASE WHEN rn >= 5 THEN sq END) AS BIGINT) AS sq1,
          |    sum(CASE WHEN rn >= 5 THEN CAST(sq AS HUGEINT) * sq END) AS qq
          |  FROM y GROUP BY 1)
          |SELECT ticker, n1 AS n_ret, nq AS n_q,
          |  round((CAST(qq * nq - CAST(sq1 AS HUGEINT) * sq1 AS DOUBLE)
          |         / (CAST(nq AS DOUBLE) * (nq - 1)))
          |      / ((CAST(q1 * n1 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
          |         / (CAST(n1 AS DOUBLE) * (n1 - 1))) * 5.0), 6) AS vr
          |FROM a WHERE n1 >= 2 AND nq >= 2 ORDER BY ticker""".stripMargin)),

    QueryDef("cdc1_snapshot_diff",
      // change-data capture without a changelog ([[graft.ops.HistoryOps
      // .snapshotDiff]]): diff two builds of the monthly revenue mart —
      // snapshot A covers shipments before 1997, snapshot B extends a
      // year AND retroactively excludes returned lines (the classic
      // restatement) — so the diff carries all three change kinds:
      // months that gained lines (update), months born in 1997
      // (insert), and all-returns months that vanish (delete). Values
      // are exact money decimals → the update flag is a null-safe
      // struct equality on exact values, no float in the decision.
      (s, dir) => {
        def mart(maxDate: String, exclReturns: Boolean) = {
          val li = t(s, dir, "lineitem")
            .filter(col("l_shipdate") < lit(maxDate).cast("timestamp"))
          (if (exclReturns) li.filter(col("l_returnflag") =!= "R") else li)
            .groupBy(col("l_suppkey").as("ticker"),
              date_format(col("l_shipdate"), "yyyy-MM").as("month"))
            .agg(money2(sum(col("l_extendedprice").cast("decimal(12,4)")))
              .as("revenue"), count(lit(1)).as("n_lines"))
        }
        HistoryOps.snapshotDiff(
            mart("1997-01-01", exclReturns = false),
            mart("1998-01-01", exclReturns = true),
            Seq("ticker", "month"))
          .orderBy("ticker", "month")
      },
      Some("""WITH o AS (
             |  SELECT l_suppkey AS ticker, strftime(l_shipdate, '%Y-%m') AS month,
             |         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2)
             |           AS DOUBLE) AS revenue,
             |         count(*) AS n_lines
             |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
             |  GROUP BY 1, 2),
             |n AS (
             |  SELECT l_suppkey AS ticker, strftime(l_shipdate, '%Y-%m') AS month,
             |         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2)
             |           AS DOUBLE) AS revenue,
             |         count(*) AS n_lines
             |  FROM lineitem
             |  WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_returnflag <> 'R'
             |  GROUP BY 1, 2)
             |SELECT COALESCE(o.ticker, n.ticker) AS ticker,
             |  COALESCE(o.month, n.month) AS month,
             |  CASE WHEN o.ticker IS NULL THEN 'insert'
             |       WHEN n.ticker IS NULL THEN 'delete'
             |       ELSE 'update' END AS change,
             |  o.revenue AS old_revenue, n.revenue AS new_revenue,
             |  o.n_lines AS old_n_lines, n.n_lines AS new_n_lines
             |FROM o FULL OUTER JOIN n
             |  ON o.ticker = n.ticker AND o.month = n.month
             |WHERE o.ticker IS NULL OR n.ticker IS NULL
             |   OR o.revenue IS DISTINCT FROM n.revenue
             |   OR o.n_lines IS DISTINCT FROM n.n_lines
             |ORDER BY ticker, month""".stripMargin)),

    QueryDef("t23_heaps_law",
      // Heaps'-law vocabulary growth ([[graft.functions
      // .RelevanceFunctions.heapsFit]]): cumulative vocab vs cumulative
      // tokens in doc order + the (ln N, ln V) OLS fit — the corpus-
      // health twin of t20's Zipf fit, sharing its determinism contract
      // (6dp per-point lns, exact-decimal fit sums, 6dp β/ln K).
      (s, dir) => R.heapsFit(docs(s, dir), "doc_id", "text"),
      Some("""WITH tk AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
             |  FROM documents WHERE text IS NOT NULL),
             |tk2 AS (SELECT doc_id, token FROM tk WHERE length(token) > 0),
             |pd AS (SELECT doc_id, count(*) AS n_tok FROM tk2 GROUP BY 1),
             |fo AS (SELECT min(doc_id) AS doc_id FROM tk2 GROUP BY token),
             |nw AS (SELECT doc_id, count(*) AS nnew FROM fo GROUP BY 1),
             |pts0 AS (
             |  SELECT pd.doc_id, pd.n_tok, COALESCE(nw.nnew, 0) AS nnew
             |  FROM pd LEFT JOIN nw USING (doc_id)),
             |pts AS (
             |  SELECT doc_id,
             |    CAST(sum(n_tok) OVER w AS BIGINT) AS cum_tokens,
             |    CAST(sum(nnew) OVER w AS BIGINT) AS cum_vocab
             |  FROM pts0
             |  WINDOW w AS (ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |p2 AS (
             |  SELECT doc_id, cum_tokens, cum_vocab,
             |    round(ln(CAST(cum_tokens AS DOUBLE)), 6) AS ln_n,
             |    round(ln(CAST(cum_vocab AS DOUBLE)), 6) AS ln_v
             |  FROM pts),
             |sums AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS k,
             |    CAST(SUM(CAST(ln_n AS DECIMAL(20,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(ln_v AS DECIMAL(20,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(ln_n * ln_v AS DECIMAL(24,12))) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(ln_n * ln_n AS DECIMAL(24,12))) AS DOUBLE) AS sxx
             |  FROM p2),
             |fit AS (
             |  SELECT (k * sxy - sx * sy) / (k * sxx - sx * sx) AS slope,
             |         (sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k
             |           AS icept
             |  FROM sums)
             |SELECT doc_id, cum_tokens, cum_vocab, ln_n, ln_v,
             |  round(slope, 6) AS beta, round(icept, 6) AS ln_k
             |FROM p2, fit ORDER BY doc_id""".stripMargin)),

    QueryDef("ab1_proportion_ztest",
      // two-proportion z-test on a hash-split A/B assignment: variant =
      // user_id parity, success = the user ever makes a HIGH-VALUE
      // purchase (value > 195 — "ever purchases" is degenerate here:
      // every user converts, pooled SE = 0). The experimentation
      // primitive next to a33's Welch t (means) and a28's chi-square
      // (independence). Counts are exact longs; p̂s, the pooled SE and
      // z are a FIXED IEEE chain over exact casts (the a13 contract),
      // rounded 6dp; a degenerate 0%/100% pool yields NULL z in both
      // engines rather than an ANSI divide-by-zero.
      (s, dir) => {
        val conv = events(s, dir).groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 195, 1L).otherwise(0L)).as("c"))
          .withColumn("v", col("user_id") % 2)
        // pinned 2-row frame: both variant filters read it — unpinned
        // the per-user agg over the log runs twice
        val a = graft.Caches.trackedPersist(conv.groupBy("v")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("x")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wide = a.filter(col("v") === 0)
          .select(col("n").as("n_a"), col("x").as("conv_a"))
          .crossJoin(a.filter(col("v") === 1)
            .select(col("n").as("n_b"), col("x").as("conv_b")))
        val pa = col("conv_a").cast("double") / col("n_a").cast("double")
        val pb = col("conv_b").cast("double") / col("n_b").cast("double")
        val pp = (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double")
        val se = sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n_a").cast("double") +
            lit(1.0) / col("n_b").cast("double")))
        val tot = col("conv_a") + col("conv_b")
        wide.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
          when(tot > 0 && tot < col("n_a") + col("n_b"),
            round((pa - pb) / se, 6)).as("z"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, user_id % 2 AS v,
             |    max(CASE WHEN event_type = 'purchase' AND value > 195
             |        THEN 1 ELSE 0 END) AS cv
             |  FROM events GROUP BY 1),
             |a AS (SELECT v, count(*) AS n, CAST(sum(cv) AS BIGINT) AS x
             |      FROM c GROUP BY 1),
             |w AS (
             |  SELECT a0.n AS n_a, a0.x AS conv_a, a1.n AS n_b, a1.x AS conv_b
             |  FROM (SELECT n, x FROM a WHERE v = 0) a0,
             |       (SELECT n, x FROM a WHERE v = 1) a1)
             |SELECT n_a, conv_a, n_b, conv_b,
             |  round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a,
             |  round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b,
             |  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
             |  round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |       - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             |    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
             |  END AS z
             |FROM w""".stripMargin)),

    QueryDef("e24_cohort_ltv",
      // cumulative revenue ("LTV") curve per weekly signup cohort: the
      // revenue companion to e10's retention matrix. Purchase values
      // become exact 6dp decimals, so per-cell revenue and the running
      // cumulative are exact; LTV-per-user is one division. Cohort
      // assignment is one user-level hash agg; the cumulative window
      // runs over the weeks²-sized (cohort, offset) matrix, never over
      // events.
      (s, dir) => {
        val e = events(s, dir)
        // pinned: sizes and the purchase join both read the user-level
        // cohort frame — unpinned the log aggregates twice
        val cohort = graft.Caches.trackedPersist(e.groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_users"))
        val cells = e.filter(col("event_type") === "purchase")
          .join(cohort, Seq("user_id"))
          .groupBy(col("cohort_week"),
            (datediff(to_date(col("ts")), col("cohort_week")) / 7)
              .cast("long").as("week_offset"))
          .agg(sum(round(col("value"), 6).cast("decimal(18,6)")).as("_rev"))
        val w = Window.partitionBy("cohort_week").orderBy("week_offset")
          .rowsBetween(Window.unboundedPreceding, 0)
        cells.withColumn("_cum", sum(col("_rev")).over(w))
          .join(broadcast(sizes), Seq("cohort_week"))
          .select(col("cohort_week"), col("week_offset"),
            col("_rev").cast("double").as("revenue"),
            col("_cum").cast("double").as("cum_revenue"),
            round(col("_cum").cast("double") /
              col("cohort_users").cast("double"), 6).as("ltv_per_user"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH co AS (
             |  SELECT user_id,
             |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
             |  FROM events GROUP BY 1),
             |sz AS (SELECT cohort_week, count(*) AS cohort_users FROM co GROUP BY 1),
             |cells AS (
             |  SELECT co.cohort_week,
             |    date_diff('day', co.cohort_week, CAST(e.ts AS DATE)) // 7
             |      AS week_offset,
             |    SUM(CAST(round(e.value, 6) AS DECIMAL(18,6))) AS rev
             |  FROM events e JOIN co USING (user_id)
             |  WHERE e.event_type = 'purchase' GROUP BY 1, 2),
             |cum AS (
             |  SELECT cohort_week, week_offset, rev,
             |    sum(rev) OVER (PARTITION BY cohort_week ORDER BY week_offset
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumrev
             |  FROM cells)
             |SELECT c.cohort_week, c.week_offset,
             |  CAST(c.rev AS DOUBLE) AS revenue,
             |  CAST(c.cumrev AS DOUBLE) AS cum_revenue,
             |  round(CAST(c.cumrev AS DOUBLE) / CAST(sz.cohort_users AS DOUBLE), 6)
             |    AS ltv_per_user
             |FROM cum c JOIN sz USING (cohort_week)
             |ORDER BY cohort_week, week_offset""".stripMargin)),

    QueryDef("w42_hurst",
      // Hurst exponent by R/S analysis ([[graft.ops.FeatureOps
      // .hurstRS]]) over µunit-integer daily returns at block sizes
      // 32/64/128: per-block rescaled ranges from EXACT integer
      // cumulative deviations (S·cum_k = S·prefix−k·B), 6dp per-block
      // R/S, exact-decimal per-size means, zipf-style decimal OLS →
      // H per ticker. The long-memory companion to w32/w41.
      (s, dir) => FeatureOps.hurstRS(
        pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .select(col("ticker"), col("date"),
            (round(col("ret"), 6).cast("decimal(10,6)") * 1000000)
              .cast("long").as("x")),
        "ticker", "date", "x"),
      Some(pricesSql + retSql +
        """, x AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(round(ret, 6) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS x,
          |    row_number() OVER (PARTITION BY ticker ORDER BY "date") AS rn
          |  FROM r WHERE ret IS NOT NULL),
          |f AS (
          |  SELECT ticker, x, rn, s.size,
          |    (rn - 1) // s.size AS blk, (rn - 1) % s.size + 1 AS k
          |  FROM x CROSS JOIN (SELECT unnest([32, 64, 128]) AS size) s),
          |sc AS (
          |  SELECT ticker, size, blk, x, k,
          |    size * sum(x) OVER (PARTITION BY ticker, size, blk ORDER BY k
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      - k * sum(x) OVER (PARTITION BY ticker, size, blk) AS cum,
          |    sum(x) OVER (PARTITION BY ticker, size, blk) AS bsum
          |  FROM f),
          |b AS (
          |  SELECT ticker, size, blk, count(*) AS n,
          |    max(cum) - min(cum) AS rng,
          |    CAST(sum(CAST(x AS HUGEINT) * x) * size
          |      - CAST(max(bsum) AS HUGEINT) * max(bsum) AS HUGEINT) AS varnum
          |  FROM sc GROUP BY 1, 2, 3),
          |rsq AS (
          |  SELECT ticker, size,
          |    round((CAST(rng AS DOUBLE) / CAST(size AS DOUBLE))
          |      / sqrt(CAST(varnum AS DOUBLE)
          |             / (CAST(size AS DOUBLE) * CAST(size AS DOUBLE))), 6) AS rs
          |  FROM b WHERE n = size AND varnum > 0),
          |ps AS (
          |  SELECT ticker, size, count(*) AS n_blocks,
          |    CAST(SUM(CAST(rs AS DECIMAL(20,6))) AS DOUBLE)
          |      / CAST(count(*) AS DOUBLE) AS mean_rs
          |  FROM rsq GROUP BY 1, 2),
          |pts AS (
          |  SELECT ticker, size, n_blocks, mean_rs,
          |    round(ln(CAST(size AS DOUBLE)), 6) AS ln_s,
          |    round(ln(mean_rs), 6) AS ln_rs
          |  FROM ps),
          |fit AS (
          |  SELECT ticker,
          |    round((CAST(count(*) AS DOUBLE)
          |        * CAST(SUM(CAST(ln_s * ln_rs AS DECIMAL(24,12))) AS DOUBLE)
          |      - CAST(SUM(CAST(ln_s AS DECIMAL(20,6))) AS DOUBLE)
          |        * CAST(SUM(CAST(ln_rs AS DECIMAL(20,6))) AS DOUBLE))
          |      / (CAST(count(*) AS DOUBLE)
          |        * CAST(SUM(CAST(ln_s * ln_s AS DECIMAL(24,12))) AS DOUBLE)
          |      - CAST(SUM(CAST(ln_s AS DECIMAL(20,6))) AS DOUBLE)
          |        * CAST(SUM(CAST(ln_s AS DECIMAL(20,6))) AS DOUBLE)), 6) AS hurst
          |  FROM pts GROUP BY 1 HAVING count(*) >= 2)
          |SELECT p.ticker, p.size, p.n_blocks, round(p.mean_rs, 6) AS mean_rs,
          |  p.ln_s, p.ln_rs, f.hurst
          |FROM pts p JOIN fit f USING (ticker)
          |ORDER BY ticker, size""".stripMargin)),

    QueryDef("pairs1_distance_pairs",
      // Gatev-style pairs-trading formation: the 20 ticker pairs whose
      // cumulative price paths track closest by sum of squared daily
      // distances. Paths normalize to the ticker's FIRST close in
      // exact integers (cents → µunits by floor division — a float
      // ratio rounded 6dp is exactly the w22 boundary trap), so SSD is
      // an exact decimal sum over the shared-date inner join; the only
      // IEEE is the per-day mean distance division. Pair fan-out is
      // tickers²/2 per date, so the formation UNIVERSE is capped to 50
      // tickers (the a12 small-universe caveat — a full market pivots
      // to a matrix product instead; unbounded this ran 17 s at sf0.1,
      // 500k pairs × day); top-20 is TakeOrdered on (ssd, ta, tb),
      // never a global sort.
      (s, dir) => {
        // pinned: both self-join sides read the normalized frame —
        // unpinned the price agg + window runs twice
        val p = graft.Caches.trackedPersist(prices(t(s, dir, "lineitem"))
          .filter(col("ticker") < 50)
          .select(col("ticker"), col("date"),
            (col("close").cast("decimal(12,2)") * 100).cast("long").as("c"))
          .withColumn("nrm",
            expr("(c * 1000000L) div first(c) OVER " +
              "(PARTITION BY ticker ORDER BY date " +
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
          .select(col("ticker"), col("date"), col("nrm")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val a = p.select(col("ticker").as("ta"), col("date"), col("nrm").as("na"))
        val b = p.select(col("ticker").as("tb"), col("date"), col("nrm").as("nb"))
        a.join(b, Seq("date")).filter(col("ta") < col("tb"))
          .withColumn("_d", col("na") - col("nb"))
          .groupBy("ta", "tb")
          .agg(count(lit(1)).as("n_days"),
            sum(col("_d").cast("decimal(38,0)") * col("_d")).as("_ssd"))
          .select(col("ta"), col("tb"), col("n_days"),
            col("_ssd").cast("double").as("ssd"),
            (col("_ssd").cast("double") / col("n_days").cast("double"))
              .as("mean_sq_dist"))
          .orderBy(col("ssd"), col("ta"), col("tb")).limit(20)
      },
      Some(pricesSql +
        """, c AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
          |  FROM prices WHERE ticker < 50),
          |n AS (
          |  SELECT ticker, "date",
          |    (c * 1000000) // first(c) OVER (PARTITION BY ticker ORDER BY "date"
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nrm
          |  FROM c),
          |pr AS (
          |  SELECT a.ticker AS ta, b.ticker AS tb, count(*) AS n_days,
          |    sum(CAST(a.nrm - b.nrm AS HUGEINT) * (a.nrm - b.nrm)) AS ssd
          |  FROM n a JOIN n b ON a."date" = b."date" AND a.ticker < b.ticker
          |  GROUP BY 1, 2)
          |SELECT ta, tb, n_days, CAST(ssd AS DOUBLE) AS ssd,
          |  CAST(ssd AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_sq_dist
          |FROM pr ORDER BY CAST(ssd AS DOUBLE), ta, tb LIMIT 20""".stripMargin)),

    QueryDef("s14_rocchio",
      // Rocchio nearest-centroid classification over the labeled
      // embeddings: per-label centroids via the s5 explode+hash-agg
      // pooling (6dp — the float-aggregate contract), then every
      // vector scores against the 10 broadcast centroids and takes the
      // highest 6dp cosine (ties to lower label). The lightest vector
      // classifier — the label-space companion to s10's KNN vote, one
      // scan per phase, nothing corpus-sized shuffled.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cent = S.assembleVec(
          S.meanPoolFlat(emb.select(col("label"), col("embedding")),
              "label", "embedding")
            .select(col("label").as("clabel"), col("pos"),
              round(col("mean_v"), 6).as("mean_v")),
          "clabel")
        emb.crossJoin(broadcast(cent))
          .withColumn("cos",
            round(S.cosine(col("embedding").cast("array<double>"), col("vec")), 6))
          .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
            .orderBy(col("cos").desc, col("clabel"))))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("label"), col("clabel").as("pred"), col("cos"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |flat AS (
             |  SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS val
             |  FROM e),
             |cd AS (SELECT label AS clabel, pos, round(avg(val), 6) AS cv
             |       FROM flat GROUP BY 1, 2),
             |cent AS (SELECT clabel, list(cv ORDER BY pos) AS cvec
             |         FROM cd GROUP BY 1),
             |sc AS (
             |  SELECT e.vec_id, e.label, c.clabel,
             |         round(list_cosine_similarity(e.v, c.cvec), 6) AS cos
             |  FROM e CROSS JOIN cent c),
             |best AS (
             |  SELECT vec_id, label, clabel, cos,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cos DESC, clabel) AS rn
             |  FROM sc)
             |SELECT vec_id, label, clabel AS pred, cos
             |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    QueryDef("a36_ulcer",
      // Ulcer index per ticker (Martin & McCann): RMS of the running
      // drawdown — the depth-AND-duration risk measure a31's max-
      // drawdown misses (a shallow year-long slump hurts more than a
      // one-day dip of equal depth). Drawdowns are exact µ-fraction
      // longs (cents → (peak−c)·10⁶ div peak, the pairs1 floor-division
      // move), their squares sum in exact decimal; the RMS and the
      // /1e6 rescale are a fixed two-op IEEE tail. Running peak is the
      // w10 per-ticker window; everything else one hash agg.
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
          .select(col("ticker"), col("date"),
            (col("close").cast("decimal(12,2)") * 100).cast("long").as("c"))
          .withColumn("_peak", max(col("c")).over(
            Window.partitionBy("ticker").orderBy("date")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("_dd", expr("((_peak - c) * 1000000L) div _peak"))
        p.groupBy("ticker")
          .agg(count(lit(1)).as("n_days"),
            (max(col("_dd")).cast("double") / lit(1e6)).as("max_dd"),
            (sqrt(sum(col("_dd").cast("decimal(38,0)") * col("_dd"))
              .cast("double") / count(lit(1)).cast("double")) / lit(1e6))
              .as("ulcer"))
          .orderBy("ticker")
      },
      Some(pricesSql +
        """, c AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
          |  FROM prices),
          |d AS (
          |  SELECT ticker,
          |    ((max(c) OVER (PARTITION BY ticker ORDER BY "date"
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
          |      * 1000000)
          |    // max(c) OVER (PARTITION BY ticker ORDER BY "date"
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dd
          |  FROM c)
          |SELECT ticker, count(*) AS n_days,
          |  CAST(max(dd) AS DOUBLE) / 1000000.0 AS max_dd,
          |  sqrt(CAST(sum(CAST(dd AS HUGEINT) * dd) AS DOUBLE)
          |    / CAST(count(*) AS DOUBLE)) / 1000000.0 AS ulcer
          |FROM d GROUP BY ticker ORDER BY ticker""".stripMargin)),

    QueryDef("t24_charclass_profile",
      // per-source character-class composition: letter / digit /
      // whitespace / ASCII-punct / other counts and ratios — the
      // encoding-corruption and boilerplate detector that runs BEFORE
      // tokenization (mojibake shows as an 'other' spike, scraped
      // tables as a digit/punct spike). Classes are EXPLICIT ASCII
      // ranges so Java regex and RE2 agree char-for-char (no \p{Punct}
      // vs [[:punct:]] Unicode-table drift); counts are exact longs
      // (len − len(class removed)), each ratio one division, 6dp.
      (s, dir) => {
        def cnt(c: Column, cls: String) =
          length(c) - length(regexp_replace(c, cls, ""))
        val d = docs(s, dir).filter(col("text").isNotNull)
          .select(col("source"), col("text"))
          .withColumn("_tot", length(col("text")))
          .withColumn("_let", cnt(col("text"), "[A-Za-z]"))
          .withColumn("_dig", cnt(col("text"), "[0-9]"))
          .withColumn("_ws", cnt(col("text"), "[ \\t\\n\\r]"))
          .withColumn("_pun", cnt(col("text"), "[!-/:-@\\[-`{-~]"))
        val wsOverlap = col("_let") + col("_dig") + col("_ws") + col("_pun")
        val a = d.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("_tot")).as("n_chars"),
          sum(col("_let")).as("letters"), sum(col("_dig")).as("digits"),
          sum(col("_ws")).as("whitespace"), sum(col("_pun")).as("punct"),
          sum(col("_tot") - wsOverlap).as("other"))
        def ratio(c: String) = round(
          col(c).cast("double") / col("n_chars").cast("double"), 6)
          .as(s"${c}_ratio")
        a.select(col("source"), col("n_docs"), col("n_chars"),
            col("letters"), col("digits"), col("whitespace"), col("punct"),
            col("other"), ratio("letters"), ratio("digits"),
            ratio("whitespace"), ratio("punct"), ratio("other"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT source, length(text) AS tot,
             |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS let,
             |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig,
             |    length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')) AS ws,
             |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS pun
             |  FROM documents WHERE text IS NOT NULL),
             |a AS (
             |  SELECT source, count(*) AS n_docs,
             |    CAST(sum(tot) AS BIGINT) AS n_chars,
             |    CAST(sum(let) AS BIGINT) AS letters,
             |    CAST(sum(dig) AS BIGINT) AS digits,
             |    CAST(sum(ws) AS BIGINT) AS whitespace,
             |    CAST(sum(pun) AS BIGINT) AS punct,
             |    CAST(sum(tot - let - dig - ws - pun) AS BIGINT) AS other
             |  FROM d GROUP BY 1)
             |SELECT source, n_docs, n_chars, letters, digits, whitespace, punct,
             |  other,
             |  round(CAST(letters AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS letters_ratio,
             |  round(CAST(digits AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS digits_ratio,
             |  round(CAST(whitespace AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS whitespace_ratio,
             |  round(CAST(punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS punct_ratio,
             |  round(CAST(other AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS other_ratio
             |FROM a ORDER BY source""".stripMargin)),

    QueryDef("dow1_calendar_effect",
      // day-of-week effect: pooled mean daily return and its one-sample
      // t-statistic per weekday — the classic calendar-anomaly screen
      // (the a33 Welch machinery turned on the calendar axis). Returns
      // are exact µunit integers, so n/Σx/Σx² are exact and mean, sd
      // and t are a fixed IEEE chain (t is scale-invariant, computed in
      // µunits; the reported mean rescales by 1e-6 as its own final
      // op), rounded 6dp.
      (s, dir) => {
        val x = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .select(weekday(col("date")).as("dow"),
            (round(col("ret"), 6).cast("decimal(10,6)") * 1000000)
              .cast("long").as("x"))
        val a = x.groupBy("dow").agg(
          count(lit(1)).as("n"), sum(col("x")).as("_s"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("_q"))
        val mean = col("_s").cast("double") / col("n").cast("double")
        val variance = (col("_q") * col("n") -
            col("_s").cast("decimal(38,0)") * col("_s")).cast("double") /
          (col("n").cast("double") * (col("n") - 1).cast("double"))
        a.filter(col("n") >= 2)
          .select(col("dow"), col("n"),
            round(mean / lit(1e6), 6).as("mean_ret"),
            round(mean / sqrt(variance / col("n").cast("double")), 6)
              .as("t_stat"))
          .orderBy("dow")
      },
      Some(pricesSql + retSql +
        """, x AS (
          |  SELECT CAST(isodow("date") - 1 AS INTEGER) AS dow,
          |    CAST(CAST(round(ret, 6) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS x
          |  FROM r WHERE ret IS NOT NULL),
          |a AS (
          |  SELECT dow, count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
          |    sum(CAST(x AS HUGEINT) * x) AS q
          |  FROM x GROUP BY 1)
          |SELECT dow, n,
          |  round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 1000000.0, 6)
          |    AS mean_ret,
          |  round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |    / sqrt((CAST(q * n - CAST(s AS HUGEINT) * s AS DOUBLE)
          |        / (CAST(n AS DOUBLE) * (n - 1))) / CAST(n AS DOUBLE)), 6)
          |    AS t_stat
          |FROM a WHERE n >= 2 ORDER BY dow""".stripMargin)),

    QueryDef("seg1_rfm",
      // RFM customer segmentation over orders: recency (days since last
      // order vs the dataset horizon), frequency, monetary (exact-
      // decimal order totals) and their ntile-5 quintile codes — the
      // classic CRM/marketing segmentation, with total (metric, cust)
      // tie-breaks so bucket boundaries are deterministic. All-
      // integer/decimal until the monetary output cast. Quintiles come
      // from [[rfmQuintiles]]: exact distributed ranks (range-
      // partitioned sort + zipWithIndex) replayed through the ntile
      // fill rule — bit-identical buckets, no single-partition window
      // (the r11 verdict's seg1 scale-tier item).
      (s, dir) => {
        rfmQuintiles(s, dir)
          .select(col("cust"), col("recency_days"), col("frequency"),
            col("_m").cast("double").as("monetary"),
            col("r_q"), col("f_q"), col("m_q"))
          .withColumn("rfm_code",
            col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
          .orderBy("cust")
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS od,
             |         CAST(o_totalprice AS DECIMAL(14,2)) AS tp
             |  FROM orders),
             |mx AS (SELECT max(od) AS mxd FROM o),
             |r AS (
             |  SELECT cust, max(od) AS last_od, count(*) AS frequency,
             |         sum(tp) AS m
             |  FROM o GROUP BY 1),
             |sc AS (
             |  SELECT cust,
             |    CAST(date_diff('day', last_od, mx.mxd) AS INTEGER) AS recency_days,
             |    frequency, CAST(m AS DOUBLE) AS monetary,
             |    CAST(ntile(5) OVER (ORDER BY date_diff('day', last_od, mx.mxd),
             |      cust) AS INTEGER) AS r_q,
             |    CAST(ntile(5) OVER (ORDER BY frequency DESC, cust) AS INTEGER)
             |      AS f_q,
             |    CAST(ntile(5) OVER (ORDER BY m DESC, cust) AS INTEGER) AS m_q
             |  FROM r CROSS JOIN mx)
             |SELECT cust, recency_days, frequency, monetary, r_q, f_q, m_q,
             |  r_q * 100 + f_q * 10 + m_q AS rfm_code
             |FROM sc ORDER BY cust""".stripMargin)),

    QueryDef("imp1_median_impute",
      // per-group median imputation — the feature-repair step before
      // training (w22 interpolates time series; this fills by GROUP
      // statistic where no temporal neighbor exists). Nulls are PLANTED
      // (event_id % 13 — the c2 pattern: the raw data has none), the
      // fill is the group median carried as an exact ×2 integer of
      // cents (values are 2dp money; the e22 median trick), and the
      // imputed double is one division — no interpolated-float
      // boundary anywhere. Median per group is a percentile over the
      // group's rows; the group-cardinality stats frame broadcasts.
      (s, dir) => {
        // pinned: the median agg and the fill join both read it —
        // unpinned the log scans twice
        val p = graft.Caches.trackedPersist(events(s, dir)
          .select(col("event_id"), col("event_type"),
            when(col("event_id") % 13 === 0, lit(null).cast("double"))
              .otherwise(col("value")).as("v"))
          .withColumn("_vc",
            (col("v").cast("decimal(12,2)") * 100).cast("long")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val m = p.filter(col("_vc").isNotNull).groupBy("event_type")
          .agg((expr("percentile(_vc, 0.5D)") * 2).cast("long").as("_m2"))
        p.join(broadcast(m), Seq("event_type"), "left")
          .select(col("event_id"), col("event_type"),
            coalesce(col("v"), col("_m2").cast("double") / lit(200.0))
              .as("value"),
            (col("v").isNull && col("_m2").isNotNull).as("was_imputed"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, event_type,
             |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v
             |  FROM events),
             |pc AS (
             |  SELECT event_id, event_type, v,
             |    CAST(CAST(v AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
             |  FROM p),
             |m AS (
             |  SELECT event_type, CAST(quantile_cont(vc, 0.5) * 2 AS BIGINT) AS m2
             |  FROM pc WHERE vc IS NOT NULL GROUP BY 1)
             |SELECT pc.event_id, pc.event_type,
             |  COALESCE(pc.v, CAST(m.m2 AS DOUBLE) / 200.0) AS value,
             |  (pc.v IS NULL AND m.m2 IS NOT NULL) AS was_imputed
             |FROM pc LEFT JOIN m USING (event_type)
             |ORDER BY event_id""".stripMargin)),

    QueryDef("fe1_category_index",
      // deterministic category indexing (the StringIndexer shape): each
      // (column, value) pair of the documents source/lang dimensions
      // gets a dense integer index by descending frequency (ties by
      // value) — the label-encoding step feeding embedding tables and
      // tree models, reproducible across runs/engines because the order
      // is a total (count desc, value) sort of a CARDINALITY-sized
      // frame, never the raw rows. All-integer.
      (s, dir) => {
        val d = docs(s, dir)
        def dim(c: String) = d.filter(col(c).isNotNull)
          .groupBy(col(c).cast("string").as("value"))
          .agg(count(lit(1)).as("n"))
          .withColumn("column", lit(c))
        dim("source").unionByName(dim("lang"))
          .withColumn("idx", row_number().over(Window.partitionBy("column")
            .orderBy(col("n").desc, col("value"))) - 1)
          .select(col("column"), col("value"), col("n"), col("idx"))
          .orderBy("column", "idx")
      },
      Some("""WITH s AS (
             |  SELECT 'source' AS "column", source AS value, count(*) AS n
             |  FROM documents WHERE source IS NOT NULL GROUP BY 2),
             |l AS (
             |  SELECT 'lang' AS "column", lang AS value, count(*) AS n
             |  FROM documents WHERE lang IS NOT NULL GROUP BY 2),
             |u AS (SELECT * FROM s UNION ALL SELECT * FROM l)
             |SELECT "column", value, n,
             |  CAST(row_number() OVER (PARTITION BY "column"
             |    ORDER BY n DESC, value) - 1 AS INTEGER) AS idx
             |FROM u ORDER BY "column", idx""".stripMargin)),

    QueryDef("split1_stump",
      // exact decision-stump split finding over the labeled embeddings
      // (dims 0–3): for every distinct-value boundary of each feature,
      // the weighted MISCLASSIFICATION count of the "x ≤ t" split —
      // the GBDT/tree split-finder primitive, with misclassification
      // (not Gini) as the objective precisely because it is an exact
      // INTEGER: argmin needs no cross-engine rational comparison.
      // Per-dim sorted windows build cumulative per-class counts in one
      // pass (10 running sums over one sort); tied feature values
      // can't host a split, so only rows where x < next(x) are
      // candidates; best-per-dim ties break (err, threshold).
      (s, dir) => {
        val labels = 0 to 9
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding").cast("array<double>")))
          .filter(col("pos") < 4)
          .select(col("vec_id"), col("label"), col("pos").as("dim"),
            col("col").as("x"))
        val w = Window.partitionBy("dim").orderBy(col("x"), col("vec_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val wl = Window.partitionBy("dim").orderBy(col("x"), col("vec_id"))
        var d = e
        for (c <- labels)
          d = d.withColumn(s"_c$c",
            sum(when(col("label") === c, 1L).otherwise(0L)).over(w))
        for (c <- labels)
          d = d.withColumn(s"_t$c", max(col(s"_c$c")).over(
            Window.partitionBy("dim")))
        d = d.withColumn("_rn", row_number().over(wl))
          .withColumn("_n", count(lit(1)).over(Window.partitionBy("dim")))
          .withColumn("_nx", lead(col("x"), 1).over(wl))
          .filter(col("_nx").isNotNull && col("x") < col("_nx"))
        val lmax = greatest(labels.map(c => col(s"_c$c")): _*)
        val rmax = greatest(labels.map(c => col(s"_t$c") - col(s"_c$c")): _*)
        val scored = d.withColumn("err",
            (col("_rn") - lmax) + (col("_n") - col("_rn") - rmax))
          .withColumn("_best", row_number().over(Window.partitionBy("dim")
            .orderBy(col("err"), col("x"), col("vec_id"))))
          .filter(col("_best") === 1)
        scored.select(col("dim"), col("x").as("threshold"),
            col("_rn").cast("long").as("n_left"), col("_n").as("n"),
            col("err").cast("long").as("err"))
          .orderBy("dim")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, label, generate_subscripts(v, 1) - 1 AS dim,
             |         unnest(v) AS x
             |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |        FROM embeddings)),
             |f AS (SELECT * FROM e WHERE dim < 4),
             |cum AS (
             |  SELECT vec_id, dim, x,
             |""".stripMargin +
        (0 to 9).map(c =>
          s"""    sum(CASE WHEN label = $c THEN 1 ELSE 0 END) OVER w AS c$c,
             |    CAST(sum(CASE WHEN label = $c THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY dim) AS BIGINT) AS t$c""".stripMargin)
          .mkString(",\n") + """,
             |    row_number() OVER wo AS rn,
             |    count(*) OVER (PARTITION BY dim) AS n,
             |    lead(x) OVER wo AS nx
             |  FROM f
             |  WINDOW w AS (PARTITION BY dim ORDER BY x, vec_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  wo AS (PARTITION BY dim ORDER BY x, vec_id)),
             |cand AS (
             |  SELECT dim, x, vec_id, rn, n,
             |    (rn - greatest(c0,c1,c2,c3,c4,c5,c6,c7,c8,c9))
             |    + (n - rn - greatest(t0-c0,t1-c1,t2-c2,t3-c3,t4-c4,
             |        t5-c5,t6-c6,t7-c7,t8-c8,t9-c9)) AS err
             |  FROM cum WHERE nx IS NOT NULL AND x < nx),
             |best AS (
             |  SELECT dim, x, rn, n, err,
             |    row_number() OVER (PARTITION BY dim
             |      ORDER BY err, x, vec_id) AS b
             |  FROM cand)
             |SELECT CAST(dim AS INTEGER) AS dim, x AS threshold,
             |  CAST(rn AS BIGINT) AS n_left, CAST(n AS BIGINT) AS n,
             |  CAST(err AS BIGINT) AS err
             |FROM best WHERE b = 1 ORDER BY dim""".stripMargin)),

    QueryDef("qq1_return_quantiles",
      // per-ticker vs pooled return deciles — the QQ-plot data behind
      // "does this entity's distribution match the market's" (the
      // per-entity drill-down of a27's KS sup). Every decile is an
      // exact ORDER STATISTIC (index ⌈d·n/10⌉, the a35 convention — no
      // interpolation) over 6dp-decimal returns, so both columns and
      // their diff are exact. The pooled ranking is exact-distributed
      // via [[graft.ops.RankOps.withGlobalRank]] (range-partitioned
      // sort + zipWithIndex) — no single-partition window (the r11
      // verdict's qq1 scale-tier item).
      (s, dir) => {
        // pinned: the per-ticker ranking, the pooled ranking's three
        // input evaluations (boundary sampling + count + data pass),
        // and the count aggregate all read this frame
        val x = graft.Caches.trackedPersist(
          pricesWithRet(s, dir).filter(col("ret").isNotNull)
            .select(col("ticker"), col("date"),
              round(col("ret"), 6).cast("decimal(10,6)").as("r6")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wt = Window.partitionBy("ticker").orderBy("r6", "date", "ticker")
        val deciles = s.range(1, 10)
          .select(col("id").cast("int").as("decile"))
        val tq = x
          .withColumn("_rt", row_number().over(wt))
          .withColumn("_nt", count(lit(1)).over(Window.partitionBy("ticker")))
          .join(broadcast(deciles),
            col("_rt") === expr("(decile * _nt + 9) div 10"))
          .select(col("ticker"), col("decile"),
            col("r6").cast("double").as("ticker_q"))
        val np = x.agg(count(lit(1)).as("_np"))
        val pq = graft.ops.RankOps.withGlobalRank(x,
            Seq(col("r6"), col("date"), col("ticker")), "_rp")
          .crossJoin(broadcast(np))
          .join(broadcast(deciles),
            col("_rp") === expr("(decile * _np + 9) div 10"))
          .select(col("decile").as("_d2"),
            col("r6").cast("double").as("pooled_q"))
        tq.join(broadcast(pq), col("decile") === col("_d2"))
          .select(col("ticker"), col("decile"), col("ticker_q"),
            col("pooled_q"),
            (col("ticker_q") - col("pooled_q")).as("diff"))
          .orderBy("ticker", "decile")
      },
      Some(pricesSql + retSql +
        """, x AS (
          |  SELECT ticker, "date", CAST(round(ret, 6) AS DECIMAL(10,6)) AS r6
          |  FROM r WHERE ret IS NOT NULL),
          |rk AS (
          |  SELECT ticker, r6,
          |    row_number() OVER (PARTITION BY ticker
          |      ORDER BY r6, "date", ticker) AS rt,
          |    count(*) OVER (PARTITION BY ticker) AS nt,
          |    row_number() OVER (ORDER BY r6, "date", ticker) AS rp,
          |    count(*) OVER () AS np
          |  FROM x),
          |d AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS decile),
          |tq AS (
          |  SELECT rk.ticker, d.decile, CAST(rk.r6 AS DOUBLE) AS ticker_q
          |  FROM rk CROSS JOIN d
          |  WHERE rk.rt = (d.decile * rk.nt + 9) // 10),
          |pq AS (
          |  SELECT d.decile, CAST(min(rk.r6) AS DOUBLE) AS pooled_q
          |  FROM rk CROSS JOIN d
          |  WHERE rk.rp = (d.decile * rk.np + 9) // 10
          |  GROUP BY 1)
          |SELECT tq.ticker, tq.decile, tq.ticker_q, pq.pooled_q,
          |  tq.ticker_q - pq.pooled_q AS diff
          |FROM tq JOIN pq USING (decile)
          |ORDER BY ticker, decile""".stripMargin)),

    QueryDef("e25_hill_tail",
      // Hill tail-index estimator over per-user activity: α = k /
      // Σ ln(x_(i)/x_(k+1)) across the top-k order statistics — "how
      // heavy is the power-law tail" as one number (the parametric
      // companion to e21's Gini; α ≤ 2 means variance doesn't exist
      // and a mean-based capacity plan is fiction). k = ⌈n/10⌉. Counts
      // and ranks exact; per-term lns round 6dp and sum in exact
      // decimal (the t20 fit contract); α is one division.
      // Scale shape: the whole estimator runs on the count-of-counts
      // HISTOGRAM (the e21 convention) — x_(k+1) is determined by
      // activity LEVELS alone (user_id tie-breaks never change the
      // VALUE at a rank), rows tied at x_(k+1) contribute ln(1)=0, so
      // the tail sum collapses to level-count × per-level 6dp terms.
      // The only window left is over distinct activity levels, bounded
      // by max-events-per-user, not users (the r11 verdict's e25
      // scale-tier item).
      (s, dir) => {
        val uc = events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("c"))
        // pinned: the total, the x_(k+1) probe, and the tail sum all
        // read the (tiny) histogram — unpinned the event log would
        // aggregate three times
        val lv = graft.Caches.trackedPersist(
          uc.groupBy("c").agg(count(lit(1)).as("_lm")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nk = lv.agg(sum(col("_lm")).as("_n"))
          .withColumn("_k", expr("(_n + 9) div 10"))
        val wL = Window.orderBy(col("c").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = lv.withColumn("_cum", sum(col("_lm")).over(wL))
          .crossJoin(broadcast(nk))
        // the level holding rank k+1 in (c desc, user) order = x_(k+1)
        val xmin = cum.filter(col("_cum") >= col("_k") + 1 &&
            col("_cum") - col("_lm") <= col("_k"))
          .select(col("c").as("_cmin"))
        cum.crossJoin(broadcast(xmin))
          .filter(col("c") >= col("_cmin"))
          .select(when(col("c") > col("_cmin"),
              col("_lm") * round(log(col("c").cast("double") /
                col("_cmin").cast("double")), 6).cast("decimal(14,6)"))
            .otherwise(lit(0).cast("decimal(14,6)")).as("_t"), col("_k"))
          .groupBy(col("_k").as("k"))
          .agg(round(col("k").cast("double") /
            sum(col("_t").cast("decimal(20,6)")).cast("double"), 6)
            .as("alpha"))
          .select(col("k"), col("alpha"))
      },
      Some("""WITH uc AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
             |rk AS (
             |  SELECT c,
             |    row_number() OVER (ORDER BY c DESC, user_id) AS r,
             |    count(*) OVER () AS n,
             |    (count(*) OVER () + 9) // 10 AS k
             |  FROM uc),
             |xm AS (SELECT c AS cmin FROM rk WHERE r = k + 1),
             |t AS (
             |  SELECT rk.k,
             |    round(ln(CAST(rk.c AS DOUBLE) / CAST(xm.cmin AS DOUBLE)), 6)
             |      AS t
             |  FROM rk CROSS JOIN xm WHERE rk.r <= rk.k)
             |SELECT CAST(k AS BIGINT) AS k,
             |  round(CAST(k AS DOUBLE)
             |    / CAST(SUM(CAST(t AS DECIMAL(20,6))) AS DOUBLE), 6) AS alpha
             |FROM t GROUP BY k""".stripMargin)),

    QueryDef("e26_new_vs_returning",
      // weekly growth decomposition: active users split into NEW (first
      // ever seen that week — the t23 first-sighting hash agg, never a
      // running distinct) and RETURNING, plus the returning share. The
      // growth-accounting companion to e10's retention matrix.
      // All-integer; one division per week.
      (s, dir) => {
        // pinned (user, week) distinct: active counts AND first-
        // sightings derive from it — unpinned the log scans twice
        val base = graft.Caches.trackedPersist(events(s, dir)
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
          .distinct(),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val act = base.groupBy("wk").agg(count(lit(1)).as("active"))
        val nw = base.groupBy("user_id").agg(min(col("wk")).as("wk"))
          .groupBy("wk").agg(count(lit(1)).as("new_users"))
        act.join(broadcast(nw), Seq("wk"), "left")
          .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
          .select(col("wk").as("week"), col("active"), col("new_users"),
            (col("active") - col("new_users")).as("returning"),
            round((col("active") - col("new_users")).cast("double") /
              col("active").cast("double"), 6).as("returning_share"))
          .orderBy("week")
      },
      Some("""WITH e AS (
             |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
             |  FROM events),
             |act AS (SELECT wk, count(*) AS active
             |        FROM (SELECT DISTINCT user_id, wk FROM e) GROUP BY 1),
             |nw AS (
             |  SELECT wk, count(*) AS new_users FROM (
             |    SELECT user_id, min(wk) AS wk FROM e GROUP BY 1) GROUP BY 1)
             |SELECT act.wk AS week, act.active,
             |  COALESCE(nw.new_users, 0) AS new_users,
             |  act.active - COALESCE(nw.new_users, 0) AS returning,
             |  round(CAST(act.active - COALESCE(nw.new_users, 0) AS DOUBLE)
             |    / CAST(act.active AS DOUBLE), 6) AS returning_share
             |FROM act LEFT JOIN nw USING (wk) ORDER BY week""".stripMargin)),

    QueryDef("w43_ar1_halflife",
      // mean-reversion half-life from a per-ticker AR(1) fit on price
      // LEVELS: y_t = a + b·y_{t−1} in exact integer cents (co-moments
      // Σx, Σy, Σxy, Σx² are exact decimals), slope b and intercept by
      // the closed-form OLS IEEE chain, and half-life = −ln2/ln(b) for
      // mean-reverting 0 < b < 1 (NULL otherwise — a random walk has
      // none). The Ornstein–Uhlenbeck companion to w41's variance
      // ratio: "IF this reverts, how fast".
      (s, dir) => {
        val wd = Window.partitionBy("ticker").orderBy("date")
        val p = prices(t(s, dir, "lineitem"))
          .select(col("ticker"), col("date"),
            (col("close").cast("decimal(12,2)") * 100).cast("long").as("y"))
          .withColumn("x", lag(col("y"), 1).over(wd))
          .filter(col("x").isNotNull)
        val a = p.groupBy("ticker").agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("_sx"), sum(col("y")).as("_sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("_sxy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("_sxx"))
        val b = (col("_sxy") * col("n") -
            col("_sx").cast("decimal(38,0)") * col("_sy")).cast("double") /
          (col("_sxx") * col("n") -
            col("_sx").cast("decimal(38,0)") * col("_sx")).cast("double")
        a.filter(col("n") >= 3)
          .withColumn("b", round(b, 6))
          .select(col("ticker"), col("n"), col("b"),
            when(col("b") > 0 && col("b") < 1,
              round(-log(lit(2.0)) / log(col("b")), 6)).as("half_life_days"))
          .orderBy("ticker")
      },
      Some(pricesSql +
        """, c AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
          |  FROM prices),
          |l AS (
          |  SELECT ticker, y,
          |    lag(y) OVER (PARTITION BY ticker ORDER BY "date") AS x
          |  FROM c),
          |a AS (
          |  SELECT ticker, count(*) AS n,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |    sum(CAST(x AS HUGEINT) * y) AS sxy,
          |    sum(CAST(x AS HUGEINT) * x) AS sxx
          |  FROM l WHERE x IS NOT NULL GROUP BY 1),
          |f AS (
          |  SELECT ticker, n,
          |    round(CAST(sxy * n - CAST(sx AS HUGEINT) * sy AS DOUBLE)
          |      / CAST(sxx * n - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6) AS b
          |  FROM a WHERE n >= 3)
          |SELECT ticker, n, b,
          |  CASE WHEN b > 0 AND b < 1
          |       THEN round(-ln(2.0) / ln(b), 6) END AS half_life_days
          |FROM f ORDER BY ticker""".stripMargin)),

    QueryDef("pat1_candlestick",
      // candlestick pattern flags over the daily OHLC bars ([[Q
      // .ohlcBars]]): doji (body ≤ 10% of range), hammer (lower shadow
      // ≥ 2×body, upper ≤ body) and bullish/bearish engulfing (body
      // swallows yesterday's opposite-color body) — the rule-based TA
      // screens w11/w15/w24 chart around. EVERY decision is an integer
      // comparison in exact cents (the 10% test cross-multiplies —
      // no float touches a flag); the one window is the w-family
      // per-ticker lag. Only flagged bars ship.
      (s, dir) => {
        val wd = Window.partitionBy("ticker").orderBy("date")
        def cents(c: String) =
          (col(c).cast("decimal(12,2)") * 100).cast("long").as(s"_$c")
        val b = Q.ohlcBars(t(s, dir, "lineitem"))
          .select(Seq(col("ticker"), col("date")) ++
            Seq("open", "high", "low", "close").map(cents): _*)
          .withColumn("_po", lag(col("_open"), 1).over(wd))
          .withColumn("_pc", lag(col("_close"), 1).over(wd))
        val body = abs(col("_close") - col("_open"))
        val rng = col("_high") - col("_low")
        val upper = col("_high") - greatest(col("_open"), col("_close"))
        val lower = least(col("_open"), col("_close")) - col("_low")
        val doji = rng > 0 && body * 10 <= rng
        val hammer = rng > 0 && lower >= body * 2 && upper <= body
        val bull = col("_po").isNotNull && col("_pc") < col("_po") &&
          col("_close") > col("_open") &&
          col("_open") <= col("_pc") && col("_close") >= col("_po")
        val bear = col("_po").isNotNull && col("_pc") > col("_po") &&
          col("_close") < col("_open") &&
          col("_open") >= col("_pc") && col("_close") <= col("_po")
        b.withColumn("doji", doji).withColumn("hammer", hammer)
          .withColumn("bull_engulf", bull).withColumn("bear_engulf", bear)
          .filter(col("doji") || col("hammer") ||
            col("bull_engulf") || col("bear_engulf"))
          .select(col("ticker"), col("date"),
            (col("_open").cast("double") / 100).as("open"),
            (col("_high").cast("double") / 100).as("high"),
            (col("_low").cast("double") / 100).as("low"),
            (col("_close").cast("double") / 100).as("close"),
            col("doji"), col("hammer"), col("bull_engulf"), col("bear_engulf"))
          .orderBy("ticker", "date")
      },
      Some(Q.ohlcSql +
        """, c AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(open AS DECIMAL(12,2)) * 100 AS BIGINT) AS o,
          |    CAST(CAST(high AS DECIMAL(12,2)) * 100 AS BIGINT) AS h,
          |    CAST(CAST(low AS DECIMAL(12,2)) * 100 AS BIGINT) AS l,
          |    CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT) AS cl
          |  FROM bars),
          |x AS (
          |  SELECT ticker, "date", o, h, l, cl,
          |    lag(o) OVER w AS po, lag(cl) OVER w AS pc,
          |    abs(cl - o) AS body, h - l AS rng,
          |    h - greatest(o, cl) AS up, least(o, cl) - l AS lo
          |  FROM c WINDOW w AS (PARTITION BY ticker ORDER BY "date")),
          |f AS (
          |  SELECT ticker, "date",
          |    CAST(o AS DOUBLE) / 100 AS open, CAST(h AS DOUBLE) / 100 AS high,
          |    CAST(l AS DOUBLE) / 100 AS low, CAST(cl AS DOUBLE) / 100 AS close,
          |    (rng > 0 AND body * 10 <= rng) AS doji,
          |    (rng > 0 AND lo >= body * 2 AND up <= body) AS hammer,
          |    (po IS NOT NULL AND pc < po AND cl > o
          |      AND o <= pc AND cl >= po) AS bull_engulf,
          |    (po IS NOT NULL AND pc > po AND cl < o
          |      AND o >= pc AND cl <= po) AS bear_engulf
          |  FROM x)
          |SELECT * FROM f
          |WHERE doji OR hammer OR bull_engulf OR bear_engulf
          |ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("dq1_scorecard",
      // one-row-per-table data-quality scorecard: row count, exact
      // full-row duplicate count, total null cells and the null rate —
      // the warehouse-wide roll-up the per-table a1/a2 audits feed.
      // Each table costs ONE scan for the fused null/row counts (the
      // a1 single-pass shape) plus one distinct for exact dup rows;
      // rates are single divisions of exact longs.
      (s, dir) => {
        def one(name: String, cols: Seq[String]) = {
          val df = t(s, dir, name)
          val nullCells = cols.map(c =>
            sum(when(col(c).isNull, 1L).otherwise(0L))).reduce(_ + _)
          df.agg(count(lit(1)).as("n_rows"), nullCells.as("null_cells"))
            .crossJoin(
              df.distinct().agg(count(lit(1)).as("_nd")))
            .select(lit(name).as("table_name"), col("n_rows"),
              (col("n_rows") - col("_nd")).as("dup_rows"),
              col("null_cells"), lit(cols.size).as("n_cols"),
              round(col("null_cells").cast("double") /
                (col("n_rows") * cols.size).cast("double"), 6)
                .as("null_rate"))
        }
        Seq(
          one("customer", Seq("c_custkey", "c_name", "c_nationkey",
            "c_acctbal", "c_mktsegment")),
          one("documents", Seq("doc_id", "text", "lang", "source", "n_chars")),
          one("events", Seq("event_id", "ts", "user_id", "event_type",
            "value", "props")),
          one("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey",
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")),
          one("orders", Seq("o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority"))
        ).reduce(_ unionByName _).orderBy("table_name")
      },
      Some {
        def sql(name: String, cols: Seq[String]) = {
          val nulls = cols.map(c =>
            s"SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)").mkString(" + ")
          s"""SELECT '$name' AS table_name, count(*) AS n_rows,
             |  count(*) - (SELECT count(*) FROM (SELECT DISTINCT * FROM $name))
             |    AS dup_rows,
             |  CAST($nulls AS BIGINT) AS null_cells,
             |  CAST(${cols.size} AS INTEGER) AS n_cols,
             |  round(CAST($nulls AS DOUBLE)
             |    / CAST(count(*) * ${cols.size} AS DOUBLE), 6) AS null_rate
             |FROM $name""".stripMargin
        }
        Seq(
          sql("customer", Seq("c_custkey", "c_name", "c_nationkey",
            "c_acctbal", "c_mktsegment")),
          sql("documents", Seq("doc_id", "text", "lang", "source", "n_chars")),
          sql("events", Seq("event_id", "ts", "user_id", "event_type",
            "value", "props")),
          sql("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey",
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")),
          sql("orders", Seq("o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority"))
        ).mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
      }),

    QueryDef("w44_capture_ratios",
      // up-market / down-market capture ratios per ticker vs the
      // equal-cap index (w37's market construction): mean ticker
      // return over index-up days divided by the index's own up-day
      // mean, same for down days — "does this name amplify rallies or
      // cushion drawdowns". All moments are exact µunit integer sums
      // split by an exact sign test on the index return; each ratio is
      // a fixed IEEE chain, 6dp.
      (s, dir) => {
        // pinned: the index construction and the per-ticker returns
        // both read the daily price frame — unpinned the lineitem agg
        // runs twice
        val p = graft.Caches.trackedPersist(prices(t(s, dir, "lineitem")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wD = Window.orderBy("date")
        val mret = p.groupBy("date")
          .agg(sum(col("close").cast("decimal(12,2)")).cast("decimal(18,2)")
            .as("_ic"))
          .withColumn("m", (round(col("_ic").cast("double") /
            lag(col("_ic"), 1).over(wD).cast("double") - 1, 6)
            .cast("decimal(10,6)") * 1000000).cast("long"))
          .filter(col("m").isNotNull).select("date", "m")
        val tret = p
          .withColumn("ret", col("close") / lag("close", 1).over(wTicker) - 1)
          .filter(col("ret").isNotNull)
          .select(col("ticker"), col("date"),
            (round(col("ret"), 6).cast("decimal(10,6)") * 1000000)
              .cast("long").as("y"))
        val j = tret.join(mret, "date").filter(col("m") =!= 0)
        val up = col("m") > 0
        val a = j.groupBy("ticker").agg(
          sum(when(up, 1L).otherwise(0L)).as("n_up"),
          sum(when(up, col("y"))).as("_syu"),
          sum(when(up, col("m"))).as("_smu"),
          sum(when(!up, 1L).otherwise(0L)).as("n_down"),
          sum(when(!up, col("y"))).as("_syd"),
          sum(when(!up, col("m"))).as("_smd"))
        a.filter(col("n_up") >= 1 && col("n_down") >= 1 &&
            col("_smu") =!= 0 && col("_smd") =!= 0)
          .select(col("ticker"), col("n_up"), col("n_down"),
            round(col("_syu").cast("double") / col("_smu").cast("double"), 6)
              .as("up_capture"),
            round(col("_syd").cast("double") / col("_smd").cast("double"), 6)
              .as("down_capture"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, ic AS (
          |  SELECT "date", CAST(sum(CAST(close AS DECIMAL(12,2)))
          |    AS DECIMAL(18,2)) AS ic
          |  FROM prices GROUP BY 1),
          |mr AS (
          |  SELECT "date",
          |    CAST(CAST(round(CAST(ic AS DOUBLE)
          |        / CAST(lag(ic) OVER (ORDER BY "date") AS DOUBLE) - 1, 6)
          |      AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS m
          |  FROM ic),
          |tr AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(round(ret, 6) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS y
          |  FROM r WHERE ret IS NOT NULL),
          |j AS (
          |  SELECT tr.ticker, tr.y, mr.m FROM tr JOIN mr USING ("date")
          |  WHERE mr.m IS NOT NULL AND mr.m <> 0),
          |a AS (
          |  SELECT ticker,
          |    CAST(count(CASE WHEN m > 0 THEN 1 END) AS BIGINT) AS n_up,
          |    CAST(sum(CASE WHEN m > 0 THEN y END) AS BIGINT) AS syu,
          |    CAST(sum(CASE WHEN m > 0 THEN m END) AS BIGINT) AS smu,
          |    CAST(count(CASE WHEN m < 0 THEN 1 END) AS BIGINT) AS n_down,
          |    CAST(sum(CASE WHEN m < 0 THEN y END) AS BIGINT) AS syd,
          |    CAST(sum(CASE WHEN m < 0 THEN m END) AS BIGINT) AS smd
          |  FROM j GROUP BY 1)
          |SELECT ticker, n_up, n_down,
          |  round(CAST(syu AS DOUBLE) / CAST(smu AS DOUBLE), 6) AS up_capture,
          |  round(CAST(syd AS DOUBLE) / CAST(smd AS DOUBLE), 6) AS down_capture
          |FROM a WHERE n_up >= 1 AND n_down >= 1 AND smu <> 0 AND smd <> 0
          |ORDER BY ticker""".stripMargin)),

    QueryDef("a38_lorenz_curve",
      // Lorenz curve of supplier revenue concentration: for each
      // decile of suppliers (ranked by revenue ascending), the
      // cumulative share of total revenue — the curve whose area gap
      // a24's Gini integrates, as plottable points. Revenue is exact
      // decimal; the decile boundary is the ⌈d·n/10⌉ order statistic
      // (a35 convention); shares are single divisions. Rank and
      // running revenue come from the distributed exact prefix sum
      // ([[graft.ops.RankOps.withGlobalPrefixSums]] — exact-decimal
      // addition is associative, so the per-partition split cannot
      // change any cumulative value); no single-partition window.
      (s, dir) => {
        // pinned: totals + the two prefix-sum passes read it
        val rev = graft.Caches.trackedPersist(t(s, dir, "lineitem")
            .groupBy(col("l_suppkey").as("supp"))
            .agg(sum(col("l_extendedprice").cast("decimal(12,4)")).as("_r")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = rev.agg(count(lit(1)).as("_n"), sum(col("_r")).as("_tot"))
        val ranked = graft.ops.RankOps.withGlobalPrefixSums(rev,
            Seq(col("_r"), col("supp")), Seq("_r"), Seq("_cum"),
            rankCol = Some("_rn"))
          .crossJoin(broadcast(tot))
        ranked.join(broadcast(s.range(1, 11)
            .select(col("id").cast("int").as("decile"))),
            col("_rn") === expr("(decile * _n + 9) div 10"))
          .select(col("decile"), col("_rn").cast("long").as("n_suppliers"),
            round(col("_cum").cast("double") / col("_tot").cast("double"), 6)
              .as("cum_revenue_share"))
          .orderBy("decile")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey AS supp,
             |         SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS r
             |  FROM lineitem GROUP BY 1),
             |rk AS (
             |  SELECT supp, r,
             |    row_number() OVER w AS rn,
             |    sum(r) OVER (ORDER BY r, supp
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    count(*) OVER () AS n, sum(r) OVER () AS tot
             |  FROM rev WINDOW w AS (ORDER BY r, supp)),
             |d AS (SELECT unnest([1,2,3,4,5,6,7,8,9,10]) AS decile)
             |SELECT d.decile, CAST(rk.rn AS BIGINT) AS n_suppliers,
             |  round(CAST(rk.cum AS DOUBLE) / CAST(rk.tot AS DOUBLE), 6)
             |    AS cum_revenue_share
             |FROM rk JOIN d ON rk.rn = (d.decile * rk.n + 9) // 10
             |ORDER BY decile""".stripMargin)),

    QueryDef("mix3_source_dup_rates",
      // per-source duplication scorecard: exact-duplicate rate (md5 of
      // the raw text — the d1 key) and the WITHIN-source share of
      // cross-corpus duplicate groups, the "which feed is reposting"
      // attribution that decides d8-style source caps. All-integer
      // counts off two hash aggs; rates are single divisions.
      (s, dir) => {
        val d = docs(s, dir).filter(col("text").isNotNull)
          .select(col("source"), md5(col("text")).as("_h"))
        val g = d.groupBy("source", "_h").agg(count(lit(1)).as("_c"))
        g.groupBy("source").agg(
            sum(col("_c")).as("n_docs"),
            count(lit(1)).as("n_distinct"),
            sum(col("_c") - 1).as("n_dup_docs"))
          .select(col("source"), col("n_docs"), col("n_distinct"),
            col("n_dup_docs"),
            round(col("n_dup_docs").cast("double") /
              col("n_docs").cast("double"), 6).as("dup_rate"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT source, md5(text) AS h FROM documents
             |  WHERE text IS NOT NULL),
             |g AS (SELECT source, h, count(*) AS c FROM d GROUP BY 1, 2)
             |SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
             |  count(*) AS n_distinct,
             |  CAST(sum(c - 1) AS BIGINT) AS n_dup_docs,
             |  round(CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
             |    AS dup_rate
             |FROM g GROUP BY 1 ORDER BY source""".stripMargin)),

    QueryDef("eval9_ece",
      // expected calibration error: eval3's reliability diagram rolled
      // up to ONE number, ECE = Σ_b (n_b/N)·|observed − predicted| —
      // the miscalibration scalar a model card quotes. Both per-bucket
      // rates enter as their 6dp-ROUNDED decimals (eval3's published
      // values), so the weighted |gap| sum is exact decimal and the
      // final /N the only IEEE op.
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
          buckets = 1 << 16, hash = D.md5Hash60)
        val lab = d.select(col("doc_id"), (col("lang") === "en").cast("long").as("_y"))
        val buckets = scored.join(lab, "doc_id")
          .groupBy(least(floor(col("score") * 10), lit(9)).cast("int").as("bucket"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("score")), 6).cast("decimal(10,6)").as("_ms"),
            (round(sum(col("_y")).cast("double") / count(lit(1)), 6))
              .cast("decimal(10,6)").as("_fp"))
        buckets.agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_docs"),
            round(sum(col("n") * abs(col("_fp") - col("_ms"))).cast("double") /
              sum(col("n")).cast("double"), 6).as("ece"))
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6) AS score,
          |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |b AS (
          |  SELECT least(floor(score * 10), 9) AS bucket, count(*) AS n,
          |    CAST(round(avg(score), 6) AS DECIMAL(10,6)) AS ms,
          |    CAST(round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS DECIMAL(10,6))
          |      AS fp
          |  FROM scored GROUP BY 1)
          |SELECT count(*) AS n_buckets, CAST(sum(n) AS BIGINT) AS n_docs,
          |  round(CAST(sum(n * abs(fp - ms)) AS DOUBLE)
          |    / CAST(sum(n) AS DOUBLE), 6) AS ece
          |FROM b""".stripMargin)),

    QueryDef("priv1_k_anonymity",
      // k-anonymity audit over the customer quasi-identifiers
      // (mktsegment × nation): for k ∈ {2, 5, 10}, how many customers
      // sit in an equivalence class smaller than k — the re-
      // identification risk screen a dataset release runs before
      // publishing (Sweeney 2002). Class sizes are one hash agg; the
      // k-sweep reads the class-cardinality frame; all-integer counts,
      // one division per rate.
      (s, dir) => {
        val g = graft.Caches.trackedPersist(t(s, dir, "customer")
          .groupBy(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"))
          .agg(count(lit(1)).as("_m")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ks = s.range(0, 3).select(
          element_at(array(lit(2), lit(5), lit(10)),
            (col("id") + 1).cast("int")).as("k"))
        g.crossJoin(broadcast(ks))
          .groupBy("k")
          .agg(sum(col("_m")).as("n_rows"),
            count(lit(1)).as("n_classes"),
            sum(when(col("_m") < col("k"), col("_m")).otherwise(0L))
              .as("rows_at_risk"),
            sum(when(col("_m") < col("k"), 1L).otherwise(0L))
              .as("classes_at_risk"),
            min(col("_m")).as("min_class"))
          .withColumn("risk_rate", round(col("rows_at_risk").cast("double") /
            col("n_rows").cast("double"), 6))
          .orderBy("k")
      },
      Some("""WITH g AS (
             |  SELECT c_mktsegment AS seg, c_nationkey AS nat,
             |         count(*) AS m
             |  FROM customer GROUP BY 1, 2),
             |ks AS (SELECT unnest([2, 5, 10]) AS k)
             |SELECT k, CAST(sum(m) AS BIGINT) AS n_rows,
             |  count(*) AS n_classes,
             |  CAST(sum(CASE WHEN m < k THEN m ELSE 0 END) AS BIGINT)
             |    AS rows_at_risk,
             |  CAST(sum(CASE WHEN m < k THEN 1 ELSE 0 END) AS BIGINT)
             |    AS classes_at_risk,
             |  CAST(min(m) AS BIGINT) AS min_class,
             |  round(CAST(sum(CASE WHEN m < k THEN m ELSE 0 END) AS DOUBLE)
             |    / CAST(sum(m) AS DOUBLE), 6) AS risk_rate
             |FROM g CROSS JOIN ks GROUP BY k ORDER BY k""".stripMargin)),

    QueryDef("fcst1_baseline_eval",
      // forecast-baseline scoreboard per ticker: MAE / RMSE / MAPE of
      // the two standard naive forecasts — "yesterday's close" and the
      // trailing 5-day mean — the benchmark row every real model (w27
      // Holt, w31 Kalman) must beat to justify itself. Errors are
      // exact cent integers (the 5-day mean forecast is kept as an
      // exact ×5-scaled integer: e5 = 5·y − Σ₅prev, so |e5|/5 only
      // becomes float once); MAE/RMSE are divisions of exact decimal
      // sums; MAPE's per-row ratio rounds 6dp and sums in exact
      // decimal (the t20 contract).
      (s, dir) => {
        val wd = Window.partitionBy("ticker").orderBy("date")
        val p = prices(t(s, dir, "lineitem"))
          .select(col("ticker"), col("date"),
            (col("close").cast("decimal(12,2)") * 100).cast("long").as("y"))
          .withColumn("_prev", lag(col("y"), 1).over(wd))
          .withColumn("_s5", sum(col("y")).over(wd.rowsBetween(-5, -1)))
          .withColumn("_n5", count(col("y")).over(wd.rowsBetween(-5, -1)))
          .filter(col("_prev").isNotNull && col("_n5") === 5)
        val scored = p
          .withColumn("_e1", abs(col("y") - col("_prev")))
          .withColumn("_e5", abs(col("y") * 5 - col("_s5")))
        scored.groupBy("ticker").agg(
            count(lit(1)).as("n"),
            (sum(col("_e1")).cast("double") /
              (count(lit(1)) * 100).cast("double")).as("mae_naive"),
            (sqrt(sum(col("_e1").cast("decimal(38,0)") * col("_e1"))
              .cast("double") / count(lit(1)).cast("double")) / 100.0)
              .as("rmse_naive"),
            (sum(round(col("_e1").cast("double") / col("y").cast("double"), 6)
              .cast("decimal(16,6)")).cast("double") /
              count(lit(1)).cast("double")).as("mape_naive"),
            (sum(col("_e5")).cast("double") /
              (count(lit(1)) * 500).cast("double")).as("mae_ma5"),
            (sqrt(sum(col("_e5").cast("decimal(38,0)") * col("_e5"))
              .cast("double") / count(lit(1)).cast("double")) / 500.0)
              .as("rmse_ma5"),
            (sum(round(col("_e5").cast("double") /
              (col("y") * 5).cast("double"), 6).cast("decimal(16,6)"))
              .cast("double") / count(lit(1)).cast("double")).as("mape_ma5"))
          .select(col("ticker"), col("n"),
            round(col("mae_naive"), 6).as("mae_naive"),
            round(col("rmse_naive"), 6).as("rmse_naive"),
            round(col("mape_naive"), 6).as("mape_naive"),
            round(col("mae_ma5"), 6).as("mae_ma5"),
            round(col("rmse_ma5"), 6).as("rmse_ma5"),
            round(col("mape_ma5"), 6).as("mape_ma5"))
          .orderBy("ticker")
      },
      Some(pricesSql +
        """, c AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
          |  FROM prices),
          |l AS (
          |  SELECT ticker, y,
          |    lag(y) OVER w AS prev,
          |    sum(y) OVER (PARTITION BY ticker ORDER BY "date"
          |      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS s5,
          |    count(y) OVER (PARTITION BY ticker ORDER BY "date"
          |      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS n5
          |  FROM c WINDOW w AS (PARTITION BY ticker ORDER BY "date")),
          |e AS (
          |  SELECT ticker, y, abs(y - prev) AS e1, abs(y * 5 - s5) AS e5
          |  FROM l WHERE prev IS NOT NULL AND n5 = 5)
          |SELECT ticker, count(*) AS n,
          |  round(CAST(sum(e1) AS DOUBLE) / CAST(count(*) * 100 AS DOUBLE), 6)
          |    AS mae_naive,
          |  round(sqrt(CAST(sum(CAST(e1 AS HUGEINT) * e1) AS DOUBLE)
          |    / CAST(count(*) AS DOUBLE)) / 100.0, 6) AS rmse_naive,
          |  round(CAST(SUM(CAST(round(CAST(e1 AS DOUBLE) / CAST(y AS DOUBLE), 6)
          |      AS DECIMAL(16,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
          |    AS mape_naive,
          |  round(CAST(sum(e5) AS DOUBLE) / CAST(count(*) * 500 AS DOUBLE), 6)
          |    AS mae_ma5,
          |  round(sqrt(CAST(sum(CAST(e5 AS HUGEINT) * e5) AS DOUBLE)
          |    / CAST(count(*) AS DOUBLE)) / 500.0, 6) AS rmse_ma5,
          |  round(CAST(SUM(CAST(round(CAST(e5 AS DOUBLE) / CAST(y * 5 AS DOUBLE), 6)
          |      AS DECIMAL(16,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
          |    AS mape_ma5
          |FROM e GROUP BY ticker ORDER BY ticker""".stripMargin)),

    QueryDef("w45_pairs_spread",
      // formation → signal: the single closest pairs1 pair traded as a
      // spread — daily normalized-path difference with its 20-day
      // rolling z-score (|z| > 2 is the classic entry). The spread is
      // an exact µunit integer (pairs1's floor-division paths), the
      // rolling moments are exact integer window sums, z is one IEEE
      // chain (6dp), and the winning pair is a broadcast 1-row join —
      // formation cost is pairs1's, signal cost one bounded window.
      (s, dir) => {
        val p = graft.Caches.trackedPersist(prices(t(s, dir, "lineitem"))
          .filter(col("ticker") < 50)
          .select(col("ticker"), col("date"),
            (col("close").cast("decimal(12,2)") * 100).cast("long").as("c"))
          .withColumn("nrm",
            expr("(c * 1000000L) div first(c) OVER " +
              "(PARTITION BY ticker ORDER BY date " +
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
          .select(col("ticker"), col("date"), col("nrm")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val a = p.select(col("ticker").as("ta"), col("date"), col("nrm").as("na"))
        val b = p.select(col("ticker").as("tb"), col("date"), col("nrm").as("nb"))
        val joined = a.join(b, Seq("date")).filter(col("ta") < col("tb"))
        val best = joined
          .withColumn("_d", col("na") - col("nb"))
          .groupBy("ta", "tb")
          .agg(sum(col("_d").cast("decimal(38,0)") * col("_d")).as("_ssd"))
          .orderBy(col("_ssd").cast("double"), col("ta"), col("tb")).limit(1)
          .select(col("ta").as("_bta"), col("tb").as("_btb"))
        val w20 = Window.orderBy("date").rowsBetween(-19, 0)
        joined.join(broadcast(best),
            col("ta") === col("_bta") && col("tb") === col("_btb"))
          .withColumn("spread", col("na") - col("nb"))
          .withColumn("_n", count(lit(1)).over(w20))
          .withColumn("_s", sum(col("spread")).over(w20))
          .withColumn("_q",
            sum(col("spread").cast("decimal(38,0)") * col("spread")).over(w20))
          .select(col("ta"), col("tb"), col("date"), col("spread"),
            when(col("_n") === 20 &&
                col("_q") * 20 > col("_s").cast("decimal(38,0)") * col("_s"),
              round((col("spread").cast("double") -
                col("_s").cast("double") / 20.0) /
                sqrt((col("_q") * 20 -
                  col("_s").cast("decimal(38,0)") * col("_s")).cast("double") /
                  (20.0 * 19.0)), 6)).as("z20"))
          .orderBy("date")
      },
      Some(pricesSql +
        """, c AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
          |  FROM prices WHERE ticker < 50),
          |n AS (
          |  SELECT ticker, "date",
          |    (c * 1000000) // first(c) OVER (PARTITION BY ticker ORDER BY "date"
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nrm
          |  FROM c),
          |j AS (
          |  SELECT a.ticker AS ta, b.ticker AS tb, a."date",
          |         a.nrm AS na, b.nrm AS nb
          |  FROM n a JOIN n b ON a."date" = b."date" AND a.ticker < b.ticker),
          |best AS (
          |  SELECT ta, tb,
          |    sum(CAST(na - nb AS HUGEINT) * (na - nb)) AS ssd
          |  FROM j GROUP BY 1, 2
          |  ORDER BY CAST(ssd AS DOUBLE), ta, tb LIMIT 1),
          |sp AS (
          |  SELECT j.ta, j.tb, j."date", j.na - j.nb AS spread
          |  FROM j JOIN best USING (ta, tb)),
          |z AS (
          |  SELECT ta, tb, "date", spread,
          |    count(*) OVER w AS n,
          |    CAST(sum(spread) OVER w AS BIGINT) AS s,
          |    sum(CAST(spread AS HUGEINT) * spread) OVER w AS q
          |  FROM sp
          |  WINDOW w AS (ORDER BY "date"
          |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
          |SELECT ta, tb, "date", spread,
          |  CASE WHEN n = 20 AND q * 20 > CAST(s AS HUGEINT) * s THEN
          |    round((CAST(spread AS DOUBLE) - CAST(s AS DOUBLE) / 20.0)
          |      / sqrt(CAST(q * 20 - CAST(s AS HUGEINT) * s AS DOUBLE)
          |             / (20.0 * 19.0)), 6)
          |  END AS z20
          |FROM z ORDER BY "date"""".stripMargin)),

    QueryDef("priv2_l_diversity",
      // l-diversity audit (Machanavajjhala 2007): within each nation
      // (the quasi-identifier class), how many DISTINCT market
      // segments (the sensitive attribute) appear — a class where
      // everyone shares one segment leaks it even when k-anonymous.
      // Flags classes below l = 3. Two hash aggs, all-integer.
      (s, dir) => {
        t(s, dir, "customer")
          .groupBy(col("c_nationkey").as("nation"),
            col("c_mktsegment").as("_seg"))
          .agg(count(lit(1)).as("_m"))
          .groupBy("nation")
          .agg(sum(col("_m")).as("n_rows"),
            count(lit(1)).as("distinct_sensitive"),
            max(col("_m")).as("max_segment_rows"))
          .withColumn("below_l3", col("distinct_sensitive") < 3)
          .withColumn("dominance", round(col("max_segment_rows").cast("double") /
            col("n_rows").cast("double"), 6))
          .orderBy("nation")
      },
      Some("""WITH g AS (
             |  SELECT c_nationkey AS nation, c_mktsegment AS seg,
             |         count(*) AS m
             |  FROM customer GROUP BY 1, 2)
             |SELECT nation, CAST(sum(m) AS BIGINT) AS n_rows,
             |  count(*) AS distinct_sensitive,
             |  CAST(max(m) AS BIGINT) AS max_segment_rows,
             |  (count(*) < 3) AS below_l3,
             |  round(CAST(max(m) AS DOUBLE) / CAST(sum(m) AS DOUBLE), 6)
             |    AS dominance
             |FROM g GROUP BY 1 ORDER BY nation""".stripMargin)),

    QueryDef("t26_boilerplate_lines",
      // boilerplate census: the 20 most document-frequent trimmed lines
      // (≥ 10 chars) across the corpus with doc-frequency share — the
      // report that DECIDES what d14's duplicate-line removal will cut
      // (nav bars and cookie banners surface here first). One explode +
      // distinct + hash agg; top-20 is TakeOrdered with a total
      // (df desc, line) order.
      (s, dir) => {
        val d = docs(s, dir).filter(col("text").isNotNull)
        val nDocs = d.agg(count(lit(1)).as("_n"))
        d.select(col("doc_id"),
            explode(split(col("text"), "\n")).as("_l"))
          .select(col("doc_id"), trim(col("_l")).as("line"))
          .filter(length(col("line")) >= 10)
          .distinct()
          .groupBy("line").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .select(col("line"), col("df"),
            round(col("df").cast("double") / col("_n").cast("double"), 6)
              .as("df_share"))
          .orderBy(col("df").desc, col("line")).limit(20)
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents
             |          WHERE text IS NOT NULL),
             |n AS (SELECT count(*) AS n FROM d),
             |l AS (
             |  SELECT DISTINCT doc_id, trim(unnest(string_split(text, chr(10))))
             |    AS line
             |  FROM d),
             |f AS (SELECT line, count(*) AS df FROM l
             |      WHERE length(line) >= 10 GROUP BY 1)
             |SELECT line, df,
             |  round(CAST(df AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS df_share
             |FROM f CROSS JOIN n
             |ORDER BY df DESC, line LIMIT 20""".stripMargin)),

    QueryDef("e28_hourly_profile",
      // hour-of-day load profile per event type: counts and the share
      // of the type's traffic per hour — the capacity-planning shape
      // (and the input to "is this type cron-driven", read with e23's
      // burstiness). One hash agg on a 24×types grid; one division.
      (s, dir) => {
        val h = events(s, dir)
          .groupBy(col("event_type"), hour(col("ts")).as("hour"))
          .agg(count(lit(1)).as("n"))
        val tot = h.groupBy("event_type").agg(sum(col("n")).as("_t"))
        h.join(broadcast(tot), Seq("event_type"))
          .select(col("event_type"), col("hour"), col("n"),
            round(col("n").cast("double") / col("_t").cast("double"), 6)
              .as("share"))
          .orderBy("event_type", "hour")
      },
      Some("""WITH h AS (
             |  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour,
             |         count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS t
             |      FROM h GROUP BY 1)
             |SELECT h.event_type, h.hour, h.n,
             |  round(CAST(h.n AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS share
             |FROM h JOIN t USING (event_type)
             |ORDER BY event_type, hour""".stripMargin)),

    QueryDef("a41_pareto_point",
      // the 80/20 number: how many top suppliers cover 80% of revenue
      // (count and share of the supplier base) — a38's Lorenz curve
      // inverted at the canonical threshold. The crossing is decided in
      // EXACT DECIMAL (5·cum ≥ 4·total — no 0.8 float); rank + running
      // revenue via the distributed exact prefix sum (the a38 shape —
      // no single-partition window).
      (s, dir) => {
        // pinned: totals + the two prefix-sum passes read it
        val rev = graft.Caches.trackedPersist(t(s, dir, "lineitem")
            .groupBy(col("l_suppkey").as("supp"))
            .agg(sum(col("l_extendedprice").cast("decimal(12,4)")).as("_r")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = rev.agg(count(lit(1)).as("_n"), sum(col("_r")).as("_tot"))
        val ranked = graft.ops.RankOps.withGlobalPrefixSums(rev,
            Seq(col("_r").desc, col("supp")), Seq("_r"), Seq("_cum"),
            rankCol = Some("_rn"))
          .crossJoin(broadcast(tot))
        ranked.filter(col("_cum") * 5 >= col("_tot") * 4)
          .orderBy("_rn").limit(1)
          .select(col("_rn").cast("long").as("suppliers_for_80pct"),
            col("_n").as("n_suppliers"),
            round(col("_rn").cast("double") / col("_n").cast("double"), 6)
              .as("supplier_share"),
            round(col("_cum").cast("double") / col("_tot").cast("double"), 6)
              .as("revenue_share_at_point"))
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey AS supp,
             |         SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS r
             |  FROM lineitem GROUP BY 1),
             |rk AS (
             |  SELECT supp, r,
             |    row_number() OVER w AS rn,
             |    sum(r) OVER (ORDER BY r DESC, supp
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    count(*) OVER () AS n, sum(r) OVER () AS tot
             |  FROM rev WINDOW w AS (ORDER BY r DESC, supp))
             |SELECT CAST(rn AS BIGINT) AS suppliers_for_80pct,
             |  CAST(n AS BIGINT) AS n_suppliers,
             |  round(CAST(rn AS DOUBLE) / CAST(n AS DOUBLE), 6)
             |    AS supplier_share,
             |  round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
             |    AS revenue_share_at_point
             |FROM rk WHERE cum * 5 >= tot * 4
             |ORDER BY rn LIMIT 1""".stripMargin)),

    QueryDef("w46_seasonal_strength",
      // seasonal-strength score per ticker: 1 − Var(residual −
      // weekday-mean)/Var(residual) over the w21 detrended series —
      // "how much of the non-trend variance the weekly cycle explains"
      // (Hyndman's F_s measure on the weekday axis), the one-number
      // roll-up of w21's profile. Same determinism contract as
      // w21/a12: co-moment ulps sit far below the 6dp rounding. The
      // detrend fit and the weekday means are both ticker-cardinality
      // broadcasts; the variance pass is one hash agg.
      (s, dir) => {
        val p = graft.Caches.trackedPersist(prices(t(s, dir, "lineitem"))
          .withColumn("x",
            datediff(col("date"), lit("1995-01-01").cast("date")).cast("double")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val fit = p.groupBy("ticker").agg(
          expr("regr_slope(close, x)").as("_m"),
          expr("regr_intercept(close, x)").as("_b"))
        val res = graft.Caches.trackedPersist(p.join(broadcast(fit), "ticker")
          .withColumn("_wd", weekday(col("date")))
          .withColumn("_r", col("close") - (col("_b") + col("_m") * col("x"))),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wdMean = res.groupBy("ticker", "_wd")
          .agg(avg(col("_r")).as("_wm"))
        res.join(broadcast(wdMean), Seq("ticker", "_wd"))
          .groupBy("ticker")
          .agg(count(lit(1)).as("n"),
            var_samp(col("_r")).as("_vr"),
            var_samp(col("_r") - col("_wm")).as("_va"))
          .filter(col("_vr") > 0)
          .select(col("ticker"), col("n"),
            round(lit(1.0) - col("_va") / col("_vr"), 6)
              .as("seasonal_strength"))
          .orderBy("ticker")
      },
      Some(pricesSql +
        """, px AS (SELECT ticker, "date", close,
          |    CAST("date" - DATE '1995-01-01' AS DOUBLE) AS x FROM prices),
          |fit AS (SELECT ticker, regr_slope(close, x) AS m,
          |          regr_intercept(close, x) AS b FROM px GROUP BY 1),
          |res AS (
          |  SELECT p.ticker, CAST(isodow(p."date") - 1 AS INTEGER) AS wd,
          |         p.close - (f.b + f.m * p.x) AS r
          |  FROM px p JOIN fit f USING (ticker)),
          |wm AS (SELECT ticker, wd, avg(r) AS wm FROM res GROUP BY 1, 2)
          |SELECT res.ticker, count(*) AS n,
          |  round(1.0 - var_samp(res.r - wm.wm) / var_samp(res.r), 6)
          |    AS seasonal_strength
          |FROM res JOIN wm USING (ticker, wd)
          |GROUP BY 1 HAVING var_samp(res.r) > 0 ORDER BY 1""".stripMargin)),

    QueryDef("r7_prf_expansion",
      // pseudo-relevance feedback (Rocchio PRF): score the corpus for
      // the seed query, take the top-5 documents, mine their 3
      // strongest expansion terms (Σtf·ln(N/df), common-term gate
      // 2·df < N, seed terms excluded), and re-score with the expanded
      // query — the classic recall-repair loop composed from
      // [[RelevanceFunctions.bm25Join]] (the DYNAMIC-term BM25: per-
      // term contributions round 6dp and sum in exact decimal, so the
      // data-dependent term set keeps cross-engine determinism). The
      // oracle derives its own candidates and expansion terms (the
      // bpe/g1 pattern). Term selection argmaxes on the ROUNDED score
      // with a term tiebreak.
      (s, dir) => {
        val d = docs(s, dir)
        val q0 = s.sql("SELECT * FROM (VALUES ('filter'), ('stream')) AS t(term)")
        val score0 = graft.Caches.trackedPersist(
          R.bm25Join(d, "doc_id", "text", q0),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cand = score0.orderBy(col("bm25j").desc, col("doc_id"))
          .limit(5).select("doc_id")
        val toks = graft.Caches.trackedPersist(d.select(col("doc_id"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
          .filter(length(col("term")) > 0),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nDocs = d.agg(count(lit(1)).as("_n"))
        val tic = toks.join(broadcast(cand), "doc_id")
          .groupBy("term").agg(count(lit(1)).as("_tfsum"))
        val dfe = toks.select("doc_id", "term").distinct()
          .join(broadcast(tic.select("term")), "term")
          .groupBy("term").agg(count(lit(1)).as("_df"))
        val exp = tic.join(dfe, "term").crossJoin(broadcast(nDocs))
          .filter(!col("term").isin("filter", "stream") &&
            col("_df") * 2 < col("_n"))
          .select(col("term"), round(col("_tfsum").cast("double") *
            log(col("_n").cast("double") / col("_df").cast("double")), 6)
            .as("_sc"))
          .orderBy(col("_sc").desc, col("term")).limit(3).select("term")
        val score1 = R.bm25Join(d, "doc_id", "text", q0.unionByName(exp))
        score0.select(col("doc_id"), col("bm25j").as("bm25_seed"))
          .join(score1.select(col("doc_id"), col("bm25j").as("bm25_prf")),
            Seq("doc_id"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    string_split_regex(lower(trim(text)), '\s+') AS w,
             |    CAST(len(string_split_regex(lower(trim(text)), '\s+'))
             |      AS BIGINT) AS dl
             |  FROM documents),
             |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |              CAST(sum(dl) AS DOUBLE) AS sumdl FROM d),
             |nd AS (SELECT count(*) AS n FROM d),
             |q0 AS (SELECT unnest(['filter', 'stream']) AS term),
             |tok AS (
             |  SELECT doc_id, dl, unnest(w) AS term FROM d),
             |tokf AS (SELECT * FROM tok WHERE length(term) > 0),
             |tf0 AS (
             |  SELECT doc_id, term, dl, count(*) AS tf
             |  FROM tok JOIN q0 USING (term) GROUP BY 1, 2, 3),
             |df0 AS (SELECT term, count(*) AS df FROM tf0 GROUP BY 1),
             |c0 AS (
             |  SELECT tf0.doc_id,
             |    CAST(round(ln((st.n - df0.df + 0.5) / (df0.df + 0.5) + 1.0)
             |      * (tf0.tf * 2.2)
             |      / (tf0.tf + 1.2 * (0.25 + 0.75 * tf0.dl / (st.sumdl / st.n))),
             |      6) AS DECIMAL(16,6)) AS c
             |  FROM tf0 JOIN df0 USING (term) CROSS JOIN st),
             |s0 AS (
             |  SELECT d.doc_id,
             |    COALESCE(CAST(sum(c0.c) AS DOUBLE), 0.0) AS bm25_seed
             |  FROM d LEFT JOIN c0 USING (doc_id) GROUP BY 1),
             |cand AS (SELECT doc_id FROM s0
             |         ORDER BY bm25_seed DESC, doc_id LIMIT 5),
             |tic AS (
             |  SELECT term, count(*) AS tfsum
             |  FROM tokf JOIN cand USING (doc_id) GROUP BY 1),
             |dfe AS (
             |  SELECT tokf.term, count(DISTINCT tokf.doc_id) AS df
             |  FROM tokf JOIN (SELECT DISTINCT term FROM tic) t USING (term)
             |  GROUP BY 1),
             |exp AS (
             |  SELECT term FROM (
             |    SELECT tic.term,
             |      round(tic.tfsum * ln(CAST(nd.n AS DOUBLE) / dfe.df), 6) AS sc,
             |      dfe.df, nd.n
             |    FROM tic JOIN dfe USING (term) CROSS JOIN nd)
             |  WHERE term NOT IN ('filter', 'stream') AND 2 * df < n
             |  ORDER BY sc DESC, term LIMIT 3),
             |terms AS (SELECT term FROM q0 UNION ALL SELECT term FROM exp),
             |tf1 AS (
             |  SELECT doc_id, term, dl, count(*) AS tf
             |  FROM tok JOIN terms USING (term) GROUP BY 1, 2, 3),
             |df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY 1),
             |c1 AS (
             |  SELECT tf1.doc_id,
             |    CAST(round(ln((st.n - df1.df + 0.5) / (df1.df + 0.5) + 1.0)
             |      * (tf1.tf * 2.2)
             |      / (tf1.tf + 1.2 * (0.25 + 0.75 * tf1.dl / (st.sumdl / st.n))),
             |      6) AS DECIMAL(16,6)) AS c
             |  FROM tf1 JOIN df1 USING (term) CROSS JOIN st),
             |s1 AS (
             |  SELECT d.doc_id,
             |    COALESCE(CAST(sum(c1.c) AS DOUBLE), 0.0) AS bm25_prf
             |  FROM d LEFT JOIN c1 USING (doc_id) GROUP BY 1)
             |SELECT s0.doc_id, s0.bm25_seed, s1.bm25_prf
             |FROM s0 JOIN s1 USING (doc_id) ORDER BY doc_id""".stripMargin)),

    QueryDef("w47_relative_strength",
      // Mansfield relative strength: each ticker's price over the
      // equal-cap index as an exact µunit ratio (cents floor-divided by
      // index cents — the pairs1 move), compared to its trailing 52-day
      // mean: RS = 100·(ratio/ma52 − 1). The ratio and the window sum
      // are exact integers; the two divisions and the ×100 are one
      // mirrored IEEE chain, 6dp. Emits only full-window rows (w5's
      // min_periods discipline).
      (s, dir) => {
        val p = graft.Caches.trackedPersist(prices(t(s, dir, "lineitem"))
          .select(col("ticker"), col("date"),
            (col("close").cast("decimal(12,2)") * 100).cast("long").as("c")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val idx = p.groupBy("date").agg(sum(col("c")).as("_ic"))
        val wd = Window.partitionBy("ticker").orderBy("date")
        p.join(broadcast(idx), "date")
          .withColumn("ratio", expr("(c * 1000000L) div _ic"))
          .withColumn("_n", count(lit(1)).over(wd.rowsBetween(-51, 0)))
          .withColumn("_s", sum(col("ratio")).over(wd.rowsBetween(-51, 0)))
          .filter(col("_n") === 52)
          .select(col("ticker"), col("date"), col("ratio"),
            round(lit(100.0) * (col("ratio").cast("double") /
              (col("_s").cast("double") / 52.0) - 1.0), 6).as("rs_mansfield"))
          .orderBy("ticker", "date")
      },
      Some(pricesSql +
        """, c AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
          |  FROM prices),
          |ix AS (SELECT "date", CAST(sum(c) AS BIGINT) AS ic FROM c GROUP BY 1),
          |rt AS (
          |  SELECT c.ticker, c."date", (c.c * 1000000) // ix.ic AS ratio
          |  FROM c JOIN ix USING ("date")),
          |w AS (
          |  SELECT ticker, "date", ratio,
          |    count(*) OVER win AS n, CAST(sum(ratio) OVER win AS BIGINT) AS s
          |  FROM rt
          |  WINDOW win AS (PARTITION BY ticker ORDER BY "date"
          |    ROWS BETWEEN 51 PRECEDING AND CURRENT ROW))
          |SELECT ticker, "date", ratio,
          |  round(100.0 * (CAST(ratio AS DOUBLE)
          |    / (CAST(s AS DOUBLE) / 52.0) - 1.0), 6) AS rs_mansfield
          |FROM w WHERE n = 52 ORDER BY ticker, "date"""".stripMargin)),

    QueryDef("a42_revenue_bridge",
      // month-over-month revenue bridge: ΔRev decomposed into VOLUME
      // effect (ΔQ·P_prev), PRICE effect (ΔP·Q_prev) and the joint
      // term (ΔP·ΔQ) — the Laspeyres walk every revenue review opens
      // with; the three parts sum to ΔRev by construction. Quantities
      // and revenue are exact (longs / decimal cents); average price
      // and the effects are one mirrored IEEE chain off exact inputs,
      // 6dp. One hash agg to months + one 1-lag window over the
      // month-cardinality frame.
      (s, dir) => {
        val m = t(s, dir, "lineitem")
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
          .agg(sum(col("l_quantity").cast("long")).as("q"),
            money2(sum(col("l_extendedprice").cast("decimal(12,4)"))).as("rev"))
        val w = Window.orderBy("month")
        val p = col("rev") / col("q").cast("double")
        val d = m
          .withColumn("_pq", lag(col("q"), 1).over(w))
          .withColumn("_pr", lag(col("rev"), 1).over(w))
          .filter(col("_pq").isNotNull)
          .withColumn("_pp", col("_pr") / col("_pq").cast("double"))
        d.select(col("month"), col("q"), col("rev"),
            round(col("rev") - col("_pr"), 6).as("d_rev"),
            round((col("q") - col("_pq")).cast("double") * col("_pp"), 6)
              .as("volume_effect"),
            round((p - col("_pp")) * col("_pq").cast("double"), 6)
              .as("price_effect"),
            round((p - col("_pp")) *
              (col("q") - col("_pq")).cast("double"), 6).as("joint_effect"))
          .orderBy("month")
      },
      Some("""WITH m AS (
             |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
             |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
             |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2)
             |      AS DOUBLE) AS rev
             |  FROM lineitem GROUP BY 1),
             |d AS (
             |  SELECT month, q, rev,
             |    lag(q) OVER w AS pq, lag(rev) OVER w AS pr
             |  FROM m WINDOW w AS (ORDER BY month))
             |SELECT month, q, rev,
             |  round(rev - pr, 6) AS d_rev,
             |  round(CAST(q - pq AS DOUBLE) * (pr / CAST(pq AS DOUBLE)), 6)
             |    AS volume_effect,
             |  round((rev / CAST(q AS DOUBLE) - pr / CAST(pq AS DOUBLE))
             |    * CAST(pq AS DOUBLE), 6) AS price_effect,
             |  round((rev / CAST(q AS DOUBLE) - pr / CAST(pq AS DOUBLE))
             |    * CAST(q - pq AS DOUBLE), 6) AS joint_effect
             |FROM d WHERE pq IS NOT NULL ORDER BY month""".stripMargin)),

    QueryDef("e29_bot_screen",
      // composite bot screen per user: e23's inter-arrival CV
      // (metronomic cadence) joined with action-type Shannon entropy
      // (single-action monotony) — the two signals that separate a
      // cron job from a human, feeding e18's rate-limiter tier. The
      // entropy is a 6dp-per-term exact-decimal sum (the t17 ln
      // contract); flags compare identical doubles in both engines.
      // Ships ALL users with both signals and the flags.
      (s, dir) => {
        val e = events(s, dir)
        val ia = EventAnalyticsOps.interArrivalStats(e)
          .select(col("user_id"), col("n_gaps"), col("cv"), col("burstiness"))
        val tc = graft.Caches.trackedPersist(
          e.groupBy("user_id", "event_type").agg(count(lit(1)).as("_n")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = tc.groupBy("user_id").agg(sum(col("_n")).as("_t"))
        val ent = tc.join(broadcast(tot), "user_id")
          .select(col("user_id"),
            round(-(col("_n").cast("double") / col("_t").cast("double")) *
              log(col("_n").cast("double") / col("_t").cast("double")), 6)
              .cast("decimal(16,6)").as("_term"))
          .groupBy("user_id")
          .agg(sum(col("_term")).cast("double").as("type_entropy"))
        ia.join(ent, "user_id")
          .withColumn("metronomic", col("cv") <= 0.05)
          .withColumn("monotone", col("type_entropy") <= 0.5)
          .orderBy("user_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id,
             |    date_diff('microsecond',
             |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
             |      ts) AS d
             |  FROM events),
             |a AS (
             |  SELECT user_id, count(*) AS n, CAST(sum(d) AS BIGINT) AS s,
             |         sum(CAST(d AS HUGEINT) * d) AS s2
             |  FROM g WHERE d IS NOT NULL GROUP BY 1 HAVING count(*) >= 5),
             |ia AS (
             |  SELECT user_id, n AS n_gaps,
             |    round(sqrt(CAST(s2 * n - CAST(s AS HUGEINT) * s AS DOUBLE)
             |        / (CAST(n AS DOUBLE) * (n - 1)))
             |      / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cv,
             |    round((sqrt(CAST(s2 * n - CAST(s AS HUGEINT) * s AS DOUBLE)
             |        / (CAST(n AS DOUBLE) * (n - 1)))
             |      - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |      / (sqrt(CAST(s2 * n - CAST(s AS HUGEINT) * s AS DOUBLE)
             |        / (CAST(n AS DOUBLE) * (n - 1)))
             |      + CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS burstiness
             |  FROM a),
             |tc AS (SELECT user_id, event_type, count(*) AS n
             |       FROM events GROUP BY 1, 2),
             |tt AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS t
             |       FROM tc GROUP BY 1),
             |ent AS (
             |  SELECT tc.user_id,
             |    CAST(SUM(CAST(round(-(CAST(tc.n AS DOUBLE) / tt.t)
             |      * ln(CAST(tc.n AS DOUBLE) / tt.t), 6) AS DECIMAL(16,6)))
             |      AS DOUBLE) AS type_entropy
             |  FROM tc JOIN tt USING (user_id) GROUP BY 1)
             |SELECT ia.user_id, ia.n_gaps, ia.cv, ia.burstiness,
             |  ent.type_entropy,
             |  ia.cv <= 0.05 AS metronomic,
             |  ent.type_entropy <= 0.5 AS monotone
             |FROM ia JOIN ent USING (user_id) ORDER BY user_id""".stripMargin)),

    QueryDef("a43_abc_classes",
      // ABC inventory classification of parts by revenue: A = parts
      // inside the top-80% cumulative revenue, B to 95%, C the tail —
      // rolled up per class (part count, revenue, shares). Class
      // boundaries are EXACT DECIMAL cross-products (5·cum ≤ 4·tot /
      // 20·cum ≤ 19·tot — no 0.8 float anywhere); the part-cardinality
      // running revenue comes from the distributed exact prefix sum
      // (the a38 shape — no single-partition window). The inventory
      // twin of a41's Pareto point.
      (s, dir) => {
        // pinned: totals + the two prefix-sum passes read it
        val rev = graft.Caches.trackedPersist(t(s, dir, "lineitem")
            .groupBy(col("l_partkey").as("part"))
            .agg(sum(col("l_extendedprice").cast("decimal(12,4)")).as("_r")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // whole-base totals serve the class boundaries AND the share
        // denominators (_tn/_tr) — the census is a partition of the base
        val tot = rev.agg(count(lit(1)).as("_tn"), sum(col("_r")).as("_tot"))
        val classed = graft.ops.RankOps.withGlobalPrefixSums(rev,
            Seq(col("_r").desc, col("part")), Seq("_r"), Seq("_cum"))
          .crossJoin(broadcast(tot))
          .withColumn("abc_class",
            when(col("_cum") * 5 <= col("_tot") * 4, "A")
              .when(col("_cum") * 20 <= col("_tot") * 19, "B")
              .otherwise("C"))
        // shares derive from the EXACT decimal class totals (a float
        // window-sum of the 3 class revenues would be partition-order
        // sensitive); money2 only shapes the output column
        classed.groupBy("abc_class")
          .agg(count(lit(1)).as("n_parts"), sum(col("_r")).as("_rd"),
            max(col("_tn")).as("_tn"), max(col("_tot")).as("_tr"))
          .select(col("abc_class"), col("n_parts"),
            round(col("n_parts").cast("double") / col("_tn").cast("double"), 6)
              .as("part_share"),
            money2(col("_rd")).as("revenue"),
            round(col("_rd").cast("double") / col("_tr").cast("double"), 6)
              .as("revenue_share"))
          .orderBy("abc_class")
      },
      Some("""WITH rev AS (
             |  SELECT l_partkey AS part,
             |         SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS r
             |  FROM lineitem GROUP BY 1),
             |cl AS (
             |  SELECT part, r,
             |    sum(r) OVER (ORDER BY r DESC, part
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(r) OVER () AS tot
             |  FROM rev),
             |cls AS (
             |  SELECT part, r,
             |    CASE WHEN cum * 5 <= tot * 4 THEN 'A'
             |         WHEN cum * 20 <= tot * 19 THEN 'B'
             |         ELSE 'C' END AS abc_class
             |  FROM cl),
             |agg AS (
             |  SELECT abc_class, count(*) AS n_parts, SUM(r) AS rd
             |  FROM cls GROUP BY 1)
             |SELECT abc_class, n_parts,
             |  round(CAST(n_parts AS DOUBLE)
             |    / CAST(sum(n_parts) OVER () AS DOUBLE), 6) AS part_share,
             |  CAST(ROUND(rd, 2) AS DOUBLE) AS revenue,
             |  round(CAST(rd AS DOUBLE) / CAST(sum(rd) OVER () AS DOUBLE), 6)
             |    AS revenue_share
             |FROM agg ORDER BY abc_class""".stripMargin)),

    QueryDef("d30_jaccard_yield",
      // threshold-yield curve for near-dup dedup: d3's exact Jaccard
      // pairs at a LOW floor (0.2), bucketed by 0.1 similarity bands
      // with the cumulative pair count from the top — the curve that
      // DECIDES the production threshold (how many pairs each setting
      // would kill) before committing to an m1-style LSH config. Pair
      // enumeration costs the same as any threshold (the co-shingle
      // join dominates); the histogram is 10 rows. The raw corpus has
      // only exact-ish duplicates, so every third document gains a
      // PLANTED half-length twin (id+200000, first ⌈n/2⌉ tokens — the
      // s2/c2 "create the condition under test" pattern), populating
      // the mid-similarity bands the curve exists to show.
      (s, dir) => {
        val d = docs(s, dir)
        val twins = d.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            array_join(slice(split(lower(trim(col("text"))), "\\s+"), lit(1),
              expr("CAST(ceil(size(split(lower(trim(text)), '\\\\s+')) / 2.0) AS INT)")),
              " ").as("text"))
        val planted = d.select(col("doc_id"), col("text")).unionByName(twins)
        val pairs = D.jaccardPairs(planted, "doc_id", "text",
          n = 3, threshold = 0.2, maxDf = 1000L)
        val h = pairs
          .groupBy(least(floor(col("jaccard") * 10), lit(9)).cast("int")
            .as("bucket"))
          .agg(count(lit(1)).as("n_pairs"))
        h.withColumn("band_lo", round(col("bucket").cast("double") / 10, 1))
          .withColumn("cum_from_top", sum(col("n_pairs")).over(
            Window.orderBy(col("bucket").desc)
              .rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("bucket"), col("band_lo"), col("n_pairs"),
            col("cum_from_top"))
          .orderBy("bucket")
      },
      Some("""WITH raw AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000 AS doc_id,
             |    array_to_string(
             |      (regexp_split_to_array(lower(trim(text)), '\s+'))[
             |        1:CAST(ceil(len(regexp_split_to_array(lower(trim(text)),
             |            '\s+')) / 2.0) AS INTEGER)], ' ') AS text
             |  FROM documents WHERE doc_id % 3 = 0),
             |toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM raw),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |e AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sgl FROM sh),
             |p AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a,
             |         b.n_sh AS n_b, count(*) AS shared
             |  FROM e a JOIN e b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2, 3, 4),
             |j AS (
             |  SELECT round(CAST(shared AS DOUBLE)
             |    / CAST(n_a + n_b - shared AS DOUBLE), 6) AS jac
             |  FROM p
             |  WHERE CAST(shared AS DOUBLE)
             |    / CAST(n_a + n_b - shared AS DOUBLE) >= 0.2),
             |h AS (
             |  SELECT CAST(least(floor(jac * 10), 9) AS INTEGER) AS bucket,
             |         count(*) AS n_pairs
             |  FROM j GROUP BY 1)
             |SELECT bucket, round(CAST(bucket AS DOUBLE) / 10, 1) AS band_lo,
             |  n_pairs,
             |  CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS cum_from_top
             |FROM h ORDER BY bucket""".stripMargin)),

    QueryDef("a44_discount_elasticity",
      // demand response to discounting per return-flag segment:
      // regr_slope/intercept/R² of quantity on discount — "does a
      // deeper discount actually move volume" as the a18 co-moment
      // machinery on the economic axis. Engine co-moment ulps sit far
      // under the 6dp rounding (the a12/a18 contract).
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("seg"))
        .agg(count(lit(1)).as("n"),
          round(expr("regr_slope(l_quantity, l_discount)"), 6).as("slope"),
          round(expr("regr_intercept(l_quantity, l_discount)"), 6)
            .as("intercept"),
          round(expr("regr_r2(l_quantity, l_discount)"), 6).as("r2"))
        .orderBy("seg"),
      Some("""SELECT l_returnflag AS seg, count(*) AS n,
             |  round(regr_slope(l_quantity, l_discount), 6) AS slope,
             |  round(regr_intercept(l_quantity, l_discount), 6) AS intercept,
             |  round(regr_r2(l_quantity, l_discount), 6) AS r2
             |FROM lineitem GROUP BY 1 ORDER BY seg""".stripMargin)),

    QueryDef("t27_mixed_language",
      // code-switching / concatenation detector: language-ID per t9
      // CHUNK, then per-document disagreement — a doc whose chunks
      // vote for different languages is usually two pages glued by the
      // extractor (t3's whole-doc vote hides it; chunk-level voting is
      // how fastText-based cleaners catch it). Majority pick ties to
      // the lexicographically smaller language via min(struct(−m,
      // lang)) — all-integer; one explode + two hash aggs.
      (s, dir) => {
        val ch = T.chunkDocuments(docs(s, dir), "doc_id", "text",
            chunkSize = 32, stride = 16)
          .select(col("doc_id"), T.languageId(col("chunk_text")).as("cl"))
        val per = ch.groupBy("doc_id", "cl").agg(count(lit(1)).as("_m"))
        per.groupBy("doc_id").agg(
            sum(col("_m")).as("n_chunks"),
            count(lit(1)).as("n_langs"),
            min(struct((-col("_m")).as("nm"), col("cl").as("l"))).as("_mj"))
          .select(col("doc_id"), col("n_chunks"), col("n_langs"),
            col("_mj.l").as("majority_lang"),
            round((-col("_mj.nm")).cast("double") /
              col("n_chunks").cast("double"), 6).as("majority_share"),
            (col("n_langs") > 1).as("mixed"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
             |  FROM documents
             |  WHERE length(trim(text)) > 0),
             |ch AS (
             |  SELECT doc_id,
             |    array_to_string(w[i*16+1 : i*16+32], ' ') AS chunk_text
             |  FROM tk, UNNEST(generate_series(0,
             |    CAST(ceil(greatest(len(w) - 32, 0) / 16.0) AS BIGINT))) AS t(i)),
             |ct AS (
             |  SELECT doc_id,
             |    regexp_split_to_array(lower(trim(chunk_text)), '\s+') AS toks
             |  FROM ch),
             |h AS (SELECT doc_id,
             |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))) AS h_de,
             |  len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','it','was','for'], x))) AS h_en,
             |  len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','por','para','que','con'], x))) AS h_es,
             |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','pour','dans','que','des'], x))) AS h_fr
             |FROM ct),
             |lid AS (
             |  SELECT doc_id,
             |    CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
             |         WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             |         WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             |         WHEN h_es >= h_fr THEN 'es'
             |         ELSE 'fr' END AS cl
             |  FROM h),
             |per AS (SELECT doc_id, cl, count(*) AS m FROM lid GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_chunks,
             |  count(*) AS n_langs,
             |  (min({'nm': -m, 'l': cl})).l AS majority_lang,
             |  round(CAST(-(min({'nm': -m, 'l': cl})).nm AS DOUBLE)
             |    / CAST(sum(m) AS DOUBLE), 6) AS majority_share,
             |  (count(*) > 1) AS mixed
             |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    QueryDef("s15_centroid_drift",
      // semantic drift between splits: pool each split's embeddings to
      // a 6dp centroid (the s5 shape), report the cross-centroid
      // cosine and each centroid's norm — the embedding-space twin of
      // mix2's source-KL audit ("did the valid slice land in the same
      // region as train"). Norms use VecDot over the 6dp centroid in
      // ARRAY ORDER, mirrored by the oracle's in-order list fold —
      // both engines run the identical sum sequence.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .withColumn("split",
            when(col("vec_id") % 5 === 0, "valid").otherwise("train"))
        val sizes = emb.groupBy("split").agg(count(lit(1)).as("n"))
        val cent = S.assembleVec(
          S.meanPoolFlat(emb.select(col("split"), col("embedding")),
              "split", "embedding")
            .select(col("split"), col("pos"),
              round(col("mean_v"), 6).as("mean_v")),
          "split")
          .join(broadcast(sizes), "split")
        val a = cent.filter(col("split") === "train")
          .select(col("vec").as("_va"), col("n").as("n_train"))
        val b = cent.filter(col("split") === "valid")
          .select(col("vec").as("_vb"), col("n").as("n_valid"))
        a.crossJoin(b).select(col("n_train"), col("n_valid"),
          round(S.cosine(col("_va"), col("_vb")), 6).as("centroid_cosine"),
          round(sqrt(S.dot(col("_va"), col("_va"))), 6).as("norm_train"),
          round(sqrt(S.dot(col("_vb"), col("_vb"))), 6).as("norm_valid"))
      },
      Some("""WITH e AS (
             |  SELECT CASE WHEN vec_id % 5 = 0 THEN 'valid' ELSE 'train' END
             |           AS split,
             |         CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |sz AS (SELECT split, count(*) AS n FROM e GROUP BY 1),
             |flat AS (
             |  SELECT split, generate_subscripts(v, 1) AS pos, unnest(v) AS val
             |  FROM e),
             |cd AS (SELECT split, pos, round(avg(val), 6) AS cv
             |       FROM flat GROUP BY 1, 2),
             |cent AS (SELECT split, list(cv ORDER BY pos) AS vec
             |         FROM cd GROUP BY 1),
             |a AS (SELECT cent.vec AS va, sz.n AS n_train FROM cent
             |      JOIN sz USING (split) WHERE cent.split = 'train'),
             |b AS (SELECT cent.vec AS vb, sz.n AS n_valid FROM cent
             |      JOIN sz USING (split) WHERE cent.split = 'valid')
             |SELECT a.n_train, b.n_valid,
             |  round(list_cosine_similarity(a.va, b.vb), 6) AS centroid_cosine,
             |  round(sqrt(list_aggregate(list_transform(a.va, x -> x * x),
             |    'sum')), 6) AS norm_train,
             |  round(sqrt(list_aggregate(list_transform(b.vb, x -> x * x),
             |    'sum')), 6) AS norm_valid
             |FROM a CROSS JOIN b""".stripMargin)),

    QueryDef("pack3_bin_utilization",
      // packing-efficiency audit of pack1/pack2's greedy bins: per
      // shard, the pack count, mean fill ratio against the 512-token
      // budget, the under-80% bin count, and total padding waste — the
      // number that says whether the packer needs a smarter bin rule
      // before a training run burns the idle tokens. All-integer until
      // the two divisions (exact-decimal fill sums, the t20 pattern —
      // per-pack ratios round 6dp before summing). Over-budget packs
      // (a single doc longer than the budget) cap their fill at 1.
      (s, dir) => {
        val packs = Sam.materializePacks(
            docs(s, dir).select(col("doc_id"), col("text"),
              T.tokenCount(col("text")).as("n_tokens")),
            "doc_id", "text", "n_tokens", budgetTokens = 512L, shards = 8)
          .select(col("shard"), col("pack_id"), col("pack_tokens"))
          .withColumn("_fill", round(
            least(col("pack_tokens"), lit(512L)).cast("double") / 512.0, 6)
            .cast("decimal(10,6)"))
        packs.groupBy("shard").agg(
            count(lit(1)).as("n_packs"),
            sum(col("pack_tokens")).as("tokens"),
            (sum(col("_fill")).cast("double") /
              count(lit(1)).cast("double")).as("_mf"),
            sum(when(col("_fill") < 0.8, 1L).otherwise(0L)).as("underfilled"),
            sum(greatest(lit(512L) - col("pack_tokens"), lit(0L)))
              .as("padding_waste"))
          .select(col("shard"), col("n_packs"), col("tokens"),
            round(col("_mf"), 6).as("mean_fill"),
            col("underfilled"), col("padding_waste"))
          .orderBy("shard")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text, doc_id % 8 AS shard,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, shard, tok,
             |    CAST(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      - tok AS prefix
             |  FROM t),
             |pk AS (
             |  SELECT shard, prefix // 512 AS pack_id,
             |    CAST(sum(tok) AS BIGINT) AS pack_tokens
             |  FROM p GROUP BY 1, 2),
             |f AS (
             |  SELECT shard, pack_tokens,
             |    CAST(round(CAST(least(pack_tokens, 512) AS DOUBLE) / 512.0, 6)
             |      AS DECIMAL(10,6)) AS fill
             |  FROM pk)
             |SELECT shard, count(*) AS n_packs,
             |  CAST(sum(pack_tokens) AS BIGINT) AS tokens,
             |  round(CAST(sum(fill) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             |    AS mean_fill,
             |  CAST(sum(CASE WHEN fill < 0.8 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS underfilled,
             |  CAST(sum(greatest(512 - pack_tokens, 0)) AS BIGINT)
             |    AS padding_waste
             |FROM f GROUP BY 1 ORDER BY shard""".stripMargin)),

    QueryDef("a45_hhi",
      // Herfindahl–Hirschman concentration index of supplier revenue,
      // per year: HHI = Σ share² scaled ×10000 (the antitrust
      // convention; 10000 = monopoly, <1500 competitive) — the squared
      // companion to a24's Gini and a38's Lorenz. EXACT until the end:
      // HHI = 10⁴·Σr²/ (Σr)², both sums exact decimals, one mirrored
      // IEEE tail.
      (s, dir) => {
        val r = t(s, dir, "lineitem")
          .groupBy(year(col("l_shipdate")).as("yr"),
            col("l_suppkey").as("supp"))
          .agg((money2(sum(col("l_extendedprice").cast("decimal(12,4)")))
            .cast("decimal(14,2)") * 100).cast("long").as("_rc"))
        r.groupBy("yr").agg(
            count(lit(1)).as("n_suppliers"),
            (lit(10000.0) *
              sum(col("_rc").cast("decimal(38,0)") * col("_rc")).cast("double") /
              (sum(col("_rc")).cast("double") * sum(col("_rc")).cast("double")))
              .as("_h"))
          .select(col("yr"), col("n_suppliers"), round(col("_h"), 6).as("hhi"))
          .orderBy("yr")
      },
      Some("""WITH r AS (
             |  SELECT year(l_shipdate) AS yr, l_suppkey AS supp,
             |    CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2)
             |      AS DECIMAL(14,2)) * 100 AS BIGINT) AS rc
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT CAST(yr AS INTEGER) AS yr, count(*) AS n_suppliers,
             |  round(10000.0 * CAST(sum(CAST(rc AS HUGEINT) * rc) AS DOUBLE)
             |    / (CAST(sum(rc) AS DOUBLE) * CAST(sum(rc) AS DOUBLE)), 6) AS hhi
             |FROM r GROUP BY 1 ORDER BY yr""".stripMargin)),

    QueryDef("act1_activation_depth",
      // activation analysis: users bucketed by FIRST-24-HOURS event
      // depth, each bucket's later high-value-conversion rate (ab1's
      // success metric) — "how active must day-one be before users
      // convert", the aha-moment screen. First-day depth is an exact
      // integer window against the user's own first timestamp; one
      // division per bucket.
      (s, dir) => {
        val e = events(s, dir)
        val firstTs = e.groupBy("user_id").agg(min(col("ts")).as("_t0"))
        val depth = e.join(firstTs, "user_id")
          .groupBy("user_id")
          .agg(sum(when(expr("unix_micros(ts) - unix_micros(_t0)") <
              86400000000L, 1L).otherwise(0L)).as("_d"),
            max(when(col("event_type") === "purchase" &&
              col("value") > 195 &&
              expr("unix_micros(ts) - unix_micros(_t0)") >= 86400000000L,
              1L).otherwise(0L)).as("_conv"))
        depth.withColumn("depth_bucket",
            when(col("_d") <= 5, "a_1_5")
              .when(col("_d") <= 20, "b_6_20").otherwise("c_21_plus"))
          .groupBy("depth_bucket")
          .agg(count(lit(1)).as("users"), sum(col("_conv")).as("converters"))
          .withColumn("conv_rate", round(col("converters").cast("double") /
            col("users").cast("double"), 6))
          .orderBy("depth_bucket")
      },
      Some("""WITH f AS (SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1),
             |d AS (
             |  SELECT e.user_id,
             |    CAST(sum(CASE WHEN date_diff('microsecond', f.t0, e.ts)
             |        < 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS dep,
             |    CAST(max(CASE WHEN e.event_type = 'purchase'
             |        AND e.value > 195
             |        AND date_diff('microsecond', f.t0, e.ts) >= 86400000000
             |      THEN 1 ELSE 0 END) AS BIGINT) AS conv
             |  FROM events e JOIN f USING (user_id) GROUP BY 1),
             |b AS (
             |  SELECT CASE WHEN dep <= 5 THEN 'a_1_5'
             |              WHEN dep <= 20 THEN 'b_6_20'
             |              ELSE 'c_21_plus' END AS depth_bucket, conv
             |  FROM d)
             |SELECT depth_bucket, count(*) AS users,
             |  CAST(sum(conv) AS BIGINT) AS converters,
             |  round(CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             |    AS conv_rate
             |FROM b GROUP BY 1 ORDER BY depth_bucket""".stripMargin)),

    QueryDef("cls2_label_shift",
      // label-shift audit between the embedding train/valid splits
      // ([[graft.ops.ValidationOps.chiSquareIndependence]] on the
      // split × label grid): a significant chi-square means the valid
      // slice's class mix diverged — eval numbers would not transfer.
      // The a28 machinery pointed at the ML axis.
      (s, dir) => ValidationOps.chiSquareIndependence(
        t(s, dir, "embeddings")
          .select(when(col("vec_id") % 5 === 0, "valid").otherwise("train")
            .as("split"), col("label")),
        "split", "label"),
      Some("""WITH base AS (
             |  SELECT CASE WHEN vec_id % 5 = 0 THEN 'valid' ELSE 'train' END
             |           AS a,
             |         label AS b
             |  FROM embeddings
             |  WHERE label IS NOT NULL),
             |cells AS (SELECT a, b, count(*) AS o FROM base GROUP BY 1, 2),
             |ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
             |cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
             |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
             |               CAST(count(DISTINCT a) AS BIGINT) AS r,
             |               CAST(count(DISTINCT c2.b) AS BIGINT) AS c
             |        FROM cells c2),
             |grid AS (
             |  SELECT ra.a, cb.b, ra.ra, cb.cb, COALESCE(cells.o, 0) AS o
             |  FROM ra CROSS JOIN cb
             |  LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b),
             |term AS (
             |  SELECT n, r, c,
             |    round((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e,
             |          6) AS term
             |  FROM (SELECT o, n, r, c,
             |          CAST(ra * cb AS DOUBLE) / CAST(n AS DOUBLE) AS e
             |        FROM grid, tot))
             |SELECT n, (r - 1) * (c - 1) AS dof,
             |  CAST(SUM(CAST(term AS DECIMAL(24,6))) AS DOUBLE) AS chi2,
             |  round(sqrt(CAST(SUM(CAST(term AS DECIMAL(24,6))) AS DOUBLE)
             |             / CAST(n * least(r - 1, c - 1) AS DOUBLE)), 6)
             |    AS cramers_v
             |FROM term GROUP BY n, r, c""".stripMargin)),

    QueryDef("w48_chow_break",
      // Chow structural-break test per ticker at the fixed 1997-01-01
      // breakpoint: fit price-on-time OLS on each side and pooled,
      // F = ((RSS_p − RSS₁ − RSS₂)/2) / ((RSS₁+RSS₂)/(n−4)) — the
      // regime-change companion to w28's CUSUM (which detects; this
      // TESTS a hypothesized break). ONE scan: all six side-moments
      // are conditional exact-integer sums (days × cents), pooled
      // moments are their exact additions, and every RSS is the same
      // short IEEE chain over exact casts (the a18 contract), 6dp.
      (s, dir) => {
        val p = prices(t(s, dir, "lineitem"))
          .select(col("ticker"),
            datediff(col("date"), lit("1995-01-01").cast("date"))
              .cast("long").as("x"),
            (col("close").cast("decimal(12,2)") * 100).cast("long").as("y"),
            (col("date") < lit("1997-01-01").cast("date")).as("pre"))
        def m(cond: Column, e: Column) =
          sum(when(cond, e).otherwise(lit(0L).cast("decimal(38,0)")))
        def moments(cond: Column, tag: String) = Seq(
          sum(when(cond, 1L).otherwise(0L)).as(s"n$tag"),
          m(cond, col("x").cast("decimal(38,0)")).as(s"sx$tag"),
          m(cond, col("y").cast("decimal(38,0)")).as(s"sy$tag"),
          m(cond, col("x").cast("decimal(38,0)") * col("x")).as(s"sxx$tag"),
          m(cond, col("x").cast("decimal(38,0)") * col("y")).as(s"sxy$tag"),
          m(cond, col("y").cast("decimal(38,0)") * col("y")).as(s"syy$tag"))
        val aggCols = moments(col("pre"), "1") ++ moments(!col("pre"), "2")
        val a = p.groupBy("ticker").agg(aggCols.head, aggCols.tail: _*)
        def rss(n: Column, sx: Column, sy: Column, sxx: Column,
            sxy: Column, syy: Column) = {
          val nd = n.cast("double")
          val cxx = sxx.cast("double") - sx.cast("double") * sx.cast("double") / nd
          val cxy = sxy.cast("double") - sx.cast("double") * sy.cast("double") / nd
          val cyy = syy.cast("double") - sy.cast("double") * sy.cast("double") / nd
          cyy - cxy * cxy / cxx
        }
        val r1 = rss(col("n1"), col("sx1"), col("sy1"), col("sxx1"),
          col("sxy1"), col("syy1"))
        val r2 = rss(col("n2"), col("sx2"), col("sy2"), col("sxx2"),
          col("sxy2"), col("syy2"))
        val rp = rss(col("n1") + col("n2"), col("sx1") + col("sx2"),
          col("sy1") + col("sy2"), col("sxx1") + col("sxx2"),
          col("sxy1") + col("sxy2"), col("syy1") + col("syy2"))
        a.filter(col("n1") >= 3 && col("n2") >= 3)
          .select(col("ticker"), col("n1"), col("n2"),
            round(((rp - r1 - r2) / lit(2.0)) /
              ((r1 + r2) / (col("n1") + col("n2") - 4).cast("double")), 6)
              .as("f_stat"))
          .orderBy("ticker")
      },
      Some(pricesSql +
        """, b AS (
          |  SELECT ticker,
          |    CAST("date" - DATE '1995-01-01' AS BIGINT) AS x,
          |    CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT) AS y,
          |    ("date" < DATE '1997-01-01') AS pre
          |  FROM prices),
          |a AS (
          |  SELECT ticker,
          |    CAST(count(CASE WHEN pre THEN 1 END) AS BIGINT) AS n1,
          |    COALESCE(sum(CASE WHEN pre THEN CAST(x AS HUGEINT) END), 0) AS sx1,
          |    COALESCE(sum(CASE WHEN pre THEN CAST(y AS HUGEINT) END), 0) AS sy1,
          |    COALESCE(sum(CASE WHEN pre THEN CAST(x AS HUGEINT) * x END), 0) AS sxx1,
          |    COALESCE(sum(CASE WHEN pre THEN CAST(x AS HUGEINT) * y END), 0) AS sxy1,
          |    COALESCE(sum(CASE WHEN pre THEN CAST(y AS HUGEINT) * y END), 0) AS syy1,
          |    CAST(count(CASE WHEN NOT pre THEN 1 END) AS BIGINT) AS n2,
          |    COALESCE(sum(CASE WHEN NOT pre THEN CAST(x AS HUGEINT) END), 0) AS sx2,
          |    COALESCE(sum(CASE WHEN NOT pre THEN CAST(y AS HUGEINT) END), 0) AS sy2,
          |    COALESCE(sum(CASE WHEN NOT pre THEN CAST(x AS HUGEINT) * x END), 0) AS sxx2,
          |    COALESCE(sum(CASE WHEN NOT pre THEN CAST(x AS HUGEINT) * y END), 0) AS sxy2,
          |    COALESCE(sum(CASE WHEN NOT pre THEN CAST(y AS HUGEINT) * y END), 0) AS syy2
          |  FROM b GROUP BY 1)
          |SELECT ticker, n1, n2,
          |  round((((CAST(syy1 + syy2 AS DOUBLE)
          |      - CAST(sy1 + sy2 AS DOUBLE) * CAST(sy1 + sy2 AS DOUBLE)
          |        / CAST(n1 + n2 AS DOUBLE))
          |    - (CAST(sxy1 + sxy2 AS DOUBLE)
          |      - CAST(sx1 + sx2 AS DOUBLE) * CAST(sy1 + sy2 AS DOUBLE)
          |        / CAST(n1 + n2 AS DOUBLE))
          |      * (CAST(sxy1 + sxy2 AS DOUBLE)
          |      - CAST(sx1 + sx2 AS DOUBLE) * CAST(sy1 + sy2 AS DOUBLE)
          |        / CAST(n1 + n2 AS DOUBLE))
          |      / (CAST(sxx1 + sxx2 AS DOUBLE)
          |      - CAST(sx1 + sx2 AS DOUBLE) * CAST(sx1 + sx2 AS DOUBLE)
          |        / CAST(n1 + n2 AS DOUBLE))
          |    - (CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE)
          |        / CAST(n1 AS DOUBLE)
          |      - (CAST(sxy1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE)
          |          / CAST(n1 AS DOUBLE))
          |        * (CAST(sxy1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE)
          |          / CAST(n1 AS DOUBLE))
          |        / (CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)
          |          / CAST(n1 AS DOUBLE)))
          |    - (CAST(syy2 AS DOUBLE) - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE)
          |        / CAST(n2 AS DOUBLE)
          |      - (CAST(sxy2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sy2 AS DOUBLE)
          |          / CAST(n2 AS DOUBLE))
          |        * (CAST(sxy2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sy2 AS DOUBLE)
          |          / CAST(n2 AS DOUBLE))
          |        / (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
          |          / CAST(n2 AS DOUBLE)))) / 2.0)
          |  / (((CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE)
          |        / CAST(n1 AS DOUBLE)
          |      - (CAST(sxy1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE)
          |          / CAST(n1 AS DOUBLE))
          |        * (CAST(sxy1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE)
          |          / CAST(n1 AS DOUBLE))
          |        / (CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)
          |          / CAST(n1 AS DOUBLE)))
          |    + (CAST(syy2 AS DOUBLE) - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE)
          |        / CAST(n2 AS DOUBLE)
          |      - (CAST(sxy2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sy2 AS DOUBLE)
          |          / CAST(n2 AS DOUBLE))
          |        * (CAST(sxy2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sy2 AS DOUBLE)
          |          / CAST(n2 AS DOUBLE))
          |        / (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
          |          / CAST(n2 AS DOUBLE))))
          |    / CAST(n1 + n2 - 4 AS DOUBLE)), 6) AS f_stat
          |FROM a WHERE n1 >= 3 AND n2 >= 3 ORDER BY ticker""".stripMargin)),

    QueryDef("g11_degree_tail",
      // degree-distribution tail diagnostics of the co-purchase graph:
      // node/edge counts, max degree, and the Hill tail index over the
      // top-decile degrees (e25's estimator on the graph axis) —
      // "is this graph scale-free enough that per-node work needs the
      // skew defenses" (α ≤ 2 ⇒ hub-dominated; salting/AQE mandatory).
      // Degrees and ranks exact; 6dp lns sum in exact decimal.
      // Scale shape: e25's level-histogram move on the graph axis —
      // the whole estimator runs on the count-of-DEGREES histogram
      // (x_(k+1) is determined by degree LEVELS alone; ties at the
      // boundary contribute ln(1)=0), so the only window left is over
      // distinct degree levels, bounded by the max degree, not nodes
      // (the r11 verdict's g11 scale-tier item).
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val e = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v"))
          .distinct()
        val deg = e.select(col("u").as("node"))
          .unionAll(e.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("d"))
        val nEdges = e.agg((count(lit(1))).as("n_edges"))
        // pinned: totals, the x_(k+1) probe, and the tail sum all read
        // the (tiny) degree histogram — unpinned the edge set would
        // re-aggregate three times
        val lv = graft.Caches.trackedPersist(
          deg.groupBy("d").agg(count(lit(1)).as("_lm")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nk = lv.agg(sum(col("_lm")).as("_n"), max(col("d")).as("_maxd"))
          .withColumn("_k", expr("(_n + 9) div 10"))
        val wL = Window.orderBy(col("d").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = lv.withColumn("_cum", sum(col("_lm")).over(wL))
          .crossJoin(broadcast(nk))
        val dmin = cum.filter(col("_cum") >= col("_k") + 1 &&
            col("_cum") - col("_lm") <= col("_k"))
          .select(col("d").as("_dmin"))
        cum.crossJoin(broadcast(dmin))
          .filter(col("d") >= col("_dmin"))
          .select(col("_n"), col("_k"), col("_maxd"),
            when(col("d") > col("_dmin"),
              col("_lm") * round(log(col("d").cast("double") /
                col("_dmin").cast("double")), 6).cast("decimal(14,6)"))
            .otherwise(lit(0).cast("decimal(14,6)")).as("_t"))
          .groupBy("_n", "_k")
          .agg(max(col("_maxd")).as("max_degree"),
            round(col("_k").cast("double") /
              sum(col("_t").cast("decimal(20,6)")).cast("double"), 6)
              .as("hill_alpha"))
          .crossJoin(broadcast(nEdges))
          .select(col("_n").as("n_nodes"), col("n_edges"),
            col("max_degree"), col("_k").as("k_tail"), col("hill_alpha"))
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
             |            WHERE l_shipdate < TIMESTAMP '1997-01-01'),
             |e AS (
             |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |  FROM li a JOIN li b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |ne AS (SELECT count(*) AS n_edges FROM e),
             |deg AS (
             |  SELECT node, count(*) AS d FROM (
             |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
             |  GROUP BY 1),
             |rk AS (
             |  SELECT node, d,
             |    row_number() OVER (ORDER BY d DESC, node) AS r,
             |    count(*) OVER () AS n,
             |    (count(*) OVER () + 9) // 10 AS k
             |  FROM deg),
             |dm AS (SELECT d AS dmin FROM rk WHERE r = k + 1),
             |t AS (
             |  SELECT rk.n, rk.k,
             |    CASE WHEN rk.r = 1 THEN rk.d END AS maxd,
             |    CAST(round(ln(CAST(rk.d AS DOUBLE) / CAST(dm.dmin AS DOUBLE)), 6)
             |      AS DECIMAL(20,6)) AS t
             |  FROM rk CROSS JOIN dm WHERE rk.r <= rk.k)
             |SELECT CAST(t.n AS BIGINT) AS n_nodes,
             |  CAST(ne.n_edges AS BIGINT) AS n_edges,
             |  CAST(max(t.maxd) AS BIGINT) AS max_degree,
             |  CAST(t.k AS BIGINT) AS k_tail,
             |  round(CAST(t.k AS DOUBLE) / CAST(SUM(t.t) AS DOUBLE), 6)
             |    AS hill_alpha
             |FROM t CROSS JOIN ne GROUP BY t.n, t.k, ne.n_edges""".stripMargin)),

    QueryDef("cls3_gate_sweep",
      // classifier-gate calibration sweep: survivor counts if c12's
      // quality gate were set at the score's exact p25/p50/p75 ORDER
      // STATISTICS (rank ⌈q·n/100⌉ of the 6dp scores — no quantile
      // interpolation, so the cutoffs are exact decimals and the ≥
      // comparisons cannot ulp-flip). The tuning table read before
      // committing a gate threshold to a corpus build.
      (s, dir) => {
        val d = docs(s, dir)
        val labeled = d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), (col("lang") === "en").as("label"))
        val (w, bias) = Cls.naiveBayesWeights(labeled, "text", "label",
          buckets = 1 << 16, hash = D.md5Hash60)
        val scored = Cls.scoreLinear(d, "doc_id", "text", w, bias,
            buckets = 1 << 16, hash = D.md5Hash60)
          .select(col("doc_id"), col("score").cast("decimal(10,6)").as("sc"))
        // scale shape (the r11 verdict's cls3 scale-tier item): the
        // exact pXX order statistics AND the survivor counts both fall
        // out of the per-score-LEVEL histogram — rank r lands in the
        // level whose cumulative count first reaches r (doc_id
        // tie-breaks never change the VALUE at a rank), and
        // survivors(τ) = n − #(sc < τ) = n − cumBefore(τ's level). The
        // only window left is over distinct 6dp score levels (≤ 10⁶+1
        // regardless of corpus size); no second corpus pass. Pinned:
        // the total and the cumulative chain both read the histogram.
        val lv = graft.Caches.trackedPersist(
          scored.groupBy("sc").agg(count(lit(1)).as("_lm")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = lv.agg(sum(col("_lm")).as("_n"))
        val wL = Window.orderBy("sc")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = lv.withColumn("_cum", sum(col("_lm")).over(wL))
          .crossJoin(broadcast(n))
        val qs = s.range(1, 4).select((col("id") * 25).cast("int").as("q"))
        cum.join(broadcast(qs),
            col("_cum") - col("_lm") < expr("(q * _n + 99) div 100") &&
              col("_cum") >= expr("(q * _n + 99) div 100"))
          .select(col("q"), col("sc").cast("double").as("tau"),
            col("_n").as("n_docs"),
            (col("_n") - (col("_cum") - col("_lm"))).as("survivors"))
          .withColumn("survivor_share", round(col("survivors").cast("double") /
            col("n_docs").cast("double"), 6))
          .orderBy("q")
      },
      Some("WITH " + nbScoreCtes +
        """,
          |scored AS (
          |  SELECT d.doc_id,
          |    CAST(round(1.0 / (1.0 + exp(-(coalesce(sc.m, 0.0) + pr.bias))), 6)
          |      AS DECIMAL(10,6)) AS s
          |  FROM documents d CROSS JOIN pr LEFT JOIN sc USING (doc_id)),
          |rk AS (
          |  SELECT doc_id, s,
          |    row_number() OVER (ORDER BY s, doc_id) AS rn,
          |    count(*) OVER () AS n
          |  FROM scored),
          |qs AS (SELECT unnest([25, 50, 75]) AS q),
          |taus AS (
          |  SELECT qs.q, rk.s AS tau, rk.n
          |  FROM rk JOIN qs ON rk.rn = (qs.q * rk.n + 99) // 100)
          |SELECT t.q, CAST(t.tau AS DOUBLE) AS tau,
          |  CAST(t.n AS BIGINT) AS n_docs,
          |  CAST(sum(CASE WHEN scored.s >= t.tau THEN 1 ELSE 0 END) AS BIGINT)
          |    AS survivors,
          |  round(CAST(sum(CASE WHEN scored.s >= t.tau THEN 1 ELSE 0 END)
          |      AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS survivor_share
          |FROM scored CROSS JOIN taus t
          |GROUP BY t.q, t.tau, t.n ORDER BY q""".stripMargin)),

    QueryDef("mix4_temperature_sweep",
      // mixture-planning table: the source shares a d9 temperature
      // draw CONVERGES to, at α ∈ {0.3, 0.5, 0.7} — share_α(s) =
      // n_s^α / Σ n^α — next to the raw share (α=1). The table a
      // mixture review reads before picking α. Counts exact; pow and
      // the normalizing division follow the d9 contract (6dp-rounded
      // rates — pow is the one non-correctly-rounded libm op, absorbed
      // by the rounding); the Σn^α normalizer sums 6dp decimals.
      (s, dir) => {
        val c = graft.Caches.trackedPersist(
          docs(s, dir).groupBy("source").agg(count(lit(1)).as("n")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val alphas = s.range(3, 8, 2)
          .select((col("id").cast("double") / 10.0).as("alpha"))
        val powed = c.crossJoin(broadcast(alphas))
          .withColumn("_p", round(pow(col("n").cast("double"), col("alpha")), 6)
            .cast("decimal(24,6)"))
        val tot = powed.groupBy("alpha").agg(sum(col("_p")).as("_z"),
          sum(col("n")).as("_nt"))
        powed.join(broadcast(tot), "alpha")
          .select(col("alpha"), col("source"), col("n"),
            round(col("n").cast("double") / col("_nt").cast("double"), 6)
              .as("raw_share"),
            round(col("_p").cast("double") / col("_z").cast("double"), 6)
              .as("temp_share"))
          .orderBy("alpha", "source")
      },
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
             |al AS (SELECT unnest([0.3, 0.5, 0.7]) AS alpha),
             |p AS (
             |  SELECT c.source, c.n, al.alpha,
             |    CAST(round(pow(CAST(c.n AS DOUBLE), al.alpha), 6)
             |      AS DECIMAL(24,6)) AS pw
             |  FROM c CROSS JOIN al),
             |t AS (SELECT alpha, SUM(pw) AS z, CAST(SUM(n) AS BIGINT) AS nt
             |      FROM p GROUP BY 1)
             |SELECT p.alpha, p.source, p.n,
             |  round(CAST(p.n AS DOUBLE) / CAST(t.nt AS DOUBLE), 6) AS raw_share,
             |  round(CAST(p.pw AS DOUBLE) / CAST(t.z AS DOUBLE), 6) AS temp_share
             |FROM p JOIN t USING (alpha)
             |ORDER BY alpha, source""".stripMargin)),

    QueryDef("w54_information_ratio",
      // information ratio per ticker vs the equal-cap index: mean and
      // stddev of the EXCESS return (ticker − index, exact µunit
      // integer differences) — "does the name beat the market per unit
      // of tracking error", completing w37/w44's relative-performance
      // family. Exact moments, one IEEE chain, annualized ×√252 (√ is
      // correctly-rounded IEEE).
      (s, dir) => {
        val p = graft.Caches.trackedPersist(prices(t(s, dir, "lineitem")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wD = Window.orderBy("date")
        val mret = p.groupBy("date")
          .agg(sum(col("close").cast("decimal(12,2)")).cast("decimal(18,2)")
            .as("_ic"))
          .withColumn("m", (round(col("_ic").cast("double") /
            lag(col("_ic"), 1).over(wD).cast("double") - 1, 6)
            .cast("decimal(10,6)") * 1000000).cast("long"))
          .filter(col("m").isNotNull).select("date", "m")
        val tret = p
          .withColumn("ret", col("close") / lag("close", 1).over(wTicker) - 1)
          .filter(col("ret").isNotNull)
          .select(col("ticker"), col("date"),
            (round(col("ret"), 6).cast("decimal(10,6)") * 1000000)
              .cast("long").as("y"))
        val x = tret.join(mret, "date")
          .withColumn("_e", col("y") - col("m"))
        val a = x.groupBy("ticker").agg(
          count(lit(1)).as("n"), sum(col("_e")).as("_s"),
          sum(col("_e").cast("decimal(38,0)") * col("_e")).as("_q"))
        val mean = col("_s").cast("double") / col("n").cast("double")
        val sd = sqrt((col("_q") * col("n") -
            col("_s").cast("decimal(38,0)") * col("_s")).cast("double") /
          (col("n").cast("double") * (col("n") - 1).cast("double")))
        a.filter(col("n") >= 2)
          .select(col("ticker"), col("n"),
            round(mean / lit(1e6), 6).as("mean_excess"),
            when(sd > 0, round(mean / sd * sqrt(lit(252.0)), 6))
              .as("ir_annualized"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, ic AS (
          |  SELECT "date", CAST(sum(CAST(close AS DECIMAL(12,2)))
          |    AS DECIMAL(18,2)) AS ic
          |  FROM prices GROUP BY 1),
          |mr AS (
          |  SELECT "date",
          |    CAST(CAST(round(CAST(ic AS DOUBLE)
          |        / CAST(lag(ic) OVER (ORDER BY "date") AS DOUBLE) - 1, 6)
          |      AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS m
          |  FROM ic),
          |tr AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(round(ret, 6) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS y
          |  FROM r WHERE ret IS NOT NULL),
          |x AS (
          |  SELECT tr.ticker, tr.y - mr.m AS e
          |  FROM tr JOIN mr USING ("date") WHERE mr.m IS NOT NULL),
          |a AS (
          |  SELECT ticker, count(*) AS n, CAST(sum(e) AS BIGINT) AS s,
          |    sum(CAST(e AS HUGEINT) * e) AS q
          |  FROM x GROUP BY 1)
          |SELECT ticker, n,
          |  round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 1000000.0, 6)
          |    AS mean_excess,
          |  CASE WHEN q * n > CAST(s AS HUGEINT) * s THEN
          |    round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |      / sqrt(CAST(q * n - CAST(s AS HUGEINT) * s AS DOUBLE)
          |             / (CAST(n AS DOUBLE) * (n - 1))) * sqrt(252.0), 6)
          |  END AS ir_annualized
          |FROM a WHERE n >= 2 ORDER BY ticker""".stripMargin)),

    QueryDef("a48_seasonal_index",
      // month-of-year seasonal index of shipped quantity: 12·Q_m/Q_tot
      // — the classic retail seasonality table (index 1 = an average
      // month; the December spike every capacity plan needs). Exact
      // integer quantities; one mirrored division per month, 6dp.
      (s, dir) => {
        val m = t(s, dir, "lineitem")
          .groupBy(month(col("l_shipdate")).as("m"))
          .agg(sum(col("l_quantity").cast("long")).as("qty"))
        m.withColumn("_tot", sum(col("qty")).over(Window.partitionBy(lit(1))))
          .select(col("m").as("month"), col("qty"),
            round(lit(12.0) * col("qty").cast("double") /
              col("_tot").cast("double"), 6).as("seasonal_index"))
          .orderBy("month")
      },
      Some("""WITH m AS (
             |  SELECT CAST(month(l_shipdate) AS INTEGER) AS m,
             |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
             |  FROM lineitem GROUP BY 1)
             |SELECT m AS month, qty,
             |  round(12.0 * CAST(qty AS DOUBLE)
             |    / CAST(sum(qty) OVER () AS DOUBLE), 6) AS seasonal_index
             |FROM m ORDER BY month""".stripMargin)),

    QueryDef("a49_grouping_sets",
      // explicit GROUPING SETS ((flag), (status), ()) — the third
      // grouping-set surface next to a16's ROLLUP and a19's CUBE:
      // independent marginals plus the grand total in ONE pass,
      // without the cross-combinations CUBE would add. grouping_id
      // disambiguates the null dimension values (the a16 convention).
      (s, dir) => {
        val df = t(s, dir, "lineitem")
        df.groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            money2(sum(col("l_extendedprice").cast("decimal(12,4)")))
              .as("revenue"),
            grouping_id().cast("long").as("gid"))
          .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2)
             |    AS DOUBLE) AS revenue,
             |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
             |    AS BIGINT) AS gid
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)),

    QueryDef("w56_win_rate",
      // trading-stat basics per ticker: up-day share (win rate) and
      // profit factor Σgains/Σ|losses| over daily µunit returns — the
      // two numbers every strategy sheet leads with, next to a31's
      // risk ratios. Exact integer sums split by sign; two divisions.
      (s, dir) => {
        val x = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .select(col("ticker"),
            (round(col("ret"), 6).cast("decimal(10,6)") * 1000000)
              .cast("long").as("r"))
        x.groupBy("ticker").agg(
            count(lit(1)).as("n"),
            sum(when(col("r") > 0, 1L).otherwise(0L)).as("up_days"),
            sum(when(col("r") > 0, col("r")).otherwise(0L)).as("_g"),
            sum(when(col("r") < 0, -col("r")).otherwise(0L)).as("_l"))
          .select(col("ticker"), col("n"), col("up_days"),
            round(col("up_days").cast("double") / col("n").cast("double"), 6)
              .as("win_rate"),
            when(col("_l") > 0, round(col("_g").cast("double") /
              col("_l").cast("double"), 6)).as("profit_factor"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, x AS (
          |  SELECT ticker,
          |    CAST(CAST(round(ret, 6) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS r
          |  FROM r WHERE ret IS NOT NULL),
          |a AS (
          |  SELECT ticker, count(*) AS n,
          |    CAST(sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT) AS up_days,
          |    CAST(sum(CASE WHEN r > 0 THEN r ELSE 0 END) AS BIGINT) AS g,
          |    CAST(sum(CASE WHEN r < 0 THEN -r ELSE 0 END) AS BIGINT) AS l
          |  FROM x GROUP BY 1)
          |SELECT ticker, n, up_days,
          |  round(CAST(up_days AS DOUBLE) / CAST(n AS DOUBLE), 6) AS win_rate,
          |  CASE WHEN l > 0
          |       THEN round(CAST(g AS DOUBLE) / CAST(l AS DOUBLE), 6) END
          |    AS profit_factor
          |FROM a ORDER BY ticker""".stripMargin)),

    QueryDef("d35_dup_locality",
      // near-duplicate LOCALITY: of d3's exact Jaccard pairs (≥ 0.8),
      // how many live WITHIN one source vs across sources — the
      // architecture decision this feeds is real (within-only dup ⇒
      // dedup shards per source; cross-source dup ⇒ global index
      // mandatory, the c5-family shape). Pair machinery is d3's; the
      // locality tag is two broadcast source-lookups; all-integer.
      (s, dir) => {
        val src = docs(s, dir).select(col("doc_id"), col("source"))
        val pairs = D.jaccardPairs(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.8, maxDf = 1000L)
        pairs
          .join(broadcast(src.toDF("id_a", "_sa")), "id_a")
          .join(broadcast(src.toDF("id_b", "_sb")), "id_b")
          .groupBy((col("_sa") === col("_sb")).as("within_source"))
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("share", round(col("n_pairs").cast("double") /
            sum(col("n_pairs")).over(Window.partitionBy(lit(1)))
              .cast("double"), 6))
          .orderBy("within_source")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(tk) - 2 <= 0 THEN [array_to_string(tk, ' ')]
             |         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' '))) END AS shingles
             |  FROM toks),
             |e AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sgl FROM sh),
             |p AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a,
             |         b.n_sh AS n_b, count(*) AS shared
             |  FROM e a JOIN e b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2, 3, 4),
             |k AS (
             |  SELECT id_a, id_b FROM p
             |  WHERE CAST(shared AS DOUBLE)
             |    / CAST(n_a + n_b - shared AS DOUBLE) >= 0.8),
             |t AS (
             |  SELECT (da.source = db.source) AS within_source,
             |         count(*) AS n_pairs
             |  FROM k JOIN documents da ON k.id_a = da.doc_id
             |         JOIN documents db ON k.id_b = db.doc_id
             |  GROUP BY 1)
             |SELECT within_source, n_pairs,
             |  round(CAST(n_pairs AS DOUBLE)
             |    / CAST(sum(n_pairs) OVER () AS DOUBLE), 6) AS share
             |FROM t ORDER BY within_source""".stripMargin)),

    QueryDef("s16_eps_selection",
      // ε-selection data for d28's DBSCAN: every vector's cosine to
      // its 5th nearest neighbor, summarized as exact decile ORDER
      // STATISTICS — the "knee plot" that picks the density threshold
      // before clustering (Ester 1996 §4.2's sorted k-dist graph).
      // 5NN similarities are s1's 6dp cosines (exact picks, ties by
      // id); deciles are ⌈d·n/10⌉ ranks — no interpolation anywhere.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
        // pinned: the count and the distributed ranking's three input
        // evaluations read the 5NN frame (the qq1 shape — no
        // single-partition window)
        val fifth = graft.Caches.trackedPersist(
          S.bruteForceTopK(emb, q, 5)
            .filter(col("rank") === 5)
            .select(col("query_id"), col("cosine").cast("decimal(10,6)").as("c5")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nn = fifth.agg(count(lit(1)).as("_n"))
        val ranked = graft.ops.RankOps.withGlobalRank(fifth,
            Seq(col("c5"), col("query_id")), "_rn")
          .crossJoin(broadcast(nn))
        ranked.join(broadcast(s.range(1, 10)
            .select(col("id").cast("int").as("decile"))),
            col("_rn") === expr("(decile * _n + 9) div 10"))
          .select(col("decile"), col("c5").cast("double").as("knn5_cosine"))
          .orderBy("decile")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |      FROM embeddings),
             |scored AS (
             |  SELECT q.query_id, e.vec_id,
             |         round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
             |  FROM e, q WHERE e.vec_id <> q.query_id),
             |r5 AS (
             |  SELECT query_id,
             |    CAST(cosine AS DECIMAL(10,6)) AS c5,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY cosine DESC, vec_id) AS rk
             |  FROM scored),
             |f AS (SELECT query_id, c5 FROM r5 WHERE rk = 5),
             |rk2 AS (
             |  SELECT query_id, c5,
             |    row_number() OVER (ORDER BY c5, query_id) AS rn,
             |    count(*) OVER () AS n
             |  FROM f),
             |d AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS decile)
             |SELECT d.decile, CAST(rk2.c5 AS DOUBLE) AS knn5_cosine
             |FROM rk2 JOIN d ON rk2.rn = (d.decile * rk2.n + 9) // 10
             |ORDER BY decile""".stripMargin)),

    QueryDef("port2_turnover",
      // portfolio turnover of the monthly momentum top-quintile (the
      // port1 strategy's trading cost driver): of each month's top
      // basket, how many names were already held last month — turnover
      // = 1 − stay/held. Month-end closes are exact max_by picks
      // (cents), 3-month momentum ranks with (mom desc, ticker) total
      // tie-break, and the month-over-month overlap is one self-join
      // on (ticker, month−1). All-integer counts; one division.
      (s, dir) => {
        val wm = Window.partitionBy("ticker").orderBy("mon")
        val mclose = prices(t(s, dir, "lineitem"))
          .groupBy(col("ticker"),
            date_trunc("month", col("date")).cast("date").as("mon"))
          .agg(max_by(
            (col("close").cast("decimal(12,2)") * 100).cast("long"),
            col("date")).as("c"))
        val mom = mclose
          .withColumn("_c3", lag(col("c"), 3).over(wm))
          .filter(col("_c3").isNotNull)
          .withColumn("mom", col("c").cast("double") / col("_c3").cast("double"))
        val top = graft.Caches.trackedPersist(mom
          .withColumn("_q", ntile(5).over(Window.partitionBy("mon")
            .orderBy(col("mom").desc, col("ticker"))))
          .filter(col("_q") === 1)
          .select(col("ticker"), col("mon")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val prev = top.select(col("ticker"),
          add_months(col("mon"), 1).as("mon"), lit(1L).as("_held"))
        top.join(prev, Seq("ticker", "mon"), "left")
          .groupBy("mon")
          .agg(count(lit(1)).as("n_top"),
            sum(coalesce(col("_held"), lit(0L))).as("n_stay"))
          .withColumn("turnover", round(lit(1.0) -
            col("n_stay").cast("double") / col("n_top").cast("double"), 6))
          .orderBy("mon")
      },
      Some(pricesSql +
        """, mc AS (
          |  SELECT ticker, CAST(date_trunc('month', "date") AS DATE) AS mon,
          |    (MAX({'d': "date",
          |          'c': CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT)})).c
          |      AS c
          |  FROM prices GROUP BY 1, 2),
          |mo AS (
          |  SELECT ticker, mon, c,
          |    lag(c, 3) OVER (PARTITION BY ticker ORDER BY mon) AS c3
          |  FROM mc),
          |mm AS (
          |  SELECT ticker, mon,
          |    CAST(c AS DOUBLE) / CAST(c3 AS DOUBLE) AS mom
          |  FROM mo WHERE c3 IS NOT NULL),
          |tp AS (
          |  SELECT ticker, mon FROM (
          |    SELECT ticker, mon,
          |      ntile(5) OVER (PARTITION BY mon
          |        ORDER BY mom DESC, ticker) AS q
          |    FROM mm) WHERE q = 1),
          |pv AS (SELECT ticker, mon + INTERVAL 1 MONTH AS mon, 1 AS held
          |       FROM tp)
          |SELECT tp.mon, count(*) AS n_top,
          |  CAST(sum(COALESCE(pv.held, 0)) AS BIGINT) AS n_stay,
          |  round(1.0 - CAST(sum(COALESCE(pv.held, 0)) AS DOUBLE)
          |    / CAST(count(*) AS DOUBLE), 6) AS turnover
          |FROM tp LEFT JOIN pv ON tp.ticker = pv.ticker
          |  AND tp.mon = CAST(pv.mon AS DATE)
          |GROUP BY 1 ORDER BY tp.mon""".stripMargin)),

    QueryDef("url3_param_census",
      // query-parameter census over the url1 planted corpus: every
      // param key's frequency, share, and whether url1's normalization
      // would strip it (the [[graft.functions.UrlFunctions]] tracking
      // alternation, anchored) — the report that EXTENDS the strip
      // list when a new tracker shows up in crawl logs. Pure regex
      // projections (Java∩RE2 subset) + one hash agg; all-integer.
      (s, dir) => {
        val ks = plantedUrls(s, dir)
          .select(regexp_extract(col("url"), "\\?([^#]*)", 1).as("_q"))
          .filter(length(col("_q")) > 0)
          .select(explode(split(col("_q"), "&")).as("_kv"))
          .filter(length(col("_kv")) > 0)
          .select(regexp_extract(col("_kv"), "^([^=]*)", 1).as("key"))
        val h = ks.groupBy("key").agg(count(lit(1)).as("n"))
        h.withColumn("_t", sum(col("n")).over(Window.partitionBy(lit(1))))
          .select(col("key"), col("n"),
            round(col("n").cast("double") / col("_t").cast("double"), 6)
              .as("share"),
            col("key").rlike(
              "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|igshid|ref|ref_src|mc_cid|mc_eid)$")
              .as("stripped_by_normalize"))
          .orderBy("key")
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    CASE
             |      WHEN doc_id % 4 = 0 THEN
             |        'HTTPS://WWW.' || source || '.Example.CO.UK:443/Docs/'
             |          || doc_id || '/?utm_source=feed&page=' || doc_id % 7
             |          || '#top'
             |      WHEN doc_id % 4 = 1 THEN
             |        'http://' || source || '.example.com:80/A/' || doc_id
             |      WHEN doc_id % 4 = 2 THEN
             |        'https://cdn.' || source || '.org?gclid=x&id=' || doc_id
             |      ELSE source || '.com/bare/' || doc_id
             |    END AS url
             |  FROM documents),
             |q AS (
             |  SELECT regexp_extract(url, '\?([^#]*)', 1) AS qs FROM u),
             |kv AS (
             |  SELECT unnest(string_split(qs, '&')) AS kv
             |  FROM q WHERE length(qs) > 0),
             |k AS (
             |  SELECT regexp_extract(kv, '^([^=]*)', 1) AS key
             |  FROM kv WHERE length(kv) > 0),
             |h AS (SELECT key, count(*) AS n FROM k GROUP BY 1)
             |SELECT key, n,
             |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6)
             |    AS share,
             |  regexp_matches(key,
             |    '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|igshid|ref|ref_src|mc_cid|mc_eid)$')
             |    AS stripped_by_normalize
             |FROM h ORDER BY key""".stripMargin)),

    QueryDef("mm4_media_profile",
      // per-modality payload profile over the mm1 synthetic binaries
      // (doc_id % 3 → image/audio/video, the deterministic stand-in):
      // asset counts, byte totals, min/max/mean sizes — the storage-
      // planning table a multimodal lake reads before sharding. Byte
      // lengths are exact longs; one division.
      (s, dir) => {
        val a = docs(s, dir).select(col("doc_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("modality"),
          length(concat(col("text"), lit("#"), col("lang")).cast("binary"))
            .cast("long").as("n_bytes"))
        a.groupBy("modality").agg(
            count(lit(1)).as("n_assets"),
            sum(col("n_bytes")).as("total_bytes"),
            min(col("n_bytes")).as("min_bytes"),
            max(col("n_bytes")).as("max_bytes"),
            round(sum(col("n_bytes")).cast("double") /
              count(lit(1)).cast("double"), 6).as("mean_bytes"))
          .orderBy("modality")
      },
      Some("""WITH a AS (
             |  SELECT doc_id,
             |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)]
             |      AS modality,
             |    CAST(octet_length(encode(text || '#' || lang)) AS BIGINT)
             |      AS n_bytes
             |  FROM documents)
             |SELECT modality, count(*) AS n_assets,
             |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
             |  CAST(min(n_bytes) AS BIGINT) AS min_bytes,
             |  CAST(max(n_bytes) AS BIGINT) AS max_bytes,
             |  round(CAST(sum(n_bytes) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             |    AS mean_bytes
             |FROM a GROUP BY 1 ORDER BY modality""".stripMargin)),

    QueryDef("d36_dedup_savings",
      // what exact dedup SAVES, per source: docs and tokens that d1's
      // fingerprint pass would drop — the "is dedup worth the pass"
      // sizing report mix1's accounting assumes. Keeper = min doc_id
      // per fingerprint group (the d1 rule); dropped mass is one
      // anti-condition aggregate; all-integer, one division per rate.
      (s, dir) => {
        val f = docs(s, dir).filter(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            T.tokenCount(col("text")).as("_tok"),
            T.fingerprint(col("text")).as("_fp"))
        val keep = f.groupBy("_fp").agg(min(col("doc_id")).as("_keep"))
        f.join(broadcast(keep), Seq("_fp"))
          .withColumn("_dropped", col("doc_id") =!= col("_keep"))
          .groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            sum(col("_tok")).as("n_tokens"),
            sum(when(col("_dropped"), 1L).otherwise(0L)).as("docs_dropped"),
            sum(when(col("_dropped"), col("_tok")).otherwise(0L))
              .as("tokens_dropped"))
          .withColumn("token_savings", round(
            col("tokens_dropped").cast("double") /
              col("n_tokens").cast("double"), 6))
          .orderBy("source")
      },
      Some("""WITH f AS (
             |  SELECT doc_id, source,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
             |      AS tok,
             |    md5(regexp_replace(regexp_replace(lower(text),
             |      '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS fp
             |  FROM documents WHERE text IS NOT NULL),
             |k AS (SELECT fp, min(doc_id) AS keep FROM f GROUP BY 1)
             |SELECT f.source, count(*) AS n_docs,
             |  CAST(sum(f.tok) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN f.doc_id <> k.keep THEN 1 ELSE 0 END)
             |    AS BIGINT) AS docs_dropped,
             |  CAST(sum(CASE WHEN f.doc_id <> k.keep THEN f.tok ELSE 0 END)
             |    AS BIGINT) AS tokens_dropped,
             |  round(CAST(sum(CASE WHEN f.doc_id <> k.keep THEN f.tok
             |      ELSE 0 END) AS DOUBLE) / CAST(sum(f.tok) AS DOUBLE), 6)
             |    AS token_savings
             |FROM f JOIN k USING (fp) GROUP BY 1 ORDER BY source""".stripMargin)),

    QueryDef("e30_engagement_transitions",
      // engagement-state Markov matrix: users bucketed into WEEKLY
      // activity terciles (heavy/mid/light by event count, (count
      // desc, user) ntile tie-break) plus 'absent', and the transition
      // counts between consecutive calendar weeks — e15's machinery
      // on the ENGAGEMENT axis (the churn-funnel view: heavy→absent is
      // the alarm cell; weeks, because the synthetic log spans ~one
      // month). All-integer; one division per row.
      (s, dir) => {
        val m = events(s, dir)
          .groupBy(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("mon"))
          .agg(count(lit(1)).as("_n"))
        val state = graft.Caches.trackedPersist(m
          .withColumn("_t", ntile(3).over(Window.partitionBy("mon")
            .orderBy(col("_n").desc, col("user_id"))))
          .withColumn("state",
            when(col("_t") === 1, "heavy").when(col("_t") === 2, "mid")
              .otherwise("light"))
          .select(col("user_id"), col("mon"), col("state")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nxt = state.select(col("user_id"),
          date_sub(col("mon"), 7).as("mon"), col("state").as("_to"))
        val pairs = state.join(nxt, Seq("user_id", "mon"), "left")
          .withColumn("to_state", coalesce(col("_to"), lit("absent")))
          .groupBy(col("state").as("from_state"), col("to_state"))
          .agg(count(lit(1)).as("n"))
        val tot = pairs.groupBy("from_state").agg(sum(col("n")).as("_t"))
        pairs.join(broadcast(tot), "from_state")
          .select(col("from_state"), col("to_state"), col("n"),
            round(col("n").cast("double") / col("_t").cast("double"), 6)
              .as("p"))
          .orderBy("from_state", "to_state")
      },
      Some("""WITH m AS (
             |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS mon,
             |         count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |st AS (
             |  SELECT user_id, mon,
             |    CASE ntile(3) OVER (PARTITION BY mon ORDER BY n DESC, user_id)
             |      WHEN 1 THEN 'heavy' WHEN 2 THEN 'mid' ELSE 'light' END
             |      AS state
             |  FROM m),
             |nx AS (
             |  SELECT user_id, mon - 7 AS mon,
             |         state AS to_s
             |  FROM st),
             |p AS (
             |  SELECT st.state AS from_state,
             |         COALESCE(nx.to_s, 'absent') AS to_state, count(*) AS n
             |  FROM st LEFT JOIN nx USING (user_id, mon)
             |  GROUP BY 1, 2),
             |t AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS t
             |      FROM p GROUP BY 1)
             |SELECT p.from_state, p.to_state, p.n,
             |  round(CAST(p.n AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS p
             |FROM p JOIN t USING (from_state)
             |ORDER BY from_state, to_state""".stripMargin)),

    QueryDef("t28_template_prefixes",
      // template detection by OPENING-LINE fingerprint: documents
      // grouped by their first 8 normalized tokens; groups with > 1
      // member are template families (form letters, generated pages —
      // the d1 exact-dup key misses them when bodies differ). Top-10
      // families by size with an example doc id (deterministic min).
      // One projection + hash agg; all-integer.
      (s, dir) => {
        val p = docs(s, dir).filter(col("text").isNotNull)
          .select(col("doc_id"),
            array_join(slice(split(lower(trim(col("text"))), "\\s+"),
              lit(1), lit(8)), " ").as("prefix"))
        p.groupBy("prefix")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("example_doc"))
          .filter(col("n_docs") > 1)
          .orderBy(col("n_docs").desc, col("prefix")).limit(10)
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      (regexp_split_to_array(lower(trim(text)), '\s+'))[1:8], ' ')
             |      AS prefix
             |  FROM documents WHERE text IS NOT NULL),
             |g AS (
             |  SELECT prefix, count(*) AS n_docs,
             |         CAST(min(doc_id) AS BIGINT) AS example_doc
             |  FROM p GROUP BY 1)
             |SELECT prefix, n_docs, example_doc FROM g
             |WHERE n_docs > 1
             |ORDER BY n_docs DESC, prefix LIMIT 10""".stripMargin)),

    QueryDef("e31_session_stats",
      // batch session summary: the e2 gaps-and-islands sessions rolled
      // up per user — session count, median session duration (exact
      // integer seconds, ⌈n/2⌉ ORDER STATISTIC — no interpolation) and
      // median events per session. Two per-user windows (the e2 shape)
      // + one rank per user over its own sessions.
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val sess = events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("_prev", lag(col("ts"), 1).over(w))
          .withColumn("_new", when(col("_prev").isNull ||
            expr("unix_micros(ts) - unix_micros(_prev)") >= 1800000000L,
            1L).otherwise(0L))
          .withColumn("_sid", sum(col("_new")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "_sid")
          .agg(count(lit(1)).as("_ev"),
            expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000L")
              .as("_dur"))
        val ranked = sess
          .withColumn("_rd", row_number().over(Window.partitionBy("user_id")
            .orderBy(col("_dur"), col("_sid"))))
          .withColumn("_re", row_number().over(Window.partitionBy("user_id")
            .orderBy(col("_ev"), col("_sid"))))
          .withColumn("_n", count(lit(1)).over(Window.partitionBy("user_id")))
        ranked.groupBy("user_id")
          .agg(max(col("_n")).as("n_sessions"),
            max(when(col("_rd") === expr("(_n + 1) div 2"), col("_dur")))
              .as("median_duration_s"),
            max(when(col("_re") === expr("(_n + 1) div 2"), col("_ev")))
              .as("median_events"))
          .orderBy("user_id")
      },
      Some("""WITH m AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR date_diff('microsecond', lag(ts) OVER w, ts)
             |              >= 1800000000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |g AS (
             |  SELECT user_id, ts, event_id,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m),
             |sess AS (
             |  SELECT user_id, sid, count(*) AS ev,
             |    date_diff('microsecond', min(ts), max(ts)) // 1000000 AS dur
             |  FROM g GROUP BY 1, 2),
             |rk AS (
             |  SELECT user_id, sid, ev, dur,
             |    row_number() OVER (PARTITION BY user_id ORDER BY dur, sid)
             |      AS rd,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ev, sid)
             |      AS re,
             |    count(*) OVER (PARTITION BY user_id) AS n
             |  FROM sess)
             |SELECT user_id, CAST(max(n) AS BIGINT) AS n_sessions,
             |  CAST(max(CASE WHEN rd = (n + 1) // 2 THEN dur END) AS BIGINT)
             |    AS median_duration_s,
             |  CAST(max(CASE WHEN re = (n + 1) // 2 THEN ev END) AS BIGINT)
             |    AS median_events
             |FROM rk GROUP BY 1 ORDER BY user_id""".stripMargin)),

    QueryDef("fe2_target_encoding",
      // smoothed target encoding of event_type against the value
      // target: enc = (Σv_c + m·ȳ)/(n_c + m), m = 100 (Micci-Barreca
      // 2001) — the leakage-light categorical encoder between fe1's
      // indices and one-hot blowup. Value sums are exact cents; ȳ and
      // each encoding are a short mirrored IEEE chain, 6dp.
      (s, dir) => {
        val v = events(s, dir).filter(col("value").isNotNull)
          .select(col("event_type"),
            (col("value").cast("decimal(12,2)") * 100).cast("long").as("_vc"))
        val g = v.agg(sum(col("_vc")).as("_st"), count(lit(1)).as("_nt"))
        v.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("_vc")).as("_sc"))
          .crossJoin(broadcast(g))
          .select(col("event_type"), col("n"),
            round((col("_sc").cast("double") / col("n").cast("double")) / 100.0,
              6).as("raw_mean"),
            round(((col("_sc").cast("double") + lit(100.0) *
              (col("_st").cast("double") / col("_nt").cast("double"))) /
              (col("n") + 100).cast("double")) / 100.0, 6).as("encoded"))
          .orderBy("event_type")
      },
      Some("""WITH v AS (
             |  SELECT event_type,
             |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
             |  FROM events WHERE value IS NOT NULL),
             |g AS (SELECT CAST(sum(vc) AS BIGINT) AS st, count(*) AS nt FROM v),
             |c AS (SELECT event_type, count(*) AS n,
             |             CAST(sum(vc) AS BIGINT) AS sc
             |      FROM v GROUP BY 1)
             |SELECT c.event_type, c.n,
             |  round((CAST(c.sc AS DOUBLE) / CAST(c.n AS DOUBLE)) / 100.0, 6)
             |    AS raw_mean,
             |  round(((CAST(c.sc AS DOUBLE) + 100.0
             |      * (CAST(g.st AS DOUBLE) / CAST(g.nt AS DOUBLE)))
             |    / CAST(c.n + 100 AS DOUBLE)) / 100.0, 6) AS encoded
             |FROM c CROSS JOIN g ORDER BY event_type""".stripMargin)),

    QueryDef("w57_kelly",
      // Kelly fraction per ticker: f* ≈ μ/σ² of daily returns (the
      // log-wealth first-order optimum) capped to [0, 1] for the
      // long-only reading — the position-sizing number next to a13's
      // Sharpe. Exact µunit moments; the cap compares the SAME doubles
      // in both engines; 6dp.
      (s, dir) => {
        val x = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .select(col("ticker"),
            (round(col("ret"), 6).cast("decimal(10,6)") * 1000000)
              .cast("long").as("r"))
        val a = x.groupBy("ticker").agg(
          count(lit(1)).as("n"), sum(col("r")).as("_s"),
          sum(col("r").cast("decimal(38,0)") * col("r")).as("_q"))
        val mean = col("_s").cast("double") / col("n").cast("double")
        val variance = (col("_q") * col("n") -
            col("_s").cast("decimal(38,0)") * col("_s")).cast("double") /
          (col("n").cast("double") * (col("n") - 1).cast("double"))
        val kelly = mean * lit(1e6) / variance
        a.filter(col("n") >= 2 && col("_q") > 0)
          .select(col("ticker"), col("n"),
            round(kelly, 6).as("kelly_raw"),
            round(greatest(lit(0.0), least(lit(1.0), kelly)), 6)
              .as("kelly_capped"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, x AS (
          |  SELECT ticker,
          |    CAST(CAST(round(ret, 6) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS r
          |  FROM r WHERE ret IS NOT NULL),
          |a AS (
          |  SELECT ticker, count(*) AS n, CAST(sum(r) AS BIGINT) AS s,
          |    sum(CAST(r AS HUGEINT) * r) AS q
          |  FROM x GROUP BY 1),
          |k AS (
          |  SELECT ticker, n,
          |    (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0
          |      / (CAST(q * n - CAST(s AS HUGEINT) * s AS DOUBLE)
          |         / (CAST(n AS DOUBLE) * (n - 1))) AS kelly
          |  FROM a WHERE n >= 2 AND q > 0)
          |SELECT ticker, n, round(kelly, 6) AS kelly_raw,
          |  round(greatest(0.0, least(1.0, kelly)), 6) AS kelly_capped
          |FROM k ORDER BY ticker""".stripMargin)),

    QueryDef("a50_order_size_hist",
      // lines-per-order histogram: the basket-size distribution a34's
      // pair fan-out bound rests on ("bounded by order SIZE"), made
      // inspectable — sizes, order counts, cumulative share.
      // All-integer; one division per row; the cumulative window runs
      // over DISTINCT SIZES (the e21 histogram move).
      (s, dir) => {
        val h = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("_sz"))
          .groupBy(col("_sz").as("order_size"))
          .agg(count(lit(1)).as("n_orders"))
        h.withColumn("_cum", sum(col("n_orders")).over(
            Window.orderBy("order_size")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("_tot", sum(col("n_orders")).over(
            Window.partitionBy(lit(1))))
          .select(col("order_size"), col("n_orders"),
            round(col("_cum").cast("double") / col("_tot").cast("double"), 6)
              .as("cum_share"))
          .orderBy("order_size")
      },
      Some("""WITH s AS (
             |  SELECT l_orderkey, count(*) AS sz FROM lineitem GROUP BY 1),
             |h AS (SELECT sz AS order_size, count(*) AS n_orders
             |      FROM s GROUP BY 1)
             |SELECT order_size, n_orders,
             |  round(CAST(sum(n_orders) OVER (ORDER BY order_size
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             |    / CAST(sum(n_orders) OVER () AS DOUBLE), 6) AS cum_share
             |FROM h ORDER BY order_size""".stripMargin)),

    QueryDef("var2_kupiec",
      // VaR backtest per ticker: violations of the full-sample a35
      // VaR95 (in-sample by construction — the coverage check, not a
      // walk-forward) with the Kupiec-style binomial z for the 5%
      // coverage hypothesis. The violation count compares exact
      // decimals (ret < −VaR where VaR is the k-th order statistic);
      // z is one mirrored IEEE chain, 6dp.
      (s, dir) => {
        val x = graft.Caches.trackedPersist(
          pricesWithRet(s, dir).filter(col("ret").isNotNull)
            .select(col("ticker"), col("date"),
              round(col("ret"), 6).cast("decimal(10,6)").as("r6")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ranked = x
          .withColumn("_rn", row_number().over(
            Window.partitionBy("ticker").orderBy("r6", "date")))
          .withColumn("_k",
            expr("(count(*) OVER (PARTITION BY ticker) + 19) div 20"))
        val cut = ranked.filter(col("_rn") === col("_k"))
          .select(col("ticker"), col("r6").as("_var"))
        val p = lit(0.05)
        x.join(broadcast(cut), "ticker")
          .groupBy("ticker")
          .agg(count(lit(1)).as("n"),
            sum(when(col("r6") < col("_var"), 1L).otherwise(0L))
              .as("violations"))
          .select(col("ticker"), col("n"), col("violations"),
            round(col("violations").cast("double") / col("n").cast("double"), 6)
              .as("violation_rate"),
            round((col("violations").cast("double") -
              col("n").cast("double") * p) /
              sqrt(col("n").cast("double") * p * (lit(1.0) - p)), 6)
              .as("kupiec_z"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, x AS (
          |  SELECT ticker, "date", CAST(round(ret, 6) AS DECIMAL(10,6)) AS r6
          |  FROM r WHERE ret IS NOT NULL),
          |rk AS (
          |  SELECT ticker, r6,
          |    row_number() OVER (PARTITION BY ticker ORDER BY r6, "date") AS rn,
          |    (count(*) OVER (PARTITION BY ticker) + 19) // 20 AS k
          |  FROM x),
          |ct AS (SELECT ticker, r6 AS v FROM rk WHERE rn = k),
          |a AS (
          |  SELECT x.ticker, count(*) AS n,
          |    CAST(sum(CASE WHEN x.r6 < ct.v THEN 1 ELSE 0 END) AS BIGINT)
          |      AS violations
          |  FROM x JOIN ct USING (ticker) GROUP BY 1)
          |SELECT ticker, n, violations,
          |  round(CAST(violations AS DOUBLE) / CAST(n AS DOUBLE), 6)
          |    AS violation_rate,
          |  round((CAST(violations AS DOUBLE) - CAST(n AS DOUBLE) * 0.05)
          |    / sqrt(CAST(n AS DOUBLE) * 0.05 * (1.0 - 0.05)), 6) AS kupiec_z
          |FROM a ORDER BY ticker""".stripMargin)),

    QueryDef("s17_norm_profile",
      // embedding L2-norm deciles: the vector-QA table read before any
      // cosine/dot index is trusted (a fat norm tail means the corpus
      // mixes normalized and raw vectors — dot-product shortcuts and
      // PQ codebooks both break). Norms are 6dp VecDot+sqrt values
      // (in-order fold mirrored by the oracle's list fold), deciles
      // exact order statistics; ties by vec_id.
      (s, dir) => {
        // pinned: the count and the distributed ranking's three input
        // evaluations read the norm frame (the qq1 shape — no
        // single-partition window)
        val n = graft.Caches.trackedPersist(t(s, dir, "embeddings")
            .select(col("vec_id"),
              round(sqrt(S.dot(col("embedding").cast("array<double>"),
                col("embedding").cast("array<double>"))), 6)
                .cast("decimal(12,6)").as("nm")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nn = n.agg(count(lit(1)).as("_n"))
        val ranked = graft.ops.RankOps.withGlobalRank(n,
            Seq(col("nm"), col("vec_id")), "_rn")
          .crossJoin(broadcast(nn))
        ranked.join(broadcast(s.range(1, 10)
            .select(col("id").cast("int").as("decile"))),
            col("_rn") === expr("(decile * _n + 9) div 10"))
          .select(col("decile"), col("nm").cast("double").as("l2_norm"))
          .orderBy("decile")
      },
      Some("""WITH n AS (
             |  SELECT vec_id,
             |    CAST(round(sqrt(list_aggregate(list_transform(
             |      CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6)
             |      AS DECIMAL(12,6)) AS nm
             |  FROM embeddings),
             |rk AS (
             |  SELECT vec_id, nm,
             |    row_number() OVER (ORDER BY nm, vec_id) AS rn,
             |    count(*) OVER () AS cnt
             |  FROM n),
             |d AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS decile)
             |SELECT d.decile, CAST(rk.nm AS DOUBLE) AS l2_norm
             |FROM rk JOIN d ON rk.rn = (d.decile * rk.cnt + 9) // 10
             |ORDER BY decile""".stripMargin)),

    QueryDef("e32_behavior_lift",
      // behavior co-occurrence lift at the USER level: for each
      // directed event-type pair, P(user does B | does A)/P(does B) —
      // a34's market-basket algebra on the behavioral axis ("search
      // users are 2× likelier to purchase"). Fan-out bounded by the
      // TYPE vocabulary per user, never by activity volume; exact
      // counts, two divisions.
      (s, dir) => {
        val ut = graft.Caches.trackedPersist(events(s, dir)
          .select(col("user_id"), col("event_type")).distinct(),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nU = ut.select("user_id").distinct().agg(count(lit(1)).as("_N"))
        val tc = ut.groupBy(col("event_type")).agg(count(lit(1)).as("_nt"))
        val pairs = ut.as("a").join(ut.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") =!= col("b.event_type"))
          .groupBy(col("a.event_type").as("ante"),
            col("b.event_type").as("cons"))
          .agg(count(lit(1)).as("n_both"))
        pairs
          .join(broadcast(tc.select(col("event_type").as("ante"),
            col("_nt").as("_na"))), "ante")
          .join(broadcast(tc.select(col("event_type").as("cons"),
            col("_nt").as("_nb"))), "cons")
          .crossJoin(broadcast(nU))
          .select(col("ante"), col("cons"), col("n_both"),
            round(col("n_both").cast("double") / col("_na").cast("double"), 6)
              .as("confidence"),
            round((col("n_both") * col("_N")).cast("double") /
              (col("_na") * col("_nb")).cast("double"), 6).as("lift"))
          .orderBy("ante", "cons")
      },
      Some("""WITH ut AS (
             |  SELECT DISTINCT user_id, event_type FROM events),
             |nu AS (SELECT count(DISTINCT user_id) AS n FROM ut),
             |tc AS (SELECT event_type, count(*) AS nt FROM ut GROUP BY 1),
             |p AS (
             |  SELECT a.event_type AS ante, b.event_type AS cons,
             |         count(*) AS n_both
             |  FROM ut a JOIN ut b ON a.user_id = b.user_id
             |    AND a.event_type <> b.event_type
             |  GROUP BY 1, 2)
             |SELECT p.ante, p.cons, p.n_both,
             |  round(CAST(p.n_both AS DOUBLE) / CAST(ta.nt AS DOUBLE), 6)
             |    AS confidence,
             |  round(CAST(p.n_both * nu.n AS DOUBLE)
             |    / CAST(ta.nt * tb.nt AS DOUBLE), 6) AS lift
             |FROM p JOIN tc ta ON p.ante = ta.event_type
             |       JOIN tc tb ON p.cons = tb.event_type
             |       CROSS JOIN nu
             |ORDER BY ante, cons""".stripMargin)),

    QueryDef("t29_source_style_jsd",
      // per-source style fingerprint: Jensen–Shannon divergence of the
      // source's char-TRIGRAM distribution against the whole corpus —
      // the encoding/style outlier-feed detector (a feed of mojibake or
      // another language juts out before any tokenizer runs). The mix2
      // determinism contract: Laplace-smoothed over the corpus trigram
      // vocabulary, 6dp per-term contributions summed in exact decimal.
      // Vocabulary is trigram-cardinality (bounded by charset³), never
      // corpus-sized.
      (s, dir) => {
        val tri = graft.Caches.trackedPersist(docs(s, dir)
          .filter(col("text").isNotNull)
          .select(col("source"),
            explode(expr("transform(sequence(1, greatest(length(text) - 2, 0)), " +
              "i -> substring(text, i, 3))")).as("g")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val corpus = tri.groupBy("g").agg(count(lit(1)).as("_cq"))
        val srcTot = tri.groupBy("source").agg(count(lit(1)).as("_ts"))
        val corpTot = tri.agg(count(lit(1)).as("_tc"),
          countDistinct(col("g")).as("_v"))
        val cells = tri.groupBy("source", "g").agg(count(lit(1)).as("_cp"))
        // every source scores over the FULL vocabulary (zero cells
        // still carry smoothed mass): sources × vocab grid
        val grid = srcTot.crossJoin(corpus)
          .join(cells, Seq("source", "g"), "left")
          .withColumn("_cp", coalesce(col("_cp"), lit(0L)))
          .crossJoin(broadcast(corpTot))
        val p = (col("_cp").cast("double") + 1.0) /
          (col("_ts") + col("_v")).cast("double")
        val q = (col("_cq").cast("double") + 1.0) /
          (col("_tc") + col("_v")).cast("double")
        val m = (p + q) / 2.0
        val term = round((p * log(p / m) + q * log(q / m)) / 2.0, 6)
          .cast("decimal(20,6)")
        grid.groupBy("source")
          .agg(sum(col("_cp")).as("n_trigrams"),
            sum(term).cast("double").as("jsd_to_corpus"))
          .orderBy("source")
      },
      Some("""WITH tri AS (
             |  SELECT source,
             |    unnest(list_transform(generate_series(1,
             |      greatest(length(text) - 2, 0)), i -> text[i:i+2])) AS g
             |  FROM documents WHERE text IS NOT NULL),
             |cq AS (SELECT g, count(*) AS cq FROM tri GROUP BY 1),
             |ts AS (SELECT source, count(*) AS tsn FROM tri GROUP BY 1),
             |tc AS (SELECT count(*) AS tcn, count(DISTINCT g) AS v FROM tri),
             |cp AS (SELECT source, g, count(*) AS cp FROM tri GROUP BY 1, 2),
             |grid AS (
             |  SELECT ts.source, cq.g, ts.tsn, cq.cq,
             |         COALESCE(cp.cp, 0) AS cp
             |  FROM ts CROSS JOIN cq
             |  LEFT JOIN cp ON cp.source = ts.source AND cp.g = cq.g),
             |t AS (
             |  SELECT source, cp,
             |    CAST(round((p * ln(p / mm) + q * ln(q / mm)) / 2.0, 6)
             |      AS DECIMAL(20,6)) AS term
             |  FROM (
             |    SELECT grid.source, grid.cp,
             |      (CAST(grid.cp AS DOUBLE) + 1.0)
             |        / CAST(grid.tsn + tc.v AS DOUBLE) AS p,
             |      (CAST(grid.cq AS DOUBLE) + 1.0)
             |        / CAST(tc.tcn + tc.v AS DOUBLE) AS q,
             |      ((CAST(grid.cp AS DOUBLE) + 1.0)
             |        / CAST(grid.tsn + tc.v AS DOUBLE)
             |       + (CAST(grid.cq AS DOUBLE) + 1.0)
             |        / CAST(tc.tcn + tc.v AS DOUBLE)) / 2.0 AS mm
             |    FROM grid CROSS JOIN tc))
             |SELECT source, CAST(sum(cp) AS BIGINT) AS n_trigrams,
             |  CAST(SUM(term) AS DOUBLE) AS jsd_to_corpus
             |FROM t GROUP BY 1 ORDER BY source""".stripMargin)),

    QueryDef("d37_vocab_overlap",
      // source-pair vocabulary Jaccard: |V_a ∩ V_b| / |V_a ∪ V_b| over
      // distinct lowercase tokens — the set-based companion to t29's
      // distributional JSD (two feeds can share vocabulary yet differ
      // in style, and vice versa). Intersections come from ONE
      // token-keyed self-join of the (source, token) distinct frame;
      // union by inclusion–exclusion — all exact integers, one
      // division.
      (s, dir) => {
        val v = graft.Caches.trackedPersist(docs(s, dir)
          .filter(col("text").isNotNull)
          .select(col("source"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
          .filter(length(col("tok")) > 0).distinct(),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sizes = v.groupBy("source").agg(count(lit(1)).as("_v"))
        val inter = v.as("a").join(v.as("b"),
            col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("n_shared"))
        inter
          .join(broadcast(sizes.select(col("source").as("src_a"),
            col("_v").as("_va"))), "src_a")
          .join(broadcast(sizes.select(col("source").as("src_b"),
            col("_v").as("_vb"))), "src_b")
          .select(col("src_a"), col("src_b"), col("_va").as("vocab_a"),
            col("_vb").as("vocab_b"), col("n_shared"),
            round(col("n_shared").cast("double") /
              (col("_va") + col("_vb") - col("n_shared")).cast("double"), 6)
              .as("vocab_jaccard"))
          .orderBy("src_a", "src_b")
      },
      Some("""WITH v AS (
             |  SELECT DISTINCT source, tok FROM (
             |    SELECT source,
             |      unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |    FROM documents WHERE text IS NOT NULL)
             |  WHERE length(tok) > 0),
             |sz AS (SELECT source, count(*) AS vs FROM v GROUP BY 1),
             |i AS (
             |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
             |  FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT i.src_a, i.src_b,
             |  CAST(sa.vs AS BIGINT) AS vocab_a, CAST(sb.vs AS BIGINT) AS vocab_b,
             |  i.n_shared,
             |  round(CAST(i.n_shared AS DOUBLE)
             |    / CAST(sa.vs + sb.vs - i.n_shared AS DOUBLE), 6)
             |    AS vocab_jaccard
             |FROM i JOIN sz sa ON i.src_a = sa.source
             |       JOIN sz sb ON i.src_b = sb.source
             |ORDER BY src_a, src_b""".stripMargin)),

    QueryDef("w58_parkinson",
      // Parkinson range volatility per ticker over the daily OHLC bars:
      // σ²_P = mean(ln(h/l)²)/(4·ln2) — 5-8× more efficient than
      // close-to-close vol when highs/lows are real (Parkinson 1980),
      // the range-based companion to w5's vol20 and w24's ATR.
      // Per-bar ln(h/l) rounds 6dp, squares and sums in exact decimal
      // (the t20 contract); the final scale and sqrt are a mirrored
      // two-op tail. Degenerate h = l bars contribute 0 exactly.
      (s, dir) => {
        val b = Q.ohlcBars(t(s, dir, "lineitem"))
          .select(col("ticker"),
            round(log(col("high") / col("low")), 6)
              .cast("decimal(16,6)").as("_hl"))
        b.groupBy("ticker").agg(
            count(lit(1)).as("n_days"),
            (sum(col("_hl") * col("_hl")).cast("double") /
              (count(lit(1)).cast("double") * lit(4.0) * log(lit(2.0))))
              .as("_v"))
          .select(col("ticker"), col("n_days"),
            round(sqrt(col("_v")), 6).as("parkinson_vol"))
          .orderBy("ticker")
      },
      Some(Q.ohlcSql +
        """, x AS (
          |  SELECT ticker,
          |    CAST(round(ln(high / low), 6) AS DECIMAL(16,6)) AS hl
          |  FROM bars),
          |a AS (
          |  SELECT ticker, count(*) AS n_days,
          |    CAST(SUM(hl * hl) AS DOUBLE)
          |      / (CAST(count(*) AS DOUBLE) * 4.0 * ln(2.0)) AS v
          |  FROM x GROUP BY 1)
          |SELECT ticker, n_days, round(sqrt(v), 6) AS parkinson_vol
          |FROM a ORDER BY ticker""".stripMargin)),

    QueryDef("w59_garman_klass",
      // Garman–Klass OHLC volatility per ticker: σ² = mean(½·ln(h/l)²
      // − (2ln2−1)·ln(c/o)²) — the drift-robust range estimator beside
      // w58's Parkinson (GK 1980). Both per-bar lns round 6dp; each
      // bar's term is a fixed IEEE combination rounded 6dp and summed
      // in exact decimal; mean + sqrt are the mirrored tail. Negative
      // variance estimates (possible for GK on pathological bars) null
      // the vol rather than NaN-ing it.
      (s, dir) => {
        val b = Q.ohlcBars(t(s, dir, "lineitem"))
          .select(col("ticker"),
            round(log(col("high") / col("low")), 6).as("_hl"),
            round(log(col("close") / col("open")), 6).as("_co"))
          .withColumn("_term", round(lit(0.5) * col("_hl") * col("_hl") -
            (lit(2.0) * log(lit(2.0)) - 1.0) * col("_co") * col("_co"), 6)
            .cast("decimal(16,6)"))
        b.groupBy("ticker").agg(
            count(lit(1)).as("n_days"),
            (sum(col("_term")).cast("double") / count(lit(1)).cast("double"))
              .as("_v"))
          .select(col("ticker"), col("n_days"),
            when(col("_v") > 0, round(sqrt(col("_v")), 6)).as("gk_vol"))
          .orderBy("ticker")
      },
      Some(Q.ohlcSql +
        """, x AS (
          |  SELECT ticker,
          |    CAST(round(0.5 * round(ln(high / low), 6) * round(ln(high / low), 6)
          |      - (2.0 * ln(2.0) - 1.0) * round(ln(close / open), 6)
          |        * round(ln(close / open), 6), 6) AS DECIMAL(16,6)) AS term
          |  FROM bars),
          |a AS (
          |  SELECT ticker, count(*) AS n_days,
          |    CAST(SUM(term) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS v
          |  FROM x GROUP BY 1)
          |SELECT ticker, n_days,
          |  CASE WHEN v > 0 THEN round(sqrt(v), 6) END AS gk_vol
          |FROM a ORDER BY ticker""".stripMargin)),

    QueryDef("a51_discount_mix",
      // revenue and volume mix by discount band — the pricing-review
      // table behind a44's elasticity slope ("how much revenue rides
      // each discount tier"). Band edges are exact DECIMAL comparisons
      // of the raw 4dp discount (no float banding); revenue exact
      // decimals; one division per share.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .withColumn("_d", col("l_discount").cast("decimal(6,4)"))
          .withColumn("band",
            when(col("_d") <= 0.02, "a_0_2")
              .when(col("_d") <= 0.05, "b_2_5")
              .when(col("_d") <= 0.08, "c_5_8").otherwise("d_8_plus"))
        val a = li.groupBy("band").agg(
          count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("long")).as("qty"),
          sum(col("l_extendedprice").cast("decimal(12,4)")).as("_r"))
        a.withColumn("_tr", sum(col("_r")).over(Window.partitionBy(lit(1))))
          .select(col("band"), col("n_lines"), col("qty"),
            money2(col("_r")).as("revenue"),
            round(col("_r").cast("double") / col("_tr").cast("double"), 6)
              .as("revenue_share"))
          .orderBy("band")
      },
      Some("""WITH li AS (
             |  SELECT *,
             |    CASE WHEN CAST(l_discount AS DECIMAL(6,4)) <= 0.02 THEN 'a_0_2'
             |         WHEN CAST(l_discount AS DECIMAL(6,4)) <= 0.05 THEN 'b_2_5'
             |         WHEN CAST(l_discount AS DECIMAL(6,4)) <= 0.08 THEN 'c_5_8'
             |         ELSE 'd_8_plus' END AS band
             |  FROM lineitem),
             |a AS (
             |  SELECT band, count(*) AS n_lines,
             |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             |    SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS r
             |  FROM li GROUP BY 1)
             |SELECT band, n_lines, qty,
             |  CAST(ROUND(r, 2) AS DOUBLE) AS revenue,
             |  round(CAST(r AS DOUBLE) / CAST(sum(r) OVER () AS DOUBLE), 6)
             |    AS revenue_share
             |FROM a ORDER BY band""".stripMargin)),

    QueryDef("seg2_segment_census",
      // named CRM segments over seg1's RFM quintiles (1 = best on each
      // axis): champions (r≤2 ∧ f≤2 ∧ m≤2), loyal (f≤2), big_spender
      // (m≤2), at_risk (r≥4 ∧ f≤2 — used to buy often, gone quiet),
      // hibernating (r≥4), everyone else 'regular' — FIRST matching
      // rule wins, so the census is a deterministic partition of the
      // customer base. All-integer; one division per share.
      (s, dir) => {
        // quintiles via [[rfmQuintiles]] — same exact distributed
        // ranking seg1 uses (no single-partition ntile windows)
        val q = rfmQuintiles(s, dir)
        val seg = q.withColumn("segment",
          when(col("r_q") <= 2 && col("f_q") <= 2 && col("m_q") <= 2, "champions")
            .when(col("r_q") >= 4 && col("f_q") <= 2, "at_risk")
            .when(col("r_q") >= 4, "hibernating")
            .when(col("f_q") <= 2, "loyal")
            .when(col("m_q") <= 2, "big_spender")
            .otherwise("regular"))
        // the population total rides along as _n (constant per row —
        // max() recovers it in the same census aggregation; was a
        // whole-frame window over the census)
        seg.groupBy("segment")
          .agg(count(lit(1)).as("n_customers"),
            money2(sum(col("_m"))).as("revenue"),
            max(col("_n")).as("_t"))
          .select(col("segment"), col("n_customers"),
            round(col("n_customers").cast("double") / col("_t").cast("double"), 6)
              .as("customer_share"),
            col("revenue"))
          .orderBy("segment")
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS od,
             |         CAST(o_totalprice AS DECIMAL(14,2)) AS tp
             |  FROM orders),
             |r AS (
             |  SELECT cust, max(od) AS last_od, count(*) AS f, sum(tp) AS m
             |  FROM o GROUP BY 1),
             |r2 AS (
             |  SELECT cust, f, m,
             |    date_diff('day', last_od, max(last_od) OVER ()) AS rd
             |  FROM r),
             |q AS (
             |  SELECT cust, m,
             |    ntile(5) OVER (ORDER BY rd, cust) AS rq,
             |    ntile(5) OVER (ORDER BY f DESC, cust) AS fq,
             |    ntile(5) OVER (ORDER BY m DESC, cust) AS mq
             |  FROM r2),
             |seg AS (
             |  SELECT cust, m,
             |    CASE WHEN rq <= 2 AND fq <= 2 AND mq <= 2 THEN 'champions'
             |         WHEN rq >= 4 AND fq <= 2 THEN 'at_risk'
             |         WHEN rq >= 4 THEN 'hibernating'
             |         WHEN fq <= 2 THEN 'loyal'
             |         WHEN mq <= 2 THEN 'big_spender'
             |         ELSE 'regular' END AS segment
             |  FROM q),
             |a AS (
             |  SELECT segment, count(*) AS n_customers, sum(m) AS mr
             |  FROM seg GROUP BY 1)
             |SELECT segment, n_customers,
             |  round(CAST(n_customers AS DOUBLE)
             |    / CAST(sum(n_customers) OVER () AS DOUBLE), 6)
             |    AS customer_share,
             |  CAST(ROUND(mr, 2) AS DOUBLE) AS revenue
             |FROM a ORDER BY segment""".stripMargin))
  )

  val byName: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  val oracles: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
