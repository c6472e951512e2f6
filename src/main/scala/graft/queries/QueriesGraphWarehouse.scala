package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ClassifierFunctions => Cls, DedupFunctions => D, RelevanceFunctions => R, SamplingFunctions => Sam, SimilarityFunctions => S, TextFunctions => T, UrlFunctions => U}
import graft.ops.{AsOfJoinOps, CrossValidationOps, EventAnalyticsOps, FeatureOps, GraphOps, HistoryOps, MacroOps, RangeJoinOps, SkewOps, ValidationOps}


/** Registry queries: graph algorithms, joins, warehouse ops (SCD/CDC/IVM/z-order). Split from the former monolithic
  * Queries.scala (r12) — definitions unchanged.
  */
private[queries] object QueriesGraphWarehouse {
  import Q.{money2, prices, pricesSql, revenueDec, t}
  import QHelpers._

  val defs: Seq[QueryDef] = Seq(

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

QueryDef("g15_harmonic_sampled",
      // sampled harmonic centrality ([[graft.ops.GraphOps
      // .harmonicCentralitySampled]]; Eppstein & Wang SODA 2001, Boldi
      // & Vigna 2014): every node's mean inverse distance to a k-seed
      // sample via ONE source-labeled BFS — the scalable estimator for
      // "which catalog nodes sit central in the co-purchase graph".
      // All-integer transport (1/d carried in SIXTHS) until the single
      // final division; the oracle unrolls all three labeled frontiers.
      // Edge set takes the g3/g10 first-two-years cut (the convention
      // for frontier-expansion graph ops: round-3 cost is Σ_frontier
      // deg, and on the FULL small-world co-purchase graph a 200-seed
      // labeled frontier at hop 3 produces ~400M candidate rows — the
      // cut + the 1-in-499 sample keep the expansion
      // |frontier|·avg-deg-bounded, which is also the Eppstein–Wang
      // error knob).
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        val seeds = li.filter(col("pk") % 499 === 0)
          .select(col("pk").as("seed"))
        GraphOps.harmonicCentralitySampled(pairs, "src", "dst",
          seeds, "seed", rounds = 3)
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey, l_partkey FROM lineitem
             |  WHERE l_shipdate < TIMESTAMP '1997-01-01'),
             |e AS MATERIALIZED (
             |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |  FROM li a JOIN li b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |d AS MATERIALIZED (
             |  SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
             |sd AS (SELECT DISTINCT l_partkey AS s FROM li
             |       WHERE l_partkey % 499 = 0),
             |k0 AS MATERIALIZED (SELECT s, s AS node, 0 AS dist FROM sd),
             |f1 AS MATERIALIZED (
             |  SELECT DISTINCT f.s, d.v AS node FROM k0 f JOIN d ON d.u = f.node),
             |n1 AS MATERIALIZED (
             |  SELECT f.s, f.node, 1 AS dist FROM f1 f
             |  LEFT JOIN k0 k ON k.s = f.s AND k.node = f.node
             |  WHERE k.node IS NULL),
             |k1 AS MATERIALIZED (SELECT * FROM k0 UNION ALL SELECT * FROM n1),
             |f2 AS MATERIALIZED (
             |  SELECT DISTINCT f.s, d.v AS node FROM n1 f JOIN d ON d.u = f.node),
             |n2 AS MATERIALIZED (
             |  SELECT f.s, f.node, 2 AS dist FROM f2 f
             |  LEFT JOIN k1 k ON k.s = f.s AND k.node = f.node
             |  WHERE k.node IS NULL),
             |k2 AS MATERIALIZED (SELECT * FROM k1 UNION ALL SELECT * FROM n2),
             |f3 AS MATERIALIZED (
             |  SELECT DISTINCT f.s, d.v AS node FROM n2 f JOIN d ON d.u = f.node),
             |n3 AS MATERIALIZED (
             |  SELECT f.s, f.node, 3 AS dist FROM f3 f
             |  LEFT JOIN k2 k ON k.s = f.s AND k.node = f.node
             |  WHERE k.node IS NULL),
             |k3 AS (SELECT * FROM k2 UNION ALL SELECT * FROM n3)
             |SELECT node, count(*) AS n_sources,
             |  round(CAST(sum(CAST(6 / dist AS BIGINT)) AS DOUBLE) / 6.0
             |    / (SELECT CAST(count(*) AS DOUBLE) FROM sd), 6) AS harmonic
             |FROM k3 WHERE dist >= 1 GROUP BY node ORDER BY node""".stripMargin)),

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

    QueryDef("j10_bloom_semijoin",
      // semi-join reduction via the native [[graft.functions
      // .BloomMightContain]] probe: per-supplier revenue for one
      // nation's suppliers, with the FACT SCAN pre-filtered by a
      // driver-built Bloom over the (bounded) dimension keys before
      // the exact broadcast join. The Bloom is a codegen'd row-local
      // predicate riding the scan — at 100 TB it drops ~24/25 of the
      // fact rows before ANY join machinery (the manual form of
      // Spark's runtime row-level filtering, here explicit and
      // engine-controlled). No false negatives ⇒ the exact join makes
      // the result IDENTICAL to the plain join for any seed/fpp — the
      // oracle is the plain SQL. QueriesSpec pins the plan shape
      // (Bloom filter above the lineitem scan + broadcast join).
      (s, dir) => {
        import org.apache.spark.util.sketch.BloomFilter
        val dim = t(s, dir, "supplier")
          .filter(col("s_nationkey") === 7)
          .select(col("s_suppkey").as("supp"))
        // bounded collect: one nation's supplier keys (catalog-sized)
        val keys = dim.collect().map(_.getLong(0))
        val bloom = BloomFilter.create(math.max(keys.length.toLong, 1L), 0.01)
        keys.foreach(k => bloom.putString(k.toString))
        val li = t(s, dir, "lineitem")
          .filter(graft.functions.BloomMightContain(
            col("l_suppkey").cast("string"), bloom))
          .select(col("l_suppkey").as("supp"),
            revenueDec.as("_r"))
        li.join(broadcast(dim), "supp")
          .groupBy("supp")
          .agg(count(lit(1)).as("n_lines"), money2(sum(col("_r"))).as("revenue"))
          .orderBy("supp")
      },
      Some("""SELECT l.l_suppkey AS supp, count(*) AS n_lines,
             |  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
             |    * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
             |    AS revenue
             |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |WHERE s.s_nationkey = 7
             |GROUP BY 1 ORDER BY supp""".stripMargin)),

    QueryDef("g14_link_prediction",
      // common-neighbor link prediction ([[GraphOps.linkPrediction]],
      // Liben-Nowell & Kleinberg CIKM 2003): top-20 NON-adjacent part
      // pairs by shared co-purchase neighbors over g3's bounded
      // first-two-years graph — g7 scores ties that exist, this
      // predicts the ones that don't yet ("bought with the same
      // things, never together"). Wedge-join candidates anti-joined
      // against the edge list, degree joins, TakeOrdered(20); the
      // oracle replays candidates, the anti-join, both degrees, and
      // the (cn DESC, u, v) rank.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        GraphOps.linkPrediction(pairs, "src", "dst", k = 20)
          .orderBy(col("cn").desc, col("u"), col("v"))
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
             |            WHERE l_shipdate < TIMESTAMP '1997-01-01'),
             |e AS MATERIALIZED (
             |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |  FROM li a JOIN li b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
             |deg AS (SELECT a AS node, count(*) AS deg FROM sym GROUP BY 1),
             |cand AS MATERIALIZED (
             |  SELECT n1.a AS u, n2.a AS v, count(*) AS cn
             |  FROM sym n1 JOIN sym n2 ON n1.b = n2.b AND n1.a < n2.a
             |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = n1.a AND e.v = n2.a)
             |  GROUP BY 1, 2)
             |SELECT u, v, cn, du.deg AS deg_u, dv.deg AS deg_v,
             |  round(CAST(cn AS DOUBLE) / (du.deg + dv.deg - cn), 6) AS jaccard
             |FROM cand JOIN deg du ON cand.u = du.node
             |          JOIN deg dv ON cand.v = dv.node
             |ORDER BY cn DESC, u, v LIMIT 20""".stripMargin)),

    QueryDef("g13_rich_club",
      // rich-club coefficient φ(k) of the first-two-years co-purchase
      // graph: among nodes of degree > k, the realized edge density —
      // "do the hubs preferentially trade with each other" (φ rising
      // with k ⇒ a hub oligarchy; the skew-defense planning signal
      // one level above g11's degree tail). All-integer counts
      // (φ = 2E/(N(N−1)) is the one division, 6dp); the k-sweep reads
      // the pinned degree/edge frames, never rescans lineitem.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val e = graft.Caches.trackedPersist(
          li.as("a").join(li.as("b"),
              col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
            .select(col("a.pk").as("u"), col("b.pk").as("v"))
            .distinct(),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val deg = graft.Caches.trackedPersist(
          e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
            .groupBy("node").agg(count(lit(1)).as("_d")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ks = s.range(0, 4).select(
          element_at(array(lit(2), lit(4), lit(8), lit(16)),
            (col("id") + 1).cast("int")).as("k"))
        val nodes = deg.crossJoin(broadcast(ks))
          .filter(col("_d") > col("k"))
          .groupBy("k").agg(count(lit(1)).as("n_nodes"))
        val within = e
          .join(deg.select(col("node").as("u"), col("_d").as("_du")), "u")
          .join(deg.select(col("node").as("v"), col("_d").as("_dv")), "v")
          .crossJoin(broadcast(ks))
          .filter(col("_du") > col("k") && col("_dv") > col("k"))
          .groupBy("k").agg(count(lit(1)).as("n_edges_within"))
        nodes.join(within, Seq("k"), "left")
          .withColumn("n_edges_within",
            coalesce(col("n_edges_within"), lit(0L)))
          .select(col("k"), col("n_nodes"), col("n_edges_within"),
            when(col("n_nodes") >= 2,
              round((col("n_edges_within") * 2).cast("double") /
                (col("n_nodes") * (col("n_nodes") - 1)).cast("double"), 6))
              .as("phi"))
          .orderBy("k")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
             |            WHERE l_shipdate < TIMESTAMP '1997-01-01'),
             |e AS (
             |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |  FROM li a JOIN li b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |deg AS (
             |  SELECT node, count(*) AS d FROM (
             |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
             |  GROUP BY 1),
             |ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
             |nn AS (
             |  SELECT ks.k, count(*) AS n_nodes
             |  FROM deg CROSS JOIN ks WHERE deg.d > ks.k GROUP BY 1),
             |wi AS (
             |  SELECT ks.k, count(*) AS n_edges_within
             |  FROM e JOIN deg du ON e.u = du.node
             |         JOIN deg dv ON e.v = dv.node
             |         CROSS JOIN ks
             |  WHERE du.d > ks.k AND dv.d > ks.k GROUP BY 1)
             |SELECT nn.k, nn.n_nodes,
             |  CAST(COALESCE(wi.n_edges_within, 0) AS BIGINT) AS n_edges_within,
             |  CASE WHEN nn.n_nodes >= 2 THEN
             |    round(CAST(COALESCE(wi.n_edges_within, 0) * 2 AS DOUBLE)
             |      / CAST(nn.n_nodes * (nn.n_nodes - 1) AS DOUBLE), 6) END
             |    AS phi
             |FROM nn LEFT JOIN wi ON nn.k = wi.k ORDER BY nn.k""".stripMargin)),

    QueryDef("g12_modularity",
      // Newman modularity of g2's LPA partition over the co-purchase
      // graph: Q = Σ_c [e_c/m − (d_c/2m)²] — "did label propagation
      // find real structure or noise" (Q ≈ 0 ⇒ no better than random;
      // the quality gate before trusting communities downstream).
      // ALL-INTEGER until the final division: Q = (4m·E_in − Σ_c d_c²)
      // / (4m²) with undirected edge count m, within-community edge
      // count E_in, and per-community degree sums — the unrolled LPA
      // oracle replays the labels exactly, so both engines derive
      // identical integers. One row out.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        // ONE canonical u<v edge set feeds everything — LPA
        // symmetrizes its input internally, so passing the undirected
        // edges yields the identical partition while saving the
        // second 2M-pair self-join. Pinned: LPA's init, the
        // within-community count, degree sums, and the edge count all
        // read it.
        val e = graft.Caches.trackedPersist(
          li.as("a").join(li.as("b"),
              col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
            .select(col("a.pk").as("u"), col("b.pk").as("v"))
            .distinct(),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val comm = graft.Caches.trackedPersist(
          GraphOps.labelPropagation(e, "u", "v", iterations = 4),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val m = e.agg(count(lit(1)).as("_m"))
        val ein = e
          .join(comm.select(col("node").as("u"), col("community").as("_ca")), "u")
          .join(comm.select(col("node").as("v"), col("community").as("_cb")), "v")
          .filter(col("_ca") === col("_cb"))
          .agg(count(lit(1)).as("_ein"))
        val deg = e.select(col("u").as("node"))
          .unionAll(e.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("_d"))
        val sd2 = deg.join(comm, "node")
          .groupBy("community").agg(sum(col("_d")).as("_dc"))
          .agg(count(lit(1)).as("n_communities"),
            sum(col("_dc") * col("_dc")).as("_sd2"))
        sd2.crossJoin(broadcast(m)).crossJoin(broadcast(ein))
          .select(col("n_communities"), col("_m").as("n_edges"),
            round((lit(4) * col("_m") * col("_ein") - col("_sd2"))
              .cast("double") /
              (lit(4) * col("_m") * col("_m")).cast("double"), 6)
              .as("modularity"))
      },
      Some(lpaOracle(4,
        """, e AS MATERIALIZED (
          |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
          |mm AS (SELECT count(*) AS m FROM e),
          |ein AS (
          |  SELECT count(*) AS ei
          |  FROM e JOIN l4 a ON e.u = a.node JOIN l4 b ON e.v = b.node
          |  WHERE a.community = b.community),
          |deg AS (
          |  SELECT node, count(*) AS d FROM (
          |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
          |  GROUP BY 1),
          |dc AS (
          |  SELECT l.community, CAST(sum(deg.d) AS HUGEINT) AS dsum
          |  FROM deg JOIN l4 l ON deg.node = l.node GROUP BY 1),
          |s2 AS (SELECT count(*) AS ncomm,
          |              CAST(sum(dsum * dsum) AS HUGEINT) AS sd2 FROM dc)
          |SELECT CAST(s2.ncomm AS BIGINT) AS n_communities,
          |  CAST(mm.m AS BIGINT) AS n_edges,
          |  round(CAST(4 * CAST(mm.m AS HUGEINT) * ein.ei - s2.sd2 AS DOUBLE)
          |    / CAST(4 * CAST(mm.m AS HUGEINT) * mm.m AS DOUBLE), 6)
          |    AS modularity
          |FROM s2 CROSS JOIN mm CROSS JOIN ein""".stripMargin)))
  )
}
