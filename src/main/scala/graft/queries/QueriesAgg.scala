package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ClassifierFunctions => Cls, DedupFunctions => D, RelevanceFunctions => R, SamplingFunctions => Sam, SimilarityFunctions => S, TextFunctions => T, UrlFunctions => U}
import graft.ops.{AsOfJoinOps, CrossValidationOps, EventAnalyticsOps, FeatureOps, GraphOps, HistoryOps, MacroOps, RangeJoinOps, SkewOps, ValidationOps}


/** Registry queries: aggregations, percentiles, risk/stat tables, RFM segmentation. Split from the former monolithic
  * Queries.scala (r12) — definitions unchanged.
  */
private[queries] object QueriesAgg {
  import Q.{money2, prices, pricesSql, revenueDec, t}
  import QHelpers._

  val defs: Seq[QueryDef] = Seq(

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
             |FROM a ORDER BY segment""".stripMargin)),

    QueryDef("a55_theil_decomposition",
      // Theil-T inequality decomposition of supplier revenue BY NATION:
      // T_total = T_between + Σ_g s_g·T_within_g — the additive
      // within/between split Gini (a24) and HHI (a45) structurally
      // can't give ("is concentration a few dominant nations, or
      // dominant suppliers inside each nation?"). Shares are exact-
      // decimal ratios evaluated identically in both engines; each ln
      // rounds 6dp (the cls1 libm convention); every term then casts
      // to exact decimal so the sums are order-free (the fe3 IV
      // contract). Per-nation rows carry the global between/total
      // terms from a one-row broadcast aggregate.
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .groupBy(col("l_suppkey").as("supp"))
          .agg(sum(col("l_extendedprice").cast("decimal(12,4)")).as("_x"))
        val sup = t(s, dir, "supplier")
          .select(col("s_suppkey").as("supp"), col("s_nationkey").as("nation"))
        // pinned: nation totals AND within-nation terms read it
        val base = graft.Caches.trackedPersist(rev.join(sup, "supp"),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val g = base.groupBy("nation")
          .agg(count(lit(1)).as("n_suppliers"), sum(col("_x")).as("_xg"))
        val tot = g.agg(sum(col("_xg")).as("_xt"),
          sum(col("n_suppliers")).as("_nt"))
        val gt = g.crossJoin(broadcast(tot))
        val within = base
          .join(gt.select(col("nation"), col("_xg"), col("n_suppliers")
            .as("_ng")), "nation")
          .withColumn("_lnr", round(log(col("_x").cast("double") *
            col("_ng") / col("_xg").cast("double")), 6))
          .withColumn("_term", ((col("_x").cast("double") /
            col("_xg").cast("double")) * col("_lnr")).cast("decimal(20,10)"))
          .groupBy("nation").agg(sum(col("_term")).as("_tw"))
        val pern = gt.join(within, "nation")
          .withColumn("_share",
            col("_xg").cast("double") / col("_xt").cast("double"))
          .withColumn("_lnb", round(log(col("_xg").cast("double") *
            col("_nt") / (col("_xt").cast("double") * col("n_suppliers"))), 6))
        val glob = pern.agg(
          sum((col("_share") * col("_lnb")).cast("decimal(20,10)")).as("_tb"),
          sum((col("_share") * col("_tw").cast("double"))
            .cast("decimal(20,10)")).as("_twmix"))
        pern.crossJoin(broadcast(glob))
          .select(col("nation"), col("n_suppliers"),
            round(col("_share"), 6).as("revenue_share"),
            round(col("_tw").cast("double"), 6).as("theil_within"),
            round(col("_tb").cast("double"), 6).as("theil_between"),
            round((col("_tb") + col("_twmix")).cast("double"), 6)
              .as("theil_total"))
          .orderBy("nation")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey AS supp,
             |         SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS x
             |  FROM lineitem GROUP BY 1),
             |base AS (
             |  SELECT rev.supp, rev.x, s.s_nationkey AS nation
             |  FROM rev JOIN supplier s ON rev.supp = s.s_suppkey),
             |g AS (
             |  SELECT nation, count(*) AS n_suppliers, SUM(x) AS xg
             |  FROM base GROUP BY 1),
             |tot AS (SELECT SUM(xg) AS xt, sum(n_suppliers) AS nt FROM g),
             |w AS (
             |  SELECT b.nation,
             |    CAST(sum(CAST((CAST(b.x AS DOUBLE) / CAST(g.xg AS DOUBLE))
             |      * round(ln(CAST(b.x AS DOUBLE) * g.n_suppliers
             |          / CAST(g.xg AS DOUBLE)), 6)
             |      AS DECIMAL(20,10))) AS DECIMAL(20,10)) AS tw
             |  FROM base b JOIN g ON b.nation = g.nation GROUP BY 1),
             |pern AS (
             |  SELECT g.nation, g.n_suppliers,
             |    CAST(g.xg AS DOUBLE) / CAST(tot.xt AS DOUBLE) AS share,
             |    round(ln(CAST(g.xg AS DOUBLE) * tot.nt
             |      / (CAST(tot.xt AS DOUBLE) * g.n_suppliers)), 6) AS lnb,
             |    w.tw
             |  FROM g JOIN w ON g.nation = w.nation CROSS JOIN tot),
             |gl AS (
             |  SELECT CAST(sum(CAST(share * lnb AS DECIMAL(20,10)))
             |           AS DECIMAL(20,10)) AS tb,
             |         CAST(sum(CAST(share * CAST(tw AS DOUBLE)
             |           AS DECIMAL(20,10))) AS DECIMAL(20,10)) AS twmix
             |  FROM pern)
             |SELECT pern.nation, CAST(pern.n_suppliers AS BIGINT) AS n_suppliers,
             |  round(pern.share, 6) AS revenue_share,
             |  round(CAST(pern.tw AS DOUBLE), 6) AS theil_within,
             |  round(CAST(gl.tb AS DOUBLE), 6) AS theil_between,
             |  round(CAST(gl.tb + gl.twmix AS DOUBLE), 6) AS theil_total
             |FROM pern CROSS JOIN gl ORDER BY nation""".stripMargin)),

    QueryDef("a53_poisson_bootstrap",
      // hash-deterministic Poisson bootstrap CI for the mean daily
      // return (the production bootstrap at scale — Chamandy et al.,
      // Google 2012: resample weights are Poisson(1) draws PER ROW,
      // so resamples stream in one pass with no per-resample shuffle
      // of the data). Determinism end-to-end: the uniform draw is the
      // m1b md5-60bit hash of (ticker, date, b), the Poisson inverse
      // CDF is a CASE ladder over EXACT 2⁶⁰-scaled integer thresholds
      // (identical literals both engines — no float CDF), resample
      // means are exact-integer µunit sums with one final division,
      // and the 95% CI bounds are ⌈q·B⌉ order statistics (a35
      // convention) over the B=100 resample means — a bounded
      // per-ticker window. Ticker universe capped to 1-in-20 (the
      // pairs1 demonstration cap): the B× row fan-out is the cost
      // knob, and the operator's point is the per-row weight shape,
      // which is universe-size-independent.
      (s, dir) => {
        val r6 = round(col("ret"), 6).cast("decimal(10,6)")
        val rc = least(greatest(r6, lit(-10).cast("decimal(10,6)")),
          lit(10).cast("decimal(10,6)"))
        // pinned: the full-sample stats and the 100-resample fan both
        // read the clamped µunit frame
        val base = graft.Caches.trackedPersist(
          pricesWithRet(s, dir).filter(col("ret").isNotNull)
            .filter(col("ticker") % 20 === 0)
            .select(col("ticker"), col("date"),
              (rc * lit(1000000)).cast("long").as("_y")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bs = s.range(0, 100).select(col("id").cast("int").as("_b"))
        // P(X <= k), X ~ Poisson(1), as exact floor(cum * 2^60) longs
        val thresholds = Seq(424136118829305329L, 848272237658610659L,
          1060340297073263324L, 1131029650211480879L, 1148701988496035267L,
          1152236456152946145L, 1152825534095764625L, 1152909688087595836L,
          1152920207336574738L)
        val wExpr = thresholds.zipWithIndex
          .foldRight(lit(9L): Column) { case ((t, k), acc) =>
            when(col("_h") < t, lit(k.toLong)).otherwise(acc) }
        val means = base.crossJoin(broadcast(bs))
          .withColumn("_h", D.md5Hash60(concat_ws("#",
            lit("boot"), col("ticker"), col("date"), col("_b"))))
          .withColumn("_w", wExpr)
          .groupBy("ticker", "_b")
          .agg(sum(col("_w") * col("_y")).as("_sy"), sum(col("_w")).as("_sw"))
          .filter(col("_sw") > 0)
          .select(col("ticker"), col("_b"),
            (col("_sy").cast("double") /
              (col("_sw") * 1000000L).cast("double")).as("_mb"))
        val wT = Window.partitionBy("ticker").orderBy(col("_mb"), col("_b"))
        val ranked = means
          .withColumn("_rn", row_number().over(wT))
          .withColumn("_nb", count(lit(1)).over(Window.partitionBy("ticker")))
        val lo = ranked.filter(col("_rn") === expr("(25 * _nb + 999) div 1000"))
          .select(col("ticker"), col("_mb").as("_lo"))
        val hi = ranked.filter(col("_rn") === expr("(975 * _nb + 999) div 1000"))
          .select(col("ticker"), col("_mb").as("_hi"))
        base.groupBy("ticker")
          .agg(count(lit(1)).as("n"),
            (sum(col("_y")).cast("double") /
              (count(lit(1)) * 1000000L).cast("double")).as("_mr"))
          .join(lo, "ticker").join(hi, "ticker")
          .select(col("ticker"), col("n"), round(col("_mr"), 6).as("mean_ret"),
            round(col("_lo"), 6).as("ci_lo"), round(col("_hi"), 6).as("ci_hi"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, x AS (
          |  SELECT ticker, "date",
          |    CAST(least(greatest(CAST(round(ret, 6) AS DECIMAL(10,6)),
          |      CAST(-10 AS DECIMAL(10,6))), CAST(10 AS DECIMAL(10,6)))
          |      * 1000000 AS BIGINT) AS y
          |  FROM r WHERE ret IS NOT NULL AND ticker % 20 = 0),
          |bs AS (SELECT CAST(d AS INTEGER) AS b FROM range(0, 100) t(d)),
          |hw AS (
          |  SELECT ticker, y, b,
          |    CAST(('0x' || substring(md5('boot#' || CAST(ticker AS VARCHAR)
          |      || '#' || CAST("date" AS VARCHAR)
          |      || '#' || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT) AS h
          |  FROM x CROSS JOIN bs),
          |ww AS (
          |  SELECT ticker, y, b,
          |    CASE WHEN h < 424136118829305329 THEN 0
          |         WHEN h < 848272237658610659 THEN 1
          |         WHEN h < 1060340297073263324 THEN 2
          |         WHEN h < 1131029650211480879 THEN 3
          |         WHEN h < 1148701988496035267 THEN 4
          |         WHEN h < 1152236456152946145 THEN 5
          |         WHEN h < 1152825534095764625 THEN 6
          |         WHEN h < 1152909688087595836 THEN 7
          |         WHEN h < 1152920207336574738 THEN 8
          |         ELSE 9 END AS w
          |  FROM hw),
          |mb AS (
          |  SELECT ticker, b,
          |    CAST(sum(w * y) AS DOUBLE)
          |      / CAST(sum(w) * 1000000 AS DOUBLE) AS m
          |  FROM ww GROUP BY 1, 2 HAVING sum(w) > 0),
          |rk AS (
          |  SELECT ticker, b, m,
          |    row_number() OVER (PARTITION BY ticker ORDER BY m, b) AS rn,
          |    count(*) OVER (PARTITION BY ticker) AS nb
          |  FROM mb),
          |lo AS (SELECT ticker, m AS lo FROM rk
          |       WHERE rn = (25 * nb + 999) // 1000),
          |hi AS (SELECT ticker, m AS hi FROM rk
          |       WHERE rn = (975 * nb + 999) // 1000),
          |f AS (
          |  SELECT ticker, count(*) AS n,
          |    CAST(sum(y) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE) AS mr
          |  FROM x GROUP BY 1)
          |SELECT f.ticker, CAST(f.n AS BIGINT) AS n,
          |  round(f.mr, 6) AS mean_ret,
          |  round(lo.lo, 6) AS ci_lo, round(hi.hi, 6) AS ci_hi
          |FROM f JOIN lo ON f.ticker = lo.ticker
          |       JOIN hi ON f.ticker = hi.ticker
          |ORDER BY f.ticker""".stripMargin)),

    QueryDef("a52_newey_west",
      // HAC-robust mean-return t-stat per ticker (Newey–West 1987,
      // Bartlett kernel, L = 5): σ²_NW = γ₀ + 2Σ(1−l/6)γ_l over the
      // lag-l autocovariances — the serial-correlation-honest version
      // of a13's Sharpe t-stat (daily returns autocorrelate; the iid
      // SE overstates significance). EVERY autocovariance is exact:
      // returns clamp to ±1000% and carry as µunit longs (the w40
      // discipline), each γ_l·T³ expands to pure integer cross-moments
      // (T²·Σxy − T·SM·(Sx+Sz) + n_l·SM²) in DECIMAL(38,0)/HUGEINT
      // (magnitudes ≤ 1e24), and Bartlett weights clear denominators
      // through 6·σ²·T³ = 6γ₀T³ + Σ2(6−l)γ_lT³ — one exact integer.
      // Only the final mean/SE/t are IEEE, from identical decimal
      // inputs in both engines; 6dp rounds. One per-ticker window
      // exchange shared by all five lags (the w32 shape).
      (s, dir) => {
        val r6 = round(col("ret"), 6).cast("decimal(10,6)")
        val rc = least(greatest(r6, lit(-10).cast("decimal(10,6)")),
          lit(10).cast("decimal(10,6)"))
        val base = pricesWithRet(s, dir).filter(col("ret").isNotNull)
          .select(col("ticker"), col("date"),
            (rc * lit(1000000)).cast("long").as("_v"))
        val withLags = (1 to 5).foldLeft(base)((d, l) =>
          d.withColumn(s"_g$l", lag(col("_v"), l).over(wTicker)))
        val dec = "decimal(38,0)"
        val lagAggs = (1 to 5).flatMap(l => Seq(
          sum(col("_v") * col(s"_g$l")).cast(dec).as(s"_sxy$l"),
          sum(when(col(s"_g$l").isNotNull, col("_v"))).cast(dec).as(s"_sx$l"),
          sum(col(s"_g$l")).cast(dec).as(s"_sz$l"),
          count(col(s"_g$l")).as(s"_nl$l")))
        val g0 = "(CAST(_t AS DECIMAL(38,0)) * _t * _syy - CAST(_t AS DECIMAL(38,0)) * _sm * _sm)"
        val gl = (1 to 5).map(l =>
          s"""(CAST(_t AS DECIMAL(38,0)) * _t * _sxy$l
             | - CAST(_t AS DECIMAL(38,0)) * _sm * (_sx$l + _sz$l)
             | + CAST(_nl$l AS DECIMAL(38,0)) * _sm * _sm)""".stripMargin)
        val sig6T3 = s"(6 * $g0 + " +
          (1 to 5).map(l => s"2 * ${6 - l} * ${gl(l - 1)}").mkString(" + ") + ")"
        withLags.groupBy("ticker")
          .agg(count(lit(1)).as("_t"),
            (sum(col("_v")).cast(dec).as("_sm") +:
              sum(col("_v") * col("_v")).cast(dec).as("_syy") +:
              lagAggs): _*)
          .filter(col("_t") >= 10)
          .withColumn("_var", expr(s"CAST($sig6T3 AS DOUBLE)") /
            (lit(6.0) * col("_t").cast("double") * col("_t").cast("double") *
              col("_t").cast("double") * lit(1e12)))
          .withColumn("mean_ret", expr("CAST(_sm AS DOUBLE)") /
            (col("_t").cast("double") * lit(1e6)))
          .select(col("ticker"), col("_t").as("n"),
            round(col("mean_ret"), 6).as("mean_ret"),
            when(col("_var") > 0,
              round(sqrt(col("_var") / col("_t").cast("double")), 6))
              .as("nw_se"),
            when(col("_var") > 0,
              round(col("mean_ret") /
                sqrt(col("_var") / col("_t").cast("double")), 6))
              .as("t_nw"))
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, x AS (
          |  SELECT ticker, "date",
          |    CAST(least(greatest(CAST(round(ret, 6) AS DECIMAL(10,6)),
          |      CAST(-10 AS DECIMAL(10,6))), CAST(10 AS DECIMAL(10,6)))
          |      * 1000000 AS BIGINT) AS v
          |  FROM r WHERE ret IS NOT NULL),
          |l AS (
          |  SELECT ticker, v,
          |    lag(v, 1) OVER w AS g1, lag(v, 2) OVER w AS g2,
          |    lag(v, 3) OVER w AS g3, lag(v, 4) OVER w AS g4,
          |    lag(v, 5) OVER w AS g5
          |  FROM x WINDOW w AS (PARTITION BY ticker ORDER BY "date")),
          |a AS (
          |  SELECT ticker, count(*) AS t,
          |    CAST(sum(v) AS HUGEINT) AS sm,
          |    CAST(sum(v * v) AS HUGEINT) AS syy,
          |    CAST(sum(v * g1) AS HUGEINT) AS sxy1, CAST(sum(CASE WHEN g1 IS NOT NULL THEN v END) AS HUGEINT) AS sx1, CAST(sum(g1) AS HUGEINT) AS sz1, count(g1) AS nl1,
          |    CAST(sum(v * g2) AS HUGEINT) AS sxy2, CAST(sum(CASE WHEN g2 IS NOT NULL THEN v END) AS HUGEINT) AS sx2, CAST(sum(g2) AS HUGEINT) AS sz2, count(g2) AS nl2,
          |    CAST(sum(v * g3) AS HUGEINT) AS sxy3, CAST(sum(CASE WHEN g3 IS NOT NULL THEN v END) AS HUGEINT) AS sx3, CAST(sum(g3) AS HUGEINT) AS sz3, count(g3) AS nl3,
          |    CAST(sum(v * g4) AS HUGEINT) AS sxy4, CAST(sum(CASE WHEN g4 IS NOT NULL THEN v END) AS HUGEINT) AS sx4, CAST(sum(g4) AS HUGEINT) AS sz4, count(g4) AS nl4,
          |    CAST(sum(v * g5) AS HUGEINT) AS sxy5, CAST(sum(CASE WHEN g5 IS NOT NULL THEN v END) AS HUGEINT) AS sx5, CAST(sum(g5) AS HUGEINT) AS sz5, count(g5) AS nl5
          |  FROM l GROUP BY 1),
          |g AS (
          |  SELECT ticker, t, sm,
          |    (CAST(t AS HUGEINT) * t * syy - CAST(t AS HUGEINT) * sm * sm) AS g0,
          |    (CAST(t AS HUGEINT) * t * sxy1 - CAST(t AS HUGEINT) * sm * (sx1 + sz1) + CAST(nl1 AS HUGEINT) * sm * sm) AS gl1,
          |    (CAST(t AS HUGEINT) * t * sxy2 - CAST(t AS HUGEINT) * sm * (sx2 + sz2) + CAST(nl2 AS HUGEINT) * sm * sm) AS gl2,
          |    (CAST(t AS HUGEINT) * t * sxy3 - CAST(t AS HUGEINT) * sm * (sx3 + sz3) + CAST(nl3 AS HUGEINT) * sm * sm) AS gl3,
          |    (CAST(t AS HUGEINT) * t * sxy4 - CAST(t AS HUGEINT) * sm * (sx4 + sz4) + CAST(nl4 AS HUGEINT) * sm * sm) AS gl4,
          |    (CAST(t AS HUGEINT) * t * sxy5 - CAST(t AS HUGEINT) * sm * (sx5 + sz5) + CAST(nl5 AS HUGEINT) * sm * sm) AS gl5
          |  FROM a WHERE t >= 10),
          |v2 AS (
          |  SELECT ticker, t, sm,
          |    CAST(6 * g0 + 2 * 5 * gl1 + 2 * 4 * gl2 + 2 * 3 * gl3
          |         + 2 * 2 * gl4 + 2 * 1 * gl5 AS DOUBLE)
          |      / (6.0 * t * t * t * 1e12) AS var_nw,
          |    CAST(sm AS DOUBLE) / (t * 1e6) AS mean_ret
          |  FROM g)
          |SELECT ticker, CAST(t AS BIGINT) AS n,
          |  round(mean_ret, 6) AS mean_ret,
          |  CASE WHEN var_nw > 0
          |       THEN round(sqrt(var_nw / t), 6) END AS nw_se,
          |  CASE WHEN var_nw > 0
          |       THEN round(mean_ret / sqrt(var_nw / t), 6) END AS t_nw
          |FROM v2 ORDER BY ticker""".stripMargin))
  )
}
