package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ClassifierFunctions => Cls, DedupFunctions => D, RelevanceFunctions => R, SamplingFunctions => Sam, SimilarityFunctions => S, TextFunctions => T, UrlFunctions => U}
import graft.ops.{AsOfJoinOps, CrossValidationOps, EventAnalyticsOps, FeatureOps, GraphOps, HistoryOps, MacroOps, RangeJoinOps, SkewOps, ValidationOps}


/** Registry queries: per-entity window/indicator/recursion queries and backtests. Split from the former monolithic
  * Queries.scala (r12) — definitions unchanged.
  */
private[queries] object QueriesWindow {
  import Q.{money2, prices, pricesSql, revenueDec, t}
  import QHelpers._

  val defs: Seq[QueryDef] = Seq(

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
        // broadcast the CALENDAR-bounded index side (r15): its lineage
        // ends in a single-partition day aggregate, and without the hint
        // Catalyst broadcast the per-ticker side instead (BuildLeft),
        // leaving the join output single-partition — which satisfied the
        // rolling window's ticker clustering trivially and serialized
        // the whole 5-sum sliding window into ONE task (guide §3.1:
        // size estimates after windows are wrong; hint the side you
        // know). Same fix across w37/w44/w54.
        p.join(broadcast(idx), "date")
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
        tret.join(broadcast(mret), "date")
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
        val j = tret.join(broadcast(mret), "date").filter(col("m") =!= 0)
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
        val x = tret.join(broadcast(mret), "date")
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

    QueryDef("fe3_woe_iv",
      // weight-of-evidence encoding + information value per categorical
      // feature (the credit-scoring feature screen; Siddiqi 2006):
      // target = urgent/high order priority, features = customer
      // market segment and nation. Counts exact; smoothed shares
      // (+0.5/cell, +m/2 per total — Σshares stays 1) round 6dp BEFORE
      // the ln (identical inputs cross-engine, the cls1 libm
      // convention); per-category IV terms cast to exact decimal so
      // the feature-level IV sum is order-free. The per-feature
      // windows run over category censuses (≤ 25 rows — bounded).
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_custkey").as("ck"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("_y"))
        val c = t(s, dir, "customer").select(col("c_custkey").as("ck"),
          col("c_mktsegment").as("_seg"),
          col("c_nationkey").cast("string").as("_nat"))
        val long = o.join(c, "ck").selectExpr("_y",
          "stack(2, 'mktsegment', _seg, 'nation', _nat) AS (feature, category)")
        val wF = Window.partitionBy("feature")
        long.groupBy("feature", "category")
          .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("n_pos"),
            sum(when(!col("_y"), 1L).otherwise(0L)).as("n_neg"))
          .withColumn("_P", sum(col("n_pos")).over(wF))
          .withColumn("_N", sum(col("n_neg")).over(wF))
          .withColumn("_m", count(lit(1)).over(wF))
          .withColumn("pos_share", round((col("n_pos") + 0.5) /
            (col("_P") + col("_m") * 0.5), 6))
          .withColumn("neg_share", round((col("n_neg") + 0.5) /
            (col("_N") + col("_m") * 0.5), 6))
          .withColumn("woe",
            round(log(col("pos_share") / col("neg_share")), 6))
          .withColumn("iv", round(sum(((col("pos_share") - col("neg_share")) *
              col("woe")).cast("decimal(20,10)")).over(wF)
            .cast("double"), 6))
          .select(col("feature"), col("category"), col("n_pos"), col("n_neg"),
            col("pos_share"), col("neg_share"), col("woe"), col("iv"))
          .orderBy("feature", "category")
      },
      Some("""WITH j AS (
             |  SELECT (o.o_orderpriority IN ('1-URGENT', '2-HIGH')) AS y,
             |         c.c_mktsegment AS seg,
             |         CAST(c.c_nationkey AS VARCHAR) AS nat
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
             |lng AS (
             |  SELECT y, 'mktsegment' AS feature, seg AS category FROM j
             |  UNION ALL SELECT y, 'nation', nat FROM j),
             |g AS (
             |  SELECT feature, category,
             |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             |    CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
             |  FROM lng GROUP BY 1, 2),
             |w AS (
             |  SELECT feature, category, n_pos, n_neg,
             |    round((n_pos + 0.5)
             |      / (CAST(sum(n_pos) OVER f AS DOUBLE) + count(*) OVER f * 0.5), 6)
             |      AS pos_share,
             |    round((n_neg + 0.5)
             |      / (CAST(sum(n_neg) OVER f AS DOUBLE) + count(*) OVER f * 0.5), 6)
             |      AS neg_share
             |  FROM g WINDOW f AS (PARTITION BY feature)),
             |w2 AS (SELECT *, round(ln(pos_share / neg_share), 6) AS woe FROM w)
             |SELECT feature, category, n_pos, n_neg, pos_share, neg_share, woe,
             |  round(CAST(sum(CAST((pos_share - neg_share) * woe
             |      AS DECIMAL(20,10))) OVER (PARTITION BY feature)
             |    AS DOUBLE), 6) AS iv
             |FROM w2 ORDER BY feature, category""".stripMargin)),

    QueryDef("fcst2_split_conformal",
      // split-conformal prediction intervals (Vovk; Lei et al. 2018)
      // for fcst1's naive persistence forecast: per ticker, the
      // calibration window (pre-1997) yields the finite-sample
      // conformal quantile q = the ⌈0.9·(n+1)⌉-th smallest absolute
      // residual — the (n+1) correction is what makes coverage ≥ 90%
      // a THEOREM, not an asymptotic hope — and the test window
      // (1997+) reports realized coverage of ŷ ± q. Residuals are
      // exact cent integers; the quantile is an exact order statistic
      // in a per-ticker window; coverage is an integer ratio, 6dp.
      // The model-agnostic uncertainty wrapper every production
      // forecaster ships with.
      (s, dir) => {
        val wd = Window.partitionBy("ticker").orderBy("date")
        // pinned: calibration ranks and test coverage both read it
        val p = graft.Caches.trackedPersist(
          prices(t(s, dir, "lineitem"))
            .select(col("ticker"), col("date"),
              (col("close").cast("decimal(12,2)") * 100).cast("long").as("y"))
            .withColumn("_prev", lag(col("y"), 1).over(wd))
            .filter(col("_prev").isNotNull)
            .withColumn("_r", abs(col("y") - col("_prev")))
            .withColumn("_cal",
              col("date") < lit("1997-01-01").cast("date")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cal = p.filter(col("_cal"))
        val calN = cal.groupBy("ticker").agg(count(lit(1)).as("n_cal"))
        val wr = Window.partitionBy("ticker").orderBy("_r", "date")
        val q = cal.withColumn("_rn", row_number().over(wr))
          .join(calN, "ticker")
          .withColumn("_k", expr("(9 * (n_cal + 1) + 9) div 10"))
          .filter(col("_rn") === col("_k"))
          .select(col("ticker"), col("n_cal"), col("_r").as("_q"))
        p.filter(!col("_cal")).join(q, "ticker")
          .groupBy("ticker")
          .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
            max(col("_q")).as("_qc"),
            sum(when(col("_r") <= col("_q"), 1L).otherwise(0L)).as("_cov"))
          .select(col("ticker"), col("n_cal"), col("n_test"),
            (col("_qc").cast("double") / 100.0).as("q_alpha"),
            round(col("_cov").cast("double") / col("n_test").cast("double"), 6)
              .as("coverage"))
          .orderBy("ticker")
      },
      Some(pricesSql +
        """, p AS (
          |  SELECT ticker, "date",
          |    CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT) AS y,
          |    lag(CAST(CAST(close AS DECIMAL(12,2)) * 100 AS BIGINT))
          |      OVER (PARTITION BY ticker ORDER BY "date") AS prev
          |  FROM prices),
          |x AS (
          |  SELECT ticker, "date", abs(y - prev) AS r,
          |    ("date" < DATE '1997-01-01') AS cal
          |  FROM p WHERE prev IS NOT NULL),
          |cn AS (SELECT ticker, count(*) AS n_cal FROM x WHERE cal GROUP BY 1),
          |rk AS (
          |  SELECT x.ticker, x.r, cn.n_cal,
          |    row_number() OVER (PARTITION BY x.ticker
          |      ORDER BY x.r, x."date") AS rn,
          |    (9 * (cn.n_cal + 1) + 9) // 10 AS k
          |  FROM x JOIN cn ON x.ticker = cn.ticker WHERE x.cal),
          |q AS (SELECT ticker, n_cal, r AS qc FROM rk WHERE rn = k)
          |SELECT x.ticker, CAST(max(q.n_cal) AS BIGINT) AS n_cal,
          |  count(*) AS n_test,
          |  CAST(max(q.qc) AS DOUBLE) / 100.0 AS q_alpha,
          |  round(CAST(sum(CASE WHEN x.r <= q.qc THEN 1 ELSE 0 END) AS DOUBLE)
          |    / CAST(count(*) AS DOUBLE), 6) AS coverage
          |FROM x JOIN q ON x.ticker = q.ticker
          |WHERE NOT x.cal GROUP BY 1 ORDER BY x.ticker""".stripMargin)),

    QueryDef("w60_ljung_box",
      // Ljung–Box portmanteau test per ticker (Q = T(T+2)·Σ ρ²_k/(T−k)
      // over lags 1..5) on w32's autocorrelations — "is this series
      // white noise" as one number, the formal test behind eyeballing
      // the ACF. Both engines compute Q from IDENTICAL 6dp-rounded
      // corr values (the a12 merge-order-under-6dp contract), T and k
      // integers, so the float chain is bit-identical; Q rounds 6dp.
      // Reject at the χ²₅ 95% critical value 11.0705 (literal — both
      // engines compare the same rounded Q). One per-ticker window
      // exchange shared by all five lags (the w32 shape).
      (s, dir) => {
        val base = pricesWithRet(s, dir).filter(col("ret").isNotNull)
        val withLags = (1 to 5).foldLeft(base)((d, l) =>
          d.withColumn(s"_l$l", lag(col("ret"), l).over(wTicker)))
        withLags.groupBy("ticker")
          .agg(count(lit(1)).as("_t"),
            (1 to 5).map(k => round(corr(col("ret"), col(s"_l$k")), 6)
              .as(s"_a$k")): _*)
          .select(col("ticker"), col("_t").as("n"),
            round((col("_t") * (col("_t") + 2)).cast("double") *
              (1 to 5).map(k => pow(col(s"_a$k"), 2) /
                (col("_t") - k).cast("double")).reduce(_ + _), 6)
              .as("q_lb"))
          .withColumn("reject_white_noise", col("q_lb") > 11.0705)
          .orderBy("ticker")
      },
      Some(pricesSql + retSql +
        """, l AS (
          |  SELECT ticker, ret,
          |    lag(ret, 1) OVER w AS l1, lag(ret, 2) OVER w AS l2,
          |    lag(ret, 3) OVER w AS l3, lag(ret, 4) OVER w AS l4,
          |    lag(ret, 5) OVER w AS l5
          |  FROM r WHERE ret IS NOT NULL
          |  WINDOW w AS (PARTITION BY ticker ORDER BY "date")),
          |a AS (
          |  SELECT ticker, count(*) AS t,
          |    round(corr(ret, l1), 6) AS a1, round(corr(ret, l2), 6) AS a2,
          |    round(corr(ret, l3), 6) AS a3, round(corr(ret, l4), 6) AS a4,
          |    round(corr(ret, l5), 6) AS a5
          |  FROM l GROUP BY 1)
          |SELECT ticker, CAST(t AS BIGINT) AS n,
          |  round(CAST(t * (t + 2) AS DOUBLE) *
          |    (a1 * a1 / CAST(t - 1 AS DOUBLE)
          |     + a2 * a2 / CAST(t - 2 AS DOUBLE)
          |     + a3 * a3 / CAST(t - 3 AS DOUBLE)
          |     + a4 * a4 / CAST(t - 4 AS DOUBLE)
          |     + a5 * a5 / CAST(t - 5 AS DOUBLE)), 6) AS q_lb,
          |  round(CAST(t * (t + 2) AS DOUBLE) *
          |    (a1 * a1 / CAST(t - 1 AS DOUBLE)
          |     + a2 * a2 / CAST(t - 2 AS DOUBLE)
          |     + a3 * a3 / CAST(t - 3 AS DOUBLE)
          |     + a4 * a4 / CAST(t - 4 AS DOUBLE)
          |     + a5 * a5 / CAST(t - 5 AS DOUBLE)), 6) > 11.0705
          |    AS reject_white_noise
          |FROM a ORDER BY ticker""".stripMargin))
  )
}
