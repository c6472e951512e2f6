package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-checked query suite.
  *
  * Cross-engine determinism rules (Spark result must hash-match DuckDB):
  *  - Money sums: double addition is order-dependent, so all currency
  *    aggregation happens in EXACT decimal (`DECIMAL(12,4)` inputs →
  *    exact product/sum), is rounded to 2 decimals while still decimal,
  *    and only then cast to double. A 2-decimal value N/100 with N < 2^53
  *    converts to double identically in any engine → bit-exact.
  *  - Counts: Spark `count` ↔ DuckDB `COUNT(*) FILTER` (never DuckDB
  *    `SUM(int)`, which returns HUGEINT and breaks schema compare).
  *  - Ratios / stddevs: inherently floating — rounded to 6 decimals,
  *    where the residual cross-engine noise (~1e-12 relative) leaves a
  *    negligible probability of straddling a rounding boundary.
  *  - Every query ends with a total deterministic ORDER BY.
  */
object Q {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact-decimal money expression: extendedprice * (1 - discount). */
  def revenueDec: Column =
    col("l_extendedprice").cast("decimal(12,4)") *
      (lit(1).cast("decimal(6,4)") - col("l_discount").cast("decimal(6,4)"))

  /** charge = extendedprice * (1 - discount) * (1 + tax), exact decimal. */
  def chargeDec: Column =
    revenueDec * (lit(1).cast("decimal(6,4)") + col("l_tax").cast("decimal(6,4)"))

  /** Round a decimal aggregate to 2 dp and cast to double (bit-exact). */
  def money2(c: Column): Column = round(c, 2).cast("double")

  /** The `prices` adaptation: lineitem re-keyed as an entity/date price
    * series (ticker = l_suppkey, date = ship date, close = daily revenue,
    * volume = daily quantity). This is the base table for all the
    * financial window/validation operators (SURVEY.md §2e), chosen so the
    * DuckDB oracle can reproduce it from the same parquet.
    */
  def prices(li: DataFrame): DataFrame =
    li.groupBy(col("l_suppkey").as("ticker"), to_date(col("l_shipdate")).as("date"))
      .agg(
        money2(sum(revenueDec)).as("close"),
        sum(col("l_quantity")).cast("double").as("volume"))

  /** DuckDB CTE equivalent of [[prices]]. */
  val pricesSql: String =
    """WITH prices AS (
      |  SELECT l_suppkey AS ticker,
      |         CAST(l_shipdate AS DATE) AS "date",
      |         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
      |                         * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS close,
      |         CAST(SUM(l_quantity) AS DOUBLE) AS volume
      |  FROM lineitem GROUP BY 1, 2
      |)""".stripMargin

  /** The OHLC adaptation: each lineitem row is an intraday "trade"
    * (revenue of one line) ordered within the day by the trade key
    * `l_orderkey*8 + l_linenumber`, TIE-BROKEN BY THE REVENUE ITSELF —
    * the generated data contains duplicate (orderkey, linenumber)
    * pairs (a30's unique-expectation finding), and a bare arg_min on a
    * tied key with two distinct values is engine-nondeterministic
    * (each engine keeps whichever row its scan/merge saw first). With
    * the (key, revenue) struct the order is TOTAL over the values that
    * matter, so open/close are well-defined everywhere. open/close =
    * first/last trade revenue by that order, high/low = max/min — so
    * low ≤ open, close ≤ high holds by construction. All prices are
    * exact-decimal 2dp → double (bit-exact cross-engine); one hash
    * aggregation via min_by/max_by (DuckDB arg_min/arg_max on the
    * matching struct), no window, no sort — the w13 shape. Base table
    * for the ATR / stochastic-oscillator indicators.
    */
  def ohlcBars(li: DataFrame): DataFrame = {
    val tradeKey = col("l_orderkey") * lit(8L) + col("l_linenumber")
    val tradeOrd = struct(tradeKey.as("k"), revenueDec.as("r"))
    li.groupBy(col("l_suppkey").as("ticker"), to_date(col("l_shipdate")).as("date"))
      .agg(
        money2(min(tradeOrd).getField("r")).as("open"),
        money2(max(revenueDec)).as("high"),
        money2(min(revenueDec)).as("low"),
        money2(max(tradeOrd).getField("r")).as("close"),
        sum(col("l_quantity")).cast("double").as("volume"))
  }

  /** DuckDB CTE equivalent of [[ohlcBars]] (table `bars`). */
  val ohlcSql: String =
    """WITH bars AS (
      |  SELECT l_suppkey AS ticker,
      |         CAST(l_shipdate AS DATE) AS "date",
      |         CAST(ROUND((MIN({'k': l_orderkey * 8 + l_linenumber,
      |                          'r': CAST(l_extendedprice AS DECIMAL(12,4))
      |                               * (1 - CAST(l_discount AS DECIMAL(6,4)))})).r,
      |                    2) AS DOUBLE) AS open,
      |         CAST(ROUND(MAX(CAST(l_extendedprice AS DECIMAL(12,4))
      |                          * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS high,
      |         CAST(ROUND(MIN(CAST(l_extendedprice AS DECIMAL(12,4))
      |                          * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS low,
      |         CAST(ROUND((MAX({'k': l_orderkey * 8 + l_linenumber,
      |                          'r': CAST(l_extendedprice AS DECIMAL(12,4))
      |                               * (1 - CAST(l_discount AS DECIMAL(6,4)))})).r,
      |                    2) AS DOUBLE) AS close,
      |         CAST(SUM(l_quantity) AS DOUBLE) AS volume
      |  FROM lineitem GROUP BY 1, 2
      |)""".stripMargin
}
