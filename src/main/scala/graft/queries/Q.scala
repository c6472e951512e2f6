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
}
