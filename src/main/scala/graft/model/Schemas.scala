package graft.model

import org.apache.spark.sql.types._

/** Typed data model for the engine.
  *
  * Mirrors the reference's two logical table families (SURVEY.md §1):
  * ticker OHLCV time series (reference `src/pipeline.py:36-41`, DDL
  * `src/database.py:49-70`) and tidy macro series (`src/macro.py:148-152`,
  * DDL `src/database.py:73-86`), plus the warehouse metadata tables.
  *
  * Spark types follow the observed REAL/INTEGER storage of the reference
  * warehouse (floats, not true decimals) — see SURVEY.md §1 type table.
  */
final case class PriceBar(
    ticker: String,
    date: java.sql.Date,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    adj_close: Double,
    volume: Long)

/** Enriched bar after validation + feature transform (reference
  * `src/pipeline.py:78-91`: `return, ma20, ma50, vol20` all nullable to
  * reproduce pandas' leading-NaN window semantics).
  */
final case class EnrichedBar(
    ticker: String,
    date: java.sql.Date,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    adj_close: Double,
    volume: Long,
    ret: Option[Double],
    ma20: Option[Double],
    ma50: Option[Double],
    vol20: Option[Double],
    discrepancy_flag: Boolean)

/** Tidy macro observation (reference `src/macro.py:148-152`). */
final case class MacroObservation(
    series_id: String,
    series_name: String,
    date: java.sql.Date,
    value: Option[Double],
    category: String)

/** One cross-source discrepancy row (reference `src/validation.py:243-265`). */
final case class Discrepancy(
    ticker: String,
    date: java.sql.Date,
    yahoo_close: Double,
    alpha_close: Double,
    price_diff: Double,
    diff_pct: Double,
    discrepancy_flag: Boolean,
    resolved_close: Double)

/** Request-log row (reference DDL `src/database.py:33-46`). */
final case class RequestLogEntry(
    request_id: String,
    tickers: String,
    start_date: java.sql.Date,
    end_date: java.sql.Date,
    status: String,
    records_saved: Long,
    error_count: Long)

/** Validation issue row (reference DDL `src/database.py:89-102`). */
final case class ValidationIssue(
    validation_id: String,
    request_id: String,
    check_name: String,
    severity: String,
    detail: String)

object Schemas {
  val priceBar: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("open", DoubleType, nullable = true),
    StructField("high", DoubleType, nullable = true),
    StructField("low", DoubleType, nullable = true),
    StructField("close", DoubleType, nullable = true),
    StructField("adj_close", DoubleType, nullable = true),
    StructField("volume", LongType, nullable = true)))

  val macroObservation: StructType = StructType(Seq(
    StructField("series_id", StringType, nullable = false),
    StructField("series_name", StringType, nullable = true),
    StructField("date", DateType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("category", StringType, nullable = true)))

  val discrepancy: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("yahoo_close", DoubleType, nullable = true),
    StructField("alpha_close", DoubleType, nullable = true),
    StructField("price_diff", DoubleType, nullable = true),
    StructField("diff_pct", DoubleType, nullable = true),
    StructField("discrepancy_flag", BooleanType, nullable = false),
    StructField("resolved_close", DoubleType, nullable = true)))
}
