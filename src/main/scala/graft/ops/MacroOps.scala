package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Macro (tidy long-format series) validation (SURVEY.md §2d A-6/A-7;
  * reference `src/macro.py:277-326` `validate_macro_data`).
  *
  * The reference profiles each series with a Python loop; here one
  * `groupBy(series_id)` produces all per-series profiles in a single
  * shuffle, and the tidy layout means adding series scales the key space,
  * not the schema.
  */
object MacroOps {

  /** A-6: per-series profile — record count, null values, min/max value,
    * first/last date (reference `src/macro.py:309-322`).
    */
  def seriesProfile(df: DataFrame, series: String = "series_id",
      time: String = "date", value: String = "value"): DataFrame =
    df.groupBy(col(series)).agg(
      count(lit(1)).as("record_count"),
      sum(col(value).isNull.cast("long")).as("null_values"),
      min(col(value)).as("min_value"),
      max(col(value)).as("max_value"),
      min(col(time)).as("first_date"),
      max(col(time)).as("last_date"))

  /** Enrich a tidy macro frame with `series_name`/`category` from the
    * FRED catalog (reference tidy columns `src/macro.py:148-152`,
    * warehouse DDL `src/database.py:73-86`). A BROADCAST left join —
    * the catalog is 22 rows, so no shuffle of the data side at any
    * scale; series ids outside the catalog keep null name/category.
    *
    * Idempotent: only MISSING catalog columns are joined in, so a frame
    * already carrying one (or both) never gains a duplicate column —
    * and a frame carrying only `category` still gets `series_name`,
    * keeping every appended batch on the full 5-column schema.
    */
  def enrichWithCatalog(df: DataFrame, series: String = "series_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toAdd = Seq("series_name", "category").filterNot(df.columns.contains)
    if (toAdd.isEmpty) df
    else {
      val cat = graft.sources.FredCatalog.catalogRows
        .toDF(series, "series_name", "category")
        .select((series +: toAdd).map(col): _*)
      df.join(broadcast(cat), Seq(series), "left")
    }
  }

  /** A-7: distinct series count (reference `src/macro.py:293`). Exact
    * `countDistinct` at request scale; `approx_count_distinct` is the
    * 100 TB variant when a ±2% estimate suffices and saves a shuffle of
    * the full key set.
    */
  def distinctSeries(df: DataFrame, series: String = "series_id"): Long =
    df.agg(countDistinct(col(series)).as("n")).head().getAs[Long]("n")
}
