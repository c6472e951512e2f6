package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source reconciliation (SURVEY.md §2c J-1/J-2, §2b P-6..P-10;
  * reference `src/validation.py:187-277` `compare_sources` and the
  * flag-enrichment join `src/pipeline.py:174-181`).
  *
  * Scale design: the reference loops tickers one at a time through two
  * HTTP fetches and a pandas merge; here ALL entities reconcile in one
  * equi-join on `(entity, date)`. The secondary/validation side is
  * typically much smaller (only cross-validated entities) → broadcast
  * hint lets Catalyst pick broadcast-hash and avoid shuffling the big
  * fact side entirely.
  */
object CrossValidationOps {

  /** J-1 + P-7/P-8: inner-join primary vs secondary closes on
    * (entity, date), derive diff columns, flag discrepancies beyond
    * tolerance. `resolved_close` = primary (source-of-truth semantics,
    * reference `src/validation.py:264-265`).
    */
  def compareSources(
      primary: DataFrame, // entity, date, close
      secondary: DataFrame,
      entity: String = "ticker",
      time: String = "date",
      tolerancePct: Double = 1.0,
      broadcastSecondary: Boolean = true): DataFrame = {
    val p = primary.select(col(entity), col(time), col("close").as("yahoo_close"))
    val s0 = secondary.select(col(entity), col(time), col("close").as("alpha_close"))
    // The reference's validation side is a handful of cross-checked
    // entities → broadcast by default; pass false when the secondary is
    // a full-size source and let AQE pick the join strategy.
    val s = if (broadcastSecondary) broadcast(s0) else s0
    p.join(s, Seq(entity, time), "inner")
      .na.drop(Seq("yahoo_close", "alpha_close")) // P-10
      .withColumn("price_diff", col("yahoo_close") - col("alpha_close"))
      .withColumn("diff_pct", abs(col("price_diff") / col("yahoo_close") * 100))
      .withColumn("discrepancy_flag", col("diff_pct") > lit(tolerancePct))
      .withColumn("resolved_close", col("yahoo_close"))
  }

  /** P-6: discrepancy rows only (reference `src/validation.py:247`). */
  def discrepancies(compared: DataFrame, tolerancePct: Double = 1.0): DataFrame =
    compared.filter(col("diff_pct") > lit(tolerancePct))

  /** J-2 + P-9: left-join validation flags back onto the feature table,
    * null → false (reference `src/pipeline.py:174-181`). Flags side is
    * small → broadcast.
    */
  def enrichWithFlags(
      features: DataFrame,
      flags: DataFrame, // entity, date, discrepancy_flag
      entity: String = "ticker",
      time: String = "date",
      broadcastFlags: Boolean = true): DataFrame = {
    val f0 = flags.select(col(entity), col(time), col("discrepancy_flag"))
    val f = if (broadcastFlags) broadcast(f0) else f0
    features.join(f, Seq(entity, time), "left")
      .na.fill(Map("discrepancy_flag" -> false))
  }

  /** A-9 analog: per-entity reconciliation status — `cross_validated` vs
    * `single_source` falls out of one groupBy instead of a driver loop
    * (reference statuses `src/validation.py:346,353`).
    */
  def reconciliationSummary(compared: DataFrame, entity: String = "ticker"): DataFrame =
    compared.groupBy(col(entity)).agg(
      count(lit(1)).as("comparisons"),
      sum(col("discrepancy_flag").cast("long")).as("discrepancy_count"),
      max(col("diff_pct")).as("max_diff_pct"))
}
