package graft.output

/** Quality scoring + recommendation rules (SURVEY.md §2d A-10, §2i;
  * reference `src/output_manager.py:135-252`).
  *
  * Pure driver-side scalar functions over collected report aggregates —
  * deliberately NOT Spark ops: they consume a handful of numbers produced
  * by the fused validation aggregates, so distributing them would add a
  * job for a O(1) computation.
  */
object Scoring {

  final case class BasicChecks(
      duplicates: Long,
      negativeClose: Long,
      negativeVolume: Long,
      extremeMoves: Long,
      nulls: Long)

  /** Basic quality score (reference `src/output_manager.py:149-163`):
    * `max(0, 100 − 5·(dups + negClose + negVol + extremes + nulls/10))`.
    */
  def basicScore(c: BasicChecks): Double = {
    val penalty = 5.0 * (c.duplicates + c.negativeClose + c.negativeVolume +
      c.extremeMoves + c.nulls / 10.0)
    math.max(0.0, 100.0 - penalty)
  }

  /** Cross-validation reliability (reference `src/output_manager.py:166-172`):
    * `max(0, 100 − 100·discrepancies/comparisons)`, rounded to 1 decimal;
    * None when no comparisons were performed.
    */
  def reliabilityScore(discrepancies: Long, comparisons: Long): Option[Double] =
    if (comparisons <= 0) None
    else Some(round1(math.max(0.0, 100.0 - 100.0 * discrepancies / comparisons)))

  /** Macro completeness (reference `src/output_manager.py:175-181`): mean
    * per-series record count capped at 100; None without macro data.
    */
  def macroCompleteness(recordCounts: Seq[Long]): Option[Double] =
    if (recordCounts.isEmpty) None
    else Some(round1(math.min(100.0, recordCounts.sum.toDouble / recordCounts.size)))

  /** Overall score (reference `src/output_manager.py:184-190`):
    * `0.7·basic + 0.3·reliability` when reliability exists, else basic.
    */
  def overallScore(basic: Double, reliability: Option[Double]): Double =
    round1(reliability.fold(basic)(r => 0.7 * basic + 0.3 * r))

  private def round1(x: Double): Double =
    BigDecimal(x).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** §2i: ordered recommendation rules (reference
    * `src/output_manager.py:194-252`). Rule ORDER is part of the contract.
    */
  def recommendations(
      checks: BasicChecks,
      crossValidationEnabled: Boolean,
      discrepancies: Long,
      comparisons: Long): Seq[String] = {
    val out = Seq.newBuilder[String]
    if (checks.nulls > 0)
      out += s"Data contains ${checks.nulls} null values - consider data imputation or source verification"
    if (checks.duplicates > 0)
      out += s"Removed ${checks.duplicates} duplicate records - verify data source consistency"
    if (checks.extremeMoves > 0)
      out += s"Detected ${checks.extremeMoves} extreme price movements - verify against market events"
    if (!crossValidationEnabled)
      out += "Enable cross-validation with Alpha Vantage API key for improved data reliability"
    else if (discrepancies > 0)
      out += s"Review $discrepancies price discrepancies between data sources"
    else if (comparisons > 0)
      out += "Cross-validation passed - data sources are in perfect agreement"
    val rec = out.result()
    if (rec.isEmpty) Seq("Data quality is excellent - no issues detected") else rec
  }
}
