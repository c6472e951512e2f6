package graft.output

/** Quality scoring + recommendation rules (SURVEY.md §2d A-10, §2i;
  * reference `src/output_manager.py:135-252`).
  *
  * Pure driver-side scalar functions over collected report aggregates —
  * deliberately NOT Spark ops: they consume a handful of numbers produced
  * by the fused validation aggregates, so distributing them would add a
  * job for a O(1) computation. Strings and rounding branches reproduce
  * the reference byte-for-byte (including emoji prefixes) because golden
  * replay diffs report JSON against the committed outputs.
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
    * NOT rounded — the reference keeps the raw float.
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
    * per-series record count capped at 100, NOT rounded; None without
    * macro data.
    */
  def macroCompleteness(recordCounts: Seq[Long]): Option[Double] =
    if (recordCounts.isEmpty) None
    else Some(math.min(100.0, recordCounts.sum.toDouble / recordCounts.size))

  /** Overall score (reference `src/output_manager.py:184-190`): round1 of
    * `0.7·basic + 0.3·reliability` when reliability exists; otherwise the
    * UNROUNDED basic score (the reference's else-branch copies it as-is).
    */
  def overallScore(basic: Double, reliability: Option[Double]): Double =
    reliability.fold(basic)(r => round1(0.7 * basic + 0.3 * r))

  private def round1(x: Double): Double =
    BigDecimal(x).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Cross-validation state as the recommendation rules see it
    * (reference `src/output_manager.py:222-237`). `Unmarked` is the
    * faithful quirk: the enhanced path's validator report carries NO
    * `status` key (`src/validation.py:450-455`), so neither
    * cross-validation rule fires even though validation ran.
    */
  sealed trait CrossValidationState
  case object NotPerformed extends CrossValidationState
  final case class Performed(discrepancies: Long) extends CrossValidationState
  case object Unmarked extends CrossValidationState

  /** §2i: ordered recommendation rules with the reference's exact strings
    * (reference `src/output_manager.py:194-252`). `macroFetched` = false
    * renders the macro_validation {status: not_fetched} advice.
    */
  def recommendations(
      checks: BasicChecks,
      crossValidation: CrossValidationState,
      macroFetched: Boolean): Seq[String] = {
    val out = Seq.newBuilder[String]
    if (checks.nulls > 0)
      out += "⚠️ Missing data detected. Consider data imputation or extended date ranges."
    if (checks.duplicates > 0)
      out += "🔄 Duplicate records found and removed. Check data source for consistency."
    if (checks.extremeMoves > 0)
      out += "📈 Extreme price movements detected. Verify if these are legitimate market events."
    crossValidation match {
      case NotPerformed =>
        out += "🔍 Enable cross-validation with Alpha Vantage API key for improved data reliability."
      case Performed(d) if d > 0 =>
        out += s"⚡ $d price discrepancies found between sources. Review anomaly details for trading decisions."
      case Performed(_) =>
        out += "✅ Perfect cross-validation match. High confidence in data accuracy."
      case Unmarked => ()
    }
    if (!macroFetched)
      out += "📊 Add macroeconomic context with FRED API key for comprehensive market analysis."
    val rec = out.result()
    if (rec.isEmpty) Seq("✅ Excellent data quality! No issues detected. Data ready for analysis.")
    else rec
  }
}
