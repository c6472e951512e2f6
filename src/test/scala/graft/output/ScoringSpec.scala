package graft.output

import org.scalatest.funsuite.AnyFunSuite
import graft.output.Scoring.BasicChecks

/** Pins the reference scoring formulas and the ordered recommendation
  * rules (reference `src/output_manager.py:135-252`).
  */
class ScoringSpec extends AnyFunSuite {

  test("basicScore: 100 - 5*(dups+negClose+negVol+extremes+nulls/10)") {
    assert(Scoring.basicScore(BasicChecks(0, 0, 0, 0, 0)) === 100.0)
    assert(Scoring.basicScore(BasicChecks(1, 1, 0, 0, 0)) === 90.0)
    assert(Scoring.basicScore(BasicChecks(0, 0, 0, 0, 10)) === 95.0)
  }

  test("basicScore clamps at 0") {
    assert(Scoring.basicScore(BasicChecks(100, 0, 0, 0, 0)) === 0.0)
  }

  test("reliabilityScore: 100 - 100*disc/comparisons, None without comparisons") {
    assert(Scoring.reliabilityScore(0, 10) === Some(100.0))
    assert(Scoring.reliabilityScore(1, 8) === Some(87.5))
    assert(Scoring.reliabilityScore(5, 0) === None)
    assert(Scoring.reliabilityScore(99, 10) === Some(0.0)) // clamped
  }

  test("macroCompleteness: mean record count capped at 100, unrounded") {
    assert(Scoring.macroCompleteness(Seq(50L, 150L)) === Some(100.0))
    assert(Scoring.macroCompleteness(Seq(20L, 40L)) === Some(30.0))
    assert(Scoring.macroCompleteness(Seq(1L, 2L)) === Some(1.5))
    assert(Scoring.macroCompleteness(Nil) === None)
  }

  test("overallScore: round1(0.7*basic + 0.3*reliability), else unrounded basic") {
    assert(Scoring.overallScore(90.0, Some(100.0)) === 93.0)
    assert(Scoring.overallScore(92.25, None) === 92.25) // else-branch copies as-is
  }

  test("recommendations fire in reference rule order with reference strings") {
    val rec = Scoring.recommendations(
      BasicChecks(duplicates = 2, negativeClose = 0, negativeVolume = 0,
        extremeMoves = 1, nulls = 3),
      Scoring.Performed(4), macroFetched = true)
    assert(rec(0) === "\u26a0\ufe0f Missing data detected. Consider data imputation or extended date ranges.")
    assert(rec(1).contains("Duplicate records found and removed"))
    assert(rec(2).contains("Extreme price movements detected"))
    assert(rec(3).contains("4 price discrepancies found between sources"))
  }

  test("recommendations: cross-validation not performed rule") {
    val rec = Scoring.recommendations(BasicChecks(0, 0, 0, 0, 0),
      Scoring.NotPerformed, macroFetched = true)
    assert(rec === Seq("\ud83d\udd0d Enable cross-validation with Alpha Vantage API key for improved data reliability."))
  }

  test("recommendations: perfect match, unmarked quirk, and excellent fallback") {
    val agree = Scoring.recommendations(BasicChecks(0, 0, 0, 0, 0),
      Scoring.Performed(0), macroFetched = true)
    assert(agree === Seq("\u2705 Perfect cross-validation match. High confidence in data accuracy."))
    // the faithful quirk: a status-less report fires NEITHER rule
    val quirky = Scoring.recommendations(BasicChecks(0, 0, 0, 0, 0),
      Scoring.Unmarked, macroFetched = true)
    assert(quirky === Seq("\u2705 Excellent data quality! No issues detected. Data ready for analysis."))
  }

  test("recommendations: macro not fetched rule") {
    val rec = Scoring.recommendations(BasicChecks(0, 0, 0, 0, 0),
      Scoring.Unmarked, macroFetched = false)
    assert(rec === Seq("\ud83d\udcca Add macroeconomic context with FRED API key for comprehensive market analysis."))
  }
}
