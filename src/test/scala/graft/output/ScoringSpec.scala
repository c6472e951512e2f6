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

  test("macroCompleteness: mean record count capped at 100") {
    assert(Scoring.macroCompleteness(Seq(50L, 150L)) === Some(100.0))
    assert(Scoring.macroCompleteness(Seq(20L, 40L)) === Some(30.0))
    assert(Scoring.macroCompleteness(Nil) === None)
  }

  test("overallScore: 0.7*basic + 0.3*reliability, else basic") {
    assert(Scoring.overallScore(90.0, Some(100.0)) === 93.0)
    assert(Scoring.overallScore(90.0, None) === 90.0)
  }

  test("recommendations fire in reference rule order") {
    val rec = Scoring.recommendations(
      BasicChecks(duplicates = 2, negativeClose = 0, negativeVolume = 0,
        extremeMoves = 1, nulls = 3),
      crossValidationEnabled = true, discrepancies = 4, comparisons = 10)
    assert(rec(0).contains("3 null values"))
    assert(rec(1).contains("2 duplicate records"))
    assert(rec(2).contains("1 extreme price movements"))
    assert(rec(3).contains("Review 4 price discrepancies"))
  }

  test("recommendations: cross-validation disabled rule") {
    val rec = Scoring.recommendations(BasicChecks(0, 0, 0, 0, 0),
      crossValidationEnabled = false, discrepancies = 0, comparisons = 0)
    assert(rec === Seq("Enable cross-validation with Alpha Vantage API key for improved data reliability"))
  }

  test("recommendations: perfect agreement and excellent-quality fallbacks") {
    val agree = Scoring.recommendations(BasicChecks(0, 0, 0, 0, 0),
      crossValidationEnabled = true, discrepancies = 0, comparisons = 5)
    assert(agree === Seq("Cross-validation passed - data sources are in perfect agreement"))
    val excellent = Scoring.recommendations(BasicChecks(0, 0, 0, 0, 0),
      crossValidationEnabled = true, discrepancies = 0, comparisons = 0)
    assert(excellent === Seq("Data quality is excellent - no issues detected"))
  }
}
