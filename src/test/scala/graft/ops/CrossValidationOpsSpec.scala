package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CrossValidationOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val primary = Seq(
    ("A", "2024-01-01", 100.0),
    ("A", "2024-01-02", 200.0),
    ("B", "2024-01-01", 50.0)
  ).toDF("ticker", "date", "close")

  private val secondary = Seq(
    ("A", "2024-01-01", 100.5), // 0.5% off → within 1% tolerance
    ("A", "2024-01-02", 210.0), // 5% off → discrepancy
    ("C", "2024-01-01", 1.0)    // no matching primary row
  ).toDF("ticker", "date", "close")

  test("compareSources inner-joins on (entity, time) and flags beyond tolerance") {
    val cmp = CrossValidationOps.compareSources(primary, secondary, "ticker", "date", 1.0)
      .orderBy("ticker", "date")
    val rows = cmp.select("ticker", "yahoo_close", "alpha_close", "discrepancy_flag")
      .as[(String, Double, Double, Boolean)].collect()
    assert(rows.length === 2) // B and C drop out of the inner join
    assert(rows(0) === (("A", 100.0, 100.5, false)))
    assert(rows(1) === (("A", 200.0, 210.0, true)))
  }

  test("compareSources: resolved_close is the primary side (source of truth)") {
    val cmp = CrossValidationOps.compareSources(primary, secondary)
    val r = cmp.orderBy("date").select("resolved_close").as[Double].collect()
    assert(r.toSeq === Seq(100.0, 200.0))
  }

  test("diff_pct is abs percent difference relative to primary") {
    val cmp = CrossValidationOps.compareSources(primary, secondary)
      .orderBy("date").select("diff_pct").as[Double].collect()
    assert(math.abs(cmp(0) - 0.5) < 1e-9)
    assert(math.abs(cmp(1) - 5.0) < 1e-9)
  }

  test("enrichWithFlags left-joins flags and fills null with false") {
    val flags = Seq(("A", "2024-01-02", true)).toDF("ticker", "date", "discrepancy_flag")
    val out = CrossValidationOps.enrichWithFlags(primary, flags, "ticker", "date")
      .orderBy("ticker", "date")
      .select("ticker", "discrepancy_flag").as[(String, Boolean)].collect()
    assert(out.toSeq === Seq(("A", false), ("A", true), ("B", false)))
  }

  test("reconciliationSummary aggregates per entity instead of a driver loop") {
    val cmp = CrossValidationOps.compareSources(primary, secondary)
    val s = CrossValidationOps.reconciliationSummary(cmp)
      .as[(String, Long, Long, Double)].collect()
    assert(s.toSeq === Seq(("A", 2L, 1L, 5.0)))
  }
}
