package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MacroOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val macroDf = Seq(
    ("GDP", "2024-01-01", Some(1.0)),
    ("GDP", "2024-02-01", Some(3.0)),
    ("GDP", "2024-03-01", None),
    ("CPI", "2024-01-01", Some(310.5))
  ).toDF("series_id", "d", "value")
    .selectExpr("series_id", "CAST(d AS DATE) AS date", "value")

  test("seriesProfile computes per-series counts, nulls, extremes, span") {
    val p = MacroOps.seriesProfile(macroDf).orderBy("series_id")
      .as[(String, Long, Long, Option[Double], Option[Double], java.sql.Date, java.sql.Date)]
      .collect()
    assert(p(0) === (("CPI", 1L, 0L, Some(310.5), Some(310.5),
      java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-01-01"))))
    assert(p(1) === (("GDP", 3L, 1L, Some(1.0), Some(3.0),
      java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-03-01"))))
  }

  test("distinctSeries counts unique series ids") {
    assert(MacroOps.distinctSeries(macroDf) === 2L)
  }
}
