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

  test("enrichWithCatalog joins series_name/category; unknown ids keep nulls") {
    val tidy = Seq(("GDP", "2024-01-01", 1.0), ("UNKNOWN", "2024-01-01", 2.0))
      .toDF("series_id", "d", "value")
      .selectExpr("series_id", "CAST(d AS DATE) AS date", "value")
    val e = MacroOps.enrichWithCatalog(tidy).orderBy("series_id")
    assert(e.columns.toSeq ===
      Seq("series_id", "date", "value", "series_name", "category"))
    val rows = e.select("series_id", "series_name", "category")
      .as[(String, Option[String], Option[String])].collect()
    assert(rows(0) === (("GDP", Some("gdp"), Some("growth"))))
    assert(rows(1) === (("UNKNOWN", None, None)))
    // the catalog side is broadcast — no shuffle of the data side
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("enrichWithCatalog is idempotent and fills only the missing columns") {
    val tidy = Seq(("GDP", 1.0)).toDF("series_id", "value")
    val once = MacroOps.enrichWithCatalog(tidy)
    // full enrichment twice adds nothing (no duplicate columns)
    assert(MacroOps.enrichWithCatalog(once).columns.toSeq === once.columns.toSeq)
    // a frame already carrying category still gains series_name only
    val partial = tidy.withColumn("category",
      org.apache.spark.sql.functions.lit("growth"))
    val filled = MacroOps.enrichWithCatalog(partial)
    assert(filled.columns.count(_ == "category") === 1)
    assert(filled.select("series_name").head().getString(0) === "gdp")
  }
}
