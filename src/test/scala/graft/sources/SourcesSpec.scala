package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("standardizeColumns lowercases and snake_cases names") {
    val df = Seq((1, 2.0)).toDF("Adj Close", "Stock.Splits")
    val out = SourceOps.standardizeColumns(df)
    assert(out.columns.toSeq === Seq("adj_close", "stock_splits"))
  }

  test("stripNumericPrefixes removes Alpha-Vantage-style prefixes") {
    val df = Seq((1.0, 2.0)).toDF("1. open", "4. close")
    assert(SourceOps.stripNumericPrefixes(df).columns.toSeq === Seq("open", "close"))
  }

  test("assertColumns fails fast naming the missing columns") {
    val df = Seq((1, 2)).toDF("open", "close")
    val e = intercept[IllegalArgumentException] {
      SourceOps.assertColumns(df, Seq("open", "close", "volume"))
    }
    assert(e.getMessage.contains("volume"))
    SourceOps.assertColumns(df, Seq("Open")) // case-insensitive pass
  }

  test("coerceNumeric: to_numeric(errors=coerce) parity — bad values → null") {
    val df = Seq("1.5", "abc", "2").toDF("v")
    val out = SourceOps.coerceNumeric(df, Seq("v")).as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(1.5), None, Some(2.0)))
  }

  test("dateRange is inclusive on both ends") {
    val df = Seq("2024-01-01", "2024-01-15", "2024-02-01").toDF("d")
      .selectExpr("CAST(d AS DATE) AS d")
    val out = SourceOps.dateRange(df, "d", "2024-01-01", "2024-01-15")
    assert(out.count() === 2L)
  }

  test("unionAll aligns schemas by name, missing columns → null") {
    val a = Seq((1, "x")).toDF("id", "extra")
    val b = Seq(2).toDF("id")
    val u = SourceOps.unionAll(Seq(a, b)).orderBy("id")
    assert(u.count() === 2L)
    assert(u.columns.toSet === Set("id", "extra"))
    assert(u.collect()(1).isNullAt(u.columns.indexOf("extra")))
  }

  test("unionAll of zero frames fails fast") {
    intercept[IllegalArgumentException] { SourceOps.unionAll(Nil) }
  }

  test("withMetadata appends constant columns") {
    val out = SourceOps.withMetadata(Seq(1).toDF("id"),
      Map("ticker" -> "AAPL", "source" -> "yahoo"))
    assert(out.columns.toSet === Set("id", "ticker", "source"))
    assert(out.head().getAs[String]("ticker") === "AAPL")
  }

  test("resolveCategories: known, unknown, and empty-means-all") {
    val catalog = Map("growth" -> Seq("GDP", "GDPC1"), "prices" -> Seq("CPIAUCSL"))
    assert(SourceOps.resolveCategories(Seq("growth"), catalog) === Seq("GDP", "GDPC1"))
    assert(SourceOps.resolveCategories(Seq("nope"), catalog) === Nil)
    assert(SourceOps.resolveCategories(Nil, catalog).toSet === Set("GDP", "GDPC1", "CPIAUCSL"))
  }

  test("fetchAllOrLog: failing sources are swallowed per-item (S-5)") {
    val ok = new Source { def fetch(s: org.apache.spark.sql.SparkSession) = Seq(1).toDF("id") }
    val bad = new Source { def fetch(s: org.apache.spark.sql.SparkSession) = throw new RuntimeException("feed down") }
    val (df, errs) = SourceOps.fetchAllOrLog(Seq("good" -> ok, "broken" -> bad), spark)
    assert(df.get.count() === 1L)
    assert(errs === Seq("broken: feed down"))
    val (none, allErrs) = SourceOps.fetchAllOrLog(Seq("b1" -> bad, "b2" -> bad), spark)
    assert(none.isEmpty && allErrs.length === 2)
  }
}
