package graft.runner

import java.nio.file.{Files, Paths}
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.output.FixedClock

class RequestRunnerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val clock = new FixedClock(Instant.parse("2025-08-18T21:00:58Z"))

  private def runner() = {
    val base = Files.createTempDirectory("graft_run").toString
    (new RequestRunner(spark, s"$base/wh", s"$base/out", clock), base)
  }

  private val primary = Seq(
    ("AAPL", "2024-01-01", 100.0, 1000L),
    ("AAPL", "2024-01-02", 101.0, 1100L),
    ("AAPL", "2024-01-03", 102.0, 1200L),
    ("MSFT", "2024-01-01", 380.0, 2000L),
    ("MSFT", "2024-01-02", 381.0, 2100L),
    ("MSFT", "2024-01-03", 385.0, 2200L)
  ).toDF("ticker", "d", "close", "volume")
    .selectExpr("ticker", "CAST(d AS DATE) AS date", "close", "volume")

  private val secondary = Seq(
    ("AAPL", "2024-01-01", 100.1), // within tolerance
    ("AAPL", "2024-01-02", 111.0)  // 9.9% off → discrepancy
  ).toDF("ticker", "d", "close")
    .selectExpr("ticker", "CAST(d AS DATE) AS date", "close")

  private val macroDf = Seq(
    ("FEDFUNDS", "2024-01-01", Some(5.33)),
    ("FEDFUNDS", "2024-02-01", Some(5.33)),
    ("GS10", "2024-01-01", None: Option[Double])
  ).toDF("series_id", "d", "value")
    .selectExpr("series_id", "CAST(d AS DATE) AS date", "value")

  test("request id follows the reference contract") {
    val (r, _) = runner()
    val id = r.generateRequestId(Request(Seq("MSFT", "AAPL"), "2024-01-01", "2024-01-10"))
    assert(id === "20250818_210058_AAPL_MSFT_20240101_20240110")
  }

  test("request id md5-shortens long ticker lists") {
    val (r, _) = runner()
    val many = (1 to 30).map(i => f"TK$i%02d")
    val id = r.generateRequestId(Request(many, "2024-01-01", "2024-01-10"))
    assert(id.contains("_and_29_more_"))
    assert(id.length < 100)
  }

  test("full lifecycle: completed status, warehouse rows, three artifacts") {
    val (r, base) = runner()
    val res = r.run(
      Request(Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-03",
        enableValidation = true, tolerancePct = 1.0),
      primary, Some(secondary), Some(macroDf))
    assert(res.status === "completed")
    assert(res.marketRecords === 6L)
    assert(res.macroRecords === 3L)
    assert(res.discrepancies === 1L)

    val market = spark.read.parquet(s"$base/wh/market_data")
    assert(market.count() === 6L)
    assert(market.columns.contains("ma20") && market.columns.contains("discrepancy_flag"))

    val log = spark.read.parquet(s"$base/wh/request_log")
      .select("request_id", "status", "total_records_fetched").collect()
    assert(log.length === 1 && log(0).getString(1) === "completed")

    val xval = spark.read.parquet(s"$base/wh/cross_validation")
    assert(xval.count() === 1L)
    assert(xval.select("validation_id").head().getString(0)
      === s"${res.requestId}_cross_AAPL_20240102")

    assert(Files.exists(Paths.get(res.csvPath.get)))
    assert(Files.exists(Paths.get(res.reportPath)))
    assert(Files.exists(Paths.get(res.logPath)))
    val csvName = Paths.get(res.csvPath.get).getFileName.toString
    assert(csvName === "prices_AAPL-MSFT_20240101-20240103_20250818_210058.csv")
  }

  test("report JSON carries reference keys and quality scores") {
    val (r, _) = runner()
    val res = r.run(Request(Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-03"), primary)
    val json = Files.readString(Paths.get(res.reportPath))
    for (k <- Seq("report_metadata", "request_details", "ticker_validation",
        "basic_checks", "cross_validation", "not_performed", "macro_validation",
        "not_fetched", "quality_assessment", "basic_data_quality",
        "overall_score", "recommendations"))
      assert(json.contains(k), s"report missing $k")
    assert(json.contains("\"cross_validation_reliability\": \"N/A\""))
  }

  test("re-running the same request appends nothing (dedup-append idempotence)") {
    val (r, _) = runner()
    val req = Request(Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-03")
    assert(r.run(req, primary).marketRecords === 6L)
    assert(r.run(req, primary).marketRecords === 0L)
  }

  test("failure path: status becomes failed with error_count=1 and rethrows") {
    val (r, base) = runner()
    val bad = Seq(("AAPL", "nope", 1.0, 1L)).toDF("ticker", "date", "close", "volume")
    intercept[Throwable] {
      r.run(Request(Seq("AAPL"), "2024-01-01", "2024-01-03"), bad)
    }
    val log = spark.read.parquet(s"$base/wh/request_log")
      .select("status", "error_count").head()
    assert(log.getString(0) === "failed")
    assert(log.getLong(1) === 1L)
  }

  test("warehouse tables are hive-partitioned on the entity key from the request path") {
    val (r, base) = runner()
    r.run(Request(Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-03"), primary,
      macroData = Some(macroDf))
    val market = spark.read.parquet(s"$base/wh/market_data")
    // on-disk layout: ticker= partition dirs for market, series_id= for macro
    assert(market.inputFiles.forall(_.contains("/ticker=")), market.inputFiles.head)
    val macroT = spark.read.parquet(s"$base/wh/macro_data")
    assert(macroT.inputFiles.forall(_.contains("/series_id=")))
    // reference 5-column macro DDL: enrichment joined on name + category
    assert(macroT.columns.toSet.intersect(Set("series_name", "category"))
      === Set("series_name", "category"))
    assert(macroT.filter($"series_id" === "FEDFUNDS")
      .select("series_name", "category").distinct().as[(String, String)].head()
      === (("fed_funds_rate", "rates")))
    // and the layout is actually prunable: a one-ticker read carries a
    // PartitionFilters entry, so a follow-up append rescans one partition
    val plan = market.filter($"ticker" === "AAPL")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ticker"), plan)
    // idempotence still holds through the partitioned path
    assert(r.run(Request(Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-03"),
      primary, macroData = Some(macroDf)).marketRecords === 0L)
  }

  test("flaky source: retry-with-backoff recovers and the tracker records attempts") {
    import graft.sources.{ErrorTracker, RetryPolicy, Source, SourceOps}
    val tracker = new ErrorTracker(clock)
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val retry = new RetryPolicy(maxAttempts = 3, initialDelayMs = 100L,
      sleep = delays += _)
    var calls = 0
    val flaky: Source = new Source {
      def fetch(s: org.apache.spark.sql.SparkSession) = {
        calls += 1
        if (calls < 3) sys.error(s"transient failure $calls")
        primary
      }
    }
    val (df, errs) = SourceOps.fetchAllOrLog(
      Seq("yahoo" -> flaky), spark, retry, Some(tracker))
    assert(df.isDefined && df.get.count() === 6L)
    assert(errs.isEmpty, "recovered source must not surface an item error")
    assert(calls === 3)
    assert(delays.toSeq === Seq(100L, 200L), "exponential backoff schedule")
    assert(tracker.errorCount === 2)
    assert(tracker.byOperation === Map("yahoo" -> 2))
  }

  test("exhausted retries surface the item error and tracked failures reach error_count") {
    import graft.sources.{ErrorTracker, RetryPolicy, Source, SourceOps}
    val tracker = new ErrorTracker(clock)
    val retry = new RetryPolicy(maxAttempts = 2, initialDelayMs = 1L, sleep = _ => ())
    val dead: Source = new Source {
      def fetch(s: org.apache.spark.sql.SparkSession) = sys.error("feed down")
    }
    val (df, errs) = SourceOps.fetchAllOrLog(
      Seq("alpha" -> dead, "yahoo" -> new Source {
        def fetch(s: org.apache.spark.sql.SparkSession) = primary
      }), spark, retry, Some(tracker))
    assert(df.isDefined && errs === Seq("alpha: feed down"))
    assert(tracker.errorCount === 2) // both attempts recorded
    // a completed request writes the tracked count into request_log
    val base = Files.createTempDirectory("graft_run").toString
    val r = new RequestRunner(spark, s"$base/wh", s"$base/out", clock, Some(tracker))
    r.run(Request(Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-03"), df.get)
    val log = spark.read.parquet(s"$base/wh/request_log")
      .select("status", "error_count").head()
    assert(log.getString(0) === "completed")
    assert(log.getLong(1) === 2L)
    // per-request attribution: a SECOND request through the same runner
    // with no new connector errors must log 0, not the tracker's
    // cumulative 2 (one tracker serves the whole pipeline)
    val rid2 = r.run(Request(Seq("AAPL"), "2024-01-01", "2024-01-03"), df.get).requestId
    val log2 = spark.read.parquet(s"$base/wh/request_log")
      .filter($"request_id" === rid2).select("error_count").head()
    assert(log2.getLong(0) === 0L)
  }

  test("writeValidationLog appends issue rows with generated ids (K-6)") {
    val (r, base) = runner()
    val rid = "20250818_210058_AAPL_20240101_20240110"
    r.writeValidationLog(rid, Seq(
      ("AAPL", "null_check", "3 null values in close", 2.0),
      ("MSFT", "duplicate", "2 duplicate rows removed", 1.0)))
    val log = spark.read.parquet(s"$base/wh/validation_log")
    assert(log.count() === 2L)
    val ids = log.select("validation_id").as[String].collect()
    assert(ids.forall(_.startsWith(rid)))
    assert(log.select("issue_type").as[String].collect().toSet === Set("null_check", "duplicate"))
    // append-only and id-deduped: same batch again adds nothing (fixed clock)
    r.writeValidationLog(rid, Seq(("AAPL", "null_check", "3 null values in close", 2.0)))
    assert(spark.read.parquet(s"$base/wh/validation_log").count() === 2L)
  }
}
