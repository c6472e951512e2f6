package graft.runner

import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{CrossValidationOps, FeatureOps, MacroOps, ValidationOps}
import graft.output.{Clock, Json, OutputManager, SystemClock}
import graft.warehouse.Warehouse

/** One pipeline request: the reference's argparse surface
  * (`/root/reference/src/pipeline.py:110-130`) as a case class.
  */
final case class Request(
    tickers: Seq[String],
    startDate: String,
    endDate: String,
    enableValidation: Boolean = false,
    tolerancePct: Double = 0.5,
    fetchMacro: Boolean = false,
    macroCategories: Seq[String] = Nil)

final case class RunResult(
    requestId: String,
    status: String,
    marketRecords: Long,
    macroRecords: Long,
    discrepancies: Long,
    csvPath: Option[String],
    reportPath: String,
    logPath: String)

/** The §3 request lifecycle (reference `main`,
  * `/root/reference/src/pipeline.py:109-311`): register → ingest →
  * validate → transform → cross-validate → macro → store → emit, with
  * the failure path (status → `failed`, re-raise,
  * `pipeline.py:302-311`).
  *
  * Scale shape: the whole request is ONE lazy plan per stage — all
  * entities validate in one fused agg, reconcile in one join, and land in
  * the warehouse through one anti-join append; the reference's per-ticker
  * HTTP loop and per-row SQLite probes have no equivalent here.
  */
final class RequestRunner(
    spark: SparkSession,
    warehouseDir: String,
    outputDir: String,
    clock: Clock = SystemClock,
    tracker: Option[graft.sources.ErrorTracker] = None) {

  private val wh = new Warehouse(spark, warehouseDir)
  private val out = new OutputManager(outputDir, clock)

  private def trackedErrors: Long = tracker.fold(0L)(_.errorCount.toLong)

  /** Tracker errors already attributed to a finished request. One tracker
    * serves the whole pipeline (fetch happens BEFORE run(), so a
    * request's connector errors land in the tracker pre-run); request_log
    * rows must carry the PER-REQUEST count, so each run() logs the delta
    * since the previous run() finished and then banks the new watermark.
    */
  private var errorsAccounted: Long = 0L

  /** Request-id contract (reference `src/database.py:332-343`):
    * `{yyyyMMdd_HHmmss}_{sorted tickers '_'}_{start}_{end}` with
    * md5-shortening of long ticker lists.
    */
  def generateRequestId(req: Request): String = {
    val ts = graft.output.Fmt.stamp(clock)
    val joined = req.tickers.sorted.mkString("_")
    val tickersStr =
      if (joined.length <= 50) joined
      else s"${req.tickers.head}_and_${req.tickers.length - 1}_more_${graft.output.Fmt.md5Hex(joined).take(8)}"
    s"${ts}_${tickersStr}_${req.startDate.replace("-", "")}_${req.endDate.replace("-", "")}"
  }

  private def nowIso: String = graft.output.Fmt.iso(clock)

  /** K-5 insert/update: the request_log row lives in a parquet table
    * keyed by request_id; status transitions are last-writer-wins
    * upserts (reference `src/database.py:138-175`).
    */
  def writeRequestLog(
      requestId: String, req: Request, status: String,
      marketRecords: Long = 0, macroRecords: Long = 0,
      validationPerformed: Boolean = false, errorCount: Long = 0): Unit = {
    import spark.implicits._
    val row = Seq((
      requestId, nowIso, req.tickers.mkString(","), req.startDate, req.endDate,
      status, marketRecords, macroRecords, validationPerformed, errorCount))
      .toDF("request_id", "request_timestamp", "tickers", "start_date", "end_date",
        "status", "total_records_fetched", "macro_records_fetched",
        "validation_performed", "error_count")
    wh.upsert("request_log", row, Seq("request_id"))
  }

  /** K-6: validation-log append (reference `src/database.py:262-281`). */
  def writeValidationLog(
      requestId: String,
      issues: Seq[(String, String, String, Double)]): Unit = { // (ticker, issueType, description, severity)
    if (issues.isEmpty) return
    import spark.implicits._
    val ts = DateTimeFormatter.ofPattern("HHmmss").withZone(ZoneOffset.UTC).format(clock.now())
    val rows = issues.zipWithIndex.map { case ((ticker, issueType, desc, sev), i) =>
      (s"${requestId}_${issueType}_${ts}_$i", requestId, ticker, nowIso, issueType, desc, sev)
    }.toDF("validation_id", "request_id", "ticker", "validation_date",
      "issue_type", "description", "severity_score")
    wh.dedupAppend("validation_log", rows, Seq("validation_id"))
    ()
  }

  /** Basic validation (reference `validate`, `src/pipeline.py:44-76`):
    * report + cleaned (keep-last deduped) frame. One fused agg for the
    * scalar checks; dedup is a window, not a pandas drop.
    */
  def validateBasic(raw: DataFrame): (DataFrame, OutputManager.BasicValidation) = {
    val withSeq = raw.withColumn("_seq", monotonically_increasing_id())
    val nulls = ValidationOps.nullCounts(raw)
    val dupRows = ValidationOps.duplicateRowCount(raw, Seq("ticker", "date"))
    // persist: the _seq assignment is nondeterministic across plan
    // re-evaluations (shuffle fetch order), so pin ONE dedup outcome for
    // every downstream action (report aggregates, warehouse, CSV); the
    // runner unpersists when the request finishes.
    val deduped = FeatureOps.keepLast(withSeq, Seq("ticker", "date"), "_seq")
      .drop("_seq").persist()
    val withRet = deduped.withColumn("ret", FeatureOps.pctChange("ticker", "date", "close"))
    val stats = ValidationOps.basicStats(withRet)
    val extremes = ValidationOps.extremeMoveCount(withRet, "ret", 6.0)
    val missing = ValidationOps.missingBusinessDays(deduped, "ticker", "date")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val report = OutputManager.BasicValidation(
      nullCounts = raw.columns.map(c => c -> nulls(c)).toSeq,
      duplicateRows = dupRows,
      negClose = stats.nonPositiveClose,
      negVolume = stats.negativeVolume,
      extremeMoves = extremes,
      approxMissingBdays = missing)
    (deduped, report)
  }

  /** Run the full lifecycle for one request. `primary` is the already-
    * fetched source frame with columns (ticker, date, open?, …, close,
    * volume); `secondary` the optional cross-validation source;
    * `macroData` the optional tidy macro frame (series_id, date, value).
    */
  def run(
      req: Request,
      primary: DataFrame,
      secondary: Option[DataFrame] = None,
      macroData: Option[DataFrame] = None): RunResult = {
    val requestId = generateRequestId(req)
    // per-request error count (the execution log's error summary stays
    // tracker-lifetime cumulative, matching the reference's logger-scoped
    // get_error_summary)
    def requestErrors: Long = trackedErrors - errorsAccounted
    writeRequestLog(requestId, req, "started")
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      // 1-2. validate + clean + features (W-1..W-5)
      val (clean, basicReport) = validateBasic(primary)
      pinned += clean
      val features = FeatureOps.transform(clean)

      // 3. optional cross-validation (J-1, P-6..P-8, J-2)
      val cross = secondary.filter(_ => req.enableValidation).map { sec =>
        val cmp = CrossValidationOps.compareSources(clean, sec, "ticker", "date", req.tolerancePct)
        cmp.cache()
        pinned += cmp
        val summary = CrossValidationOps.reconciliationSummary(cmp)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
        (cmp, summary)
      }
      val enriched = cross match {
        case Some((cmp, _)) =>
          CrossValidationOps.enrichWithFlags(features,
            cmp.select(col("ticker"), col("date"), col("discrepancy_flag")), "ticker", "date")
        case None => features.withColumn("discrepancy_flag", lit(false))
      }

      // 4. optional macro profile (A-6)
      val macroProfile = macroData.map { m =>
        MacroOps.seriesProfile(m).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
      }

      // 5. store (K-2/K-3 dedup append, K-4 upsert, K-5 status).
      // Both warehouse tables are hive-partitioned on their entity key, so
      // the append's anti-join scans ONLY the partitions the request
      // touches — at 100 TB a one-ticker request never rescans the table.
      val withRequest = enriched.withColumn("request_id", lit(requestId))
        .withColumn("updated_at", lit(nowIso))
      val marketRecords = wh.dedupAppend("market_data", withRequest,
        Seq("ticker", "date"), Seq("ticker"))
      val macroRecords = macroData.fold(0L) { m =>
        // series_name/category enrichment so macro_data matches the
        // reference's 5-column DDL; enrichWithCatalog is idempotent (adds
        // only missing columns), so every batch lands on the same schema
        val enrichedMacro = MacroOps.enrichWithCatalog(m)
        wh.dedupAppend("macro_data", enrichedMacro.withColumn("request_id", lit(requestId)),
          Seq("series_id", "date"), Seq("series_id"))
      }
      val discrepancyCount = cross.fold(0L) { case (cmp, _) =>
        val disc = CrossValidationOps.discrepancies(cmp, req.tolerancePct)
          .withColumn("validation_id",
            concat(lit(s"${requestId}_cross_"), col("ticker"), lit("_"),
              date_format(col("date"), "yyyyMMdd")))
          .withColumn("request_id", lit(requestId))
        disc.cache()
        pinned += disc
        val n = disc.count()
        if (n > 0) {
          // partition-scoped: a request rewrites only the tickers it
          // touched, not the whole cross_validation history. ticker joins
          // the key soundly — validation_id embeds it, so the composite
          // key collides exactly when validation_id does.
          wh.upsert("cross_validation", disc, Seq("validation_id", "ticker"),
            Seq("ticker"))
          // K-9: anomaly CSV alongside the other artifacts (reference
          // `save_anomaly_report`, src/validation.py:490-518)
          out.saveAnomalyReport(
            disc.select("ticker", "date", "yahoo_close", "alpha_close",
              "price_diff", "diff_pct").orderBy("ticker", "date"),
            s"anomalies_$requestId.csv")
        }
        n
      }

      // 6. emit artifacts (K-1, K-7, K-8, K-9)
      val csvPath = out.createTimestampedCsv(
        enriched.orderBy("ticker", "date"), req.tickers, req.startDate, req.endDate, requestId)
      val crossSummary = cross.map { case (cmp, perTicker) =>
        OutputManager.CrossValidationSummary(
          comparisons = perTicker.map(_._2).sum,
          discrepancies = discrepancyCount,
          perTicker = perTicker)
      }
      val macroSummary = macroProfile.map { profiles =>
        OutputManager.MacroValidationSummary(profiles.map(_._2).sum, profiles)
      }
      val reportPath = out.createValidationReport(
        requestId, basicReport, crossSummary, macroSummary,
        req.tickers, req.startDate, req.endDate)
      // error summary from the connector tracker (reference
      // `get_error_summary`, src/logger.py:196-223): recovered retries
      // still count, so flaky feeds are visible in the execution log
      val errorStats: Seq[(String, Json.JValue)] = tracker.toSeq.flatMap { t =>
        Seq(
          "error_count" -> Json.JInt(t.errorCount.toLong),
          "errors_by_operation" -> Json.JObj(t.byOperation.toSeq.sortBy(_._1)
            .map { case (k, v) => k -> (Json.JInt(v.toLong): Json.JValue) }),
          "errors_by_type" -> Json.JObj(t.byType.toSeq.sortBy(_._1)
            .map { case (k, v) => k -> (Json.JInt(v.toLong): Json.JValue) }))
      }
      val logPath = out.createSummaryLog(
        requestId,
        Seq(
          "total_market_records" -> Json.JInt(marketRecords),
          "total_macro_records" -> Json.JInt(macroRecords),
          "cross_validation_performed" -> Json.JBool(cross.isDefined),
          "discrepancies_found" -> Json.JInt(discrepancyCount)) ++ errorStats,
        Map("csv" -> csvPath.map(_.toString).getOrElse("None"),
          "validation" -> reportPath.toString))

      writeRequestLog(requestId, req, "completed", marketRecords, macroRecords,
        validationPerformed = cross.isDefined, errorCount = requestErrors)

      RunResult(requestId, "completed", marketRecords, macroRecords,
        discrepancyCount, csvPath.map(_.toString), reportPath.toString, logPath.toString)
    } catch {
      case e: Throwable =>
        // the fatal error itself counts on top of any tracked connector
        // failures (reference marks the request failed and logs the error)
        writeRequestLog(requestId, req, "failed", errorCount = requestErrors + 1)
        throw e
    } finally {
      errorsAccounted = trackedErrors
      pinned.foreach(_.unpersist())
    }
  }
}
