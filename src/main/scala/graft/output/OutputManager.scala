package graft.output

import java.nio.file.{Files, Path, Paths}
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.output.Json._

/** Wall-clock reads go through this so artifact names and timestamps are
  * deterministic under test / golden replay (SURVEY.md §4 determinism
  * requirements).
  */
trait Clock { def now(): Instant }
object SystemClock extends Clock { def now(): Instant = Instant.now() }
final class FixedClock(at: Instant) extends Clock { def now(): Instant = at }

/** Per-request output artifacts (SURVEY.md §2h K-1, K-7, K-8, K-9, K-11;
  * reference `src/output_manager.py`).
  *
  * The artifacts are driver-side by design: each is a per-request summary
  * (a result CSV, two small JSON reports) — at cluster scale the DATA
  * lives in the parquet warehouse; these files are the human-facing tail
  * of a request, so a coalesce(1) on an already-small frame is the right
  * plan, not a scalability concern.
  */
final class OutputManager(baseDir: String, clock: Clock = SystemClock) {

  Files.createDirectories(Paths.get(baseDir))

  private def nowStamp: String = Fmt.stamp(clock)
  private def nowIso: String = Fmt.iso(clock)

  /** Ticker-list filename component with the reference's md5-shortening
    * contract for long lists (`src/output_manager.py:44-52`).
    */
  def tickersFileComponent(tickers: Seq[String]): String = {
    val joined = tickers.sorted.mkString("-")
    if (joined.length <= 50) joined
    else s"${tickers.head}-and-${tickers.length - 1}more-${Fmt.md5Hex(joined).take(6)}"
  }

  /** K-1: timestamped single-file CSV:
    * `prices_{sorted tickers '-'}_{start}-{end}_{ts}.csv`, appending
    * `request_id` and `export_timestamp` columns
    * (reference `src/output_manager.py:26-67`). Returns the path, or None
    * for an empty frame (the reference warns and skips).
    */
  def createTimestampedCsv(
      df: DataFrame,
      tickers: Seq[String],
      startDate: String,
      endDate: String,
      requestId: String): Option[Path] = {
    if (df.isEmpty) return None
    val filename = s"prices_${tickersFileComponent(tickers)}_" +
      s"${startDate.replace("-", "")}-${endDate.replace("-", "")}_$nowStamp.csv"
    val out = df
      .withColumn("request_id", lit(requestId))
      .withColumn("export_timestamp", lit(nowIso))
    Some(writeSingleCsv(out, Paths.get(baseDir, filename)))
  }

  /** K-1 in byte-parity compat mode: reproduces the reference CSV
    * byte-for-byte (header `date,Ticker,...`, BOTH `ret` and `return`
    * materialized — the reference computes the same formula twice,
    * `src/pipeline.py:61,81` — doubles in pandas `repr` form, nulls as
    * empty fields). Same filename contract as [[createTimestampedCsv]].
    *
    * The float formatting goes through a scalar UDF ([[Fmt.pyFloat]]) —
    * acceptable here and only here because the export CSV is the small
    * human-facing tail of a request, never a 100 TB data path, and
    * shortest-round-trip-with-Python-format is not expressible with
    * built-in expressions.
    */
  def createReferenceCompatCsv(
      df: DataFrame,
      tickers: Seq[String],
      startDate: String,
      endDate: String,
      requestId: String): Option[Path] = {
    if (df.isEmpty) return None
    val withTicker = df.withColumnRenamed("ticker", "Ticker")
    val withUpdated =
      if (withTicker.columns.contains("updated_at")) withTicker
      else withTicker.withColumn("updated_at", lit(Fmt.isoUtcOffset(clock)))
    val withDup =
      if (withUpdated.columns.contains("return") || !withUpdated.columns.contains("ret"))
        withUpdated
      else withUpdated.withColumn("return", col("ret"))
    val withMeta = withDup
      .withColumn("request_id", lit(requestId))
      .withColumn("export_timestamp", lit(nowIso))
    // reference column order (header of the committed golden CSVs);
    // columns the caller's frame lacks are skipped, extras are dropped
    val order = Seq("date", "Ticker", "open", "high", "low", "close",
      "adj_close", "volume", "ret", "return", "ma20", "ma50", "vol20",
      "updated_at", "request_id", "export_timestamp")
    val present = order.filter(withMeta.columns.contains)
    // NaN maps to null: pandas to_csv writes NaN as an EMPTY field (same
    // as None), which is how Spark's CSV writer renders null — pyFloat's
    // "nan" would break byte parity. Infinities need no mapping: pandas
    // emits inf/-inf, exactly pyFloat's spelling (verified against
    // pandas to_csv on a multi-column frame).
    val pyFloatUdf = udf((d: java.lang.Double) =>
      Option(d).filterNot(x => x.isNaN)
        .map(x => Fmt.pyFloat(x.doubleValue)).orNull)
    val doubleCols = withMeta.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.DoubleType).map(_.name).toSet
    val formatted = present.foldLeft(withMeta.select(present.map(col): _*)) {
      (d, c) => if (doubleCols.contains(c)) d.withColumn(c, pyFloatUdf(col(c))) else d
    }
    val filename = s"prices_${tickersFileComponent(tickers)}_" +
      s"${startDate.replace("-", "")}-${endDate.replace("-", "")}_$nowStamp.csv"
    Some(writeSingleCsv(formatted, Paths.get(baseDir, filename)))
  }

  /** K-9: anomaly/discrepancy CSV (reference `src/validation.py:490-518`);
    * skipped when there are no discrepancies.
    */
  def saveAnomalyReport(discrepancies: DataFrame, filename: String): Option[Path] = {
    if (discrepancies.isEmpty) return None
    Some(writeSingleCsv(discrepancies, Paths.get(baseDir, filename)))
  }

  /** Single-file CSV contract: write via a staging dir, move the one part
    * file to the exact target name.
    */
  private def writeSingleCsv(df: DataFrame, target: Path): Path = {
    val stage = target.toString + ".stage"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(stage)
    // Files.list/walk streams hold a directory handle until closed
    val part = scala.util.Using.resource(Files.list(Paths.get(stage)))(
      _.iterator().asScala
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(sys.error(s"no part file written under $stage")))
    Files.deleteIfExists(target)
    Files.move(part, target)
    // clear the staging dir (part + _SUCCESS + crc files)
    scala.util.Using.resource(Files.walk(Paths.get(stage)))(
      _.iterator().asScala.toSeq).reverse
      .foreach(Files.deleteIfExists(_))
    target
  }

  /** K-7: comprehensive validation report
    * (reference `src/output_manager.py:69-133`): metadata, request
    * details, basic + cross + macro validation, quality scores (A-10),
    * recommendations (§2i).
    */
  def createValidationReport(
      requestId: String,
      basic: OutputManager.BasicValidation,
      cross: Option[OutputManager.CrossValidationSummary],
      macroSummary: Option[OutputManager.MacroValidationSummary],
      tickers: Seq[String],
      startDate: String,
      endDate: String): Path = {
    val ts = nowIso
    val basicScore = Scoring.basicScore(basic.checks)
    val reliability = cross.flatMap(c => Scoring.reliabilityScore(c.discrepancies, c.comparisons))
    val completeness = Scoring.macroCompleteness(macroSummary.toSeq.flatMap(_.seriesProfiles.map(_._2)))
    val overall = Scoring.overallScore(basicScore, reliability)
    val recs = Scoring.recommendations(
      basic.checks,
      cross.map(c => Scoring.Performed(c.discrepancies)).getOrElse(Scoring.NotPerformed),
      macroFetched = macroSummary.isDefined)

    val report = JObj(Seq(
      "report_metadata" -> JObj(Seq(
        "request_id" -> JStr(requestId),
        "report_type" -> JStr("comprehensive_validation"),
        "generated_at" -> JStr(ts),
        "report_version" -> JStr("1.0"))),
      "request_details" -> JObj(Seq(
        "tickers" -> JArr(tickers.map(JStr(_))),
        "date_range" -> JObj(Seq(
          "start" -> (JStr(startDate): JValue),
          "end" -> (JStr(endDate): JValue))),
        "execution_timestamp" -> JStr(ts))),
      "ticker_validation" -> JObj(Seq(
        "basic_checks" -> basic.toJson,
        "cross_validation" -> cross.map(_.toJson: JValue).getOrElse(JObj(Seq(
          "status" -> (JStr("not_performed"): JValue),
          "reason" -> (JStr("No Alpha Vantage API key provided or validation not enabled"): JValue)))))),
      "macro_validation" -> macroSummary.map(_.toJson: JValue).getOrElse(JObj(Seq(
        "status" -> (JStr("not_fetched"): JValue),
        "reason" -> (JStr("Macro data not requested or FRED API key not provided"): JValue)))),
      "quality_assessment" -> JObj(Seq(
        "basic_data_quality" -> JNum(basicScore),
        "cross_validation_reliability" -> reliability.map(JNum(_): JValue).getOrElse(JStr("N/A")),
        "macro_data_completeness" -> completeness.map(JNum(_): JValue).getOrElse(JStr("N/A")),
        "overall_score" -> JNum(overall))),
      "recommendations" -> JArr(recs.map(JStr(_)))))

    val path = Paths.get(baseDir, s"validation_report_${requestId}_$nowStamp.json")
    Files.writeString(path, report.render)
    path
  }

  /** K-8: execution summary log (reference `src/output_manager.py:254-283`). */
  def createSummaryLog(
      requestId: String,
      executionSummary: Seq[(String, JValue)],
      filePaths: Map[String, String]): Path = {
    val log = JObj(Seq(
      "request_id" -> JStr(requestId),
      "execution_summary" -> JObj(executionSummary),
      "generated_files" -> JObj(Seq(
        "csv_file" -> JStr(filePaths.getOrElse("csv", "None")),
        "validation_report" -> JStr(filePaths.getOrElse("validation", "None")),
        "log_file" -> JStr(filePaths.getOrElse("log", "None")))),
      "log_created_at" -> JStr(nowIso)))
    val path = Paths.get(baseDir, s"execution_log_${requestId}_$nowStamp.json")
    Files.writeString(path, log.render)
    path
  }

  /** K-11: output-dir listing — counts and latest-by-mtime per artifact
    * kind (reference `src/output_manager.py:285-302`).
    */
  def listOutputFiles(): Map[String, (Int, Option[String])] = {
    def glob(pattern: String): Seq[Path] = {
      val m = java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$pattern")
      scala.util.Using.resource(Files.list(Paths.get(baseDir)))(
        _.iterator().asScala.toSeq)
        .filter(p => m.matches(p.getFileName))
    }
    Map(
      "csv_files" -> glob("prices_*.csv"),
      "validation_reports" -> glob("validation_report_*.json"),
      "execution_logs" -> glob("execution_log_*.json")
    ).map { case (k, files) =>
      k -> (files.size,
        files.sortBy(p => Files.getLastModifiedTime(p).toMillis)
          .lastOption.map(_.toString))
    }
  }
}

object OutputManager {
  /** The basic-checks report tree (reference `validate`,
    * `src/pipeline.py:44-76`): per-column null counts, duplicate rows,
    * violation counts, extreme moves, per-entity missing business days.
    */
  final case class BasicValidation(
      nullCounts: Seq[(String, Long)],
      duplicateRows: Long,
      negClose: Long,
      negVolume: Long,
      extremeMoves: Long,
      approxMissingBdays: Seq[(String, Long)]) {
    def toJson: JObj = JObj(Seq(
      "null_counts" -> JObj(nullCounts.map { case (k, v) => k -> (JInt(v): JValue) }),
      "duplicate_rows" -> JInt(duplicateRows),
      "neg_close" -> JInt(negClose),
      "neg_volume" -> JInt(negVolume),
      "extreme_moves" -> JInt(extremeMoves),
      "approx_missing_bdays" -> JObj(approxMissingBdays.map { case (k, v) => k -> (JInt(v): JValue) })))
    def checks: Scoring.BasicChecks = Scoring.BasicChecks(
      duplicates = duplicateRows, negativeClose = negClose,
      negativeVolume = negVolume, extremeMoves = extremeMoves,
      nulls = nullCounts.map(_._2).sum)
  }

  final case class CrossValidationSummary(
      comparisons: Long,
      discrepancies: Long,
      perTicker: Seq[(String, Long, Long)]) { // (ticker, comparisons, discrepancies)
    def toJson: JObj = JObj(Seq(
      "summary" -> JObj(Seq(
        "comparison_records" -> JInt(comparisons),
        "total_discrepancies" -> JInt(discrepancies))),
      "ticker_details" -> JObj(perTicker.map { case (t, c, d) =>
        t -> (JObj(Seq("comparisons" -> (JInt(c): JValue),
          "discrepancies" -> (JInt(d): JValue))): JValue)
      })))
  }

  final case class MacroValidationSummary(
      totalRecords: Long,
      seriesProfiles: Seq[(String, Long, Long)]) { // (series_id, record_count, null_values)
    def toJson: JObj = JObj(Seq(
      "total_records" -> JInt(totalRecords),
      "series_summary" -> JObj(seriesProfiles.map { case (s, n, nulls) =>
        s -> (JObj(Seq("record_count" -> (JInt(n): JValue),
          "null_values" -> (JInt(nulls): JValue))): JValue)
      })))
  }
}
