package graft.output

import java.nio.file.{Files, Paths}
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class OutputManagerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val clock = new FixedClock(Instant.parse("2025-08-18T21:00:58Z"))
  private def mgr() = new OutputManager(
    Files.createTempDirectory("graft_out").toString, clock)

  test("csv filename contract: sorted tickers, cleaned dates, timestamp") {
    val m = mgr()
    val df = Seq(("AAPL", 1.0)).toDF("ticker", "close")
    val p = m.createTimestampedCsv(df, Seq("MSFT", "AAPL"), "2024-01-01", "2024-01-10", "req1").get
    assert(p.getFileName.toString === "prices_AAPL-MSFT_20240101-20240110_20250818_210058.csv")
    val lines = Files.readAllLines(p)
    assert(lines.get(0) === "ticker,close,request_id,export_timestamp")
    assert(lines.get(1).startsWith("AAPL,1.0,req1,2025-08-18T21:00:58"))
  }

  test("csv: empty frame → None (reference warns and skips)") {
    val m = mgr()
    assert(m.createTimestampedCsv(Seq.empty[(String, Double)].toDF("t", "c"),
      Seq("A"), "2024-01-01", "2024-01-02", "r") === None)
  }

  test("long ticker lists md5-shorten to first-and-N-more-hash") {
    val m = mgr()
    val many = (1 to 30).map(i => f"TK$i%02d")
    val comp = m.tickersFileComponent(many)
    assert(comp.startsWith("TK01-and-29more-"))
    assert(comp.length <= 50)
  }

  test("json renderer: ordered keys, escapes, python-style floats") {
    import Json._
    val j = JObj(Seq(
      "b_first" -> JStr("line\n\"q\""),
      "a_second" -> JNum(92.0),
      "frac" -> JNum(87.5),
      "n" -> JInt(3),
      "flag" -> JBool(true),
      "arr" -> JArr(Seq(JInt(1), JNull))))
    val s = j.render
    assert(s.indexOf("b_first") < s.indexOf("a_second")) // insertion order kept
    assert(s.contains("\"line\\n\\\"q\\\"\""))
    assert(s.contains("92.0")) // whole float renders with .0 like python
    assert(s.contains("87.5"))
  }

  test("compat csv renders NaN doubles as empty fields like pandas (null parity)") {
    val m = mgr()
    // pandas to_csv writes NaN exactly like None: an empty field (pinned
    // against `pd.DataFrame(...).to_csv()` on a multi-column frame);
    // pyFloat's "nan" spelling must not leak into the compat file
    val df = Seq(
      ("AAPL", "2024-01-02", 1.5),
      ("AAPL", "2024-01-03", Double.NaN),
      ("AAPL", "2024-01-04", Double.PositiveInfinity))
      .toDF("ticker", "date", "close")
    val p = m.createReferenceCompatCsv(df, Seq("AAPL"),
      "2024-01-01", "2024-01-10", "req_nan").get
    val lines = Files.readAllLines(p)
    assert(lines.get(0).startsWith("date,Ticker,close"))
    val rows = (1 to 3).map(i => lines.get(i).split(",", -1))
    assert(rows(0)(2) === "1.5")
    assert(rows(1)(2) === "", s"NaN must serialize empty, got '${rows(1)(2)}'")
    assert(rows(2)(2) === "inf") // pandas spells infinities inf/-inf
  }

  test("anomaly report skips empty, writes single csv otherwise") {
    val m = mgr()
    assert(m.saveAnomalyReport(Seq.empty[(String, Double)].toDF("t", "d"), "anom.csv") === None)
    val p = m.saveAnomalyReport(Seq(("AAPL", 5.0)).toDF("ticker", "diff_pct"), "anom.csv").get
    assert(Files.readAllLines(p).get(0) === "ticker,diff_pct")
  }

  test("listOutputFiles counts artifacts by kind") {
    val m = mgr()
    val df = Seq(("AAPL", 1.0)).toDF("ticker", "close")
    m.createTimestampedCsv(df, Seq("AAPL"), "2024-01-01", "2024-01-02", "r1")
    val listing = m.listOutputFiles()
    assert(listing("csv_files")._1 === 1)
    assert(listing("validation_reports")._1 === 0)
    assert(listing("csv_files")._2.get.endsWith(".csv"))
  }

  test("fred catalog: 22 series, 8 categories, category resolution") {
    import graft.sources.FredCatalog
    assert(FredCatalog.series.size === 22)
    assert(FredCatalog.categories.size === 8)
    assert(FredCatalog.resolve(Seq("rates")).toSet
      === Set("FEDFUNDS", "GS10", "GS2", "GS3M"))
    assert(FredCatalog.resolve(Nil).size === 22)
  }
}
