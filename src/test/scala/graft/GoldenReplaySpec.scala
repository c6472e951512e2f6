package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FeatureOps
import graft.output.OutputManager
import java.time.Instant

/** Golden end-to-end replay (SURVEY.md §5): feed the RAW columns of the
  * reference's committed output CSVs back through the feature stage and
  * require the derived columns (`ret`) to match the reference values to
  * full double precision, plus the artifact filename contracts to match
  * the committed filenames exactly.
  *
  * Reference fixtures: `/root/reference/outputs/prices_*.csv` (two real
  * runs committed in-repo; request ids 20250818_210058_AAPL_MSFT_… and
  * 20250818_210140_GOOGL_…).
  */
class GoldenReplaySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val goldenDir = "/root/reference/outputs"

  private def loadGolden(name: String) =
    spark.read.option("header", "true").csv(s"$goldenDir/$name")
      .select(
        to_date(col("date")).as("date"),
        col("Ticker").as("ticker"),
        col("open").cast("double").as("open"),
        col("close").cast("double").as("close"),
        col("volume").cast("long").as("volume"),
        col("ret").cast("double").as("golden_ret"),
        col("return").cast("double").as("golden_return"),
        col("ma20").cast("double").as("golden_ma20"))

  test("replay AAPL-MSFT request: ret matches the reference to full precision") {
    val golden = loadGolden("prices_AAPL-MSFT_20240101-20240110_20250818_210058.csv")
    val replayed = FeatureOps.transform(
      golden.select("ticker", "date", "open", "close", "volume"))
    val joined = replayed.join(golden, Seq("ticker", "date"))
      .select("ticker", "date", "ret", "golden_ret", "golden_return", "ma20", "golden_ma20")
      .collect()
    assert(joined.length === 12) // 2 tickers × 6 trading days
    joined.foreach { r =>
      val ours = Option(r.getAs[java.lang.Double]("ret")).map(_.doubleValue)
      val ref = Option(r.getAs[java.lang.Double]("golden_ret")).map(_.doubleValue)
      val refDup = Option(r.getAs[java.lang.Double]("golden_return")).map(_.doubleValue)
      assert(ours === ref, s"ret mismatch at ${r.get(0)},${r.get(1)}")
      assert(ref === refDup) // the reference's duplicate ret/return quirk
      // 6-day window → ma20 must be null on every row, both sides
      assert(r.isNullAt(r.fieldIndex("ma20")) && r.isNullAt(r.fieldIndex("golden_ma20")))
    }
  }

  test("replay GOOGL request: single-ticker run matches") {
    val golden = loadGolden("prices_GOOGL_20240115-20240120_20250818_210141.csv")
    val replayed = FeatureOps.transform(
      golden.select("ticker", "date", "open", "close", "volume"))
    val joined = replayed.join(golden, Seq("ticker", "date")).collect()
    assert(joined.length === 4)
    joined.foreach { r =>
      val ours = Option(r.getAs[java.lang.Double]("ret")).map(_.doubleValue)
      val ref = Option(r.getAs[java.lang.Double]("golden_ret")).map(_.doubleValue)
      assert(ours === ref)
    }
  }

  test("compat CSV reproduces the committed golden file byte-for-byte (timestamps normalized)") {
    val goldenName = "prices_AAPL-MSFT_20240101-20240110_20250818_210058.csv"
    val golden = spark.read.option("header", "true").csv(s"$goldenDir/$goldenName")
      .select(
        to_date(col("date")).as("date"),
        col("Ticker").as("ticker"),
        col("open").cast("double").as("open"),
        col("high").cast("double").as("high"),
        col("low").cast("double").as("low"),
        col("close").cast("double").as("close"),
        col("adj_close").cast("double").as("adj_close"),
        col("volume").cast("long").as("volume"))
    val replayed = FeatureOps.transform(golden).orderBy("ticker", "date")
    val outDir = java.nio.file.Files.createTempDirectory("golden_csv").toString
    val m = new OutputManager(outDir,
      new graft.output.FixedClock(Instant.parse("2025-08-18T21:00:58Z")))
    val p = m.createReferenceCompatCsv(replayed, Seq("MSFT", "AAPL"),
      "2024-01-01", "2024-01-10", "20250818_210058_AAPL_MSFT_20240101_20240110").get
    assert(p.getFileName.toString === goldenName)
    // full-file diff normalizing ONLY the two wall-clock fields
    // (updated_at idx 13, export_timestamp idx 15)
    def normalized(path: String): Seq[String] = {
      val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      import scala.jdk.CollectionConverters._
      lines.asScala.toSeq.zipWithIndex.map {
        case (header, 0) => header
        case (line, _) =>
          val f = line.split(",", -1)
          f(13) = "<ts>"; f(15) = "<ts>"
          f.mkString(",")
      }
    }
    val ours = normalized(p.toString)
    val ref = normalized(s"$goldenDir/$goldenName")
    assert(ours.length === ref.length)
    ours.zip(ref).zipWithIndex.foreach { case ((o, r), i) =>
      assert(o === r, s"line ${i + 1} differs")
    }
  }

  test("pyFloat matches Python repr formatting rules") {
    import graft.output.Fmt.pyFloat
    assert(pyFloat(185.63999938964844) === "185.63999938964844")
    assert(pyFloat(-0.0007279882903079571) === "-0.0007279882903079571")
    assert(pyFloat(184.25) === "184.25")
    assert(pyFloat(185.0) === "185.0")
    assert(pyFloat(0.0001) === "0.0001")     // exp -4: still positional
    assert(pyFloat(0.00001) === "1e-05")     // exp -5: scientific
    assert(pyFloat(1.5e20) === "1.5e+20")
    assert(pyFloat(1e16) === "1e+16")
    assert(pyFloat(9999999999999998.0) === "9999999999999998.0")
    assert(pyFloat(12345678.0) === "12345678.0") // Java would print 1.2345678E7
    assert(pyFloat(0.0) === "0.0")
    assert(pyFloat(-0.0) === "-0.0")
  }

  test("filename contracts reproduce both committed artifact names") {
    val m = new OutputManager(
      java.nio.file.Files.createTempDirectory("golden").toString,
      new graft.output.FixedClock(Instant.parse("2025-08-18T21:00:58Z")))
    assert(m.tickersFileComponent(Seq("MSFT", "AAPL")) === "AAPL-MSFT")
    val df = Seq(("AAPL", 1.0)).toDF("ticker", "close")
    val p = m.createTimestampedCsv(df, Seq("MSFT", "AAPL"), "2024-01-01", "2024-01-10", "x").get
    assert(p.getFileName.toString === "prices_AAPL-MSFT_20240101-20240110_20250818_210058.csv")
  }

  test("request ids reproduce both committed request ids") {
    import graft.runner.{Request, RequestRunner}
    val r1 = new RequestRunner(spark, "/tmp/g1", "/tmp/g1o",
      new graft.output.FixedClock(Instant.parse("2025-08-18T21:00:58Z")))
    assert(r1.generateRequestId(Request(Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-10"))
      === "20250818_210058_AAPL_MSFT_20240101_20240110")
    val r2 = new RequestRunner(spark, "/tmp/g2", "/tmp/g2o",
      new graft.output.FixedClock(Instant.parse("2025-08-18T21:01:40Z")))
    assert(r2.generateRequestId(Request(Seq("GOOGL"), "2024-01-15", "2024-01-20"))
      === "20250818_210140_GOOGL_20240115_20240120")
  }
}
