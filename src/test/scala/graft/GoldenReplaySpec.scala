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
