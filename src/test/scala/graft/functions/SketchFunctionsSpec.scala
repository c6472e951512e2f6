package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the mergeable-pre-aggregation contract of the HLL sketch table:
  * rolling up stored fine-grain sketches must equal sketching the span
  * directly (lossless same-lgK union), and estimates must sit within
  * sketch accuracy of exact distinct counts.
  */
class SketchFunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val events = spark.read
    .parquet("/root/testdata/sf0.001/events.parquet")
    .withColumn("day", to_date(col("ts")))

  test("hllRollup of daily sketches equals the direct coarse sketch") {
    val daily = SketchFunctions.hllSketchTable(events,
      Seq("event_type", "day"), "user_id")
    val rolled = SketchFunctions.hllRollup(daily, Seq("event_type"))
      .orderBy("event_type")
      .select("event_type", "approx_distinct", "n_rows")
      .as[(String, Double, Long)].collect().toList
    val direct = SketchFunctions.hllSketchTable(events, Seq("event_type"), "user_id")
      .select(col("event_type"), hll_sketch_estimate(col("hll")), col("n_rows"))
      .orderBy("event_type")
      .as[(String, Double, Long)].collect().toList
    // merge ≡ direct: same lgK union is lossless, estimate IDENTICAL —
    // the raw data never needs rescanning for a coarser window
    assert(rolled === direct)
  }

  test("hll estimates sit within sketch accuracy of exact distincts") {
    val daily = SketchFunctions.hllSketchTable(events,
      Seq("event_type", "day"), "user_id")
    val est = SketchFunctions.hllRollup(daily, Seq("event_type"))
      .select("event_type", "approx_distinct")
      .as[(String, Double)].collect().toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").cast("double").as("d"))
      .as[(String, Double)].collect().toMap
    // lgK=12 → rse ≈ 1.6 %; at these cardinalities the sketch runs in
    // exact sparse mode, but assert the published 3σ envelope anyway
    for ((k, ex) <- exact)
      assert(math.abs(est(k) - ex) <= math.max(1.0, 0.05 * ex),
        s"$k: est ${est(k)} vs exact $ex")
    // row accounting survives the rollup
    val n = SketchFunctions.hllRollup(daily, Seq("event_type"))
      .agg(sum("n_rows")).as[Long].head()
    assert(n === events.filter(col("user_id").isNotNull).count())
  }

  test("hllRollup refuses a cross-geometry union (strict lgK merge)") {
    val a = SketchFunctions.hllSketchTable(events.limit(100), Seq("event_type"),
      "user_id", lgK = 12)
    val b = SketchFunctions.hllSketchTable(events.limit(100), Seq("event_type"),
      "user_id", lgK = 14)
    val mixed = a.unionByName(b)
    val e = intercept[Exception] {
      SketchFunctions.hllRollup(mixed, Seq("event_type")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("lgconfigk")
      || e.getMessage.toLowerCase.contains("lgk")
      || e.getMessage.toLowerCase.contains("sketch"), e.getMessage)
  }
}
