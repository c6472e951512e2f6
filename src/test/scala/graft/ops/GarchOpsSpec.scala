package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the exact integer recursion of [[GarchOps]] against a
  * hand-computed replay (the oracle covers w40 end-to-end; this spec
  * isolates the kernel so a refactor can't silently change the
  * arithmetic) and the multi-entity / partition-boundary behavior.
  */
class GarchOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def day(i: Int) = java.sql.Date.valueOf(f"2024-01-${i}%02d")

  test("picounit recursion matches the hand replay; seed is the mean r2") {
    // ticker 7: r2 picounits 4, 16, 36 -> v0 = (2*56+3) div 6 = 19
    // v2 = 2000000 + (2*4+10)/20 + (170*19+100)/200 = 2000000 + 0 + 16
    // v3 = 2000000 + (2*16+10)/20 + (170*2000016+100)/200
    //    = 2000000 + 2 + 1700014 = 3700016
    val base = Seq(
      (7L, day(1), 4L), (7L, day(2), 16L), (7L, day(3), 36L))
      .toDF("ticker", "date", "_r2p")
    val out = GarchOps.garchVariancePicounits(base)
      .orderBy("date").as[(Long, java.sql.Date, Long)].collect().toList
    assert(out.map(_._3) === List(19L, 2000016L, 3700016L))
  }

  test("entities are independent across partition boundaries") {
    // many tickers, tiny partitions: each entity's recursion must see
    // only its own rows after the repartition+sort
    val rows = for (t <- 1L to 9L; d <- 1 to 5)
      yield (t, day(d), t * 100L + d)
    val out = GarchOps.garchVariancePicounits(
      rows.toDF("ticker", "date", "_r2p").repartition(7))
    // one output row per input row, and per-ticker first value equals
    // that ticker's own mean-r2 seed
    assert(out.count() === rows.size)
    val firsts = out
      .groupBy("ticker").agg(min_by(col("_v"), col("date")).as("v0"))
      .as[(Long, Long)].collect().toMap
    for (t <- 1L to 9L) {
      val r2s = rows.filter(_._1 == t).map(_._3)
      val expected = (2L * r2s.sum + r2s.size) / (2L * r2s.size)
      assert(firsts(t) === expected, s"ticker $t seed")
    }
  }
}
