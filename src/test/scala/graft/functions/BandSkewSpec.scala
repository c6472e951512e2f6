package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins [[SimilarityFunctions.hammingTopKBlocked]]'s hub-band-key skew
  * defense, which the kernel's scaladoc delegates to AQE skew-join:
  * under a DEGENERATE corpus (half the vectors share one sign pattern,
  * so every band of theirs collides on one hot key — the all-equal
  * analogue of the all-zeros band a sparse-positive embedding family
  * produces), the runtime must actually SPLIT the oversized band
  * bucket, not just be trusted to. The spec plants the degenerate
  * corpus, scales the AQE skew thresholds down to what this data size
  * makes an "oversized" partition (at production defaults the same
  * physics trips at 256 MB per bucket), executes the kernel, and
  * asserts the band equi-join in the FINAL adaptive plan carries the
  * skew-split markers. Results stay exact either way (skew-join is
  * result-transparent); the assertion is about the plan, because the
  * plan is what decides whether one reducer serves the whole hub
  * bucket at 100 TB.
  */
class BandSkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("band equi-join: AQE splits a hub band-key bucket (skew-join markers in the final plan)") {
    // a hub key is only "skewed" RELATIVE to the median reducer, so the
    // reducer count matters: at 4 partitions one hot band out of 8 can
    // never exceed 2x the median (the other 7 bands' rows dominate every
    // reducer); 16 partitions is the smallest shape where the physics
    // this spec pins is visible at unit-test size
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ONE hot band — the scaladoc's adversary (an all-zeros/all-ones
      // band under sign-degenerate embeddings): dims 1..8 are positive
      // for EVERY vector, so band 0's key is the same for all 1200 rows,
      // while the remaining 7 bands vary by a fixed integer formula
      val emb = spark.sql(
        """SELECT id AS vec_id,
          |  transform(sequence(1, 64), x -> CAST(
          |    CASE WHEN x <= 8 THEN 1.0
          |         ELSE CASE WHEN (id*7 + x*13) % 3 = 0 THEN -1.0 ELSE 1.0 END
          |    END AS DOUBLE)) AS embedding
          |FROM range(0, 1200) t(id)""".stripMargin)
      val q = emb.select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
      val top = SimilarityFunctions.hammingTopKBlocked(emb, q, k = 5, dim = 64,
        bandBits = 8)
      val qe = top.queryExecution
      assert(qe.toRdd.count() === 1200L * 5) // every query fills its top-5
      val plan = qe.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "adaptive plan must have finalized")
      // the band join itself was marked and its shuffle read skew-split
      assert(plan.contains("SortMergeJoin(skew=true) [_band"),
        s"expected the band equi-join to be skew-split:\n$plan")
      assert(plan.contains("skewed"),
        s"expected a skew-split AQEShuffleRead under the band join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
