package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RangeJoinOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val points = Seq(
    (1L, "2024-01-01 10:00:00"),
    (1L, "2024-01-01 10:30:00"),
    (1L, "2024-01-01 11:00:00"), // exactly on iv1's exclusive end
    (2L, "2024-01-01 10:15:00")
  ).toDF("uid", "p").select($"uid", to_timestamp($"p").as("pt"))

  private val intervals = Seq(
    (1L, 100L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
    (1L, 101L, "2024-01-01 10:45:00", "2024-01-01 12:00:00"),
    (2L, 200L, "2024-01-01 09:00:00", "2024-01-01 09:30:00") // misses 10:15
  ).toDF("uid", "iv", "s", "e")
    .select($"uid", $"iv", to_timestamp($"s").as("t0"), to_timestamp($"e").as("t1"))

  test("half-open containment: start inclusive, end exclusive, per key") {
    val out = RangeJoinOps.intervalJoin(points, intervals,
      Seq("uid"), "pt", "t0", "t1", bucketSeconds = 1800L)
      .select("uid", "iv", "pt").as[(Long, Long, java.sql.Timestamp)]
      .collect().toSet
    assert(out === Set(
      (1L, 100L, ts("2024-01-01 10:00:00")), // start inclusive
      (1L, 100L, ts("2024-01-01 10:30:00")),
      (1L, 101L, ts("2024-01-01 11:00:00"))  // end of 100 exclusive; inside 101
    ))
  }

  test("each containment matches exactly once regardless of bucket width") {
    // widths below, at, and above interval length must agree exactly
    val expected = RangeJoinOps.intervalJoin(points, intervals,
      Seq("uid"), "pt", "t0", "t1", bucketSeconds = 60L)
      .select("uid", "iv", "pt").collect().toSet
    for (w <- Seq(1L, 900L, 3600L, 86400L)) {
      val got = RangeJoinOps.intervalJoin(points, intervals,
        Seq("uid"), "pt", "t0", "t1", bucketSeconds = w)
        .select("uid", "iv", "pt").collect().toSet
      assert(got === expected, s"bucketSeconds=$w changed the result")
    }
  }

  test("plan is a shuffled equi-join on (key, cell), not a nested loop") {
    val plan = RangeJoinOps.intervalJoin(points, intervals,
      Seq("uid"), "pt", "t0", "t1").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("overlapping non-key columns are rejected up front") {
    val e = intercept[IllegalArgumentException] {
      RangeJoinOps.intervalJoin(
        points.withColumn("t0", $"pt"), intervals, Seq("uid"), "pt", "t0", "t1")
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
