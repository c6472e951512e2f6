package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // adversarial key placement: keys that exist only in one slice, keys
  // that match ONLY across the delta terms (rOld↔sDelta, rDelta↔sOld,
  // rDelta↔sDelta), duplicate keys on both sides (join multiplicity)
  private val rOld = Seq((1, "r1"), (1, "r1b"), (2, "r2"), (5, "r5"))
    .toDF("k", "rv")
  private val rDelta = Seq((2, "r2d"), (3, "r3d"), (6, "r6d")).toDF("k", "rv")
  private val sOld = Seq((1, "s1"), (3, "s3"), (7, "s7")).toDF("k", "sv")
  private val sDelta = Seq((2, "s2d"), (2, "s2d2"), (5, "s5d"), (6, "s6d"))
    .toDF("k", "sv")

  private def canon(df: DataFrame) =
    df.as[(Int, String, String)].collect().toList.sorted

  test("maintain(viewOld, deltas) equals the from-scratch join exactly") {
    val viewOld = rOld.join(sOld, Seq("k"))
    val maintained = IncrementalJoin.maintain(
      viewOld, rOld, rDelta, sOld, sDelta, Seq("k"))
    val scratch = rOld.unionByName(rDelta)
      .join(sOld.unionByName(sDelta), Seq("k"))
    assert(canon(maintained) === canon(scratch))
    // and the delta algebra really exercised every term: rDelta⋈sOld
    // gives k=3; rOld⋈sDelta gives k=2 twice (dup sDelta key) and k=5;
    // rDelta⋈sDelta gives k=2 twice and k=6
    val delta = IncrementalJoin.deltaJoin(rOld, rDelta, sOld, sDelta, Seq("k"))
      .select("k").as[Int].collect().toList.sorted
    assert(delta === List(2, 2, 2, 2, 3, 5, 6))
  }

  test("empty deltas change nothing; empty history still joins the deltas") {
    val viewOld = rOld.join(sOld, Seq("k"))
    val none = rOld.limit(0)
    val noneS = sOld.limit(0)
    assert(canon(IncrementalJoin.maintain(
      viewOld, rOld, none, sOld, noneS, Seq("k"))) === canon(viewOld))
    val coldStart = IncrementalJoin.maintain(
      viewOld.limit(0), none, rDelta, noneS, sDelta, Seq("k"))
    assert(canon(coldStart) === canon(rDelta.join(sDelta, Seq("k"))))
  }

  test("delta terms plan as broadcast joins (history never shuffles)") {
    val plan = IncrementalJoin.deltaJoin(rOld, rDelta, sOld, sDelta, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
