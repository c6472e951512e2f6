package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: Seq[(String, String)]): DataFrame =
    rows.toDF("k", "v").select(col("k"), col("v").cast("decimal(12,4)").as("v"))

  private def collected(df: DataFrame) =
    df.selectExpr("k", "n", "CAST(sum AS STRING)", "CAST(min AS STRING)",
        "CAST(max AS STRING)")
      .as[(String, Long, String, String, String)].collect().toSet

  test("merge(partials(A), partials(B)) == partials(A union B), exactly") {
    val a = frame(Seq(("x", "1.5"), ("x", "2.25"), ("y", "10")))
    val b = frame(Seq(("x", "-0.75"), ("z", "3")))
    val merged = IncrementalAgg.merge(Seq("k"),
      IncrementalAgg.partials(a, Seq("k"), col("v")),
      IncrementalAgg.partials(b, Seq("k"), col("v")))
    val direct = IncrementalAgg.partials(a.unionByName(b), Seq("k"), col("v"))
    assert(collected(merged) === collected(direct))
    assert(collected(merged) === Set(
      ("x", 3L, "3.0000", "-0.7500", "2.2500"),
      ("y", 1L, "10.0000", "10.0000", "10.0000"),
      ("z", 1L, "3.0000", "3.0000", "3.0000")))
  }

  test("merge is order- and grouping-invariant (monoid laws hold)") {
    val parts = Seq(
      frame(Seq(("x", "1"), ("y", "2"))),
      frame(Seq(("x", "3"))),
      frame(Seq(("y", "-4"), ("x", "0.5"))))
      .map(IncrementalAgg.partials(_, Seq("k"), col("v")))
    val fwd = collected(IncrementalAgg.merge(Seq("k"), parts: _*))
    val rev = collected(IncrementalAgg.merge(Seq("k"), parts.reverse: _*))
    // associativity: merge(merge(p0, p1), p2)
    val nested = collected(IncrementalAgg.merge(Seq("k"),
      IncrementalAgg.merge(Seq("k"), parts(0), parts(1)), parts(2)))
    assert(fwd === rev && fwd === nested)
    assert(fwd === Set(
      ("x", 3L, "4.5000", "0.5000", "3.0000"),
      ("y", 2L, "-2.0000", "-4.0000", "2.0000")))
  }

  test("a key absent from one side survives the merge unchanged") {
    val hist = IncrementalAgg.partials(frame(Seq(("only_hist", "7"))),
      Seq("k"), col("v"))
    val delta = IncrementalAgg.partials(frame(Seq(("only_new", "8"))),
      Seq("k"), col("v"))
    assert(collected(IncrementalAgg.merge(Seq("k"), hist, delta)) === Set(
      ("only_hist", 1L, "7.0000", "7.0000", "7.0000"),
      ("only_new", 1L, "8.0000", "8.0000", "8.0000")))
    intercept[IllegalArgumentException] { IncrementalAgg.merge(Seq("k")) }
  }
}
