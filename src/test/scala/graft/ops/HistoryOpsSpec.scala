package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HistoryOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def compress(rows: Seq[(String, String, Option[Int])]) =
    HistoryOps.scd2Compress(
      rows.toDF("e", "d", "st").selectExpr("e", "CAST(d AS DATE) AS d", "st"),
      "e", "d", "st")
      .selectExpr("e", "st", "CAST(valid_from AS STRING)",
        "CAST(valid_to AS STRING)", "n_periods")
      .as[(String, Option[Int], String, String, Long)].collect().toList

  test("runs collapse to validity intervals; boundaries are inclusive") {
    val out = compress(Seq(
      ("A", "2024-01-01", Some(1)), ("A", "2024-01-02", Some(1)),
      ("A", "2024-01-03", Some(2)),
      ("A", "2024-01-04", Some(1)), ("A", "2024-01-05", Some(1))))
    assert(out === List(
      ("A", Some(1), "2024-01-01", "2024-01-02", 2L),
      ("A", Some(2), "2024-01-03", "2024-01-03", 1L),
      ("A", Some(1), "2024-01-04", "2024-01-05", 2L))) // 1 recurs: NEW run
  }

  test("entities compress independently; single-row run is its own interval") {
    val out = compress(Seq(
      ("A", "2024-01-01", Some(7)),
      ("B", "2024-01-01", Some(7)), ("B", "2024-01-02", Some(7))))
    assert(out === List(
      ("A", Some(7), "2024-01-01", "2024-01-01", 1L),
      ("B", Some(7), "2024-01-01", "2024-01-02", 2L)))
  }

  test("null state is its own run (null-safe change flag), not a merge") {
    val out = compress(Seq(
      ("A", "2024-01-01", Some(1)), ("A", "2024-01-02", None),
      ("A", "2024-01-03", None), ("A", "2024-01-04", Some(1))))
    assert(out === List(
      ("A", Some(1), "2024-01-01", "2024-01-01", 1L),
      ("A", None, "2024-01-02", "2024-01-03", 2L),
      ("A", Some(1), "2024-01-04", "2024-01-04", 1L)))
  }

  test("result is partition-order invariant") {
    val rows = Seq(
      ("A", "2024-01-03", Some(2)), ("A", "2024-01-01", Some(1)),
      ("A", "2024-01-02", Some(1)), ("B", "2024-01-01", Some(2)))
    val base = compress(rows)
    val shuffled = HistoryOps.scd2Compress(
      rows.toDF("e", "d", "st").selectExpr("e", "CAST(d AS DATE) AS d", "st")
        .repartition(7),
      "e", "d", "st")
      .selectExpr("e", "st", "CAST(valid_from AS STRING)",
        "CAST(valid_to AS STRING)", "n_periods")
      .as[(String, Option[Int], String, String, Long)].collect().toList
    assert(base === shuffled)
    assert(base === List(
      ("A", Some(1), "2024-01-01", "2024-01-02", 2L),
      ("A", Some(2), "2024-01-03", "2024-01-03", 1L),
      ("B", Some(2), "2024-01-01", "2024-01-01", 1L)))
  }
}
