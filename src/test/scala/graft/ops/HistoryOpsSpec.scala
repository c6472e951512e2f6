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

  test("asOfSnapshot: latest run at or before T; unborn entities absent") {
    val hist = Seq(
      ("A", 1, "2024-01-01", "2024-01-05", 5L),
      ("A", 2, "2024-01-06", "2024-01-08", 3L),
      ("A", 3, "2024-01-09", "2024-01-10", 2L),
      ("B", 9, "2024-02-01", "2024-02-02", 2L))
      .toDF("ticker", "band", "valid_from", "valid_to", "n_periods")
      .withColumn("valid_from", to_date(col("valid_from")))
      .withColumn("valid_to", to_date(col("valid_to")))
    def at(d: String) = HistoryOps.asOfSnapshot(hist, "ticker", "valid_from",
        lit(d).cast("date"))
      .select(col("ticker"), col("band"))
      .as[(String, Int)].collect().toList
    // mid-run: the containing run
    assert(at("2024-01-07") === List(("A", 2)))
    // BETWEEN runs is still the previous run (current-until-superseded):
    // a query date past run 2's valid_to but before run 3 starts...
    // (no such gap here; T on run 3's first day picks run 3)
    assert(at("2024-01-09") === List(("A", 3)))
    // past the last run: state persists (and B is born by Feb)
    assert(at("2024-03-01") === List(("A", 3), ("B", 9)))
    // before B exists, only A reports; before anything, nothing
    assert(at("2024-01-20") === List(("A", 3)))
    assert(at("2023-12-31") === Nil)
    // column order and names pass through the snapshot intact
    val snap = HistoryOps.asOfSnapshot(hist, "ticker", "valid_from",
      lit("2024-03-01").cast("date"))
    assert(snap.columns.toSeq ===
      Seq("ticker", "band", "valid_from", "valid_to", "n_periods"))
  }
}
