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

  test("snapshotDiff: insert/delete/update tagged; unchanged keys drop; nulls null-safe") {
    val old = Seq(
      ("k1", Some(10), "a"), // unchanged -> dropped
      ("k2", Some(20), "b"), // value change -> update
      ("k3", None, "c"),     // null -> 30: update (null-safe, not missed)
      ("k4", Some(40), "d")  // gone -> delete
    ).toDF("k", "v", "s")
    val nw = Seq(
      ("k1", Some(10), "a"),
      ("k2", Some(21), "b"),
      ("k3", Some(30), "c"),
      ("k5", Some(50), "e")  // born -> insert
    ).toDF("k", "v", "s")
    val out = HistoryOps.snapshotDiff(old, nw, Seq("k")).orderBy("k")
    assert(out.columns.toSeq ===
      Seq("k", "change", "old_v", "new_v", "old_s", "new_s"))
    val rows = out
      .as[(String, String, Option[Int], Option[Int], Option[String], Option[String])]
      .collect().toList
    assert(rows === List(
      ("k2", "update", Some(20), Some(21), Some("b"), Some("b")),
      ("k3", "update", None, Some(30), Some("c"), Some("c")),
      ("k4", "delete", Some(40), None, Some("d"), None),
      ("k5", "insert", None, Some(50), None, Some("e"))))
    // schema mismatch is a loud error, not a silent column drop
    intercept[IllegalArgumentException] {
      HistoryOps.snapshotDiff(old, nw.drop("s"), Seq("k"))
    }
  }
}
