package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventAnalyticsOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "event_type", "t")
      .withColumn("ts", to_timestamp(col("t")))
      .drop("t")

  test("funnel: steps must happen in order, firsts chained strictly") {
    // u1 completes view->click->purchase in order.
    // u2 purchases BEFORE clicking: reaches click, not purchase.
    // u3 clicks before viewing, clicks again after: reaches click via the
    //    second click (first qualifying = first click AFTER first view).
    // u4 only views.
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      (2L, "view", "2024-01-01 09:00:00"),
      (2L, "purchase", "2024-01-01 09:30:00"),
      (2L, "click", "2024-01-01 10:00:00"),
      (3L, "click", "2024-01-01 08:00:00"),
      (3L, "view", "2024-01-01 08:30:00"),
      (3L, "click", "2024-01-01 09:00:00"),
      (4L, "view", "2024-01-01 07:00:00"))
    val out = EventAnalyticsOps.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out === Array(
      (1, "view", 4L, 1.0),
      (2, "click", 3L, 0.75),
      (3, "purchase", 1L, 0.333333)))
  }

  test("funnel: simultaneous timestamps do not advance (strict >)") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00"))
    val out = EventAnalyticsOps.funnel(events, Seq("view", "click"))
      .orderBy("step_idx").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 0L))
  }

  test("cohortRetention: offsets measured from the cohort Monday") {
    // 2024-01-01 is a Monday. u1 first seen wk0, active wk0 and wk2
    // (twice in wk2 — distinct collapses); u2 first seen wk1, active wk1.
    val events = ev(
      (1L, "view", "2024-01-03 10:00:00"),
      (1L, "click", "2024-01-16 10:00:00"),
      (1L, "view", "2024-01-17 10:00:00"),
      (2L, "view", "2024-01-10 10:00:00"))
    val out = EventAnalyticsOps.cohortRetention(events)
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out === Array(
      ("2024-01-01", 0, 1L, 1.0),
      ("2024-01-01", 2, 1L, 1.0),
      ("2024-01-08", 0, 1L, 1.0)))
  }

  test("stickiness: trailing-7-day WAU window, inclusive of today") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (3L, "view", "2024-01-02 10:00:00"),
      (1L, "view", "2024-01-05 10:00:00"),
      (2L, "view", "2024-01-05 11:00:00"),
      (1L, "view", "2024-01-05 12:00:00")) // same user same day -> 1 DAU
    val out = EventAnalyticsOps.stickiness(events)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out === Array(
      ("2024-01-01", 1L, 1L, 1.0),
      ("2024-01-02", 1L, 2L, 0.5),
      ("2024-01-05", 2L, 3L, 0.666667)))
    graft.Caches.releaseAll()
  }

  test("funnel leaves no persisted blocks behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val events = ev((1L, "view", "2024-01-01 10:00:00"))
    EventAnalyticsOps.funnel(events, Seq("view", "click")).collect()
    // unpersist(blocking=false) is async; give the executor a beat
    val deadline = System.nanoTime() + 5e9.toLong
    while (spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty
           && System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty)
  }

  test("transitionMatrix: per-user chains, tie-broken by event_id") {
    // user 1: view -> click -> buy; user 2: view -> view (two events at
    // the SAME timestamp — event_id order decides: 21 view, then 22 view)
    // transitions: view->click 1, click->buy 1, view->view 1
    val ev = Seq(
      (11L, "2024-01-01 10:00:00", 1L, "view"),
      (12L, "2024-01-01 10:05:00", 1L, "click"),
      (13L, "2024-01-01 10:06:00", 1L, "buy"),
      (21L, "2024-01-01 09:00:00", 2L, "view"),
      (22L, "2024-01-01 09:00:00", 2L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = EventAnalyticsOps.transitionMatrix(ev)
      .as[(String, String, Long, Double)].collect().toList
    assert(out === List(
      ("click", "buy", 1L, 1.0),
      ("view", "click", 1L, 0.5),
      ("view", "view", 1L, 0.5)))
    // a single-event user contributes no transitions
    val one = ev.union(Seq((31L, "2024-01-01 11:00:00", 3L, "solo"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp")))
    assert(!EventAnalyticsOps.transitionMatrix(one)
      .select("from_type").as[String].collect().contains("solo"))
  }

  test("kaplanMeier: hand-computed curve with ties, censoring between steps, all-censored group") {
    val lt = Seq(
      // A: N=6 — death@1, censor@2, two deaths@3 (tie), censor@4, death@5
      ("A", 1L, true), ("A", 2L, false), ("A", 3L, true),
      ("A", 3L, true), ("A", 4L, false), ("A", 5L, true),
      // B: fully censored → contributes NO curve rows
      ("B", 1L, false), ("B", 2L, false)
    ).toDF("g", "dur", "ev")
    val out = EventAnalyticsOps.kaplanMeier(lt, "g", "dur", "ev")
      .as[(String, Long, Long, Long, Double)].collect().toList
    assert(out === List(
      // S(1) = 5/6 floor-truncated at 8dp
      ("A", 1L, 6L, 1L, 0.83333333),
      // S(3) = 0.83333333 · 0.5 = 0.416666665 → HALF_UP → 0.41666667
      // (risk set 4: the t=2 censor left BEFORE t=3)
      ("A", 3L, 4L, 2L, 0.41666667),
      // S(5): last subject dies → 0 (the t=4 censor shrank n to 1)
      ("A", 5L, 1L, 1L, 0.0)))
  }

  test("kaplanMeier: censoring at a death time keeps the censored subject at risk") {
    val lt = Seq(("G", 1L, true), ("G", 1L, false), ("G", 2L, true))
      .toDF("g", "dur", "ev")
    val out = EventAnalyticsOps.kaplanMeier(lt, "g", "dur", "ev")
      .as[(String, Long, Long, Long, Double)].collect().toList
    // at t=1 ALL THREE are at risk (deaths precede censoring on ties):
    // S(1) = 2/3 = 0.66666666 (floor-trunc); at t=2 only one remains
    assert(out === List(("G", 1L, 3L, 1L, 0.66666666), ("G", 2L, 1L, 1L, 0.0)))
  }
}
