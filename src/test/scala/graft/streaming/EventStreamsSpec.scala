package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Runs each stream transform BOTH ways — batch and incremental
  * (Trigger.AvailableNow into a memory sink, complete/append mode) — and
  * requires identical results: the unified batch/stream contract.
  */
class EventStreamsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def runStream(df: DataFrame, mode: String): DataFrame = {
    val name = s"mem_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("hourlyCounts: streaming result equals the batch result") {
    val batch = EventStreams.hourlyCounts(EventStreams.readEvents(spark, dir, streaming = false))
      .orderBy("window_start", "event_type").collect()
    val stream = runStream(
      EventStreams.hourlyCounts(EventStreams.readEvents(spark, dir, streaming = true)),
      "complete")
      .orderBy("window_start", "event_type").collect()
    assert(batch.length > 0)
    assert(stream.toSeq === batch.toSeq)
  }

  test("windowedTopTypes: the sketch aggregate streams; stream equals batch") {
    val batch = EventStreams.windowedTopTypes(
        EventStreams.readEvents(spark, dir, streaming = false))
      .orderBy("window_start", "n", "event_type").collect()
    val stream = runStream(
      EventStreams.windowedTopTypes(EventStreams.readEvents(spark, dir, streaming = true)),
      "complete")
      .orderBy("window_start", "n", "event_type").collect()
    assert(batch.length > 0)
    assert(stream.toSeq === batch.toSeq)
    // exact regime: every error is 0
    assert(batch.forall(_.getLong(3) === 0L))
  }

  test("userSessions: streaming equals batch and sessions respect the gap") {
    val batch = EventStreams.userSessions(EventStreams.readEvents(spark, dir, streaming = false))
      .orderBy("session_start", "user_id").collect()
    val stream = runStream(
      EventStreams.userSessions(EventStreams.readEvents(spark, dir, streaming = true)),
      "complete")
      .orderBy("session_start", "user_id").collect()
    assert(batch.length > 0)
    assert(stream.toSeq === batch.toSeq)
    // every session is at least one event long and end > start
    batch.foreach { r =>
      assert(r.getTimestamp(1).getTime > r.getTimestamp(0).getTime)
      assert(r.getLong(3) >= 1L)
    }
  }

  test("clickAttribution: stream-stream interval join equals the batch join") {
    val batch = EventStreams.clickAttribution(
      EventStreams.readEvents(spark, dir, streaming = false))
      .orderBy("user_id", "purchase_id", "click_ts").collect()
    val stream = runStream(
      EventStreams.clickAttribution(EventStreams.readEvents(spark, dir, streaming = true)),
      "append")
      .orderBy("user_id", "purchase_id", "click_ts").collect()
    assert(batch.length > 0, "no attribution pairs — fixture broken")
    assert(stream.toSeq === batch.toSeq)
  }

  test("readEvents: a stream declares against an empty dir (probe falls back)") {
    // deploy-before-data: the streaming source must be declarable before
    // the first file lands — the schema probe falls back to rawSchema
    val empty = java.nio.file.Files.createTempDirectory("graft_empty_events").toString
    val ds = EventStreams.readEvents(spark, empty, streaming = true)
    assert(ds.isStreaming)
    assert(ds.schema("ts").dataType.typeName === "timestamp")
    assert(runStream(EventStreams.hourlyCounts(ds), "complete").count() === 0)
  }

  test("dedupedEvents drops re-delivered event ids within the watermark") {
    val events = EventStreams.readEvents(spark, dir, streaming = true)
    val doubled = events.union(events) // simulate at-least-once redelivery
    val out = runStream(EventStreams.dedupedEvents(doubled), "append")
    val n = EventStreams.readEvents(spark, dir, streaming = false).count()
    assert(out.count() === n)
  }

  test("userRunningTotals: custom state accumulates ACROSS micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val events = in.toDF().toDF("user_id", "event_id", "value")
    val name = s"rt_${System.nanoTime()}"
    val q = EventStreams.userRunningTotals(events, emitEvery = 10L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: 5 events for user 7 -> below the emit threshold, no rows
      in.addData((1 to 5).map(i => (7L, i.toLong, i.toDouble)): _*)
      q.processAllAvailable()
      assert(spark.table(name).count() === 0L)
      // batch 2: 5 more -> the 10th event fires ONE checkpoint row whose
      // total spans BOTH batches, proving state survived the batch boundary
      in.addData((6 to 10).map(i => (7L, i.toLong, i.toDouble)): _*)
      q.processAllAvailable()
      val rows = spark.table(name).as[(Long, Long, Double)].collect()
      assert(rows.toSeq === Seq((7L, 10L, 55.0)))
    } finally q.stop()
  }

  test("windowedTopTypes: late events drop at the watermark; closed windows emit ONCE") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val events = in.toDF().toDF("event_type", "ts")
    val name = s"wtt_${System.nanoTime()}"
    // append mode: a window's row may only be emitted AFTER the watermark
    // (2 h here) passes its end — the finalized-result contract
    val q = EventStreams.windowedTopTypes(events)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: three on-time events in the 10:00 window; watermark after
      // this batch is 10:20 - 2h = 08:20, so nothing can emit yet
      in.addData(("a", ts("10:05")), ("a", ts("10:10")), ("b", ts("10:20")))
      q.processAllAvailable()
      assert(spark.table(name).count() === 0L,
        "window still open: append mode must not emit")
      // batch 2: an event 3h ahead pushes the watermark to 11:30 > the
      // 10:00 window's end, finalizing it (the engine runs a no-data
      // batch to flush newly-closed windows)
      in.addData(("c", ts("13:30")))
      q.processAllAvailable()
      val closed = spark.table(name)
        .filter(col("window_start") === ts("10:00")).orderBy("event_type")
        .select("event_type", "n").as[(String, Long)].collect()
      assert(closed.toSeq === Seq(("a", 2L), ("b", 1L)),
        "the finalized 10:00 window emits its counts exactly once")
      // batch 3: an event INSIDE the closed window arrives after the
      // watermark — it must be dropped, not re-open or re-emit the window
      in.addData(("a", ts("10:25")), ("c", ts("13:40")))
      q.processAllAvailable()
      val after = spark.table(name)
        .filter(col("window_start") === ts("10:00")).orderBy("event_type")
        .select("event_type", "n").as[(String, Long)].collect()
      assert(after.toSeq === Seq(("a", 2L), ("b", 1L)),
        "late event must not change or duplicate the finalized window")
    } finally q.stop()
  }

  test("clickAttribution: late clicks drop at the watermark in a true stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val in = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val events = in.toDF().toDF("user_id", "event_id", "event_type", "ts")
    val name = s"attr_${System.nanoTime()}"
    val q = EventStreams.clickAttribution(events)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: a purchase and an in-window click for user 1 -> one match
      in.addData((1L, 100L, "purchase", ts("10:00")), (1L, 500L, "click", ts("10:30")))
      q.processAllAvailable()
      assert(spark.table(name).as[(Long, Long, java.sql.Timestamp)].collect().toSeq
        === Seq((1L, 100L, ts("10:30"))))
      // batch 2: unmatched click AND purchase 3h ahead — BOTH sides'
      // event-time maxima advance, so the global watermark moves to 11:30
      in.addData((55L, 501L, "click", ts("13:30")), (56L, 200L, "purchase", ts("13:30")))
      q.processAllAvailable()
      // batch 3: a LATE click for user 1 at 10:40 — inside purchase 100's
      // attribution window, but older than the watermark: dropped. The
      // on-time click for user 56 still matches its purchase.
      in.addData((1L, 502L, "click", ts("10:40")), (56L, 503L, "click", ts("13:45")))
      q.processAllAvailable()
      val rows = spark.table(name).as[(Long, Long, java.sql.Timestamp)]
        .collect().toSeq.sortBy(r => (r._1, r._3.getTime))
      assert(rows === Seq((1L, 100L, ts("10:30")), (56L, 200L, ts("13:45"))),
        "the late click must not produce an attribution row")
    } finally q.stop()
  }

  test("attributionOuter: no-click purchase emits its null row only after " +
      "the watermark certifies no match can arrive") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val in = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val events = in.toDF().toDF("user_id", "event_id", "event_type", "ts")
    val name = s"oattr_${System.nanoTime()}"
    val q = EventStreams.attributionOuter(events)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // u1's purchase has NO click; u2's has one in-window click
      in.addData((1L, 100L, "purchase", ts("10:00")),
        (2L, 200L, "purchase", ts("10:00")), (2L, 500L, "click", ts("10:30")))
      q.processAllAvailable()
      val early = spark.table(name)
        .as[(Long, Long, Option[java.sql.Timestamp])].collect().toSeq
      // the inner match emits; u1's null row must NOT — a 10:59 click
      // could still arrive
      assert(early === Seq((2L, 200L, Some(ts("10:30")))))
      // advance BOTH sides' event time past u1's window end + delay:
      // watermark -> 14:00 - 2h = 12:00 > 11:00
      in.addData((99L, 300L, "purchase", ts("14:00")),
        (99L, 501L, "click", ts("14:01")))
      q.processAllAvailable()
      in.addData((98L, 302L, "purchase", ts("16:30")),
        (98L, 502L, "click", ts("16:31"))) // second advance flushes state
      q.processAllAvailable()
      val rows = spark.table(name)
        .as[(Long, Long, Option[java.sql.Timestamp])].collect().toSeq
      assert(rows.contains((1L, 100L, None)),
        "the certified-unmatched purchase must emit exactly one null row")
      assert(rows.count(_._2 == 100L) === 1)
    } finally q.stop()
  }

  test("attributionOuter batch mode equals the plain left interval join") {
    val out = EventStreams.attributionOuter(
        EventStreams.readEvents(spark, dir, streaming = false))
      .orderBy("user_id", "purchase_id", "click_ts").collect()
    val inner = EventStreams.clickAttribution(
        EventStreams.readEvents(spark, dir, streaming = false)).collect()
    // every inner pair present, plus one null row per matchless purchase
    assert(out.length >= inner.length)
    val nPurchases = EventStreams.readEvents(spark, dir, streaming = false)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    val matched = out.filter(!_.isNullAt(2)).length
    val nulls = out.filter(_.isNullAt(2)).length
    assert(matched === inner.length)
    // purchases with >=1 click appear once per click; the rest once with null
    val matchedPurchases = inner.map(r => (r.getLong(0), r.getLong(1))).distinct.length
    assert(nulls === nPurchases - matchedPurchases)
  }

  test("userRunningTotals batch mode: deterministic checkpoints in seq order") {
    import spark.implicits._
    // distinct values so a wrong fold order would change the checkpoint sum
    val batch = (1 to 25).map(i => (1L, i.toLong, i.toDouble)) ++
      (1 to 7).map(i => (2L, i.toLong, 2.0))
    val df = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(batch), 8)
      .toDF("user_id", "event_id", "value")
    val out = EventStreams.userRunningTotals(df, emitEvery = 10L)
      .orderBy("user_id", "n_events").as[(Long, Long, Double)].collect()
    // user 1: checkpoints after events 1..10 (sum 55) and 1..20 (sum 210)
    // regardless of partitioning/shuffle order; user 2 never reaches 10
    assert(out.toSeq === Seq((1L, 10L, 55.0), (1L, 20L, 210.0)))
    intercept[IllegalArgumentException] {
      EventStreams.userRunningTotals(df, emitEvery = 0L)
    }
  }

  test("slidingCounts: each event lands in 4 overlapping windows") {
    val batch = EventStreams.slidingCounts(EventStreams.readEvents(spark, dir, streaming = false))
    val total = batch.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    val n = EventStreams.readEvents(spark, dir, streaming = false).count()
    assert(total === 4 * n)
  }

  test("funnelSteps batch mode matches the declarative funnel's counts") {
    import org.apache.spark.sql.functions._
    val ev = EventStreams.readEvents(spark, dir, streaming = false)
    val steps = Seq("view", "click", "purchase")
    val stateful = EventStreams.funnelSteps(ev, steps)
      .groupBy("step_idx").agg(count(lit(1)).as("users"))
      .orderBy("step_idx").collect().map(r => (r.getInt(0), r.getLong(1)))
    val declarative = graft.ops.EventAnalyticsOps.funnel(ev, steps)
      .orderBy("step_idx").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(stateful.toSeq === declarative.toSeq)
    assert(stateful.nonEmpty && stateful.head._2 > 0)
  }

  test("funnelSteps: state advances ACROSS micro-batches, strictly after") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = in.toDF().toDF("user_id", "ts", "event_type")
    val name = s"fs_${System.nanoTime()}"
    val q = EventStreams.funnelSteps(events, Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: user 7 views; a click at the SAME instant must not
      // advance (strict >); user 8's click without a view is ignored
      in.addData((7L, ts("10:00"), "view"), (7L, ts("10:00"), "click"),
        (8L, ts("10:00"), "click"))
      q.processAllAvailable()
      val b1 = spark.table(name)
        .select("user_id", "step_idx").as[(Long, Int)].collect().toSet
      assert(b1 === Set((7L, 1)))
      // batch 2: the click NOW advances (later ts, state crossed the
      // batch boundary); purchase in the same batch chains off it
      in.addData((7L, ts("10:05"), "click"), (7L, ts("10:10"), "purchase"))
      q.processAllAvailable()
      val b2 = spark.table(name)
        .select("user_id", "step_idx", "step").as[(Long, Int, String)]
        .collect().toSet
      assert(b2 === Set((7L, 1, "view"), (7L, 2, "click"), (7L, 3, "purchase")))
    } finally q.stop()
  }

  test("sessionStatsTimeout: gap closes in-batch; watermark timeout closes the tail") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val events = in.toDF().toDF("user_id", "ts")
    val name = s"sst_${System.nanoTime()}"
    val q = EventStreams.sessionStatsTimeout(events, gapMinutes = 30,
        watermark = "1 hour")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: user 7 has two sessions IN one batch (09:00/09:10,
      // then 11:00) — the first closes immediately on the gap
      in.addData((7L, ts("09:00")), (7L, ts("09:10")), (7L, ts("11:00")))
      q.processAllAvailable()
      val b1 = spark.table(name)
        .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      assert(b1 === Set((7L, ts("09:00"), ts("09:10"), 2L)))
      // batch 2: another user far in the future advances the watermark
      // (15:00 − 1h = 14:00 ≫ 11:00 + 30min) …
      in.addData((8L, ts("15:00")))
      q.processAllAvailable()
      // … and a further trigger fires the EVENT-TIME TIMEOUT for the
      // open 11:00 session — emitted exactly once, state removed
      in.addData((8L, ts("15:05")))
      q.processAllAvailable()
      val all = spark.table(name)
        .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toList
      assert(all.count(r => r._1 == 7L && r._2 == ts("11:00")) === 1,
        s"open session must emit exactly once on timeout: $all")
      assert(all.toSet.contains((7L, ts("11:00"), ts("11:00"), 1L)))
      // user 8's own session is still open (watermark has not passed it)
      assert(!all.exists(_._1 == 8L))
    } finally q.stop()
  }

  test("sessionStatsTimeout batch mode: closed sessions only (documented)") {
    import spark.implicits._
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val ev = Seq((7L, ts("09:00")), (7L, ts("09:05")), (7L, ts("12:00")))
      .toDF("user_id", "ts")
    val out = EventStreams.sessionStatsTimeout(ev, gapMinutes = 30)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toList
    // the 09:00 session closed by the 12:00 event emits; the final open
    // session does not (timeouts never fire in batch) — batch callers
    // use userSessions
    assert(out === List((7L, ts("09:00"), ts("09:05"), 2L)))
  }

  test("rateLimit batch: burst drains the bucket, refill re-admits, exact millitoken math") {
    import spark.implicits._
    def ev(id: Long, sec: Long) =
      (id, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${"%02d".format(sec)}"), 7L)
    // capacity 2, 1 token/s: t=0 burst of 3 -> allow, allow, deny;
    // t=1 -> one token refilled -> allow; t=1 again -> deny (0.0 left);
    // t=3 -> +2 tokens -> allow
    val events = Seq(ev(1, 0), ev(2, 0), ev(3, 0), ev(4, 1), ev(5, 1), ev(6, 3))
      .toDF("event_id", "ts", "user_id")
    val out = EventStreams.rateLimit(events, capacity = 2, tokensPerSec = 1)
      .orderBy("ts_us", "event_id")
      .select("event_id", "allowed").as[(Long, Boolean)].collect().toList
    assert(out === List((1L, true), (2L, true), (3L, false),
      (4L, true), (5L, false), (6L, true)))
  }

  test("rateLimit: streaming verdicts across micro-batches equal the batch fold") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val events = in.toDF().toDF("event_id", "ts", "user_id")
    val name = s"rl_${System.nanoTime()}"
    def ev(id: Long, sec: Long) =
      (id, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${"%02d".format(sec)}"), 7L)
    val batch1 = Seq(ev(1, 0), ev(2, 0), ev(3, 0))
    val batch2 = Seq(ev(4, 5), ev(5, 5), ev(6, 5), ev(7, 5))
    val q = EventStreams.rateLimit(events, capacity = 3, tokensPerSec = 1)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table(name)
        .select("event_id", "allowed").as[(Long, Boolean)]
        .collect().toList.sortBy(_._1)
      val batched = EventStreams.rateLimit(
          (batch1 ++ batch2).toDF("event_id", "ts", "user_id"),
          capacity = 3, tokensPerSec = 1)
        .select("event_id", "allowed").as[(Long, Boolean)]
        .collect().toList.sortBy(_._1)
      assert(streamed === batched) // state carried the bucket across batches
      // and the verdicts themselves: burst of 3 drains, 5s refill caps
      // at capacity 3 -> 3 more allowed, the 4th denied
      assert(streamed === List((1L, true), (2L, true), (3L, true),
        (4L, true), (5L, true), (6L, true), (7L, false)))
    } finally q.stop()
  }
}
