package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events stream (SURVEY.md §7 extension
  * tier — the reference only has a commented-out batch re-run scheduler,
  * `/root/reference/src/pipeline.py:313-460`; this is the incremental
  * equivalent Spark actually wants).
  *
  * All transforms are plain DataFrame functions usable on BOTH a batch
  * frame and a `readStream` frame — the test harness runs them batch-wise
  * and stream-wise (Trigger.AvailableNow + memory sink) and requires the
  * same answer, which is exactly the unified-batch/stream contract
  * Structured Streaming promises.
  *
  * Scale notes: watermarks bound state; the hourly aggregation keys are
  * (hour, event_type) — tiny state per window; session windows key by
  * user and expire with the watermark, so state is O(active users), not
  * O(history).
  */
object EventStreams {

  /** events.parquet physical schema when nanos are read as longs
    * (see `Queries.events` — Spark rejects TIMESTAMP(NANOS) natively).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Batch OR streaming source with a proper µs TimestampType `ts`.
    *
    * The file's `ts` physical type varies by generator version —
    * TIMESTAMP(NANOS) (requires `spark.sql.legacy.parquet
    * .nanosAsLong=true` on the session, surfaces as a nanos long) or
    * TIMESTAMP(MICROS) (surfaces as TIMESTAMP_NTZ). The footer schema
    * of the actual file decides the branch — a streaming source needs
    * its schema up front, so probe with one batch footer read (driver
    * metadata only, no data scan) — and both arms end at a µs
    * TimestampType under the UTC session.
    */
  def readEvents(spark: SparkSession, dir: String, streaming: Boolean): DataFrame = {
    // The probe is best-effort ONLY for declare-before-data: a
    // streaming source may be declared before the first file lands
    // (missing path / nothing to infer from), in which case fall back
    // to the nanos-long rawSchema — the generator shape the
    // fixed-schema path always assumed. Any OTHER probe failure
    // (corrupt footer, filesystem error) propagates: silently guessing
    // nanos for a µs file would read timestamps off by 1000×.
    val observed =
      try spark.read.parquet(s"$dir/events.parquet").schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition != null &&
              (e.getCondition.startsWith("PATH_NOT_FOUND") ||
                e.getCondition.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
          rawSchema
      }
    val nanosAsLong = observed("ts").dataType == LongType
    val schema = if (nanosAsLong) rawSchema
      else StructType(rawSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = observed("ts").dataType) else f))
    // FileStreamSource requires a directory path; glob-filter to the
    // events file so co-located tables in the same dir are not consumed.
    val raw =
      if (streaming) spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      else spark.read.schema(schema).parquet(s"$dir/events.parquet")
    if (nanosAsLong) raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Tumbling hourly aggregate with a watermark: the streaming version of
    * the e1 batch query. Late events beyond `watermark` are dropped and
    * closed windows are emitted finally (append semantics downstream).
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding 1-hour window advancing every 15 minutes — each event lands
    * in 4 windows; watermark still bounds state.
    */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** Exactly-once-per-event-id dedup bounded by the watermark
    * (`dropDuplicatesWithinWatermark`): the streaming counterpart of the
    * warehouse anti-join (J-3/K-2). The operator is streaming-only in
    * Spark, so the batch path runs the unbounded-watermark equivalent —
    * a global dropDuplicates on the id — keeping the unified
    * batch/stream contract the rest of this object follows.
    */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(Seq("event_id"))
    else events.dropDuplicates(Seq("event_id"))

  /** Per-user lifetime running totals via `flatMapGroupsWithState` — the
    * CUSTOM-state surface (`KeyValueGroupedDataset`) for semantics no
    * built-in aggregation expresses: state that must survive across
    * micro-batches indefinitely and emit a NEW row only when the update
    * crosses a reporting threshold (here: every `emitEvery` events per
    * user, so downstream sees checkpoints, not every event).
    *
    * State is one (count, sum) pair per user — O(active users), explicit
    * and inspectable, exactly what `mapGroupsWithState` exists for.
    * `GroupStateTimeout.NoTimeout` because lifetime totals never expire;
    * a TTL'd variant would use `ProcessingTimeTimeout` + `setTimeout...`.
    * Works identically on a batch Dataset (state lives within the batch),
    * which is how the spec pins the semantics.
    *
    * The per-batch group iterator arrives in shuffle order, so each
    * batch's rows are sorted by `(seqCol, value)` before folding — the
    * value tiebreak keeps duplicate seq ids deterministic too. This
    * makes checkpoints reproducible for a GIVEN batching; across runs
    * with different micro-batch boundaries the fold interleaves
    * differently (inherent to any cross-batch stateful op — only the
    * final state is batching-independent). The sort buffers one group's
    * batch rows, bounded by events-per-user-per-micro-batch.
    */
  def userRunningTotals(events: DataFrame, emitEvery: Long = 10L,
      seqCol: String = "event_id"): DataFrame = {
    require(emitEvery >= 1, s"emitEvery must be >= 1 (got $emitEvery)")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def update(userId: Long, rows: Iterator[(Long, Long, Double)],
        state: GroupState[(Long, Double)]): Iterator[(Long, Long, Double)] = {
      var (n, total) = state.getOption.getOrElse((0L, 0.0))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, v) =>
        n += 1; total += v
        if (n % emitEvery == 0) out += ((userId, n, total))
      }
      state.update((n, total))
      out.iterator
    }
    events.select(col("user_id").cast("long"), col(seqCol).cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(update)
      .toDF("user_id", "n_events", "running_total")
  }

  /** Per-user token-bucket rate limiter — the quota/throttle primitive
    * an event-ingest tier runs in front of expensive downstream work
    * (dedup, embedding, enrichment): each user's bucket holds
    * `capacity` tokens, refills at `tokensPerSec` on EVENT time, and
    * every event consumes one token or is marked denied. Emits every
    * event with its verdict — an audit stream, not a silent drop.
    *
    * ALL-INTEGER state: tokens are millitokens (longs), refill is
    * `Δµs · tokensPerSec / 1000` integer division — no float drift, so
    * batch and oracle replay bit-for-bit. The bucket starts FULL at a
    * user's first event. Out-of-order events (ts ≤ last seen) consume
    * without refilling — time never runs backwards in the bucket.
    *
    * State per user is two longs — O(active users). Within a
    * micro-batch rows sort by (ts, event_id) (the [[userRunningTotals]]
    * convention); across micro-batches deliver event-time-ordered
    * batches or accept the no-refill-on-late rule (the [[funnelSteps]]
    * caveat). Works identically on a batch Dataset, which is how the
    * e18 oracle pins the semantics row-for-row.
    */
  def rateLimit(events: DataFrame, capacity: Int, tokensPerSec: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1 (got $capacity)")
    require(tokensPerSec >= 1, s"tokensPerSec must be >= 1 (got $tokensPerSec)")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val capMilli = capacity * 1000L
    def update(userId: Long, rows: Iterator[(Long, Long, Long)],
        state: GroupState[(Long, Long)]): Iterator[(Long, Long, Long, Boolean)] = {
      var (tok, last) = state.getOption.getOrElse((capMilli, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Boolean)]
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, tsUs, eid) =>
        if (last != Long.MinValue && tsUs > last)
          tok = math.min(capMilli, tok + (tsUs - last) * tokensPerSec / 1000L)
        val allowed = tok >= 1000L
        if (allowed) tok -= 1000L
        if (last == Long.MinValue || tsUs > last) last = tsUs
        out += ((userId, eid, tsUs, allowed))
      }
      state.update((tok, last))
      out.iterator
    }
    events.select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("_us"), col("event_id").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(update)
      .toDF("user_id", "event_id", "ts_us", "allowed")
  }

  /** Stateful funnel progression: one row per (user, step advance),
    * where step i advances only on the first step-i event STRICTLY
    * after the event that advanced step i-1 — the state-machine twin
    * of `EventAnalyticsOps.funnel` (same semantics, verified row-level
    * by the e11 oracle; the batch op answers "how many", this one
    * answers "who and when" and runs incrementally).
    *
    * State per user is two numbers (current step, its event time) —
    * O(active users), batching-independent for event-time-ordered
    * arrival. Within a micro-batch rows sort by event time (bounded by
    * events-per-user-per-batch, the [[userRunningTotals]] convention);
    * equal-timestamp events cannot advance past the step that set the
    * state time (strict >), so tie processing order cannot change the
    * outcome. Across micro-batches the state machine consumes arrival
    * order: an event older than the state's time is ignored (funnels
    * only move forward) — deliver event-time-ordered batches (or accept
    * the approximation) exactly as with any cross-batch stateful fold.
    */
  def funnelSteps(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stepArr = steps.toArray
    def update(userId: Long, rows: Iterator[(Long, Long, String)],
        state: GroupState[(Int, Long)]): Iterator[(Long, Int, String, Long)] = {
      var (step, ts) = state.getOption.getOrElse((0, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String, Long)]
      rows.toSeq.sortBy(_._2).foreach { case (_, t, typ) =>
        if (step < stepArr.length && typ == stepArr(step) &&
            (step == 0 || t > ts)) {
          step += 1; ts = t
          out += ((userId, step, typ, t))
        }
      }
      state.update((step, ts))
      out.iterator
    }
    events.select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(update)
      .toDF("user_id", "step_idx", "step", "_us")
      .withColumn("step_ts", timestamp_micros(col("_us"))).drop("_us")
  }

  /** Windowed heavy hitters: the native space-saving sketch
    * ([[graft.functions.TopKFreq]]) per tumbling window — the streaming
    * boilerplate/abuse-detection shape. A TypedImperativeAggregate's
    * partial/merge contract is exactly what streaming partial
    * aggregation replays per micro-batch: batch partials merge into the
    * window's state, so state is O(capacity) per open window and the
    * watermark closes windows. Choose `capacity` ≥ the distinct-value
    * count for exact results (the oracle regime); under-capacity gives
    * the space-saving `count − error ≤ truth ≤ count` guarantee.
    */
  def windowedTopTypes(events: DataFrame, k: Int = 5, capacity: Int = 1024,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.TopKFreq(col("event_type"), k, capacity).as("top"))
      .select(col("window.start").as("window_start"), expr("inline(top)"))
      .select(col("window_start"), col("value").as("event_type"),
        col("count").as("n"), col("error"))

  /** Watermarked STREAM-STREAM interval join: each click attributed to
    * every same-user purchase whose following `window` contains it —
    * the streaming twin of `RangeJoinOps.intervalJoin` (which is the
    * scalable BATCH formulation of the same containment). Here the
    * range condition rides directly on the join: Structured Streaming
    * derives state expiry from watermark + time bounds, so each side
    * buffers only `watermark + window` of history — the canonical
    * bounded-state stream-stream join.
    *
    * Works on batch frames too (`withWatermark` is a no-op there),
    * which is how the registry oracles it; on a true stream both sides
    * MUST carry the watermark or state grows without bound.
    */
  def clickAttribution(events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      col("c_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") &&
        col("click_ts") < col("purchase_ts") + expr(s"INTERVAL $window"))
      .select(col("user_id"), col("purchase_id"), col("click_ts"))
  }

  /** LEFT OUTER stream-stream attribution — [[clickAttribution]] with
    * the unmatched side kept: every purchase emits; clicks inside its
    * following `window` attach; a purchase with NO click emits exactly
    * once with a null `click_ts` AFTER the watermark passes its window
    * (streaming outer joins can only certify "no match" once the other
    * side's watermark proves no more matching rows can arrive — which
    * is why the watermark + time-range condition pair is MANDATORY
    * here, not just a state-cleanup optimization). In batch mode it
    * degenerates to the plain left interval join.
    *
    * Scale note: the time-range join keys the shuffle on the user
    * equi-condition with the range as a post-filter; for the BATCH
    * path at 100 TB prefer [[graft.ops.RangeJoinOps.intervalJoin]]'s
    * bucket decomposition (the e6 shape) — this operator exists for
    * the STREAMING semantics the bucketed form can't express.
    */
  def attributionOuter(events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") &&
        col("click_ts") < col("purchase_ts") + expr(s"INTERVAL $window"),
      "left_outer")
      .select(col("user_id"), col("purchase_id"), col("click_ts"))
  }

  /** Per-user session windows with an inactivity gap — built-in
    * `session_window` keeps state O(open sessions) and closes sessions at
    * the watermark.
    */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Custom-state sessionization with EVENT-TIME TIMEOUT — the
    * `flatMapGroupsWithState` twin of [[userSessions]], kept for the
    * semantics the built-in `session_window` aggregation can't express
    * (arbitrary per-session derived state; here the session's event
    * count plus exact first/last event times as the demonstrator).
    * This is also the one stateful primitive the e-family's
    * funnel/running-total states don't exercise:
    * `GroupStateTimeout.EventTimeTimeout` — state expiry CERTIFIED by
    * the watermark, not by the arrival of more data.
    *
    * A session closes two ways: a same-user event arrives past the
    * `gapMinutes` inactivity gap (emitted in that micro-batch), or the
    * watermark passes `last_event + gap` with no successor — the
    * TIMEOUT path emits the open session exactly once and removes the
    * state. State per user is one (start, end, n) triple — O(1), and
    * the timeout guarantees it cannot outlive the watermark horizon,
    * so total state is bounded by gap-active users.
    *
    * Late rows (≤ watermark behind) that still belong to the open
    * session fold into it (count grows; bounds widen only forward —
    * an EARLIER late ts inside the open session keeps the recorded
    * start, the documented approximation). In BATCH mode timeouts
    * never fire: closed sessions emit, each user's final open session
    * does not — batch callers want [[userSessions]]; this operator
    * exists for the streaming semantics.
    */
  def sessionStatsTimeout(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "2 hours"): DataFrame = {
    require(gapMinutes >= 1, s"gapMinutes must be >= 1 (got $gapMinutes)")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60_000_000L
    val gapMs = gapMinutes * 60_000L
    def update(userId: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
        state: GroupState[(Long, Long, Long)]): Iterator[(Long, Long, Long, Long)] = {
      if (state.hasTimedOut) {
        val (st, en, n) = state.get
        state.remove()
        Iterator((userId, st, en, n))
      } else {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var cur = state.getOption
        rows.toSeq.sortBy(_._2).foreach { case (_, t, _) =>
          cur match {
            case None => cur = Some((t, t, 1L))
            case Some((st, en, n)) =>
              if (t - en > gapUs) { out += ((userId, st, en, n)); cur = Some((t, t, 1L)) }
              else cur = Some((st, math.max(en, t), n + 1))
          }
        }
        cur.foreach { c =>
          state.update(c)
          // the timeout timestamp must sit at/after the current
          // watermark (Spark rejects the past); a late burst whose
          // session already expired emits on the very next trigger.
          // In BATCH mode there is no watermark to read and timeouts
          // never fire — skip the registration entirely.
          scala.util.Try(state.getCurrentWatermarkMs()).toOption.foreach { wm =>
            state.setTimeoutTimestamp(math.max(c._2 / 1000L + gapMs, wm + 1L))
          }
        }
        out.iterator
      }
    }
    events
      .withWatermark("ts", watermark)
      // the watermarked ts column must SURVIVE into the stateful
      // operator's child plan — projecting it away severs the
      // event-time watermark EventTimeTimeout depends on
      .select(col("user_id").cast("long"), unix_micros(col("ts")), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(update)
      .toDF("user_id", "_s", "_e", "n_events")
      .select(col("user_id"),
        timestamp_micros(col("_s")).as("session_start"),
        timestamp_micros(col("_e")).as("session_end"),
        col("n_events"))
  }
}
