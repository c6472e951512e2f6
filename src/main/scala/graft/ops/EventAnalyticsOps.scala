package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch funnel / cohort analytics over the event log — the product-
  * analytics queries a training-data org runs against its ingestion
  * telemetry (the reference has no event analytics at all; this extends
  * the e-family of `streaming/EventStreams.scala`).
  *
  * Scale notes (100 TB event log):
  *  - `funnel` is `steps.length` aggregations chained by equi-joins, all
  *    keyed on `user_id` — after the first shuffle every later groupBy
  *    and join satisfies its distribution from the same hash
  *    partitioning, and each per-user min() has map-side partial
  *    aggregation, so hot users collapse before the exchange. No
  *    windows, no per-user sort.
  *  - `cohortRetention` is two hash aggregations and one broadcast-sized
  *    join output: the per-user first-activity frame is user-cardinality
  *    (not event-cardinality) and the (cohort, offset) matrix is
  *    weeks² — tiny. The distinct on (user, cohort, offset) has map-side
  *    partials, so a user's million events collapse inside the scan
  *    partition.
  */
object EventAnalyticsOps {

  /** Ordered conversion funnel: step i counts users whose FIRST step-i
    * event is strictly after their first qualifying step-(i-1) event.
    *
    * Returns one row per step: (step_idx, step, users, conv_rate) where
    * conv_rate = users / users-at-previous-step rounded to 6 dp (1.0 for
    * the first step), a single-division floating value (cross-engine
    * bit-stable under the 6 dp rule).
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._

    // first qualifying timestamp per user for each step, chained:
    // reached(i) = min ts of step-i events with ts > reached(i-1).
    // Each frame is persisted so the count action and the next step's
    // join read it once instead of recomputing the whole prefix chain.
    var reached: DataFrame = events
      .filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("step_ts"))
      .persist()
    val counts = Seq.newBuilder[(Int, String, Long)]
    counts += ((1, steps.head, reached.count()))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = reached
      reached = events
        .filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("step_ts").as("prev_ts")), "user_id")
        .filter(col("ts") > col("prev_ts"))
        .groupBy("user_id").agg(min("ts").as("step_ts"))
        .persist()
      counts += ((i + 1, step, reached.count()))
      prev.unpersist(blocking = false)
    }
    reached.unpersist(blocking = false)

    val rows = counts.result()
    val withRate = rows.zip(0L +: rows.map(_._3)).map {
      case ((idx, step, users), prev) =>
        val rate =
          if (idx == 1) 1.0
          else if (prev == 0L) 0.0
          else BigDecimal(users.toDouble / prev)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (idx, step, users, rate)
    }
    withRate.toDF("step_idx", "step", "users", "conv_rate")
  }

  /** DAU / trailing-7-day WAU stickiness per day — the engagement ratio
    * dashboards track. Daily actives are one distinct + count; the
    * trailing window is the day grid (calendar-sized, broadcast)
    * range-joined against the (day, user) distinct frame — no
    * count-distinct-over-range window, which Spark cannot do without
    * buffering the frame per row anyway.
    *
    * Returns (day, dau, wau, stickiness = dau/wau rounded 6 dp), one
    * row per day with ≥1 event.
    */
  def stickiness(events: DataFrame): DataFrame = {
    val dayUsers = graft.Caches.trackedPersist(
      events.select(col("ts").cast("date").as("day"), col("user_id")).distinct(),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dau = dayUsers.groupBy("day").agg(count(lit(1)).as("dau"))
    val days = dayUsers.select("day").distinct()
    val wau = broadcast(days.select(col("day").as("d")))
      .join(dayUsers,
        col("day").between(date_sub(col("d"), 6), col("d")))
      .select(col("d").as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
  }

  /** Weekly cohort retention: cohort = Monday-truncated week of the
    * user's first event; a (cohort, offset) cell counts distinct users
    * of that cohort active in cohort_week + offset weeks.
    *
    * Returns (cohort_week, week_offset, active_users, retention_rate)
    * with retention_rate = active / cohort-size rounded to 6 dp.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firstSeen = events
      .groupBy("user_id").agg(min("ts").as("first_ts"))
      .select(col("user_id"), date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))

    // the weeks²-sized matrix feeds both the output and the cohort
    // sizes — pin it so the user-sized upstream runs once
    val active = graft.Caches.trackedPersist(
      events
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("active_week"))
        .join(firstSeen, "user_id")
        .select(col("cohort_week"),
          (datediff(col("active_week"), col("cohort_week")) / 7).cast("int").as("week_offset"),
          col("user_id"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("active_users")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // cohort size = the matrix's own offset-0 cell (every member's
    // first event is inside its cohort week), so sizing needs NO second
    // pass over events/firstSeen — the broadcast side is weeks-sized
    val sizes = active.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("active_users").as("cohort_size"))

    active.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        round(col("active_users").cast("double") / col("cohort_size"), 6).as("retention_rate"))
  }

  /** First-order Markov transition matrix over per-user event streams:
    * for each consecutive event pair (ordered by `(ts, event_id)` —
    * the total tiebreak that makes same-timestamp streams
    * deterministic), count `from_type → to_type` and the row-normalized
    * transition probability — the "what do users do next" matrix that
    * drives next-action prediction features and funnel design.
    *
    * Returns (from_type, to_type, n, p), p = n / Σ_to n rounded 6 dp
    * (one exact-integer division — cross-engine bit-stable).
    *
    * Scale shape: the `lead` window is USER-partitioned (a user's
    * events are bounded; the e-family convention), then everything
    * reduces to a types²-sized matrix via two hash aggregations with
    * map-side partials; the per-from totals frame is types-sized and
    * broadcasts back. No global sort, no collect.
    */
  /** Kaplan–Meier survival curves per group over right-censored
    * lifetimes (Kaplan & Meier, JASA 1958): input rows are
    * (group, duration, event) with `event` true for an observed
    * "death" (conversion, churn, failure) and false for a censored
    * observation (still alive when the window closed). Returns the
    * survival STEP CURVE — one row per distinct death time t:
    * (group, t, n_at_risk, d, survival) with
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ).
    *
    * Tie semantics are the standard ones: subjects censored AT t are
    * still at risk at t (deaths precede censoring on equal times), and
    * censor-only times contribute no curve step but do shrink the risk
    * set of later steps.
    *
    * Determinism contract (the w31 Kalman recursion discipline): dᵢ
    * and nᵢ are exact longs; each factor (nᵢ−dᵢ)/nᵢ is ONE IEEE
    * division of exact integers closed by floor-truncation at 8dp
    * (round would be engine-divergent at .5 boundaries); the running
    * product accumulates in decimal(20,8) with HALF_UP per step. A
    * recursive-CTE oracle replays every step bit-for-bit.
    *
    * Scale shape: one hash agg collapses lifetimes to distinct
    * (group, t) rows with death/censor counts; the risk set comes from
    * one group-partitioned cumulative window over THOSE rows; the
    * sequential product folds over a per-group array bounded by the
    * distinct-death-time count (the kalman per-entity bound). Nothing
    * subject-scale moves twice.
    */
  def kaplanMeier(lifetimes: DataFrame, groupCol: String, durationCol: String,
      eventCol: String): DataFrame = {
    val dec = "decimal(20,8)"
    val decF = "decimal(10,8)"
    val p = lifetimes
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(col(groupCol).as("_g"), col(durationCol).cast("long").as("_t"),
        col(eventCol).cast("boolean").as("_e"))
    val perT = p.groupBy(col("_g"), col("_t"))
      .agg(sum(when(col("_e"), 1L).otherwise(0L)).as("_d"),
        sum(when(col("_e"), 0L).otherwise(1L)).as("_c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("_g").orderBy("_t")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val nTot = p.groupBy(col("_g")).agg(count(lit(1)).as("_n0"))
    val steps = perT
      .withColumn("_cum", sum(col("_d") + col("_c")).over(wCum))
      .join(nTot, Seq("_g"))
      // at risk just BEFORE t: total minus everything removed at t' < t
      .withColumn("_n", col("_n0") - (col("_cum") - col("_d") - col("_c")))
      .filter(col("_d") > 0) // curve steps only at death times
      .groupBy(col("_g"))
      .agg(array_sort(collect_list(struct(col("_t").as("t"),
        col("_d").as("d"), col("_n").as("n")))).as("_arr"))
    val init = struct(
      lit(java.math.BigDecimal.ONE).cast(dec).as("s"),
      slice(transform(col("_arr"), a => struct(a.getField("t").as("t"),
        a.getField("d").as("d"), a.getField("n").as("n"),
        lit(0.0).as("surv"))), 1, 0).as("out"))
    val folded = aggregate(col("_arr"), init, (acc, a) => {
      val f = (floor((a.getField("n") - a.getField("d")).cast("double")
        / a.getField("n").cast("double") * lit(1e8)) / lit(1e8)).cast(decF)
      val s2 = round(acc.getField("s") * f, 8).cast(dec)
      struct(s2.as("s"),
        concat(acc.getField("out"), array(struct(a.getField("t").as("t"),
          a.getField("d").as("d"), a.getField("n").as("n"),
          s2.cast("double").as("surv")))).as("out"))
    })
    steps.select(col("_g"), explode(folded.getField("out")).as("_step"))
      .select(col("_g").as(groupCol), col("_step.t").as("t"),
        col("_step.n").as("n_at_risk"), col("_step.d").as("d"),
        col("_step.surv").as("survival"))
      .orderBy(groupCol, "t")
  }

  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("_next", lead(col("event_type"), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum(col("n")).as("_tot"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("_tot").cast("double"), 6).as("p"))
      .orderBy("from_type", "to_type")
  }
}
