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

  /** Activity-concentration profile of the event log: exact Gini
    * coefficient of per-entity event counts plus the share of all
    * events produced by the most-active 1% / 5% / 10% of entities —
    * the "is one crawler/user dominating ingestion" audit, and the
    * power-law check a source-mixing pipeline runs before trusting
    * per-source token budgets (d8/d21 consume what this measures).
    *
    * Every statistic is computed from the count-of-counts HISTOGRAM,
    * not from per-entity rows: entities with the same activity level
    * are interchangeable in every formula (Gini is Σ rank·x over the
    * ASCENDING sort, and a run of m equal values v occupying positions
    * p₀..p₀+m−1 contributes v·(m·(p₀−1) + m(m+1)/2); a top-k cut can
    * only straddle ONE run, contributing v·(overlap)). So the plan is
    * two hash aggregations (events → per-entity counts → histogram),
    * one tiny cumulative window over DISTINCT ACTIVITY LEVELS (bounded
    * by the max per-entity count, not by entities), and one final
    * fold — nothing entity-cardinality ever sorts or windows.
    *
    * Determinism: counts, ranks and cut sums are exact integers
    * (decimal(38) where products can pass 2⁶³); Gini and each share
    * are single divisions of exact-decimal casts, rounded 6 dp. Top-k
    * is k = max(1, ⌊n·pct/100⌋) entities by (count desc) — id order
    * never matters because equal counts contribute equally to a sum.
    */
  def activityConcentration(events: DataFrame, idCol: String = "user_id",
      topPcts: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    require(topPcts.nonEmpty && topPcts.forall(p => p >= 1 && p <= 100),
      s"topPcts must be percentages in [1,100] (got $topPcts)")
    val hist = events.groupBy(col(idCol).as("_id"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("_c")).agg(count(lit(1)).as("_m"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("_c")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // totals ride the SAME single-partition histogram frame as
    // whole-frame windows — a separate agg + crossJoin re-derived the
    // histogram from the raw log (second scan + shuffle, plan-checked)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val rows = hist.withColumn("_cum", sum(col("_m")).over(w))
      .withColumn("_before", col("_cum") - col("_m"))
      .withColumn("_n", sum(col("_m")).over(wAll))
      .withColumn("_s", sum(col("_c") * col("_m")).over(wAll))
    // Σ rank·x in decimal: m·before alone can reach entities², and
    // c·(…) passes 2⁶³ on a crawl-scale log.
    val rankSum = sum(col("_c").cast("decimal(38,0)") *
      (col("_m").cast("decimal(38,0)") * col("_before") +
        (col("_m").cast("decimal(38,0)") * (col("_m") + 1)) / 2))
    // events NOT in the top-k: the j = n−k least-active entities;
    // a run overlaps the cut by min(m, j − before) entries.
    def cutSum(pct: Int) = sum(col("_c").cast("decimal(38,0)") *
      greatest(lit(0L), least(col("_m"),
        col("_n") - greatest(lit(1L), expr(s"_n * $pct div 100")) - col("_before"))))
    val aggCols = Seq(
      first(col("_n")).as("n_entities"), first(col("_s")).as("n_events"),
      rankSum.as("_a")) ++ topPcts.map(p => cutSum(p).as(s"_cut$p"))
    val aggs = rows.agg(aggCols.head, aggCols.tail: _*)
    val gini = round(
      (col("_a") * 2 -
        (col("n_entities").cast("decimal(38,0)") + 1) * col("n_events"))
        .cast("double") /
      (col("n_entities").cast("decimal(38,0)") * col("n_events"))
        .cast("double"), 6)
    aggs.select(Seq(col("n_entities"), col("n_events"), gini.as("gini")) ++
      topPcts.map(p => round(
        (col("n_events").cast("decimal(38,0)") - col(s"_cut$p")).cast("double") /
          col("n_events").cast("double"), 6).as(s"share_top$p")): _*)
  }

  /** Robust daily-volume anomaly flags per event type: a (type, day)
    * count is anomalous when |n − median| > 3·1.4826·MAD — the
    * median/MAD analogue of the w7 z-score gate, immune to the very
    * outliers it hunts (one flash-crash day shifts a mean and stddev;
    * it cannot move the median of thirty days). The monitoring query an
    * ingestion pipeline alerts on.
    *
    * Exactness: counts are integers, so the median and MAD are exact
    * half-integers — carried ×2 and ×4 as longs — and the flag
    * compares integer cross-products (|2n−2med|·10000 vs 2.2239·4MAD
    * ·10000, in decimal to survive crawl-scale counts): NO float
    * enters the decision, so engines cannot disagree on a boundary
    * day. Reported median/mad divide the exact carriers by 2/4 (exact
    * in binary).
    *
    * Scale shape: one hash agg to daily counts (map-side partials
    * collapse the log inside scan tasks); medians are per-type
    * percentiles over day-cardinality rows; the type-sized stats frame
    * broadcasts back. Nothing event-cardinality shuffles twice.
    */
  def dailyCountAnomalies(events: DataFrame): DataFrame = {
    // pinned: the median agg and the deviation join both read this
    // (types × days)-sized frame — unpinned, the log aggregates twice
    val daily = graft.Caches.trackedPersist(
      events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = daily.groupBy("event_type")
      .agg((expr("percentile(n, 0.5D)") * 2).cast("long").as("_med2"))
    val dev = daily.join(broadcast(med), Seq("event_type"))
      .withColumn("_dev2", abs(col("n") * 2 - col("_med2")))
    val mad = dev.groupBy("event_type")
      .agg((expr("percentile(_dev2, 0.5D)") * 2).cast("long").as("_mad4"))
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), col("day"), col("n"),
        (col("_med2").cast("double") / 2).as("median_n"),
        (col("_mad4").cast("double") / 4).as("mad"),
        (col("_dev2").cast("decimal(38,0)") * 20000 >
          col("_mad4").cast("decimal(38,0)") * 44478).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Per-entity inter-arrival statistics: gap count, mean/stddev of
    * the µs gaps between consecutive events, coefficient of variation,
    * and the Goh–Barabási burstiness B = (σ−μ)/(σ+μ) ∈ [−1, 1]
    * (B→−1 periodic, 0 Poisson, →1 bursty) — the signal that separates
    * a cron-driven scraper from an organic user, feeding the e18 rate
    * limiter's tier choice. Entities with fewer than `minGaps` gaps
    * drop (their σ is noise).
    *
    * Determinism: gaps are exact µs longs (ties within a timestamp
    * break by event_id, so the gap SEQUENCE is deterministic — and the
    * statistics don't depend on sequence order at all); Σd is an exact
    * long, Σd² exact decimal(38); μ, σ² = (nΣd²−(Σd)²)/(n(n−1)), σ,
    * cv and B are then a fixed short IEEE chain over exact inputs —
    *  bit-reproducible cross-engine (the a13 contract), rounded 6 dp
    * where emitted as ratios; mean_us/sd_us ship unrounded (µs
    * magnitudes would pass 2⁵³ under a 6 dp round — the e16 lesson).
    *
    * Scale shape: one per-entity lag window (partition = entity, the
    * e2 sessionization shape) and one hash agg; output is entity-
    * cardinality.
    */
  def interArrivalStats(events: DataFrame, minGaps: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .withColumn("_d", expr("unix_micros(ts) - unix_micros(_prev)"))
    val agg = gaps.groupBy("user_id").agg(
        count(lit(1)).as("n_gaps"),
        sum(col("_d")).as("_s"),
        sum(col("_d").cast("decimal(38,0)") * col("_d")).as("_s2"))
      .filter(col("n_gaps") >= minGaps)
    val mu = col("_s").cast("double") / col("n_gaps").cast("double")
    val variance = (col("_s2") * col("n_gaps") -
        col("_s").cast("decimal(38,0)") * col("_s")).cast("double") /
      (col("n_gaps").cast("double") * (col("n_gaps") - 1).cast("double"))
    agg.select(col("user_id"), col("n_gaps"),
        mu.as("mean_us"), sqrt(variance).as("sd_us"))
      .withColumn("cv", round(col("sd_us") / col("mean_us"), 6))
      .withColumn("burstiness", round(
        (col("sd_us") - col("mean_us")) / (col("sd_us") + col("mean_us")), 6))
      .orderBy("user_id")
  }

  /** Markov removal-effect attribution (Anderl, Becker, v. Wangenheim &
    * Schumann 2014, "Mapping the customer journey") — the data-driven
    * alternative to last-touch/position rules (e7): model journeys as a
    * first-order Markov chain over channel touches, then credit each
    * channel by how much total conversion probability DISAPPEARS when it
    * is removed (its transitions redirect to the null-absorber, no
    * renormalization — the removed channel's traffic is lost, the
    * published convention).
    *
    * Journey convention: per user, events ordered by (ts, event_id),
    * truncated at the FIRST `convType` event → `START → t₁ → … → tₘ →
    * CONV` (or `→ NULL` for non-converters; a user whose first event
    * converts contributes `START → CONV`). Transition probabilities are
    * 6dp-rounded row shares (the e15 contract).
    *
    * Conversion probabilities come from `iters` synchronous absorption
    * sweeps v(s) ← round₆(Σₜ P(s→t)·v(t)) with v(CONV)=1, v(NULL)=0 —
    * run in EXACT decimal (6dp-decimal P and v, exact products/sums,
    * HALF_UP round per sweep) so an external engine unrolling the same
    * sweeps is bit-identical; the fixed sweep count is part of the
    * contract (paths longer than `iters` steps carry negligible mass).
    * removal_effect(c) = round₆(1 − P_conv^(−c)/P_conv);
    * attribution_share normalizes effects over channels.
    *
    * Scale shape: journey truncation + transition extraction is the
    * distributed pass (one user-partitioned window + two hash aggs);
    * the chain itself is collected at ≤ (|event-type vocabulary|+1)²
    * rows — a TAXONOMY-sized object, not data-sized (the documented
    * bounded-collect convention) — and the sweeps run driver-side on
    * that tiny matrix.
    */
  def removalEffectAttribution(events: DataFrame, convType: String = "purchase",
      iters: Int = 60): DataFrame = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val spark = events.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val withRn = events.select(col("user_id"), col("event_type"),
        col("ts"), col("event_id"))
      .withColumn("_rn", row_number().over(w))
    val users = withRn.groupBy("user_id")
      .agg(min(when(col("event_type") === lit(convType), col("_rn"))).as("_fc"))
    val kept = withRn.join(users, Seq("user_id"))
      .filter(col("_fc").isNull || col("_rn") < col("_fc"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("_rn"))
    val term = when(col("_fc").isNotNull, lit("CONV")).otherwise(lit("NULL"))
    val steps = kept
      .withColumn("_next", lead(col("event_type"), 1).over(w2))
      .select(col("event_type").as("_f"), coalesce(col("_next"), term).as("_t"))
    val firsts = kept.groupBy("user_id")
      .agg(min_by(col("event_type"), col("_rn")).as("_t1"))
    val starts = users.join(firsts, Seq("user_id"), "left")
      .select(lit("START").as("_f"),
        coalesce(col("_t1"),
          when(col("_fc").isNotNull, lit("CONV")).otherwise(lit("NULL"))).as("_t"))
    val trans = steps.unionByName(starts).groupBy("_f", "_t")
      .agg(count(lit(1)).as("_n"))
    val tots = trans.groupBy("_f").agg(sum(col("_n")).as("_tot"))
    // taxonomy-sized collect: ≤ (|event types|+1)² transition rows
    val base: Array[(String, String, JBD)] = trans
      .join(broadcast(tots), "_f")
      .select(col("_f"), col("_t"),
        round(col("_n").cast("double") / col("_tot").cast("double"), 6).as("_p"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        JBD.valueOf(r.getDouble(2)).setScale(6, RoundingMode.HALF_UP)))
    val one = JBD.ONE.setScale(6)
    val zero = JBD.ZERO.setScale(6)
    def pConv(tr: Seq[(String, String, JBD)]): JBD = {
      // merge redirected duplicates exactly (decimal addition)
      val byF = tr.groupBy(t => (t._1, t._2))
        .map { case ((f, t), g) => (f, t, g.map(_._3).reduce(_.add(_))) }
        .groupBy(_._1)
      var v: Map[String, JBD] =
        byF.keysIterator.map(_ -> zero).toMap + ("CONV" -> one) + ("NULL" -> zero)
      var i = 0
      while (i < iters) {
        val nv = byF.map { case (f, ts) =>
          f -> ts.map(t => t._3.multiply(v.getOrElse(t._2, zero)))
            .reduce(_.add(_)).setScale(6, RoundingMode.HALF_UP)
        }
        v = nv ++ Map("CONV" -> one, "NULL" -> zero)
        i += 1
      }
      v.getOrElse("START", zero)
    }
    val full = pConv(base.toSeq)
    require(full.signum > 0,
      s"no $convType conversions reachable from START — attribution undefined")
    val channels = base.map(_._1).filter(_ != "START").distinct.sorted
    val effects = channels.map { c =>
      val scen = base.toSeq.filter(_._1 != c)
        .map(t => if (t._2 == c) (t._1, "NULL", t._3) else t)
      val pc = pConv(scen)
      val eff = JBD.valueOf(1.0 - pc.doubleValue / full.doubleValue)
        .setScale(6, RoundingMode.HALF_UP)
      (c, pc, eff)
    }
    val totEff = effects.map(_._3).foldLeft(zero)(_.add(_))
    // every removal effect can round to 0 (e.g. all converting journeys
    // are direct START→CONV, so removing any channel changes nothing);
    // 0/0 here would be NaN and JBD.valueOf(NaN) throws an opaque
    // NumberFormatException deep in the row build — fail with the cause
    require(totEff.signum != 0,
      "all removal effects are 0 (removing any channel leaves p_conv " +
        "unchanged — e.g. only direct START→" + convType +
        " journeys convert); attribution shares are undefined")
    val rows = effects.map { case (c, pc, eff) =>
      (c, full.doubleValue, pc.doubleValue, eff.doubleValue,
        JBD.valueOf(eff.doubleValue / totEff.doubleValue)
          .setScale(6, RoundingMode.HALF_UP).doubleValue)
    }
    import spark.implicits._
    rows.toSeq.toDF("channel", "p_conv", "p_conv_removed",
      "removal_effect", "attribution_share").orderBy("channel")
  }
}
