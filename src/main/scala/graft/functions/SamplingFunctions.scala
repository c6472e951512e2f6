package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines. `df.sample()` draws per-partition pseudo-randomly — the
  * selection changes with partitioning, retries, and Spark version,
  * which is poison for train/validation carving (a document must land
  * in the SAME split on every run, every cluster, and in every engine
  * that processes the corpus). Hash-bucketing the stable id instead
  * makes membership a pure row-local projection: no shuffle, no state,
  * reproducible everywhere, and any fraction is expressible as a bucket
  * range.
  */
object SamplingFunctions {

  /** Stable bucket in [0, buckets) from a key column; NULL keys get a
    * null bucket. The explicit null gate matters: Spark's `xxhash64`
    * hashes null to the seed while an md5-based hash propagates null —
    * without it the two supported hashes would silently DISAGREE on
    * null-key rows, breaking the engine-portability contract. With it,
    * null keys fall out of every sample and carry a null split, visibly.
    * xxhash64 by default (codegen'd); pass
    * [[DedupFunctions.md5Hash60]] for the engine-portable variant an
    * external oracle can recompute.
    */
  def hashBucket(key: Column, buckets: Int,
      hash: Column => Column = xxhash64(_)): Column = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    when(key.isNull, lit(null)).otherwise(pmod(hash(key), lit(buckets.toLong)))
  }

  /** Deterministic ~`num/den` sample: keeps rows whose bucket falls in
    * [0, num). A pure filter — pushes down to the scan like any other
    * predicate.
    */
  def sampleByHash(df: DataFrame, keyCol: String, num: Int, den: Int,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    require(num >= 0 && num <= den, s"need 0 <= num <= den (got $num/$den)")
    df.filter(hashBucket(col(keyCol), den, hash) < num)
  }

  /** Per-stratum deterministic sampling — the class-rebalancing shape
    * (downsample the dominant language/source, keep the rare ones whole)
    * done as a pure row-local predicate: keep a row when its hash bucket
    * falls below its stratum's per-mille rate. Same determinism contract
    * as [[sampleByHash]] (stable across runs, partitionings, and
    * engines), so rebalanced corpora are reproducible and auditable.
    * Strata absent from `rates` use `defaultPermille`; null strata use
    * the default too (their rows still need a keep-decision); null KEYS
    * drop out (null bucket fails every comparison), consistent with the
    * other samplers.
    *
    * Rates are per-mille (n/1000) so "keep 2.5%" is expressible; the
    * bucket count is fixed at 1000.
    */
  /** Per-group cap — crawl hygiene's "at most k documents per domain":
    * keep each group's first `k` rows in `orderCol` order (`orderCol`
    * must be unique within a group — pass the stable id, or a quality
    * score with an id tiebreak struct — and non-null: null-ordered rows
    * drop, the library's "null keys fall out of every sample, visibly"
    * rule). Float/double order columns may carry at most ONE NaN per
    * group; it ranks greatest (Spark's sort order), matching the
    * row_number-window form. STRUCT order columns must keep their
    * fields NaN-free (no per-field normalization happens inside a
    * struct comparison). Deterministic across runs, engines and
    * partitionings because membership depends only on column VALUES.
    *
    * Scale shape — deliberately NOT `row_number() OVER (PARTITION BY
    * group)`: that window sends every row of a group through ONE task,
    * and the operator's stated purpose (cap the dominant domain so it
    * can't swamp the mixture) is precisely the case where one group is
    * half the corpus — one task sorting 50 TB. Instead each group's
    * k-th smallest `orderCol` is computed by [[KthSmallest]] (an O(k)
    * bounded heap with map-side partials — the shuffle carries one
    * k-heap per group per map task, never rows), the per-group cuts —
    * one row per group — join back (broadcast by default; pass
    * `broadcastCuts = false` when groups are crawl-scale cardinality),
    * and the cap is the row-local filter `orderCol <= cut`. Uniqueness
    * of `orderCol` makes the cut exact: no ties straddle it. The
    * Gopher/C4-style pipelines apply exactly this before training.
    */
  /** Weighted sampling without replacement, per group (Efraimidis &
    * Spirakis, IPL 2006): each row draws the key u^(1/w) — u a
    * deterministic uniform in (0,1) from the pluggable stable hash of
    * `keyCol`, w the row's weight — and the group's `k` LARGEST keys
    * win. Inclusion probability is proportional to weight in the
    * without-replacement sense, yet the draw is a pure function of the
    * row: reproducible across runs, partitionings, and ENGINES (pass
    * [[DedupFunctions.md5Hash60]] and an external oracle recomputes
    * the identical sample — the d5 portability contract). The mixture
    * op behind "sample each source's documents ∝ quality/length
    * without a per-group serial pass". Null keys, null weights, and
    * weights ≤ 0 drop (visible-null rule).
    *
    * Scale shape: the key is a scan-local projection; selection rides
    * [[capPerGroup]]'s bounded KthSmallest heap on struct(-key, id) —
    * map-side partial cuts, broadcast cut join, row-local filter — so
    * nothing sorts and no group serializes through one task.
    */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, keyCol: String,
      weightCol: String, k: Int, buckets: Int = 1000000,
      hash: Column => Column = xxhash64(_),
      broadcastCuts: Boolean = true): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2 (got $buckets)")
    val es = graft.ops.ColNames.fresh(df.columns.toSet, "_es_key")
    val filtered = df.filter(col(keyCol).isNotNull &&
      col(weightCol).isNotNull && col(weightCol).cast("double") > 0.0)
    val u = (hashBucket(col(keyCol), buckets, hash).cast("double") + 0.5) /
      buckets.toDouble
    val keyed = filtered.withColumn(es,
      struct(negate(pow(u, lit(1.0) / col(weightCol).cast("double"))), col(keyCol)))
    capPerGroup(keyed, groupCol, es, k, broadcastCuts).drop(es)
  }

  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      k: Int, broadcastCuts: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val taken = df.columns.toSet
    val grp = graft.ops.ColNames.fresh(taken, "_grp")
    val cut = graft.ops.ColNames.fresh(taken + grp, "_cut")
    val cuts0 = df.groupBy(col(groupCol).as(grp))
      .agg(KthSmallest(col(orderCol), k).as(cut))
    val cuts = if (broadcastCuts) broadcast(cuts0) else cuts0
    // NaN hazard on float/double order columns: KthSmallest's ORDERING
    // ranks NaN greatest (Spark's sort semantics), but the row-local
    // `<=` comparison is IEEE — false against a NaN cut — so a group
    // whose k smallest include a NaN would drop WHOLESALE. Normalize
    // both sides through nanvl(+Inf) so a NaN cut behaves like the
    // ordering that produced it (and like the row_number window form).
    // Uniqueness still binds: at most one non-finite value per group,
    // or ties straddle the cut (same caveat as any duplicate value).
    val dt = df.schema(orderCol).dataType
    val isFloating = dt == org.apache.spark.sql.types.DoubleType ||
      dt == org.apache.spark.sql.types.FloatType
    def norm(c: Column): Column =
      if (isFloating) nanvl(c.cast("double"), lit(Double.PositiveInfinity)) else c
    // null-safe equality: a null GROUP is still a group and gets capped
    // like any other (the window form partitioned nulls together too)
    df.join(cuts, col(groupCol) <=> col(grp), "left")
      .filter(norm(col(orderCol)) <= norm(col(cut)))
      .drop(grp, cut)
  }

  /** Temperature-rebalanced deterministic downsample — the multilingual
    * LM sampling rule (sample group g proportionally to n_g^α) applied
    * as a pure hash filter. Group weights w_g = n_g^α / Σ n_h^α; group g
    * keeps rate r_g = min(1, targetFraction · N · w_g / n_g). α = 1
    * keeps every group at `targetFraction` (proportional); α = 0 gives
    * every group an equal row budget (aggressively upweights rare
    * groups); between, the published temperature interpolation. Rates
    * derive from the DATA (one count aggregation, broadcast back), so
    * unlike [[stratifiedSampleByHash]] no caller-supplied table is
    * needed and the rule adapts as the corpus grows.
    *
    * Determinism: membership is `hashBucket(key, 10⁶) < round(r_g, 6)
    * · 10⁶` — the rate is 6dp-rounded so engine-level `pow`/sum ulp
    * differences cannot flip a row, and the hash is pluggable
    * ([[DedupFunctions.md5Hash60]] for external replay). Null keys drop
    * out (null bucket), null groups rate like any other group value.
    */
  def temperatureSample(df: DataFrame, keyCol: String, groupCol: String,
      alpha: Double, targetFraction: Double,
      hash: Column => Column = xxhash64(_),
      broadcastRates: Boolean = true): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1] (got $alpha)")
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"targetFraction must be in (0, 1] (got $targetFraction)")
    // fresh helper names: an input frame that already carries "_grp"
    // etc. must not have its column silently dropped or made ambiguous
    val taken = df.columns.toSet
    val grp = graft.ops.ColNames.fresh(taken, "_grp")
    val rate = graft.ops.ColNames.fresh(taken + grp, "_rate")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val totals = counts.agg(
      sum(col("_n")).cast("double").as("_tot"),
      sum(pow(col("_n").cast("double"), alpha)).as("_pw"))
    val rates0 = counts.crossJoin(broadcast(totals))
      .select(col(groupCol).as(grp),
        round(least(lit(1.0),
          lit(targetFraction) * col("_tot") *
            pow(col("_n").cast("double"), alpha) / col("_pw") /
            col("_n").cast("double")), 6).as(rate))
    // groups are usually domains/languages (small → broadcast, the
    // default); `broadcastRates = false` is the crawl-scale-cardinality
    // escape hatch (same convention as broadcastVocab/broadcastTest)
    val rates = if (broadcastRates) broadcast(rates0) else rates0
    // null-safe equality: a null GROUP is still a group (the count
    // aggregation gave it a rate) — a plain equi-join would silently
    // drop all its rows instead of sampling them
    df.join(rates, col(groupCol) <=> col(grp), "left")
      .filter(hashBucket(col(keyCol), 1000000, hash) < col(rate) * 1e6)
      .drop(grp, rate)
  }

  /** Token-budget downsampling — the data-mixing shape ("at most B
    * tokens from each source/language in the final mixture"): each
    * group keeps rate r_g = min(1, B / Σ tokens_g), applied as the same
    * pure hash-bucket predicate the other samplers use, so the KEPT
    * token mass converges to the budget (law of large numbers over
    * hash buckets) while membership stays deterministic across runs,
    * partitionings, and engines. Groups already under budget keep
    * everything; rates are 6dp-rounded so engine-level division ulps
    * cannot flip a row (the temperatureSample contract).
    *
    * Scale shape: ONE token-sum aggregation to one row per group
    * (map-side combine), rates broadcast back (escape hatch
    * `broadcastRates = false` for crawl-cardinality groups), and the
    * keep-decision is a row-local filter — the corpus itself is never
    * shuffled. The rate-based form is what holds at 100 TB: an exact
    * greedy "take best docs until the budget fills" needs a per-group
    * ordered scan (one task per group — the capPerGroup anti-pattern);
    * compose with [[capPerGroup]] on a quality struct first when
    * quality-ranked selection matters. Null keys drop out (null
    * bucket); null groups budget like any other group value.
    */
  def tokenBudgetSample(df: DataFrame, keyCol: String, groupCol: String,
      tokensCol: String, budgetTokens: Long,
      hash: Column => Column = xxhash64(_),
      broadcastRates: Boolean = true): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1 (got $budgetTokens)")
    val taken = df.columns.toSet
    val grp = graft.ops.ColNames.fresh(taken, "_grp")
    val rate = graft.ops.ColNames.fresh(taken + grp, "_rate")
    val rates0 = df.groupBy(col(groupCol).as(grp))
      .agg(sum(col(tokensCol).cast("long")).as("_tok"))
      .select(col(grp),
        round(least(lit(1.0),
          lit(budgetTokens.toDouble) / col("_tok").cast("double")), 6).as(rate))
    val rates = if (broadcastRates) broadcast(rates0) else rates0
    // null-safe equality: a null GROUP still has a token sum and a rate
    df.join(rates, col(groupCol) <=> col(grp), "left")
      .filter(hashBucket(col(keyCol), 1000000, hash) < col(rate) * 1e6)
      .drop(grp, rate)
  }

  def stratifiedSampleByHash(df: DataFrame, keyCol: String, strataCol: String,
      ratesPermille: Map[String, Int], defaultPermille: Int,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    (ratesPermille.values.toSeq :+ defaultPermille).foreach(r =>
      require(r >= 0 && r <= 1000, s"per-mille rate must be in [0, 1000] (got $r)"))
    val limit = ratesPermille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(rate)).otherwise(acc)
      }
    df.filter(hashBucket(col(keyCol), 1000, hash) < limit)
  }

  /** Train/validation/test assignment as a COLUMN, so one pass tags the
    * whole corpus and downstream writers partition by it: buckets
    * [0, pctTrain) → "train", [pctTrain, pctTrain+pctValid) → "valid",
    * rest → "test". Percent units of 1/100.
    */
  def splitColumn(key: Column, pctTrain: Int, pctValid: Int,
      hash: Column => Column = xxhash64(_)): Column = {
    // bounded individually first — a pctTrain + pctValid Int overflow
    // would wrap negative and slip past a naive sum check
    require(pctTrain >= 0 && pctTrain <= 100 &&
      pctValid >= 0 && pctValid <= 100 - pctTrain,
      s"need pctTrain + pctValid <= 100 (got $pctTrain + $pctValid)")
    val b = hashBucket(key, 100, hash)
    // null bucket (null key) falls through every branch -> null split
    when(b < pctTrain, lit("train"))
      .when(b < pctTrain + pctValid, lit("valid"))
      .when(b.isNotNull, lit("test"))
  }

  /** Time-ordered split with an EMBARGO buffer (the backtest-correct
    * split for anything autocorrelated — de Prado's purged/embargoed
    * walk-forward): rows strictly before `cutoff` train; rows inside
    * `[cutoff, cutoff + embargo)` are QUARANTINED (neither side may see
    * them — adjacent-in-time rows leak labels through autocorrelation);
    * the rest test. A hash split ([[splitColumn]]) is the right tool for
    * exchangeable documents; for time series it leaks the future into
    * training, which this column exists to prevent.
    *
    * Pure per-row date arithmetic — a scan-local projection, no shuffle;
    * null times get a null split (never silently train).
    */
  def temporalSplit(time: Column, cutoff: Column, embargoDays: Int): Column = {
    require(embargoDays >= 0, s"embargoDays must be >= 0 (got $embargoDays)")
    when(time < cutoff, lit("train"))
      .when(time < date_add(cutoff, embargoDays), lit("embargo"))
      .when(time.isNotNull, lit("test"))
  }

  /** Quantile-bucket assignment (curriculum/difficulty binning): each
    * row gets the bucket its `valueCol` falls in among `nBuckets`
    * equal-mass bins. The scale-correct shape: a global `ntile()` window
    * would sort the WHOLE corpus through one partition; here the n−1
    * exact-percentile cut points reduce to ONE row, broadcast back, and
    * assignment is a per-row comparison count — no shuffle of the data.
    * Cut points are rounded to 6 dp before comparing (the a + (b−a)·frac
    * interpolation can differ by ulps across engines; the VALUES are
    * bit-reproducible, so comparing against rounded cuts makes the
    * assignment engine-portable — same contract as the a10 oracle).
    * At extreme scale swap `percentile` for `approx_percentile`: ±ε on
    * the cut points moves only rows within ε of a boundary.
    *
    * Null `valueCol` rows get a NULL bucket (unscored rows must never
    * silently land in the lowest curriculum bin, which is what the bare
    * comparison count — null > cut ⇒ null ⇒ counted 0 — used to do).
    * Callers wanting them binned must impute before calling.
    */
  /** DSIR importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): how much more
    * likely is each document under a TARGET distribution (the curated
    * corpus you wish you had more of) than under the RAW distribution
    * (the crawl you actually have). Features are hashed token unigrams
    * + bigrams (the paper's hashed n-gram parameterization); both
    * distributions are bag-of-buckets models with Laplace smoothing
    * `alpha`, and a doc's log-ratio is the SUM over its feature
    * occurrences of ln p_target(b) − ln p_raw(b) (longer on-target
    * docs score higher — the paper's likelihood-ratio semantics).
    * Returns (idCol, log_ratio) with log_ratio 6dp-rounded; docs with
    * no features (empty text) score 0. Null text scores 0 too (no
    * features — visible in the log_ratio, the row is never dropped).
    *
    * Scale shape: one explode per corpus into hashed-bucket rows; each
    * model is ONE map-side-partial count aggregation collapsed to ≤
    * `buckets` rows, broadcast back (fixed size by construction —
    * `buckets` bounds the model, not the corpus; `broadcastModels =
    * false` routes crawl-cardinality bucket counts through shuffled
    * equi-joins); scoring is a row-local lookup + one per-doc sum.
    * The TARGET corpus is typically tiny (a benchmark/curated set) —
    * its explode is noise next to the raw scan.
    */
  /** The hashed unigram+bigram feature explode shared by
    * [[importanceWeights]] (DSIR) and the classifier surfaces
    * ([[ClassifierFunctions]]): one output row per feature OCCURRENCE
    * — `keep` columns plus `_b`, the feature's hash bucket in
    * [0, buckets). The fastText/DSIR feature parameterization: token
    * unigrams plus adjacent-pair bigrams of the lowercased
    * whitespace split. Scan-local (explode off the projection, no
    * shuffle); empty/null text yields no rows — callers re-attach
    * featureless docs themselves.
    */
  def hashedNgramFeatures(d: DataFrame, textCol: String, buckets: Int,
      hash: Column => Column = xxhash64(_), keep: Seq[Column] = Nil): DataFrame = {
    val exploded = d.select(keep :+ explode(TextFunctions.bound(
        split(lower(trim(col(textCol))), "\\s+")) { toks =>
      TextFunctions.bound(filter(toks, t => length(t) > 0)) { tk =>
        TextFunctions.bound(size(tk)) { n =>
          val unis = tk
          val bis = when(n < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), n - 1), i =>
              concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
          concat(unis, bis)
        }
      }
    }).as("_feat"): _*)
    // kept columns by OUTPUT name — `keep` may carry aliases/casts that
    // only exist after the select above
    val kept = exploded.columns.dropRight(1).map(col).toSeq
    exploded.select(kept :+ hashBucket(col("_feat"), buckets, hash).as("_b"): _*)
  }

  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String,
      buckets: Int = 1 << 16, alpha: Double = 1.0,
      hash: Column => Column = xxhash64(_),
      broadcastModels: Boolean = true): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2 (got $buckets)")
    require(alpha > 0.0, s"alpha must be > 0 (got $alpha)")
    def features(d: DataFrame, cols: Column*): DataFrame =
      hashedNgramFeatures(d, textCol, buckets, hash, cols)
    def model(d: DataFrame): DataFrame =
      features(d).groupBy(col("_b")).agg(count(lit(1)).as("_n"))
    def maybeBroadcast(d: DataFrame) = if (broadcastModels) broadcast(d) else d
    val rawModel = model(raw)
    val targetModel = model(target)
    val rawTotal = rawModel.agg(sum(col("_n")).as("_rt"))
    val targetTotal = targetModel.agg(sum(col("_n")).as("_tt"))
    // ln((c + α) / (N + α·buckets)) per side; unseen buckets take the
    // smoothed floor, so the ratio is finite everywhere
    val scored = features(raw, col(idCol))
      .join(maybeBroadcast(targetModel.withColumnRenamed("_n", "_nt")), Seq("_b"), "left")
      .join(maybeBroadcast(rawModel.withColumnRenamed("_n", "_nr")), Seq("_b"), "left")
      .crossJoin(broadcast(targetTotal)).crossJoin(broadcast(rawTotal))
      .groupBy(col(idCol))
      .agg(sum(
        log((coalesce(col("_nt"), lit(0L)).cast("double") + alpha) /
          (col("_tt").cast("double") + alpha * buckets)) -
          log((coalesce(col("_nr"), lit(0L)).cast("double") + alpha) /
            (col("_rt").cast("double") + alpha * buckets))).as("_lr"))
    raw.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), round(coalesce(col("_lr"), lit(0.0)), 6).as("log_ratio"))
  }

  /** DSIR selection: importance-RESAMPLE `k` documents from the raw
    * corpus toward the target distribution — the paper's Gumbel-top-k
    * draw (select the k largest log_ratio + gᵢ, gᵢ standard Gumbel
    * noise), with the Gumbel made DETERMINISTIC the library way: uᵢ
    * from the pluggable stable hash of the id, gᵢ = −ln(−ln uᵢ). A
    * pure function of (corpus content, id) — reproducible across
    * runs, partitionings, and engines, like every sampler here.
    *
    * Selection is the global-top-k bounded-heap cut ([[capPerGroup]]
    * over one group — KthSmallest map-side partials, never a global
    * sort or driver-side merge of more than the cut row). Scores tie-
    * break by id through the struct order. Returns the selected rows
    * of `raw` with their `log_ratio` and `score` columns appended.
    */
  def dsirSample(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, k: Int,
      buckets: Int = 1 << 16, alpha: Double = 1.0,
      gumbelBuckets: Int = 1000000,
      hash: Column => Column = xxhash64(_),
      broadcastModels: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val weights = importanceWeights(raw, target, idCol, textCol,
      buckets, alpha, hash, broadcastModels)
    val u = (hashBucket(col(idCol).cast("string"), gumbelBuckets, hash)
      .cast("double") + 0.5) / gumbelBuckets.toDouble
    val taken = raw.columns.toSet + "log_ratio" + "score"
    val es = graft.ops.ColNames.fresh(taken, "_dsir_key")
    val grp = graft.ops.ColNames.fresh(taken + es, "_dsir_g")
    val keyed = raw.join(weights, Seq(idCol))
      .withColumn("score",
        round(col("log_ratio") - log(-log(u)), 6).as("score"))
      .withColumn(es, struct(negate(col("score")), col(idCol)))
      .withColumn(grp, lit(1))
    capPerGroup(keyed, grp, es, k).drop(es, grp)
  }

  /** Hash-derived Laplace noise via the inverse CDF — the
    * differential-privacy-SHAPED count-release primitive, made
    * DETERMINISTIC the library way (the [[dsirSample]] Gumbel
    * convention): u = (hashBucket(key) + 0.5) / buckets ∈ (0, 1), then
    *
    *   noise = −b · sign(u − ½) · ln(1 − 2·|u − ½|)   (Laplace(0, b))
    *
    * with b = sensitivity / ε. u never hits ½ exactly (half-offset
    * grid) and |u − ½| < ½ strictly, so sign and ln are total. An
    * engine replays the identical noise from the same hash — which is
    * exactly why this is a REPLAYABLE STAND-IN, not calibrated privacy:
    * real ε-DP requires fresh secret randomness per release. The
    * operator carries the production plumbing (per-cell noise keyed by
    * the release cell, sensitivity-1 count shape, ε sweep for the
    * utility audit); swap this noise source for a secure RNG at the
    * release boundary to make it a real mechanism (Dwork & Roth 2014,
    * §3.3).
    */
  def hashLaplace(key: Column, b: Column,
      buckets: Int = 1000000,
      hash: Column => Column = DedupFunctions.md5Hash60(_)): Column = {
    val u = (hashBucket(key, buckets, hash).cast("double") + 0.5) / buckets.toDouble
    val t = u - lit(0.5)
    -b * signum(t) * log(lit(1.0) - lit(2.0) * abs(t))
  }

  def quantileBucket(df: DataFrame, idCol: String, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2 (got $nBuckets)")
    val fracs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val cuts = df.agg(
      expr(s"percentile($valueCol, array(${fracs.mkString("D,")}D))").as("_cuts"))
    df.select(col(idCol), col(valueCol))
      .crossJoin(broadcast(cuts))
      .select(col(idCol), col(valueCol),
        when(col(valueCol).isNotNull,
          aggregate(col("_cuts"), lit(0),
            (acc, c) => acc + when(col(valueCol) > round(c, 6), 1).otherwise(0)))
          .as("bucket"))
  }

  /** Per-GROUP quantile-bucket assignment — curriculum binning inside
    * each language/domain instead of over the pooled corpus (a pooled
    * binning would grade every low-resource language against the
    * dominant one's score distribution). Same scale shape and
    * engine-portability contract as [[quantileBucket]]: the n−1 exact
    * per-group cut points reduce to ONE row per group through an
    * aggregation, join back (broadcast by default — groups are
    * languages/domains; `broadcastCuts = false` for crawl-cardinality
    * groups), and assignment is a per-row comparison count against
    * 6dp-rounded cuts. Null values get a NULL bucket; null GROUPS are
    * binned within their own stratum (null-safe join). At extreme
    * scale swap `percentile` for `approx_percentile`, as
    * [[quantileBucket]] documents.
    */
  def quantileBucketByGroup(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, nBuckets: Int,
      broadcastCuts: Boolean = true): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2 (got $nBuckets)")
    val fracs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val taken = df.columns.toSet
    val grp = graft.ops.ColNames.fresh(taken, "_grp")
    val cutsCol = graft.ops.ColNames.fresh(taken + grp, "_cuts")
    val cuts0 = df.groupBy(col(groupCol).as(grp)).agg(
      expr(s"percentile($valueCol, array(${fracs.mkString("D,")}D))").as(cutsCol))
    val cuts = if (broadcastCuts) broadcast(cuts0) else cuts0
    df.select(col(idCol), col(groupCol), col(valueCol))
      .join(cuts, col(groupCol) <=> col(grp), "left")
      .select(col(idCol), col(groupCol), col(valueCol),
        when(col(valueCol).isNotNull,
          aggregate(col(cutsCol), lit(0),
            (acc, c) => acc + when(col(valueCol) > round(c, 6), 1).otherwise(0)))
          .as("bucket"))
  }

  /** Sequence packing: assign each document to a fixed-token-budget pack
    * (the pre-training batching shape — documents are concatenated into
    * `budgetTokens`-sized training sequences, and the assignment must be
    * deterministic so every re-run of the corpus job builds identical
    * shards). Documents are sharded by `idCol % shards`, ordered by id
    * within the shard, and a document starts in the pack its running
    * token PREFIX falls in: `pack = prefix_before_doc div budget`.
    * A document longer than the budget simply spans packs (the trainer's
    * splitter handles intra-document boundaries).
    *
    * Output: (idCol, shard, pack_id, prefix_tokens) — pack_id is unique
    * WITHIN a shard; (shard, pack_id) is the global pack key.
    *
    * Scale shape: ONE shuffle (hash by shard), then per-shard window
    * cumsum — each shard's packing is independent, so parallelism =
    * `shards` (size it to the cluster, e.g. one shard per output file).
    * A single global greedy pack would serialize the whole corpus
    * through one partition; per-shard packing trades ≤ one partially
    * filled pack per shard for full parallelism. All-integer math —
    * bit-identical in any engine.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budgetTokens: Long, shards: Int): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1 (got $budgetTokens)")
    require(shards >= 1, s"shards must be >= 1 (got $shards)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(idCol), pmod(col(idCol), lit(shards.toLong)).as("shard"),
        col(tokensCol).cast("long").as("_tok"))
      .withColumn("prefix_tokens", sum(col("_tok")).over(w) - col("_tok"))
      // `div` (integer division), not `/`: Long / Long is a DOUBLE in
      // Spark SQL, and a 100 TB corpus's token prefix can pass 2^53
      .select(col(idCol), col("shard"),
        expr(s"prefix_tokens div ${budgetTokens}L").as("pack_id"),
        col("prefix_tokens"))
  }

  /** Materialize the packs [[packSequences]] assigns: per (shard, pack),
    * the documents concatenated in id order with `sep` — the actual
    * training-sequence payload a shard writer emits. Returns
    * (shard, pack_id, n_docs, pack_tokens, packed_text).
    *
    * Scale shape: the assignment join is on the id (the packing frame
    * carries ids and counts only — never text), then ONE shuffle of the
    * text to its (shard, pack) group. That shuffle is the shard write
    * itself — linear, unavoidable, and evenly spread because packs are
    * budget-bounded. In-group order is made explicit by sorting the
    * collected (id, text) structs — `collect_list` order is otherwise
    * partition-arrival nondeterministic.
    */
  def materializePacks(df: DataFrame, idCol: String, textCol: String,
      tokensCol: String, budgetTokens: Long, shards: Int,
      sep: String = "\n"): DataFrame = {
    val assign = packSequences(
      df.select(col(idCol), col(tokensCol)), idCol, tokensCol, budgetTokens, shards)
    df.select(col(idCol), col(textCol), col(tokensCol).cast("long").as("_tok"))
      .join(assign, Seq(idCol))
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_tok")).as("pack_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol), col(textCol).as("_t")))),
            s => s.getField("_t")),
          sep).as("packed_text"))
  }

  /** Epoch-weighted source blending — the Dolma/Megatron-style mixture
    * step: each row is emitted `epochs` times into the training blend,
    * where `epochs` is a per-row expression (typically a source→weight
    * when-chain or literal map). Non-integer epochs split
    * deterministically: every row gets `⌊epochs⌋` copies, and the rows
    * whose id hash-bucket falls below the fractional part get one more
    * — so a 2.25-epoch source repeats twice corpus-wide plus a fixed
    * quarter a third time, and a 0.5-epoch source keeps a fixed half.
    * Upsampling by REPETITION (not sampling with replacement) is the
    * blend semantics LLM data recipes publish: coverage stays complete
    * per whole epoch and the mix is reproducible run to run.
    *
    * Output: input columns + `copy` (1-based). Purely scan-local —
    * an explode emitting ≤ ⌈epochs⌉ rows per input row, no shuffle,
    * no state; epochs may vary row by row. The hash key is
    * `idCol` CAST TO STRING (md5/xxhash of the digits), so an external
    * engine replays the fractional cut exactly (the d21 oracle).
    * A NULL id hashes to a NULL bucket, which never takes the
    * fractional copy — such rows still get their ⌊epochs⌋ whole-epoch
    * copies, visibly.
    */
  def epochBlend(df: DataFrame, idCol: String, epochs: Column,
      buckets: Int = 1 << 20,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2 (got $buckets)")
    val copies = TextFunctions.bound(epochs.cast("double")) { e =>
      TextFunctions.bound(floor(e).cast("long") +
          when(hashBucket(col(idCol).cast("string"), buckets, hash)
            .cast("double") < (e - floor(e)) * buckets, 1L).otherwise(0L)) { n =>
        when(n <= 0, array().cast("array<bigint>"))
          .otherwise(sequence(lit(1L), n))
      }
    }
    df.withColumn("copy", explode(copies))
  }

  /** Deterministic contrastive negative sampling (the DPR / SimCLR
    * data-prep step): for every anchor row, `k` negatives drawn from a
    * bounded candidate POOL, restricted to a DIFFERENT `groupCol`
    * value (a same-source "negative" is too often a near-positive) and
    * never the anchor itself. Both draws are pure hash functions of
    * the ids — the pool is the `poolSize` smallest `hash(salt#p#id)`
    * keys, each anchor's negatives its `k` smallest
    * `hash(salt#anchor#neg)` keys — so the sample is reproducible
    * across runs, partitionings, and engines, and re-running a feature
    * build regenerates byte-identical training pairs.
    *
    * Returns (anchor_id, neg_id, skey), `skey` the selection key
    * (kept so downstream audits can re-verify the draw).
    *
    * UNDER-DELIVERY contract: `k` negatives per anchor are guaranteed
    * only while the pool retains ≥ k rows from OTHER groups. An anchor
    * whose own group occupies more than `poolSize − k` pool slots
    * receives fewer than k negatives — silently, by design (the draw
    * stays a pure hash function; padding would break reproducibility).
    * Detection is one group-by on the output
    * (`groupBy("anchor_id").count() < k`); the fix is a larger
    * `poolSize` or a finer `groupCol`. With a roughly uniform group
    * mix the starvation case needs one group to dominate the corpus —
    * audit the group histogram before trusting a skewed corpus.
    *
    * Scale shape: the pool is TakeOrdered-bounded and BROADCAST, so
    * the candidate join is one narrow nested-loop pass over the corpus
    * against `poolSize` rows — O(n·poolSize) with NO shuffle of the
    * corpus; selection rides [[capPerGroup]]'s bounded KthSmallest
    * heap (map-side partials), never a per-anchor window. An unpooled
    * all-pairs variant would be O(n²) — the pool IS the scale design,
    * and statistically the draw stays uniform over the pool.
    */
  def negativeSample(df: DataFrame, idCol: String, groupCol: String,
      k: Int, poolSize: Int = 1000, salt: String = "neg",
      hash: Column => Column = DedupFunctions.md5Hash60): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(poolSize > k, s"poolSize must exceed k (got $poolSize <= $k)")
    val pool = df
      .select(col(idCol).cast("long").as("neg_id"), col(groupCol).as("_gb"))
      .withColumn("_pk", hash(concat_ws("#", lit(salt), lit("p"), col("neg_id"))))
      .orderBy("_pk", "neg_id").limit(poolSize) // TakeOrdered, not a sort
      .drop("_pk")
    df.select(col(idCol).cast("long").as("anchor_id"), col(groupCol).as("_ga"))
      .crossJoin(broadcast(pool))
      .filter(!(col("_ga") <=> col("_gb")) && col("anchor_id") =!= col("neg_id"))
      .withColumn("skey",
        hash(concat_ws("#", lit(salt), col("anchor_id"), col("neg_id"))))
      .withColumn("_ord", struct(col("skey"), col("neg_id")))
      .transform(capPerGroup(_, "anchor_id", "_ord", k))
      .select(col("anchor_id"), col("neg_id"), col("skey"))
  }
}
