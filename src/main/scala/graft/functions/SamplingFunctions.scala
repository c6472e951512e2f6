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
}
