package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators for corpus monitoring at 100 TB — the
  * family the library already uses piecewise (Bloom membership on the
  * ingest gate, HLL distinct counts in a7b, space-saving heavy hitters
  * in t6, approximate percentiles in a10b), completed with count-min
  * frequency estimation.
  *
  * Why a sketch and not `groupBy(key).count()`: the exact count table
  * is itself data-sized for a crawl-scale key domain (URLs, shingles,
  * user ids) — materializing it to answer "how often does THIS key
  * occur" costs a full shuffle and a table nobody can hold. A
  * count-min sketch is a fixed few-KB array, built in one pass with
  * map-side merging, whose estimate is within eps·N of truth (never
  * under) with the configured confidence — the right answer shape for
  * drift alarms, abuse throttles, and join-skew probes.
  */
object SketchFunctions {

  /** The MERGEABLE PRE-AGGREGATION pattern: build per-(keys) DataSketches
    * HLL sketches ONCE; answer every COARSER distinct-count rollup
    * forever by unioning stored sketches ([[hllRollup]]) — the 100 TB
    * replacement for re-scanning raw events per reporting window
    * ("daily uniques, weekly uniques, 28-day actives" each cost a full
    * scan exactly once under this table). `lgK` fixes the sketch
    * geometry: unions of same-lgK sketches are LOSSLESS, so rolling up
    * daily sketches yields the IDENTICAL estimate a direct sketch over
    * the whole span would (the merge ≡ direct property the spec pins);
    * relative standard error ≈ 1.04/√2^lgK (~1.6 % at the default 12),
    * and at small cardinalities the sketch runs in its exact sparse
    * mode. One hash aggregation with map-side sketch merging; each
    * sketch is a few KB regardless of data size.
    */
  def hllSketchTable(df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(keys.nonEmpty, "hllSketchTable needs at least one key column")
    df.groupBy(keys.map(col): _*).agg(
      hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"),
      count(col(valueCol)).as("n_rows"))
  }

  /** Roll a [[hllSketchTable]] up to coarser keys: union the stored
    * sketches (strict same-lgK merge — a silent cross-geometry union
    * would quietly degrade accuracy) and estimate. Returns the rolled
    * keys + (approx_distinct, n_rows). The raw data is never touched —
    * this is the query side of the pre-aggregation contract.
    */
  def hllRollup(sketches: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "hllRollup needs at least one key column")
    sketches.groupBy(keys.map(col): _*).agg(
      hll_sketch_estimate(hll_union_agg(col("hll"), lit(false)))
        .as("approx_distinct"),
      sum(col("n_rows")).as("n_rows"))
  }

  /** Approximate frequencies of `probes` keys in `df`'s `keyCol` via a
    * count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005;
    * Spark's built-in mergeable implementation). One pass over the
    * data (tree-aggregated partial sketches, nothing keyed shuffles);
    * the probe set is BOUNDED by contract (it broadcasts the estimates
    * back as a literal frame) — the "small side" assumption every
    * driver-bounded operator here shares.
    *
    * Returns (key, est) with the CMS guarantee:
    * exact ≤ est ≤ exact + eps·N at the given confidence. Null keys
    * are skipped by the sketch (visible-null rule: they never probe).
    */
  def cmsCounts(df: DataFrame, keyCol: String, probes: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(probes.nonEmpty, "cmsCounts needs at least one probe key")
    val spark = df.sparkSession
    import spark.implicits._
    val sketch = df.stat.countMinSketch(
      col(keyCol).cast("string"), eps, confidence, seed)
    probes.map(k => (k, sketch.estimateCount(k)))
      .toDF(keyCol, "est")
  }
}
