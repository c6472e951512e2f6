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
