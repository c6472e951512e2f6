package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key summary table as
  * MERGEABLE partial states (count / exact-decimal sum / min / max) so a
  * nightly batch folds into the stored summary with one key-sized merge —
  * the history is NEVER rescanned. This is the view-maintenance algebra
  * (self-maintainable aggregates over insert-only deltas, Palpanas et al.
  * VLDB 2002): each state is a commutative monoid, so
  * `partials(A ∪ B) = merge(partials(A), partials(B))` exactly — no
  * floating drift, because the one non-integer state (the sum) is exact
  * DECIMAL, and derived ratios (mean) are computed only AT READ.
  *
  * Scale shape: `partials` is one map-side-combining hash aggregation of
  * the delta; `merge` shuffles only key-cardinality summary rows (at
  * 100 TB the fact scan happens once, the night it lands). The same
  * pattern extends to any monoid state — HLL registers
  * ([[graft.functions.SketchFunctions]]), CMS counters, top-k heaps —
  * this object pins the exact-arithmetic core the oracle can replay.
  */
object IncrementalAgg {

  /** Per-key partial states of `valueCol` (an exact DECIMAL expression):
    * (keys..., n, sum, min, max). Deterministic: all four states are
    * order-independent.
    */
  def partials(df: DataFrame, keyCols: Seq[String], value: Column): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(value).as("sum"),
        min(value).as("min"),
        max(value).as("max"))

  /** Fold any number of partial frames into one: states merge by their
    * own monoid (counts add, sums add, mins min, maxes max). Associative
    * and commutative — batch arrival order cannot change the result.
    */
  def merge(keyCols: Seq[String], parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "merge needs at least one partial frame")
    parts.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum")).as("sum"),
        min(col("min")).as("min"),
        max(col("max")).as("max"))
  }
}
