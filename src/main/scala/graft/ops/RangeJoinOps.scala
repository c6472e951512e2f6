package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval join ("range join"): match each point
  * row to every interval row of the same key whose half-open window
  * `[start, end)` contains the point's timestamp.
  *
  * Spark's built-in answer to a `t BETWEEN start AND end` predicate with
  * only equi-keys beside it is a broadcast-nested-loop or a sort-merge
  * join on the key followed by a per-key cross filter — O(|points| ×
  * |intervals per key|) comparisons, which melts when one key is hot or
  * intervals are many. The scalable composition is BUCKET DECOMPOSITION:
  * quantize time into `bucketSeconds` cells, explode each interval into
  * the cells it overlaps, and hash-join points to interval-cells on
  * (keys, cell) before applying the exact containment filter.
  * Comparisons drop to O(|points| + |intervals| × span/bucket) and the
  * join is a plain shuffled equi-join — AQE handles skew, no custom
  * physical operator needed. The same shape serves stream-stream
  * interval joins (Flink's interval join and KSQL's WITHIN clause are
  * this composition with watermarks).
  *
  * Choose `bucketSeconds` near the TYPICAL interval length: much smaller
  * multiplies the interval-side explode; much larger packs unrelated
  * rows into each cell and pushes work into the post-join filter.
  *
  * A point matches exactly once per containing interval (its single cell
  * meets each interval's exploded cell list at one row), so no
  * post-join dedup is needed. Null timestamps/bounds drop out (null
  * cell never equi-joins). Sub-second precision: cells come from
  * second-floored timestamps, so with `bucketSeconds >= 1` a point's
  * cell is always within the interval's exploded range — the exact
  * filter then compares the ORIGINAL timestamps at full precision.
  */
object RangeJoinOps {

  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1 (got $bucketSeconds)")
    require(keys.nonEmpty, "intervalJoin needs at least one equi-key")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns must be disjoint across sides (both have: " +
        s"${overlap.mkString(", ")}); rename before joining")
    val cell = ColNames.fresh((points.columns ++ intervals.columns).toSet, "_cell")
    def cellOf(ts: org.apache.spark.sql.Column) =
      floor(unix_timestamp(ts) / bucketSeconds)
    val p = points.withColumn(cell, cellOf(col(pointCol)))
    // end is EXCLUSIVE, but the cell range stays inclusive of end's cell:
    // one possibly-empty extra cell beats an off-by-one when end sits
    // exactly on a bucket boundary; the exact filter discards the rest
    val iv = intervals.withColumn(cell,
      explode(sequence(cellOf(col(startCol)), cellOf(col(endCol)))))
    p.join(iv, keys :+ cell)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop(cell)
  }
}
