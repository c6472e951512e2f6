package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Incremental JOIN-view maintenance over insert-only deltas — the join
  * companion to [[IncrementalAgg]]: for a materialized view
  * V = R ⋈ S, tonight's change is exactly
  *
  *   ΔV = (ΔR ⋈ S_old) ∪ (R_old ⋈ ΔS) ∪ (ΔR ⋈ ΔS)
  *
  * (the classic counting/delta algebra — Griffin & Libkin, SIGMOD 1995;
  * insert-only, so no deletion terms), and the maintained view is
  * V_old ∪ ΔV with V_old NEVER recomputed.
  *
  * Scale shape: every term of ΔV has a delta-sized side, so each join
  * BROADCASTS its delta (the default; flip `broadcastDeltas` off for a
  * pathological mega-batch and AQE plans them as shuffle joins) — the
  * two history tables are scanned once each and never shuffled, and
  * V_old is appended to, not touched. At 100 TB this is the difference
  * between a nightly view refresh costing O(|Δ|) and costing a full
  * R ⋈ S re-shuffle.
  */
object IncrementalJoin {

  /** The delta term ΔV for insert-only deltas. `keys` are the equi-join
    * columns (same names on both sides).
    */
  def deltaJoin(rOld: DataFrame, rDelta: DataFrame, sOld: DataFrame,
      sDelta: DataFrame, keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "deltaJoin needs at least one join key")
    def b(d: DataFrame) = if (broadcastDeltas) broadcast(d) else d
    b(rDelta).join(sOld, keys)
      .unionByName(rOld.join(b(sDelta), keys))
      .unionByName(b(rDelta).join(b(sDelta), keys))
  }

  /** The maintained view V_old ∪ ΔV. Correctness invariant (the ivm2
    * oracle and the spec both pin it): this EQUALS the from-scratch
    * (R_old ∪ ΔR) ⋈ (S_old ∪ ΔS) row-for-row.
    */
  def maintain(viewOld: DataFrame, rOld: DataFrame, rDelta: DataFrame,
      sOld: DataFrame, sDelta: DataFrame, keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame =
    viewOld.unionByName(
      deltaJoin(rOld, rDelta, sOld, sDelta, keys, broadcastDeltas))
}
