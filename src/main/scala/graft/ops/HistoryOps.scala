package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) history compression: collapse
  * a per-entity, per-period state series into validity intervals — one
  * row per RUN of consecutive periods with the same state, carrying
  * `valid_from` / `valid_to` / run length. The classic dimension-build
  * move in a warehouse (Kimball's type-2 dimension), and equally the
  * "compress the label history" step before training on slowly-moving
  * features.
  *
  * Algorithm: gaps-and-islands — a 1-lag change flag, a running sum of
  * flags as the island id, then one aggregation per (entity, island).
  * All-integer/date arithmetic: exactly replayable cross-engine.
  *
  * Scale shape: both windows partition by the ENTITY (parallel across
  * entities, never a global window); the final agg is one hash
  * aggregation keyed (entity, island). History for one entity must fit
  * a partition's window buffer — the same contract as every W-family
  * feature window (thousands of periods per entity: trivially true).
  */
object HistoryOps {

  /** Compress `df` into SCD2 validity intervals.
    *
    * @param entityCol partition key (e.g. ticker)
    * @param orderCol  period column, ascending (e.g. date)
    * @param stateCol  the tracked state expression's column name
    * @return (entity, state, valid_from, valid_to, n_periods), one row
    *         per state run, ordered by (entity, valid_from)
    */
  def scd2Compress(df: DataFrame, entityCol: String, orderCol: String,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(orderCol)
    // change flag vs the previous period; null-safe so a NULL state is
    // its own run rather than merging into its neighbor
    val changed = when(
      lag(col(stateCol), 1).over(w) <=> col(stateCol), 0L).otherwise(1L)
    df.withColumn("_chg", changed)
      .withColumn("_grp",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(entityCol), col("_grp"))
      .agg(
        // the state is constant within a run by construction
        min(col(stateCol)).as(stateCol),
        min(col(orderCol)).as("valid_from"),
        max(col(orderCol)).as("valid_to"),
        count(lit(1)).as("n_periods"))
      .drop("_grp")
      .orderBy(entityCol, "valid_from")
  }

  /** Point-in-time snapshot over an SCD2 history: each entity's state
    * AS OF `asOf` — the run with the latest `valid_from` ≤ asOf (SCD2
    * current-until-superseded semantics: a run stays in force past its
    * last observed period until the next run begins, so the upper
    * bound is the successor's start, not `valid_to`). Entities whose
    * history starts after `asOf` are absent — they did not exist yet.
    *
    * The time-travel read every warehouse backfill / repro job needs:
    * "rebuild the feature table exactly as the model saw it on date T"
    * against the [[scd2Compress]] output instead of a full raw-history
    * replay.
    *
    * Scale shape: ONE hash aggregation — `max_by` over the eligible
    * runs (map-side partials; never a window, never a sort); history
    * tables are runs-sized, far smaller than the raw periods.
    */
  def asOfSnapshot(history: DataFrame, entityCol: String,
      validFromCol: String, asOf: Column): DataFrame = {
    val rest = history.columns.filter(_ != entityCol).toIndexedSeq
    history.filter(col(validFromCol) <= asOf)
      .groupBy(col(entityCol))
      .agg(max_by(struct(rest.map(col): _*), col(validFromCol)).as("_r"))
      .select(col(entityCol) +: rest.map(c => col(s"_r.$c").as(c)): _*)
      .orderBy(entityCol)
  }

  /** Keyed snapshot diff — change-data capture between two versions of
    * a table without a changelog: emits one row per key whose state
    * differs, tagged `insert` (key only in `newDf`), `delete` (only in
    * `oldDf`) or `update` (present in both, any non-key column differs
    * null-safely), with the old and new value columns side by side.
    * The audit/backfill primitive behind "what did last night's rebuild
    * actually change" and the input to an incremental downstream
    * refresh (the ivm1/ivm2 deltas, derived rather than assumed).
    *
    * Both frames must share the schema; unchanged keys are dropped.
    *
    * Scale shape: ONE shuffled full-outer equi-join on the key hash —
    * each snapshot shuffles once, AQE handles skewed keys — and the
    * value comparison is a codegen'd null-safe struct equality, no
    * per-column joins and no hashing round-trip (a hash pre-filter
    * saves nothing here: the join already co-locates the pair, and a
    * hash would add a false-equality risk the struct compare doesn't
    * have). Output is change-volume-sized.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"snapshot schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val vals = oldDf.columns.filterNot(keys.contains).toIndexedSeq
    require(vals.nonEmpty, "snapshotDiff needs at least one non-key column")
    val o = oldDf.select(keys.map(col) :+ struct(vals.map(col): _*).as("_o"): _*)
    val n = newDf.select(keys.map(col) :+ struct(vals.map(col): _*).as("_n"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("_o").isNull, "insert")
          .when(col("_n").isNull, "delete")
          .when(!(col("_o") <=> col("_n")), "update"))
      .filter(col("change").isNotNull)
      .select(keys.map(col) ++ Seq(col("change")) ++ vals.flatMap(c =>
        Seq(col(s"_o.$c").as(s"old_$c"), col(s"_n.$c").as(s"new_$c"))): _*)
  }
}
