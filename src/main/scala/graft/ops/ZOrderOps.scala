package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data clustering for scan pruning — the
  * Delta/Iceberg `OPTIMIZE ZORDER` technique (Morton order, 1966).
  *
  * A table sorted by one column prunes scans only on that column's
  * predicates: every file's min/max on the OTHER columns spans the
  * whole domain. Interleaving the bits of several bounded dimension
  * keys yields one sort key whose ranges are spatially local, so
  * range-partitioning + sorting by it gives every partition/file a
  * tight bounding box in EVERY dimension — parquet min/max statistics
  * then prune on any of them. At 100 TB this is the difference between
  * "fast queries on ship-date" and "fast queries on ship-date OR
  * supplier OR part".
  *
  * The z-value is pure bit arithmetic — codegen'd, scan-local,
  * replayable bit-for-bit by any engine (the z1 oracle recomputes it
  * in SQL).
  */
object ZOrderOps {

  /** Morton-interleave expression: bit i of dimension j lands at
    * output position i·n + j (n = number of dims). Dimension values
    * are clamped into [0, 2^bits) — callers bucket real columns into
    * that range first (e.g. `pmod(k, 256)`, day-number, quantile
    * bucket). `bits · dims.size` must fit a signed long.
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.size >= 2, s"z-order needs >= 2 dimensions (got ${dims.size})")
    require(bits >= 1 && bits * dims.size <= 62,
      s"bits=$bits x ${dims.size} dims must fit a signed long")
    val n = dims.size
    val clamped = dims.map(d =>
      least(greatest(d.cast("long"), lit(0L)), lit((1L << bits) - 1)))
    val terms = for {
      i <- 0 until bits
      (d, j) <- clamped.zipWithIndex
    } yield shiftright(d, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j))
    terms.reduce(_ + _)
  }

  /** The z1 oracle's SQL twin of [[zValue]], generated from the same
    * loop so the two expressions cannot drift.
    */
  def zValueSql(dims: Seq[String], bits: Int): String = {
    val n = dims.size
    val clamped = dims.map(d =>
      s"least(greatest(CAST($d AS BIGINT), 0), ${(1L << bits) - 1})")
    (for {
      i <- 0 until bits
      (d, j) <- clamped.zipWithIndex
    } yield s"(($d >> $i) & 1) * ${1L << (i * n + j)}").mkString(" + ")
  }

  /** Cluster a frame for multidimensional pruning: compute the
    * z-value, RANGE-repartition on it (contiguous z-ranges →
    * contiguous partition bounding boxes; the sampling-based range
    * exchange is one pass), and sort within partitions so parquet
    * row-group stats are tight too. The z column is dropped — layout
    * is the product, not a value.
    */
  def zOrder(df: DataFrame, dims: Seq[String], bits: Int,
      partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1 (got $partitions)")
    val z = ColNames.fresh(df.columns.toSet, "_zorder")
    df.withColumn(z, zValue(dims.map(col), bits))
      .repartitionByRange(partitions, col(z))
      .sortWithinPartitions(z)
      .drop(z)
  }
}
