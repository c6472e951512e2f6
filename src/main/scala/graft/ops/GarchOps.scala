package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import scala.collection.mutable.ArrayBuffer

/** O(n) per-entity GARCH(1,1) variance filter in exact integer
  * picounits (1e-12 units), replacing the O(n²) `aggregate`-fold shape
  * (each `concat(acc.out, array(...))` step copies the accumulated
  * array — quadratic element copies per entity, and the allocation
  * storm is GC-poison on a shared JVM).
  *
  * Shape: ONE shuffle (`repartition(ticker)` + `sortWithinPartitions
  * (ticker, date)`), then a single streaming pass per partition. Each
  * entity's rows are contiguous after the sort, so the fold buffers
  * exactly one entity's history at a time (the same bound the old
  * `collect_list` array had) and emits rows as it replays — no join
  * back, no second scan, no persist.
  *
  * Arithmetic contract (bit-replayable in a recursive-CTE oracle):
  * v_1 = (2·Σr² + n) div (2n)  — the mean squared return, half-up;
  * v_t = ω + (2·r²_{t-1} + 10) div 20 + (170·v_{t-1} + 100) div 200
  * — α = 1/10 and β = 17/20 as half-up integer divisions. All values
  * non-negative, so JVM truncating `/`, Spark `div`, and DuckDB `//`
  * agree. Overflow headroom: r² ≤ 1e14 picounits (returns clamped to
  * ±1000%), Σ over ~10⁴ rows ≤ 1e18 < 2⁶³.
  *
  * At 100 TB the shuffle is one exchange on the entity key and the
  * per-task state is one entity's history — the same memory profile as
  * any per-entity window, with none of the quadratic copies.
  */
object GarchOps {

  /** Input columns: `ticker` LONG, `date` DATE, `_r2p` LONG (squared
    * clamped return in picounits). Output: (`ticker`, `date`, `_v`) —
    * the conditional variance in picounits, one row per input row.
    *
    * PRECONDITION: (`ticker`, `date`) must be UNIQUE — the recursion
    * visits rows in (ticker, date) order, which is only a total order
    * when dates don't repeat within a ticker. Duplicate dates would
    * make the visit order (and every subsequent `_v`) depend on
    * partitioning. Callers on raw data dedup first (w40 does); if a
    * legitimately-multivalued feed ever needs this, add a
    * deterministic tiebreak column to the sortWithinPartitions.
    */
  def garchVariancePicounits(base: DataFrame,
      omegaPicounits: Long = 2000000L): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    base
      .select(col("ticker").cast("long"), col("date"), col("_r2p").cast("long"))
      .as[(Long, java.sql.Date, Long)]
      .repartition(col("ticker"))
      .sortWithinPartitions(col("ticker"), col("date"))
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[(Long, java.sql.Date, Long)] {
          private var out: Iterator[(Long, java.sql.Date, Long)] =
            Iterator.empty
          def hasNext: Boolean = out.hasNext || in.hasNext
          def next(): (Long, java.sql.Date, Long) = {
            if (!out.hasNext) {
              val tk = in.head._1
              val rows = new ArrayBuffer[(java.sql.Date, Long)]()
              while (in.hasNext && in.head._1 == tk) {
                val r = in.next(); rows += ((r._2, r._3))
              }
              var s = 0L
              rows.foreach(s += _._2)
              val n = rows.length.toLong
              val v0 = (2L * s + n) / (2L * n)
              var v = 0L
              var pr2 = 0L
              out = rows.iterator.zipWithIndex.map { case ((d, r2), i) =>
                v = if (i == 0) v0
                    else omegaPicounits + (2L * pr2 + 10L) / 20L +
                      (170L * v + 100L) / 200L
                pr2 = r2
                (tk, d, v)
              }
            }
            out.next()
          }
        }
      }
      .toDF("ticker", "date", "_v")
  }
}
