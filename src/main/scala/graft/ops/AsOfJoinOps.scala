package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row
  * with `rightTime <= leftTime` per key. The classic financial align
  * operator (daily prices vs monthly/quarterly macro series) that the
  * reference never implements (SURVEY.md §2c notes it as the natural
  * extension) and that Spark lacks as a built-in.
  *
  * Implementation is the scalable union+window composition, NOT a range
  * join: tag both sides, union by name, and carry the last non-null
  * right payload forward with one `last(_, ignoreNulls)` window per key.
  * Cost = ONE shuffle of |left|+|right| rows on the key — no
  * O(|left|×|right per key|) range-join blowup, no custom physical
  * operator. At equal timestamps the right row sorts first, so a
  * same-instant right observation IS visible to the left row (DuckDB
  * `ASOF JOIN ... ON l.t >= r.t` semantics, used as the test oracle).
  *
  * Rows with no prior right observation get null payload (left-outer
  * semantics); `dropNoMatch` turns that into the inner variant.
  * If several right rows share (key, time), the survivor is
  * nondeterministic — dedupe the right side first.
  */
object AsOfJoinOps {

  def asOfJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      dropNoMatch: Boolean = false): DataFrame =
    asOfJoinImpl(left, right, keys, leftTime, rightTime, payload,
      dropNoMatch, forward = false)

  /** Forward variant: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` per key — "next scheduled observation"
    * alignment (next earnings date, next rebalance, next maintenance
    * window). Identical shape and cost to the backward join; only the
    * window traversal direction flips. A same-instant right observation
    * is visible, matching DuckDB `ASOF JOIN ... ON l.t <= r.t`.
    */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      dropNoMatch: Boolean = false): DataFrame =
    asOfJoinImpl(left, right, keys, leftTime, rightTime, payload,
      dropNoMatch, forward = true)

  private def asOfJoinImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      dropNoMatch: Boolean,
      forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    // internal columns must not clobber real input columns named _t etc.
    val taken = (left.columns ++ right.columns).toSet
    val cT = ColNames.fresh(taken, "_t")
    val cRv = ColNames.fresh(taken, "_rv")
    val cIsLeft = ColNames.fresh(taken, "_isLeft")
    val cAsof = ColNames.fresh(taken, "_asof")
    val rv = struct((rightTime +: payload).map(col): _*)
    // a null right time satisfies NEITHER inequality, but its rv struct is
    // non-null — unfiltered it would sort to the partition edge and leak
    // its payload into every left row before the first real observation
    val rPrep = right
      .filter(col(rightTime).isNotNull)
      .select(
        (keys.map(col) :+ col(rightTime).as(cT) :+ rv.as(cRv) :+ lit(0).as(cIsLeft)): _*)
    val lPrep = left
      .withColumn(cT, col(leftTime))
      .withColumn(cIsLeft, lit(1))
    val unioned = lPrep.unionByName(rPrep, allowMissingColumns = true)
    // backward walks time ascending (latest right <= left wins); forward
    // walks descending (earliest right >= left wins). In both, the right
    // row sorts before a same-time left row, so same-instant
    // observations are visible; and a NULL-time left row sorts FIRST
    // (asc default nulls-first; desc needs the explicit variant), so its
    // frame holds no right rows and it gets a null payload — a null time
    // satisfies neither inequality in any engine.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col(cT).desc_nulls_first else col(cT).asc, col(cIsLeft))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned
      .withColumn(cAsof, last(col(cRv), ignoreNulls = true).over(w))
      .filter(col(cIsLeft) === 1)
    val outCols = left.columns.map(col) ++
      payload.map(p => col(cAsof).getField(p).as(p))
    val joined = filled.select(outCols: _*)
    if (dropNoMatch)
      joined.filter(payload.map(col(_).isNotNull).reduce(_ && _))
    else joined
  }
}
