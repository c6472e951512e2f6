package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer et al. 2003, public): k-gram
  * rolling xxhash64 → sliding-window minimum → distinct → sort, in ONE
  * tight pass per row.
  *
  * Why a custom Expression (the third and last in this library, same bar
  * as [[VecCosine]]/[[TopKFreq]]): the HOF composition in
  * [[TextFunctions.winnowedFingerprints]] is semantically right but pays
  * interpreted-lambda overhead per POSITION — a `transform` per k-gram
  * hash plus an allocated `slice` per window minimum is ~L lambda frames
  * and ~L temporary arrays for a length-L document, and higher-order
  * functions never enter whole-stage codegen. This expression hashes
  * byte ranges in place (no substring copies), keeps the window minimum
  * with a monotonic deque (O(L) total, not O(L·window)), and emits one
  * sorted distinct array — the fingerprint path a 100 TB dedup sweep
  * actually runs.
  *
  * Bit-compatible with the HOF formulation at `hash = xxhash64(_)`
  * (pinned by spec): same k-gram positions (character-based, multibyte
  * safe), same seed-42 hash of the identical UTF-8 bytes, same
  * short-text (`len < k`) and short-hash-list (`< window`) fallbacks,
  * same ascending distinct output.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1 (got $k)")
  require(window >= 1, s"window must be >= 1 (got $window)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints needs a string column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row; the heavy loop lives in compiled Scala,
    // so the surrounding projection stays inside whole-stage codegen
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints$$.MODULE$$.compute($c, $k, $window);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val Seed = 42L // Spark's xxhash64 default seed

  /** Expose as a Column (classic-API expression bridge). */
  def apply(text: Column, k: Int, window: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, window))
  }

  def compute(s: UTF8String, k: Int, window: Int): ArrayData = {
    val numChars = s.numChars()
    val n = numChars - (k - 1)
    if (n <= 0)
      return new GenericArrayData(Array(
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)))
    // char index -> byte offset, one pass (multibyte-safe, no copies)
    val charStart = new Array[Int](numChars + 1)
    var c = 0; var b = 0
    while (c < numChars) {
      charStart(c) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      c += 1
    }
    charStart(numChars) = s.numBytes
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val from = charStart(i); val to = charStart(i + k)
      hashes(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset + from, to - from, Seed)
      i += 1
    }
    val m = n - (window - 1)
    val mins = if (m <= 0) {
      var best = hashes(0); var j = 1
      while (j < n) { if (hashes(j) < best) best = hashes(j); j += 1 }
      Array(best)
    } else {
      // monotonic deque of candidate indices: ascending hash values,
      // front = current window's minimum
      val out = new Array[Long](m)
      val deque = new Array[Int](n)
      var head = 0; var tail = 0 // [head, tail) live
      var j = 0
      while (j < n) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(j)) tail -= 1
        deque(tail) = j; tail += 1
        if (deque(head) <= j - window) head += 1
        if (j >= window - 1) out(j - (window - 1)) = hashes(deque(head))
        j += 1
      }
      out
    }
    java.util.Arrays.sort(mins)
    // in-place dedup of the sorted array
    var w = 0; var r = 1
    while (r < mins.length) {
      if (mins(r) != mins(w)) { w += 1; mins(w) = mins(r) }
      r += 1
    }
    val distinct = if (w + 1 == mins.length) mins else java.util.Arrays.copyOf(mins, w + 1)
    new GenericArrayData(distinct)
  }
}
