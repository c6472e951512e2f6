package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity (Winkler 1990) — the short-string
  * comparator for record linkage: titles, names, headers, URLs. The
  * q-gram-blocked edit-distance pairs ([[DedupFunctions
  * .editDistancePairs]]) answer "within k edits"; Jaro-Winkler answers
  * the *graded* question (0..1, front-weighted) the linkage literature
  * scores candidate pairs with, so the two compose: block with q-grams,
  * score with this kernel, keep pairs past a threshold.
  *
  * Semantics are pinned to the de-facto cross-engine standard (the exact
  * arithmetic DuckDB's `jaro_winkler_similarity` evaluates, so results
  * hash-match an oracle bit-for-bit):
  *
  *   - match window `max(|a|,|b|)/2 − 1` (floor, min 0); matches must
  *     agree within the window; transpositions = half the out-of-order
  *     matched positions
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3; zero matches → 0.0, and an
  *     EMPTY side → 0.0 (both-empty included — the DuckDB convention)
  *   - Winkler boost only past jaro > 0.7: jw = jaro + ℓ·0.1·(1−jaro),
  *     ℓ = common prefix capped at 4
  *   - computed over UTF-8 BYTES, not code points (ASCII-identical;
  *     multibyte text should pass through `nfc_normalize` first, which
  *     also makes byte equality mean visual equality)
  *
  * Row-local, codegen'd, null-strict; the kernel allocates one boolean
  * array per side and nothing else (no per-row boxing, no regex).
  * Registered in SQL as `jaro_winkler` ([[GraftFunctions]]).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs two string inputs, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Shared kernel for the interpreted and generated paths. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched sequences in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Expose as a Column (classic-API expression bridge). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
