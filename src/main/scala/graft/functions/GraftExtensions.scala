package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-side registration of graft's native expressions, so `spark.sql`
  * users (and external BI/SQL tooling speaking Thrift/Connect to a
  * session) get the same codegen'd kernels as the Column API:
  *
  *   - `vec_cosine(a, b)` / `vec_dot(a, b)` — [[VecCosine]]/[[VecDot]]
  *   - `topk_freq(col, k, capacity)` — the [[TopKFreq]] space-saving
  *     heavy-hitters aggregate; `k`/`capacity` must be integer literals
  *     (they size executor-side state, so they are plan-time constants by
  *     construction)
  *   - `nfc_normalize(s)` — [[NfcNormalize]] Unicode canonical
  *     composition (byte equality = visual equality before byte-keyed
  *     dedup)
  *   - `jaro_winkler(a, b)` — [[JaroWinkler]] graded record-linkage
  *     similarity (arithmetic-pinned to the cross-engine standard)
  *   - `bpe_encode(text, merges)` / `bpe_merge_apply(tokens, l, r)` —
  *     the [[BpeEncode]]/[[BpeMergeApply]] tokenizer kernels; the merge
  *     table rides as a string literal (pairs `U+001E`-separated,
  *     left/right `U+001F`-separated), a plan-time constant like the
  *     sketch sizes
  *
  * Two wiring paths, same builders:
  *
  *   - cluster-wide: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *     (or `.withExtensions(new GraftExtensions)`) injects at session build
  *   - ad hoc: `GraftFunctions.register(spark)` drops them into an
  *     existing session's function registry
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def requireArity(name: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n,
      s"$name expects $n arguments, got ${args.length}")

  /** Plan-time integer constant: the expression's state/output size must
    * be fixed before execution. Any FOLDABLE int expression qualifies —
    * builders run before constant folding, so `CAST(2 AS INT)` or `1+1`
    * arrive unfolded and are evaluated here.
    */
  private def intLiteral(name: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other if other.foldable && other.dataType == IntegerType =>
      other.eval() match {
        case v: Int => v
        case _ => throw new IllegalArgumentException(
          s"$name: $arg folded to null; need an INTEGER LITERAL")
      }
    case other => throw new IllegalArgumentException(
      s"$name: $arg must be an INTEGER LITERAL (got ${other.sql})")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (args: Seq[Expression]) => {
        requireArity("vec_cosine", args, 2)
        VecCosine(args(0), args(1))
      }),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        requireArity("vec_dot", args, 2)
        VecDot(args(0), args(1))
      }),
    (FunctionIdentifier("topk_freq"),
      new ExpressionInfo(classOf[TopKFreq].getName, "topk_freq"),
      (args: Seq[Expression]) => {
        requireArity("topk_freq", args, 3)
        // the analyzer wraps a bare AggregateFunction in the Complete-mode
        // AggregateExpression, same as built-in sum/min registrations
        TopKFreq(args(0),
          intLiteral("topk_freq", "k", args(1)),
          intLiteral("topk_freq", "capacity", args(2)))
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => {
        requireArity("winnow_fingerprints", args, 3)
        WinnowFingerprints(args(0),
          intLiteral("winnow_fingerprints", "k", args(1)),
          intLiteral("winnow_fingerprints", "window", args(2)))
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        requireArity("nfc_normalize", args, 1)
        NfcNormalize(args(0))
      }),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (args: Seq[Expression]) => {
        requireArity("jaro_winkler", args, 2)
        JaroWinkler(args(0), args(1))
      }),
    // bpe_encode(text, merges): merges is a STRING LITERAL of ranked
    // pairs — left and right joined by U+001F, pairs by U+001E (both
    // control chars, absent from any sane token). '' = no merges
    // (plain code-point split).
    (FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (args: Seq[Expression]) => {
        requireArity("bpe_encode", args, 2)
        BpeEncode(args(0),
          parseMerges("bpe_encode", stringLiteral("bpe_encode", "merges", args(1))))
      }),
    (FunctionIdentifier("bpe_merge_apply"),
      new ExpressionInfo(classOf[BpeMergeApply].getName, "bpe_merge_apply"),
      (args: Seq[Expression]) => {
        requireArity("bpe_merge_apply", args, 3)
        BpeMergeApply(args(0),
          stringLiteral("bpe_merge_apply", "left", args(1)),
          stringLiteral("bpe_merge_apply", "right", args(2)))
      }))

  /** Plan-time string constant (same contract as [[intLiteral]]). */
  private def stringLiteral(name: String, arg: String, e: Expression): String = e match {
    case other if other.foldable &&
        other.dataType == org.apache.spark.sql.types.StringType =>
      other.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case _ => throw new IllegalArgumentException(
          s"$name: $arg folded to null; need a STRING LITERAL")
      }
    case other => throw new IllegalArgumentException(
      s"$name: $arg must be a STRING LITERAL (got ${other.sql})")
  }

  private def parseMerges(name: String, s: String): Seq[(String, String)] =
    if (s.isEmpty) Nil
    else s.split("\u001E", -1).toSeq.map { p =>
      p.split("\u001F", -1) match {
        case Array(l, r) => (l, r)
        case parts => throw new IllegalArgumentException(
          s"$name: each merge must be left<U+001F>right (got ${parts.length} parts)")
      }
    }

  /** Register into an already-built session (idempotent: re-registration
    * overwrites with identical builders).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
