package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC canonicalization — the normalization a
  * training-data pipeline must run BEFORE any byte-keyed operator,
  * because "café" typed as `e + COMBINING ACUTE` (NFD) and as the
  * precomposed `é` (NFC) are different byte sequences that render
  * identically: exact dedup misses the duplicate, fingerprints split,
  * shingles disagree, Bloom probes false-miss. One pass to canonical
  * composition makes byte equality mean visual equality (for canonical
  * equivalences; compatibility forms are out of scope on purpose —
  * NFKC folds ligatures/width and CHANGES text).
  *
  * Row-local, codegen'd, null-strict. Fast path: already-normalized
  * strings (the overwhelming majority of real text — all-ASCII is NFC
  * by definition) return the INPUT UTF8String unchanged —
  * `Normalizer.isNormalized` is an allocation-free quick-check scan,
  * so the common row pays one decode and zero re-encodes.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input, got $other")
  }

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Shared kernel for the interpreted and generated paths. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Expose as a Column (classic-API expression bridge). */
  def apply(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
