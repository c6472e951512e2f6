package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] — the gate that lets a
  * nightly batch skip the corpus-fingerprint anti-join for every row
  * the corpus has definitely never seen (a Bloom filter has no false
  * negatives; a `false` here is a proof of absence). The expression is
  * row-local and codegen'd, so the gate rides the scan like any other
  * predicate: no join, no shuffle, no driver round-trip per row.
  *
  * String inputs probe by their UTF-8 bytes — exactly what
  * `BloomFilter.putString` hashes (its implementation is
  * `putBinary(utf8Bytes)`), so a filter built with `putString` over
  * fingerprint hex strings answers `mightContainBinary` over the same
  * strings' bytes. Binary inputs probe as-is. Null input → null, like
  * every null-strict predicate.
  *
  * The filter object itself is a plan-level reference (serialized once
  * per executor with the generated class's reference array, never per
  * row); at 100 TB scale the driver holds ONE merged filter sized by
  * the corpus-wide expected-item knob and every task shares it.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs a string or binary input, got $other")
    }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => bloom.mightContainBinary(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    val probe = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case BinaryType => (c: String) => c
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary(${probe(c)});")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Expose as a Column (classic-API expression bridge). */
  def apply(c: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bloom))
}
