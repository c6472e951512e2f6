package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native fused form of the engine-shared 60-bit md5 hash
  * ([[DedupFunctions.md5Hash60]]):
  *
  *   conv(substring(md5(c), 1, 15), 16, 10)  ==  BE64(digest[0..7]) >>> 4
  *
  * — the first 15 hex chars of an md5 are exactly the first 60 bits of
  * the digest, so the value can be read straight off the digest bytes.
  * The expression-chain form pays, PER CALL: a 32-char hex encode, a
  * 15-char substring, a hex→decimal string conversion (`conv` returns
  * STRING) and a decimal parse for the final long cast — five transient
  * allocations around one 16-byte digest. MinHash signatures evaluate
  * this `numHashes` times per exploded shingle, which made the chain
  * overhead a measurable slice of every md5-twin corpus query (guide
  * §4/§1.2: per-task work on the hot path). This expression digests the
  * input bytes once (thread-local MessageDigest — no per-call
  * getInstance) and assembles the long directly; the value is
  * bit-identical by construction and pinned against the original chain
  * by a property spec, and the DuckDB oracles keep replaying the
  * original formula.
  *
  * Row-local, codegen'd, null-strict, binary → long.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 needs a binary input, got $other")
  }

  override protected def nullSafeEval(v: Any): Any =
    Md5Prefix60.hash60(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix60.hash60($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  import org.apache.spark.sql.graftbridge.Bridge

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared kernel for the interpreted and generated paths: first 60
    * bits of md5(b) as a (non-negative) long — big-endian bytes 0..7 of
    * the digest, right-shifted 4.
    */
  def hash60(b: Array[Byte]): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(b)
    val be =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  /** Expose as a Column (classic-API expression bridge). */
  def apply(c: Column): Column = Bridge.column(Md5Prefix60(Bridge.expression(c)))
}
