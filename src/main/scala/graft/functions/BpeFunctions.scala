package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer, trained and applied distributed
  * (Sennrich et al. ACL 2016, public — the tokenizer-training step every
  * LLM corpus pipeline runs before token accounting).
  *
  * Semantics (pinned identically in the Spark kernel and the DuckDB
  * oracle, see `Queries` bpe1/bpe2):
  *  - initial tokens = Unicode code points of the raw text;
  *  - one merge step for pair (L, R) rewrites the token sequence
  *    leftmost-first, non-overlapping: a scan replaces each adjacent
  *    (L, R) with the concatenation LR and continues AFTER the merged
  *    token (so "aaaa" under (a,a) becomes [aa, aa], and the merged
  *    token never re-merges within its own pass);
  *  - training iteration i encodes with merges 1..i-1, counts ALL
  *    adjacent pairs (overlapping — the classic BPE count), and takes
  *    the (freq DESC, lt ASC, rt ASC) argmax as merge i.
  *
  * Scale (100 TB corpus):
  *  - encode is [[BpeEncode]], a scan-local native expression — the
  *    merge loop runs in compiled Scala via one static call per row, so
  *    the projection stays inside whole-stage codegen; no shuffle, no
  *    HOF lambda frames (a k-merge HOF fold would be k interpreted
  *    passes with k temporary arrays per row).
  *  - each training iteration is ONE corpus scan into a (lt, rt) count
  *    aggregate with map-side partials (hot pairs collapse before the
  *    exchange) and a TakeOrdered(1) argmax — never a global sort. The
  *    loop is inherently sequential (merge i+1's counts depend on merge
  *    i), which is why production trainers sample: `sampleHashMod`
  *    trains on the deterministic doc_id-hash slice (the corpus-scale
  *    convention — pair statistics converge long before the full corpus
  *    is seen).
  */
object BpeFunctions {

  /** Token delimiter for the string rendering of an encoding (also the
    * oracle's representation): `SEP tok SEP SEP tok SEP ... SEP`. A
    * control char (U+001F unit separator) that must not occur in the
    * corpus — [[encodedString]] would be ambiguous otherwise.
    */
  val Sep = "\u001F"

  /** `(id, tokens)` after applying `merges` in rank order. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol), BpeEncode(col(textCol), merges).as("tokens"))

  /** The delimited string form of an encoding (empty array → empty
    * string), for fingerprinting an encoding cross-engine.
    */
  def encodedString(tokens: Column): Column =
    when(size(tokens) === 0, lit(""))
      .otherwise(concat(lit(Sep), array_join(tokens, Sep + Sep), lit(Sep)))

  /** Learned merge table `(rank, lt, rt, freq)`, rank 1..numMerges (or
    * fewer if the corpus runs out of adjacent pairs).
    *
    * `persistEncodings = true` (the default) carries the encoded token
    * arrays across iterations — each round applies ONLY the newest
    * merge ([[BpeMergeApply]]) to the pinned previous encoding, so
    * training costs O(k) corpus passes. `false` re-encodes from raw
    * text each round (O(k²) merge scans, but zero cache footprint) —
    * both paths produce the identical merge table (spec-pinned).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            sampleHashMod: Option[Int] = None,
            persistEncodings: Boolean = true): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1 (got $numMerges)")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = sampleHashMod.fold(docs) { m =>
      docs.filter(pmod(xxhash64(col(textCol)), lit(m.toLong)) === 0L)
    }

    def topPair(enc: DataFrame): Option[(String, String, Long)] =
      enc.where(size(col("t")) >= 2)
        // [[BpePairCounts]]: per-row local counts in compiled code — one
        // explode row per DISTINCT pair per doc, not per occurrence, and
        // no interpreted transform/sequence lambda on the scan
        .select(explode(BpePairCounts(col("t"))).as("p"))
        .groupBy(col("p.lt").as("lt"), col("p.rt").as("rt"))
        .agg(sum(col("p.c")).as("freq"))
        .orderBy(desc("freq"), asc("lt"), asc("rt"))
        .limit(1) // TakeOrderedAndProject — the argmax never sorts globally
        .collect()
        .headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val merges = ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    if (persistEncodings) {
      // O(k) passes: the current encoding is pinned; each round's
      // argmax action materializes it, then the superseded frame is
      // released. The lineage of frame i is one projection over pinned
      // frame i-1, so recompute-on-eviction is one merge pass deep.
      var cur = base.select(BpeEncode(col(textCol), Nil).as("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var prev: Option[DataFrame] = None
      try {
        while (merges.length < numMerges && !exhausted) {
          topPair(cur) match {
            case None => exhausted = true
            case Some(m) =>
              merges += m
              prev.foreach(_.unpersist(blocking = false))
              prev = Some(cur)
              if (merges.length < numMerges) {
                cur = cur.select(BpeMergeApply(col("t"), m._1, m._2).as("t"))
                  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              }
          }
        }
      } finally {
        prev.foreach(_.unpersist(blocking = false))
        cur.unpersist(blocking = false)
      }
    } else {
      while (merges.length < numMerges && !exhausted) {
        val toks = BpeEncode(col(textCol), merges.toSeq.map(m => (m._1, m._2)))
        topPair(base.select(toks.as("t"))) match {
          case None => exhausted = true
          case Some(m) => merges += m
        }
      }
    }
    merges.toSeq.zipWithIndex
      .map { case ((l, r, f), i) => (i + 1, l, r, f) }
      .toDF("rank", "lt", "rt", "freq")
  }
}

/** `BpeEncode(text, merges)`: split to code-point tokens, then apply the
  * merge list in rank order (see [[BpeFunctions]] for the pinned
  * semantics). Null text → null. The merge list is a plan-time constant
  * (it sizes nothing, but training owns its derivation).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode needs a string column, got ${child.dataType}")

  // merges as a flat UTF8String array [L1, R1, LR1, L2, R2, LR2, ...]
  // (concatenations precomputed once at plan time, not per row)
  @transient private lazy val flat: Array[UTF8String] = BpeEncode.flatten(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one static call per row; the merge loop is compiled Scala, so the
    // surrounding projection stays inside whole-stage codegen
    val ref = ctx.addReferenceObj("bpeMerges", flat, "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode$$.MODULE$$.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** One merge pass over an ALREADY-TOKENIZED array (the incremental
  * training step): same leftmost-first non-overlapping scan as a
  * [[BpeEncode]] pass, applied to `array<string>` input.
  */
case class BpeMergeApply(child: Expression, left: String, right: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge_apply needs array<string>, got $other")
    }

  @transient private lazy val pair: Array[UTF8String] =
    BpeEncode.flatten(Seq((left, right)))

  override def nullSafeEval(input: Any): Any =
    BpeEncode.mergeArray(input.asInstanceOf[ArrayData], pair)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpePair", pair, "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode$$.MODULE$$.mergeArray($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeApply =
    copy(child = newChild)
}

object BpeMergeApply {
  /** Expose as a Column (classic-API expression bridge). */
  def apply(tokens: Column, left: String, right: String): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(BpeMergeApply(Bridge.expression(tokens), left, right))
  }
}

/** Per-row LOCAL adjacent-pair counts over a token array: the classic
  * overlapping BPE pair count, pre-aggregated within the row in compiled
  * code. `explode(bpe_pair_counts(t))` + a sum aggregate totals exactly
  * what `explode(all adjacent pairs)` + count did, but emits one row per
  * DISTINCT pair per document instead of one per pair OCCURRENCE — and
  * skips the interpreted `transform(sequence(...))` lambda plus its
  * per-row struct-array materialization entirely. Natural text repeats
  * adjacent code-point pairs heavily, so the training scan's explode
  * volume drops several-fold (measured: the bpe1 train loop 8.3 → ~3 s
  * at sf0.1). Output order is first-occurrence — deterministic, though
  * downstream aggregation doesn't depend on it.
  */
case class BpePairCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("lt", StringType, nullable = false),
      StructField("rt", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_pair_counts needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    BpePairCounts.count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpePairCounts$$.MODULE$$.count($c);")

  override protected def withNewChildInternal(newChild: Expression): BpePairCounts =
    copy(child = newChild)
}

object BpePairCounts {
  /** Expose as a Column (classic-API expression bridge). */
  def apply(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(BpePairCounts(Bridge.expression(tokens)))
  }

  /** The kernel: one pass, first-occurrence-ordered local counts. */
  def count(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.LinkedHashMap[(UTF8String, UTF8String), Long](16)
    var i = 1
    while (i < n) {
      val k = (arr.getUTF8String(i - 1), arr.getUTF8String(i))
      // Scala unboxes an absent java.lang.Long to 0L — absent pairs
      // start at 0 + 1 without a containsKey probe
      m.put(k, m.get(k) + 1L)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey._1, e.getKey._2, e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }
}

object BpeEncode {

  /** Expose as a Column (classic-API expression bridge). */
  def apply(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(BpeEncode(Bridge.expression(text), merges))
  }

  /** One leftmost-first non-overlapping merge pass over tokenized
    * input (`pair` = [L, R, LR]) — the [[BpeMergeApply]] kernel.
    */
  def mergeArray(arr: ArrayData, pair: Array[UTF8String]): ArrayData = {
    val n = arr.numElements()
    val l = pair(0); val r = pair(1); val lr = pair(2)
    val out = new ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (i + 1 < n && t.equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        out += lr; i += 2
      } else {
        out += t; i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  private[functions] def flatten(merges: Seq[(String, String)]): Array[UTF8String] =
    merges.iterator.flatMap { case (l, r) =>
      Iterator(UTF8String.fromString(l), UTF8String.fromString(r),
        UTF8String.fromString(l + r))
    }.toArray

  def compute(s: UTF8String, flat: Array[UTF8String]): ArrayData = {
    // code-point split (multibyte-safe: one UTF-8 sequence per token)
    val numBytes = s.numBytes
    var tokens = new ArrayBuffer[UTF8String](math.min(numBytes, 64))
    var b = 0
    while (b < numBytes) {
      val w = UTF8String.numBytesForFirstByte(s.getByte(b))
      val arr = new Array[Byte](w)
      var i = 0
      while (i < w) { arr(i) = s.getByte(b + i); i += 1 }
      tokens += UTF8String.fromBytes(arr)
      b += w
    }
    // merge passes: leftmost-first, non-overlapping
    var m = 0
    while (m < flat.length) {
      val l = flat(m); val r = flat(m + 1); val lr = flat(m + 2)
      val out = new ArrayBuffer[UTF8String](tokens.length)
      var i = 0
      val n = tokens.length
      while (i < n) {
        if (i + 1 < n && tokens(i).equals(l) && tokens(i + 1).equals(r)) {
          out += lr; i += 2
        } else {
          out += tokens(i); i += 1
        }
      }
      tokens = out
      m += 3
    }
    new GenericArrayData(tokens.toArray[Any])
  }
}
