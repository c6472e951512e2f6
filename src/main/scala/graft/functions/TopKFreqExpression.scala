package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving (Metwally et al., "Efficient computation of frequent and
  * top-k elements in data streams", ICDT 2005) heavy-hitter summary:
  * at most `capacity` counters; an unseen item evicts the minimum
  * counter and inherits its count as its error bound. Guarantees: every
  * item with true frequency > N / capacity is retained, and each
  * reported count overestimates by at most its error.
  */
final class SpaceSavingSummary(val capacity: Int) {
  // value -> (count, error); small capacities, so a plain hash map
  val counters: java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  def add(v: String): Unit = {
    val cur = counters.get(v)
    if (cur != null) cur(0) += 1L
    else if (counters.size < capacity) counters.put(v, Array(1L, 0L))
    else {
      // evict the min counter; the newcomer inherits its count as error
      var minK: String = null; var minC = Long.MaxValue
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue()(0) < minC) { minC = e.getValue()(0); minK = e.getKey }
      }
      counters.remove(minK)
      counters.put(v, Array(minC + 1L, minC))
    }
  }

  /** A key ABSENT from a summary may still have occurred up to the
    * summary's minimum count times (it could have been evicted) — but
    * only if the summary ever filled; below capacity nothing was ever
    * evicted, so absence means count 0.
    */
  private def absentBound: Long =
    if (counters.size < capacity) 0L
    else {
      var m = Long.MaxValue
      val it = counters.values().iterator()
      while (it.hasNext) { val c = it.next()(0); if (c < m) m = c }
      m
    }

  /** Parallel space-saving merge (Agarwal et al. "Mergeable summaries"):
    * for every key in the union, each side contributes its count — or,
    * when the key is absent from a FULL side, that side's minimum count
    * as both count and error (the key may have been evicted holding up
    * to that much). Then keep the `capacity` largest. This keeps the
    * invariant `count − error ≤ truth ≤ count` under ANY merge order —
    * naive count-summing would UNDERcount a key dropped by an
    * intermediate truncation and re-added by a later partial. Which
    * value inside the bound is reported can still vary with merge
    * order, as for any streaming sketch; the exact regime (never full)
    * is order-independent.
    */
  def merge(other: SpaceSavingSummary): Unit = {
    import scala.jdk.CollectionConverters._
    val myAbsent = absentBound
    val otherAbsent = other.absentBound
    val merged = new java.util.HashMap[String, Array[Long]]()
    (counters.keySet().asScala ++ other.counters.keySet().asScala).foreach { k =>
      val a = counters.get(k)
      val b = other.counters.get(k)
      val count = (if (a != null) a(0) else myAbsent) +
        (if (b != null) b(0) else otherAbsent)
      val error = (if (a != null) a(1) else myAbsent) +
        (if (b != null) b(1) else otherAbsent)
      merged.put(k, Array(count, error))
    }
    counters.clear()
    if (merged.size <= capacity) counters.putAll(merged)
    else merged.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue))
      .sortBy { case (v, cnt) => (-cnt(0), v) }
      .take(capacity)
      .foreach { case (v, cnt) => counters.put(v, cnt) }
  }

  /** Top k by (count desc, value asc) — the value tiebreak makes output
    * deterministic when counts collide.
    */
  def topK(k: Int): Seq[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    counters.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue()(0), e.getValue()(1)))
      .sortBy { case (v, c, _) => (-c, v) }
      .take(k)
  }
}

/** Native heavy-hitters aggregate: `topk_freq(col, k, capacity)` returns
  * `array<struct<value, count, error>>` — the k most frequent strings
  * with counts and overestimation bounds. A [[TypedImperativeAggregate]]
  * because the state is an algorithm-specific summary, not a tuple of
  * SQL values: partial summaries build map-side (one per partition),
  * MERGE on the reduce side, and only `capacity` counters ever shuffle —
  * the 100 TB boilerplate-detection shape (exact groupBy-count of
  * shingles shuffles the full distinct-key set; this shuffles O(capacity)
  * per partition).
  */
case class TopKFreq(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary] {

  require(k >= 1 && capacity >= k, s"need capacity >= k >= 1 (got k=$k, capacity=$capacity)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType),
    StructField("count", LongType),
    StructField("error", LongType))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_freq needs a string column, got ${child.dataType}")

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(capacity)

  override def update(buf: SpaceSavingSummary, input: InternalRow): SpaceSavingSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingSummary, other: SpaceSavingSummary): SpaceSavingSummary = {
    buf.merge(other); buf
  }

  override def eval(buf: SpaceSavingSummary): Any =
    new GenericArrayData(buf.topK(k).map { case (v, c, err) =>
      InternalRow(UTF8String.fromString(v), c, err)
    })

  override def serialize(buf: SpaceSavingSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counters.size)
    val it = buf.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed UTF-8 — writeUTF caps at 64 KB and nothing
      // restricts counter-key length
      val kb = e.getKey.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new SpaceSavingSummary(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      s.counters.put(new String(kb, "UTF-8"), Array(in.readLong(), in.readLong()))
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKFreq =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_freq"
}

object TopKFreq {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: `topkFreq(col("shingle"), k = 20, capacity = 1000)`. */
  def apply(c: Column, k: Int, capacity: Int): Column =
    Bridge.column(TopKFreq(Bridge.expression(c), k, capacity).toAggregateExpression())
}
