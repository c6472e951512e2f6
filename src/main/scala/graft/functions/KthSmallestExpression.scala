package graft.functions

import java.util.PriorityQueue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded buffer of the k SMALLEST values seen: a max-heap of size ≤ k
  * — a value enters only when the buffer is short or it beats the
  * current maximum, which then leaves. Memory is O(k) per group
  * REGARDLESS of group size; that bound is the whole point (see
  * [[KthSmallest]]).
  */
final class KSmallestBuffer(val k: Int, ord: Ordering[Any]) {
  // max-heap: reverse ordering, so peek() is the LARGEST retained value
  val heap = new PriorityQueue[Any](math.min(k, 16), ord.reverse)

  def add(v: Any): Unit =
    if (heap.size < k) heap.offer(v)
    else if (ord.lt(v, heap.peek())) { heap.poll(); heap.offer(v); () }

  /** The cut: the largest of the ≤ k smallest retained values — i.e. the
    * k-th smallest when the group has ≥ k values, else its maximum (so
    * `value <= cut` keeps everything, which is what a cap of k over a
    * smaller group means). Null when no non-null value was seen.
    */
  def cut: Any = heap.peek()
}

/** `kth_smallest(col, k)`: the exact k-th smallest value of `col` per
  * group (or the group maximum when the group is smaller than k), as a
  * [[TypedImperativeAggregate]] over a bounded heap.
  *
  * This is the scale-safe half of a per-group cap: computing "the first
  * k rows of each group" with `row_number() OVER (PARTITION BY g ORDER
  * BY o)` sends EVERY row of a group through one task — and the
  * operator's use case (cap the dominant crawl domain) is exactly the
  * case where one group is half the corpus. Here each map task keeps an
  * O(k) heap per group it sees, partials MERGE on the reduce side (heap
  * union, still O(k)), and only the single cut value per group ever
  * leaves the aggregation — the same partial/merge shape as any
  * hash-aggregated `max`. The caller then broadcasts the cuts and keeps
  * `orderCol <= cut` as a row-local filter.
  *
  * Nulls are skipped on update (SQL aggregate convention): the cut is
  * the k-th smallest NON-NULL value, and null-ordered rows fail the
  * `<= cut` filter — consistent with the library's "null keys fall out
  * of every sample, visibly" rule.
  */
case class KthSmallest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KSmallestBuffer] {

  require(k >= 1, s"k must be >= 1 (got $k)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // serialize the heap as one unsafe row holding an array of the child's
  // type — the standard Collect-style codec, so ANY orderable child type
  // (including the score+id tiebreak struct) round-trips without a
  // per-type branch
  @transient private lazy val serializer: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def createAggregationBuffer(): KSmallestBuffer =
    new KSmallestBuffer(k, ordering)

  override def update(buf: KSmallestBuffer, input: InternalRow): KSmallestBuffer = {
    val v = child.eval(input)
    // copy: the evaluated value may alias a reused row buffer
    if (v != null) buf.add(InternalRow.copyValue(v))
    buf
  }

  override def merge(buf: KSmallestBuffer, other: KSmallestBuffer): KSmallestBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: KSmallestBuffer): Any = buf.cut

  override def serialize(buf: KSmallestBuffer): Array[Byte] = {
    val values = new Array[Any](buf.heap.size)
    val it = buf.heap.iterator()
    var i = 0
    while (it.hasNext) { values(i) = it.next(); i += 1 }
    serializer.apply(InternalRow(new GenericArrayData(values))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): KSmallestBuffer = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    val arr = row.getArray(0)
    var i = 0
    while (i < arr.numElements()) {
      buf.add(InternalRow.copyValue(arr.get(i, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KthSmallest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KthSmallest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KthSmallest =
    copy(child = newChildren.head)
  override def prettyName: String = "kth_smallest"
}

object KthSmallest {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: `KthSmallest(col("id"), k = 15)`. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(KthSmallest(Bridge.expression(c), k).toAggregateExpression())
}
