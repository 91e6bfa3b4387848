package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

import scala.collection.mutable

/** Bounded-heap top-k aggregate: keeps the k LARGEST values of `child`
  * (any orderable type — use a struct for compound orderings, largest
  * first lexicographically) and evaluates to them as a descending array.
  *
  * Why not a row_number window: the window formulation sort-shuffles
  * EVERY input row to its group's reducer before discarding all but k.
  * This aggregate is partial-aggregable (ObjectHashAggregate): each map
  * task reduces its slice to ≤ k values per group, so the exchange
  * carries at most k × tasks rows per group — the heavy-hitter shape
  * that survives 100 TB, same motivation as TakeOrderedAndProject but
  * PER GROUP. Memory per group is O(k); updates are O(log k).
  */
case class TopKOrdered(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  require(k > 0, s"top_k: k must be positive, got $k")

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty(ord.reverse) // min on top → O(log k) evict

  private def insert(buf: mutable.PriorityQueue[Any], v: Any): Unit =
    if (buf.size < k) buf.enqueue(v)
    else if (ord.compare(v, buf.head) > 0) { buf.dequeue(); buf.enqueue(v) }

  override def update(
      buf: mutable.PriorityQueue[Any], input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    // copy before buffering: Unsafe-backed rows/strings are reused by the scan
    if (v != null) insert(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[Any], b2: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ord.reverse))

  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    var i = 0
    while (i < arr.numElements()) {
      insert(buf, InternalRow.copyValue(arr.get(i, child.dataType)))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "top_k"

  override def withNewMutableAggBufferOffset(offset: Int): TopKOrdered =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKOrdered =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKOrdered =
    copy(child = newChildren.head)
}

object AggFunctions {
  /** Top-k largest values of `e` per group, as a descending array. */
  def topK(e: Column, k: Int): Column =
    ColumnBridge.column(
      TopKOrdered(ColumnBridge.expression(e), k).toAggregateExpression())
}
