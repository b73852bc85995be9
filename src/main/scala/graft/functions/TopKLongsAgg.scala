package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: `top_k(value, k)` returns the k
  * largest BIGINT values of the group as an array sorted descending
  * (multiset semantics, so the result is deterministic under any input
  * order).
  *
  * This is the scale-correct form of per-group top-k: a window
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` must SORT
  * every row of every group (shuffle + per-group sort of the full
  * input), while this aggregate keeps a k-element min-heap per group —
  * partial aggregation truncates to k values map-side, so the shuffle
  * carries at most k longs per (partition, group) no matter how hot the
  * group is. At 100 TB with k=5 that is the difference between sorting
  * the table and sorting nothing.
  *
  * A `TypedImperativeAggregate` (object buffer, ObjectHashAggregateExec
  * physical form) because the buffer is a variable-size heap — the
  * declarative aggregate row format can't hold it.
  */
case class TopKLongsAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Long]] {

  // min-heap: head is the SMALLEST retained value, evicted first
  private def heapOrdering: Ordering[Long] = Ordering.Long.reverse

  // checkInputDataTypes validates foldability/range before this is read
  @transient private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"top_k k must be integral, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k value must be BIGINT, got ${child.dataType.simpleString}")
    else if (!kExpr.foldable ||
             !(kExpr.dataType == IntegerType || kExpr.dataType == LongType))
      TypeCheckResult.TypeCheckFailure("top_k k must be an integral literal")
    else kExpr.eval(InternalRow.empty) match {
      case null =>
        TypeCheckResult.TypeCheckFailure("top_k k must not be NULL")
      case l: Long if l < 1L || l > Int.MaxValue =>
        TypeCheckResult.TypeCheckFailure(s"top_k k out of range [1, 2^31): $l")
      case i: Int if i < 1 =>
        TypeCheckResult.TypeCheckFailure(s"top_k k must be positive, got $i")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long](heapOrdering)

  override def update(
      buffer: mutable.PriorityQueue[Long], input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (buffer.size < k) buffer.enqueue(x)
      else if (x > buffer.head) { buffer.dequeue(); buffer.enqueue(x) }
    }
    buffer
  }

  override def merge(
      buffer: mutable.PriorityQueue[Long],
      other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    other.foreach { x =>
      if (buffer.size < k) buffer.enqueue(x)
      else if (x > buffer.head) { buffer.dequeue(); buffer.enqueue(x) }
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(buffer.toArray.sorted(Ordering.Long.reverse))

  override def serialize(buffer: mutable.PriorityQueue[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.size)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    while (bb.hasRemaining) buf.enqueue(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongsAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "top_k"
}
