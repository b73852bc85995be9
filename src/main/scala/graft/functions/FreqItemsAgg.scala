package graft.functions

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native heavy-hitters aggregate: `freq_items(value, maxMapSize)` over
  * BIGINT values, backed by the Apache DataSketches frequent-items
  * sketch (the Misra-Gries / Space-Saving family). Returns
  * `array<struct<item, estimate, lb, ub>>` of the frequent items under
  * NO_FALSE_POSITIVES, ordered (estimate desc, item) for a pinned
  * output.
  *
  * The scale contract is the same as the HLL column
  * ([[graft.operators.Sketches]]): a BOUNDED buffer (maxMapSize
  * counters — kilobytes) per group regardless of input size, partial
  * sketches merged map-side, so finding the top URLs / tokens / hosts
  * in 100 TB never shuffles more than sketch state. When the distinct
  * count fits the map the counts are EXACT and sharding-independent
  * (lb == ub — the spec asserts it); beyond that the (lb, ub) interval
  * carries the documented Misra-Gries error bound.
  *
  * Unit-verified only, like the HLL sketches: beyond the exact regime
  * the estimates are stream-shard-dependent, so no cross-engine oracle
  * hash can match by construction.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSizeExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] {

  @transient private lazy val maxMapSize: Int =
    maxMapSizeExpr.eval(InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"freq_items size must be integral, got $other")
    }

  override def children: Seq[Expression] = Seq(child, maxMapSizeExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"freq_items value must be BIGINT, got ${child.dataType.simpleString}")
    else if (!maxMapSizeExpr.foldable ||
             !(maxMapSizeExpr.dataType == IntegerType || maxMapSizeExpr.dataType == LongType))
      TypeCheckResult.TypeCheckFailure("freq_items maxMapSize must be an integral literal")
    else maxMapSizeExpr.eval(InternalRow.empty) match {
      case null =>
        TypeCheckResult.TypeCheckFailure("freq_items maxMapSize must not be NULL")
      case raw =>
        // normalize Int and Long to one Long before range-checking, so
        // both widths go through the identical [8, 2^26] power-of-2
        // validation (and a BIGINT ≥ 2^32 never wraps into a small
        // accepted map size)
        val l = raw match {
          case i: java.lang.Integer => i.longValue
          case j: java.lang.Long    => j.longValue
        }
        if (l < 8L || l > (1L << 26) || (l & (l - 1L)) != 0L)
          TypeCheckResult.TypeCheckFailure(
            s"freq_items maxMapSize must be a power of 2 in [8, 2^26], got $l")
        else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: LongsSketch): Any = {
    val rows = buffer.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map(r => InternalRow(r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren(0), maxMapSizeExpr = newChildren(1))

  override def prettyName: String = "freq_items"
}
