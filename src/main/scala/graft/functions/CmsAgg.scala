package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Cell addressing shared by the aggregate's update path, the query's
  * probe expression, and — critically — the DuckDB oracle: row i of
  * the sketch reads bits [6i, 6i+6) of the caller-supplied 64-bit
  * hash, i.e. `(h >>> 6i) & 63`. Bit-slicing (rather than the
  * Kirsch–Mitzenmacher 32-bit overflow walk the bloom filter uses) is
  * chosen deliberately: it is expressible in portable integer SQL, so
  * the oracle can rebuild every counter cell exactly — the sketch's
  * ESTIMATES become hash-pinned facts, not asserted approximations.
  * Requires width = 64 (one 6-bit slice per row) and depth ≤ 10
  * (60 usable bits in an md5Long).
  */
object CmsUtil {
  val Width = 64
  def cellIndex(h: Long, row: Int): Int = ((h >>> (6 * row)) & 63L).toInt
}

/** `cms_agg(hash64, depth)` — mergeable Count-Min sketch (Cormode &
  * Muthukrishnan 2005) over pre-hashed BIGINT inputs; returns the
  * depth×64 counter grid as a flat ARRAY<BIGINT> (row-major).
  *
  * The scale role: heavy-hitter frequency estimation whose state is
  * FIXED-SIZE per group no matter the stream — partial sketches
  * elementwise-add map-side, one depth·64-long array per partition
  * crosses the shuffle, and point queries read min over depth cells.
  * Overestimates only (every cell ≥ the true count), never under —
  * the one-sided error that makes "estimated ≥ exact" checkable.
  * Complements the exact [[TopKLongsAgg]]/[[FreqItemsAgg]] family:
  * those track the top set, the CMS answers point frequency for ANY
  * key after the fact.
  */
case class CmsLongsAgg(
    child: Expression,
    depthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  @transient private lazy val depth: Int = depthExpr.eval(InternalRow.empty) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"cms_agg depth: $other")
  }

  override def children: Seq[Expression] = Seq(child, depthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_agg hash must be BIGINT, got ${child.dataType.simpleString}")
    else if (!depthExpr.foldable)
      TypeCheckResult.TypeCheckFailure("cms_agg depth must be a literal")
    else depthExpr.eval(InternalRow.empty) match {
      case null => TypeCheckResult.TypeCheckFailure("cms_agg depth must not be NULL")
      case d: Int if d >= 1 && d <= 10 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_agg requires 1 <= depth <= 10 (6-bit slices of a 60-bit hash), got $other")
    }
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * CmsUtil.Width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        buffer(i * CmsUtil.Width + CmsUtil.cellIndex(h, i)) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsLongsAgg =
    copy(child = newChildren(0), depthExpr = newChildren(1))

  override def prettyName: String = "cms_agg"
}
