package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (Apache DataSketches KLL), completing
  * the sketch column family next to HLL distinct
  * ([[graft.operators.Sketches]]) and frequent items
  * ([[FreqItemsAgg]]):
  *
  *   - `kll_sketch_bytes(value)` — aggregate DOUBLE values into a
  *     serialized KLL sketch (BinaryType, ~3 KB at the default k=200
  *     for ±1.7% rank error). Persist one per shard/day/group.
  *   - `kll_merge_bytes(sketch)` — union persisted sketch columns into
  *     a rollup sketch WITHOUT rescanning data.
  *   - `kll_quantile(sketch, rank)` — read a quantile estimate out of a
  *     sketch value (INCLUSIVE rank semantics).
  *
  * This is the 100 TB percentile path: exact `percentile_disc` queries
  * stay on the oracle surface (`q_quantiles`), while latency/size
  * distributions over the full corpus keep kilobytes of mergeable
  * state per increment. Unit-verified (rank-error band + merge
  * equivalence); sketch internals are implementation-defined, so no
  * cross-engine oracle hash can exist.
  */
object KllSketch {
  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Aggregate DOUBLE values into KLL sketch bytes. */
case class KllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_bytes value must be DOUBLE, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance()

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = KllSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "kll_sketch_bytes"
}

/** Union serialized KLL sketches (BinaryType column) into one. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_merge_bytes takes sketch BINARY, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance()

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(KllSketch.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = KllSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "kll_merge_bytes"
}

/** Scalar quantile read from sketch bytes (INCLUSIVE rank).
  * `ImplicitCastInputTypes` so the natural `kll_quantile(s, 0.5)`
  * works — a bare fractional literal parses as DECIMAL(1,1) and must
  * coerce to DOUBLE. */
case class KllQuantileExpr(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  // return type inferred: AbstractDataType is private[sql], the
  // inherited signature supplies it
  override def inputTypes = Seq(BinaryType, DoubleType)

  override def nullSafeEval(sketch: Any, rank: Any): Any = {
    val r = rank.asInstanceOf[Double]
    // clean message instead of a library stack trace mid-task
    if (r < 0.0 || r > 1.0)
      throw new IllegalArgumentException(s"kll_quantile rank must be in [0, 1], got $r")
    val sk = KllSketch.heapify(sketch.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null else sk.getQuantile(r)
  }

  // per-row deserialization: this reads ROLLUP rows (one per group /
  // increment), never the raw data, so interpreted eval is fine
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = classOf[KllQuantileExpr].getName
    val ref = ctx.addReferenceObj("kllq", this, cls)
    val r = ctx.freshName("kllRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object $r = $ref.nullSafeEval($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = (Double) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "kll_quantile"
}
