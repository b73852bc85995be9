package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of two LONG keys — the multi-dimension
  * clustering key for write-time data layout.
  *
  * Sorting a table by `z_order(a, b)` before writing parquet clusters
  * rows so that BOTH `a` and `b` are locally dense within every file /
  * row group: min-max statistics then prune scans filtered on either
  * column (or both), where a plain `ORDER BY a, b` only prunes on the
  * leading column. This is the layout trick behind Delta/Iceberg
  * Z-ORDER clustering, expressed as a plain codegen expression so it
  * composes with any writer:
  *
  *   df.repartitionByRange(n, zcol).sortWithinPartitions(zcol)
  *     .write.parquet(...)   // zcol = ZOrderExpr of the two filter cols
  *
  * Semantics: the low 31 bits of each input (values are expected to be
  * pre-normalized to 31-bit rank space — raw longs should be rank- or
  * scale-reduced first; higher bits are ignored) are interleaved
  * a-bit-first into one NON-NEGATIVE 62-bit key. 31 bits, not 32: a
  * 32nd `a` bit would land in the long's sign position and flip the
  * sort order at the halfway boundary — the one chunk straddling the
  * sign flip would span the whole axis and defeat the min-max pruning
  * this key exists for. NULL in either input → NULL (null-safe via
  * BinaryExpression).
  */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_order requires (BIGINT, BIGINT), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "z_order"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderExpr.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ZOrderExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$cls.interleave($a, $b)")
  }
}

object ZOrderExpr {
  /** Spread the low 32 bits of v into the even bit positions of a long
    * (the classic mask-shift Morton dilation, 5 steps). */
  def dilate(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton interleave: bit i of `a` lands at position 2i+1, bit i of
    * `b` at position 2i — a-bit-first, so `a` is the "major" axis at
    * equal bit positions. Inputs are masked to 31 bits so the result
    * stays non-negative (see class doc). */
  def interleave(a: Long, b: Long): Long =
    (dilate(a & 0x7fffffffL) << 1) | dilate(b & 0x7fffffffL)
}
