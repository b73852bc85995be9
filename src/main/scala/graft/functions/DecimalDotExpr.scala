package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact decimal dot product of two ARRAY<DECIMAL(12,8)> vectors as a
  * native codegen expression — the fast path for the similarity
  * operators, whose `aggregate`/`zip_with` fold is interpreted (Spark
  * higher-order functions have no codegen).
  *
  * Exactness via unscaled-long arithmetic: each element's unscaled
  * value (scale 8) fits well inside a long; a pairwise product is an
  * unscaled scale-16 long; the running sum stays a long. For |x| ≤ 3
  * and ≤ 64 dimensions the sum is bounded by 64·(3·10⁸)² ≈ 5.8·10¹⁸ <
  * 2⁶³ — embedding components are unit-scale, far inside the bound.
  * The result is DECIMAL(38,16) with exactly that unscaled sum, i.e.
  * bit-identical to the SUM the DuckDB oracle computes.
  */
case class DecimalDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private val elemType = DecimalType(12, 8)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(d: DecimalType, _) => d.precision == 12 && d.scale == 8
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decimal_dot requires ARRAY<DECIMAL(12,8)>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DecimalType(38, 16)
  override def prettyName: String = "decimal_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDotExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = math.min(av.numElements(), bv.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!av.isNullAt(i) && !bv.isNullAt(i)) {
        sum += av.getDecimal(i, 12, 8).toUnscaledLong *
          bv.getDecimal(i, 12, 8).toUnscaledLong
      }
      i += 1
    }
    org.apache.spark.sql.types.Decimal(sum, 38, 16)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += $a.getDecimal($i, 12, 8).toUnscaledLong()
         |          * $b.getDecimal($i, 12, 8).toUnscaledLong();
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.types.Decimal.apply($sum, 38, 16);
       """.stripMargin
    })
}
