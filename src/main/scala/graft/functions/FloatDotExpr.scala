package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Float dot product of two ARRAY<FLOAT> vectors as a native codegen
  * expression — the fast path for the production (non-oracle)
  * similarity operators. Spark's higher-order functions
  * (`zip_with` + `aggregate`) run interpreted with per-element lambda
  * dispatch; this is a tight codegen loop over the unsafe array data.
  *
  * Semantics mirror the HOF fold the operators previously used: each
  * pairwise product is a FLOAT multiply (then widened), accumulated in
  * a double, in index order — so swapping this in changes no result
  * bits, INCLUDING for mismatched-length vectors, which return NULL
  * exactly as zip_with's null padding poisoned the fold (a truncated
  * partial dot would let malformed vectors slip into top-k results
  * with plausible scores). One divergence: null ELEMENTS at matching
  * length are skipped rather than poisoning the sum (embedding
  * columns carry no null elements; skipping is the useful semantic if
  * one ever appears).
  */
case class FloatDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot requires ARRAY<FLOAT>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // mismatched lengths → NULL
  override def prettyName: String = "float_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements()) null
    else {
      val n = av.numElements()
      var sum = 0.0d
      var i = 0
      while (i < n) {
        if (!av.isNullAt(i) && !bv.isNullAt(i)) {
          sum += (av.getFloat(i) * bv.getFloat(i)).toDouble
        }
        i += 1
      }
      sum
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $sum += (double)($a.getFloat($i) * $b.getFloat($i));
         |    }
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })
}
