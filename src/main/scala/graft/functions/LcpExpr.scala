package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-prefix of two strings, capped — the verification
  * probe of sorted-neighborhood blocking
  * ([[graft.operators.Dedup.qSortedNeighbors]]).
  *
  * Exists because the pure-SQL spelling
  * `aggregate(sequence(1, cap), 0, (acc, i) -> IF(..substring..))` is a
  * higher-order function, and Spark's HOFs are CodegenFallback: every
  * row pays `cap` interpreted lambda invocations, each allocating two
  * one-char substrings. This expression is one code-generated call into
  * a tight char loop — same contract, no per-step interpretation
  * (measured ~35× on a 2M-pair probe-bound microbench: 7.6 s HOF vs
  * 0.22 s native warm; PERF.md round-9 session-5 notes).
  *
  * Contract: number of leading UTF-16 code units shared by `left` and
  * `right`, clamped to `cap`; equals code-POINT LCP whenever the shared
  * prefix is BMP text (always, for the ASCII corpora here — and the
  * DuckDB oracle's `substr`-equality probe agrees on exactly that
  * range). NULL in either input → NULL.
  */
case class LcpExpr(left: Expression, right: Expression, cap: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcp requires (STRING, STRING), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "lcp"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcpExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    LcpExpr.lcp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LcpExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$cls.lcp($a, $b, $cap)")
  }
}

object LcpExpr {
  def lcp(a: UTF8String, b: UTF8String, cap: Int): Long = {
    val sa = a.toString
    val sb = b.toString
    val m = math.min(math.min(sa.length, sb.length), cap)
    var i = 0
    while (i < m && sa.charAt(i) == sb.charAt(i)) i += 1
    i.toLong
  }
}
