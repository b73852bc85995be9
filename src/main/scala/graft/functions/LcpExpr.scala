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
  * Contract: number of leading UTF-8 CODE POINTS shared by `left` and
  * `right`, clamped to `cap` — the same semantics as the DuckDB
  * oracle's `substr`-equality probe and Spark's own `substring` (both
  * code-point-indexed), on ALL text, not just BMP. Computed directly on
  * the UTF8String bytes: one byte-prefix scan, then code-point counting
  * inside the common prefix (a partial code point at the boundary
  * contributes nothing, exactly as two different code points share no
  * `substr` prefix) — no Java String materializes per pair (the r9
  * ADVICE flag: `toString` allocated two full Strings per candidate).
  * NULL in either input → NULL.
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
    val m = math.min(a.numBytes, b.numBytes)
    var p = 0
    while (p < m && a.getByte(p) == b.getByte(p)) p += 1
    // count complete code points inside the common byte prefix [0, p)
    var i = 0
    var cps = 0L
    while (i < p && cps < cap) {
      val len = UTF8String.numBytesForFirstByte(a.getByte(i))
      if (i + len > p) i = p // partial code point at the boundary
      else { cps += 1; i += len }
    }
    cps
  }
}
