package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's `find_extension`
  * (storcrawl.py:259-268) — the §7.4 codegen upgrade over a Scala UDF.
  *
  * Semantics (Appendix A1/A2, same spec as Exprs.findExtensionCol):
  * first '.' among the last min(len,7) characters EXCLUDING the final
  * one; else first '.' anywhere; returns the suffix after the dot
  * (empty for a trailing dot), null if no dot. Operates on UTF8String
  * bytes — '.' is ASCII, so byte scanning is UTF-8 safe and matches the
  * reference's bytes-domain scan (its paths are bytea).
  *
  * `doGenCode` emits a branch-free-ish scalar loop inline in
  * whole-stage codegen: no UDF serialization, no row boxing — the
  * expression stays inside the generated stage like any builtin.
  */
case class FindExtensionExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"find_extension requires STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "find_extension"

  override protected def withNewChildInternal(newChild: Expression): FindExtensionExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val bytes = s.getBytes
    FindExtensionExpr.findDot(bytes, n) match {
      case -1 => null
      case i  => UTF8String.fromBytes(bytes, i + 1, n - i - 1)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FindExtensionExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $c.numBytes();
         |int $dot = $cls.findDot($bytes, $n);
         |if ($dot < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = UTF8String.fromBytes($bytes, $dot + 1, $n - $dot - 1);
         |}
       """.stripMargin
    })
  }
}

object FindExtensionExpr {
  /** Index of the winning '.' per the reference scan order, or -1.
    * Window = byte positions [n-7, n-2] (clamped at 0); fallback scans
    * the whole string left to right. */
  def findDot(bytes: Array[Byte], n: Int): Int = {
    val winStart = math.max(n - 7, 0)
    val winEnd = n - 2 // inclusive; final char excluded (A1 slice quirk)
    var i = winStart
    while (i <= winEnd) {
      if (bytes(i) == '.') return i
      i += 1
    }
    i = 0
    while (i < n) {
      if (bytes(i) == '.') return i
      i += 1
    }
    -1
  }
}
