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

  override def nullSafeEval(input: Any): Any =
    FindExtensionExpr.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FindExtensionExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
         |UTF8String $res = (UTF8String) $cls.eval($c);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }
}

object FindExtensionExpr {
  /** CHARACTER-domain scan (not bytes): the reference operates on bytea
    * paths, but this engine's path domain is String throughout (SURVEY
    * §1.2 divergence) and the sibling implementations — the Scala port,
    * the composed-builtin Column, and the DuckDB oracle's strpos/substr
    * — are all character-based; a byte window would disagree with them
    * on multi-byte filenames. Delegates to the one faithful port
    * (Exprs.findExtensionScala) so equivalence holds by construction. */
  def eval(s: UTF8String): UTF8String = {
    val r = Exprs.findExtensionScala(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}
