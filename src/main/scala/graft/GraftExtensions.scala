package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FindExtensionExpr

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions so SQL users get them as builtins.
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *
  * After registration: `SELECT find_extension(path) FROM files` runs the
  * codegen'd [[FindExtensionExpr]] — no UDF registration per session,
  * no boxing, visible in EXPLAIN like any builtin.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.findExtensionDescriptor)
  }
}

object GraftExtensions {
  val findExtensionDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("find_extension"),
    new ExpressionInfo(
      classOf[FindExtensionExpr].getCanonicalName,
      null,
      "find_extension",
      "find_extension(path) - extension per storage-crawler semantics " +
        "(tail-window-then-wrap scan, storcrawl.py:259-268)",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 1, "find_extension takes exactly 1 argument")
      FindExtensionExpr(children.head)
    })
}
