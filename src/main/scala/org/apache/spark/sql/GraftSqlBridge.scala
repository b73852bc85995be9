package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the graft library needs: turning a
  * hand-built [[LogicalPlan]] back into a user-facing [[DataFrame]],
  * and registering native [[Expression]] builders on a live session's
  * function registry.
  *
  * Extension libraries that add custom logical operators (Delta,
  * Sedona, Iceberg) all ship exactly this shim: `Dataset.ofRows` and
  * `sessionState` are `private[sql]`, so the calls live in a file
  * compiled into the `org.apache.spark.sql` package. Everything here
  * delegates to public-in-bytecode, stable-across-4.x entry points;
  * no behavior lives in this file.
  */
object GraftSqlBridge {

  /** Wrap an analyzed-or-analyzable plan as a DataFrame (classic
    * `Dataset.ofRows`). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a native expression builder as a session-scoped SQL
    * function on an ALREADY-RUNNING session (the builder-time path is
    * `GraftExtensions` via `spark.sql.extensions`). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** True if `name` resolves in the session's function registry. */
  def hasFunction(spark: SparkSession, name: String): Boolean =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .functionExists(FunctionIdentifier(name))

  /** Wrap a raw Catalyst expression as a user-facing Column (for the
    * handful of expressions with no `functions._` spelling, e.g.
    * IntegralDivide). */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
