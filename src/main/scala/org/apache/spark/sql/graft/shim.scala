package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column<->Expression converters — the
  * supported way for third-party Catalyst expressions to surface as
  * `Column`s in Spark 4's classic API (ExpressionUtils is sql-private).
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully convert a functions-API `Column` tree into a Catalyst
    * expression the analyzer can resolve. [[expression]] merely WRAPS the
    * column node (fine when the Column already wraps a concrete
    * Expression); a Column built from `org.apache.spark.sql.functions`
    * compositions needs the classic converter, or it survives analysis as
    * an un-codegen-able opaque node. This is what lets one Column-based
    * operator definition serve both the DataFrame API and a registered
    * SQL function.
    */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a (resolved) logical plan as a DataFrame (Dataset.ofRows is
    * private[sql]).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
