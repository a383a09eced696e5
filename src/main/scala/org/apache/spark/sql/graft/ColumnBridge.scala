package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ catalyst Expression
  * converters (Spark 4 moved Column onto ColumnNode; classic
  * conversions live behind package-private ExpressionUtils). Lives in
  * the org.apache.spark.sql namespace solely to satisfy the access
  * qualifier — the engine's custom expressions (graft.functions.*) go
  * through here to expose themselves as Columns.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-wrap an analyzed logical subplan as a DataFrame — lets test
    * lints measure a plan FRAGMENT (e.g. a Window node's input)
    * empirically instead of guessing from plan text. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
