package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the sql package so graft code can wrap a custom
  * Catalyst Expression as a user-facing Column (Spark 4 routes Column
  * construction through ColumnNode; the classic converter is private[sql]). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a hand-built LogicalPlan (e.g. a custom operator node) as a
    * DataFrame — Dataset.ofRows is private[sql]. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
