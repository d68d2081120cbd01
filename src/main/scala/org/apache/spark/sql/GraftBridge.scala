package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` Expression↔Column and Dataset↔LogicalPlan
  * conversion (Spark 4.x moved the old `Column(expr)` constructor
  * behind ColumnNode). Pattern follows public extension libraries
  * (e.g. Qbeast's DatasetFactory) that host a factory inside
  * org.apache.spark.sql.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager Column→Expression conversion through the session's
    * converter — unlike [[expression]], the result is a fully
    * converted catalyst tree (no lazy ColumnNodeExpression wrappers,
    * which embed non-serializable internal nodes).
    */
  def eagerExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** DataFrame from a (possibly custom) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed-or-not logical plan backing a Dataset. */
  def logicalPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan
}
