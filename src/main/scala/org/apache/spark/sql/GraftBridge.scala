package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Expression↔Column conversion (Spark 4.x
  * moved the old `Column(expr)` constructor behind ColumnNode).
  * Pattern follows public extension libraries (e.g. Qbeast's
  * DatasetFactory) that host a factory inside org.apache.spark.sql.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
