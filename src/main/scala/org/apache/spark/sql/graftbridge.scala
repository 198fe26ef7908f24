package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal public bridge to the `private[sql]` Column ↔ Expression
  * conversions, for registering custom Catalyst expressions as Columns
  * (Spark 4 moved these behind `org.apache.spark.sql.classic`).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
