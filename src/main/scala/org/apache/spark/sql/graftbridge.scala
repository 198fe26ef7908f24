package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal public bridge to the `private[sql]` Column ↔ Expression
  * conversions, for registering custom Catalyst expressions as Columns
  * (Spark 4 moved these behind `org.apache.spark.sql.classic`).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGERLY convert a composed Column into a catalyst expression tree
    * (UnresolvedFunction / lambda nodes the analyzer then resolves).
    * `expression` returns a lazy ColumnNodeExpression wrapper, which is
    * fine inside the Dataset API but never gets converted when returned
    * from a FunctionRegistry builder — codegen then dies on the
    * unconverted node. Function builders must use this form.
    */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Last micro-batch's executed physical plan of a streaming query
    * (`StreamingQueryWrapper` is `private[sql]`) — lets plan-quality specs
    * audit stateful streaming plans with the same walker as batch plans.
    */
  def lastExecutedPlan(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Option[org.apache.spark.sql.execution.SparkPlan] = q match {
    case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution).map(_.executedPlan)
    case _ => None
  }
}
