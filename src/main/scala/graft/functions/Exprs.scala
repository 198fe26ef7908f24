package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-building helpers. */
object Exprs {

  /** Let-binding for column expressions: evaluate `value` ONCE per row and
    * reference it many times in `body`.
    *
    * Spark's higher-order functions (`transform`, `filter`, `aggregate`)
    * re-evaluate any non-lambda subexpression captured by the lambda body
    * on EVERY element — `transform(idx, i => slice(tokens, i, n))`
    * re-tokenizes the whole document once per produced n-gram, turning a
    * linear scan into O(elements × cost(value)). Binding through a
    * single-element `transform` makes `value` the lambda ARGUMENT, which
    * Spark evaluates exactly once:
    * `element_at(transform(array(value), v => body(v)), 1)`.
    */
  def let(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)
}
