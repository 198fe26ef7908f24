package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership as a codegen'd scan predicate.
  *
  * Spark's `BloomFilterMightContain` is the expression its own runtime
  * row-level-filtering injects for shuffle-pruning joins; here it is
  * wired against a DRIVER-BUILT filter (from
  * `DataFrameStatFunctions.bloomFilter`, whose long-insertion format
  * `putLong`/`mightContainLong` is exactly what the expression probes),
  * serialized into a binary literal so the predicate constant-folds into
  * whole-stage codegen and evaluates with zero per-row allocation. Used
  * by [[graft.ops.Dedup.dedupAgainstHistory]] to pre-filter a batch
  * against a history-fingerprint Bloom before the exact verify join.
  */
object BloomFunctions {

  /** `value` must be a LongType column inserted into the filter with the
    * same long values (`putLong` semantics — no rehashing on either
    * side). No false negatives: returns true for every inserted value.
    */
  def mightContain(value: Column, bloomBytes: Array[Byte]): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), GraftSqlBridge.expression(value)))
}
