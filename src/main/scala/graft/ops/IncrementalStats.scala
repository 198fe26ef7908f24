package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable per-bucket statistics: the incremental-monitoring pattern the
  * reference's statistics engine recomputes from scratch per window
  * (`core/statistics_engine.py` recompute-on-schedule; our
  * [[Monitoring]] windows scan their slice each call). At 100 TB the
  * history may never be rescanned: each arriving bucket (a day, an hour,
  * an ingest batch) contributes one PARTIAL row of exact mergeable
  * moments — count, Σx, Σx², min, max — and any span's statistics fold
  * from its buckets' partials alone, associatively, in any order.
  *
  * The moments are kept as exact integers over a caller-scaled value
  * (e.g. cents) so merge order can never change a bit — the float
  * mean/variance are derived at READ time from the folded integers, not
  * accumulated. That is what makes the fold safe to run tree-wise across
  * 1000 executors or incrementally across months of stored partials.
  *
  * Scale shape: `partials` is one map-side-combined groupBy of the new
  * bucket only; `merge` aggregates |buckets| tiny rows — never raw data.
  */
object IncrementalStats {

  /** Exact mergeable moments per (keys..., bucket). `scaled` must be an
    * integral-valued column (the caller picks the fixed-point scale).
    *
    * Null contract: rows with a null `scaled` are filtered BEFORE the
    * groupBy, so `n`, the moment sums, min/max, and the bucket row set
    * all describe the same (non-null) population — a merged `n` always
    * equals what a rescan of the contributing rows would count, and an
    * all-null bucket emits no partial row (it would otherwise inflate
    * `n_buckets` with an n=0 row carrying null moments).
    */
  def partials(df: DataFrame, keys: Seq[String], bucket: Column,
               scaled: Column): DataFrame =
    df.filter(scaled.isNotNull)
      .groupBy((keys.map(col) :+ bucket.as("bucket")): _*)
      .agg(count(lit(1)).as("n"),
        sum(scaled).as("sum_v"),
        sum(scaled * scaled).as("sum_sq"),
        min(scaled).as("min_v"),
        max(scaled).as("max_v"))

  /** Fold partial rows down to one row per key group. Pure second-level
    * aggregation over the moment columns — associative and commutative,
    * so it composes: merged outputs are themselves valid partials.
    */
  def merge(partialRows: DataFrame, keys: Seq[String]): DataFrame =
    partialRows.groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        sum(col("sum_sq")).as("sum_sq"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        count(lit(1)).as("n_buckets"))
}
