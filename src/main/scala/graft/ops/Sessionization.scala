package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: the gap-based session semantics of the streaming
  * path ([[graft.streaming.Streaming.sessionize]],
  * `session_window`) over data at rest — backfilling session features for
  * training needs the BATCH form of exactly what serving computes online,
  * or the train/serve skew eats the model.
  *
  * Scale shape: one shuffle+sort per key partition (the window), then the
  * per-session aggregation groups on (keys, session index) — a superset
  * of the window's partitioning keys, so Catalyst reuses the exchange
  * (no second shuffle; visible in the plan as a single Exchange). A
  * key's whole history sorts inside one task — same contract as every
  * per-entity window here; salt upstream if an entity exceeds the task
  * budget.
  */
object Sessionization {

  /** Tag every row with its session index per key group: a session break
    * is a gap of MORE than `gapUs` micros since the previous event (ties
    * and exact-gap events stay in-session, matching `session_window`'s
    * inclusive semantics). `tsUs` must be long micros
    * ([[graft.functions.TimeFunctions.eventTimeToMicros]]).
    */
  def withSessionIndex(df: DataFrame, keys: Seq[String], tsUs: Column,
                       gapUs: Long): DataFrame = {
    require(gapUs > 0, "session gap must be positive")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tsUs.asc)
    val break_ = when(lag(tsUs, 1).over(w).isNull ||
      tsUs - lag(tsUs, 1).over(w) > gapUs, 1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(break_).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** One row per (keys, session): start/end micros, event count, and the
    * sum of `valueCol` (caller scales to exact integers for oracle-grade
    * determinism).
    */
  def sessionFeatures(df: DataFrame, keys: Seq[String], tsUs: Column,
                      valueCol: Column, gapUs: Long): DataFrame =
    withSessionIndex(df.withColumn("_ts_us", tsUs)
        .withColumn("_v", valueCol),
      keys, col("_ts_us"), gapUs)
      .groupBy((keys.map(col) :+ col("session_idx")): _*)
      .agg(min(col("_ts_us")).as("session_start_us"),
        max(col("_ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("_v")).as("total"))

  /** Cohort retention matrix: bucket event time into `bucketUs`-wide
    * periods, cohort every entity by its FIRST active period, and report
    * per (cohort, offset) how many — and what fraction of — the
    * cohort's entities were active `offset` periods later. The standard
    * engagement/decay surface behind activity features.
    *
    * Scale shape: the only data-sized work is one distinct over
    * (entity, period) — integral division rides the scan, and every
    * later step (first-period agg, offset join, cohort sizes) runs over
    * the |entities × active periods| distinct frame or smaller.
    */
  def cohortRetention(df: DataFrame, entityCol: String, tsUs: Column,
                      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucket width must be positive")
    val active = df
      .select(col(entityCol).as("_e"),
        call_function("div", tsUs, lit(bucketUs)).as("_p"))
      .distinct()
    val first = active.groupBy(col("_e")).agg(min(col("_p")).as("cohort"))
    val sizes = first.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_cohort"))
    active.join(first, Seq("_e"))
      .groupBy(col("cohort"), (col("_p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"),
        col("n_cohort"),
        round(col("n_active") / col("n_cohort"), 4).as("retention"))
  }
}
