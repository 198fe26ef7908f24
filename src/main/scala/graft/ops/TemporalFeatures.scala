package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity temporal feature constructors — the event-stream → feature
  * transforms a training pipeline derives from raw activity (reference
  * feature views compute joins/aggregations, python/hsfs/feature_view.py;
  * these are the standard derived-feature recipes on top).
  */
object TemporalFeatures {

  /** Trailing exponentially-weighted moving average per key: for each
    * row, fold the last `window` values (ordered by `orderCols`) through
    * `s ← α·x + (1−α)·s`, seeded with the oldest value in the frame —
    * the classic recency-weighted activity feature.
    *
    * The fold runs over a bounded `collect_list` window frame (≤ `window`
    * doubles per row) with `aggregate`, a row-local HOF — deterministic
    * left-to-right order, so the exact double dag replays in external
    * SQL (`list_reduce` folds the same way). `1 − α` is computed at plan
    * time from the same literal on both engines. One window shuffle on
    * `keys`; no data-sized state.
    *
    * Null contract: null values must be filtered upstream (a null inside
    * the frame would silently shrink `collect_list` and misalign the
    * fold); enforced here with a require on the column's nullability
    * being handled by the caller is impossible, so nulls are dropped
    * WITH their rows by an explicit filter.
    */
  def ewmaTrailing(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                   valueCol: Column, alpha: Double, window: Int,
                   out: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(window >= 1, "window must be at least 1")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val vals = collect_list(valueCol.cast("double")).over(w)
    df.filter(valueCol.isNotNull)
      .withColumn("_ew_v", vals)
      .withColumn(out,
        aggregate(
          slice(col("_ew_v"), lit(2), greatest(size(col("_ew_v")) - 1, lit(0))),
          element_at(col("_ew_v"), 1),
          (acc, x) => lit(alpha) * x + (lit(1.0) - lit(alpha)) * acc))
      .drop("_ew_v")
  }

  /** Activity pivot: one row per key with `(count, sum)` feature columns
    * per pivot value — `{value}_n`, `{value}_total` — the "user activity
    * profile" feature view. `values` must be the explicit pivot domain
    * (deterministic column set, no distinct pass, exactly Spark's
    * recommended large-scale pivot form); unseen values yield 0 counts.
    * One map-side-combined groupBy; no second scan.
    */
  def activityPivot(df: DataFrame, keys: Seq[String], pivotCol: String,
                    values: Seq[String], valueCol: Column): DataFrame = {
    require(values.nonEmpty, "explicit pivot values required")
    df.groupBy(keys.map(col): _*)
      .pivot(pivotCol, values)
      .agg(count(lit(1)).as("n"),
        round(sum(valueCol), 2).as("total"))
      .na.fill(0L, values.map(_ + "_n"))
  }

  /** EXACT trailing-window distinct entities per key — "distinct active
    * users in the trailing `windowBuckets` days", the feature-store
    * staple that is genuinely hard at scale because COUNT(DISTINCT)
    * over a sliding frame cannot partial-aggregate. The classic
    * contribution-explode makes it one-pass exact:
    *
    *  1. collapse to distinct (key, entity, bucket) actives — the only
    *     data-sized shuffle, map-side combined;
    *  2. each active bucket contributes the entity to windows
    *     [bucket, bucket + w − 1] (a ≤w-element `sequence` explode on
    *     the already-collapsed frame);
    *  3. de-dup (key, entity, window) — an entity active twice inside
    *     one window counts once — and count per (key, window);
    *  4. keep only windows whose END bucket was observed in the data
    *     (no phantom trailing days after the last event).
    *
    * `bucketCol` is the integer time bucket (e.g. epoch days). Output:
    * keys, `bucket`, `n_distinct`.
    */
  def trailingDistinct(df: DataFrame, keys: Seq[String],
                       entityCol: Column, bucketCol: Column,
                       windowBuckets: Int): DataFrame = {
    require(windowBuckets >= 1, "windowBuckets must be at least 1")
    val k = keys.map(col)
    val active = df
      .select((k :+ entityCol.as("_e") :+
        bucketCol.cast("long").as("_b")): _*)
      .distinct()
    val contrib = active
      .select((k :+ col("_e") :+
        explode(sequence(col("_b"),
          col("_b") + lit(windowBuckets - 1).cast("long")))
          .as("bucket")): _*)
      .distinct()
    val observed = active.select((k :+ col("_b").as("bucket")): _*)
      .distinct()
    contrib.groupBy((k :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n_distinct"))
      .join(observed, keys :+ "bucket")
  }

  /** Cohort retention curves — the growth-analytics staple: bucket
    * each entity into the cohort of its FIRST active period, then for
    * every (cohort, later period) report how many of the cohort were
    * active and the retention fraction.
    *
    * Scale shape: one distinct collapse to (entity, bucket) actives
    * (map-side combined — the only data-sized shuffle), one per-entity
    * min for the cohort (re-aggregates the collapsed frame), one
    * entity-keyed join back, then everything is |cohorts × periods|
    * frames. All integers until the single retention division, so an
    * external oracle replays exactly.
    *
    * `bucketCol` is the integer period (epoch weeks, days…). Output:
    * (cohort, period_index, n_cohort, n_active, retention) — period 0
    * is the cohort's own bucket, retention 1.0 by construction.
    */
  def retentionCohorts(df: DataFrame, entityCol: Column,
                       bucketCol: Column): DataFrame = {
    val active = df.select(entityCol.as("_e"),
        bucketCol.cast("long").as("_b"))
      .filter(col("_e").isNotNull && col("_b").isNotNull)
      .distinct()
    val cohorts = active.groupBy("_e").agg(min(col("_b")).as("cohort"))
    val sizes = cohorts.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    active.join(cohorts, "_e")
      .groupBy(col("cohort"), (col("_b") - col("cohort")).as("period_index"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("period_index"), col("n_cohort"),
        col("n_active"),
        round(col("n_active") / col("n_cohort").cast("double"), 6)
          .as("retention"))
  }

  /** One-sided CUSUM change-point statistic per key — the sequential
    * drift alarm ("has this user's / sensor's level shifted up?") that
    * complements the batch drift battery in [[Monitoring]].
    *
    * The textbook recursion S_i = max(0, S_{i−1} + d_i) looks
    * inherently sequential, but it has a closed prefix form:
    * S_i = P_i − min_{0≤j≤i} P_j with P the running sum of the
    * deviations d (and P_0 = 0) — so the whole statistic is TWO
    * running window aggregates over one keyed shuffle, no iteration,
    * no driver state, exactly as distributed as a window can be.
    *
    * `deviationCol` is the already-centered per-row deviation
    * (x − target − slack), cast to LONG — integer deviations make the
    * prefix sums exact, so an external SQL oracle replays the value dag
    * bit-identically with no float summation-order hazard.
    *
    * Output: the input keys + order columns with `cusum` (S_i) and
    * `alarm` (S_i ≥ threshold).
    */
  def cusum(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
            deviationCol: Column, threshold: Long): DataFrame = {
    val k = keys.map(col)
    val oc = orderCols.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }
    val on = oc.indices.map(i => col(s"_o$i"))
    val base = df.select((k ++ oc :+
      deviationCol.cast("long").as("_d")): _*)
    val wRun = Window.partitionBy(k: _*).orderBy(on: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // P_0 = 0 enters as least(minP, 0): the empty prefix is a valid j
    val withP = base.withColumn("_p", sum(col("_d")).over(wRun))
    withP
      .withColumn("cusum",
        col("_p") - least(min(col("_p")).over(wRun), lit(0L)))
      .withColumn("alarm", col("cusum") >= threshold)
      .drop("_d", "_p")
  }
}
