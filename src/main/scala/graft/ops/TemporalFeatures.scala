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

  /** Time-decayed activity score per key with INTEGER half-life decay:
    * each contribution counts x >> ⌊age / halfLife⌋ (a right shift per
    * elapsed half-life) — the recency-weighted popularity / activity
    * feature without a single float: exponential-ish decay, exact
    * integer arithmetic, trivially map-side combinable, and an
    * external SQL oracle replays every term with integer division.
    * (Float e^{−λ·age} decay sums are order-dependent; shifts are not.)
    *
    * `asOfBucket` is the reference period (e.g. "today" in epoch
    * days) — an explicit parameter, never sniffed from the data, so
    * backfills reproduce. Contributions from the future of `asOfBucket`
    * are rejected loudly (a feature computed "as of" a day must not see
    * later data — the PIT rule). Output per key: n_events, raw_sum,
    * decayed_score.
    */
  def decayedScore(df: DataFrame, keys: Seq[String], bucketCol: Column,
                   valueCol: Column, asOfBucket: Long,
                   halfLifeBuckets: Int): DataFrame = {
    require(halfLifeBuckets >= 1, "halfLifeBuckets must be at least 1")
    val k = keys.map(col)
    val base = df.select((k :+ bucketCol.cast("long").as("_b") :+
        valueCol.cast("long").as("_x")): _*)
      .filter(col("_x").isNotNull && col("_b").isNotNull)
    val future = base.filter(col("_b") > asOfBucket).limit(1).count()
    require(future == 0L,
      s"decayedScore(asOf=$asOfBucket) saw a bucket after the as-of " +
        "point — point-in-time correctness forbids future contributions")
    val halfLives = least(expr(s"(${asOfBucket}L - _b) div $halfLifeBuckets"),
      lit(62L))
    base
      .withColumn("_hl", halfLives.cast("int"))
      .withColumn("_d", expr("shiftright(_x, _hl)"))
      .groupBy(k: _*)
      .agg(count(lit(1)).as("n_events"), sum(col("_x")).as("raw_sum"),
        sum(col("_d")).as("decayed_score"))
  }

  /** Forward-looking inactivity (churn) LABELS: for every (entity,
    * active bucket), did the entity go quiet for more than `horizon`
    * buckets afterwards? `next_gap` is the distance to the next active
    * bucket (NULL at the entity's last activity — right-censored), and
    * `churned` is gap > horizon, with the censored tail labeled
    * churned only when the observation window can actually SEE a full
    * horizon past the bucket (`asOfBucket − bucket > horizon`),
    * NULL otherwise — an unobservable label must stay NULL, not
    * default to false.
    *
    * This is a LABEL generator: it reads the future by design, so its
    * output may only ever join a training frame as the target, never
    * as a feature (the inverse of the PIT rule the feature side
    * enforces). One distinct collapse + one lead() per entity.
    */
  def forwardInactivityLabels(df: DataFrame, entityCol: Column,
                              bucketCol: Column, horizon: Int,
                              asOfBucket: Long): DataFrame = {
    require(horizon >= 1, "horizon must be at least 1")
    val active = df.select(entityCol.as("entity"),
        bucketCol.cast("long").as("bucket"))
      .filter(col("entity").isNotNull && col("bucket").isNotNull)
      .distinct()
    val w = Window.partitionBy(col("entity")).orderBy(col("bucket").asc)
    active
      .withColumn("next_gap", lead(col("bucket"), 1).over(w) - col("bucket"))
      .withColumn("churned",
        when(col("next_gap").isNotNull, col("next_gap") > horizon)
          .otherwise(when(lit(asOfBucket) - col("bucket") > horizon,
            lit(true))))
  }

  /** Discrete return-hazard curve from inter-activity gaps: for each
    * consecutive pair of active buckets per entity, the gap g is an
    * observed "returned after g" event; the tail from the last
    * activity to `asOfBucket` is right-censored (the entity might
    * still return). hazard(t) = events(t) / atRisk(t) with
    * atRisk(t) = Σ_{g ≥ t} events(g) + Σ_{c ≥ t} censored(c) — the
    * discrete Kaplan-Meier hazard, computed EXACTLY: gap histograms
    * are integers, at-risk counts are suffix sums over the tiny
    * |distinct gaps| frame, and the hazard is one division per row.
    *
    * Output per gap t: n_events, n_censored, at_risk, hazard.
    */
  def hazardCurve(df: DataFrame, entityCol: Column, bucketCol: Column,
                  asOfBucket: Long): DataFrame = {
    val active = df.select(entityCol.as("_e"),
        bucketCol.cast("long").as("_b"))
      .filter(col("_e").isNotNull && col("_b").isNotNull)
      .distinct()
    val w = Window.partitionBy(col("_e")).orderBy(col("_b").asc)
    val gaps = active
      .withColumn("_next", lead(col("_b"), 1).over(w))
      .select(col("_e"),
        when(col("_next").isNotNull, col("_next") - col("_b"))
          .otherwise(lit(asOfBucket) - col("_b")).as("t"),
        col("_next").isNull.as("_cens"))
      .filter(col("t") > 0L)
    val hist = gaps.groupBy(col("t"))
      .agg(sum(when(!col("_cens"), 1L).otherwise(0L)).as("n_events"),
        sum(when(col("_cens"), 1L).otherwise(0L)).as("n_censored"))
    // at-risk = suffix sums over the |distinct gaps| frame — a
    // broadcast band-join on the tiny histogram, NOT a SinglePartition
    // window (the q149/q152 keyed-cumsum rule, keyless edition)
    val tot = hist.select(col("t").as("_t2"),
      (col("n_events") + col("n_censored")).as("_c"))
    hist.join(broadcast(tot), col("_t2") >= col("t"))
      .groupBy(col("t"), col("n_events"), col("n_censored"))
      .agg(sum(col("_c")).as("at_risk"))
      .select(col("t"), col("n_events"), col("n_censored"),
        col("at_risk"),
        round(col("n_events") / col("at_risk").cast("double"), 6)
          .as("hazard"))
  }

  /** Kaplan–Meier survival estimator over right-censored durations: one
    * row per subject with duration `t` (positive integer buckets —
    * days, sessions, …) and an event flag (true = the terminal event
    * was OBSERVED at t; false = censored at t, still alive when
    * observation ended). S(t) = Π_{tᵢ ≤ t, dᵢ > 0} (1 − dᵢ/nᵢ) with
    * nᵢ = subjects at risk entering tᵢ — the standard retention /
    * time-to-churn curve that [[hazardCurve]]'s per-bucket hazard
    * integrates into a survival probability.
    *
    * The product is computed as exp(Σ ln(1 − dᵢ/nᵢ)) over the EVENT
    * rows of the duration histogram — a fixed dag of IEEE-double ops an
    * external SQL oracle replays — with the dᵢ = nᵢ absorbing state
    * (survival exactly 0 from that point on) handled by an integer
    * flag, never by ln(0).
    *
    * Scale shape: everything after the one map-side-combined duration
    * histogram is |distinct durations|-sized — at-risk suffix sums and
    * the survival prefix product are both broadcast band-joins on that
    * tiny frame, never a SinglePartition window over data. Those band
    * joins are O(|distinct durations|²) pairs, so the integer-bucket
    * contract is ENFORCED loudly: `maxDistinct` (same house pattern as
    * [[graft.ops.Statistics.isotonicFit]]) refuses a continuous
    * duration column — bucket to days/sessions first or raise the cap.
    */
  def kaplanMeier(df: DataFrame, durationCol: Column,
                  eventCol: Column, maxDistinct: Int = 2000): DataFrame = {
    val base = df.select(durationCol.cast("long").as("t"),
        eventCol.cast("boolean").as("_ev"))
      .filter(col("t").isNotNull && col("t") > 0L && col("_ev").isNotNull)
    val hist = base.groupBy(col("t"))
      .agg(sum(when(col("_ev"), 1L).otherwise(0L)).as("n_events"),
        sum(when(!col("_ev"), 1L).otherwise(0L)).as("n_censored"))
    // bounded-domain guard: one tiny count over the histogram frame
    val nDistinct = hist.count()
    require(nDistinct <= maxDistinct,
      s"kaplanMeier duration has $nDistinct distinct values (max" +
        s" $maxDistinct) — the at-risk/survival band joins are quadratic" +
        " in the duration histogram; bucket the duration to integer" +
        " days/sessions first or raise maxDistinct")
    val tot = hist.select(col("t").as("_t2"),
      (col("n_events") + col("n_censored")).as("_c"))
    val atRisk = hist.join(broadcast(tot), col("_t2") >= col("t"))
      .groupBy(col("t"), col("n_events"), col("n_censored"))
      .agg(sum(col("_c")).as("at_risk"))
    val factors = atRisk
      .select(col("t").as("_tf"), col("n_events").as("_d"),
        col("at_risk").as("_n"))
      .filter(col("_d") > 0L)
    atRisk.join(broadcast(factors), col("_tf") <= col("t"), "left")
      .groupBy(col("t"), col("n_events"), col("n_censored"),
        col("at_risk"))
      .agg(max(when(col("_d") === col("_n"), 1).otherwise(0)).as("_dead"),
        // the d = n factor is excluded here (it would be ln 0); the
        // _dead flag routes those rows to exact 0 instead
        sum(when(col("_d") < col("_n"),
          log(lit(1.0) - col("_d") / col("_n").cast("double"))))
          .as("_lnsum"))
      .select(col("t"), col("n_events"), col("n_censored"),
        col("at_risk"),
        when(coalesce(col("_dead"), lit(0)) === 1, lit(0.0))
          .otherwise(round(exp(coalesce(col("_lnsum"), lit(0.0))), 6))
          .as("survival"))
  }

  /** Inter-event burstiness per entity: B = (σ − μ)/(σ + μ) over the
    * entity's inter-arrival gaps (Goh–Barabási) — −1 for a perfectly
    * periodic entity, → 0 for Poisson arrivals, → 1 for extreme bursts.
    * The behavioural-rhythm feature that mean rate alone cannot see
    * (bots are periodic, humans are bursty).
    *
    * Gaps are truncated to WHOLE SECONDS (integer µs div) so Σg stays
    * an exact long and Σg² accumulates in DECIMAL(38,0) — no silent
    * 2⁶³ wrap at corpus scale (same hardening as degreeAssortativity /
    * cupedAdjust / hhiConcentration; r12 ADVICE); σ and B are then a
    * fixed double dag an external SQL oracle replays. Entities with zero gaps (single event) emit no
    * row; a single-gap entity has σ = 0 → B = −1 by the formula.
    *
    * Scale shape: one keyed lead window (parallel across entities) +
    * one map-side-combined per-entity aggregation.
    */
  def burstiness(df: DataFrame, entityCol: Column, tsMicrosCol: Column,
                 tieBreakCols: Seq[Column] = Nil): DataFrame = {
    val ties = tieBreakCols.zipWithIndex.map { case (c, i) =>
      c.as(s"_tb$i") }
    val w = Window.partitionBy(col("_e"))
      .orderBy(col("_ts").asc +: ties.indices.map(i =>
        col(s"_tb$i").asc): _*)
    val gaps = df
      .select(entityCol.as("_e") +: tsMicrosCol.cast("long").as("_ts") +:
        ties: _*)
      .filter(col("_e").isNotNull && col("_ts").isNotNull)
      .withColumn("_next", lead(col("_ts"), 1).over(w))
      .filter(col("_next").isNotNull)
      .withColumn("_gs", expr("(_next - _ts) div 1000000"))
    val mean = col("_sg").cast("double") / col("_n").cast("double")
    val varr = col("_sqq").cast("double") / col("_n").cast("double") -
      mean * mean
    val sigma = sqrt(greatest(lit(0.0), varr))
    gaps.groupBy(col("_e"))
      .agg(count(lit(1)).as("_n"), sum(col("_gs")).as("_sg"),
        sum(col("_gs").cast("decimal(38,0)") * col("_gs")).as("_sqq"))
      .select(col("_e").as("entity"), col("_n").as("n_gaps"),
        round(mean, 6).as("mean_gap_s"),
        when(sigma + mean > 0.0,
          round((sigma - mean) / (sigma + mean), 6)).as("burstiness"))
  }

  /** Rolling z-score anomaly flags per key — "is this reading far from
    * ITS OWN recent baseline", the per-entity complement of the global
    * drift battery. The baseline is the trailing `window` PRIOR rows
    * (the current row never contaminates its own baseline), and the
    * z-test is evaluated ENTIRELY in integers:
    *
    *   |x − S/n| > z·σ  ⇔  (n·x − S)² > z²·(n·Q − S²)
    *
    * with S = Σx, Q = Σx² over the frame — so there is no float
    * accumulation, no sqrt, and an external SQL oracle replays every
    * comparison exactly. `valueCol` must be integer-valued (cast to
    * LONG); magnitude bound: n·max|x|² must stay under 2⁶³ (doc'd like
    * [[graft.ops.Statistics.giniConcentration]]).
    *
    * Rows whose trailing frame is not yet full get `anomaly = NULL`
    * (no verdict), not false — a half-full baseline is not evidence.
    * Output: keys + order cols + `x`, `n_prior`, `anomaly`.
    */
  def rollingAnomaly(df: DataFrame, keys: Seq[String],
                     orderCols: Seq[Column], valueCol: Column,
                     window: Int, z: Int = 3): DataFrame = {
    require(window >= 2, "window must be at least 2")
    require(z >= 1, "z must be at least 1")
    val k = keys.map(col)
    val oc = orderCols.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }
    val on = oc.indices.map(i => col(s"_o$i"))
    val w = Window.partitionBy(k: _*).orderBy(on: _*)
      .rowsBetween(-window, -1)
    val base = df.select((k ++ oc :+ valueCol.cast("long").as("x")): _*)
      .withColumn("_s", sum(col("x")).over(w))
      .withColumn("_q", sum(col("x") * col("x")).over(w))
      .withColumn("n_prior", count(col("x")).over(w))
    val n = col("n_prior")
    val lhs = (n * col("x") - col("_s")) * (n * col("x") - col("_s"))
    val rhs = lit(z.toLong * z) * (n * col("_q") - col("_s") * col("_s"))
    base.withColumn("anomaly",
        when(n === window.toLong, lhs > rhs))
      .drop("_s", "_q")
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
