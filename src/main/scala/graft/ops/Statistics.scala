package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Materialize.PinOps

/** Descriptive statistics / profiling — the engine's Deequ-equivalent
  * (reference: java SparkEngine.java:686-723 ColumnProfilerRunner config,
  * parsed into python/hsfs/core/feature_descriptive_statistics.py:108-177;
  * python engine twin engine/python.py:524-634).
  *
  * Scale design: the numeric profile is ONE aggregation pass over the data
  * (map-side partial aggregation, no shuffle of raw rows — only of partial
  * buffers); the frequency-based metrics (histogram, entropy, distinctness,
  * exact uniqueness) are ONE groupBy per column, shuffling only (value,
  * count) pairs. Approximate forms (HLL distinct, approx percentiles) keep
  * the single-pass property at 100 TB; exact forms are opt-in, as in the
  * reference (`withExactUniqueness`).
  */
object Statistics {

  /** Round half away from zero (SQL ROUND semantics — matches DuckDB/Spark
    * SQL `round`, unlike `math.rint`'s half-to-even).
    */
  def roundHalfUp(x: Double, scale: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  final case class ColumnProfile(
      feature: String,
      count: Long,
      nullCount: Long,
      completeness: Double,
      approxDistinct: Long,
      min: Option[Double],
      max: Option[Double],
      sum: Option[Double],
      mean: Option[Double],
      stddev: Option[Double],
      percentiles: Seq[Double])

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** One-pass per-column profile. Numeric columns get min/max/sum/mean/
    * stddev/percentiles; every column gets count/completeness/approx
    * distinct. Returns one [[ColumnProfile]] per requested column.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil,
              exactPercentiles: Boolean = false,
              withPercentiles: Boolean = true): Seq[ColumnProfile] = {
    val cols =
      if (columns.nonEmpty) columns
      else df.schema.fields.map(_.name).toSeq
    val schema = df.schema

    val aggs: Seq[Column] = cols.flatMap { c =>
      val numeric = isNumeric(schema(c).dataType)
      val base = Seq(
        count(col(c)).as(s"${c}__count"),
        count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
        approx_count_distinct(col(c)).as(s"${c}__approx_distinct"))
      val num = if (numeric) Seq(
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c)).cast("double").as(s"${c}__sum"),
        avg(col(c)).cast("double").as(s"${c}__mean"),
        stddev_samp(col(c)).cast("double").as(s"${c}__stddev")) ++
        (if (!withPercentiles) Seq.empty
         else Seq((if (exactPercentiles)
           expr(s"percentile($c, array(0.25, 0.5, 0.75))")
         else
           percentile_approx(col(c), array(lit(0.25), lit(0.5), lit(0.75)),
             lit(10000)).cast("array<double>")).as(s"${c}__pcts")))
      else Seq.empty
      base ++ num
    }

    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    cols.map { c =>
      val numeric = isNumeric(schema(c).dataType)
      def d(s: String): Option[Double] =
        if (!numeric || row.isNullAt(row.fieldIndex(s))) None
        else Some(row.getDouble(row.fieldIndex(s)))
      val n = row.getLong(row.fieldIndex(s"${c}__count"))
      val nulls = row.getLong(row.fieldIndex(s"${c}__nulls"))
      val total = n + nulls
      ColumnProfile(
        feature = c,
        count = n,
        nullCount = nulls,
        completeness = if (total == 0) 0.0 else n.toDouble / total,
        approxDistinct = row.getLong(row.fieldIndex(s"${c}__approx_distinct")),
        min = d(s"${c}__min"), max = d(s"${c}__max"), sum = d(s"${c}__sum"),
        mean = d(s"${c}__mean"), stddev = d(s"${c}__stddev"),
        percentiles =
          if (!numeric || !withPercentiles) Nil
          else Option(row.getAs[scala.collection.Seq[Double]](s"${c}__pcts"))
            .map(_.toSeq).getOrElse(Nil))
    }
  }

  /** Profile as a DataFrame (long format), convenient for oracle checks and
    * for persisting statistics alongside a feature group.
    */
  def profileDf(df: DataFrame, columns: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the long-format oracle output carries no percentiles — skip the
    // sort-heavy exact-percentile aggregate entirely
    profile(df, columns, withPercentiles = false)
      .map(p => (p.feature, p.count, p.nullCount,
        p.min.getOrElse(Double.NaN), p.max.getOrElse(Double.NaN),
        roundHalfUp(p.mean.getOrElse(Double.NaN), 4),
        roundHalfUp(p.stddev.getOrElse(Double.NaN), 4)))
      .toDF("feature", "cnt", "nulls", "min_v", "max_v", "mean_v", "stddev_v")
  }

  /** Histogram: top-k most frequent values with deterministic tie-break
    * (Deequ histogram top-20, SparkEngine.java:698-703).
    */
  def histogram(df: DataFrame, column: String, topK: Int = 20): DataFrame =
    df.groupBy(col(column).cast("string").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("value").asc)
      .limit(topK)

  /** Frequency-derived metrics in one groupBy pass: Shannon entropy (nats,
    * Deequ convention), distinctness (#distinct / #rows), uniqueness
    * (#values-appearing-once / #rows), exact distinct count.
    */
  def frequencyMetrics(df: DataFrame, column: String): DataFrame = {
    val counts = df.filter(col(column).isNotNull)
      .groupBy(col(column)).agg(count(lit(1)).as("cnt"))
    counts.agg(
      round((-sum(col("cnt") * log(col("cnt"))) / sum(col("cnt"))
        + log(sum(col("cnt")))), 6).as("entropy"),
      round(count(lit(1)) / sum(col("cnt")), 6).as("distinctness"),
      round(sum(when(col("cnt") === 1, 1L).otherwise(0L)) / sum(col("cnt")), 6)
        .as("uniqueness"),
      count(lit(1)).as("exact_distinct"))
  }

  /** Exact distinct values of one column
    * (engine/spark.py:1393-1396 get_unique_values), sorted for determinism
    * (the label-encoder contract sorts, builtin_transformations.py:47-49).
    */
  def uniqueValues(df: DataFrame, column: String): Seq[Any] =
    df.select(col(column)).distinct().orderBy(col(column))
      .collect().map(_.get(0)).toSeq

  /** Pearson correlation over the given numeric columns (Deequ
    * withCorrelation ≤100 cols), in ONE pass via [[correlationMatrix]] —
    * `df.stat.corr` costs one full scan PER PAIR (O(p²) scans at 100 TB).
    *
    * Null semantics are LISTWISE over the REQUESTED set: a row null in any
    * requested column is excluded from every pair of this call (the
    * one-pass matrix computes all pairs from one complete-rows pass).
    * Consequently the same pair can differ between calls with different
    * column sets when nulls are present — request a pair alone for
    * pairwise-deletion semantics. Uniform for any column count (the
    * two-column case is identical under both deletion rules).
    */
  def correlations(df: DataFrame, columns: Seq[String]): DataFrame =
    correlationMatrix(df, columns)

  /** Pearson correlation MATRIX in ONE pass over the data — at 100 TB the
    * per-pair `df.stat.corr` costs one scan per pair (O(p²) scans); this
    * costs one scan total for up to the Deequ cap of ~100 columns.
    *
    * Two physical strategies behind the same semantics (listwise deletion
    * over the requested set, enforced by the explicit complete-rows
    * filter):
    *  - p ≤ 16: p·(p−1)/2 native `corr` aggregates in one whole-stage-
    *    codegen'd aggregation — no row→vector conversion, no MLlib job,
    *    plain partial aggregation (up to ~120 aggs, inside codegen's
    *    comfort zone);
    *  - p > 16: MLlib `Correlation.corr` on an assembled vector, whose
    *    one Pearson pass scales to the wide case where thousands of
    *    aggregate expressions would fall out of codegen.
    */
  def correlationMatrix(df: DataFrame, columns: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = for {
      i <- columns.indices
      j <- (i + 1) until columns.size
    } yield (columns(i), columns(j))
    if (pairs.isEmpty)
      return Seq.empty[(String, String, Double)]
        .toDF("feature_a", "feature_b", "corr_v")
    // listwise deletion over the REQUESTED set, identical for both paths
    val complete = df.select(columns.map(col): _*).na.drop(columns)
    val m: Map[(String, String), Double] =
      if (columns.size <= 16) {
        val aggs = pairs.map { case (a, b) =>
          corr(col(a), col(b)).as(s"${a}__${b}") }
        val row = complete.agg(aggs.head, aggs.tail: _*).collect().head
        pairs.zipWithIndex.map { case (p, i) =>
          p -> (if (row.isNullAt(i)) Double.NaN else row.getDouble(i)) }.toMap
      } else {
        import org.apache.spark.ml.feature.VectorAssembler
        import org.apache.spark.ml.stat.Correlation
        val assembled = new VectorAssembler()
          .setInputCols(columns.toArray).setOutputCol("_features")
          .transform(complete)
        val mat = Correlation.corr(assembled, "_features").head
          .getAs[org.apache.spark.ml.linalg.Matrix](0)
        pairs.map { case (a, b) =>
          (a, b) -> mat(columns.indexOf(a), columns.indexOf(b)) }.toMap
      }
    pairs.map { case (a, b) => (a, b, roundHalfUp(m((a, b)), 6)) }
      .toDF("feature_a", "feature_b", "corr_v")
  }

  /** Monitoring-window statistics comparison: absolute or relative
    * difference of a scalar metric between detection and reference windows
    * against a threshold → shift flag
    * (core/feature_monitoring_result_engine.py:342-440).
    */
  def differenceAndShift(
      detection: Double, reference: Double,
      threshold: Double, relative: Boolean,
      strict: Boolean = false): (Double, Boolean) = {
    val diff =
      if (relative) {
        if (reference == 0.0) Double.PositiveInfinity
        else (detection - reference) / reference
      } else detection - reference
    val shifted =
      if (strict) math.abs(diff) > threshold else math.abs(diff) >= threshold
    (diff, shifted)
  }

  /** Mutual information (nats) between two categorical columns — the
    * feature-selection / label-association score the reference's
    * statistics engine stops short of (it has correlation only,
    * core/statistics_engine.py): `I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))`
    * over the joint count table, computed exactly from integer counts.
    * Rows with a null in either column are excluded (standard listwise
    * contract, same as [[correlations]]).
    *
    * One map-side-combined groupBy of the data to the |X×Y| joint-count
    * frame; the marginals re-aggregate that tiny frame and join back
    * broadcast; the MI fold is a scalar aggregate over |X×Y| rows. The
    * data is scanned once and never shuffled beyond the joint counts.
    */
  /** Exact per-key AUC (ROC area) with standard tie correction — THE
    * ranking metric for a deployed scorer, computed distributed: AUC is
    * the Mann-Whitney U statistic,
    * `(Σ_pos rank − P(P+1)/2) / (P·N)` with ties taking average ranks.
    * Doubling ranks keeps the whole dag integral until the final
    * division (`2·rank = 2·cumBefore + n + 1`), so the score replays
    * bit-for-bit in SQL.
    *
    * Scale shape: ONE map-side-combined groupBy of the data to a
    * |keys × distinct scores| count frame; rank cumsums and the AUC
    * fold run over that frame, partitioned BY KEY (no single-partition
    * window). Same bounded-distinct contract as `winsorize`: on a raw
    * continuous score at 100 TB, quantize the score first (calibration
    * bins or rounding) — an AUC over 1e-6-rounded scores is the same
    * number for any real purpose.
    *
    * Keys with no positives or no negatives have undefined AUC and are
    * EXCLUDED from the output (the alternative, ±inf/NaN, poisons
    * downstream aggregation). Null scores/labels drop listwise.
    */
  def aucByKey(df: DataFrame, keys: Seq[String], scoreCol: Column,
               labelCol: Column): DataFrame = {
    require(keys.nonEmpty, "aucByKey needs at least one key column" +
      " (add a constant column for a global AUC)")
    val counts = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .groupBy((keys.map(col) :+ scoreCol.cast("double").as("_v")): _*)
      .agg(count(lit(1)).as("_c"),
        sum(labelCol.cast("long")).as("_p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("_v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    counts
      .withColumn("_cb", coalesce(sum(col("_c")).over(w), lit(0L)))
      .withColumn("_ptot", sum(col("_p")).over(tw))
      .withColumn("_ntot", sum(col("_c")).over(tw) - col("_ptot"))
      .filter(col("_ptot") > 0 && col("_ntot") > 0)
      .groupBy(keys.map(col): _*)
      .agg(
        round((sum(col("_p") * (lit(2) * col("_cb") + col("_c") + 1))
          - max(col("_ptot")) * (max(col("_ptot")) + 1)).cast("double")
          / (lit(2) * max(col("_ptot")) * max(col("_ntot"))).cast("double"),
          6).as("auc"),
        max(col("_ptot")).as("n_pos"),
        max(col("_ntot")).as("n_neg"))
  }

  /** Key-skew profile: the numbers that decide whether a join/window on
    * `keys` needs salting — total rows, distinct keys, the hottest
    * key's share, the max/mean imbalance ratio, and the top-k heaviest
    * keys as a struct array. This is the measurement behind
    * `PointInTimeJoin.AutoSalt`'s probe, exposed as a first-class
    * profiling operator (exact, not sampled — run it when deciding a
    * layout, not per query).
    *
    * One map-side-combined groupBy to the per-key count frame; the
    * top-k is a TakeOrdered (never a global sort), the scalars fold in
    * one aggregate over that frame. Integer counts; the two ratios are
    * single divisions rounded at 6.
    */
  def keySkewProfile(df: DataFrame, keys: Seq[String],
                     topK: Int = 10): DataFrame = {
    require(keys.nonEmpty, "keySkewProfile needs key columns")
    require(topK >= 1, "topK must be at least 1")
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .pinned()
    val keyStruct = struct((keys.map(col) :+ col("_c").as("rows")): _*)
    val top = counts.orderBy(col("_c").desc,
        concat_ws("", keys.map(c => col(c).cast("string")): _*).asc)
      .limit(topK)
      .agg(collect_list(keyStruct).as("top_keys"))
    counts.agg(
        sum(col("_c")).as("total_rows"),
        count(lit(1)).as("n_keys"),
        max(col("_c")).as("max_key_rows"))
      .withColumn("hot_share",
        round(col("max_key_rows").cast("double") /
          col("total_rows").cast("double"), 6))
      .withColumn("imbalance",
        round(col("max_key_rows").cast("double") /
          (col("total_rows").cast("double") / col("n_keys").cast("double")),
          6))
      .crossJoin(broadcast(top))
  }

  /** Audience overlap: pairwise Jaccard similarity between the entity
    * sets of each category ("what fraction of viewers also purchase") —
    * the segment-overlap matrix behind cohort design. Exact, and
    * WITHOUT a self-join of entity sets: each entity folds to one
    * bitmask of the categories it touched (`sum(DISTINCT 2^i)` — the
    * distinct powers ARE the bitmask), masks count into a ≤ 2^k-row
    * frame, and every pairwise |∩|, |∪| folds from those counts. Two
    * grouped passes over data (entity masks, mask counts ride the
    * same aggregation), then pure tiny-frame algebra: at 100 TB the
    * k² pair outputs never touch the data again.
    *
    * `types` is the explicit category domain (≤ 62 for the long
    * bitmask); categories outside it are ignored.
    */
  def audienceOverlap(df: DataFrame, entityCol: String, typeCol: String,
                      types: Seq[String]): DataFrame = {
    require(types.nonEmpty && types.size <= 62,
      "explicit category domain of at most 62 types required")
    val spark = df.sparkSession
    import spark.implicits._
    val power = types.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (t, i)) => when(col(typeCol) === t, lit(1L << i))
        .otherwise(acc)
    }
    val masks = df.filter(col(entityCol).isNotNull && power.isNotNull)
      .select(col(entityCol), power.as("_ao_p"))
      .groupBy(col(entityCol))
      .agg(sum_distinct(col("_ao_p")).as("_ao_mask"))
      .groupBy(col("_ao_mask")).agg(count(lit(1)).as("_ao_n"))
    val pairs = (for {
      (a, i) <- types.zipWithIndex; (b, j) <- types.zipWithIndex
      if i < j
    } yield (a, 1L << i, b, 1L << j))
      .toDF("type_a", "_ao_ba", "type_b", "_ao_bb")
    masks.crossJoin(broadcast(pairs))
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        sum(when(col("_ao_mask").bitwiseAND(col("_ao_ba")) > 0,
          col("_ao_n")).otherwise(0L)).as("_na"),
        sum(when(col("_ao_mask").bitwiseAND(col("_ao_bb")) > 0,
          col("_ao_n")).otherwise(0L)).as("_nb"),
        sum(when(col("_ao_mask").bitwiseAND(col("_ao_ba")) > 0 &&
          col("_ao_mask").bitwiseAND(col("_ao_bb")) > 0,
          col("_ao_n")).otherwise(0L)).as("_nab"))
      .select(col("type_a"), col("type_b"),
        col("_na").as("n_a"), col("_nb").as("n_b"),
        col("_nab").as("n_both"),
        round(when(col("_na") + col("_nb") - col("_nab") > 0,
          col("_nab").cast("double") /
            (col("_na") + col("_nb") - col("_nab")).cast("double")), 6)
          .as("jaccard"))
  }

  /** Cohen's kappa: chance-corrected agreement between two categorical
    * "rater" columns — the standard QA score for labeled training data
    * (two annotators, or a heuristic labeler vs a gold subset):
    * `κ = (p_o − p_e) / (1 − p_e)` with `p_o` the observed agreement
    * rate and `p_e` the expected-by-chance rate from the raters'
    * marginals. Listwise null drop; rater values compare by equality
    * (null never equals null — rows where either rater abstained are
    * excluded, the standard convention).
    *
    * One map-side-combined groupBy to the |cats²| confusion frame; the
    * marginals re-aggregate that tiny frame and join back broadcast;
    * p_o, p_e, κ fold in one aggregate. Exact integer counts → one
    * deterministic double dag, rounded at 6.
    */
  def cohenKappa(df: DataFrame, rater1: String, rater2: String): DataFrame = {
    val cells = df.filter(col(rater1).isNotNull && col(rater2).isNotNull)
      .groupBy(col(rater1).cast("string").as("_ck_a"),
        col(rater2).cast("string").as("_ck_b"))
      .agg(count(lit(1)).as("_ck_n"))
      .pinned()
    val ma = cells.groupBy(col("_ck_a").as("_ck_a2"))
      .agg(sum("_ck_n").as("_ck_na"))
    val mb = cells.groupBy(col("_ck_b").as("_ck_b2"))
      .agg(sum("_ck_n").as("_ck_nb"))
    val tot = cells.agg(sum("_ck_n").as("_ck_t"))
    // p_e = Σ_c (na_c/n)(nb_c/n) needs the per-CATEGORY marginal
    // product — join the two marginal frames on the category value
    // (categories seen by only one rater contribute 0, i.e. inner join)
    val pe = ma.join(mb, col("_ck_a2") === col("_ck_b2"))
      .crossJoin(broadcast(tot))
      .agg(sum((col("_ck_na").cast("double") / col("_ck_t").cast("double")) *
        (col("_ck_nb").cast("double") / col("_ck_t").cast("double")))
        .as("_ck_pe"))
    val po = cells.crossJoin(broadcast(tot))
      .agg((coalesce(sum(when(col("_ck_a") === col("_ck_b"), col("_ck_n"))),
        lit(0L)).cast("double") / max(col("_ck_t")).cast("double"))
        .as("_ck_po"),
        max(col("_ck_t")).as("n"))
    po.crossJoin(broadcast(pe))
      .select(
        // p_e = 1 (all mass in one agreeing cell) makes kappa 0/0 —
        // emit null rather than tripping ANSI divide-by-zero
        round(when(col("_ck_pe") < 1.0,
          (col("_ck_po") - col("_ck_pe")) /
            (lit(1.0) - col("_ck_pe"))), 6).as("kappa"),
        round(col("_ck_po"), 6).as("p_observed"),
        round(col("_ck_pe"), 6).as("p_expected"),
        col("n"))
  }

  /** Per-key Spearman rank correlation (tie-corrected): Pearson
    * correlation of the two columns' average ranks within each key
    * group — the robust, monotonic-association twin of [[correlations]]
    * (which the reference stops at; core/statistics_engine.py). Ranks
    * come from per-(key, value) count frames: DOUBLED average ranks
    * `2·cumBefore + n + 1` stay integral (no .5 halves to disagree
    * about), and scaling ranks by a constant leaves the correlation
    * unchanged. Listwise: rows with a null in either column are
    * dropped before ranking.
    *
    * Scale shape: two column-pruned map-side-combined count passes (one
    * per column), rank-map windows partitioned BY KEY (never a
    * single-partition exchange), rank maps joined back broadcast, one
    * `corr` aggregate per key. Bounded-distinct contract as usual:
    * quantize raw continuous columns first.
    */
  def spearmanByKey(df: DataFrame, keys: Seq[String], xCol: String,
                    yCol: String): DataFrame = {
    require(keys.nonEmpty, "spearmanByKey needs at least one key column" +
      " (add a constant column for a global coefficient)")
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((keys.map(col) :+
        col(xCol).cast("double").as("_sp_x")) :+
        col(yCol).cast("double").as("_sp_y"): _*)
      .pinned()
    def rankMap(c: String, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*).orderBy(col(c).asc)
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      base.groupBy((keys.map(col) :+ col(c)): _*)
        .agg(count(lit(1)).as("_n"))
        .withColumn(out,
          coalesce(sum(col("_n")).over(w), lit(0L)) * 2 + col("_n") + 1)
        .drop("_n")
    }
    base
      .join(broadcast(rankMap("_sp_x", "_r2x")), keys :+ "_sp_x")
      .join(broadcast(rankMap("_sp_y", "_r2y")), keys :+ "_sp_y")
      .groupBy(keys.map(col): _*)
      .agg(round(corr(col("_r2x").cast("double"),
          col("_r2y").cast("double")), 6).as("spearman"),
        count(lit(1)).as("n"))
  }

  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("_mi_x"), col(yCol).as("_mi_y"))
      .agg(count(lit(1)).as("_mi_nxy"))
      .pinned()
    val mx = joint.groupBy(col("_mi_x").as("_mi_x2"))
      .agg(sum("_mi_nxy").as("_mi_nx"))
    val my = joint.groupBy(col("_mi_y").as("_mi_y2"))
      .agg(sum("_mi_nxy").as("_mi_ny"))
    val n = joint.agg(sum("_mi_nxy").as("_mi_n"))
    joint
      .join(broadcast(mx), col("_mi_x") === col("_mi_x2"))
      .join(broadcast(my), col("_mi_y") === col("_mi_y2"))
      .crossJoin(broadcast(n))
      .agg(
        // doubles from the start: nxy·n would overflow a long on a
        // 100 TB-scale N, and the double dag must match the oracle's
        round(sum((col("_mi_nxy").cast("double") / col("_mi_n").cast("double")) *
          log((col("_mi_nxy").cast("double") * col("_mi_n").cast("double")) /
            (col("_mi_nx").cast("double") * col("_mi_ny").cast("double")))),
          6).as("mi_nats"),
        count(lit(1)).as("n_cells"),
        max(col("_mi_n")).cast("long").as("n_rows"))
  }

  /** Split-conformal prediction threshold (Vovk's conformal framework;
    * the split/inductive form popularized by Papadopoulos 2002 and Lei
    * 2018 — public method): per key, the `r`-th smallest calibration
    * nonconformity score with `r = ⌈(n+1)·(1−α)⌉`, the finite-sample
    * quantile that guarantees `P(score ≤ threshold) ≥ 1−α` on
    * exchangeable data — the +1 and the ceiling ARE the guarantee, a
    * plain empirical quantile under-covers. Keys whose calibration set
    * is too small for the target (`r > n`, i.e. `n < den/num − 1` at
    * `α = num/den`) emit a NULL threshold (the honest "no finite score
    * suffices"), not a clamped max. α is a rational `num/den` so the
    * position is exact integer algebra, never float.
    *
    * Scale shape: the [[Splits.lowerQuantileFromCounts]] design — one
    * map-side-combined scan to a |keys × distinct scores| count frame,
    * keyed window cumsum over that frame, and the rank test as a
    * multiply-compare (`cum·den ≥ (n+1)·(den−num)` ⟺ `cum ≥ r`) so no
    * division ever runs. Same bounded-distinct contract as winsorize:
    * calibration scores are rounded/bucketed by contract (round a raw
    * continuous score first, or the count frame degenerates to
    * data-sized).
    */
  /** Krippendorff's alpha, nominal scale (Krippendorff 1970/2004 —
    * public method): chance-corrected agreement over ANY number of
    * raters with missing ratings — the generalization [[cohenKappa]]
    * (exactly two raters, complete data) can't reach; the labeled-data
    * QA metric for real annotation projects where units get 2..R
    * labels. Input is the LONG form — one row per rating (unit, value);
    * rater identity drops out of the nominal coincidence algebra.
    * Units with fewer than two ratings carry no agreement information
    * and are excluded, per the method.
    *
    * `α = 1 − D_o/D_e` over the coincidence matrix, computed WITHOUT
    * materializing it: the observed disagreement folds per (unit,
    * value) row as `c·(m_u−c)/(m_u−1)` (summing that over a unit's
    * values IS `(m_u² − Σc²)/(m_u−1)`, the unit's off-diagonal
    * coincidence mass), and the expected disagreement needs only the
    * per-value marginals `n_v = Σ_u c` — so the whole computation is
    * one map-side-combined groupBy to the |units × values-per-unit|
    * count frame, a KEYED window for m_u, a ≤|values| marginal frame,
    * and scalar folds. Exact integer algebra until the two final
    * divisions; α rounds to 6 (per-unit D_o addends sum in engine
    * order — the family slack).
    */
  def krippendorffAlpha(df: DataFrame, unitCol: String,
                        valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uv = df.filter(col(valueCol).isNotNull)
      .groupBy(col(unitCol).as("_u"), col(valueCol).cast("string").as("_v"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("_u"))
    val q = uv
      .withColumn("_m", sum(col("_c")).over(w))
      .withColumn("_rn", row_number().over(w.orderBy(col("_v").asc)))
      .filter(col("_m") >= 2)
    val obs = q.agg(
      coalesce(sum(when(col("_rn") === 1, 1L)), lit(0L)).as("n_units"),
      coalesce(sum(col("_c")), lit(0L)).as("n_ratings"),
      coalesce(sum((col("_c") * (col("_m") - col("_c"))).cast("double") /
        (col("_m") - 1).cast("double")), lit(0.0)).as("_do"))
    // Σ n_v² accumulates in DECIMAL(38,0): per-value marginal counts
    // grow with the data, and a 10¹⁰-rating hot value squares past 2⁶³
    // (the burstiness/hhi hardening class, r12 ADVICE)
    val marg = q.groupBy(col("_v")).agg(sum(col("_c")).as("_nv"))
      .agg(coalesce(sum(col("_nv").cast("decimal(38,0)") * col("_nv")),
        lit(0L).cast("decimal(38,0)")).as("_sq"))
    // degenerate contracts, q141's convention (explicit null, never a
    // float-infinity that rounds differently across engines): no
    // qualifying units → everything null-ish; a single observed value
    // (D_e = 0: agreement is vacuous) → null alpha
    // n_ratings² likewise exceeds 2⁶³ past ~3·10⁹ total ratings — form
    // it in DECIMAL(38,0); the subtraction stays exact, then one cast
    val deNum = (col("n_ratings").cast("decimal(38,0)") * col("n_ratings")
      - col("_sq")).cast("double")
    val de = deNum / (col("n_ratings") - 1).cast("double")
    obs.crossJoin(broadcast(marg))
      .select(col("n_units"), col("n_ratings"),
        round(col("_do"), 6).as("d_o"),
        when(col("n_units") > 0, round(de, 6)).as("d_e"),
        when(col("n_units") > 0 && deNum > 0,
          round(lit(1.0) - col("_do") / de, 6)).as("alpha"))
  }

  def conformalThreshold(df: DataFrame, keys: Seq[String], scoreCol: Column,
                         alphaNum: Int, alphaDen: Int): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must satisfy 0 < num/den < 1, got $alphaNum/$alphaDen")
    val keep = alphaDen.toLong - alphaNum.toLong // den·(1−α)
    val counts = df.filter(scoreCol.isNotNull)
      .groupBy((keys.map(col) :+ scoreCol.cast("double").as("_v")): _*)
      .agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("_v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val hit = counts
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(tw))
      .filter(col("_cum") * alphaDen >= (col("_n") + 1) * keep)
      .groupBy(keys.map(col): _*)
      .agg(min(col("_v")).as("threshold"), max(col("_n")).as("n_cal"))
    // keys with r > n produced no passing row — re-attach with a NULL
    // threshold from the (tiny) per-key count frame
    val allKeys = counts.groupBy(keys.map(col): _*)
      .agg(sum(col("_c")).as("n_cal"))
    allKeys.join(broadcast(hit.select((keys.map(col) :+
        col("threshold")): _*)), keys, "left")
      .select((keys.map(col) :+ col("n_cal") :+ col("threshold")): _*)
  }

  /** Mutual information I(X; Y) between each categorical feature and a
    * label, in nats — the model-free feature-relevance ranking
    * (I = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))). NULL categories are real
    * cells (the chi-square dof lesson). One corpus scan: the features
    * are stacked row-locally (explode of an inline struct array), then
    * everything downstream is count-frame algebra — joint counts per
    * (feature, x, y), marginals re-aggregated FROM the joint frame
    * (never a second corpus pass), broadcast-joined back. Shuffle
    * carries Σ|x_f|·|y| rows at any corpus size.
    */
  def mutualInformation(df: DataFrame, features: Seq[(String, Column)],
                        labelCol: Column): DataFrame = {
    require(features.nonEmpty, "mutualInformation needs ≥1 feature")
    // nulls become a sentinel category BEFORE grouping — the joins on
    // (_f, _x)/(_f, _y) below are equi-joins, and SQL null-equality
    // would silently drop the null cell (the chi-square dof lesson);
    // a U+0001 control char cannot collide with real categories
    val stacked = df.select(
      explode(array(features.map { case (n, c) =>
        struct(lit(n).as("f"),
          coalesce(c.cast("string"), lit("\u0001")).as("x"))
      }: _*)).as("_fx"),
      coalesce(labelCol.cast("string"), lit("\u0001")).as("_y"))
      .select(col("_fx.f").as("_f"), col("_fx.x").as("_x"), col("_y"))
    val joint = stacked.groupBy(col("_f"), col("_x"), col("_y"))
      .agg(count(lit(1)).as("_c"))
    val px = joint.groupBy(col("_f"), col("_x")).agg(sum("_c").as("_cx"))
    val py = joint.groupBy(col("_f"), col("_y")).agg(sum("_c").as("_cy"))
    val n = joint.groupBy(col("_f")).agg(sum("_c").as("_n"))
    // I = Σ (c/n)·ln(c·n/(cx·cy)) — integer products inside the log, so
    // both engines evaluate identical doubles per term
    val terms = joint
      .join(broadcast(px), Seq("_f", "_x"))
      .join(broadcast(py), Seq("_f", "_y"))
      .join(broadcast(n), Seq("_f"))
      .select(col("_f"), col("_n"),
        (col("_c").cast("double") / col("_n").cast("double") *
          log((col("_c") * col("_n")).cast("double") /
            (col("_cx") * col("_cy")).cast("double"))).as("_t"))
    terms.groupBy(col("_f").as("feature"))
      .agg(max(col("_n")).as("n"), round(sum(col("_t")), 6).as("mi"))
  }

  /** Isotonic regression (monotone-nondecreasing calibration) of a
    * binary/numeric label against a bounded-domain score, per key —
    * the score→probability calibrator serving pipelines pair with
    * [[aucByKey]]'s ranking metric. Computed EXACTLY and fully
    * distributed via the minimax characterization of the PAVA fit:
    *
    *   g(i) = max_{j ≤ i} min_{k ≥ i} mean(y over positions j..k)
    *
    * on the per-key (score → Σy, count) frame: prefix sums give every
    * interval mean A(j,k) from one self-join of the count frame
    * (|distinct|²/2 pairs per key — `maxDistinct`-guarded, the q110
    * convention), a per-(key, j) suffix-min window gives
    * m(j,i) = min_{k≥i} A(j,k), and a groupBy max over j ≤ i finishes.
    * No driver-side PAVA loop, no SinglePartition: every window
    * partitions by (key, j). All interval means are exact-integer
    * ratios, so an oracle replays them bit-identically.
    */
  def isotonicFit(df: DataFrame, keys: Seq[String], scoreCol: Column,
                  labelCol: Column, maxDistinct: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = keys.map(col)
    val cf = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .groupBy((k :+ scoreCol.cast("double").as("_x")): _*)
      .agg(sum(labelCol.cast("double")).as("_sy"),
        count(lit(1)).as("_c"))
    // bounded-domain guard: one tiny per-key distinct count
    val worst = cf.groupBy(k: _*).agg(count(lit(1)).as("_d"))
      .agg(max(col("_d"))).collect().head
    require(worst.isNullAt(0) || worst.getLong(0) <= maxDistinct,
      s"isotonicFit score has more than $maxDistinct distinct values per" +
        " key — bucket/round the score first (the fit is quadratic in" +
        " the distinct-score table) or raise maxDistinct")
    val w = Window.partitionBy(k: _*).orderBy(col("_x").asc)
    val pos = cf
      .withColumn("_i", row_number().over(w))
      .withColumn("_S", sum(col("_sy")).over(w))
      .withColumn("_N", sum(col("_c")).over(w))
    val j = pos.select((k :+ col("_i").as("_ji") :+ col("_x").as("_jx") :+
      (col("_S") - col("_sy")).as("_Sjm1") :+
      (col("_N") - col("_c")).as("_Njm1")): _*)
    val ke = pos.select((k :+ col("_i").as("_ki") :+
      col("_S").as("_Sk") :+ col("_N").as("_Nk")): _*)
    // interval means A(j,k) for j ≤ k from the prefix sums
    val pairs = j.join(ke, keys).filter(col("_ji") <= col("_ki"))
      .withColumn("_A", (col("_Sk") - col("_Sjm1")) /
        (col("_Nk") - col("_Njm1")).cast("double"))
    // m(j,i) = min over k ≥ i of A(j,k): suffix min within (key, j)
    val wj = Window.partitionBy((k :+ col("_ji")): _*)
      .orderBy(col("_ki").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fitted = pairs.withColumn("_m", min(col("_A")).over(wj))
      .groupBy((k :+ col("_ki").as("_i")): _*)
      .agg(max(col("_m")).as("_g"))
    pos.join(fitted, keys :+ "_i")
      .select((k :+ col("_x").as("score") :+ col("_c").as("n") :+
        round(col("_g"), 6).as("fitted")): _*)
  }

  /** Gini concentration coefficient per key over an INTEGER value
    * column — "how concentrated is spend / activity / token mass
    * across members", the inequality summary next to the entropy
    * family. Uses the rank form on ascending order,
    * G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) — every term an exact
    * integer until the single final division, so an external SQL
    * oracle replays it bit-identically. Rank order among TIED values
    * doesn't change Σ i·x (equal x share the same coefficient set), so
    * no tie-break is needed.
    *
    * Scale shape: ONE keyed window (parallel across keys) + one
    * map-side-combined groupBy; nothing driver-side. Keys with
    * Σx = 0 emit NULL (concentration of nothing is undefined).
    * Σ i·x accumulates in DECIMAL(38,0) and the final G forms in
    * doubles: n·Σx ≈ n²·mean(x) crosses 2⁶³ already at a billion-row
    * key with single-digit values — realistic corpus scale, the same
    * hardening class as burstiness/hhi (r12 ADVICE; the previous
    * long-form bound was optimistic).
    */
  def giniConcentration(df: DataFrame, keys: Seq[String],
                        valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = keys.map(col)
    val w = Window.partitionBy(k: _*).orderBy(col("_x").asc)
    df.select((k :+ valueCol.cast("long").as("_x")): _*)
      .filter(col("_x").isNotNull)
      .withColumn("_i", row_number().over(w).cast("long"))
      .groupBy(k: _*)
      .agg(count(lit(1)).as("n"), sum(col("_x")).as("total"),
        sum(col("_i").cast("decimal(38,0)") * col("_x")).as("_ix"))
      .select((k :+ col("n") :+ col("total") :+
        when(col("total") =!= 0L,
          round((lit(2.0) * col("_ix").cast("double")
              - (col("n") + 1L).cast("double") * col("total").cast("double"))
            / (col("n").cast("double") * col("total").cast("double")), 6))
          .as("gini")): _*)
  }

  /** Poisson-bootstrap confidence interval for the per-key mean — THE
    * cluster-scale bootstrap (resampling-by-index is impossible when
    * the data doesn't fit anywhere; per-row independent Poisson(1)
    * weights need one scan). Every replicate weight is DETERMINISTIC:
    * w(row, b) inverts the Poisson(1) CDF at
    * u = charPolyHash(id#b#seed) mod 10⁶, evaluated as INTEGER
    * threshold comparisons against floor(CDF·10⁶) — no RNG, no float
    * at the weight boundary, so an external SQL oracle replays every
    * weight. (mod 10⁶, not /2⁵²: the char polynomial of a SHORT string
    * never reaches the top of the 52-bit range, but its low decimal
    * residues mix immediately. The CDF is truncated at w = 5;
    * P(W ≥ 6) < 6·10⁻⁴ — the same deterministic truncation on both
    * engines, so parity is exact even though the tail is clipped.)
    *
    * Scale shape: one `replicates`-way row-local explode collapses
    * map-side to |keys × replicates| (Σw, Σw·x) integer sums; the CI
    * is a tiny per-key sort of B replicate means (row_number over
    * |keys|·B rows). Replicate means with Σw = 0 (possible only for
    * near-empty keys) drop out of the order statistics explicitly.
    *
    * Output per key: n, mean (full sample), ci_lo, ci_hi — the
    * loIndex-th and hiIndex-th smallest replicate means (1-based), so
    * the caller picks the coverage (e.g. 3/98 of B = 100 ≈ 95%).
    */
  def bootstrapMeanCI(df: DataFrame, keys: Seq[String], idCol: Column,
                      valueCol: Column, replicates: Int = 100,
                      seed: Long = 42L, loIndex: Int = 3,
                      hiIndex: Int = 98): DataFrame = {
    require(replicates >= 4, "need at least 4 replicates")
    require(loIndex >= 1 && hiIndex <= replicates && loIndex < hiIndex,
      "CI indices must satisfy 1 ≤ lo < hi ≤ replicates")
    import org.apache.spark.sql.expressions.Window
    val k = keys.map(col)
    // Poisson(1) CDF at 0..4, scaled to the mod-10^6 residue domain
    val cdf = {
      val e = math.exp(-1.0)
      val pmf = Seq(e, e, e / 2, e / 6, e / 24)
      pmf.scanLeft(0.0)(_ + _).tail
        .map(c => math.floor(c * 1000000.0).toLong)
    }
    val base = df.select((k :+ idCol.cast("string").as("_id") :+
        valueCol.cast("long").as("_x")): _*)
      .filter(col("_x").isNotNull && col("_id").isNotNull)
    val rep = base.select((k :+ col("_id") :+ col("_x") :+
      explode(sequence(lit(0), lit(replicates - 1))).as("_b")): _*)
    val u = pmod(graft.functions.TextHash.charPolyHash(
      concat(col("_id"), lit("#"), col("_b").cast("string"),
        lit("#" + seed))), lit(1000000L))
    val w = when(u < cdf(0), 0L).when(u < cdf(1), 1L)
      .when(u < cdf(2), 2L).when(u < cdf(3), 3L)
      .when(u < cdf(4), 4L).otherwise(5L)
    val sums = rep.withColumn("_w", w)
      .groupBy((k :+ col("_b")): _*)
      .agg(sum(col("_w")).as("_n"), sum(col("_w") * col("_x")).as("_s"))
      .filter(col("_n") > 0L)
      .withColumn("_m", col("_s") / col("_n").cast("double"))
    val ord = Window.partitionBy(k: _*).orderBy(col("_m").asc, col("_b").asc)
    val ranked = sums.withColumn("_r", row_number().over(ord))
    val ci = ranked.groupBy(k: _*).agg(
      min(when(col("_r") === loIndex, col("_m"))).as("_lo"),
      min(when(col("_r") === hiIndex, col("_m"))).as("_hi"))
    val full = base.groupBy(k: _*)
      .agg(count(lit(1)).as("n"), sum(col("_x")).as("_t"))
    full.join(ci, keys)
      .select((k :+ col("n") :+
        round(col("_t") / col("n").cast("double"), 6).as("mean") :+
        round(col("_lo"), 6).as("ci_lo") :+
        round(col("_hi"), 6).as("ci_hi")): _*)
  }

  /** k-anonymity audit over quasi-identifier columns — the privacy
    * screen next to the PII battery: how many rows sit in a
    * quasi-identifier group smaller than k (re-identifiable by the
    * combination). One map-side-combined groupBy to group sizes, then
    * a |distinct sizes| histogram — all exact integers plus one share
    * division.
    *
    * Output per observed group size: n_groups, n_rows, below_k, and
    * the key-less summary columns (total rows, share of rows below k)
    * repeated per row for a single-frame report.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_gs"))
    val hist = sizes.groupBy(col("_gs").as("group_size"))
      .agg(count(lit(1)).as("n_groups"))
      .withColumn("n_rows", col("group_size") * col("n_groups"))
      .withColumn("below_k", col("group_size") < k)
    val tot = hist.agg(sum(col("n_rows")).as("_tot"),
      sum(when(col("below_k"), col("n_rows")).otherwise(0L)).as("_bad"))
    hist.crossJoin(broadcast(tot))
      .select(col("group_size"), col("n_groups"), col("n_rows"),
        col("below_k"), col("_tot").as("total_rows"),
        round(col("_bad") / col("_tot").cast("double"), 6)
          .as("share_below_k"))
  }

  /** Benford first-digit deviation per key — the fabricated-numbers /
    * broken-ETL screen: natural multi-scale positive quantities put
    * first significant digit d at P(d) = log₁₀(1 + 1/d); a column that
    * disagrees hard was truncated, defaulted, or synthesized. The
    * digit is taken from the INTEGER value's decimal string (no float
    * log10 at the digit boundary), counts are exact integers, and each
    * χ² contribution is one fixed double dag from (count, n, digit) —
    * oracle-replayable.
    *
    * Output per (keys, digit 1..9): n_obs, p_obs, p_exp, chi2_term.
    * Digits with zero observations still emit rows (their χ² term is
    * n·p_exp), so Σ chi2_term per key is the complete statistic.
    * Non-positive values are excluded (Benford is defined on positive
    * magnitudes).
    */
  def benfordDeviation(df: DataFrame, keys: Seq[String],
                       valueCol: Column): DataFrame = {
    val k = keys.map(col)
    val counts = df.select((k :+ valueCol.cast("long").as("_v")): _*)
      .filter(col("_v") > 0L)
      .select((k :+ substring(col("_v").cast("string"), 1, 1)
        .cast("int").as("digit")): _*)
      .groupBy((k :+ col("digit")): _*)
      .agg(count(lit(1)).as("_c"))
    val totals = counts.groupBy(k: _*).agg(sum(col("_c")).as("_n"))
    // dense 1..9 grid per key (|keys| × 9 rows — tiny) so missing
    // digits still contribute their expected mass to the statistic
    val grid = totals.select((k :+ col("_n") :+
      explode(sequence(lit(1), lit(9))).as("digit")): _*)
    val pExp = log10(lit(1.0) + lit(1.0) / col("digit"))
    val e = col("_n") * pExp
    val dev = coalesce(col("_c"), lit(0L)) - e
    grid.join(counts, keys :+ "digit", "left")
      .select((k :+ col("digit") :+
        coalesce(col("_c"), lit(0L)).as("n_obs") :+
        round(coalesce(col("_c"), lit(0L)) / col("_n").cast("double"), 6)
          .as("p_obs") :+
        round(pExp, 6).as("p_exp") :+
        round(dev * dev / e, 6).as("chi2_term")): _*)
  }

  /** CUPED variance-reduced experiment readout (Deng et al. 2013):
    * adjust each arm's metric mean by θ·(covariate mean shift), with
    * θ = cov(x, y)/var(x) POOLED across arms — the standard
    * pre-experiment-covariate variance reduction.
    *
    * Exactness: metric and covariate are taken as LONGs; the five
    * pooled sums (n, Σx, Σy, Σxx, Σxy) and the per-arm sums are exact
    * integers, with the quadratic sums and the n·Σ products carried in
    * DECIMAL(38,0) (10³⁸ headroom vs long's 9.2·10¹⁸ — mirrors the
    * oracle's int128); θ and every adjusted mean are then a fixed dag
    * of IEEE-double ops an external SQL oracle replays bit-identically
    * — there is NO per-row float accumulation anywhere.
    *
    * Scale shape: two map-side-combined aggregations over one scan
    * shape (global sums + per-arm sums), a broadcast of five numbers.
    * Output per arm: n, mean_metric, mean_adjusted, theta.
    */
  def cupedAdjust(df: DataFrame, armCol: Column, metricCol: Column,
                  covariateCol: Column): DataFrame = {
    val base = df.select(armCol.as("arm"),
        metricCol.cast("long").as("_y"), covariateCol.cast("long").as("_x"))
      .filter(col("_x").isNotNull && col("_y").isNotNull)
    // Σxx/Σxy (and their n·Σ products below) accumulate in
    // DECIMAL(38,0), not LONG: per-row x², x·y products of large
    // covariates would silently wrap past 9.2·10¹⁸; decimal buys
    // 10³⁸ headroom and matches the oracle's int128 arithmetic before
    // the one double division
    val xd = col("_x").cast("decimal(38,0)")
    val pooled = base.agg(count(lit(1)).as("_n"), sum(col("_x")).as("_sx"),
      sum(col("_y")).as("_sy"), sum(xd * col("_x")).as("_sxx"),
      sum(xd * col("_y")).as("_sxy"))
    val arms = base.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("_x")).as("_ax"),
        sum(col("_y")).as("_ay"))
    // θ = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²): exact-integer numerator and
    // denominator, ONE double division (guard: zero covariate variance)
    val sxd = col("_sx").cast("decimal(38,0)")
    arms.crossJoin(broadcast(pooled))
      .withColumn("_theta",
        when(col("_n") * col("_sxx") - sxd * col("_sx") =!= lit(0),
          (col("_n") * col("_sxy") - sxd * col("_sy"))
            .cast("double") /
            (col("_n") * col("_sxx") - sxd * col("_sx"))
              .cast("double")))
      .select(col("arm"), col("n"),
        round(col("_ay") / col("n").cast("double"), 6).as("mean_metric"),
        round(col("_ay") / col("n").cast("double") -
          col("_theta") * (col("_ax") / col("n").cast("double") -
            col("_sx") / col("_n").cast("double")), 6).as("mean_adjusted"),
        round(col("_theta"), 6).as("theta"))
  }

  /** Herfindahl–Hirschman concentration per group: HHI = Σᵢ shareᵢ²
    * over the members' row shares — 1/n_members for a perfectly even
    * group, → 1 when one member dominates. The concentration screen
    * next to [[giniConcentration]]: HHI is the one that decomposes
    * (Σn²/N² folds from mergeable per-member counts with no sort or
    * rank), so it is the metric a monitoring job can keep incrementally
    * — "is this event type driven by three whales", "is this language
    * slice one crawl domain in a trenchcoat".
    *
    * Exactness: Σn² is carried in DECIMAL(38,0) (member counts can
    * reach 10⁹⁺ at corpus scale; long would wrap at Σn² > 9.2·10¹⁸),
    * then ONE double division — the oracle replays it in int128.
    *
    * Scale shape: two map-side-combined groupBys — |groups × members|
    * then |groups|. Nothing sorts, nothing ranks.
    */
  def hhiConcentration(df: DataFrame, groupCols: Seq[String],
                       memberCol: Column): DataFrame = {
    val gn = groupCols.map(col)
    val perMember = df.select((gn :+ memberCol.as("_m")): _*)
      .filter(col("_m").isNotNull)
      .groupBy((gn :+ col("_m")): _*)
      .agg(count(lit(1)).as("_c"))
    perMember.groupBy(gn: _*)
      .agg(count(lit(1)).as("n_members"),
        sum(col("_c")).as("n_rows"),
        sum(col("_c").cast("decimal(38,0)") * col("_c")).as("_sq"))
      .select((gn :+ col("n_members") :+ col("n_rows") :+
        round(col("_sq").cast("double") /
          (col("n_rows").cast("double") * col("n_rows").cast("double")),
          6).as("hhi")): _*)
  }

  /** Inverse-propensity-weighted outcome means over BINNED propensity
    * strata — the observational-data companion to [[cupedAdjust]]
    * (CUPED de-noises a randomized experiment; IPW de-biases a
    * non-randomized comparison where treatment probability varies by
    * stratum). With the propensity estimated exactly per stratum
    * (p̂_s = n_{s,treated}/n_s), Hájek-normalized IPW reduces
    * algebraically to post-stratification:
    * μ̂_arm = Σ_s n_s · ȳ_{s,arm} / Σ_s n_s — so the whole estimator is
    * per-(stratum, arm) integer sums and one fixed double dag, no
    * per-row float weights anywhere.
    *
    * Strata are restricted to COMMON SUPPORT (both arms present) — the
    * estimator is undefined where an arm has zero propensity, and
    * silently extrapolating there is how observational analyses go
    * wrong; both the naive and adjusted means below are computed over
    * the same common-support population so the gap is attributable to
    * reweighting alone.
    *
    * `metricCol` must be integer-valued (cast to LONG — scale prices to
    * cents first), keeping every accumulated sum exact.
    *
    * Scale shape: one map-side-combined groupBy to |strata| rows, a
    * broadcast of the stratum frame — identical to CUPED's footprint.
    */
  def ipwAdjust(df: DataFrame, treatedCol: Column, metricCol: Column,
                strataCols: Seq[Column]): DataFrame = {
    val sc = strataCols.zipWithIndex.map { case (c, i) => c.as(s"_s$i") }
    val sn = sc.indices.map(i => col(s"_s$i"))
    val base = df.select(sc :+ treatedCol.cast("boolean").as("_t") :+
        metricCol.cast("long").as("_y"): _*)
      .filter(col("_t").isNotNull && col("_y").isNotNull)
    val strata = base.groupBy(sn: _*)
      .agg(sum(when(col("_t"), 1L).otherwise(0L)).as("_nt"),
        sum(when(!col("_t"), 1L).otherwise(0L)).as("_nc"),
        sum(when(col("_t"), col("_y")).otherwise(0L)).as("_yt"),
        sum(when(!col("_t"), col("_y")).otherwise(0L)).as("_yc"))
      .filter(col("_nt") > 0L && col("_nc") > 0L)
    val arms = strata.select(
        lit(true).as("treated"), (col("_nt") + col("_nc")).as("_ns"),
        col("_nt").as("_na"), col("_yt").as("_ya"))
      .unionByName(strata.select(
        lit(false).as("treated"), (col("_nt") + col("_nc")).as("_ns"),
        col("_nc").as("_na"), col("_yc").as("_ya")))
    arms.groupBy(col("treated"))
      .agg(sum(col("_na")).as("n"),
        round(sum(col("_ya")).cast("double") /
          sum(col("_na")).cast("double"), 6).as("naive_mean"),
        round(sum(col("_ns").cast("double") *
          (col("_ya").cast("double") / col("_na").cast("double"))) /
          sum(col("_ns")).cast("double"), 6).as("ipw_mean"))
  }
}
