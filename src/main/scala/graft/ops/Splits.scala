package graft.ops

import graft.functions.TimeFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-dataset splits (reference §2.8):
  * random weighted splits (engine/spark.py:752-756) and time-series splits
  * with `[start, end)` event-time bounds (engine/spark.py:723-863).
  */
object Splits {

  /** Random split by weights + seed (train/test[/validation]).
    * Weights are normalized; Spark's randomSplit keeps the operation fully
    * distributed (per-row Bernoulli against running weight boundaries).
    */
  def random(df: DataFrame, weights: Map[String, Double],
             seed: Long = 42L): Map[String, DataFrame] = {
    require(weights.nonEmpty, "at least one split weight")
    val names = weights.keys.toSeq.sorted
    val ws = names.map(weights)
    names.zip(df.randomSplit(ws.toArray, seed)).toMap
  }

  /** Exact-proportion random split (the reference python engine's variant,
    * engine/python.py:980-1017: shuffled index assignment so split sizes
    * are exact, not Bernoulli-approximate).
    *
    * Distributed form — a global rank with NO single-partition window:
    * seeded random sort key `_r` → bucket `least(floor(_r*P), P-1)` (a pure
    * function of the DATA, so it is identical every time the lineage is
    * recomputed — unlike `repartitionByRange`, whose reservoir-sampled
    * boundaries are re-drawn per job and would silently reshuffle rows
    * between the counts job and each split's own job) → per-bucket
    * row_number + per-bucket offsets (a tiny count-per-bucket collect,
    * broadcast back). Buckets are contiguous `_r` ranges, so
    * rank = offset(bucket) + local rank is a total order by (_r, _mid);
    * contiguous rank ranges then carve the exact split sizes.
    */
  def exactRandom(df: DataFrame, weights: Map[String, Double],
                  seed: Long = 42L): Map[String, DataFrame] = {
    val assigned = exactRandomAssigned(df, weights, seed)
    weights.keys.map { k =>
      k -> assigned.filter(col(SplitCol) === lit(k)).drop(SplitCol)
    }.toMap
  }

  /** Name of the split-label column added by [[exactRandomAssigned]]. */
  val SplitCol = "_split"

  /** One-pass form of [[exactRandom]]: the input rows plus a `_split`
    * label column. All split sizes (or any whole-dataset accounting) come
    * from a SINGLE aggregation over this frame instead of one job per
    * split; `exactRandom`'s per-split frames are filters over it.
    */
  def exactRandomAssigned(df: DataFrame, weights: Map[String, Double],
                          seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty, "at least one split weight")
    require(math.abs(weights.values.sum - 1.0) < 1e-6,
      "exact split ratios must sum to 1")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val buckets = spark.sessionState.conf.numShufflePartitions
    val keyed = df.withColumn("_r", rand(seed))
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_bucket",
        least(floor(col("_r") * buckets), lit(buckets - 1L)).cast("int"))
      .repartition(buckets, col("_bucket"))
    // per-bucket counts: at most numShufflePartitions rows on the driver
    val counts = keyed.groupBy("_bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (bucket, c) =>
      val o = (bucket, acc); acc += c; o
    }.toSeq
    val offDf = offsets.toDF("_bucket", "_off")
    val w = Window.partitionBy(col("_bucket")).orderBy(col("_r"), col("_mid"))
    val indexed = keyed.join(broadcast(offDf), Seq("_bucket"))
      .withColumn("_split_idx", row_number().over(w) + col("_off"))
    val names = weights.keys.toSeq.sorted
    val bounds = names.scanLeft(0L) { (acc, k) =>
      acc + math.round(weights(k) * n)
    }
    // ordered when-chain: first split whose upper bound covers the rank
    // wins; the last split absorbs the rounding remainder (hi = n)
    val label = names.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, (k, i)) =>
        val hi = if (i == names.size - 1) n else bounds(i + 1)
        val branch = (col("_split_idx") <= lit(hi), lit(k))
        Some(acc.fold(when(branch._1, branch._2))(_.when(branch._1, branch._2)))
    }.get
    indexed.withColumn(SplitCol, label)
      .drop("_split_idx", "_r", "_mid", "_bucket", "_off")
  }

  /** Time-series split: per-split `[start, end)` filter on the event-time
    * column, any accepted event-time representation (normalized to epoch
    * millis with native expressions — the reference inlines a python UDF,
    * engine/spark.py:762-852; we stay in codegen).
    * Bounds are epoch millis.
    */
  def timeSeries(df: DataFrame, eventTimeCol: String,
                 bounds: Map[String, (Long, Long)]): Map[String, DataFrame] = {
    val et = eventTimeMillisCol(df, eventTimeCol)
    bounds.map { case (name, (start, end)) =>
      name -> df.filter(et >= lit(start) && et < lit(end))
    }
  }

  /** Event-time column of any accepted type, as epoch millis. */
  def eventTimeMillisCol(df: DataFrame, eventTimeCol: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(eventTimeCol).dataType match {
      case TimestampType => unix_millis(col(eventTimeCol))
      // session tz is UTC, so NTZ → TZ cast preserves the wall-clock instant
      case TimestampNTZType | DateType =>
        unix_millis(col(eventTimeCol).cast(TimestampType))
      case LongType | IntegerType | ShortType | ByteType =>
        // epoch magnitude heuristic (extends the reference's sec/ms rule to
        // micros/nanos): ~1e9 s, ~1e12 ms, ~1e15 µs, ~1e18 ns
        val c = col(eventTimeCol)
        when(c.between(100000000L, 100000000000L), c * 1000L)
          .when(c >= 100000000000000000L, expr(s"$eventTimeCol div 1000000"))
          .when(c >= 100000000000000L, expr(s"$eventTimeCol div 1000"))
          .otherwise(c)
      case StringType => TimeFunctions.eventTimeToMillis(col(eventTimeCol))
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type $other for $eventTimeCol")
    }
  }

  /** Split a materialized dataset into (features X, labels y)
    * (engine/spark.py:615-628 split_labels).
    */
  def splitLabels(df: DataFrame, labels: Seq[String]): (DataFrame, DataFrame) =
    (df.drop(labels: _*), df.select(labels.map(col): _*))

  /** Row-fraction sample (monitoring row_percentage,
    * core/monitoring_window_config_engine.py:319-373).
    */
  def sampleFraction(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    if (fraction >= 1.0) df else df.sample(withReplacement = false, fraction, seed)

  /** Persistable grouped-split spec: the split decision is the salted
    * char-poly hash of the group key — no RNG, reproducible across
    * sessions and engines, so a training-dataset descriptor can store
    * (groupCol, weights, salt) and rebuild the identical assignment.
    */
  final case class GroupSplit(groupCol: String,
                              weights: Seq[(String, Double)],
                              salt: String = "graft-split")

  def grouped(df: DataFrame, spec: GroupSplit): Map[String, DataFrame] =
    groupedDeterministic(df, spec.groupCol, spec.weights,
      hashFn = c => graft.functions.TextHash.charPolyHash(
        concat_ws(":", lit(spec.salt), c.cast("string"),
          reverse(c.cast("string")))))

  /** Column form of [[grouped]]: the split NAME as a column on the input
    * frame instead of one filtered frame per split. Same hash, same
    * thresholds — `labeled.filter(col(splitCol) === name)` equals
    * `grouped(df, spec)(name)` row-for-row. Use this when a downstream
    * operator can process every split in ONE pass (e.g.
    * [[Sharding.tokenBudgetBinsPerSplit]]): the per-frame map form runs
    * that operator's shuffles and driver actions once PER split, the
    * labeled form once total.
    */
  def groupedLabeled(df: DataFrame, spec: GroupSplit,
                     splitCol: String = "split"): DataFrame = {
    require(!df.columns.contains(splitCol),
      s"split column '$splitCol' collides with an input column")
    val weights = spec.weights
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val cums = weights.scanLeft(0.0)(_ + _._2 / total).tail
    val scale = 1000000
    val bounds = cums.init.map(c => math.floor(c * scale).toLong) :+ scale.toLong
    val u = pmod(graft.functions.TextHash.charPolyHash(
      concat_ws(":", lit(spec.salt), col(spec.groupCol).cast("string"),
        reverse(col(spec.groupCol).cast("string")))), lit(scale.toLong))
    val label = weights.map(_._1).zip(bounds.prepended(0L).zip(bounds))
      .foldLeft(lit(null).cast("string")) { case (acc, (name, (lo, hi))) =>
        when(u >= lo && u < hi, lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, label)
  }

  /** Leakage-safe deterministic split: every GROUP (e.g. a near-dup
    * cluster from [[Dedup.duplicateClusters]]) lands in exactly ONE
    * split, so near-identical documents can never straddle train/test —
    * the contamination mode a row-wise random split cannot prevent.
    *
    * The split decision is `hash(group) mod scale` against cumulative
    * weight thresholds: a pure per-row function of the group key — zero
    * shuffle, reproducible across runs/engines/repartitions, and stable
    * under corpus growth (existing groups never migrate when new data
    * arrives, unlike fraction-exact ranking splits).
    *
    * @param weights ordered (name, weight); normalized; threshold order
    *                follows the Seq so results are deterministic
    * @return one filtered DataFrame per split name, partitioning `df`
    */
  def groupedDeterministic(df: DataFrame, groupCol: String,
                           weights: Seq[(String, Double)],
                           hashFn: Column => Column = c => xxhash64(c),
                           scale: Int = 1000000): Map[String, DataFrame] = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val cums = weights.scanLeft(0.0)(_ + _._2 / total).tail
    // floor to integer thresholds; force the last bound to `scale` so
    // rounding never drops rows
    val bounds = cums.init.map(c => math.floor(c * scale).toLong) :+ scale.toLong
    val u = pmod(hashFn(col(groupCol)), lit(scale.toLong))
    weights.map(_._1).zip(bounds.prepended(0L).zip(bounds)).map {
      case (name, (lo, hi)) => name -> df.filter(u >= lo && u < hi)
    }.toMap
  }

  /** Keep the top `fraction` of rows by score WITHIN each group — the
    * corpus-curation gate "best 30% of documents per language". One
    * aggregation pass computes each group's quantile threshold; the tiny
    * per-group threshold table broadcasts back and the keep decision is a
    * row-local comparison — never a global (or per-group) rank/window
    * over the corpus. Rows tied with the threshold are kept.
    *
    * Null handling: rows with a null score never reach any top slice
    * (null >= threshold is never true), and rows with a null GROUP are
    * dropped (no group, no threshold) — both the right default for
    * corpus curation, where null language/score means unscorable.
    *
    * @param exact exact percentiles (oracle-replayable; buffers distinct
    *              values per partition) vs percentile_approx (the 100 TB
    *              default)
    * @param maxBroadcastGroups broadcast the threshold table only when the
    *              group cardinality (one cheap column-pruned
    *              approx_count_distinct probe) stays at or below this —
    *              right for languages/domains; a per-URL group column
    *              would OOM the driver, so above the cap the hint is
    *              dropped and AQE picks the join strategy. Pass
    *              `Int.MaxValue` to skip the probe and always broadcast,
    *              `0` to never broadcast.
    */
  def topFractionByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                         fraction: Double,
                         exact: Boolean = false,
                         maxBroadcastGroups: Int = 100000): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, "fraction must be in (0, 1]")
    if (fraction == 1.0) return df
    val q = 1.0 - fraction
    val score = s"`${scoreCol.replace("`", "``")}`"
    val thrExpr =
      if (exact) expr(s"percentile($score, $q)")
      else percentile_approx(col(scoreCol), lit(q), lit(10000))
    val thrCol = Iterator.from(0).map(i => s"_graft_thr$i")
      .find(n => !df.columns.contains(n)).get
    val thresholds = df.groupBy(col(groupCol))
      .agg(thrExpr.cast("double").as(thrCol))
    val useBroadcast =
      maxBroadcastGroups == Int.MaxValue || (maxBroadcastGroups > 0 &&
        df.select(approx_count_distinct(col(groupCol))).head.getLong(0)
          <= maxBroadcastGroups)
    val right = if (useBroadcast) broadcast(thresholds) else thresholds
    df.join(right, Seq(groupCol))
      .filter(col(scoreCol).cast("double") >= col(thrCol))
      .drop(thrCol)
  }

  /** Exact lower median (the ceil(n/2)-th smallest value) of a BOUNDED-
    * CARDINALITY score column, from per-value counts.
    *
    * Why this exists: an exact global `percentile` aggregate buffers every
    * value on one reducer — the one single-reducer shape left in the
    * round-5 capstone. For a score that is ROUNDED to fixed decimals over
    * a bounded numeric range (e.g. an avg-NLL rounded to 4 places), the
    * DISTINCT-value table is bounded by construction no matter the corpus
    * size, so the median falls out of a map-side-combined groupBy plus a
    * driver-side cumsum over that bounded table — the same
    * bounded-metadata-collect contract as the centroid and stratum
    * fetches. `maxDistinct` enforces the contract loudly: an unrounded
    * score fails instead of OOM-ing the driver.
    *
    * Gate equivalence: filtering `score <= lowerMedian` keeps EXACTLY the
    * rows of `score <= quantile_cont(score, 0.5)` (the interpolating
    * median both Spark's `percentile` and DuckDB's `quantile_cont`
    * compute): with an odd count the two thresholds coincide; with an
    * even count the interpolated midpoint sits strictly below the next
    * distinct value (or ties collapse it), so no row lands between the
    * two gates. An oracle can therefore replay the gate with the
    * interpolating form verbatim.
    */
  def lowerMedian(df: DataFrame, scoreCol: String,
                  maxDistinct: Int = 1000000): Double = {
    val rows = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).cast("double").as("_v"))
      .agg(count(lit(1)).as("_c"))
      .limit(maxDistinct + 1)
      .collect()
    require(rows.nonEmpty, s"lowerMedian($scoreCol) of an empty frame")
    require(rows.length <= maxDistinct,
      s"$scoreCol has more than $maxDistinct distinct values — lowerMedian" +
        " is for rounded/bucketed scores whose value table is bounded;" +
        " round the score or raise maxDistinct")
    val counts = rows.map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    val k = (n + 1) / 2 // ceil(n/2): lower median position
    var cum = 0L
    counts.iterator.map { case (v, c) => cum += c; (v, cum) }
      .collectFirst { case (v, cm) if cm >= k => v }.get
  }

  /** Distributed per-key twin of [[lowerMedian]]: the same exact lower
    * median (smallest v whose cumulative count reaches ceil(n/2)) for
    * every key group in one pass — no driver collect, no per-group
    * buffering. Same contract: the score must be rounded/bucketed so its
    * per-key distinct-value table is bounded; the cumsum window then
    * runs over (key, value, count) rows, never raw data.
    */
  def lowerMedianByKey(df: DataFrame, keys: Seq[String],
                       valueCol: Column): DataFrame =
    lowerMedianFromCounts(
      df.filter(valueCol.isNotNull)
        .groupBy((keys.map(col) :+ valueCol.cast("double").as("_v")): _*)
        .agg(count(lit(1)).as("_c")),
      keys)

  /** [[lowerMedianByKey]] from a per-(keys, `_v`) count frame `_c` — the
    * zero-scan form for stored/derived value tables.
    */
  def lowerMedianFromCounts(counts: DataFrame,
                            keys: Seq[String]): DataFrame =
    lowerQuantileFromCounts(counts, keys, 1, 2)
      .withColumnRenamed("quantile", "median")

  /** Exact per-key lower quantile at the RATIONAL position num/den: the
    * smallest value whose cumulative count reaches ceil(n·num/den) —
    * pure integer arithmetic (`cum·den ≥ num·n`), so there is no
    * interpolation and no float position to disagree with an oracle
    * about. Same bounded-distinct contract as [[lowerMedian]].
    */
  def lowerQuantileFromCounts(counts: DataFrame, keys: Seq[String],
                              num: Int, den: Int): DataFrame = {
    require(den > 0 && num > 0 && num <= den,
      s"quantile position must satisfy 0 < num/den <= 1, got $num/$den")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.partitionBy(keys.map(col): _*)
    counts
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(tw))
      .filter(col("_cum") * den >= col("_n") * num)
      .groupBy(keys.map(col): _*)
      .agg(min(col("_v")).as("quantile"))
  }

  /** Approximate per-key quantile with the SAME output schema as
    * [[lowerQuantileFromCounts]] (`keys..., quantile`) — the escape
    * hatch for UNBOUNDED value domains. The exact path's count frame is
    * |keys × distinct values|-sized, which is the right trade on
    * rounded/bucketed columns (bit-replayable, oracle-provable) but
    * degenerates to data-sized on a raw continuous double at 100 TB;
    * this variant runs `percentile_approx` (mergeable relative-error
    * sketch, one map-side-combined pass, memory bounded by `accuracy`
    * regardless of cardinality) straight over the data. Not
    * bit-replayable — use exact when the domain is bounded.
    */
  def approxQuantileByKey(df: DataFrame, keys: Seq[String],
                          valueCol: Column, num: Int, den: Int,
                          accuracy: Int = 10000): DataFrame = {
    require(den > 0 && num > 0 && num <= den,
      s"quantile position must satisfy 0 < num/den <= 1, got $num/$den")
    df.filter(valueCol.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(percentile_approx(valueCol.cast("double"),
        lit(num.toDouble / den), lit(accuracy)).as("quantile"))
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis-
    * Spirakis A-ES): each row gets priority `u^(1/w)` where `u` is a
    * uniform derived from a salted hash of its id and `w` its weight;
    * the top `k` priorities per key group are the sample. Inclusion
    * probability is weight-proportional (heavier rows draw larger
    * priorities), yet the draw is a pure function of (id, salt) —
    * reproducible across runs, engines, and repartitions, unlike
    * RNG-based sampling. The training-data use: sample a corpus toward
    * quality/token weights for a mixture without materializing
    * replicas.
    *
    * Scale shape: one zero-shuffle priority projection + one per-key
    * top-k window (single shuffle on the keys; for ungrouped sampling
    * pass an empty `keys` and the TakeOrdered path below keeps it off
    * a single-partition window). The priority is QUANTIZED (rounded to
    * `priorityDecimals`) with the id as the deterministic tie-break:
    * `pow` is transcendental, so two engines can disagree in the last
    * ulp — on a 1e-9 grid an ulp wiggle almost never crosses a grid
    * edge, and same-bucket ties resolve identically by id, which is
    * what lets the DuckDB oracle replay the selection exactly.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Int, keys: Seq[String] = Nil,
                     salt: String = "aes",
                     priorityDecimals: Int = 9): DataFrame = {
    require(k > 0, "sample size k must be positive")
    val m = 1L << 52
    val u = (graft.functions.TextHash.charPolyHash(
      concat(col(idCol).cast("string"), lit("|" + salt)))
      .cast("double") + 1.0) / (m.toDouble + 2.0)
    val pri = round(pow(u, lit(1.0) / weightCol.cast("double")),
      priorityDecimals)
    val withPri = df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("_pri", pri)
    if (keys.isEmpty)
      // global top-k: orderBy+limit plans as TakeOrderedAndProject —
      // per-partition heaps + one k-row merge, never a global sort
      withPri.orderBy(col("_pri").desc, col(idCol).asc).limit(k)
        .drop("_pri")
    else {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("_pri").desc, col(idCol).asc)
      withPri.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") <= k).drop("_pri", "_rk")
    }
  }

  /** Deterministic hash-threshold stratified sampling: keep a row of
    * stratum s iff `hash(id) mod scale < floor(fractions(s) * scale)`.
    *
    * Unlike `df.stat.sampleBy` (RNG-driven, order- and partitioning-
    * dependent), the decision is a pure function of the row — reproducible
    * across runs, engines, and corpus repartitions, which is what a
    * training-data pipeline needs for auditable class rebalancing. Pure
    * per-row filter: zero shuffle, pushes through any downstream plan.
    * Strata absent from `fractions` are dropped (fraction 0).
    *
    * @param hashFn id hash — xxhash64 by default; pass a salted
    *               [[graft.functions.TextHash.charPolyHash]] for an
    *               external-SQL-replayable oracle
    */
  def stratifiedDeterministic(df: DataFrame, idCol: String, stratumCol: String,
                              fractions: Map[String, Double],
                              hashFn: Column => Column = c => xxhash64(c),
                              scale: Int = 1000000): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val thresholds = fractions.map { case (k, f) =>
      k -> math.floor(f * scale).toLong
    }
    val thr = coalesce(
      element_at(typedLit(thresholds), col(stratumCol).cast("string")),
      lit(-1L))
    df.filter(pmod(hashFn(col(idCol)), lit(scale.toLong)) < thr)
  }

  /** Rebalance a corpus to a target category mix (domain/language/source
    * weighting for a training run) by deterministic downsampling only —
    * no row is ever duplicated. The output is the LARGEST corpus whose
    * category shares match `targetShares`: feasible size
    * `cap = min_g n_g / w_g`, per-group keep fraction `w_g·cap / n_g`
    * (the binding group keeps everything), applied with the same
    * hash-threshold rule as [[stratifiedDeterministic]] so the decision
    * is a pure, reproducible function of the row. Categories absent from
    * `targetShares` are dropped; a target category with no rows would
    * force an empty output and fails loudly instead.
    *
    * Scale shape: one map-side-combined count per category (collected to
    * the driver — category cardinality, not data, bounded like the
    * centroid fetches elsewhere), then a zero-shuffle per-row filter.
    */
  def resampleToMix(df: DataFrame, idCol: String, stratumCol: String,
                    targetShares: Map[String, Double],
                    hashFn: Column => Column = c => xxhash64(c),
                    scale: Int = 1000000): DataFrame = {
    require(targetShares.nonEmpty && targetShares.values.forall(_ > 0.0),
      "target shares must be positive")
    val counts = df.filter(col(stratumCol).isin(targetShares.keys.toSeq: _*))
      .groupBy(col(stratumCol).cast("string").as("_s"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = targetShares.keySet -- counts.keySet
    require(missing.isEmpty,
      s"target categories with no rows: ${missing.mkString(", ")}")
    val cap = targetShares.map { case (g, w) => counts(g) / w }.min
    // the binding group's w·cap/n is 1.0 up to float error, and that error
    // can land JUST BELOW 1.0 (e.g. w=0.15 → 0.9999999999999998), where
    // floor(f·scale) would silently drop the hash%scale == scale-1 sliver
    // from the group documented as "keeps everything" — snap anything
    // within 1e-9 of 1.0 to exactly 1.0 before thresholding
    val fractions = targetShares.map { case (g, w) =>
      val f = w * cap / counts(g)
      g -> (if (f >= 1.0 - 1e-9) 1.0 else f)
    }
    stratifiedDeterministic(df, idCol, stratumCol, fractions, hashFn, scale)
  }

  /** Purged time-series K-fold cross-validation (the financial-ML split:
    * López de Prado 2018, ch. 7 — public method, not reference code):
    * the time axis is cut into `k` contiguous test folds; for fold f,
    * rows within `embargoMillis` of the fold's bounds are PURGED from
    * its training set, so features computed over trailing windows can
    * never straddle the train/test boundary — the leakage mode plain
    * K-fold has on serially-correlated data.
    *
    * Output: `k` rows per input row (one per fold), each labeled
    * `cv_fold` + `cv_role` ∈ train | test | purged. Fold bounds are
    * INTEGER millisecond arithmetic over the [min, max] span —
    * `lo + ceil(span·f/k)` — so the assignment replays exactly in SQL;
    * the span fetch is the only action (2-value scalar aggregate).
    *
    * Scale shape: the fold explode is ×k on a row-local basis (k is
    * 3-10 in practice), everything else is a projection — no shuffle,
    * no window. Callers filter `cv_role` per fold; a fold's train set
    * is never materialized k times unless asked for.
    */
  def purgedTimeFolds(df: DataFrame, eventTimeCol: String, k: Int,
                      embargoMillis: Long): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    require(embargoMillis >= 0, "embargo must be non-negative")
    val et = eventTimeMillisCol(df, eventTimeCol)
    val r = df.agg(min(et), max(et)).collect().head
    require(!r.isNullAt(0) && !r.isNullAt(1),
      "purgedTimeFolds needs at least one non-null event time")
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val span = hi - lo + 1 // [lo, hi] inclusive → k half-open cells
    def bound(f: Int): Long = lo + (span * f + k - 1) / k // ceil
    val withT = df.withColumn("_cv_t", et)
    val folded = withT.select(col("*"),
      explode(array((0 until k).map(lit): _*)).as("cv_fold"))
    val foldStart = (0 until k).map(bound)
    val foldEnd = (1 to k).map(bound)
    val startCol = element_at(
      array(foldStart.map(lit): _*), col("cv_fold") + 1)
    val endCol = element_at(
      array(foldEnd.map(lit): _*), col("cv_fold") + 1)
    folded.withColumn("cv_role",
        when(col("_cv_t") >= startCol && col("_cv_t") < endCol, "test")
          .when(col("_cv_t") >= startCol - lit(embargoMillis) &&
            col("_cv_t") < endCol + lit(embargoMillis), "purged")
          .otherwise("train"))
      .drop("_cv_t")
  }

  /** Deterministic negative sampling for implicit-feedback training
    * data: for each user, up to `k` items the user did NOT interact
    * with, drawn pseudo-randomly but REPRODUCIBLY (hash thresholds,
    * never `rand()` — the q120 convention, so a re-run and an external
    * oracle produce the identical sample).
    *
    * Mechanics: the item catalog gets a dense deterministic index
    * (row_number by item order); each user draws `oversample·k`
    * candidates — draw j picks the item at index
    * `charPolyHash(user '#' j '#' seed) mod |items|` — interacted pairs
    * are anti-joined away, duplicate candidate items collapse to their
    * smallest draw, and the first `k` survivors by draw order win. A
    * user whose draws all hit interacted items yields fewer than `k`
    * rows (documented; raise `oversample` for dense users).
    *
    * Scale shape: |users|·oversample·k generated rows, one join to the
    * item index — broadcast ONLY while the catalog is at most
    * `broadcastItemLimit` rows (default 10⁷ ≈ a few hundred MB of
    * (item, idx) pairs; the exact count is known from the offset
    * collect), else a shuffle equi-join — one anti-join to
    * interactions, one per-user window — nothing quadratic in catalog
    * or corpus.
    */
  def negativeSample(interactions: DataFrame, userCol: String,
                     itemCol: String, k: Int, seed: Long,
                     oversample: Int = 3,
                     broadcastItemLimit: Long = 10000000L): DataFrame = {
    require(k >= 1 && oversample >= 1, "k and oversample must be ≥ 1")
    // dense 0-based catalog index in item order WITHOUT a global-sort
    // SinglePartition window (the PlanAudit rule): range-partition by
    // item (ordered, non-overlapping ranges in partition-id order),
    // rank within each partition, then add broadcast per-partition
    // offsets — the Sharding two-level prefix sum. The offsets collect
    // is |partitions| rows, bounded.
    val items = interactions.select(col(itemCol).as("_item")).distinct()
      .repartitionByRange(col("_item"))
      .withColumn("_pid", spark_partition_id())
    val wPart = Window.partitionBy(col("_pid")).orderBy(col("_item"))
    val ranked = items.withColumn("_pos",
      row_number().over(wPart).cast("long"))
    val partCounts = ranked.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    require(partCounts.nonEmpty, "negativeSample needs a non-empty catalog")
    val offsets = partCounts.map(_._1)
      .zip(partCounts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val nItems = partCounts.map(_._2).sum
    val offsetCol = element_at(
      map(offsets.toSeq.sortBy(_._1).flatMap { case (p, o) =>
        Seq(lit(p), lit(o)) }: _*), col("_pid"))
    val indexed = ranked
      .withColumn("_idx", offsetCol + col("_pos") - 1L)
      .select(col("_item"), col("_idx"))
    val users = interactions.select(col(userCol).as("_user")).distinct()
    val draws = users.select(col("_user"),
        explode(sequence(lit(0), lit(oversample * k - 1))).as("_j"))
      .withColumn("_pick",
        pmod(graft.functions.TextHash.charPolyHash(
          concat(col("_user").cast("string"), lit("#"),
            col("_j").cast("string"), lit("#"), lit(seed.toString))),
          lit(nItems)))
    // broadcast the catalog only when it genuinely fits an executor
    // (nItems is already exact from the offset collect); a 10⁹-item
    // catalog falls back to a shuffle equi-join instead of OOMing the
    // broadcast build side
    val idxSide =
      if (nItems <= broadcastItemLimit) broadcast(indexed) else indexed
    val candidates = draws
      .join(idxSide, col("_pick") === col("_idx"))
      .select(col("_user"), col("_item"), col("_j"))
    val positives = interactions
      .select(col(userCol).as("_user"), col(itemCol).as("_item"))
      .distinct()
    val negatives = candidates.join(positives, Seq("_user", "_item"),
      "left_anti")
    // duplicate item draws collapse to the smallest j, then first k win
    val firstDraw = negatives.groupBy(col("_user"), col("_item"))
      .agg(min(col("_j")).as("_j"))
    val wUser = Window.partitionBy(col("_user")).orderBy(col("_j").asc)
    firstDraw.withColumn("_rank", row_number().over(wUser))
      .filter(col("_rank") <= k)
      .select(col("_user").as(userCol), col("_item").as(itemCol),
        col("_rank").cast("int").as("draw_rank"))
  }
}
