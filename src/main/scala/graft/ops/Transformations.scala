package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Materialize.PinOps

/** Transformation functions: statistics-parameterized feature transforms
  * (reference §2.11, python/hsfs/hopsworks_udf.py + engine/spark.py:1267-1328
  * + builtin_transformations.py:26-66).
  *
  * The reference runs each transformation as a pandas UDF parameterized by
  * training-split statistics fetched in a prior pass. Here each built-in is
  * **native Column algebra** (whole-stage codegen, no serialization
  * boundary); the two-pass shape is kept: `TransformationStatistics.compute`
  * aggregates the needed stats once, then `apply` binds them as literals in
  * a single wide `select` — exactly the reference's "one wide select"
  * application (engine/spark.py:1318-1326).
  */
object Transformations {

  /** Statistics a transformation may require (reference
    * transformation_statistics.py; computed core/statistics_engine.py:221-250).
    */
  final case class FeatureStatistics(
      min: Double, max: Double, mean: Double, stddev: Double,
      p25: Double, median: Double, p75: Double,
      uniqueValues: Seq[Any])

  object FeatureStatistics {
    /** One aggregation pass for all requested features + one distinct pass
      * per encoder feature (unique values must be exact and sorted,
      * builtin_transformations.py:47-49).
      *
      * Exact percentiles buffer every distinct value per partition — a real
      * cost on high-cardinality columns — so they are computed ONLY for
      * `quantilesFor` columns (defaults to all scaled columns for API
      * compatibility; pass just the robust-scaled ones). Columns without
      * quantiles get p25/median/p75 = NaN.
      *
      * `approxQuantiles = true` swaps the exact `percentile` for
      * `approx_percentile` (a bounded-memory mergeable sketch) — the right
      * default at 100 TB, where buffering every distinct value per
      * partition is not an option; exact remains the default because the
      * oracle-parity gates compare against DuckDB's exact quantiles.
      */
    def compute(df: DataFrame, scaled: Seq[String],
                encoded: Seq[String] = Nil,
                quantilesFor: Seq[String] = null,
                approxQuantiles: Boolean = false,
                approxAccuracy: Int = 10000): Map[String, FeatureStatistics] = {
      val quantileSet =
        Option(quantilesFor).map(_.toSet).getOrElse(scaled.toSet)
      val pctAgg: String => Column =
        if (approxQuantiles)
          c => expr(s"approx_percentile($c, array(0.25, 0.5, 0.75), " +
            s"$approxAccuracy)").cast("array<double>")
        else c => expr(s"percentile($c, array(0.25, 0.5, 0.75))")
      val aggs = scaled.flatMap { c => Seq(
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        avg(col(c)).cast("double").as(s"${c}__mean"),
        stddev_samp(col(c)).cast("double").as(s"${c}__std")) ++
        (if (quantileSet(c)) Seq(pctAgg(c).as(s"${c}__pcts")) else Nil)
      }
      val scaledStats: Map[String, FeatureStatistics] =
        if (scaled.isEmpty) Map.empty
        else {
          val row = df.agg(aggs.head, aggs.tail: _*).collect().head
          scaled.map { c =>
            val pcts =
              if (quantileSet(c))
                row.getAs[scala.collection.Seq[Double]](s"${c}__pcts")
              else scala.collection.Seq(Double.NaN, Double.NaN, Double.NaN)
            c -> FeatureStatistics(
              min = row.getAs[Double](s"${c}__min"),
              max = row.getAs[Double](s"${c}__max"),
              mean = row.getAs[Double](s"${c}__mean"),
              stddev = row.getAs[Double](s"${c}__std"),
              p25 = pcts(0), median = pcts(1), p75 = pcts(2),
              uniqueValues = Nil)
          }.toMap
        }
      val encodedStats = encoded.map { c =>
        c -> FeatureStatistics(0, 0, 0, 0, 0, 0, 0,
          Statistics.uniqueValues(df, c))
      }.toMap
      scaledStats ++ encodedStats
    }
  }

  /** (x - min) / (max - min); builtin_transformations.py:26-32. */
  def minMaxScaler(c: Column, s: FeatureStatistics): Column =
    if (s.max == s.min) lit(0.0) else (c - lit(s.min)) / lit(s.max - s.min)

  /** (x - mean) / stddev; builtin_transformations.py:35-40. */
  def standardScaler(c: Column, s: FeatureStatistics): Column =
    if (s.stddev == 0.0) lit(0.0) else (c - lit(s.mean)) / lit(s.stddev)

  /** (x - median) / IQR with median/IQR from the 25/50/75 percentiles
    * (builtin_transformations.py:43-49: percentiles[49], [24], [74]).
    */
  def robustScaler(c: Column, s: FeatureStatistics): Column = {
    // fail at PLAN time if the fit skipped quantiles (a hand-built
    // Transformation that forgot needsQuantiles=true) — the alternative
    // is silent NaN in every scaled row
    require(!s.median.isNaN && !s.p25.isNaN && !s.p75.isNaN,
      "robust scaler requires quantile statistics — set " +
        "needsQuantiles=true on the transformation so fitStats computes " +
        "percentiles for its input")
    val iqr = s.p75 - s.p25
    if (iqr == 0.0) c - lit(s.median) else (c - lit(s.median)) / lit(iqr)
  }

  /** Sorted-unique → 0-based index (label_encoder,
    * builtin_transformations.py:52-57). Binds the sorted vocabulary as an
    * array literal — O(log n) per row via array_position on a broadcast
    * literal, no join.
    */
  /** Per-key winsorization at exact rational quantiles: clip `valueCol`
    * into [Q(lowNum/den), Q(highNum/den)] per key group, the standard
    * robust tail-capping transform (a p1/p99 clip kills sensor spikes
    * without the mean-chasing failure of z-score clips). Quantiles are
    * EXACT lower quantiles over the bounded distinct-value table
    * ([[Splits.lowerQuantileFromCounts]] — integer position arithmetic,
    * no interpolation), so the fitted bounds replay bit-for-bit in SQL.
    *
    * Scale shape: one map-side-combined value-count pass fits BOTH
    * bounds; the clip joins the |keys|-row bounds table back (AQE
    * broadcasts it) — fit once, apply anywhere, like every transform
    * here.
    *
    * Null contract: rows with a null `valueCol` never contribute to the
    * fit AND are dropped from the output (the inner bounds join keeps
    * only rows with a fitted key; a null value has no defensible clipped
    * value, and emitting it as null would silently change the row count
    * downstream consumers see vs the fitted population). Callers who
    * need null rows preserved should split them off before the call.
    *
    * Bounded-distinct contract: the count frame is |keys × distinct
    * values|-sized. Exactness (bit-replayable bounds) is the point, but
    * on a CONTINUOUS double column at 100 TB that frame degenerates to
    * data-sized — round/bucket the column first, or use
    * [[winsorizeApprox]] (same output schema, `percentile_approx`-backed)
    * when the value domain is unbounded.
    */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: Column,
                lowNum: Int, highNum: Int, den: Int): DataFrame = {
    require(lowNum <= highNum, "low quantile must not exceed high")
    val counts = df.filter(valueCol.isNotNull)
      .groupBy((keys.map(col) :+ valueCol.cast("double").as("_v")): _*)
      .agg(count(lit(1)).as("_c"))
      // both quantile folds read this frame; eager pin (Materialize) so
      // the data pass runs once AND the tiny count blocks are reclaimable
      // by the context cleaner once the fit is dropped — a cache() here
      // would pin partitions for the life of the session because the
      // lazily-returned result has no safe point to unpersist
      .pinned()
    val lo = Splits.lowerQuantileFromCounts(counts, keys, lowNum, den)
      .withColumnRenamed("quantile", "_lo")
    val hi = Splits.lowerQuantileFromCounts(counts, keys, highNum, den)
      .withColumnRenamed("quantile", "_hi")
    df.filter(valueCol.isNotNull).join(lo, keys).join(hi, keys)
      .withColumn("value_wins",
        least(greatest(valueCol.cast("double"), col("_lo")), col("_hi")))
      .withColumnRenamed("_lo", "q_low")
      .withColumnRenamed("_hi", "q_high")
  }

  /** Equal-frequency (quantile) binning — the discretizer transform:
    * each row gets the bin its value falls in under per-key nBins
    * equal-mass cut points. Bins are assigned at VALUE granularity
    * (ties share a bin, the only consistent choice), by the closed
    * form `bin(v) = min(⌊rank_below(v)·nBins/n⌋, nBins−1)` where
    * `rank_below` is the count of rows strictly below `v` — that IS
    * "how many exact lower-quantile cut points sit below v", so no cut
    * table is ever materialized and the whole fit is integer algebra
    * on the same one-scan count frame as [[winsorize]] (same
    * bounded-distinct contract: round a raw continuous column first).
    * Heavily-tied columns yield fewer occupied bins than nBins — the
    * honest equal-frequency behavior, not an error. The bin map
    * (|keys × distinct values| rows) joins back broadcast; the data is
    * never shuffled.
    */
  def quantileBin(df: DataFrame, keys: Seq[String], valueCol: Column,
                  nBins: Int, binCol: String = "bin"): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(valueCol.isNotNull)
      .groupBy((keys.map(col) :+ valueCol.cast("double").as("_v")): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.partitionBy(keys.map(col): _*)
    val binMap = counts
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(tw))
      .withColumn(binCol,
        least(expr(s"((_cum - _c) * $nBins) div _n").cast("int"),
          lit(nBins - 1)))
      .select((keys.map(col) :+ col("_v") :+ col(binCol)): _*)
    df.filter(valueCol.isNotNull)
      .withColumn("_v", valueCol.cast("double"))
      .join(broadcast(binMap), keys :+ "_v")
      .drop("_v")
  }

  /** [[winsorize]] for UNBOUNDED value domains: identical output schema
    * and clip semantics, but the bounds come from `percentile_approx`
    * (relative-error sketch, mergeable, one map-side-combined pass) so
    * the fit never materializes a per-distinct-value frame. The bounds
    * are approximate — use the exact variant when the domain is bounded
    * (rounded/bucketed/categorical-numeric) and bit-replayability
    * matters; use this one for raw continuous columns at 100 TB.
    *
    * `accuracy` is Spark's percentile_approx knob (default 10000 ≈
    * 1/10000 relative rank error).
    */
  def winsorizeApprox(df: DataFrame, keys: Seq[String], valueCol: Column,
                      lowNum: Int, highNum: Int, den: Int,
                      accuracy: Int = 10000): DataFrame = {
    require(lowNum <= highNum, "low quantile must not exceed high")
    val bounds = df.filter(valueCol.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        percentile_approx(valueCol.cast("double"),
          lit(lowNum.toDouble / den), lit(accuracy)).as("_lo"),
        percentile_approx(valueCol.cast("double"),
          lit(highNum.toDouble / den), lit(accuracy)).as("_hi"))
    df.filter(valueCol.isNotNull).join(bounds, keys)
      .withColumn("value_wins",
        least(greatest(valueCol.cast("double"), col("_lo")), col("_hi")))
      .withColumnRenamed("_lo", "q_low")
      .withColumnRenamed("_hi", "q_high")
  }

  /** Leakage-safe (out-of-fold) smoothed target encoding: each row's
    * categorical value is replaced by the smoothed mean of the target over
    * every OTHER fold —
    *
    * {{{ enc = (S_cat − S_cat,fold + m · prior) / (n_cat − n_cat,fold + m)
    *     prior = (S − S_fold) / (N − N_fold) }}}
    *
    * so a row never sees its own fold's targets (the standard remedy for
    * target leakage in mean encoding; the reference's transformation
    * framework, python/hsfs/hopsworks_udf.py, has statistics-parameterized
    * transforms but no out-of-fold variant — this is the training-pipeline
    * extension). `m` (`smoothing`) is the pseudo-count pulling rare
    * categories toward the out-of-fold global prior.
    *
    * Scale shape: ONE map-side-combined groupBy of the data to a
    * |categories × folds| frame; category totals, global totals, and the
    * per-(category, fold) encodings all fold from that tiny frame; the
    * encoding joins back BROADCAST on (category, fold). The big table is
    * never shuffled. Null categories form their own encoding group
    * (null-safe join), null targets count toward n but not S — document
    * targets as non-null for exact parity.
    *
    * Determinism: with an integral target the sums are exact, and the
    * encoding is a fixed dag of double ops over exact integers — bit-equal
    * across engines, so the oracle replays it term for term.
    */
  def targetEncodeOutOfFold(df: DataFrame, categoryCol: String,
                            target: Column, foldCol: String,
                            smoothing: Double,
                            outCol: String = "target_enc"): DataFrame = {
    require(smoothing > 0, "smoothing pseudo-count must be positive")
    val perCatFold = df
      .groupBy(col(categoryCol).as("_te_cat"), col(foldCol).as("_te_fold"))
      .agg(sum(target.cast("long")).as("_te_s"),
        count(lit(1)).as("_te_n"))
      .pinned()
    // category / fold / global totals are re-aggregations of the tiny
    // per-(cat, fold) frame joined back broadcast — no second scan of
    // the data, no driver collect, no single-partition window; the
    // prior excludes the row's ENTIRE fold (not just its cell), the
    // textbook out-of-fold contract
    val catTotals = perCatFold.groupBy(col("_te_cat").as("_te_cat2"))
      .agg(sum(col("_te_s")).as("_te_sc"), sum(col("_te_n")).as("_te_nc"))
    val foldTotals = perCatFold.groupBy(col("_te_fold").as("_te_fold2"))
      .agg(sum(col("_te_s")).as("_te_sf"), sum(col("_te_n")).as("_te_nf"))
    val globalTotals = perCatFold
      .agg(sum(col("_te_s")).as("_te_sg"), sum(col("_te_n")).as("_te_ng"))
    val enc = perCatFold
      .join(broadcast(catTotals), col("_te_cat") <=> col("_te_cat2"))
      .join(broadcast(foldTotals), col("_te_fold") === col("_te_fold2"))
      .crossJoin(broadcast(globalTotals))
      .select(col("_te_cat"), col("_te_fold"),
        round(
          ((col("_te_sc") - col("_te_s")).cast("double") +
            lit(smoothing) *
              ((col("_te_sg") - col("_te_sf")).cast("double") /
                (col("_te_ng") - col("_te_nf")).cast("double"))) /
            ((col("_te_nc") - col("_te_n")).cast("double") + lit(smoothing)),
          9).as(outCol))
    df.join(broadcast(enc),
      col(categoryCol) <=> col("_te_cat") && col(foldCol) === col("_te_fold"),
      "left")
      .drop("_te_cat", "_te_fold")
  }

  /** Hashed feature cross (the "hashing trick"): combine categorical
    * columns into one bounded-cardinality bucket id,
    * `pmod(charPolyHash(c1 ⊕ sep ⊕ c2 ⊕ …), nBuckets)` — the classic
    * wide-model cross feature (cf. TensorFlow's
    * `crossed_column`) without a vocabulary fit or a distinct pass.
    * Nulls are encoded as an explicit `\u0002` sentinel BEFORE joining
    * with the `\u0001` separator, so `(a, null)` and `(anull,)`-style
    * concatenation ambiguities cannot collide and null never silently
    * equals empty-string. (`\u0000` would NOT work as the sentinel: the
    * polynomial starts at h = 0, so a leading NUL is absorbed —
    * `hash("\u0000x") == hash("x")` — and null would collide with
    * empty-string in the first column.)
    *
    * Row-local and codegen'd end-to-end (the hash is a native
    * [[graft.functions.TextHash.CharPolyHash]] expression): zero
    * shuffle, zero fit state, and — because the hash is the
    * SQL-replayable 52-bit char polynomial, not xxhash — an external
    * engine can reproduce every bucket id exactly.
    */
  def hashedCross(cols: Seq[Column], nBuckets: Int,
                  sep: String = "\u0001"): Column = {
    require(cols.size >= 2, "a cross needs at least two columns")
    require(nBuckets > 0, "nBuckets must be positive")
    val parts = cols.map(c => coalesce(c.cast("string"), lit("\u0002")))
    val joined = parts.reduce((a, b) => concat(a, lit(sep), b))
    pmod(graft.functions.TextHash.charPolyHash(joined),
      lit(nBuckets.toLong)).cast("int")
  }

  def labelEncoder(c: Column, s: FeatureStatistics): Column = {
    val sortedVals = s.uniqueValues.map(v => lit(v))
    array_position(array(sortedVals: _*), c).cast("int") - 1
  }

  /** One boolean column per sorted unique value (one_hot_encoder,
    * builtin_transformations.py:60-66); multi-output → struct, exploded by
    * the caller with `select("out.*")` (engine/spark.py:1308-1311).
    */
  def oneHotEncoder(c: Column, s: FeatureStatistics, outPrefix: String): Seq[Column] =
    s.uniqueValues.map(v => (c === lit(v)).as(s"${outPrefix}_${v}"))

  // -------------------------------------------------------------------
  // Registry (model-dependent vs on-demand kinds, hopsworks_udf.py:35-41)
  // -------------------------------------------------------------------

  sealed trait Kind
  case object ModelDependent extends Kind // statistics-parameterized
  case object OnDemand extends Kind       // computed from raw inputs only

  /** A registered transformation: given input columns and (optional) bound
    * statistics, produce one or more output columns. `drop` lists input
    * features removed after application (hopsworks_udf.py:224-262).
    *
    * `needsQuantiles` declares the statistics the transform actually reads:
    * only robust-scaler-style transforms need exact percentiles, and exact
    * percentiles buffer every distinct value per partition — `fitStats`
    * requests them ONLY for inputs of transforms that set this flag, so a
    * min-max-only pipeline on a high-cardinality column never pays for a
    * quantile nobody reads.
    */
  final case class Transformation(
      name: String,
      kind: Kind,
      inputs: Seq[String],
      drop: Seq[String] = Nil,
      fn: (Seq[Column], Map[String, FeatureStatistics]) => Seq[Column],
      needsQuantiles: Boolean = false)

  /** The reference's builtin transformation functions
    * (builtin_transformations.py:26-66) as DECLARATIVE specs: everything
    * needed to reconstruct the Transformation is (builtin, input, out,
    * drop), so a catalog can persist and round-trip them — unlike
    * arbitrary lambdas, which are registered by name only.
    */
  val Builtins: Seq[String] = Seq("min_max_scaler", "standard_scaler",
    "robust_scaler", "label_encoder", "one_hot_encoder")

  def builtin(name: String, builtinKind: String, input: String,
              outName: Option[String] = None,
              dropInput: Boolean = false): Transformation = {
    val out = outName.getOrElse(s"${builtinKind}_$input")
    val fn: (Seq[Column], Map[String, FeatureStatistics]) => Seq[Column] =
      builtinKind match {
        case "min_max_scaler" =>
          (cs, st) => Seq(minMaxScaler(cs.head, st(input)).as(out))
        case "standard_scaler" =>
          (cs, st) => Seq(standardScaler(cs.head, st(input)).as(out))
        case "robust_scaler" =>
          (cs, st) => Seq(robustScaler(cs.head, st(input)).as(out))
        case "label_encoder" =>
          (cs, st) => Seq(labelEncoder(cs.head, st(input)).as(out))
        case "one_hot_encoder" =>
          (cs, st) => oneHotEncoder(cs.head, st(input), out)
        case other => throw new IllegalArgumentException(
          s"unknown builtin transformation '$other' " +
            s"(supported: ${Builtins.mkString(", ")})")
      }
    Transformation(name, ModelDependent, Seq(input),
      drop = if (dropInput) Seq(input) else Nil, fn = fn,
      needsQuantiles = builtinKind == "robust_scaler")
  }

  /** Apply transformations as ONE wide select (engine/spark.py:1318-1326):
    * untransformed passthrough columns + every transformation output, then
    * drop the consumed inputs marked for dropping.
    */
  def applyAll(df: DataFrame, transforms: Seq[Transformation],
               stats: Map[String, FeatureStatistics]): DataFrame = {
    val dropSet = transforms.flatMap(_.drop).toSet
    val passthrough = df.columns.filterNot(dropSet).map(col(_): Column).toSeq
    val outputs = transforms.flatMap(t => t.fn(t.inputs.map(col), stats))
    df.select(passthrough ++ outputs: _*)
  }

  /** Two-pass convenience: compute stats on `statsDf` (normally the train
    * split only — engine/spark.py:704-712), apply to `df`.
    */
  def fitApply(statsDf: DataFrame, df: DataFrame,
               transforms: Seq[Transformation]): DataFrame =
    applyAll(df, transforms, fitStats(statsDf, transforms))

  /** Fit the model-dependent statistics only (one agg pass) — callers
    * reuse the result across splits and persist it for serving
    * (reference binds precomputed training-dataset statistics at serving,
    * core/vector_server.py:924-978).
    */
  def fitStats(statsDf: DataFrame,
               transforms: Seq[Transformation]): Map[String, FeatureStatistics] = {
    val md = transforms.filter(_.kind == ModelDependent)
    val scaled = md.flatMap(_.inputs)
      .filter(c => statsDf.schema(c).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType]).distinct
    val encoded = md.flatMap(_.inputs).filterNot(scaled.contains).distinct
    // exact percentiles only where a transform declares it reads them
    val quantiles = md.filter(_.needsQuantiles).flatMap(_.inputs)
      .filter(scaled.contains).distinct
    FeatureStatistics.compute(statsDf, scaled, encoded,
      quantilesFor = quantiles)
  }
}
