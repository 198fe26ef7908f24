package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time-correct (as-of) join: for each left (spine) row with event
  * time t and join keys k, attach the single right row for k with the
  * largest right event time ≤ t; exactly one output row per spine row
  * (left-outer semantics — unmatched spine rows keep null right columns).
  *
  * Reference semantics: the server-generated `pit_query`
  * (python/hsfs/constructor/fs_query.py:32-33,76-82, selection
  * python/hsfs/constructor/query.py:597-607); DuckDB variant uses ASOF JOIN
  * (`pit_query_asof`).
  *
  * Implementation (scale-first): a **union + running-last window**, not a
  * range join. The naive plan — equi-join on keys with `r.t <= l.t` then
  * dedup — materializes every (spine row × earlier right row) pair before
  * deduplication, which explodes at 100 TB. Here each input row is shuffled
  * exactly once, partitioned by key and sorted by time; a running
  * `last(payload, ignoreNulls)` carries the latest right payload forward
  * onto each spine row. Cost: one shuffle of |spine| + |right| rows, no
  * intermediate blowup. Right-side columns are packed into a single struct
  * so per-column nulls in right rows are preserved (a per-column
  * carry-forward would resurrect stale non-null values).
  *
  * Tie rules: a right row at exactly t == spine t is eligible (≤); among
  * right rows sharing (key, t) the winner is the greatest `tieBreak` value
  * compared in the column's NATIVE type (precombine analog,
  * python/hsfs/core/hudi_engine.py:141-149 — no double cast, so long
  * precombine values above 2^53 keep full precision). Null never equals
  * null (SQL join semantics): right rows with a null key or null event
  * time never match, and spine rows with a null key or null event time
  * get null right columns.
  */
object PointInTimeJoin {

  /** Sentinel for `saltBuckets`: derive the bucket count from a
    * key-frequency probe of the spine (see [[deriveSaltBuckets]]).
    */
  val AutoSalt: Int = 0

  /** @param saltBuckets when > 1, spreads each join key over this many
    *   sub-partitions to break hot-key skew: spine rows are deterministically
    *   salted, right rows replicated to every bucket. Shuffle volume becomes
    *   |spine| + saltBuckets × |right| — buy parallelism on a skewed key
    *   with bounded replication. Leave at 1 (off) for a known-uniform key,
    *   or pass [[AutoSalt]] to derive it from a cheap key-frequency probe
    *   so a skewed spine gets the salted plan without caller tuning.
    * @param maxKeyRowsPerBucket AutoSalt target: rows of ONE key a single
    *   window partition may hold before the key is split across buckets
    *   (a window partition is sorted within one task, so this bounds the
    *   per-task sort).
    * @param spineRowsHint optional spine row count for AutoSalt's probe:
    *   an exact count is metadata-cheap only on a bare parquet spine — a
    *   COMPUTED spine pays a full job for it, so callers that already
    *   know (even approximately) how many rows the spine has should pass
    *   it here; see [[deriveSaltBuckets]].
    */
  def asOf(
      spine: DataFrame,
      spineEventTime: String,
      right: DataFrame,
      rightEventTime: String,
      spineKeys: Seq[String],
      rightKeys: Seq[String],
      prefix: String = "",
      tieBreak: Option[String] = None,
      saltBuckets: Int = 1,
      maxKeyRowsPerBucket: Long = 4000000L,
      spineRowsHint: Option[Long] = None): DataFrame = {
    require(spineKeys.nonEmpty && spineKeys.size == rightKeys.size,
      "as-of join needs matching non-empty key lists")
    require(saltBuckets >= 0, "saltBuckets: >1 manual, 1 off, 0 (AutoSalt) derived")

    val spineCols = spine.columns.toSeq
    val rightPayloadCols = right.columns.toSeq.filterNot(rightKeys.contains)
    val collisions = rightPayloadCols.map(prefix + _).filter(spineCols.contains)
    require(collisions.isEmpty,
      s"as-of join output would duplicate columns ${collisions.mkString(", ")}" +
        " — set a prefix")
    val keyNames = spineKeys.indices.map(i => s"_pit_k$i")
    val etType = spine.schema(spineEventTime).dataType
    val payloadType = StructType(rightPayloadCols.map(c => right.schema(c)))
    val spineType = StructType(spine.schema.fields)

    val buckets =
      if (saltBuckets == AutoSalt)
        deriveSaltBuckets(spine, spineKeys, maxKeyRowsPerBucket,
          spineRows = spineRowsHint)
      else saltBuckets
    val salted = buckets > 1
    val spineSalt =
      if (salted) pmod(xxhash64(struct(spineCols.map(col): _*)), lit(buckets))
      else lit(0)
    // tie-break ordered on the column's native type (a double cast would
    // collapse long values above 2^53); the spine filler is a typed null
    val ordType = tieBreak.map(right.schema(_).dataType)
      .getOrElse(org.apache.spark.sql.types.IntegerType)
    val spineNorm = spine.select(
      spineKeys.zip(keyNames).map { case (k, kn) => col(k).as(kn) } ++ Seq(
        spineSalt.as("_pit_salt"),
        col(spineEventTime).as("_pit_t"),
        lit(1).as("_pit_side"),
        lit(null).cast(ordType).as("_pit_ord"),
        struct(spineCols.map(col): _*).as("_spine"),
        lit(null).cast(payloadType).as("_payload")): _*)

    val rightSalt =
      if (salted) explode(sequence(lit(0), lit(buckets - 1))) else lit(0)
    // a right row with any null key can never equal a spine key (null
    // never equals null) — drop before the shuffle
    val rightNorm = right
      .filter(col(rightEventTime).isNotNull &&
        rightKeys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        rightKeys.zip(keyNames).map { case (k, kn) => col(k).as(kn) } ++ Seq(
          rightSalt.as("_pit_salt"),
          col(rightEventTime).cast(etType).as("_pit_t"),
          lit(0).as("_pit_side"),
          tieBreak.map(col(_)).getOrElse(lit(0)).cast(ordType).as("_pit_ord"),
          lit(null).cast(spineType).as("_spine"),
          struct(rightPayloadCols.map(col): _*).as("_payload")): _*)

    // Order within a key: time asc; at equal time right rows (side=0) sort
    // before the spine row (side=1) so "≤" is inclusive; among right rows
    // the larger tie-break sorts later and wins the running last().
    val w = Window
      .partitionBy((keyNames :+ "_pit_salt").map(col): _*)
      .orderBy(col("_pit_t").asc, col("_pit_side").asc, col("_pit_ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = spineNorm.unionByName(rightNorm)
      .withColumn("_matched", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_pit_side") === 1)

    // spine rows with a null key landed in the all-null window partition;
    // mask their carry so null keys never "match" null-keyed right rows
    val keysOk = keyNames.map(col(_).isNotNull).reduce(_ && _)
    val out =
      spineCols.map(c => col("_spine").getField(c).as(c)) ++
        rightPayloadCols.map(c =>
          when(col("_pit_t").isNotNull && keysOk,
            col("_matched").getField(c)).as(prefix + c))
    carried.select(out: _*)
  }

  /** [[asOf]] with a freshness bound — the reference's PIT semantics plus
    * the staleness contract real feature serving needs: a feature value
    * older than `toleranceUs` micros at the spine's event time is no
    * feature at all (served as null), because training on arbitrarily
    * stale joins teaches the model a freshness the online store won't
    * have. Matches are still "latest at-or-before"; the bound then nulls
    * EVERY right payload column of a stale match in one pass over the
    * joined frame (no second join, no re-sort — a projection on top of
    * the PIT window).
    *
    * `prefix` must be non-empty: the right event time has to survive
    * into the output under a distinct name for the staleness test.
    */
  def asOfWithTolerance(
      spine: DataFrame,
      spineEventTime: String,
      right: DataFrame,
      rightEventTime: String,
      spineKeys: Seq[String],
      rightKeys: Seq[String],
      prefix: String,
      toleranceUs: Long,
      tieBreak: Option[String] = None,
      saltBuckets: Int = 1,
      maxKeyRowsPerBucket: Long = 4000000L,
      spineRowsHint: Option[Long] = None): DataFrame = {
    require(toleranceUs > 0, "toleranceUs must be positive")
    require(prefix.nonEmpty,
      "asOfWithTolerance needs a prefix so the right event time is " +
        "addressable in the joined output")
    val joined = asOf(spine, spineEventTime, right, rightEventTime,
      spineKeys, rightKeys, prefix, tieBreak, saltBuckets,
      maxKeyRowsPerBucket, spineRowsHint)
    val rightTsOut = prefix + rightEventTime
    val sUs = graft.functions.TimeFunctions
      .eventTimeToMicros(joined, spineEventTime)
    val rUs = graft.functions.TimeFunctions
      .eventTimeToMicros(joined, rightTsOut)
    val fresh = rUs.isNotNull && (sUs - rUs <= toleranceUs)
    val rightPayloadCols = right.columns.toSeq.filterNot(rightKeys.contains)
      .map(prefix + _)
    joined.select(joined.columns.toSeq.map { c =>
      if (rightPayloadCols.contains(c)) when(fresh, col(c)).as(c) else col(c)
    }: _*)
  }

  /** Convenience overload for symmetric key names, no prefix. */
  def asOf(spine: DataFrame, right: DataFrame, keys: Seq[String],
           spineEventTime: String, rightEventTime: String): DataFrame =
    asOf(spine, spineEventTime, right, rightEventTime, keys, keys)

  /** Validity-interval (SCD-2) temporal join: each dimension row carries its
    * own `[validFrom, validTo)` window; a spine row at time t gets the
    * dimension row whose interval contains t — inclusive start, EXCLUSIVE
    * end, `null` validTo = open-ended — or null payload columns when t
    * falls in a coverage gap. This is the slowly-changing-dimension shape a
    * feature store's versioned profile tables have (the reference's PIT
    * query, python/hsfs/constructor/fs_query.py:32-33, assumes
    * append-only facts; SCD-2 dimensions add the expiry bound).
    *
    * Plan (scale-first): NOT a range join — an equi-key join with
    * `validFrom <= t < validTo` materializes every (spine × candidate
    * version) pair before picking one. Instead: [[asOf]] on `validFrom`
    * (one shuffle of |spine| + |dim|, running-last window, no pair blowup)
    * finds the latest version STARTING at or before t; a row-local
    * projection then nulls the payload when t has passed that version's
    * own `validTo`. With per-key non-overlapping intervals (the SCD-2
    * invariant — callers with overlapping versions should pre-resolve via
    * tieBreak on version recency) the containing interval, if any, is
    * always the one with the greatest `validFrom <= t`, so the two-step
    * plan is exact.
    *
    * `prefix` must be non-empty so the matched row's `validTo` survives
    * into the joined frame for the expiry test (same contract as
    * [[asOfWithTolerance]]).
    */
  def validAsOf(
      spine: DataFrame,
      spineEventTime: String,
      dim: DataFrame,
      validFrom: String,
      validTo: String,
      spineKeys: Seq[String],
      dimKeys: Seq[String],
      prefix: String,
      tieBreak: Option[String] = None,
      saltBuckets: Int = 1,
      maxKeyRowsPerBucket: Long = 4000000L,
      spineRowsHint: Option[Long] = None): DataFrame = {
    require(prefix.nonEmpty,
      "validAsOf needs a prefix so the matched validTo is addressable " +
        "in the joined output")
    val joined = asOf(spine, spineEventTime, dim, validFrom,
      spineKeys, dimKeys, prefix, tieBreak, saltBuckets,
      maxKeyRowsPerBucket, spineRowsHint)
    val sUs = graft.functions.TimeFunctions
      .eventTimeToMicros(joined, spineEventTime)
    val eUs = graft.functions.TimeFunctions
      .eventTimeToMicros(joined, prefix + validTo)
    // matched (validFrom carried through as non-null) AND not yet expired;
    // a null validTo is an open-ended current version
    val inWindow = graft.functions.TimeFunctions
      .eventTimeToMicros(joined, prefix + validFrom).isNotNull &&
      (eUs.isNull || sUs < eUs)
    val dimPayloadCols = dim.columns.toSeq.filterNot(dimKeys.contains)
      .map(prefix + _)
    joined.select(joined.columns.toSeq.map { c =>
      if (dimPayloadCols.contains(c)) when(inWindow, col(c)).as(c)
      else col(c)
    }: _*)
  }

  /** Derive the salt bucket count from a cheap key-frequency probe: a
    * seeded random sample of the spine's key columns (column-pruned,
    * bounded at ~`sampleRows` rows) is frequency-counted, the hottest
    * key's sample count scales back by the sampling fraction, and buckets
    * = ceil(estimated hottest key / maxKeyRowsPerBucket).
    *
    * Cost: one count of the spine — metadata-cheap ONLY when the spine is
    * a bare parquet scan; a computed spine (joins/aggregates upstream)
    * pays a full job for the count and another for the sample, so such
    * callers should pass `spineRows` (any upstream count or size estimate
    * they already have — it only sets the sampling fraction, and the
    * derived buckets are identical for any hint within ~2× of truth
    * because the hot-key estimate rescales by the same fraction) — plus
    * one map-side-combined aggregation over a bounded sample of the key
    * columns only — negligible next to the join's own shuffle, and worth
    * paying: an unsplit hot key serializes the whole window sort onto one
    * task at 100 TB. A key must own roughly > maxKeyRowsPerBucket rows to
    * trigger salting, which a million-row sample detects reliably (such a
    * key is ≥ a few percent of any realistically-sized spine partition
    * load; sub-sample-resolution keys don't need salting by definition).
    *
    * Bucket count is capped: the right side replicates `buckets`×, so an
    * extreme estimate must not turn a skew fix into a replication blowup.
    *
    * @param spineRows caller-supplied spine row count, skipping the exact
    *                  count job on computed frames
    */
  private[graft] def deriveSaltBuckets(spine: DataFrame, spineKeys: Seq[String],
                                     maxKeyRowsPerBucket: Long,
                                     sampleRows: Long = 1000000L,
                                     maxBuckets: Int = 32,
                                     spineRows: Option[Long] = None): Int = {
    require(maxKeyRowsPerBucket > 0, "maxKeyRowsPerBucket must be positive")
    // strictly positive: Some(0) would short-circuit to 1 bucket and
    // silently disable skew salting on a non-empty spine — a caller with
    // a genuinely empty spine has no join to salt, so fail loudly
    require(spineRows.forall(_ > 0),
      "spineRows hint must be strictly positive (omit it to count)")
    val keyOnly = spine.select(spineKeys.map(col): _*)
    val total = spineRows.getOrElse(keyOnly.count())
    if (total == 0) return 1
    val fraction = math.min(1.0, sampleRows.toDouble / total)
    val sampled =
      if (fraction >= 1.0) keyOnly
      else keyOnly.sample(withReplacement = false, fraction, seed = 42L)
    val topRow = sampled.groupBy(spineKeys.map(col): _*).count()
      .agg(max("count").as("m")).head
    if (topRow.isNullAt(0)) return 1
    val estTop = (topRow.getLong(0) / fraction).toLong
    val wanted = math.ceil(estTop.toDouble / maxKeyRowsPerBucket).toInt
    math.max(1, math.min(maxBuckets, wanted))
  }
}
