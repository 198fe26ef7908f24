package graft.serving

import graft.model.FeatureGroup
import graft.ops.Transformations
import graft.planner.QueryPlanner
import graft.view.FeatureView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch serving analog of the reference's online feature-vector path
  * (python/hsfs/core/vector_server.py:486-554 assembly,
  * core/online_store_sql_engine.py per-FG prepared statements).
  *
  * Instead of per-key MySQL prepared statements, lookups are broadcast-hash
  * joins of the (small) key set against each feature group's latest
  * snapshot — one join per feature group, results merged on the serving
  * keys, missing features null (vector_server missing-feature policy
  * :509-534). On-demand transformations compute from request-time columns;
  * model-dependent ones bind precomputed statistics (vector_server
  * :924-978).
  */
final class FeatureVectorServer(
    spark: SparkSession,
    view: FeatureView,
    stats: Map[String, Transformations.FeatureStatistics] = Map(),
    cacheSnapshots: Boolean = false) {

  private val lf = view.query.leftFeatureGroup

  /** The keys a [[getFeatureVectors]] caller interacts with — the
    * reference's serving-key surface (serving_key.py:26-47,
    * feature_view.py serving_keys): the left group's primary-key columns
    * are REQUIRED (every lookup is driven off them); each join's right
    * key is derived from the left lookup through `joinOn`, so it is
    * informational (required=false) — the caller never passes it.
    */
  def servingKeys: Seq[FeatureVectorServer.ServingKey] = {
    val required = lf.primaryKey.map(k =>
      FeatureVectorServer.ServingKey(k, lf.name, required = true))
    val derived = view.query.joins.zipWithIndex.flatMap { case (j, i) =>
      val rfg = j.right.leftFeatureGroup
      val joinKeys =
        if (j.on.nonEmpty) j.on
        else if (j.leftOn.nonEmpty) j.leftOn
        else lf.primaryKey.filter(rfg.primaryKey.contains)
      val rightKeys = if (j.rightOn.nonEmpty) j.rightOn else joinKeys
      rightKeys.zip(joinKeys).map { case (rk, lk) =>
        FeatureVectorServer.ServingKey(rk, rfg.name, required = false,
          prefix = j.prefix.getOrElse(""), joinIndex = i + 1,
          joinOn = Seq(lk))
      }
    }
    required ++ derived
  }

  // The DEFAULT lookup path semi-prunes each snapshot to the requested
  // keys BELOW the latest-per-key window — a 10-key lookup against a
  // 100 TB group touches only matching key partitions and never windows
  // the full table. Materializing the full latest-per-key state (the
  // analog of the reference's online store being a materialized
  // latest-version table) is a real cost that must be opt-in and named:
  // call materializeOnline() — or construct with cacheSnapshots=true to
  // materialize lazily on first lookup. close() releases.
  private val snapCache =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.DataFrame]

  private def snapshotOf(fg: FeatureGroup,
                         build: => org.apache.spark.sql.DataFrame) =
    snapCache.getOrElseUpdate(fg.id, { val d = build.cache(); d })

  private def useCache(fg: FeatureGroup): Boolean =
    cacheSnapshots || snapCache.contains(fg.id)

  /** Eagerly materialize + cache the latest-per-key snapshot of every
    * feature group in the view (one full-table window each, paid ONCE,
    * here, by explicit request). Subsequent lookups are broadcast joins
    * against the cached state — the "online store" serving mode.
    */
  def materializeOnline(): this.type = {
    def add(fg: FeatureGroup, build: => DataFrame): Unit =
      if (!snapCache.contains(fg.id)) snapshotOf(fg, build).count()
    add(lf, latestPerKey(lf, QueryPlanner.materialize(spark, lf, None)))
    view.query.joins.foreach { j =>
      val rfg = j.right.leftFeatureGroup
      add(rfg,
        latestPerKey(rfg, QueryPlanner.plan(spark, j.right.copy(features = Nil))))
    }
    this
  }

  /** Release cached snapshots. */
  def close(): Unit = {
    snapCache.values.foreach(_.unpersist())
    snapCache.clear()
  }

  /** Latest row per primary key — the online store holds only the newest
    * version of each key (reference online path semantics; offline history
    * keeps every (pk, event_time) record).
    */
  private def latestPerKey(fg: FeatureGroup,
                           df: org.apache.spark.sql.DataFrame) =
    fg.eventTime.filter(df.columns.contains) match {
      case Some(et) if fg.primaryKey.nonEmpty =>
        // ties on (pk, event_time) pick a deterministic winner: precombine
        // columns desc (mirrors Lake.dedupLatest), then a content hash so
        // the choice never depends on partition scan order
        val tieBreak =
          fg.effectivePrecombine.filter(df.columns.contains)
            .filterNot(_ == et).map(col(_).desc).toSeq :+
            xxhash64(df.columns.sorted.map(col): _*).desc
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(fg.primaryKey.map(col): _*)
          .orderBy(col(et).desc +: tieBreak: _*)
        df.withColumn("_sv_rn", row_number().over(w))
          .filter(col("_sv_rn") === 1).drop("_sv_rn")
      case _ => df
    }

  /** Broadcast-lookup of a small key set against a huge snapshot.
    *
    * A LEFT-OUTER join can only broadcast its non-preserved side
    * (BuildRight), so `broadcast(keys).join(snap, _, "left")` silently
    * drops the hint and sort-merge-shuffles the full snapshot. The
    * scale-correct shape is two broadcasts of the SMALL side:
    *   1. broadcast LEFT-SEMI prune the snapshot to the key set
    *      (LeftSemi + BuildRight) — the 100 TB side is scanned once,
    *      never shuffled;
    *   2. LEFT-OUTER join the keys against the (≤ |keys|) hit set with
    *      the hits as build side (LeftOuter + BuildRight).
    * When snapshots are not cached, the semi-prune is pushed BELOW the
    * latest-per-key window (valid because serving joinKeys ⊆ primary key,
    * so the filter keeps/drops whole window partitions), shrinking the
    * row_number shuffle to the matched keys only.
    */
  private def lookupOne(keys: DataFrame, fg: FeatureGroup,
                        wanted: Seq[String], joinKeys: Seq[String],
                        prefix: String): DataFrame = {
    val probe = keys.select(joinKeys.map(col): _*).distinct()
    val cached = useCache(fg)
    val snap =
      if (cached)
        snapshotOf(fg,
          latestPerKey(fg, QueryPlanner.materialize(spark, fg, None)))
      else
        latestPerKey(fg, QueryPlanner.materialize(spark, fg, None)
          .join(broadcast(probe), joinKeys, "left_semi"))
    val projected = snap.select((joinKeys ++ wanted).distinct.map(col): _*)
    val renamed = wanted.filterNot(joinKeys.contains).foldLeft(projected) {
      (d, c) => d.withColumnRenamed(c, prefix + c)
    }
    // uncached path is already pruned (and re-joining the same probe
    // lineage would be a self-join ambiguity); cached path prunes here
    val hits =
      if (cached)
        renamed.join(broadcast(probe), joinKeys, "left_semi")
      else renamed
    keys.join(broadcast(hits), joinKeys, "left")
  }

  /** Assemble feature vectors for a DataFrame of serving keys.
    *
    * @param requestParameters scalar request-time parameters, added as
    *   literal columns before transformation so ON_DEMAND transformations
    *   can consume them (reference core/vector_server.py:924-948); per-row
    *   request context rides in as extra columns of `keys`.
    */
  def getFeatureVectors(keys: DataFrame,
                        requestParameters: Map[String, Any] = Map()): DataFrame = {
    val selected =
      if (view.query.features.isEmpty) lf.featureNames
      else view.query.features.map(_.name)
    // join keys of downstream lookups must ride along even if unselected
    val joinKeyExtras = view.query.joins.flatMap { j =>
      if (j.on.nonEmpty) j.on
      else if (j.leftOn.nonEmpty) j.leftOn
      else lf.primaryKey.filter(j.right.leftFeatureGroup.primaryKey.contains)
    }.distinct.filterNot(selected.contains)
    val leftWanted = selected ++ joinKeyExtras
    var out = lookupOne(keys, lf,
      leftWanted.filterNot(keys.columns.contains), lf.primaryKey, "")

    view.query.joins.foreach { j =>
      val rfg = j.right.leftFeatureGroup
      val joinKeys =
        if (j.on.nonEmpty) j.on
        else if (j.leftOn.nonEmpty) j.leftOn
        else lf.primaryKey.filter(rfg.primaryKey.contains)
      val rightKeys = if (j.rightOn.nonEmpty) j.rightOn else joinKeys
      val wanted =
        if (j.right.features.isEmpty) rfg.featureNames else j.right.features.map(_.name)
      val baseSnap = QueryPlanner.plan(spark, j.right.copy(features = Nil))
      val probe = out.select(joinKeys.map(col): _*).distinct()
      // same two-broadcast shape as lookupOne; prune below the window
      // only when the join keys cover the partition (primary) key
      val canPruneBelowWindow = rightKeys.nonEmpty &&
        rightKeys.forall(rfg.primaryKey.contains)
      val pruned = !useCache(rfg) && canPruneBelowWindow
      val snap =
        if (pruned) {
          val pc = rightKeys.zip(joinKeys)
            .map { case (rk, lk) => baseSnap(rk) === probe(lk) }
            .reduce(_ && _)
          latestPerKey(rfg, baseSnap.join(broadcast(probe), pc, "left_semi"))
        } else if (useCache(rfg)) snapshotOf(rfg, latestPerKey(rfg, baseSnap))
        else latestPerKey(rfg, baseSnap)
      val projected = snap.select(
        (rightKeys ++ wanted.filterNot(rightKeys.contains)).distinct.map(col): _*)
      val prefix = j.prefix.getOrElse("")
      val renamed = wanted.filterNot(rightKeys.contains).foldLeft(projected) {
        (d, c) => d.withColumnRenamed(c, prefix + c)
      }
      val hits =
        if (pruned) renamed
        else {
          val sc = rightKeys.zip(joinKeys)
            .map { case (rk, lk) => renamed(rk) === probe(lk) }
            .reduce(_ && _)
          renamed.join(broadcast(probe), sc, "left_semi")
        }
      val cond = joinKeys.zip(rightKeys)
        .map { case (lk, rk) => out(lk) === hits(rk) }.reduce(_ && _)
      out = out.join(broadcast(hits), cond, "left")
      rightKeys.filterNot(k => joinKeys.contains(k) && wanted.contains(k))
        .foreach(k => out = out.drop(hits(k)))
    }

    // request parameters become literal columns, then one wide select
    // applies on-demand + model-dependent transformations together
    requestParameters.foreach { case (k, v) => out = out.withColumn(k, lit(v)) }
    if (view.transformations.nonEmpty)
      Transformations.applyAll(out, view.transformations, stats)
    else out
  }

  /** Single-vector convenience (collect-free plan, 1-row broadcast). */
  def getFeatureVector(key: Map[String, Any]): DataFrame = {
    val row = org.apache.spark.sql.Row.fromSeq(key.values.toSeq)
    val schema = org.apache.spark.sql.types.StructType(key.map { case (k, v) =>
      val dt = v match {
        case _: Int | _: Long => org.apache.spark.sql.types.LongType
        case _: Double        => org.apache.spark.sql.types.DoubleType
        case _                => org.apache.spark.sql.types.StringType
      }
      org.apache.spark.sql.types.StructField(k, dt)
    }.toSeq)
    val norm = org.apache.spark.sql.Row.fromSeq(key.values.map {
      case i: Int => i.toLong
      case other  => other
    }.toSeq)
    getFeatureVectors(spark.createDataFrame(
      java.util.List.of(norm), schema))
  }
}

/** Feature logging: append served vectors (± predictions) to a lake-backed
  * log table; read back with time filters
  * (reference core/feature_view_engine.py:971-1107, core/feature_logging.py).
  */
object FeatureVectorServer {
  /** One serving-key descriptor (serving_key.py:26-47): which column a
    * caller passes (or which is derived), from which group, under which
    * join prefix, and which left-side column feeds it (`joinOn`).
    */
  final case class ServingKey(
      featureName: String,
      featureGroup: String,
      required: Boolean,
      prefix: String = "",
      joinIndex: Int = 0,
      joinOn: Seq[String] = Nil)
}

object FeatureLogging {
  import graft.sources.Lake

  def log(spark: SparkSession, root: String, fg: FeatureGroup,
          vectors: DataFrame,
          logTimeMillis: Option[Long] = None): Lake.CommitMeta = {
    val stamped = vectors.withColumn("_log_time",
      lit(logTimeMillis.getOrElse(System.currentTimeMillis())))
    if (Lake.listCommits(spark, root).isEmpty)
      Lake.create(spark, root, fg, stamped)
    else Lake.upsert(spark, root, fg, stamped)
  }

  def read(spark: SparkSession, root: String, fg: FeatureGroup,
           startMillis: Option[Long] = None,
           endMillis: Option[Long] = None): DataFrame = {
    val df = Lake.snapshot(spark, root, fg, None)
    val lower = startMillis.map(col("_log_time") >= _).getOrElse(lit(true))
    val upper = endMillis.map(col("_log_time") < _).getOrElse(lit(true))
    df.filter(lower && upper)
  }
}
