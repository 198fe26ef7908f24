package graft.sources

import graft.model.FeatureGroup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Commit-logged lakehouse table: the engine's analog of the reference's
  * Hudi/Delta feature-group storage (python/hsfs/core/hudi_engine.py:85-274,
  * core/delta_engine.py:54-204).
  *
  * Layout under `root`:
  * {{{
  *   data/_commit_time=[epochMillis]/part-NNN.parquet  (one partition per commit)
  *   commits/part-NNN.json                             (commit metadata rows)
  * }}}
  *
  * Design notes for scale:
  *  - Each commit is a parquet partition keyed by `_commit_time`, so
  *    time-travel and incremental reads become **partition pruning** — a
  *    100 TB table as-of t scans only commits ≤ t, and an incremental read
  *    scans only the (t0, t1] partitions.
  *  - Writes are append-only (merge-on-read): upsert/delete append rows and
  *    tombstones; the snapshot read resolves the latest version per record
  *    key with one window over the record key — the same shuffle a
  *    MERGE INTO would need, but without rewriting existing files.
  *  - `compact()` rewrites the current snapshot as a single base commit to
  *    bound read amplification, mirroring Hudi compaction.
  *
  * Record identity = primary key + event time (hudi record-key semantics,
  * core/hudi_engine.py:122-145); duplicate versions resolved by
  * (_commit_time desc, precombine desc) — last writer wins, ties broken by
  * the precombine column (core/hudi_engine.py:141-149).
  */
object Lake {

  val CommitCol = "_commit_time"
  val DeletedCol = "_deleted"

  final case class CommitMeta(
      commitTime: Long,
      operation: String,
      rowsInserted: Long,
      rowsUpdated: Long,
      rowsDeleted: Long)

  private def dataPath(root: String) = s"$root/data"
  private def commitsPath(root: String) = s"$root/commits"

  private def recordKey(fg: FeatureGroup): Seq[String] =
    (fg.primaryKey ++ fg.eventTime).distinct

  /** Monotonic commit timestamp (epoch millis), unique per table. */
  private def newCommitTime(spark: SparkSession, root: String): Long = {
    val last = listCommits(spark, root).lastOption.getOrElse(0L)
    math.max(System.currentTimeMillis(), last + 1)
  }

  /** Commit times present in the table, ascending (from the partition
    * layout, not the metadata — data is the source of truth).
    */
  def listCommits(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new java.io.File(dataPath(root))
    if (!dir.isDirectory) Seq.empty
    else
      dir.listFiles().toSeq
        .map(_.getName)
        .collect { case n if n.startsWith(s"$CommitCol=") =>
          n.stripPrefix(s"$CommitCol=").toLong
        }
        .sorted
  }

  /** Append one commit of rows (already stamped with tombstone flag). */
  private def writeCommit(
      spark: SparkSession,
      root: String,
      fg: FeatureGroup,
      rows: DataFrame,
      deleted: Boolean,
      operation: String,
      computeStats: Boolean = true): CommitMeta = {
    val t = newCommitTime(spark, root)
    val stamped = rows
      .withColumn(CommitCol, lit(t))
      .withColumn(DeletedCol, lit(deleted))

    // Classify the commit for metadata parity with Hudi commit stats
    // (core/hudi_engine.py:246-274): ONE action — left join against current
    // snapshot keys, counting total and matched together. `computeStats =
    // false` skips the snapshot scan entirely (high-frequency streaming
    // commits shouldn't rescan the table per micro-batch).
    val keys = recordKey(fg)
    val (ins, upd, del) =
      if (!computeStats) (-1L, -1L, -1L)
      else if (listCommits(spark, root).isEmpty) {
        val n = rows.count()
        if (deleted) (0L, 0L, n) else (n, 0L, 0L)
      } else {
        val current = snapshot(spark, root, fg, None)
          .select(keys.map(col): _*).withColumn("_m", lit(1))
        val r = rows.select(keys.map(col): _*)
          .join(current, keys, "left")
          .agg(count(lit(1)).as("n"), sum(col("_m")).as("m"))
          .collect().head
        val total = r.getLong(0)
        val matched = if (r.isNullAt(1)) 0L else r.getLong(1)
        if (deleted) (0L, 0L, matched) else (total - matched, matched, 0L)
      }

    // physical layout: commit partition first (time travel = pruning),
    // then the feature group's declared partition keys (query-predicate
    // pruning — reference partitionBy(partition_key),
    // engine/spark.py:501-505, hudi partition path hudi_engine.py:131-140)
    val partCols = CommitCol +: fg.partitionKey.filter(stamped.columns.contains)
    stamped.write
      .mode(SaveMode.Append)
      .partitionBy(partCols: _*)
      .parquet(dataPath(root))

    val meta = CommitMeta(t, operation, ins, upd, del)
    import spark.implicits._
    Seq(meta).toDF().coalesce(1).write.mode(SaveMode.Append)
      .json(commitsPath(root))
    meta
  }

  /** First write / bulk insert. */
  def create(spark: SparkSession, root: String, fg: FeatureGroup,
             df: DataFrame): CommitMeta =
    writeCommit(spark, root, fg, df, deleted = false, operation = "bulk_insert")

  /** Upsert: append-new-version semantics; snapshot read resolves the
    * winner (hudi upsert, core/hudi_engine.py:85-169).
    */
  def upsert(spark: SparkSession, root: String, fg: FeatureGroup,
             df: DataFrame, computeStats: Boolean = true): CommitMeta =
    writeCommit(spark, root, fg, df, deleted = false, operation = "upsert",
      computeStats = computeStats)

  /** Delete by key: tombstone append (EmptyHoodieRecordPayload analog,
    * core/hudi_engine.py:94-100).
    */
  def delete(spark: SparkSession, root: String, fg: FeatureGroup,
             keysDf: DataFrame): CommitMeta = {
    // a tombstone row carries the record key; non-key columns null-padded
    val snap = snapshot(spark, root, fg, None)
    val keys = recordKey(fg)
    val full = snap.join(keysDf.select(keys.map(col): _*), keys, "left_semi")
    writeCommit(spark, root, fg, full, deleted = true, operation = "delete")
  }

  /** Latest-state (or as-of) read. `asOf` in epoch millis, inclusive —
    * hudi `as.of.instant` semantics (core/hudi_engine.py:180-192).
    */
  def snapshot(spark: SparkSession, root: String, fg: FeatureGroup,
               asOf: Option[Long]): DataFrame = {
    if (listCommits(spark, root).isEmpty) {
      // schema-only table (e.g. created from an empty frame): no partitions
      // exist yet, so return an empty frame with the declared schema
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), fg.schema)
    }
    val raw0 = spark.read.parquet(dataPath(root))
    val raw = asOf.fold(raw0)(t => raw0.filter(col(CommitCol) <= t))
    restoreTypes(dedupLatest(raw, fg)
      .filter(!col(DeletedCol))
      .drop(CommitCol, DeletedCol), fg)
  }

  /** Partition-column values come back through directory inference with
    * possibly narrowed types (e.g. long → int) and reordered to the end;
    * cast and reorder back to the declared feature-group schema, keeping
    * any undeclared extra columns.
    */
  private def restoreTypes(df: DataFrame, fg: FeatureGroup): DataFrame =
    if (fg.features.isEmpty || fg.partitionKey.isEmpty) df
    else {
      val declared = fg.schema.fields.filter(f => df.columns.contains(f.name))
      val extras = df.columns.filterNot(fg.schema.fieldNames.contains)
      df.select(declared.toIndexedSeq.map(f => col(f.name).cast(f.dataType).as(f.name)) ++
        extras.map(col(_)): _*)
    }

  /** Incremental read: latest state of records changed in (t0, t1]
    * (hudi incremental query, core/hudi_engine.py:193-219).
    */
  def readChanges(spark: SparkSession, root: String, fg: FeatureGroup,
                  exclusiveStart: Long, inclusiveEnd: Long): DataFrame = {
    val raw = spark.read.parquet(dataPath(root))
      .filter(col(CommitCol) > exclusiveStart && col(CommitCol) <= inclusiveEnd)
    restoreTypes(dedupLatest(raw, fg)
      .filter(!col(DeletedCol))
      .drop(CommitCol, DeletedCol), fg)
  }

  /** Resolve one winning row per record key: greatest (_commit_time,
    * precombine). The only shuffle in the read path; partition pruning has
    * already bounded its input.
    */
  private def dedupLatest(df: DataFrame, fg: FeatureGroup): DataFrame = {
    val keys = recordKey(df, fg)
    val ordering =
      col(CommitCol).desc +:
        fg.effectivePrecombine.filter(df.columns.contains)
          .map(col(_).desc).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  private def recordKey(df: DataFrame, fg: FeatureGroup): Seq[String] = {
    val k = recordKey(fg).filter(df.columns.contains)
    if (k.nonEmpty) k else df.columns.filterNot(Seq(CommitCol, DeletedCol).contains).toSeq
  }

  /** Rewrite the current snapshot as a single base commit and drop older
    * partitions — bounds merge-on-read amplification (Hudi compaction
    * analog). Destructive; call between queries only.
    */
  def compact(spark: SparkSession, root: String, fg: FeatureGroup): CommitMeta = {
    val snap = snapshot(spark, root, fg, None).cache()
    val n = snap.count() // force before we delete source files
    val tmp = s"$root/compact_tmp"
    snap.write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = new java.io.File(dataPath(root))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(old)
    val reread = spark.read.parquet(tmp)
    val meta = writeCommit(spark, root, fg, reread, deleted = false,
      operation = "compact")
    snap.unpersist()
    rm(new java.io.File(tmp))
    meta
  }

  /** Commit metadata log (rows inserted/updated/deleted per commit —
    * core/hudi_engine.py:246-274 parity).
    */
  def commitDetails(spark: SparkSession, root: String): DataFrame =
    spark.read.json(commitsPath(root))
}
