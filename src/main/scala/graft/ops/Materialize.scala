package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** One house-wide policy for "materialize this frame once, it is
  * scanned more than once / its lineage must be truncated".
  *
  * The engine's default is `localCheckpoint`: one eager materialization
  * whose blocks free on GC — no CacheManager entries piling up across
  * invocations in a long-lived session, and the plan above an iterative
  * loop stays O(1). The trade-off (r12 ADVICE): localCheckpoint blocks
  * are UNREPLICATED and the lineage is gone, so on a multi-executor
  * cluster a lost executor fails the job instead of recomputing. That
  * is acceptable for single-process local runs (this sandbox, notebook
  * exploration) but not for production cluster jobs — so the strategy
  * is a session conf, not a hard-coded call:
  *
  *   - `spark.graft.materialize.mode = local` (default): EAGER/LAZY
  *     `localCheckpoint` — fastest, single-process posture.
  *   - `= reliable`: `checkpoint` to `spark.checkpoint.dir` (HDFS/S3) —
  *     survives executor loss; the cluster-deployment setting.
  *   - `= cache`: `persist(MEMORY_AND_DISK)` — keeps lineage (lost
  *     blocks recompute), at the cost of CacheManager bookkeeping and
  *     no plan truncation for iterative loops.
  *
  * Iterative operators (connected components, PageRank) additionally
  * REQUIRE plan truncation to stay O(1)-plan per round; under `cache`
  * they still work (Spark recomputes a growing plan on block loss) but
  * `local`/`reliable` are the intended modes there.
  */
object Materialize {
  val ModeKey = "spark.graft.materialize.mode"

  def pin(df: DataFrame, eager: Boolean = true): DataFrame =
    df.sparkSession.conf.get(ModeKey, "local") match {
      case "local"    => df.localCheckpoint(eager)
      case "reliable" => df.checkpoint(eager)
      case "cache" =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        if (eager) p.foreach(_ => ()) // materialize without a count plan
        p
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be local|reliable|cache, got '$other'")
    }

  /** Enrichment so call sites read like the Dataset API:
    * `frame.pinned()` / `frame.pinned(eager = false)`.
    */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pinned(eager: Boolean = true): DataFrame = pin(df, eager)
  }
}
