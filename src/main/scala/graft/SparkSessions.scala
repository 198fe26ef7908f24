package graft

import org.apache.spark.sql.SparkSession

/** Canonical local session factory: one place for the engine's session
  * tuning so Verify / Bench / tools cannot drift.
  *
  * Settings rationale (100 TB posture, tested on local[N]):
  *  - shuffle partitions = cores locally; on a cluster size to data volume
  *    and let AQE coalesce (`spark.sql.adaptive.enabled` on → runtime
  *    re-planning, skew-join splitting, partition coalescing).
  *  - UTC session timezone — event-time parity with the reference
  *    (engine/spark.py:133) and with the DuckDB oracle (TIMESTAMP_NTZ
  *    columns are interpreted in the session zone by
  *    `TimeFunctions.eventTimeToMicros`).
  *  - `nanosAsLong` — kept for testdata generations whose events table
  *    stores TIMESTAMP(NANOS) (unsupported natively by Spark 4 parquet
  *    reads; read as Long nanos). The current generation writes
  *    timestamp[us] — a no-op for it; queries dispatch on the resolved
  *    type either way.
  */
object SparkSessions {

  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // map-side session merge before the stateful shuffle: at scale the
      // session_window operator otherwise shuffles one row per EVENT
      // instead of one per partial session
      .config("spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
