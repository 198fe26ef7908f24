package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.DeltaLite

/** Scale evidence for DeltaLite's protocol checkpoints (VERDICT r9 #1):
  * build a 10³-commit log (log-only synthetic appends — replay never
  * opens data files, so this isolates exactly the cost the checkpoint
  * is meant to bound), cut checkpoints every [[DeltaLite.CheckpointInterval]]
  * commits, then time snapshot-state resolution
  *
  *   (a) WITH checkpoints — newest checkpoint + ≤9-commit JSON tail,
  *   (b) WITHOUT — the same log with checkpoint artifacts stripped,
  *       forcing the full O(commits) JSON replay the pre-r10 code paid.
  *
  * Emits one JSON line (and optionally a file):
  * `{"metric":"delta_checkpoint_replay","commits":N,
  *   "with_checkpoint_sec":…,"full_replay_sec":…,"speedup":…}`
  *
  * Usage: `runMain graft.tools.DeltaCheckpointProbe [commits] [out.json]`
  */
object DeltaCheckpointProbe {
  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = graft.SparkSessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "delta-checkpoint-probe")
    try run(spark, commits, args.lift(1))
    finally spark.stop()
  }

  private def timeMs(reps: Int)(body: => Unit): Double = {
    body // warm
    val t0 = System.nanoTime()
    (1 to reps).foreach(_ => body)
    (System.nanoTime() - t0) / 1e6 / reps
  }

  def run(spark: SparkSession, commits: Int, out: Option[String]): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_delta_probe").toString
    val t = s"$root/tbl"
    DeltaLite.create(Seq((0L, "seed")).toDF("id", "v").coalesce(1), t)
    (1 to commits).foreach { i =>
      DeltaLite.syntheticAppend(t, i.toLong, f"v$i%d/part-$i%05d.parquet",
        1024L)
      if (i % DeltaLite.CheckpointInterval == 0)
        DeltaLite.writeCheckpoint(t, i.toLong)
    }

    val withCp = timeMs(5) {
      val n = DeltaLite.liveFiles(t, None).size
      require(n == commits + 1, s"live files $n != ${commits + 1}")
    }

    // strip every checkpoint artifact → the reader must fall back to
    // the full JSON replay (the exact pre-checkpoint cost curve)
    val bare = s"$root/bare"
    val src = new java.io.File(t)
    def copy(from: java.io.File, to: java.io.File): Unit = {
      if (from.isDirectory) {
        to.mkdirs()
        from.listFiles().foreach(c => copy(c, new java.io.File(to, c.getName)))
      } else java.nio.file.Files.copy(from.toPath, to.toPath)
    }
    copy(src, new java.io.File(bare))
    new java.io.File(s"$bare/_delta_log").listFiles()
      .filter(f => f.getName.contains("checkpoint"))
      .foreach(_.delete())

    val fullReplay = timeMs(5) {
      val n = DeltaLite.liveFiles(bare, None).size
      require(n == commits + 1, s"live files $n != ${commits + 1}")
    }

    val json =
      s"""{"metric":"delta_checkpoint_replay","commits":$commits,""" +
        f""""with_checkpoint_sec":${withCp / 1000}%.4f,""" +
        f""""full_replay_sec":${fullReplay / 1000}%.4f,""" +
        f""""speedup":${fullReplay / withCp}%.1f}"""
    // scalastyle:off println
    println(json)
    // scalastyle:on println
    out.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
  }
}
