package graft.tools

/** Cross-PROCESS DeltaLite writer-race probe, forked by DeltaLiteSpec:
  *
  *  - `append <table> <writerId> <n>`: builds its own SparkSession and
  *    issues `n` single-row append commits (ids writerId·1000 + i),
  *    printing one `GRAFT_DL_APPEND writer=<id> versions=<v,...>`
  *    marker with the version every commit landed at.
  *  - `read <table> <n>`: issues `n` latest-snapshot reads while a
  *    writer process races, printing one `GRAFT_DL_READ` marker with,
  *    per read, the id-set size and whether the set was a CONSISTENT
  *    COMMITTED PREFIX (seed ∪ the first k single-writer appends for
  *    some k) — the reader-isolation claim: a concurrent reader sees
  *    some committed version, never a torn half-commit. Data files
  *    land before the commit link publishes, so a mid-commit read must
  *    resolve to the previous version.
  *
  * Two of these children racing on one table prove the hard-link
  * put-if-absent publish ([[graft.sources.DeltaLite.tryPublish]]) is
  * atomic BETWEEN OPERATING-SYSTEM PROCESSES — the claim the in-JVM
  * thread-pool contention spec cannot reach, because a JVM-level lock
  * or shared CAS would pass there while two processes corrupted the
  * log. The protocol's atomicity primitive is the filesystem's
  * `createLink` (EEXIST on collision), which is process-agnostic;
  * this probe is the evidence.
  */
object DeltaLiteCheck {
  def main(args: Array[String]): Unit = args match {
    case Array("append", table, writerId, n) =>
      val spark = graft.SparkSessions.local("4", s"graft-dl-w$writerId")
      import spark.implicits._
      val vs = (1 to n.toInt).map { i =>
        val id = writerId.toLong * 1000L + i
        graft.sources.DeltaLite.append(
          Seq((id, s"w$writerId-$i")).toDF("id", "v"), table)
      }
      println(s"GRAFT_DL_APPEND writer=$writerId versions=${vs.mkString(",")}")
      spark.stop()
      sys.exit(0)
    case Array("read", table, n) =>
      val spark = graft.SparkSessions.local("4", "graft-dl-reader")
      val results = (1 to n.toInt).map { _ =>
        val ids = graft.sources.DeltaLite.snapshot(spark, table)
          .select("id").collect().map(_.getLong(0)).toSet
        val appended = ids - 0L
        val k = appended.size
        val prefixOk = appended == (1 to k).map(i => 1000L + i).toSet
        s"$k:$prefixOk"
      }
      println(s"GRAFT_DL_READ reads=${results.mkString(",")}")
      spark.stop()
      sys.exit(0)
    case _ =>
      sys.error("usage: DeltaLiteCheck append|read <table> ...")
  }
}
