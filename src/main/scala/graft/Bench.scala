package graft

import scala.jdk.CollectionConverters._

/** Benchmark main: one JSON line of per-query wall times at the sf dir
  * given by SPARK_GRAFT_SF_DIR.
  *
  * Round-3 lesson: running 52 queries x 3 reps in ONE JVM accumulates
  * heap/GC/codegen-cache state — alphabetically-late queries reported up
  * to 13x their isolated cost, with zero code changes to their plans. The
  * harness now forks ONE CHILD JVM PER QUERY (same classpath and JVM
  * flags as this process — build.sbt sets `run / fork := true`, so both
  * are real), keeps min-of-N inside the child after a fixed warmup, and
  * emits every per-run time in the output so residual contamination is
  * visible instead of silently skewing the totals. If a fork fails (no
  * usable java/classpath), the query falls back to an in-process run in
  * a freshly restarted SparkSession.
  */
object Bench {
  private val Reps = 3
  private val Marker = "GRAFT_BENCH_TIMES"
  private val ChildTimeoutSec = 600L

  def main(args: Array[String]): Unit = args match {
    case Array("one", name) => childMain(name)
    case _ => orchestrate()
  }

  private def sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private def cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  /** Warmup + min-of-N measurement for one query in the given session. */
  private def measure(spark: org.apache.spark.sql.SparkSession,
                      name: String): Seq[Double] = {
    // JVM/codegen + parquet-reader warmup so the first measured run isn't
    // charged for session startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    val fn = SparkEntry.queries(name)
    (1 to Reps).map { _ =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }
  }

  /** Child mode: measure a single query in this fresh JVM and print one
    * marker line (stdout also carries Spark logs — the parent greps).
    */
  private def childMain(name: String): Unit = {
    val spark = SparkSessions.local(cpus, s"graft-bench-$name")
    val times = measure(spark, name)
    println(s"$Marker $name ${times.mkString(" ")}")
    spark.stop()
    sys.exit(0)
  }

  /** Fork `java ... graft.Bench one <name>` with this JVM's own flags and
    * classpath; returns the per-run times, or None if the child failed.
    */
  private def forkOne(name: String): Option[Seq[Double]] = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    if (!new java.io.File(javaBin).canExecute) return None
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench", "one", name)
    val pb = new ProcessBuilder(cmd.asJava).redirectErrorStream(true)
    val proc = pb.start()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // consume stdout on a separate thread so a chatty child can't fill the
    // pipe and deadlock against waitFor
    val reader = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var l = br.readLine()
      while (l != null) { lines.add(l); l = br.readLine() }
    })
    reader.setDaemon(true)
    reader.start()
    val done = proc.waitFor(ChildTimeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { proc.destroyForcibly(); proc.waitFor() }
    reader.join(5000)
    lines.asScala.find(_.startsWith(s"$Marker $name ")).map { l =>
      l.stripPrefix(s"$Marker $name ").trim.split("\\s+").toSeq.map(_.toDouble)
    }
  }

  /** In-process fallback: restart the SparkSession (new SparkContext) and
    * measure here. Weaker isolation than a fresh JVM, but never silently
    * skipped.
    */
  private def inProcess(name: String): Seq[Double] = {
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(_.stop())
    System.gc()
    val spark = SparkSessions.local(cpus, s"graft-bench-$name")
    try measure(spark, name) finally spark.stop()
  }

  private def orchestrate(): Unit = {
    // optional filter for targeted probes: SPARK_GRAFT_BENCH_ONLY=q46,q49
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(f => f.exists(n.startsWith)))
    val results = names.map { name =>
      System.err.println(s"[bench] $name ...")
      val times = forkOne(name).getOrElse(inProcess(name))
      System.err.println(s"[bench] $name -> ${times.mkString(" ")}")
      name -> times
    }
    val minima = results.map { case (k, ts) => k -> ts.min }
    val qs = minima.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = if (minima.nonEmpty) minima.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"isolation":"jvm-per-query","reps":$Reps}""")
  }
}
