package graft.tools

/** Phase-timed replica of Bench.childMain's startup so the child-JVM
  * fixed cost can be attributed before trimming it (r13 verdict #3:
  * driver startup_total 2817 s / 202 children — guide §1, measure
  * first). Prints one line per phase with the cumulative wall clock
  * since JVM main() entry, plus the JVM's own pre-main time
  * (RuntimeMXBean start time → main entry).
  *
  * `sbt "runMain graft.tools.StartupProbe"` forks one probe child per
  * rep with the same flags/classpath mechanics as Bench children.
  */
object StartupProbe {
  def main(args: Array[String]): Unit = args match {
    case Array("child") => child()
    case _ => orchestrate()
  }

  private def sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private def cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  private def child(): Unit = {
    val mainEntry = System.nanoTime()
    val jvmStart = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getStartTime // ms epoch
    val preMain = System.currentTimeMillis() - jvmStart
    def mark(label: String): Unit =
      println(f"STARTUP_PROBE $label ${(System.nanoTime() - mainEntry) / 1e9}%.3f")
    println(f"STARTUP_PROBE pre_main ${preMain / 1e3}%.3f")
    val spark = graft.SparkSessions.local(cpus, "graft-startup-probe")
    mark("session_built")
    spark.range(1000000).selectExpr("sum(id)").collect()
    mark("range_sum_warm")
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    mark("lineitem_warm")
    spark.stop()
    mark("stopped")
    sys.exit(0)
  }

  private def orchestrate(): Unit = {
    import scala.jdk.CollectionConverters._
    val reps = sys.env.getOrElse("SPARK_GRAFT_STARTUP_REPS", "3").toInt
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    (1 to reps).foreach { i =>
      val extra = sys.env.get("SPARK_GRAFT_STARTUP_EXTRA_FLAGS")
        .map(_.split("\\s+").toSeq).getOrElse(Nil)
      val cmd = Seq(javaBin) ++ jvmArgs ++ extra ++
        Seq("-cp", cp, "graft.tools.StartupProbe", "child")
      val pb = new ProcessBuilder(cmd.asJava).redirectErrorStream(true)
      val proc = pb.start()
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var l = br.readLine()
      while (l != null) {
        if (l.startsWith("STARTUP_PROBE")) println(s"rep$i $l")
        l = br.readLine()
      }
      proc.waitFor()
    }
  }
}
