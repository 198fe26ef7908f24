package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of the q67 statistics lifecycle —
  * the suite's heaviest query. Run on demand:
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.Q67Profile`
  * (fresh JVM; prints one line per stage, two full passes so the
  * second pass shows the JIT-warm cost the bench min measures).
  */
object Q67Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.SparkSessions.local(cpus, "graft-q67-profile")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"Q67PROF $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    for (pass <- 1 to 2) {
      println(s"Q67PROF -- pass $pass --")
      val wh = java.nio.file.Files.createTempDirectory("graft_q67p").toString
      val fs = new graft.catalog.FeatureStore(spark, warehouseDir = wh)
      val orders = spark.read
        .parquet(graft.catalog.TestTables.parquet(dir, "orders"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val cfg = graft.model.StatisticsConfig(exactUniqueness = true,
        correlations = true, columns = Seq("o_custkey", "o_totalprice"))
      val full = t("create_fg_full")(fs.createFeatureGroup("orders_stats",
        orders, primaryKey = Seq("o_orderkey"), statisticsConfig = cfg))
      val open = t("create_fg_open")(fs.createFeatureGroup(
        "open_orders_stats", orders.filter(col("o_orderstatus") === "O"),
        primaryKey = Seq("o_orderkey"), statisticsConfig = cfg))
      t("compute_stats_full")(fs.computeStatistics(full, atMillis = 1000L))
      t("compute_stats_open")(fs.computeStatistics(open, atMillis = 2000L))
      val fs2 = t("restart_store")(
        new graft.catalog.FeatureStore(spark, warehouseDir = wh))
      val a = t("get_stats_full")(fs2.getStatistics(
        fs2.getFeatureGroup("orders_stats"), computationTime = Some(1500L)))
      val b = t("get_stats_open")(fs2.getStatistics(
        fs2.getFeatureGroup("open_orders_stats")))
      t("final_union_action") {
        a.withColumn("group_name", lit("orders_stats"))
          .unionByName(b.withColumn("group_name", lit("open_orders_stats")))
          .select("group_name", "computed_at", "feature", "metric", "value")
          .orderBy("group_name", "feature", "metric")
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
