package graft.tools

import org.apache.spark.sql.functions._

/** Two-phase metastore persistence probe, run in SEPARATE JVMs by
  * MetastoreSpec (Derby allows one JVM per database, which makes the
  * fork also the honest restart):
  *
  *  - `write <msDir> <sfDir>`: hive-catalog session pinned to `msDir`,
  *    saves a managed table + an external table, prints counts.
  *  - `read <msDir>`: a FRESH PROCESS against the same `msDir` — the
  *    tables must come back from the catalog alone (no registration
  *    code in this phase), proving the metadata survived the restart.
  */
object MetastoreCheck {
  def main(args: Array[String]): Unit = args match {
    case Array("write", msDir, sfDir) =>
      val spark = graft.SparkSessions.local("4", "graft-ms-write", Some(msDir))
      val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      graft.catalog.Metastore.saveManaged(
        nation.withColumn("src", lit("managed")), "graft_ms_nation")
      // an external table's location must be a DIRECTORY hive can stat —
      // stage the (read-only, single-file) source into one
      val extDir = s"$msDir/ext_region"
      spark.read.parquet(s"$sfDir/region.parquet")
        .write.mode("overwrite").parquet(extDir)
      graft.catalog.Metastore.saveExternal(spark, "graft_ms_region", extDir)
      println(s"GRAFT_MS_WRITE managed=" +
        spark.table("graft_ms_nation").count() +
        " external=" + spark.table("graft_ms_region").count())
      spark.stop()
    case Array("read", msDir) =>
      val spark = graft.SparkSessions.local("4", "graft-ms-read", Some(msDir))
      val tables = graft.catalog.Metastore.listTables(spark).sorted
      val m = spark.table("graft_ms_nation")
      val joined = m.join(spark.table("graft_ms_region"),
        m("n_regionkey") === col("r_regionkey"))
      println(s"GRAFT_MS_READ tables=${tables.mkString(",")} " +
        s"managed=${m.count()} joined=${joined.count()} " +
        s"src=${m.select("src").distinct().collect().map(_.getString(0)).mkString}")
      spark.stop()
    case _ => sys.error("usage: MetastoreCheck write <msDir> <sfDir> | read <msDir>")
  }
}
