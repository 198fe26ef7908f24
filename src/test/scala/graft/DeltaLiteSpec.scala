package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.sources.DeltaLite
import org.apache.spark.sql.functions._

/** Protocol-level Delta tables: on-disk layout asserted against the
  * published PROTOCOL.md shapes (commit naming, action fields, schema
  * as schemaString), then snapshot / time-travel / overwrite /
  * incremental-read semantics.
  */
class DeltaLiteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_delta").toString + "/tbl"

  test("log layout matches the published protocol shapes") {
    val t = tmp()
    DeltaLite.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1), t)
    val log = new java.io.File(s"$t/_delta_log")
    // ignore Hadoop LocalFileSystem's .crc sidecars
    val commits = log.listFiles().map(_.getName)
      .filter(_.endsWith(".json")).sorted
    assert(commits.head == "00000000000000000000.json",
      s"zero-padded %020d naming required, got ${commits.head}")
    val lines = scala.io.Source.fromFile(
      s"$t/_delta_log/${commits.head}").getLines().toList
    val m = new ObjectMapper()
    val byKey = lines.map(m.readTree).groupBy(_.fieldNames().next())
    assert(byKey.keySet == Set("protocol", "metaData", "add"))
    val p = byKey("protocol").head.get("protocol")
    assert(p.get("minReaderVersion").asInt == 1 &&
      p.get("minWriterVersion").asInt == 2)
    val md = byKey("metaData").head.get("metaData")
    assert(md.get("format").get("provider").asText == "parquet")
    // schemaString is Spark's own schema JSON — parse it back
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(md.get("schemaString").asText)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq == Seq("id", "v"))
    val add = byKey("add").head.get("add")
    assert(add.get("path").asText.endsWith(".parquet") &&
      !add.get("path").asText.startsWith("/"),
      "add.path must be table-root-relative")
    assert(add.get("dataChange").asBoolean && add.get("size").asLong > 0)
    assert(add.has("partitionValues"))
  }

  test("snapshot, time travel, overwrite, and empty-table semantics") {
    val t = tmp()
    DeltaLite.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    DeltaLite.append(Seq((3L, "c")).toDF("id", "v"), t)
    def ids(asOf: Option[Long]) =
      DeltaLite.snapshot(spark, t, asOf).select("id").collect()
        .map(_.getLong(0)).sorted.toSeq
    assert(ids(Some(0L)) == Seq(1L, 2L))
    assert(ids(Some(1L)) == Seq(1L, 2L, 3L))
    DeltaLite.overwrite(Seq((9L, "z")).toDF("id", "v"), t)
    assert(ids(None) == Seq(9L))
    assert(ids(Some(1L)) == Seq(1L, 2L, 3L),
      "time travel must still see the pre-overwrite snapshot")
    // overwrite with an empty frame → empty snapshot with the schema
    DeltaLite.overwrite(Seq.empty[(Long, String)].toDF("id", "v"), t)
    val empty = DeltaLite.snapshot(spark, t)
    assert(empty.count() == 0 &&
      empty.schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("readChanges returns rows added in (from, to] only") {
    val t = tmp()
    DeltaLite.create(Seq((1L, "a")).toDF("id", "v"), t)
    DeltaLite.append(Seq((2L, "b")).toDF("id", "v"), t)
    DeltaLite.append(Seq((3L, "c")).toDF("id", "v"), t)
    val ch = DeltaLite.readChanges(spark, t, 0L, 2L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ch == Seq(2L, 3L))
    assert(DeltaLite.readChanges(spark, t, 2L, 2L).count() == 0)
  }

  test("snapshot plans keep parquet pushdown through the file-list read") {
    val t = tmp()
    DeltaLite.create(spark.range(1000).select(col("id"),
      (col("id") % 7).as("k")), t)
    val snap = DeltaLite.snapshot(spark, t).filter(col("k") === 3)
    val plan = snap.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("k"),
      s"filter must reach the parquet scan:\n$plan")
  }
}
