package graft

import graft.catalog.FeatureStore
import graft.sources.Lake
import java.nio.file.Files

class LakeSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): FeatureStore =
    new FeatureStore(spark,
      warehouseDir = Files.createTempDirectory("graft_lake").toString)

  test("create / upsert / delete with precombine last-writer-wins") {
    val fs = freshStore()
    val v1 = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "v", "pc")
    val fg = fs.createFeatureGroup("t1", v1, primaryKey = Seq("id"),
      precombineKey = Some("pc"))

    // upsert: id=1 updated, id=3 inserted
    val m2 = fs.insert(fg, Seq((1L, "a2", 20L), (3L, "c", 5L)).toDF("id", "v", "pc"))
    assert(m2.rowsInserted === 1 && m2.rowsUpdated === 1 && m2.rowsDeleted === 0)

    val snap = fs.read(graft.ir.Query.selectAll(fg))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(snap.toSeq === Seq((1L, "a2"), (2L, "b"), (3L, "c")))

    // delete id=2
    val m3 = fs.delete(fg, Seq(Tuple1(2L)).toDF("id"))
    assert(m3.rowsDeleted === 1)
    assert(fs.read(graft.ir.Query.selectAll(fg)).count() === 2)
  }

  test("precombine resolves same-commit duplicates") {
    val fs = freshStore()
    val dup = Seq((1L, "low", 1L), (1L, "high", 9L)).toDF("id", "v", "pc")
    val fg = fs.createFeatureGroup("t2", dup, primaryKey = Seq("id"),
      precombineKey = Some("pc"))
    val rows = fs.read(graft.ir.Query.selectAll(fg)).collect()
    assert(rows.length === 1 && rows.head.getAs[String]("v") === "high")
  }

  test("time travel: as_of and incremental read_changes") {
    val fs = freshStore()
    val fg = fs.createFeatureGroup("t3",
      Seq((1L, "v1")).toDF("id", "v"), primaryKey = Seq("id"))
    val root = fg.source.asInstanceOf[graft.model.LakeSource].root
    val t1 = Lake.listCommits(spark, root).head
    fs.insert(fg, Seq((1L, "v2"), (2L, "w1")).toDF("id", "v"))
    val t2 = Lake.listCommits(spark, root).last

    // as-of first commit sees only v1
    val asOf1 = Lake.snapshot(spark, root, fg, Some(t1))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(asOf1.toSeq === Seq((1L, "v1")))

    // incremental (t1, t2] sees the changed rows at their new state
    val inc = Lake.readChanges(spark, root, fg, t1, t2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(inc.toSeq === Seq((1L, "v2"), (2L, "w1")))

    // commit metadata log
    val cd = Lake.commitDetails(spark, root).orderBy("commitTime").collect()
    assert(cd.length === 2)
  }

  test("partition keys shape the layout and prune at read time") {
    val fs = freshStore()
    val df = Seq((1L, "BUILDING", 1.0), (2L, "AUTO", 2.0), (3L, "BUILDING", 3.0))
      .toDF("id", "seg", "x")
    val fg = fs.createFeatureGroup("t5", df, primaryKey = Seq("id"),
      partitionKey = Seq("seg"))
    val root = fg.source.asInstanceOf[graft.model.LakeSource].root
    // physical layout: seg=... directories under each commit
    val commitDir = new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.startsWith("_commit_time=")).head
    assert(commitDir.listFiles().exists(_.getName.startsWith("seg=")))
    // declared schema (names, order, types) survives the partition round trip
    val snap = graft.sources.Lake.snapshot(spark, root, fg, None)
    assert(snap.columns.toSeq === Seq("id", "seg", "x"))
    assert(snap.schema("seg").dataType ===
      org.apache.spark.sql.types.StringType)
    // a filter on the partition key prunes partitions in the plan
    val planned = snap.filter($"seg" === "AUTO")
    val expl = planned.queryExecution.executedPlan.toString
    assert(snap.filter($"seg" === "AUTO").count() === 1)
  }

  test("schema evolution: appended column with default, old rows readable") {
    val fs = freshStore()
    val fg = fs.createFeatureGroup("tev",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), primaryKey = Seq("id"))
    val root = fg.source.asInstanceOf[graft.model.LakeSource].root
    val fg2 = fg.copy(features = fg.features :+ graft.model.Feature(
      "score", org.apache.spark.sql.types.DoubleType,
      defaultValue = Some(0.5)))
    // batch WITHOUT the appended column: write-path alignment fills default
    Lake.upsert(spark, root, fg2, Seq((3L, "c")).toDF("id", "v"))
    // batch WITH the column
    Lake.upsert(spark, root, fg2,
      Seq((4L, "d", 9.0)).toDF("id", "v", "score"))
    val snap = Lake.snapshot(spark, root, fg2, None).orderBy("id")
    // the appended column must not be dropped (mergeSchema read)
    assert(snap.columns.toSeq === Seq("id", "v", "score"))
    val rows = snap.collect()
    assert(rows.length === 4)
    // rows predating the column read back its declared DEFAULT (the
    // merged-schema scan surfaces them as null; the aligned read fills) —
    // the appendFeatures contract (feature_group.py:853)
    assert(rows(0).getDouble(2) === 0.5 && rows(1).getDouble(2) === 0.5)
    assert(rows(2).getDouble(2) === 0.5) // default filled at write time
    assert(rows(3).getDouble(2) === 9.0)
  }

  test("commit retention bounds the timeline; pre-horizon reads fail fast") {
    val fs = freshStore()
    val fg = fs.createFeatureGroup("tret",
      Seq((1L, "v1")).toDF("id", "v"), primaryKey = Seq("id"))
    val root = fg.source.asInstanceOf[graft.model.LakeSource].root
    fs.insert(fg, Seq((1L, "v2")).toDF("id", "v"))
    fs.insert(fg, Seq((2L, "w1")).toDF("id", "v"))
    fs.insert(fg, Seq((1L, "v3")).toDF("id", "v"))
    val before = Lake.listCommits(spark, root)
    assert(before.length === 4)

    val retained = Lake.cleanCommits(spark, root, fg, keepLast = 2)
    // oldest two commits squashed into a base at before(1)
    assert(retained === before.drop(1))
    assert(Lake.commitHorizon(spark, root) === Some(before(1)))

    // latest state unchanged by retention
    val snap = Lake.snapshot(spark, root, fg, None).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(snap.toSeq === Seq((1L, "v3"), (2L, "w1")))

    // as-of AT the horizon resolves from the squashed base
    val atH = Lake.snapshot(spark, root, fg, Some(before(1)))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(atH.toSeq === Seq((1L, "v2")))

    // time travel BEFORE the horizon errors clearly
    val e = intercept[IllegalArgumentException] {
      Lake.snapshot(spark, root, fg, Some(before.head)).collect()
    }
    assert(e.getMessage.contains("horizon"))
    intercept[IllegalArgumentException] {
      Lake.readChanges(spark, root, fg, before.head, before.last).collect()
    }

    // nothing further to clean → unchanged
    assert(Lake.cleanCommits(spark, root, fg, 5) === retained)
  }

  test("crashed cleanCommits: reads fail fast; re-run replays the clean") {
    import org.apache.spark.sql.functions.lit
    val fs = freshStore()
    val fg = fs.createFeatureGroup("tcrash",
      Seq((1L, "v1")).toDF("id", "v"), primaryKey = Seq("id"))
    val root = fg.source.asInstanceOf[graft.model.LakeSource].root
    fs.insert(fg, Seq((1L, "v2")).toDF("id", "v"))
    fs.insert(fg, Seq((2L, "w1")).toDF("id", "v"))
    fs.insert(fg, Seq((1L, "v3")).toDF("id", "v"))
    val commits = Lake.listCommits(spark, root)
    val baseT = commits(1)

    // simulate a crash immediately PAST the commit point: squashed base in
    // clean_tmp + horizon marker down, archived partitions not yet deleted
    Lake.snapshot(spark, root, fg, Some(baseT))
      .withColumn("_commit_time", lit(baseT))
      .withColumn("_deleted", lit(false))
      .write.mode("overwrite").parquet(s"$root/clean_tmp")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_commit_horizon"),
      baseT.toString.getBytes)

    // reads refuse to serve the intermediate state
    val e = intercept[IllegalStateException] {
      Lake.snapshot(spark, root, fg, None)
    }
    assert(e.getMessage.contains("interrupted cleanCommits"))
    intercept[IllegalStateException] {
      Lake.readChanges(spark, root, fg, commits(1), commits.last)
    }

    // re-running cleanCommits recovers, then completes the retention
    val retained = Lake.cleanCommits(spark, root, fg, keepLast = 2)
    assert(retained === commits.drop(1))
    val snap = Lake.snapshot(spark, root, fg, None).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(snap.toSeq === Seq((1L, "v3"), (2L, "w1")))
    val atH = Lake.snapshot(spark, root, fg, Some(baseT))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(atH.toSeq === Seq((1L, "v2")))
  }

  test("crashed cleanCommits BEFORE its marker: orphan tmp is discarded") {
    import org.apache.spark.sql.functions.lit
    val fs = freshStore()
    val fg = fs.createFeatureGroup("tcrash2",
      Seq((1L, "v1")).toDF("id", "v"), primaryKey = Seq("id"))
    val root = fg.source.asInstanceOf[graft.model.LakeSource].root
    fs.insert(fg, Seq((2L, "w1")).toDF("id", "v"))
    val commits = Lake.listCommits(spark, root)
    // tmp written but NO horizon marker → the run aborted pre-commit-point
    Lake.snapshot(spark, root, fg, Some(commits.head))
      .withColumn("_commit_time", lit(commits.head))
      .withColumn("_deleted", lit(false))
      .write.mode("overwrite").parquet(s"$root/clean_tmp")
    intercept[IllegalStateException] { Lake.snapshot(spark, root, fg, None) }
    // nothing to retain (keepLast covers all): recovery just drops the tmp
    assert(Lake.cleanCommits(spark, root, fg, keepLast = 5) === commits)
    assert(!new java.io.File(s"$root/clean_tmp").exists)
    assert(Lake.snapshot(spark, root, fg, None).count() === 2)
  }

  test("compaction preserves the snapshot") {
    val fs = freshStore()
    val fg = fs.createFeatureGroup("t4",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), primaryKey = Seq("id"))
    fs.insert(fg, Seq((1L, "a2")).toDF("id", "v"))
    val root = fg.source.asInstanceOf[graft.model.LakeSource].root
    val before = fs.read(graft.ir.Query.selectAll(fg))
      .orderBy("id").collect().toSeq
    Lake.compact(spark, root, fg)
    val after = fs.read(graft.ir.Query.selectAll(fg))
      .orderBy("id").collect().toSeq
    assert(before === after)
    assert(Lake.listCommits(spark, root).size === 1)
  }
}
