package graft

import graft.ops.{Dedup, IncrementalStats, IvfIndex, Monitoring, Splits,
  Transformations}
import org.apache.spark.sql.functions._

/** Round-9 contract fixes: chi-square dof with null categories, the
  * exact/approx quantile agreement on bounded domains, IVF multi-empty
  * reseed distinctness, IncrementalStats' null contract, winsorize's
  * null-row contract, and PIT tie-break determinism under duplicate
  * right timestamps (the q103 oracle-flake risk).
  */
class AdviceFixesSpec extends SparkSpec {
  import spark.implicits._

  test("chiSquareDrift: null category is a real cell and dof counts it") {
    val df = Seq(
      ("g", Option("a"), true), ("g", Option("a"), false),
      ("g", Option("b"), true), ("g", Option("b"), false),
      ("g", None, true), ("g", None, false))
      .toDF("k", "cat", "is_ref")
    val out = Monitoring.chiSquareDrift(df, Seq("k"), col("cat"),
      col("is_ref")).collect().head
    // three cells (a, b, null) → dof = 2; the old countDistinct form
    // reported 1, internally inconsistent with the 3-cell chi2 sum
    assert(out.getAs[Long]("dof") == 2L)
  }

  test("chiSquareDrift: dof unchanged on null-free data") {
    val df = Seq(("g", "a", true), ("g", "b", false), ("g", "c", true))
      .toDF("k", "cat", "is_ref")
    val out = Monitoring.chiSquareDrift(df, Seq("k"), col("cat"),
      col("is_ref")).collect().head
    assert(out.getAs[Long]("dof") == 2L)
  }

  test("approxQuantileByKey agrees with the exact path on a bounded domain") {
    val rows = for (k <- Seq("x", "y"); i <- 1 to 400)
      yield (k, (i % 40).toDouble)
    val df = rows.toDF("k", "v")
    val exact = Splits.lowerQuantileFromCounts(
        df.groupBy(col("k"), col("v").as("_v"))
          .agg(count(lit(1)).as("_c")), Seq("k"), 1, 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = Splits.approxQuantileByKey(df, Seq("k"), col("v"), 1, 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, q) =>
      assert(math.abs(approx(k) - q) <= 1.0,
        s"approx median for $k drifted: exact=$q approx=${approx(k)}")
    }
  }

  test("winsorizeApprox matches exact winsorize on a bounded domain") {
    val rows = for (i <- 1 to 500) yield ("g", i.toLong, (i % 50).toDouble)
    val df = rows.toDF("k", "id", "v")
    val exact = Transformations.winsorize(df, Seq("k"), col("v"), 5, 95, 100)
      .select("id", "value_wins").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val approx = Transformations.winsorizeApprox(df, Seq("k"), col("v"),
        5, 95, 100)
      .select("id", "value_wins").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == approx.keySet, "same rows out of both variants")
    exact.foreach { case (id, v) =>
      assert(math.abs(approx(id) - v) <= 1.0,
        s"row $id: exact=$v approx=${approx(id)}")
    }
  }

  test("winsorize drops null-value rows (the fitted-population contract)") {
    val df = Seq(("g", 1L, Some(5.0)), ("g", 2L, None), ("g", 3L, Some(9.0)))
      .toDF("k", "id", "v")
    val out = Transformations.winsorize(df, Seq("k"), col("v"), 1, 99, 100)
    assert(out.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L)))
  }

  test("localKMeans honors k with distinct centroids when several cells empty") {
    // 3 tight clusters, k=6: at least 3 cells start or go empty in the
    // same Lloyd pass; the reseed must not hand the same worst point to
    // two of them
    val pts = (Seq.fill(20)(Array(0f, 0f)) ++ Seq.fill(20)(Array(10f, 0f)) ++
      Seq.fill(20)(Array(0f, 10f)) ++
      Seq(Array(50f, 50f), Array(-50f, 50f), Array(50f, -50f))).toArray
    val cs = IvfIndex.localKMeans(pts, 6, seed = 7L, maxIter = 20)
    assert(cs.length == 6)
    val distinct = cs.map(_.toSeq).toSet
    assert(distinct.size == 6,
      s"duplicate centroids after reseed: ${cs.map(_.mkString(",")).mkString(" | ")}")
  }

  test("IncrementalStats: nulls filtered before grouping; all-null bucket emits no partial") {
    val df = Seq(
      ("k", 1L, Some(10L)), ("k", 1L, None), ("k", 1L, Some(20L)),
      ("k", 2L, None), ("k", 2L, None))
      .toDF("g", "b", "v")
    val p = IncrementalStats.partials(df, Seq("g"), col("b"), col("v"))
      .collect()
    assert(p.length == 1, "the all-null bucket 2 must emit no partial row")
    val r = p.head
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("sum_v") == 30L)
    val m = IncrementalStats.merge(
      IncrementalStats.partials(df, Seq("g"), col("b"), col("v")),
      Seq("g")).collect().head
    assert(m.getAs[Long]("n") == 2L, "merged n must equal a non-null rescan")
    assert(m.getAs[Long]("n_buckets") == 1L)
  }

  test("PIT tie-break: duplicate right timestamps resolve to max event_id") {
    import graft.ops.PointInTimeJoin
    val spine = Seq((1L, 100L)).toDF("user_id", "ts")
    val right = Seq((1L, 50L, 7L, 1.0), (1L, 50L, 9L, 2.0),
        (1L, 50L, 8L, 3.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = PointInTimeJoin.asOf(spine, "ts", right, "ts",
      Seq("user_id"), Seq("user_id"), prefix = "r_",
      tieBreak = Some("event_id")).collect().head
    assert(out.getAs[Long]("r_event_id") == 9L,
      "largest tie-break value must win the running last()")
  }

  test("duplicateClusters still converges with the lazy checkpoint loop") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 4L), (7L, 7L), (8L, 9L))
      .toDF("idA", "idB")
    val comp = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(4L) == 4L && comp(5L) == 4L)
    assert(comp(8L) == 8L && comp(9L) == 8L)
    assert(!comp.contains(7L), "self-pairs are not duplicate edges")
  }

  test("rankEval surfaces a NULL-rank row for a query whose relevant " +
    "doc is absent from the corpus (r11 advice: no silent drop)") {
    import graft.ops.Similarity
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
        (3L, Array(0.7f, 0.7f)))
      .toDF("id", "vec")
    val queries = Seq(
        (10L, Array(1.0f, 0.1f), 1L),   // relevant id present
        (11L, Array(0.1f, 1.0f), 99L))  // relevant id MISSING
      .toDF("qid", "qvec", "rel")
    val out = Similarity.rankEval(corpus, "id", "vec",
        queries, "qid", "qvec", "rel", k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 2, "both queries must appear in the eval output")
    assert(out(10L).getAs[Long]("rank") == 1L)
    assert(out(11L).isNullAt(out(11L).fieldIndex("rank")),
      "missing relevant doc must yield NULL rank, not a dropped row")
    assert(out(11L).isNullAt(out(11L).fieldIndex("reciprocal_rank")))
  }

  test("tfrecord protobuf skip: a truncated fixed64/fixed32 unknown " +
    "field fails loudly instead of running past the message end") {
    import graft.sources.TfRecordFiles
    // tag for field 99, wire type 1 (fixed64) = (99<<3)|1 = 793 →
    // varint [0x99, 0x06], then only 3 payload bytes (needs 8)
    val truncated64 = Array[Byte](0x99.toByte, 0x06, 1, 2, 3)
    val e1 = intercept[IllegalArgumentException](
      TfRecordFiles.parseExample(truncated64))
    assert(e1.getMessage.contains("fixed64"))
    // tag for field 99, wire type 5 (fixed32) = (99<<3)|5 = 797 →
    // varint [0x9d, 0x06], then only 1 payload byte (needs 4)
    val truncated32 = Array[Byte](0x9d.toByte, 0x06, 1)
    val e2 = intercept[IllegalArgumentException](
      TfRecordFiles.parseExample(truncated32))
    assert(e2.getMessage.contains("fixed32"))
  }
}
