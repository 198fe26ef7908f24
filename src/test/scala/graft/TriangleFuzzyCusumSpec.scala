package graft

import graft.ops.{Dedup, GraphOps, Similarity, TemporalFeatures}
import org.apache.spark.sql.functions._

/** Round-11 batch 4: triangle counts, Levenshtein-blocked fuzzy pairs,
  * CUSUM closed form, multi-relevant MAP/P/R eval — each against
  * hand-computed values.
  */
class TriangleFuzzyCusumSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts: K4 minus one edge, parallel/reversed/self edges " +
    "collapse") {
    // nodes 1..4, K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    // Feed duplicates, reversals, and a self-loop — all must collapse.
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 2L), (2L, 4L), (2L, 2L))
      .toDF("s", "d")
    val out = GraphOps.triangleCounts(e, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("triangleCounts: zero rows for triangle-free graphs, nodes kept") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d") // a path
    val out = GraphOps.triangleCounts(e, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("editDistancePairs: substitution, deletion, exact dup found; " +
    "distance-2 pair excluded") {
    // 18 chars: still ≥ 2·prefixLen after the deletion variant's 17
    val base = "abcdefghijklmnopqr"
    val rows = Seq(
      1L -> base,
      2L -> base.updated(11, 'Z'),            // sub in the suffix half
      3L -> (base.take(2) + base.drop(3)),    // deletion in the prefix half
      4L -> base,                             // exact duplicate of 1
      5L -> base.updated(1, 'X').updated(12, 'Y') // distance 2 — out
    ).toDF("id", "s")
    val out = Dedup.editDistancePairs(rows, "id", "s", prefixLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (1L, 4L) -> 0L,
      (2L, 4L) -> 1L, (3L, 4L) -> 1L))
  }

  test("editDistancePairs: rejects strings shorter than 2·prefixLen " +
    "(the pigeonhole guarantee's floor)") {
    val rows = Seq(1L -> "short", 2L -> "short").toDF("id", "s")
    val e = intercept[Exception] {
      Dedup.editDistancePairs(rows, "id", "s", prefixLen = 8).collect()
    }
    assert(e.getMessage.contains("at least 16"))
  }

  test("cusum: closed prefix form equals the textbook recursion") {
    // deviations: +5, -3, -9, +4, +6, -2 → S by recursion:
    // 5, 2, 0, 4, 10, 8
    val df = Seq((1L, 1L, 5L), (1L, 2L, -3L), (1L, 3L, -9L),
      (1L, 4L, 4L), (1L, 5L, 6L), (1L, 6L, -2L))
      .toDF("k", "t", "d")
    val out = TemporalFeatures.cusum(df, Seq("k"), Seq(col("t")),
        col("d"), threshold = 8L)
      .orderBy("_o0")
      .collect().map(r => (r.getAs[Long]("cusum"), r.getAs[Boolean]("alarm")))
    assert(out.toSeq == Seq((5L, false), (2L, false), (0L, false),
      (4L, false), (10L, true), (8L, true)))
  }

  test("cusum: keys are independent (one user's drift can't alarm " +
    "another)") {
    val df = Seq((1L, 1L, 100L), (2L, 2L, -100L), (2L, 3L, 5L))
      .toDF("k", "t", "d")
    val out = TemporalFeatures.cusum(df, Seq("k"), Seq(col("t")),
        col("d"), threshold = 50L)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("cusum")))
      .toSet
    assert(out == Set((1L, 100L), (2L, 0L), (2L, 5L)))
  }

  test("precisionRecallEval: hand-computed AP/P/R, zero-qrels query " +
    "surfaces with NULL metrics") {
    // run for q1: docs 10,20,30,40 at ranks 1..4; rel = {10, 30, 99}
    // hits at ranks 1 and 3 → AP@4 = (1/1 + 2/3) / min(3,4) = 5/9
    // q2 has a run but NO qrels row.
    val run = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3), (1L, 40L, 4),
      (2L, 10L, 1)).toDF("qid", "doc", "rank")
    val qrels = Seq((1L, 10L), (1L, 30L), (1L, 99L)).toDF("qid", "doc")
    val out = Similarity.precisionRecallEval(run, "qid", "doc", "rank",
        qrels, "qid", "doc", k = 4)
      .collect().map(r => r.getAs[Long]("qid") -> r).toMap
    val q1 = out(1L)
    assert(q1.getAs[Long]("rel_n") == 3L && q1.getAs[Long]("n_hits") == 2L)
    assert(q1.getAs[Double]("p_at_k") == 0.5)
    assert(q1.getAs[Double]("r_at_k") == 0.666667)
    assert(q1.getAs[Double]("ap_at_k") == 0.555556) // 5/9 rounded
    val q2 = out(2L)
    assert(q2.getAs[Long]("rel_n") == 0L && q2.getAs[Long]("n_hits") == 0L)
    assert(q2.isNullAt(q2.fieldIndex("p_at_k")))
    assert(q2.isNullAt(q2.fieldIndex("ap_at_k")))
  }
}
