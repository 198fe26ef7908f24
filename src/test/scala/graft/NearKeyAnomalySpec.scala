package graft

import graft.ops.{Dedup, Similarity, Statistics, TemporalFeatures}
import org.apache.spark.sql.functions._

/** Round-11 batch 6: near-key pairs, kNN label agreement, rolling
  * z-score anomalies, Benford deviation — hand-computed values.
  */
class NearKeyAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("nearKeyPairs: adjacent-bucket pairs found at exactly delta, " +
    "partitions isolate, beyond-delta excluded") {
    // delta = 10. keys 9 and 19 sit in buckets 0 and 1, diff exactly 10
    // → found via the b/b+1 probe. 9 vs 20 (diff 11) excluded. The 'v'
    // partition has its own pair; 'w' key 9 never pairs across.
    val df = Seq(("v", 1L, 9L), ("v", 2L, 19L), ("v", 3L, 20L),
      ("v", 4L, 31L), ("w", 5L, 9L))
      .toDF("p", "id", "k")
    val out = Dedup.nearKeyPairs(df, "id", col("k"), delta = 10L,
        partitionCols = Seq("p"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(5))
      .toMap
    // pairs: (1,2) diff 10; (2,3) diff 1; (3,4) diff 11 → OUT
    assert(out == Map(("v", 1L, 2L) -> 10L, ("v", 2L, 3L) -> 1L))
  }

  test("nearKeyPairs: same-bucket duplication collapses to one row") {
    val df = Seq(("x", 1L, 100L), ("x", 2L, 101L)).toDF("p", "id", "k")
    val rows = Dedup.nearKeyPairs(df, "id", col("k"), delta = 50L,
      partitionCols = Seq("p")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("key_a") == 100L &&
      rows.head.getAs[Long]("key_b") == 101L)
  }

  test("nearKeyPairs: key_a/key_b align to id_a/id_b, not sorted keys") {
    // the SMALLER id carries the LARGER key: id 1 has key 150, id 2 has
    // key 140 — key_a must be 150 (id 1's key), key_b 140
    val df = Seq(("x", 1L, 150L), ("x", 2L, 140L)).toDF("p", "id", "k")
    val rows = Dedup.nearKeyPairs(df, "id", col("k"), delta = 50L,
      partitionCols = Seq("p")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("id_a") == 1L &&
      rows.head.getAs[Long]("id_b") == 2L)
    assert(rows.head.getAs[Long]("key_a") == 150L &&
      rows.head.getAs[Long]("key_b") == 140L)
    assert(rows.head.getAs[Long]("diff") == 10L)
  }

  test("labelAgreement: disagreement fraction over the k neighbours") {
    // 1-d embeddings on a line; query 10 at 0.0 with label 0. Its 4
    // nearest by L2 are 11(0.1,lab 0), 12(0.2,lab 1), 13(0.3,lab 1),
    // 14(0.4,lab 1) → n_same 1, n_diff 3, score 0.75.
    val corpus = Seq((10L, Array(0.0f), 0), (11L, Array(0.1f), 0),
      (12L, Array(0.2f), 1), (13L, Array(0.3f), 1), (14L, Array(0.4f), 1),
      (15L, Array(9.9f), 0))
      .toDF("id", "vec", "lab")
    val q = corpus.filter($"id" === 10L)
      .select($"id".as("qid"), $"vec".as("qv"), $"lab".as("qlab"))
    val out = Similarity.labelAgreement(corpus, "id", "vec", "lab",
        q, "qid", "qv", "qlab", k = 4,
        metric = graft.functions.VectorFunctions.L2)
      .collect().head
    assert(out.getAs[Long]("n_neighbors") == 4L)
    assert(out.getAs[Long]("n_same") == 1L)
    assert(out.getAs[Long]("n_diff") == 3L)
    assert(out.getAs[Double]("noise_score") == 0.75)
  }

  test("labelAgreement: NULL neighbour labels count as disagreement " +
    "(plain equality, matching SQL CASE semantics)") {
    // query 10 (label 0); 4 nearest: 11 (label 0), 12 (NULL), 13 (NULL),
    // 14 (label 1) → n_same 1, n_diff 3 — a NULL label can't vouch
    val corpus = Seq((10L, Array(0.0f), Some(0)), (11L, Array(0.1f), Some(0)),
      (12L, Array(0.2f), None), (13L, Array(0.3f), None),
      (14L, Array(0.4f), Some(1)), (15L, Array(9.9f), Some(0)))
      .toDF("id", "vec", "lab")
    val q = corpus.filter($"id" === 10L)
      .select($"id".as("qid"), $"vec".as("qv"), $"lab".as("qlab"))
    val out = Similarity.labelAgreement(corpus, "id", "vec", "lab",
        q, "qid", "qv", "qlab", k = 4,
        metric = graft.functions.VectorFunctions.L2)
      .collect().head
    assert(out.getAs[Long]("n_same") == 1L)
    assert(out.getAs[Long]("n_diff") == 3L)
  }

  test("rollingAnomaly: null verdicts until the frame fills, spike " +
    "flags, steady rows don't") {
    // key 'a': ten 100s (baseline), then 200 (spike), then 100.
    // rows 1..10 have <10 priors → NULL; row 11 (x=200): S=1000,
    // Q=100000, (10·200−1000)² = 1e6 > 9·(10·100000−1e6) = 0 → flag.
    // row 12 (x=100): frame has the 200 → variance > 0, dev small.
    val rows = (1 to 10).map(i => ("a", i.toLong, 100L)) ++
      Seq(("a", 11L, 200L), ("a", 12L, 100L))
    val df = rows.toDF("k", "t", "x")
    val out = TemporalFeatures.rollingAnomaly(df, Seq("k"),
        Seq(col("t")), col("x"), window = 10, z = 3)
      .orderBy("_o0")
      .collect().map(r =>
        if (r.isNullAt(r.fieldIndex("anomaly"))) None
        else Some(r.getBoolean(r.fieldIndex("anomaly"))))
    assert(out.take(10).forall(_.isEmpty), "first 10 rows: no verdict")
    assert(out(10).contains(true), "spike flagged")
    assert(out(11).contains(false), "return to baseline not flagged")
  }

  test("benfordDeviation: digits from the decimal string, dense grid, " +
    "non-positives excluded") {
    // key 'u': values 1, 19, 2, 25, 300, 0, -7 → digits 1,1,2,2,3
    // (0 and -7 excluded). n = 5.
    val df = Seq(("u", 1L), ("u", 19L), ("u", 2L), ("u", 25L),
      ("u", 300L), ("u", 0L), ("u", -7L)).toDF("k", "v")
    val out = Statistics.benfordDeviation(df, Seq("k"), col("v"))
      .collect().map(r => r.getInt(1) -> r).toMap
    assert(out.size == 9, "dense 1..9 grid")
    assert(out(1).getAs[Long]("n_obs") == 2L)
    assert(out(2).getAs[Long]("n_obs") == 2L)
    assert(out(3).getAs[Long]("n_obs") == 1L)
    assert(out(9).getAs[Long]("n_obs") == 0L)
    assert(out(1).getAs[Double]("p_obs") == 0.4)
    assert(out(1).getAs[Double]("p_exp") == 0.30103)
    // χ² term for digit 9: (0 − 5·log10(10/9))² / (5·log10(10/9))
    val e9 = 5.0 * math.log10(10.0 / 9.0)
    val exp9 = BigDecimal(e9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(out(9).getAs[Double]("chi2_term") == exp9.toDouble)
  }
}
