package graft

import graft.ops.{Statistics, TemporalFeatures}
import org.apache.spark.sql.functions._

/** Round-11 batch 7: Poisson-bootstrap CI, integer-decay scores,
  * k-anonymity audit — hand-checked contracts.
  */
class BootstrapPrivacySpec extends SparkSpec {
  import spark.implicits._

  test("bootstrapMeanCI: CI brackets the mean on homogeneous data and " +
    "is deterministic across runs") {
    val df = (1 to 400).map(i => ("g", i.toLong, (40 + i % 21).toLong))
      .toDF("k", "id", "x") // values 40..60, mean 50.0xx
    def run() = Statistics.bootstrapMeanCI(df, Seq("k"), col("id"),
      col("x"), replicates = 100, seed = 7L).collect().head
    val a = run()
    assert(a.getAs[Long]("n") == 400L)
    val mean = a.getAs[Double]("mean")
    val lo = a.getAs[Double]("ci_lo"); val hi = a.getAs[Double]("ci_hi")
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket $mean")
    assert(hi - lo < 5.0, "CI on 400 bounded values must be tight")
    val b = run()
    assert(a == b, "hash-derived weights ⇒ bit-identical reruns")
  }

  test("bootstrapMeanCI: replicate-mean order statistics respond to " +
    "outliers (wider CI with a heavy tail)") {
    val tight = (1 to 200).map(i => ("g", i.toLong, 50L))
    val heavy = tight.take(190) ++ (191 to 200).map(i =>
      ("g", i.toLong, 5000L))
    val wT = {
      val r = Statistics.bootstrapMeanCI(tight.toDF("k", "id", "x"),
        Seq("k"), col("id"), col("x")).collect().head
      r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")
    }
    val wH = {
      val r = Statistics.bootstrapMeanCI(heavy.toDF("k", "id", "x"),
        Seq("k"), col("id"), col("x")).collect().head
      r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")
    }
    assert(wT == 0.0, "constant data ⇒ every replicate mean is 50")
    assert(wH > 10.0, "outliers must widen the interval")
  }

  test("decayedScore: one shift per elapsed half-life, PIT guard " +
    "rejects future rows") {
    // asOf 100, half-life 10: age 0→x, 10..19→x/2, 25→x/4
    val df = Seq(("u", 100L, 80L), ("u", 90L, 80L), ("u", 75L, 80L))
      .toDF("k", "day", "x")
    val out = TemporalFeatures.decayedScore(df, Seq("k"), col("day"),
      col("x"), asOfBucket = 100L, halfLifeBuckets = 10).collect().head
    assert(out.getAs[Long]("raw_sum") == 240L)
    assert(out.getAs[Long]("decayed_score") == 80L + 40L + 20L)
    val e = intercept[Exception] {
      TemporalFeatures.decayedScore(
        Seq(("u", 101L, 1L)).toDF("k", "day", "x"), Seq("k"),
        col("day"), col("x"), asOfBucket = 100L,
        halfLifeBuckets = 10).collect()
    }
    assert(e.getMessage.contains("point-in-time"))
  }

  test("kAnonymityAudit: histogram, below-k flags, row share") {
    // groups: (a,1)×6, (a,2)×2, (b,1)×2, (b,2)×1 → sizes 6,2,2,1
    val rows = Seq.fill(6)(("a", 1)) ++ Seq.fill(2)(("a", 2)) ++
      Seq.fill(2)(("b", 1)) ++ Seq(("b", 2))
    val out = Statistics.kAnonymityAudit(rows.toDF("q1", "q2"),
        Seq("q1", "q2"), k = 3L)
      .collect().map(r => r.getAs[Long]("group_size") -> r).toMap
    assert(out(6L).getAs[Long]("n_groups") == 1L &&
      !out(6L).getAs[Boolean]("below_k"))
    assert(out(2L).getAs[Long]("n_groups") == 2L &&
      out(2L).getAs[Boolean]("below_k"))
    assert(out(1L).getAs[Long]("n_groups") == 1L)
    // rows below k = 2·2 + 1 = 5 of 11
    assert(out(6L).getAs[Long]("total_rows") == 11L)
    assert(out(6L).getAs[Double]("share_below_k") == 0.454545)
  }
}
