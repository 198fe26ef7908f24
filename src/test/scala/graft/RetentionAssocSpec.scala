package graft

import graft.ops.{Associations, Statistics, TemporalFeatures}
import org.apache.spark.sql.functions._

/** Round-11 batch 5: retention cohorts, Gini concentration, CUPED
  * adjustment, association rules — hand-computed values.
  */
class RetentionAssocSpec extends SparkSpec {
  import spark.implicits._

  test("retentionCohorts: first-active bucket defines the cohort, " +
    "period 0 is complete, repeats collapse") {
    // users 1,2 start day 10; user 3 starts day 11.
    // day 11 actives: 1 (twice — collapses), 3; day 12: 2, 3.
    val df = Seq((1L, 10L), (2L, 10L), (3L, 11L), (1L, 11L), (1L, 11L),
      (2L, 12L), (3L, 12L)).toDF("u", "d")
    val out = TemporalFeatures.retentionCohorts(df, col("u"), col("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out == Map(
      (10L, 0L) -> (2L, 2L, 1.0),   // cohort 10: both active day 10
      (10L, 1L) -> (2L, 1L, 0.5),   // only user 1 on day 11
      (10L, 2L) -> (2L, 1L, 0.5),   // only user 2 on day 12
      (11L, 0L) -> (1L, 1L, 1.0),   // cohort 11: user 3
      (11L, 1L) -> (1L, 1L, 1.0)))
  }

  test("giniConcentration: uniform mass → 0, total concentration → " +
    "(n−1)/n, zero total → NULL") {
    val df = Seq(("u", 5L), ("u", 5L), ("u", 5L), ("u", 5L),
      ("c", 0L), ("c", 0L), ("c", 0L), ("c", 12L),
      ("z", 0L), ("z", 0L)).toDF("k", "x")
    val out = Statistics.giniConcentration(df, Seq("k"), col("x"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out("u") == 0.0)
    assert(out("c") == 0.75) // one holder of everything, n=4 → 3/4
    assert(out("z") == null)
  }

  test("cupedAdjust: a covariate that fully explains the metric " +
    "equalizes adjusted means (θ = slope)") {
    // y = 2x exactly; arm A drew high x, arm B low x. CUPED must
    // attribute the whole gap to the covariate: θ = 2, both adjusted
    // means equal the pooled mean of y.
    val df = Seq(("A", 10L), ("A", 12L), ("B", 2L), ("B", 4L))
      .map { case (a, x) => (a, 2 * x, x) }.toDF("arm", "y", "x")
    val out = Statistics.cupedAdjust(df, col("arm"), col("y"), col("x"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("A")._3 == 2.0 && out("B")._3 == 2.0)
    assert(out("A")._1 == 22.0 && out("B")._1 == 6.0) // raw means differ
    assert(out("A")._2 == 14.0 && out("B")._2 == 14.0) // adjusted equal
  }

  test("pairRules: hand-counted support/confidence/lift, repeats " +
    "collapse, hub guard trips") {
    // baskets: b1 {p,q}, b2 {p,q,r}, b3 {p} (q repeated in b1 — one
    // membership). N=3, n_p=3, n_q=2, n_r=1, n_pq=2, n_pr=1, n_qr=1.
    val df = Seq(("b1", "p"), ("b1", "q"), ("b1", "q"), ("b2", "p"),
      ("b2", "q"), ("b2", "r"), ("b3", "p")).toDF("bk", "it")
    val out = Associations.pairRules(df, col("bk"), col("it"))
      .collect().map(r => (r.getString(1), r.getString(0)) -> r).toMap
    // columns: item_b, item_a order per select — use names instead
    val pq = out.values.find(r => r.getAs[String]("item_a") == "p" &&
      r.getAs[String]("item_b") == "q").get
    assert(pq.getAs[Long]("n_ab") == 2L)
    assert(pq.getAs[Double]("support") == 0.666667)
    assert(pq.getAs[Double]("conf_a_to_b") == 0.666667) // 2/3
    assert(pq.getAs[Double]("conf_b_to_a") == 1.0)      // 2/2
    assert(pq.getAs[Double]("lift") == 1.0)             // 2·3/(3·2)
    assert(out.size == 3)
    val e = intercept[Exception] {
      Associations.pairRules(df, col("bk"), col("it"),
        maxBasketItems = 2).collect()
    }
    assert(e.getMessage.contains("distinct items"))
  }
}
