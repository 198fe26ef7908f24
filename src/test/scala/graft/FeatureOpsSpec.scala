package graft

import graft.ops.{Monitoring, Splits, Statistics, TemporalFeatures}
import org.apache.spark.sql.functions._

/** Round-9 feature-engineering operators: purged CV, mutual information,
  * EWMA, activity pivot, calibration bins.
  */
class FeatureOpsSpec extends SparkSpec {
  import spark.implicits._

  test("purged folds: k labels per row, embargo keeps train out of the gap") {
    // 100 rows at t = 0..99 ms, 4 folds (25 ms cells), 10 ms embargo
    val df = spark.range(100).select($"id", $"id".as("t"))
    val folded = Splits.purgedTimeFolds(df, "t", k = 4, embargoMillis = 10L)
    assert(folded.count() === 400, "one labeled copy per (row, fold)")
    val roles = folded.groupBy("cv_fold", "cv_role").count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    // fold 1 = [25, 50): 25 test, 10 purged either side, 55 train
    assert(roles((1, "test")) === 25L)
    assert(roles((1, "purged")) === 20L)
    assert(roles((1, "train")) === 55L)
    // edge fold 0 = [0, 25): embargo below is empty
    assert(roles((0, "test")) === 25L)
    assert(roles((0, "purged")) === 10L)
    // THE leakage property: no train row within embargo of its fold
    val bad = folded.filter($"cv_role" === "train")
      .filter($"cv_fold" === 1 && $"t" >= 15 && $"t" < 60)
    assert(bad.count() === 0, "train rows inside the embargo zone")
  }

  test("mutual information: 0 for independence, ln 2 for identity") {
    val indep = Seq(("a", 0), ("a", 1), ("b", 0), ("b", 1)).toDF("x", "y")
    val mi0 = Statistics.mutualInformation(indep, "x", "y")
      .collect().head.getAs[Double]("mi_nats")
    assert(mi0 === 0.0)
    val ident = Seq(("a", 0), ("a", 0), ("b", 1), ("b", 1)).toDF("x", "y")
    val r = Statistics.mutualInformation(ident, "x", "y").collect().head
    assert(math.abs(r.getAs[Double]("mi_nats") - math.log(2)) < 1e-6)
    assert(r.getAs[Long]("n_cells") === 2L && r.getAs[Long]("n_rows") === 4L)
  }

  test("ewma: hand-computed fold, bounded window, per-key isolation") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0),
      (2L, 1L, 10.0)).toDF("k", "t", "v")
    def run(window: Int) = TemporalFeatures
      .ewmaTrailing(df, Seq("k"), Seq($"t"), $"v", alpha = 0.5,
        window = window)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("ewma")).toMap
    val full = run(10)
    assert(full((1L, 1L)) === 1.0)
    assert(full((1L, 2L)) === 1.5)   // .5*2 + .5*1
    assert(full((1L, 3L)) === 2.25)  // .5*3 + .5*1.5
    assert(full((2L, 1L)) === 10.0)  // other key untouched
    val bounded = run(2)
    assert(bounded((1L, 3L)) === 2.5) // frame [2,3]: .5*3 + .5*2
  }

  test("activity pivot: explicit domain, zero-filled counts, null totals") {
    val df = Seq((1L, "click", 2.0), (1L, "click", 3.0), (2L, "view", 1.0))
      .toDF("u", "et", "v")
    val out = TemporalFeatures.activityPivot(df, Seq("u"), "et",
      Seq("click", "view"), $"v").orderBy("u").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("click_n") === 2L &&
      r1.getAs[Double]("click_total") === 5.0)
    assert(r1.getAs[Long]("view_n") === 0L, "absent type counts 0")
    assert(r1.isNullAt(r1.fieldIndex("view_total")),
      "absent type total stays null")
  }

  test("calibration bins: clamping, exact counts, observed rates") {
    val df = Seq((-0.1, 1), (0.05, 0), (0.05, 1), (0.97, 1), (1.3, 0))
      .toDF("score", "y")
    val out = Monitoring.calibrationBins(df, $"score", $"y", bins = 10)
      .orderBy("bin").collect()
    val byBin = out.map(r => r.getInt(0) ->
      (r.getLong(1), r.getAs[Double]("pos_rate"))).toMap
    assert(byBin(0)._1 === 3L, "-0.1 clamps into bin 0")
    assert(byBin(9)._1 === 2L, "1.3 clamps into bin 9")
    assert(byBin(0)._2 === 0.666667) // 2 of 3 positive, rounded at 6
    assert(byBin(9)._2 === 0.5)
  }
}
