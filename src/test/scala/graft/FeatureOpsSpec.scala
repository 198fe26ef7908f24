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

  test("auc: perfect=1, all-tied=0.5, hand case with ties, degenerate drop") {
    import graft.ops.Statistics.aucByKey
    // key "perf": positives strictly above negatives → AUC 1
    // key "tied": every score equal → AUC 0.5 by average-rank ties
    // key "mix" : scores [.1-, .4+, .4-, .9+] → pairs: (.4+ vs .1-)=1,
    //   (.4+ vs .4-)=.5, (.9+ vs both -)=2 → U=3.5 of 4 → AUC .875
    // key "degen": all positive → excluded
    val df = Seq(
      ("perf", 0.9, 1), ("perf", 0.8, 1), ("perf", 0.2, 0),
      ("tied", 0.5, 1), ("tied", 0.5, 0), ("tied", 0.5, 1), ("tied", 0.5, 0),
      ("mix", 0.1, 0), ("mix", 0.4, 1), ("mix", 0.4, 0), ("mix", 0.9, 1),
      ("degen", 0.7, 1), ("degen", 0.3, 1)
    ).toDF("k", "s", "y")
    val got = aucByKey(df, Seq("k"), $"s", $"y").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("auc")).toMap
    assert(got === Map("perf" -> 1.0, "tied" -> 0.5, "mix" -> 0.875))
    // sanity vs a brute-force pair count on real-ish data
    val ev = spark.range(500).select(
      lit("g").as("k"),
      (pmod($"id" * 2654435761L, lit(1000)) / 1000.0).as("s"),
      (pmod($"id" * 40503L, lit(100)) < 30).cast("int").as("y"))
    val auc = aucByKey(ev, Seq("k"), $"s", $"y")
      .collect().head.getAs[Double]("auc")
    val rows = ev.collect().map(r => (r.getDouble(1), r.getInt(2)))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val u = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val brute = u / (pos.length.toLong * neg.length)
    assert(math.abs(auc - brute) < 1e-6, s"$auc vs $brute")
  }

  test("spearman: ±1 for monotone, tie-corrected brute-force parity") {
    import graft.ops.Statistics.spearmanByKey
    // monotone up (any monotone map → 1), monotone down → −1
    val mono = Seq(
      ("up", 1.0, 10.0), ("up", 2.0, 100.0), ("up", 3.0, 101.0),
      ("dn", 1.0, 9.0), ("dn", 2.0, 5.0), ("dn", 3.0, 1.0)
    ).toDF("k", "x", "y")
    val got = spearmanByKey(mono, Seq("k"), "x", "y").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("spearman")).toMap
    assert(got === Map("up" -> 1.0, "dn" -> -1.0))
    // ties: brute-force average-rank Spearman on a pseudo-random set
    val n = 200
    val rows = (0 until n).map { i =>
      ("g", (i * 2654435761L % 40).toDouble, (i * 40503L % 30).toDouble)
    }
    val df = rows.toDF("k", "x", "y")
    val auc = spearmanByKey(df, Seq("k"), "x", "y")
      .collect().head.getAs[Double]("spearman")
    def avgRanks(vs: Seq[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexOf(v) + 1
        val hi = sorted.lastIndexOf(v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    val rx = avgRanks(rows.map(_._2)); val ry = avgRanks(rows.map(_._3))
    val xs = rows.map(r => rx(r._2)); val ys = rows.map(r => ry(r._3))
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum)
    val sy = math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
    assert(math.abs(auc - cov / (sx * sy)) < 1e-6)
  }

  test("funnel: ordering constraint, same-instant, truncated stages") {
    import graft.ops.Funnel
    val ev = Seq(
      ("A", "view", 1L), ("A", "click", 2L), ("A", "purchase", 3L),
      ("B", "click", 1L), ("B", "view", 2L), ("B", "click", 5L),
      ("C", "purchase", 9L),                  // never stage 1 → absent
      ("D", "view", 4L), ("D", "purchase", 3L), // purchase BEFORE view
      ("E", "view", 7L), ("E", "click", 7L)   // same instant counts
    ).toDF("u", "et", "t")
    val st = Funnel.stageTimes(ev, "u", $"et", "t",
      Seq("view", "click", "purchase"))
    val rows = st.collect().map(r => r.getString(0) ->
      (r.get(1), r.get(2), r.get(3))).toMap
    assert(rows.keySet === Set("A", "B", "D", "E"))
    assert(rows("A") === (1L, 2L, 3L))
    assert(rows("B") === (2L, 5L, null), "pre-view click rejected")
    assert(rows("D") === (4L, null, null), "no later stages after a miss")
    assert(rows("E") === (7L, 7L, null), "t >= prev is inclusive")
    val sum = Funnel.summary(st, "u", 3).collect().head
    assert(sum.getAs[Long]("stage1_n") === 4L)
    assert(sum.getAs[Long]("stage2_n") === 3L)
    assert(sum.getAs[Long]("stage3_n") === 1L)
    assert(sum.getAs[Double]("stage2_rate") === 0.75)
  }

  test("freshness: ages against a fixed now, SLA boundary is strict") {
    val df = Seq(("a", 900L), ("a", 1000L), ("b", 400L)).toDF("k", "t")
    val out = Monitoring.freshness(df, Seq("k"), "t",
      nowMillis = 1500L, slaMillis = 500L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("latest_ms"), r.getAs[Long]("age_ms"),
          r.getAs[Boolean]("sla_violated"))).toMap
    assert(out("a") === ((1000L, 500L, false)), "age == sla is NOT violated")
    assert(out("b") === ((400L, 1100L, true)))
  }

  test("key skew profile: exact scalars and deterministic top keys") {
    import graft.ops.Statistics.keySkewProfile
    // key 7 planted hot: 60 of 100 rows
    val df = spark.range(100).select(
      when($"id" < 60, 7L).otherwise($"id").as("k"))
    val r = keySkewProfile(df, Seq("k"), topK = 3).collect().head
    assert(r.getAs[Long]("total_rows") === 100L)
    assert(r.getAs[Long]("n_keys") === 41L)
    assert(r.getAs[Long]("max_key_rows") === 60L)
    assert(r.getAs[Double]("hot_share") === 0.6)
    // imbalance = 60 / (100/41)
    assert(r.getAs[Double]("imbalance") === 24.6)
    val top = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("top_keys"))
    assert(top.head.getAs[Long]("k") === 7L &&
      top.head.getAs[Long]("rows") === 60L)
    assert(top.size === 3)
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

  test("cohen kappa: textbook 0.4 case, perfect = 1, null raters drop") {
    import graft.ops.Statistics.cohenKappa
    // confusion (A,A)=40 (A,B)=10 (B,A)=20 (B,B)=30: p_o=.7,
    // p_e=.5·.6+.5·.4=.5 → κ=.4 (the standard worked example)
    val rows = Seq.fill(40)(("A", "A")) ++ Seq.fill(10)(("A", "B")) ++
      Seq.fill(20)(("B", "A")) ++ Seq.fill(30)(("B", "B"))
    val r = cohenKappa(rows.toDF("a", "b"), "a", "b").collect().head
    assert(r.getAs[Double]("kappa") === 0.4)
    assert(r.getAs[Double]("p_observed") === 0.7)
    assert(r.getAs[Double]("p_expected") === 0.5)
    assert(r.getAs[Long]("n") === 100L)
    // identical raters → κ = 1 regardless of marginals
    val same = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    assert(cohenKappa(same, "a", "b").collect().head
      .getAs[Double]("kappa") === 1.0)
    // a null from either rater drops the row; the surviving single
    // agreeing cell has p_e = 1, where kappa is undefined → null
    val withNulls = Seq((Some("x"), Some("x")), (None, Some("x")),
      (Some("y"), None)).toDF("a", "b")
    val deg = cohenKappa(withNulls, "a", "b").collect().head
    assert(deg.getAs[Long]("n") === 1L)
    assert(deg.isNullAt(deg.fieldIndex("kappa")))
  }

  test("audience overlap: hand-computed jaccards, no set self-join") {
    import graft.ops.Statistics.audienceOverlap
    // click = {1,2}, view = {1,3}, purchase = {3}
    val ev = Seq((1L, "click"), (1L, "view"), (2L, "click"),
      (3L, "view"), (3L, "purchase"), (1L, "click") /* dup ignored */)
      .toDF("u", "t")
    val out = audienceOverlap(ev, "u", "t",
      Seq("click", "view", "purchase")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_both"), r.getAs[Double]("jaccard"))).toMap
    assert(out(("click", "view")) === ((2L, 2L, 1L, 0.333333)))
    assert(out(("click", "purchase")) === ((2L, 1L, 0L, 0.0)))
    assert(out(("view", "purchase")) === ((2L, 1L, 1L, 0.5)))
    assert(out.size === 3)
  }

  test("ECE: 0 for a perfectly calibrated scorer, weighted gap otherwise") {
    // bin 2 (score .25): 4 rows, 1 positive → |0.25 − 0.25| = 0
    // bin 7 (score .75): 4 rows, 3 positive → |0.75 − 0.75| = 0
    val perfect = Seq.fill(3)((0.25, 0)) ++ Seq((0.25, 1)) ++
      Seq.fill(3)((0.75, 1)) ++ Seq((0.75, 0))
    val e0 = Monitoring.expectedCalibrationError(
      perfect.toDF("score", "y"), $"score", $"y", bins = 10)
      .collect().head
    assert(e0.getAs[Double]("ece") === 0.0)
    assert(e0.getAs[Long]("n_rows") === 8L && e0.getAs[Long]("n_bins") === 2L)
    // overconfident: score .9 but only half win → ece = |0.9 − 0.5| = 0.4
    val over = Seq((0.9, 1), (0.9, 0)).toDF("score", "y")
    val e1 = Monitoring.expectedCalibrationError(over, $"score", $"y", 10)
      .collect().head.getAs[Double]("ece")
    assert(e1 === 0.4)
  }
}
