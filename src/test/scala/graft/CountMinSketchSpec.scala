package graft

import graft.ops.CountMinSketch
import org.apache.spark.sql.functions._

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  private val Depth = 3
  private val Width = 64

  test("estimates are one-sided: est >= true count for every item") {
    val items = (1 to 500).map(i => s"item${i % 40}").toDF("x")
    val sketch = CountMinSketch.build(items, $"x", Depth, Width)
    val truth = items.groupBy("x").agg(count(lit(1)).as("t"))
    val est = CountMinSketch.estimate(sketch, truth, $"x", Depth, Width)
      .collect()
    assert(est.length === 40)
    est.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("t"),
        s"undercount for ${r.getAs[String]("x")}")
    }
    // with 40 items in a 3x64 grid most estimates should be exact —
    // the sketch is useful, not just bounded. This is the regression
    // gate for row independence: a suffixed row salt (linear-polynomial
    // constant offset) collides identically in every row and lands
    // ~24/40 here; independent bit-sliced rows land well above
    val exact = est.count(r => r.getAs[Long]("cms_est") === r.getAs[Long]("t"))
    assert(exact >= 30, s"only $exact/40 exact")
  }

  test("sketch is bounded and mergeable: sketch(A ++ B) == merge") {
    val a = (1 to 300).map(i => s"k${i % 25}").toDF("x")
    val b = (1 to 200).map(i => s"k${i % 10}").toDF("x")
    val whole = CountMinSketch.build(a.union(b), $"x", Depth, Width)
    val merged = CountMinSketch.merge(Seq(
      CountMinSketch.build(a, $"x", Depth, Width),
      CountMinSketch.build(b, $"x", Depth, Width)))
    assert(whole.count() <= Depth.toLong * Width)
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
  }

  test("null items are excluded; unseen probes estimate 0 or collide up") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("x")
    val sketch = CountMinSketch.build(df, $"x", Depth, Width)
    // null contributed nothing: total mass = 3 per row
    val mass = sketch.groupBy("cms_row").agg(sum("cms_count").as("m"))
      .collect()
    assert(mass.forall(_.getAs[Long]("m") === 3L))
    val unseen = CountMinSketch
      .estimate(sketch, Seq("zzz").toDF("x"), $"x", Depth, Width)
      .collect().head.getAs[Long]("cms_est")
    assert(unseen >= 0L && unseen <= 2L) // 0 unless all 3 cells collide
  }

  test("estimate joins the sketch broadcast — probes are never shuffled wide") {
    val items = (1 to 100).map(i => s"v$i").toDF("x")
    val sketch = CountMinSketch.build(items, $"x", Depth, Width)
    val plan = CountMinSketch.estimate(sketch, items.distinct(), $"x",
      Depth, Width).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
