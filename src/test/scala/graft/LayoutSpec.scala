package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits with column 0 as the high bit of each pair") {
    // x = 0b11, y = 0b01, 2 bits: x0→pos1, x1→pos3, y0→pos0, y1→pos2
    // → 0b1011 = 11
    val out = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y"), 2).as("z"))
      .collect().head.getLong(0)
    assert(out === 11L)
    // identity cases: (0,0) → 0; (2^b-1, 2^b-1) → 2^(2b)-1
    val corners = Seq((0L, 0L), (255L, 255L)).toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y"), 8).as("z"))
      .collect().map(_.getLong(0))
    assert(corners.toSeq === Seq(0L, 65535L))
  }

  test("out-of-range bits are masked, not smeared into neighbors") {
    // x = 4 = 0b100 exceeds 2 bits → masked to 0; y = 1 → z = 1
    val out = Seq((4L, 1L)).toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y"), 2).as("z"))
      .collect().head.getLong(0)
    assert(out === 1L)
  }

  test("z-prefix tiles are rectangles: tile bounds tight on BOTH dims") {
    // full 16x16 grid at 4 bits; 16 tiles of 16 cells each (top 4 bits)
    // — every tile must be a 4x4 rectangle
    val grid = spark.range(256).select(
      (col("id") / 16).cast("long").as("x"),
      pmod(col("id"), lit(16)).as("y"))
    val tiles = grid
      .withColumn("z", Layout.zValue(Seq($"x", $"y"), 4))
      .groupBy((col("z") / 16).cast("long").as("tile"))
      .agg(max($"x") - min($"x"), max($"y") - min($"y"), count(lit(1)))
      .collect()
    assert(tiles.length === 16)
    tiles.foreach { r =>
      assert(r.getLong(1) === 3L && r.getLong(2) === 3L && r.getLong(3) === 16L,
        s"tile ${r.getLong(0)} is not a 4x4 rectangle")
    }
  }

  test("clusterByZ: one range exchange; partitions see narrow x AND y") {
    val n = 4096
    val grid = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(64)).as("x"),
      pmod(col("id") * 40503L, lit(64)).as("y"))
    val clustered = Layout.clusterByZ(grid, Seq($"x", $"y"), 6,
      numPartitions = 16)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected a range exchange:\n$plan")
    // per-partition envelopes: with z-clustering each of 16 partitions
    // covers ~1/16 of the 2-D grid, so its x/y spans must be well below
    // the global 0..63 span — the file-skipping property
    val spans = clustered
      .groupBy(spark_partition_id().as("p"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .collect()
    assert(spans.length === 16)
    val avgSx = spans.map(_.getAs[Long]("sx")).sum.toDouble / spans.length
    val avgSy = spans.map(_.getAs[Long]("sy")).sum.toDouble / spans.length
    assert(avgSx < 40 && avgSy < 40,
      s"z-clustered partitions should be local: avg x span $avgSx, y span $avgSy")
    // a plain x-sort would leave y spans at the full range (~63) — the
    // z layout must beat that decisively on the SECOND dimension too
    assert(avgSy < 50)
  }
}
