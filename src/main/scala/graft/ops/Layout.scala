package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of several
  * bounded integer columns into one sort key whose prefix tiles are
  * multi-dimensional rectangles. Sorting/range-partitioning files by the
  * z-value gives every file a narrow min/max envelope on EVERY
  * participating column at once, so a scan filtered on any of them can
  * skip most files from parquet footer stats alone — the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` idea (both implementations are public), which the
  * reference's Hudi/Delta write path leaves to table services.
  *
  * The interleave is plain Column shift/mask algebra — `bits × k` codegen
  * terms, no UDF, no custom expression — and therefore exactly replayable
  * in external SQL, which is what lets the layout be value-oracled.
  *
  * Scale shape: [[zValue]] is row-local (zero shuffle). [[clusterByZ]]
  * adds exactly one range exchange (the same one any layout rewrite
  * pays) + an in-partition sort; sampling for the range boundaries is
  * Spark's standard range partitioner. At 100 TB this runs as the
  * maintenance job that rewrites a table region, not on the query path.
  */
object Layout {

  /** Morton interleave of `cols` at `bits` bits each. Column j's bit i
    * lands at output position `i * k + (k - 1 - j)` — column 0 owns the
    * most significant bit of each group, so ties sort by the first
    * column, matching the (x, y) → y-within-x intuition.
    *
    * Inputs MUST already be normalized to `[0, 2^bits)` (rank, bucket,
    * or clamp upstream — [[bucketize]] helps); out-of-range bits are
    * masked off rather than corrupting neighbors.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(bits > 0 && bits * cols.size <= 62,
      s"bits * columns must fit a long, got $bits * ${cols.size}")
    val k = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * k + (k - 1 - j))
    terms.reduce(_ bitwiseOR _)
  }

  /** Clamp-bucketize a numeric column into `[0, 2^bits)` with a fixed
    * [lo, hi) grid — the normalization step before [[zValue]] for
    * continuous domains (fixed grid, not quantiles, so it replays in
    * SQL and never needs a data pass).
    */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, "bucketize needs hi > lo")
    val cells = (1L << bits).toDouble
    least(greatest(
      floor((c.cast("double") - lit(lo)) / lit((hi - lo) / cells)), lit(0.0)),
      lit(cells - 1.0)).cast("long")
  }

  /** Rewrite `df` into `numPartitions` z-clustered partitions: one range
    * exchange on the z-value + an in-partition sort, the layout a
    * `write.parquet` after this call persists one file per partition
    * with tight per-file min/max on every z-input column.
    */
  def clusterByZ(df: DataFrame, cols: Seq[Column], bits: Int,
                 numPartitions: Int,
                 zCol: String = "_z"): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    df.withColumn(zCol, zValue(cols, bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
  }
}
