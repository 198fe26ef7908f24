package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: a `depth × width` grid of counters answering
  * "roughly how many times did item x occur" in bounded memory with a
  * one-sided error — estimates never undercount, and overcount by more
  * than `2N/width` with probability at most `(1/2)^depth` (Cormode &
  * Muthukrishnan 2005). The feature-store use is streaming/rolling
  * heavy-hitter monitoring where exact per-item counts would be
  * data-sized state; the reference's statistics engine
  * (python/hsfs/core/statistics_engine.py) has only exact counts.
  *
  * Row hashes: the rows slice DISJOINT bit fields of one 52-bit char
  * polynomial — row r reads bits `[r·log2(width), (r+1)·log2(width))`.
  * Appending the row index to the hashed string does NOT work: the
  * polynomial is linear, so suffixed row salts differ by a constant and
  * items that collide in one row collide in every row (caught by the
  * exactness spec). Bit-slicing makes a row-0 collision say nothing
  * about row 1, and stays exactly replayable in SQL as
  * `(h >> r·b) & (width−1)`. Capacity: `depth · log2(width) ≤ 52`.
  *
  * Scale shape:
  * - [[build]] is one row-local explode(depth) + one map-side-combined
  *   groupBy to a ≤ `depth × width`-row frame — the ONLY data-sized pass;
  * - sketches are MERGEABLE ([[merge]] = union + sum): build one per
  *   partition/day/batch, fold to any window, never rescan history —
  *   same contract as `IncrementalStats`;
  * - [[estimate]] touches only the probe set: explode(depth) + a
  *   broadcast join against the tiny sketch + a min-fold.
  */
object CountMinSketch {

  private def log2Exact(w: Int): Int = {
    require(w > 1 && (w & (w - 1)) == 0, s"width must be a power of two, got $w")
    java.lang.Integer.numberOfTrailingZeros(w)
  }

  private def checkGeometry(depth: Int, width: Int): Int = {
    val bits = log2Exact(width)
    require(depth > 0 && depth * bits <= 52,
      s"depth * log2(width) must fit the 52-bit hash, got $depth * $bits")
    bits
  }

  /** `(cms_row, cms_cell)` pairs of `item` as an array column — one
    * 52-bit poly-hash of `item ⊕ "|salt"`, rows reading disjoint bit
    * slices. Null items yield a null array (excluded by explode).
    */
  def cells(item: Column, depth: Int, width: Int, salt: String): Column = {
    val bits = checkGeometry(depth, width)
    val h = graft.functions.TextHash.charPolyHash(
      concat(item.cast("string"), lit("|" + salt)))
    array((0 until depth).map { r =>
      struct(lit(r).as("cms_row"),
        shiftright(h, r * bits).bitwiseAND(lit((width - 1).toLong))
          .cast("int").as("cms_cell"))
    }: _*)
  }

  /** One sketch over `df`: `(cms_row, cms_cell, cms_count)`, at most
    * `depth × width` rows. Null items are excluded (a null has no
    * identity to count).
    */
  def build(df: DataFrame, item: Column, depth: Int, width: Int,
            salt: String = "cms"): DataFrame =
    df.filter(item.isNotNull)
      .select(explode(cells(item, depth, width, salt)).as("_rc"))
      .select(col("_rc.cms_row").as("cms_row"),
        col("_rc.cms_cell").as("cms_cell"))
      .groupBy("cms_row", "cms_cell")
      .agg(count(lit(1)).as("cms_count"))

  /** Fold sketches built with the SAME (depth, width, salt) into one —
    * counter-wise sum, the property that makes per-batch sketches
    * composable into any window without rescanning.
    */
  def merge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("cms_row", "cms_cell")
      .agg(sum("cms_count").as("cms_count"))
  }

  /** Point estimates for a probe frame: `probes` + a `cms_est` column =
    * min over rows of the probed cell's counter (0 when the cell is
    * untouched). `probes` should be distinct items; only the probe set
    * and the tiny sketch are touched.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, item: Column,
               depth: Int, width: Int, salt: String = "cms"): DataFrame = {
    val probeCols = probes.columns.toSeq
    probes
      .select((probeCols.map(col) :+
        explode(cells(item, depth, width, salt)).as("_rc")): _*)
      .select((probeCols.map(col) :+
        col("_rc.cms_row").as("cms_row")) :+
        col("_rc.cms_cell").as("cms_cell"): _*)
      .join(broadcast(sketch), Seq("cms_row", "cms_cell"), "left")
      .groupBy(probeCols.map(col): _*)
      .agg(min(coalesce(col("cms_count"), lit(0L))).as("cms_est"))
  }
}
