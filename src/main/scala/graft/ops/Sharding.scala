package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sharding for training-data export.
  *
  * LLM training pipelines export a corpus as fixed-token-budget shards in
  * a reproducible pseudo-random order (content-shuffled, stable across
  * re-runs and engines). [[tokenBudgetBins]] assigns each document a bin
  * so consecutive documents in the deterministic order fill ~`budget`
  * tokens per bin — a global ordered prefix sum, computed WITHOUT a
  * single-partition window.
  */
object Sharding {

  /** Assign each row a contiguous token-budget bin.
    *
    * Rows are ordered globally by (`orderKeyCol`, `idCol`); token counts
    * are prefix-summed in that order; `bin = exclusivePrefixSum div
    * budget`. Passing a content hash (e.g.
    * [[graft.functions.TextHash.charPolyHash]] of the normalized text —
    * [[TextAnalysis.fingerprint]]) as the order key gives a reproducible
    * content-shuffle: the same corpus always packs into the same shards,
    * regardless of input file order or partitioning.
    *
    * The prefix sum is DISTRIBUTED: the top `log2(nBuckets)` bits of the
    * order key split the key space into ranges (monotone in the key), each
    * range cumsums locally under its own window partition, and the
    * per-range totals — `nBuckets` rows, driver-safe — are converted to
    * exclusive offsets and broadcast-joined back. No stage ever sees a
    * single-partition global window, so the plan holds at any corpus size.
    *
    * @param orderKeyCol deterministic sort key; must be non-negative and
    *                    < 2^keyBits with roughly uniform high bits. The
    *                    domain is ENFORCED (exactly, for free) in the same
    *                    aggregation pass that computes range totals: a raw
    *                    signed `xxhash64` would land negative keys in high
    *                    buckets while sorting them first, silently breaking
    *                    the range/order monotonicity the distributed sum
    *                    relies on — wrap it as `pmod(xxhash64(c), 2^52)`
    * @param keyBits     bit-width of the order-key domain (52 for
    *                    charPolyHash-derived keys)
    * @param nBuckets    power-of-two range count for the distributed sum
    * @return (idCol, bin, n_tokens) — one row per input row
    */
  def tokenBudgetBins(df: DataFrame, idCol: String, tokensCol: String,
                      budget: Long, orderKeyCol: Column,
                      keyBits: Int = 52, nBuckets: Int = 256): DataFrame =
    binsCore(df.withColumn("_pt", lit("")), idCol, tokensCol, budget,
      orderKeyCol, keyBits, nBuckets)
      .drop("_pt")

  /** One-pass variant over a frame carrying a SPLIT label column
    * ([[Splits.groupedLabeled]]): each split's documents are prefix-summed
    * and binned independently — identical bins to calling
    * [[tokenBudgetBins]] once per filtered split — but all splits share
    * ONE window shuffle and ONE driver action instead of paying the
    * operator's two sequential actions per split. q63's profile was
    * exactly this: 3 splits × 2 prefix-sum actions sequentially; this
    * form collapses them to a single pair.
    *
    * @return (splitCol, idCol, bin, n_tokens) — bins numbered per split
    */
  def tokenBudgetBinsPerSplit(df: DataFrame, splitCol: String,
                              idCol: String, tokensCol: String,
                              budget: Long, orderKeyCol: Column,
                              keyBits: Int = 52,
                              nBuckets: Int = 256): DataFrame =
    binsCore(df.withColumn("_pt", col(splitCol).cast("string")), idCol,
      tokensCol, budget, orderKeyCol, keyBits, nBuckets)
      .withColumnRenamed("_pt", splitCol)

  private def binsCore(df: DataFrame, idCol: String, tokensCol: String,
                       budget: Long, orderKeyCol: Column,
                       keyBits: Int, nBuckets: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    globalExclusiveOffsets(df, idCol, col(tokensCol).cast("long"),
      orderKeyCol, keyBits, nBuckets)
      .select(col("_pt"), col(idCol), expr(s"_gex div $budget").as("bin"),
        col("_tok").as("n_tokens"))
  }

  /** Distributed global exclusive prefix sum — the shared core of
    * [[tokenBudgetBins]] and [[Packing.packSequences]].
    *
    * Orders rows globally by (`_pt`, `orderKeyCol`, `idCol`), prefix-sums
    * `weightCol` in that order WITHOUT a single-partition window (high
    * order-key bits → `nBuckets` ranges, local window cumsum per range,
    * per-range totals collected — `nBuckets` rows, driver-safe — and
    * broadcast back as exclusive offsets), and returns the input's
    * `payload` columns alongside `_tok` (the weight) and `_gex` (the
    * row's global exclusive offset within its `_pt` group).
    *
    * Expects a `_pt` split-label column on `df` (constant `""` for a
    * single global order). The order-key domain contract ([0, 2^keyBits),
    * non-null) is enforced in the totals pass exactly as documented on
    * [[tokenBudgetBins]].
    */
  private[ops] def globalExclusiveOffsets(df: DataFrame, idCol: String,
                                          weightCol: Column,
                                          orderKeyCol: Column,
                                          keyBits: Int, nBuckets: Int,
                                          payload: Seq[String] = Nil)
      : DataFrame = {
    val bucketBits = 31 - Integer.numberOfLeadingZeros(nBuckets)
    require(nBuckets == (1 << bucketBits), "nBuckets must be a power of two")
    require(keyBits > bucketBits && keyBits <= 63, "keyBits out of range")

    val keyed = df.select(Seq(col("_pt"), col(idCol)) ++
        payload.map(col) ++ Seq(
        weightCol.cast("long").as("_tok"),
        orderKeyCol.cast("long").as("_ok")): _*)
      .withColumn("_bkt",
        shiftrightunsigned(col("_ok"), keyBits - bucketBits).cast("int"))

    // local exclusive cumsum within each (split, key range)
    val w = Window.partitionBy("_pt", "_bkt").orderBy(col("_ok"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = keyed.withColumn("_lex",
      coalesce(sum(col("_tok")).over(w), lit(0L)))

    // range totals → exclusive running offsets per split (splits ×
    // nBuckets rows on the driver); min/max of the order key ride along
    // to enforce the domain contract without an extra pass
    val totalsRows = keyed.groupBy("_pt", "_bkt")
      .agg(sum("_tok").as("_bsum"), min("_ok").as("_kmin"), max("_ok").as("_kmax"),
        count(lit(1)).as("_rows"))
      .collect()
    // an all-null order key in a bucket (e.g. a cast failure) makes
    // min/max null — diagnose it by name instead of NPE-ing on getLong
    // (null keys all land in the null _bkt group, so per-bucket min/max
    // are null exactly when that bucket's keys are)
    val nullKeyRows = totalsRows.filter(r => r.isNullAt(3) || r.isNullAt(4))
    require(nullKeyRows.isEmpty,
      s"orderKeyCol evaluates to NULL for ${nullKeyRows.map(_.getLong(5)).sum}" +
        " rows (a failed cast?) — token-budget sharding needs a total order;" +
        " coalesce or filter the order key first")
    if (totalsRows.nonEmpty) {
      val kmin = totalsRows.map(_.getLong(3)).min
      val kmax = totalsRows.map(_.getLong(4)).max
      require(kmin >= 0L && kmax < (1L << keyBits),
        s"orderKeyCol out of domain [0, 2^$keyBits): observed [$kmin, $kmax]" +
          " — a raw xxhash64 is signed 64-bit and would silently skew the" +
          s" range buckets; wrap it as pmod(xxhash64(...), lit(1L << $keyBits))")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = totalsRows
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (pt, rows) =>
        var acc = 0L
        rows.sortBy(_._2).map { case (_, b, s) =>
          val o = acc; acc += s; (pt, b, o)
        }
      }
    val offDf = broadcast(offsets.toDF("_pt", "_bkt", "_off"))

    local.join(offDf, Seq("_pt", "_bkt"))
      .withColumn("_gex", col("_off") + col("_lex"))
      .select(Seq(col("_pt"), col(idCol)) ++ payload.map(col) ++
        Seq(col("_tok"), col("_gex")): _*)
  }
}
