package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid 2011, public method): the
  * memory-scale ANN path past int8 — each vector is split into `m`
  * subspaces, each subspace k-means-quantized to one of `k` codes, so a
  * `dim`-float vector compresses to `m` small ints (e.g. 64 floats =
  * 256 bytes → 8 bytes at m=8, k≤256) and search never touches the
  * original floats. Complements the existing family: LSH (q44) and IVF
  * (q45) shrink the CANDIDATE SET; int8 (q62) and PQ shrink the BYTES
  * PER CANDIDATE — at 100 TB the scan over codes is 32× less I/O than
  * the float scan, which is the difference between an in-memory code
  * table and a disk-bound pass (reference vector-db surface:
  * `core/vector_db_client.py` — index geometry is the engine's call).
  *
  * Scale shape mirrors [[IvfIndex]]: training is a bounded driver
  * sample (per-subspace Lloyd on the SAME seeded k-means — restarts,
  * empty-cell reseeding); encoding is one zero-shuffle codegen map pass
  * ([[VectorFunctions.NearestCells]] per subspace over sliced views);
  * ADC search broadcasts a per-query lookup table of
  * (subspace, code) → squared sub-distance and folds it with the
  * codegen [[VectorFunctions.AdcScore]] — so the corpus-sized pass
  * reads only the code column, and the per-query top-k is the same
  * keyed `InferWindowGroupLimit` window as [[Similarity.bruteForceKnn]]
  * (map-side partial top-k, the shuffle carries ≤ k·partitions rows per
  * query).
  */
object ProductQuantization {

  /** Trained codebooks: `codebooks(s)(c)` is subspace `s`'s centroid
    * `c` (length dim/m). `k` is the REQUESTED codes-per-subspace; a
    * subspace trained on fewer distinct points may hold fewer.
    */
  final case class Model(codebooks: Array[Array[Array[Float]]],
                         m: Int, k: Int, dim: Int) {
    def subDim: Int = dim / m
    /** LUT stride: max codebook size — every subspace's LUT slot block
      * is this wide so `s·stride + code` indexes a flat array. */
    def stride: Int = codebooks.map(_.length).max
  }

  /** PQ trains on a bounded sample by design (≲256 points per code is
    * the standard prescription) — same driver-local rationale as
    * [[IvfIndex.MaxLocalTrainRows]].
    */
  private val MaxTrainRows = 200000

  /** Train per-subspace codebooks on a (sampled) corpus. The sample —
    * never the corpus — is collected; each subspace runs the shared
    * seeded k-means ([[IvfIndex.localKMeans]]: k-means++ init, restarts,
    * empty-cell reseeding) on its slice of the sample.
    */
  def train(corpus: DataFrame, vecCol: String, m: Int, k: Int,
            trainSampleFraction: Double = 1.0, seed: Long = 42L,
            maxIter: Int = 20): Model = {
    require(m >= 1 && k >= 2, s"need m >= 1 subspaces and k >= 2 codes, got $m/$k")
    val trainDf = (if (trainSampleFraction < 1.0)
      corpus.sample(withReplacement = false, trainSampleFraction, seed)
    else corpus).select(col(vecCol).cast("array<float>").as("_f"))
    val head = trainDf.limit(MaxTrainRows + 1).collect()
    require(head.length <= MaxTrainRows,
      s"PQ train sample exceeds $MaxTrainRows rows — lower trainSampleFraction " +
        "(the codebook needs ~256·k points, not the corpus)")
    val pts = head.map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    require(pts.nonEmpty, "PQ training sample is empty")
    val dim = pts.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sd = dim / m
    val codebooks = Array.tabulate(m) { s =>
      val sub = pts.map(p => java.util.Arrays.copyOfRange(p, s * sd, (s + 1) * sd))
      IvfIndex.localKMeans(sub, math.min(k, sub.length), seed + s, maxIter)
    }
    Model(codebooks, m, k, dim)
  }

  /** Encode every vector to its `array<int>` code word — one codegen
    * argmin per subspace over a sliced view, zero shuffle; the encoded
    * table is what a 100 TB deployment persists (32× smaller at rest
    * and in every downstream scan).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             model: Model): DataFrame = {
    val sd = model.subDim
    val codes = array((0 until model.m).map { s =>
      VectorFunctions.vecNearestCells(
        slice(col(vecCol), s * sd + 1, sd), model.codebooks(s), 1).getItem(0)
    }: _*)
    corpus.select(col(idCol), codes.as("codes"))
  }

  /** ADC top-k search over an encoded corpus. Per query, the flat LUT
    * `lut[s·stride + c] = ||q_s − codebook(s)(c)||²` is computed on the
    * tiny (|queries| × Σ|codebook|)-row cross frame with an EXACT
    * interpreted fold (bit-stable, off the hot path), assembled in
    * subspace-major order, and broadcast; the corpus pass is then one
    * codegen [[VectorFunctions.AdcScore]] fold per (row, query) and the
    * standard keyed top-k window. Scores are approximate squared L2 —
    * ascending, ties broken by id like every ranker here.
    */
  def adcSearch(encoded: DataFrame, idCol: String, codesCol: String,
                model: Model, queries: DataFrame, queryIdCol: String,
                queryVecCol: String, k: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val sd = model.subDim
    val stride = model.stride
    // every subspace emits a FULL stride-wide slot block (unfilled slots
    // — a subspace that trained < stride codes — get +inf): the flat
    // `s·stride + code` indexing needs dense positions, and encode never
    // emits a code pointing at a filler slot
    val cb = model.codebooks.zipWithIndex.flatMap { case (book, s) =>
      (0 until stride).map { c =>
        (s, c,
          if (c < book.length) Option(book(c).toSeq.map(_.toDouble)) else None)
      }
    }.toSeq.toDF("_sub", "_code", "_cent")
    // exact squared sub-distance on the tiny LUT frame (double fold)
    val d2 = when(col("_cent").isNotNull, aggregate(
      zip_with(slice(col(queryVecCol), col("_sub") * sd + 1, lit(sd))
          .cast("array<double>"),
        col("_cent"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)).otherwise(lit(Double.MaxValue))
    val lut = queries.crossJoin(broadcast(cb))
      .withColumn("_pos", col("_sub") * stride + col("_code"))
      .withColumn("_d2", d2)
      .groupBy(col(queryIdCol), col(queryVecCol))
      .agg(transform(array_sort(collect_list(struct(col("_pos"), col("_d2")))),
        x => x.getField("_d2")).as("_lut"))
      .select(col(queryIdCol), col("_lut"))
    val scored = encoded.crossJoin(broadcast(lut))
      .withColumn("_adc",
        VectorFunctions.vecAdcScore(col(codesCol), col("_lut"), stride))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("_adc").asc, col(idCol).asc)
    scored.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= k)
      .select(col(queryIdCol), col(idCol), col("_adc").as("adc_score"),
        col("_rank").as("rank"))
  }

  /** The production PQ composition: ADC over the code table produces a
    * `shortlist`-deep candidate set per query, then ONLY those rows'
    * original vectors are re-scored exactly and the top `k` re-ranked —
    * so the corpus-sized pass reads codes (32× less I/O), and the float
    * vectors are touched for `shortlist·|queries|` rows total (a
    * broadcast-semi-shaped join, never a second corpus pass's worth of
    * compute). Recall@k is then purely "did the true top-k survive the
    * shortlist" — the candidates themselves rank exactly. Same output
    * shape and (score, id) tie-break as [[Similarity.bruteForceKnn]].
    */
  def searchRefined(encoded: DataFrame, idCol: String, codesCol: String,
                    model: Model, corpus: DataFrame, vecCol: String,
                    queries: DataFrame, queryIdCol: String,
                    queryVecCol: String, k: Int, shortlist: Int,
                    metric: VectorFunctions.Metric = VectorFunctions.L2)
      : DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    val cand = adcSearch(encoded, idCol, codesCol, model,
        queries, queryIdCol, queryVecCol, shortlist)
      .select(col(queryIdCol), col(idCol))
    val qv = queries.select(col(queryIdCol), col(queryVecCol))
    val rescored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(qv), Seq(queryIdCol))
      .withColumn("_score",
        VectorFunctions.distance(metric)(col(vecCol), col(queryVecCol)))
    val ord = metric match {
      case VectorFunctions.L2 => col("_score").asc
      case _                  => col("_score").desc
    }
    val w = Window.partitionBy(col(queryIdCol)).orderBy(ord, col(idCol).asc)
    rescored.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= k)
      .select(col(queryIdCol), col(idCol), col("_score").as("score"),
        col("_rank").as("rank"))
  }
}
