package graft.ops

import graft.functions.VectorFunctions
import graft.functions.VectorFunctions.{Cosine, Metric}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor index: the classic
  * coarse-quantizer design (trained centroids partition the corpus; a query
  * probes only the `nProbe` nearest cells). Complements the hash-based
  * [[Similarity.lshKnn]] — IVF adapts to the data distribution, so recall
  * on clustered real-world embeddings is far better at the same candidate
  * budget.
  *
  * Scale shape: training samples the corpus (KMeans on a bounded sample),
  * assignment is one broadcast-centroid pass over the corpus (storable —
  * at 100 TB the assignment is written once alongside the table, ideally
  * partitioned by cell so a probe is partition pruning); search touches
  * only the probed cells' rows.
  */
object IvfIndex {

  final case class Index(centroids: Array[(Int, Array[Float])],
                         assigned: DataFrame)

  /** Train the coarse quantizer (KMeans on a sample — never the full
    * corpus at scale) and assign every corpus row to its cell with the
    * codegen'd [[VectorFunctions.NearestCells]] argmin: a zero-shuffle
    * map pass, instead of a broadcast-cross-join (nCells × |corpus| rows)
    * plus a full-table window.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            nCells: Int, trainSampleFraction: Double = 1.0,
            seed: Long = 42L, maxIter: Int = 20): Index = {
    val train = (if (trainSampleFraction < 1.0)
      corpus.sample(withReplacement = false, trainSampleFraction, seed)
    else corpus)
      .select(array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .fit(train)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      i -> c.toArray.map(_.toFloat)
    }
    val cents = centroids.map(_._2)
    val assigned = corpus.withColumn("_cell",
      VectorFunctions.vecNearestCells(col(vecCol), cents, 1).getItem(0))
    Index(centroids, assigned)
  }

  /** Persist the index: centroids plus the assignment PARTITIONED BY
    * `_cell`, so a probe's cell filter becomes partition pruning at the
    * scan — at 100 TB a search then reads only the probed cells' files,
    * never the corpus. Build once per corpus version, search many times.
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.toSeq
      .map { case (cell, c) => (cell, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // repartition by cell first: a bare partitionBy write emits
    // (input-partitions × cells) splinter files — the small-files problem
    // at corpus scale; one shuffle buys one file per cell
    index.assigned.repartition(col("_cell")).write.mode("overwrite")
      .partitionBy("_cell").parquet(s"$path/assigned")
  }

  /** Load a persisted index. The assignment scan stays lazy — search's
    * cell join prunes partitions instead of reading the corpus.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => r.getInt(0) ->
        r.getAs[scala.collection.Seq[Float]](1).toArray)
      .sortBy(_._1)
    Index(centroids, spark.read.parquet(s"$path/assigned"))
  }

  /** IVF index with int8-quantized vectors: cells give partition-pruned
    * probes AND the stored vector column is 4× smaller than float32 —
    * stage 1 scans quantized bytes in the probed cells only; the exact
    * re-rank joins the k·refine candidate ids back to the float corpus.
    * The two scale levers (read less of the index, store less per row)
    * compose.
    */
  final case class QuantizedIndex(centroids: Array[(Int, Array[Float])],
                                  params: Quantization.QuantParams,
                                  assigned: DataFrame)

  /** Quantize a built index's vectors (fits params on the corpus when not
    * supplied; dim comes from the centroids).
    */
  def quantize(index: Index, idCol: String, vecCol: String,
               params: Option[Quantization.QuantParams] = None)
      : QuantizedIndex = {
    val dim = index.centroids.head._2.length
    val p = params.getOrElse(Quantization.fit(index.assigned, vecCol, dim))
    QuantizedIndex(index.centroids, p,
      index.assigned.select(col(idCol),
        Quantization.quantize(col(vecCol), p).as("_qv"), col("_cell")))
  }

  def saveQuantized(qi: QuantizedIndex, path: String): Unit = {
    val spark = qi.assigned.sparkSession
    import spark.implicits._
    qi.centroids.toSeq.map { case (cell, c) => (cell, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    qi.params.mins.zip(qi.params.scales).zipWithIndex.toSeq
      .map { case ((mn, sc), i) => (i, mn, sc) }
      .toDF("dim", "min", "scale")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
    qi.assigned.repartition(col("_cell")).write.mode("overwrite")
      .partitionBy("_cell").parquet(s"$path/assigned")
  }

  def loadQuantized(spark: org.apache.spark.sql.SparkSession,
                    path: String): QuantizedIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => r.getInt(0) ->
        r.getAs[scala.collection.Seq[Float]](1).toArray)
      .sortBy(_._1)
    val ps = spark.read.parquet(s"$path/params")
      .collect().map(r => (r.getInt(0), r.getFloat(1), r.getFloat(2)))
      .sortBy(_._1)
    QuantizedIndex(centroids,
      Quantization.QuantParams(ps.map(_._2), ps.map(_._3)),
      spark.read.parquet(s"$path/assigned"))
  }

  /** Search the quantized index (L2): int8 stage-1 over the probed cells,
    * exact float re-rank of the top k·refine candidates against `corpus`.
    */
  def searchQuantized(qi: QuantizedIndex, corpus: DataFrame,
                      idCol: String, vecCol: String,
                      queries: DataFrame, queryIdCol: String,
                      queryVecCol: String,
                      k: Int, nProbe: Int = 4, refine: Int = 4,
                      excludeSelf: Boolean = true): DataFrame = {
    val cents = qi.centroids.map(_._2)
    val probes = queries
      .select(col(queryIdCol),
        Quantization.quantize(col(queryVecCol), qi.params).as("_qq"),
        explode(VectorFunctions.vecNearestCells(
          col(queryVecCol), cents, nProbe)).as("_cell"))

    val approx = qi.assigned.join(broadcast(probes), "_cell")
      .filter(if (excludeSelf) col(idCol) =!= col(queryIdCol) else lit(true))
      .select(col(queryIdCol), col(idCol),
        VectorFunctions.vecInt8L2(col("_qv"), col("_qq"), qi.params.scales)
          .as("_ad"))
    val w1 = Window.partitionBy(col(queryIdCol))
      .orderBy(col("_ad").asc, col(idCol).asc)
    val cands = approx.withColumn("_r", row_number().over(w1))
      .filter(col("_r") <= k * refine)
      .select(col(queryIdCol), col(idCol))

    val w2 = Window.partitionBy(col(queryIdCol))
      .orderBy(col("_score").asc, col(idCol).asc)
    cands
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(queryIdCol), col(queryVecCol))),
        Seq(queryIdCol))
      .withColumn("_score",
        VectorFunctions.vecL2(col(vecCol), col(queryVecCol)))
      .withColumn("_rank", row_number().over(w2))
      .filter(col("_rank") <= k)
      .select(col(queryIdCol), col(idCol), col("_score").as("score"),
        col("_rank").as("rank"))
  }

  /** Search: probe the `nProbe` nearest cells per query, exact-score only
    * those cells' rows, return top-k per query.
    */
  def search(index: Index, idCol: String, vecCol: String,
             queries: DataFrame, queryIdCol: String, queryVecCol: String,
             k: Int, nProbe: Int = 4, metric: Metric = Cosine,
             excludeSelf: Boolean = true): DataFrame = {
    val cents = index.centroids.map(_._2)
    val probes = queries
      .select(col(queryIdCol), col(queryVecCol),
        explode(VectorFunctions.vecNearestCells(
          col(queryVecCol), cents, nProbe)).as("_cell"))

    val score = VectorFunctions.distance(metric)(col(vecCol), col(queryVecCol))
    val ord = metric match {
      case VectorFunctions.L2 => col("_score").asc
      case _                  => col("_score").desc
    }
    val w = Window.partitionBy(col(queryIdCol)).orderBy(ord, col(idCol).asc)
    index.assigned.join(broadcast(probes), "_cell")
      .filter(if (excludeSelf) col(idCol) =!= col(queryIdCol) else lit(true))
      .withColumn("_score", score)
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= k)
      .select(col(queryIdCol), col(idCol), col("_score").as("score"),
        col("_rank").as("rank"))
  }
}
