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

  private def centroidDf(spark: org.apache.spark.sql.SparkSession,
                         centroids: Array[(Int, Array[Float])]) = {
    import spark.implicits._
    centroids.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("_cell", "_centroid")
      .select(col("_cell"), col("_centroid").cast("array<float>").as("_centroid"))
  }

  /** Train the coarse quantizer and assign every corpus row to its cell. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            nCells: Int, trainSampleFraction: Double = 1.0,
            seed: Long = 42L): Index = {
    val spark = corpus.sparkSession
    val train = (if (trainSampleFraction < 1.0)
      corpus.sample(withReplacement = false, trainSampleFraction, seed)
    else corpus)
      .select(array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(20)
      .fit(train)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      i -> c.toArray.map(_.toFloat)
    }
    // assign: nearest centroid per row via one broadcast cross pass
    val cd = centroidDf(spark, centroids)
    val w = Window.partitionBy(col(idCol)).orderBy(col("_cd").asc)
    val assigned = corpus.join(broadcast(cd))
      .withColumn("_cd", VectorFunctions.vecL2(col(vecCol), col("_centroid")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(corpus.columns.toIndexedSeq.map(col) :+ col("_cell"): _*)
    Index(centroids, assigned)
  }

  /** Search: probe the `nProbe` nearest cells per query, exact-score only
    * those cells' rows, return top-k per query.
    */
  def search(index: Index, idCol: String, vecCol: String,
             queries: DataFrame, queryIdCol: String, queryVecCol: String,
             k: Int, nProbe: Int = 4, metric: Metric = Cosine,
             excludeSelf: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    val cd = centroidDf(spark, index.centroids)
    val pw = Window.partitionBy(col(queryIdCol)).orderBy(col("_cd").asc)
    val probes = queries.join(broadcast(cd))
      .withColumn("_cd", VectorFunctions.vecL2(col(queryVecCol), col("_centroid")))
      .withColumn("_pr", row_number().over(pw))
      .filter(col("_pr") <= nProbe)
      .select(col(queryIdCol), col(queryVecCol), col("_cell"))

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
