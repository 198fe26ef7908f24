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
    index.assigned.write.mode("overwrite")
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
