package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage for co-located joins (SURVEY §4: "bucketing for
  * co-located joins"). Tables that are repeatedly joined on the same key —
  * the feature-store access pattern: every feature group keyed by its
  * primary key, joined per feature-view read — are written bucketed by
  * that key so the join runs shuffle-free: both sides' bucket layout
  * satisfies the join's distribution requirement and Catalyst elides the
  * Exchange on each side.
  *
  * At 100 TB this converts the dominant per-read shuffle of N feature
  * groups into a one-time shuffle at write; reads pay only a local
  * sort-merge per bucket pair.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    var w = df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  /** Shuffle-free equi-join of two tables bucketed on their join keys.
    * Returns the joined frame; callers can assert the plan has no
    * shuffle on either side (see BucketingSpec).
    */
  def cozyJoin(spark: SparkSession, leftTable: String, rightTable: String,
               keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
