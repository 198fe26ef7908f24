package graft.model

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Core metadata model of the engine.
  *
  * Mirrors the reference data model (see SURVEY.md §1): a feature store is a
  * catalog of versioned feature groups; a feature group is a table with a
  * primary key, optional partition key, optional event-time column and an
  * optional precombine (last-writer-wins) column; a feature is a column.
  *
  * Reference: python/hsfs/feature.py:30-268 (Feature),
  * python/hsfs/feature_group.py:198-3400 (FeatureGroup),
  * python/hsfs/feature_store.py (FeatureStore).
  */
final case class Feature(
    name: String,
    dataType: DataType,
    primary: Boolean = false,
    partition: Boolean = false,
    nullable: Boolean = true,
    description: Option[String] = None,
    /** Fill value for rows predating an appended column
      * (python/hsfs/feature.py default_value, feature_group.py:853).
      */
    defaultValue: Option[Any] = None
) {
  def toField: StructField = StructField(name, dataType, nullable)
}

object Feature {
  /** Sanitize a feature name: lowercase, spaces/illegal chars → underscore.
    * Reference semantics: python/hsfs/engine/spark.py:302-338
    * (util.autofix_feature_name).
    */
  def sanitizeName(raw: String): String =
    raw.trim.toLowerCase.replaceAll("[^a-z0-9_]", "_")
}

/** Per-group statistics configuration — which statistics the store's
  * statistics engine computes (and persists) for this group: descriptive
  * profile always (when enabled), plus opt-in correlations, histograms
  * and exact uniqueness, optionally restricted to a column subset.
  * Reference: python/hsfs/statistics_config.py:24-100.
  */
final case class StatisticsConfig(
    enabled: Boolean = true,
    correlations: Boolean = false,
    histograms: Boolean = false,
    exactUniqueness: Boolean = false,
    /** Empty = all features. */
    columns: Seq[String] = Nil
)

/** A versioned feature-group table.
  *
  * `source` tells the planner how to materialize the relation:
  *  - [[ParquetSource]]   — plain parquet path (no time travel)
  *  - [[LakeSource]]      — commit-logged lake table (time travel, upserts)
  *  - [[ViewSource]]      — registered Spark temp view / table name
  *  - [[DataFrameSource]] — caller-supplied DataFrame (spine groups)
  */
final case class FeatureGroup(
    name: String,
    version: Int = 1,
    features: Seq[Feature] = Nil,
    primaryKey: Seq[String] = Nil,
    partitionKey: Seq[String] = Nil,
    eventTime: Option[String] = None,
    precombineKey: Option[String] = None,
    source: FgSource = UnboundSource,
    online: Boolean = false,
    statisticsConfig: StatisticsConfig = StatisticsConfig()
) {
  def schema: StructType = StructType(features.map(_.toField))
  def featureNames: Seq[String] = features.map(_.name)
  def id: String = s"${name}_$version"

  /** Effective precombine column: declared, else event time, else first PK.
    * Reference: python/hsfs/core/hudi_engine.py:141-149 (precombine defaults).
    */
  def effectivePrecombine: Option[String] =
    precombineKey.orElse(eventTime).orElse(primaryKey.headOption)

  // Query entry points matching the reference's feature-group API
  // (fg.select_all() / select / select_except / select_features —
  // python/hsfs/feature_group.py:240-409). Defined via the IR companion;
  // imported lazily to avoid a model→ir compile cycle.
  def selectAll(includePrimaryKey: Boolean = true,
                includeEventTime: Boolean = true): graft.ir.Query =
    graft.ir.Query.selectAll(this, includePrimaryKey, includeEventTime)
  def select(names: String*): graft.ir.Query =
    graft.ir.Query.select(this, names)
  def selectExcept(names: String*): graft.ir.Query =
    graft.ir.Query.selectExcept(this, names)
}

sealed trait FgSource
case object UnboundSource extends FgSource
final case class ParquetSource(path: String) extends FgSource
final case class LakeSource(root: String) extends FgSource
final case class ViewSource(table: String) extends FgSource
final case class DataFrameSource(df: DataFrame) extends FgSource
/** External (connector-backed) group source: datasource format + options
  * (+ optional load path), with Hadoop confs injected before the read.
  * The persistable form of the reference's ExternalFeatureGroup — a
  * first-class catalog entity whose query/pushdown options survive
  * restarts (python/hsfs/core/external_feature_group_engine.py,
  * engine/spark.py:195-209).
  */
final case class ConnectorSource(format: String,
                                 options: Map[String, String] = Map(),
                                 hadoopConf: Map[String, String] = Map(),
                                 path: Option[String] = None) extends FgSource

object FeatureGroup {

  /** Declare a feature group over an existing parquet file/dir, inferring the
    * schema from the footer (schema inferred-once at creation; reference:
    * python/hsfs/engine/spark.py:1149-1170).
    */
  def fromParquet(
      spark: SparkSession,
      name: String,
      path: String,
      primaryKey: Seq[String] = Nil,
      partitionKey: Seq[String] = Nil,
      eventTime: Option[String] = None,
      precombineKey: Option[String] = None,
      version: Int = 1
  ): FeatureGroup = {
    val schema = spark.read.parquet(path).schema
    val pkSet = primaryKey.toSet
    val partSet = partitionKey.toSet
    FeatureGroup(
      name = name,
      version = version,
      features = schema.fields.toSeq.map(f =>
        Feature(f.name, f.dataType, pkSet(f.name), partSet(f.name), f.nullable)),
      primaryKey = primaryKey,
      partitionKey = partitionKey,
      eventTime = eventTime,
      precombineKey = precombineKey,
      source = ParquetSource(path)
    )
  }

  /** Declare a spine feature group over a caller-supplied DataFrame
    * (reference: SpineGroup, python/hsfs/core/spine_group_engine.py:22-23).
    */
  def spine(
      name: String,
      df: DataFrame,
      primaryKey: Seq[String],
      eventTime: Option[String] = None
  ): FeatureGroup =
    FeatureGroup(
      name = name,
      features = df.schema.fields.toSeq.map(f =>
        Feature(f.name, f.dataType, primaryKey.contains(f.name))),
      primaryKey = primaryKey,
      eventTime = eventTime,
      source = DataFrameSource(df)
    )
}
