package graft.catalog

import graft.model._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.DataType
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** JSON persistence for feature-group definitions — one file per group
  * under `warehouseDir/_catalog/<name>_<version>.json`, accessed through
  * the Hadoop FileSystem so the catalog lives wherever the warehouse does
  * (reference durability contract: server-side metadata,
  * python/hsfs/feature_store.py; the lake data already survives restarts,
  * this makes the definitions survive too).
  *
  * DataFrame-backed (spine) and unbound groups are session-scoped by
  * nature and are not persisted.
  */
object CatalogPersistence {

  private def dir(warehouseDir: String) = s"$warehouseDir/_catalog"

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def defaultToJson(v: Any): JValue = v match {
    case s: String  => JString(s)
    case i: Int     => JInt(i)
    case l: Long    => JInt(l)
    case d: Double  => JDouble(d)
    case f: Float   => JDouble(f.toDouble)
    case b: Boolean => JBool(b)
    case other      => JString(other.toString)
  }

  /** Coerce a parsed JSON default back to the feature's declared type so
    * write-path fills (`lit(default)`) stay type-correct after a reload.
    */
  private def defaultFromJson(j: JValue, dt: DataType): Option[Any] = j match {
    case JNothing | JNull => None
    case JString(s)       => Some(s)
    case JBool(b)         => Some(b)
    case JInt(i) => dt match {
      case org.apache.spark.sql.types.IntegerType => Some(i.toInt)
      case org.apache.spark.sql.types.DoubleType  => Some(i.toDouble)
      case org.apache.spark.sql.types.FloatType   => Some(i.toFloat)
      case _                                      => Some(i.toLong)
    }
    case JDouble(d) => dt match {
      case org.apache.spark.sql.types.FloatType => Some(d.toFloat)
      case _                                    => Some(d)
    }
    case other => Some(JsonMethods.compact(JsonMethods.render(other)))
  }

  private def sourceToJson(src: FgSource): Option[JValue] = src match {
    case ParquetSource(path) => Some(("type" -> "parquet") ~ ("path" -> path))
    case LakeSource(root)    => Some(("type" -> "lake") ~ ("path" -> root))
    case ViewSource(table)   => Some(("type" -> "view") ~ ("path" -> table))
    case ConnectorSource(format, options, conf, path) =>
      // full pushdown contract persists: options carry e.g. the jdbc
      // "query"; a reloaded catalog plans the identical external read
      Some(("type" -> "connector") ~ ("format" -> format) ~
        ("options" -> options) ~ ("hadoopConf" -> conf) ~
        ("loadPath" -> path))
    case _                   => None // DataFrame/unbound: session-scoped
  }

  private def sourceFromJson(j: JValue): FgSource = {
    val path = (j \ "path") match { case JString(s) => s; case _ => "" }
    def strMap(v: JValue): Map[String, String] = v match {
      case JObject(fields) =>
        fields.collect { case JField(k, JString(s)) => k -> s }.toMap
      case _ => Map.empty
    }
    (j \ "type") match {
      case JString("parquet") => ParquetSource(path)
      case JString("lake")    => LakeSource(path)
      case JString("view")    => ViewSource(path)
      case JString("connector") => ConnectorSource(
        format = (j \ "format") match { case JString(s) => s; case _ => "" },
        options = strMap(j \ "options"),
        hadoopConf = strMap(j \ "hadoopConf"),
        path = (j \ "loadPath") match {
          case JString(s) => Some(s); case _ => None })
      case _                  => UnboundSource
    }
  }

  private[catalog] def toJson(fg: FeatureGroup): Option[JValue] =
    sourceToJson(fg.source).map { src =>
      ("name" -> fg.name) ~
        ("version" -> fg.version) ~
        ("primaryKey" -> fg.primaryKey) ~
        ("partitionKey" -> fg.partitionKey) ~
        ("eventTime" -> fg.eventTime) ~
        ("precombineKey" -> fg.precombineKey) ~
        ("online" -> fg.online) ~
        ("statisticsConfig" -> (
          ("enabled" -> fg.statisticsConfig.enabled) ~
            ("correlations" -> fg.statisticsConfig.correlations) ~
            ("histograms" -> fg.statisticsConfig.histograms) ~
            ("exactUniqueness" -> fg.statisticsConfig.exactUniqueness) ~
            ("columns" -> fg.statisticsConfig.columns))) ~
        ("source" -> src) ~
        ("features" -> fg.features.map { f =>
          ("name" -> f.name) ~
            ("dataType" -> f.dataType.json) ~
            ("primary" -> f.primary) ~
            ("partition" -> f.partition) ~
            ("nullable" -> f.nullable) ~
            ("description" -> f.description) ~
            ("default" -> f.defaultValue.map(defaultToJson))
        })
    }

  private[catalog] def fromJson(j: JValue): FeatureGroup = {
    def str(v: JValue): Option[String] =
      v match { case JString(s) => Some(s); case _ => None }
    def strs(v: JValue): Seq[String] =
      v match { case JArray(xs) => xs.flatMap(str); case _ => Nil }
    def bool(v: JValue, dflt: Boolean): Boolean =
      v match { case JBool(b) => b; case _ => dflt }
    val features = (j \ "features") match {
      case JArray(fs) => fs.map { f =>
        val dt = DataType.fromJson(str(f \ "dataType").getOrElse("\"string\""))
        Feature(
          name = str(f \ "name").getOrElse(""),
          dataType = dt,
          primary = bool(f \ "primary", dflt = false),
          partition = bool(f \ "partition", dflt = false),
          nullable = bool(f \ "nullable", dflt = true),
          description = str(f \ "description"),
          defaultValue = defaultFromJson(f \ "default", dt))
      }
      case _ => Nil
    }
    FeatureGroup(
      name = str(j \ "name").getOrElse(""),
      version = (j \ "version") match { case JInt(i) => i.toInt; case _ => 1 },
      features = features,
      primaryKey = strs(j \ "primaryKey"),
      partitionKey = strs(j \ "partitionKey"),
      eventTime = str(j \ "eventTime"),
      precombineKey = str(j \ "precombineKey"),
      source = sourceFromJson(j \ "source"),
      online = bool(j \ "online", dflt = false),
      // absent in pre-upgrade catalogs → reference defaults
      statisticsConfig = StatisticsConfig(
        enabled = bool(j \ "statisticsConfig" \ "enabled", dflt = true),
        correlations = bool(j \ "statisticsConfig" \ "correlations", dflt = false),
        histograms = bool(j \ "statisticsConfig" \ "histograms", dflt = false),
        exactUniqueness =
          bool(j \ "statisticsConfig" \ "exactUniqueness", dflt = false),
        columns = strs(j \ "statisticsConfig" \ "columns")))
  }

  def save(spark: SparkSession, warehouseDir: String, fg: FeatureGroup): Unit =
    toJson(fg).foreach { j =>
      val (fs, _) = fsOf(spark, dir(warehouseDir))
      val out = fs.create(new Path(s"${dir(warehouseDir)}/${fg.id}.json"), true)
      try out.write(JsonMethods.compact(JsonMethods.render(j))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

  def load(spark: SparkSession, warehouseDir: String): Seq[FeatureGroup] = {
    val (fs, p) = fsOf(spark, dir(warehouseDir))
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".json"))
      .map { st =>
        val in = fs.open(st.getPath)
        val txt =
          try new String(in.readAllBytes,
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        fromJson(JsonMethods.parse(txt))
      }
  }
}
