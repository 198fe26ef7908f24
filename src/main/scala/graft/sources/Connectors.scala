package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Storage connectors: each connector resolves to (format, options,
  * hadoop-conf) applied before a plain `spark.read` — the same shape as the
  * reference's connector classes (python/hsfs/storage_connector.py:406-1655,
  * Hadoop conf injection engine/spark.py:1180-1386).
  *
  * Network-backed connectors (JDBC/Snowflake/BigQuery) need their
  * datasource jars and reachable endpoints on the cluster; the option/conf
  * assembly below is the portable, unit-testable part.
  */
object Connectors {

  sealed trait Connector {
    def format: String
    def options: Map[String, String]
    /** Hadoop configs to set on the SparkContext before reading. */
    def hadoopConf: Map[String, String] = Map.empty
  }

  /** Escape hatch: any datasource by format + options (e.g. local files,
    * a custom datasource jar on the cluster).
    */
  final case class Generic(format: String,
                           options: Map[String, String] = Map(),
                           conf: Map[String, String] = Map()) extends Connector {
    override def hadoopConf: Map[String, String] = conf
  }

  /** JDBC (also MySQL online-storage reads, engine/spark.py:140-155):
    * pushdown of a whole SQL `query` or a `dbtable`
    * (storage_connector.py:949-1038).
    */
  final case class Jdbc(url: String, user: String, password: String,
                        query: Option[String] = None,
                        table: Option[String] = None,
                        driver: Option[String] = None,
                        extra: Map[String, String] = Map()) extends Connector {
    def format = "jdbc"
    def options: Map[String, String] =
      Map("url" -> url, "user" -> user, "password" -> password) ++
        query.map("query" -> _) ++ table.map("dbtable" -> _) ++
        driver.map("driver" -> _) ++ extra
  }

  /** Redshift = JDBC with the redshift driver (storage_connector.py:406). */
  def redshift(clusterUrl: String, user: String, password: String,
               query: Option[String] = None,
               table: Option[String] = None): Jdbc =
    Jdbc(clusterUrl, user, password, query, table,
      driver = Some("com.amazon.redshift.jdbc42.Driver"))

  /** Snowflake connector options (storage_connector.py:745-949). */
  final case class Snowflake(url: String, user: String, password: String,
                             database: String, schema: String,
                             warehouse: Option[String] = None,
                             role: Option[String] = None,
                             query: Option[String] = None,
                             table: Option[String] = None,
                             extra: Map[String, String] = Map()) extends Connector {
    def format = "snowflake"
    def options: Map[String, String] =
      Map("sfURL" -> url, "sfUser" -> user, "sfPassword" -> password,
        "sfDatabase" -> database, "sfSchema" -> schema) ++
        warehouse.map("sfWarehouse" -> _) ++ role.map("sfRole" -> _) ++
        query.map("query" -> _) ++ table.map("dbtable" -> _) ++ extra
  }

  /** BigQuery query-or-table read (storage_connector.py:1495-1655). */
  final case class BigQuery(parentProject: String,
                            materializationDataset: Option[String] = None,
                            query: Option[String] = None,
                            table: Option[String] = None,
                            credentialsFile: Option[String] = None) extends Connector {
    def format = "bigquery"
    def options: Map[String, String] =
      Map("parentProject" -> parentProject) ++
        materializationDataset.map("materializationDataset" -> _) ++
        query.map("query" -> _) ++ table.map("table" -> _) ++
        credentialsFile.map("credentialsFile" -> _)
    override def hadoopConf: Map[String, String] =
      materializationDataset.map(_ => "viewsEnabled" -> "true").toMap
  }

  /** S3 with key/secret/token/SSE Hadoop confs (engine/spark.py:1180-1230). */
  final case class S3(bucket: String,
                      accessKey: Option[String] = None,
                      secretKey: Option[String] = None,
                      sessionToken: Option[String] = None,
                      serverEncryptionAlgorithm: Option[String] = None,
                      serverEncryptionKey: Option[String] = None) extends Connector {
    def format = "parquet" // path-based; format chosen by the read
    def options: Map[String, String] = Map.empty
    override def hadoopConf: Map[String, String] =
      accessKey.map("fs.s3a.access.key" -> _).toMap ++
        secretKey.map("fs.s3a.secret.key" -> _) ++
        sessionToken.map(t => Map(
          "fs.s3a.aws.credentials.provider" ->
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider",
          "fs.s3a.session.token" -> t)).getOrElse(Map.empty) ++
        serverEncryptionAlgorithm.map(
          "fs.s3a.server-side-encryption-algorithm" -> _) ++
        serverEncryptionKey.map("fs.s3a.server-side-encryption.key" -> _)
    def path(relative: String): String = s"s3a://$bucket/$relative"
  }

  /** ADLS gen2 OAuth confs (engine/spark.py:1226-1230). */
  final case class Adls(account: String, clientId: String,
                        clientSecret: String, tenantId: String) extends Connector {
    def format = "parquet"
    def options: Map[String, String] = Map.empty
    override def hadoopConf: Map[String, String] = Map(
      s"fs.azure.account.auth.type.$account.dfs.core.windows.net" -> "OAuth",
      s"fs.azure.account.oauth.provider.type.$account.dfs.core.windows.net" ->
        "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider",
      s"fs.azure.account.oauth2.client.id.$account.dfs.core.windows.net" -> clientId,
      s"fs.azure.account.oauth2.client.secret.$account.dfs.core.windows.net" ->
        clientSecret,
      s"fs.azure.account.oauth2.client.endpoint.$account.dfs.core.windows.net" ->
        s"https://login.microsoftonline.com/$tenantId/oauth2/token")
  }

  /** GCS service-account confs (engine/spark.py:1330-1386). */
  final case class Gcs(keyFile: String, projectId: String) extends Connector {
    def format = "parquet"
    def options: Map[String, String] = Map.empty
    override def hadoopConf: Map[String, String] = Map(
      "google.cloud.auth.service.account.enable" -> "true",
      "google.cloud.auth.service.account.json.keyfile" -> keyFile,
      "fs.gs.project.id" -> projectId)
  }

  /** Kafka source options (engine/spark.py:951-1007). */
  final case class Kafka(bootstrapServers: String, topic: String,
                         startingOffsets: String = "earliest",
                         includeMetadata: Boolean = false,
                         security: Map[String, String] = Map()) extends Connector {
    def format = "kafka"
    def options: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets) ++ security
  }

  /** Apply a connector: inject Hadoop confs, build a configured reader.
    * Mirrors the reference's `read` entry (storage_connector.read →
    * engine/spark.py:195-243).
    */
  def reader(spark: SparkSession, c: Connector): DataFrameReader = {
    c.hadoopConf.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
    spark.read.format(c.format).options(c.options)
  }

  /** Register an external feature group: connector + query/path evaluated
    * and exposed as a temp view (engine/spark.py:195-209).
    */
  def registerExternal(spark: SparkSession, c: Connector, alias: String,
                       path: Option[String] = None): DataFrame = {
    val r = reader(spark, c)
    val df = path.map(r.load).getOrElse(r.load())
    df.createOrReplaceTempView(alias)
    df
  }

  /** Persistable source form of a connector — what a first-class external
    * feature group stores in the catalog (the connector's full option set,
    * including any pushdown query, survives restarts).
    */
  def source(c: Connector,
             path: Option[String] = None): graft.model.ConnectorSource =
    graft.model.ConnectorSource(c.format, c.options, c.hadoopConf, path)
}
