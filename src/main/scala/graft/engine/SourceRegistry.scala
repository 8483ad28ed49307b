package graft.engine

import graft.model.SourceConfig
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable source loaders keyed by store type — same option contract as the
  * reference's config (evaluation/input_files/config:2-53; dispatch
  * SparkExecutor.scala:85-106). csv/parquet/json/jdbc are built-in Spark
  * formats; mongodb/cassandra/elasticsearch keep the reference's option
  * shape but need their DSv2 connector jars on the classpath at runtime
  * (not available in this offline build — they fail with a clear error).
  */
object SourceRegistry {

  type Loader = (SparkSession, SourceConfig) => DataFrame

  /** Reference option keys use '_' where Spark uses '.'
    * (e.g. spark_sql_parquet_filterPushdown, config:16). */
  private def sparkOpts(o: Map[String, String]): Map[String, String] =
    o.map { case (k, v) => k.replace('_', '.') -> v }

  private var loaders: Map[String, Loader] = Map(
    "csv" -> ((spark, sc) => spark.read.options(sparkOpts(sc.options)).csv(sc.source)),
    "parquet" -> ((spark, sc) => spark.read.options(sparkOpts(sc.options)).parquet(sc.source)),
    "json" -> ((spark, sc) => spark.read.options(sparkOpts(sc.options)).json(sc.source)),
    "jdbc" -> ((spark, sc) => spark.read.format("jdbc").options(sc.options).load()),
    "mongodb" -> connectorLoader("mongodb", "mongodb"),
    "cassandra" -> connectorLoader("cassandra", "org.apache.spark.sql.cassandra"),
    "elasticsearch" -> connectorLoader("elasticsearch", "org.elasticsearch.spark.sql"))

  private def connectorLoader(name: String, format: String): Loader =
    (spark, sc) =>
      try spark.read.format(format).options(sc.options).load()
      catch {
        case e: ClassNotFoundException =>
          throw new IllegalStateException(
            s"$name connector not on classpath; add its Spark connector jar", e)
      }

  def register(storeType: String, loader: Loader): Unit =
    synchronized { loaders += storeType -> loader }

  def load(spark: SparkSession, sc: SourceConfig): DataFrame =
    loaders.getOrElse(sc.storeType,
      sys.error(s"unknown store type '${sc.storeType}' for source ${sc.source}"))(spark, sc)
}
