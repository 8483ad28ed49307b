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

  /** Mongo connection URI from the reference's option shape
    * ({url, database, collection, options} — config:26-33; URI builder
    * Helpers.scala:154-161). */
  private[graft] def mongoUri(o: Map[String, String]): String = {
    val base = s"mongodb://${o.getOrElse("url", "127.0.0.1")}/" +
      s"${o.getOrElse("database", "db")}.${o.getOrElse("collection", "collection")}"
    o.get("options").filter(_.nonEmpty).fold(base)(opts => s"$base?$opts")
  }

  private var loaders: Map[String, Loader] = Map(
    "csv" -> ((spark, sc) => spark.read.options(sparkOpts(sc.options)).csv(sc.source)),
    // `bucketed_table` option: read via the session catalog instead of
    // the path — Spark's bucket metadata lives in the catalog, so only a
    // table read lets star joins on the bucket key consume the layout
    // (zero shuffle exchange on either side; written by
    // [[Sinks.bucketedTable]]). The path in `source` stays the mapping
    // key; the catalog table is the physical layout twin.
    "parquet" -> ((spark, sc) => sc.options.get("bucketed_table") match {
      case Some(tbl) => spark.table(tbl)
      case None => spark.read.options(sparkOpts(sc.options)).parquet(sc.source)
    }),
    "json" -> ((spark, sc) => spark.read.options(sparkOpts(sc.options)).json(sc.source)),
    // ORC ships in Spark core (vectorized reader + pushdown like
    // parquet); columnar twin for lakes standardized on ORC
    "orc" -> ((spark, sc) => spark.read.options(sparkOpts(sc.options)).orc(sc.source)),
    "jdbc" -> ((spark, sc) => spark.read.format("jdbc").options(sc.options).load()),
    // RDF N-Triples: one wide typed table per rdf:type class (reference
    // SparkExecutor.scala:101-104 → NTtoDF; class from source options)
    "rdf" -> ((spark, sc) => graft.sources.NtSource.read(spark, sc.source,
      sc.options.getOrElse("class",
        sys.error(s"rdf source ${sc.source} needs a 'class' option")))),
    "mongodb" -> ((spark, sc) =>
      try spark.read.format("mongodb")
        .option("connection.uri", mongoUri(sc.options))
        .option("database", sc.options.getOrElse("database", "db"))
        .option("collection", sc.options.getOrElse("collection", "collection"))
        .load()
      catch {
        case e: ClassNotFoundException => throw new IllegalStateException(
          "mongodb connector not on classpath; add its Spark connector jar", e)
      }),
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
