package graft

import graft.engine.GraftEngine
import org.apache.spark.sql.SparkSession

/** CLI entry point — the analogue of the reference's Main.scala:11-22
  * (`query.sparql mappings.ttl config [master]`): runs one SPARQL query
  * over the configured data lake and prints up to 20 rows + the count.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: graft.Cli <query.sparql> <mappings.ttl> <config.json> [master] [reorder]")
      sys.exit(2)
    }
    val Array(queryFile, mappingsFile, configFile) = args.take(3)
    val master = args.lift(3).getOrElse("local[*]")
    val reorder = args.lift(4).contains("reorder")
    def read(p: String) = {
      val s = scala.io.Source.fromFile(p)
      try s.mkString finally s.close()
    }
    val spark = GraftSession
      .builder(master, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = GraftEngine.execute(spark, read(queryFile), read(mappingsFile),
        read(configFile), reorderJoins = reorder)
      df.show(20, truncate = false)
      println(s"total: ${df.count()} rows")
    } catch {
      case e: Exception =>
        System.err.println(s"query failed: ${e.getMessage}")
        sys.exit(1)
    } finally spark.stop()
  }
}
