package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run FULL SQL statements against a throwaway session —
  * `runMain graft.tools.SqlProbe "<stmt>" ["<stmt>"...]` prints up to 20
  * result rows per statement. Complements [[ExprProbe]] (expression-only)
  * for statement-level capability probes (e.g. WITH RECURSIVE support).
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { s =>
      println(s"-- $s")
      try spark.sql(s).show(20, truncate = false)
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage.take(400)}") }
    }
    spark.stop()
  }
}
