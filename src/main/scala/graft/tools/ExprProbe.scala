package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: evaluate SQL expressions against a throwaway session —
  * `runMain graft.tools.ExprProbe "<expr>" ["<expr>"...]` prints one
  * result row per argument. Used to pin down Spark expression semantics
  * (split/ascii/round edge cases) before baking them into oracles. */
object ExprProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { e => println(s"PROBE $e => " + spark.sql(s"SELECT $e").head()) }
    spark.stop()
  }
}
