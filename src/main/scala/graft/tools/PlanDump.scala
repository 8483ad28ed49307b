package graft.tools
import org.apache.spark.sql.SparkSession
/** Debugging aid: print a gate's formatted physical plan plus a
  * collect()-based timing on top of Bench/MicroBench's noop-sink unit —
  * the collect additionally pays row transfer to the driver, which makes
  * driver-bound result shapes visible. (Historical note: before the
  * noop-sink migration, Bench timed `.count()`, which Catalyst can prune
  * hard enough to hide a hot branch entirely — this tool is how the
  * 20 s/pass quadratic bigram explode was first seen.)
  *   sbt "runMain graft.tools.PlanDump <gate> <sfDir>" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.collect()
    println(f"elapsed: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
