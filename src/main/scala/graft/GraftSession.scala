package graft

import org.apache.spark.sql.SparkSession

/** Recommended SparkSession setup for the graft engine. Local mode here;
  * on a cluster keep the same SQL confs and size
  * `spark.sql.shuffle.partitions` to ~2-3× total executor cores and
  * `spark.sql.files.maxPartitionBytes` so scan partitions fit executor
  * memory at the target scale. */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events-style tables store TIMESTAMP(NANOS); affects only nanos cols
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 8)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
