package graft.tools

import graft.ops.SkewJoin
import org.apache.spark.sql.SparkSession

/** Example: salted skew join vs plain join — same result, hot keys spread
  * over N buckets. Run: `sbt "runMain graft.tools.SkewJoinDemo"`. */
object SkewJoinDemo {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    val salted = SkewJoin.saltedEquiJoin(li, o, li("l_orderkey"), o("o_orderkey"), 8)
    val saltedCount = salted.count()
    println(s"plain=$plain salted=$saltedCount equal=${plain == saltedCount}")
    spark.stop()
  }
}
