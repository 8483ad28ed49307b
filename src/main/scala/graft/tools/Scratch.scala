package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for optimization work — not shipped
  * behavior; holds whatever experiment the current session needs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val perturbed = e0.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), (x, i0) =>
        x * (lit(1.0) + ((col("vec_id") * 131 + (i0 + 1) * 773) % 1000 - 500)
          .cast("double") * lit(4e-6))).as("embedding"))
    val full = e0.union(perturbed)
    val base = full.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val k = 80
    for (rep <- 1 to 2) {
      val m1 = t(s"rep$rep fit FULL (40k, k=$k)")(
        new KMeans().setK(k).setSeed(42L).setFeaturesCol("features").fit(base))
      t(s"rep$rep transform full")(
        m1.transform(base).select("vec_id", "prediction")
          .write.mode("overwrite").format("noop").save())
      val sample = base.filter(pmod(xxhash64(col("vec_id")), lit(8)) === 0)
      println(s"[scratch] sample rows: ${sample.count()}")
      val m2 = t(s"rep$rep fit SAMPLE (~5k, k=$k)")(
        new KMeans().setK(k).setSeed(42L).setFeaturesCol("features").fit(sample))
      t(s"rep$rep transform full (sample model)")(
        m2.transform(base).select("vec_id", "prediction")
          .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
