package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measured recall@10 of the ANN paths vs exact brute force,
  * across knob settings — for picking gate floors empirically. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // arg "clustered" probes the in-code clustered fixture instead
    val e = if (sf == "clustered") graft.OpsQueries.clusteredEmb(spark)
      else spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = e.filter(col("vec_id") >= 20).cache()
    val qs = e.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def avgRecall(ann: Seq[Double] => DataFrame): Double = {
      val rs = qs.map { case (_, qv) =>
        val ex = Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"), qv, 10)
          .select("vec_id").as[Long].collect().toSet
        val an = ann(qv).select("vec_id").as[Long].collect().toSet
        (an & ex).size / 10.0
      }
      rs.sum / rs.length
    }
    for ((np, ph) <- Seq((12, 2), (12, 3), (8, 2), (8, 3), (6, 2)))
      println(f"LSH planes=$np probe=$ph recall=${avgRecall(qv =>
        Similarity.annTopK(corpus, col("vec_id"), col("embedding"), qv, 10, np, ph))}%.2f")
    val (autoL, autoP) = Similarity.autoIvfParams(corpus.count())
    for ((nl, np) <- Seq((16, 4), (16, 6), (16, 8), (8, 3), (8, 4), (autoL, autoP))) {
      val idx = Similarity.buildIvf(corpus, col("vec_id"), col("embedding"), nl)
      println(f"IVF lists=$nl probe=$np recall=${avgRecall(qv => idx.topK(qv, 10, np))}%.2f")
    }
    // kNN join recall
    def pairs(df: DataFrame) =
      df.select(col("q_id"), col("c_id")).as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.knnJoinBroadcast(e, e, col("vec_id"), col("embedding"),
      col("vec_id"), col("embedding"), 3))
    val (jl, jp) = Similarity.autoIvfParams(e.count())
    for ((nl, np) <- Seq((16, 8), (16, 12), (8, 4), (8, 6), (jl, jp))) {
      val approx = pairs(Similarity.knnJoinIvf(e, e, col("vec_id"), col("embedding"),
        col("vec_id"), col("embedding"), 3, Some(nl), Some(np)))
      println(f"KNN-IVF lists=$nl probe=$np recall=${(approx & exact).size.toDouble / exact.size}%.2f")
    }
    spark.stop()
  }
}
