package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration probe for the PQ gate knobs: for (m, k) combos, the ADC
  * rank of each true top-10 neighbor — the max over them is the minimum
  * `rerank` that makes PQ+re-rank exact on this corpus. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = e.filter(col("vec_id") =!= 0)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val trueTop = Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"), qv, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    for (m <- Seq(16); k <- Seq(16)) {
      val idx = Similarity.buildPq(corpus, col("vec_id"), col("embedding"), m, k)
      val adcRanked = idx.codes
        .select(col("vec_id"),
          graft.functions.VectorFunctions.pqAdc(col("codes"), idx.lut(qv), k).as("adc"))
        .orderBy(col("adc").desc, col("vec_id"))
        .select("vec_id").collect().map(_.getLong(0))
      val ranks = trueTop.map(id => adcRanked.indexOf(id) + 1)
      println(s"m=$m k=$k maxRankOfTrueTop10=${ranks.max} ranks=${ranks.toSeq.sorted}")
    }
    spark.stop()
  }
}
