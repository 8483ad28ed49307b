package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Result sinks. The reference only prints 20 rows + a count
  * (SparkExecutor.scala:543-556) and runs the plan twice doing it
  * (take then count — SURVEY §7.4.8); [[console]] does one pass over a
  * limited collect. File sinks are plain distributed writers. */
object Sinks {

  /** Print up to `n` rows + an exact count, executing the plan once for
    * the page (count reuses shuffle/exchange results where cached). */
  def console(df: DataFrame, n: Int = 20): Long = {
    val page = df.limit(n).collect()
    println(df.columns.mkString("|"))
    page.foreach(r => println(r.mkString("|")))
    val total = df.count()
    println(s"total: $total rows")
    total
  }

  def parquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  def csv(df: DataFrame, path: String, header: Boolean = true,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def json(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def jdbc(df: DataFrame, url: String, table: String, options: Map[String, String] = Map.empty,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.format("jdbc").options(options)
      .option("url", url).option("dbtable", table).mode(mode).save()

  /** Hive-layout partitioned parquet (the lake/training-shard layout):
    * one directory per partition-column value, so downstream readers get
    * partition pruning for free, and `maxRecordsPerFile` bounds file
    * size for shard-sized outputs (compose with
    * `Pipeline.packByTokenBudget`: partition by its `shard` column to
    * emit one directory per token-budget shard). */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
