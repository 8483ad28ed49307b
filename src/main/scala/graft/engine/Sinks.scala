package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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

  def orc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

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

  /** Bucketed managed table — the co-located-join layout: two tables
    * bucketed (and sorted) by the same key into the same bucket count
    * join with NO shuffle exchange on either side (the scan reports the
    * bucket hash partitioning, so SortMergeJoin consumes both scans
    * directly). At 100 TB this converts every recurring fact⋈fact join
    * on the bucket key from two full-corpus shuffles into none — the
    * write pays the shuffle once, every subsequent join skips it.
    * Managed-table API because Spark's bucket metadata lives in the
    * catalog, not the parquet footer. */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (by name, via the session catalog). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
