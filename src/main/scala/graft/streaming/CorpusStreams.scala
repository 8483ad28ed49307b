package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the `documents` corpus shape: the
  * scan-stage text operators (C4 line cleaning, hashed linear
  * classification, deterministic sampling) are all stateless per-row
  * Columns, so the SAME plan compiles batch or streaming with no
  * operator changes — this is what lets one filtering codebase serve
  * both the backfill (batch over the lake) and the live ingest tail
  * (readStream over the landing dir) without semantic drift. */
object CorpusStreams {

  /** The streaming corpus-filter plan: C4-clean each document, drop
    * docs with no surviving line, score the CLEANED text with the
    * hashed linear classifier (4-dp margin). Stateless — append mode,
    * no watermark, no state store; at scale this runs as pure per-file
    * map work on whatever micro-batch cadence the ingest produces. */
  def filterPlan(docs: DataFrame, weights: Seq[Double], bias: Double): DataFrame =
    TextOps.c4LineClean(docs, col("doc_id"), col("text"),
        minLineWords = 3, minKeptLines = 1)
      .filter(col("c4_keep"))
      .withColumn("margin",
        floor(TextOps.hashedLinearMargin(col("clean_text"), weights, bias)
          * 10000 + 0.5) / 10000)
      .select(col("doc_id"), col("n_kept"), col("margin"))

  /** Run [[filterPlan]] as a real AvailableNow streaming query over the
    * documents parquet (file source → memory sink) and return the
    * collected result — the batch-equivalence gate entry point. `prep`
    * is applied to the STREAMING frame before the filter (stateless
    * per-row transforms only — e.g. the gate's planted test lines). */
  def runFilterBatch(spark: SparkSession, docsPath: String,
      weights: Seq[Double], bias: Double,
      prep: DataFrame => DataFrame = identity): DataFrame =
    EventStreams.runToMemory(spark,
      filterPlan(prep(EventStreams.streamParquet(spark, docsPath, "docs_stream")),
        weights, bias),
      name = "corpus_filter", mode = "append")
}
