package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators — the write-side levers that make 100 TB
  * reads cheap. A parquet lake prunes row groups by min/max stats, but
  * stats only help when the data is CLUSTERED on the filtered columns;
  * sorting clusters one column and destroys the other. Z-ordering
  * interleaves the bits of several keys so rows close in ANY filtered
  * dimension land close on disk, and min/max pruning works for every
  * dimension at once (the Delta/Iceberg OPTIMIZE ZORDER primitive). */
object Layout {

  /** Morton (Z-curve) value of two non-negative integer keys: bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1. `bits` per key ≤ 31
    * (the z fits a long). Static bit positions → a flat chain of
    * codegen'd shift/mask terms, no UDF. Keys wider than `bits` are
    * masked (callers normalize or bucket first — interleaving cares
    * about locality, not exact magnitudes). */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of [1,31]: $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Cluster `df` on the Z-curve of (x, y) into `numPartitions` output
    * partitions: range-partition by z (so partition boundaries are
    * contiguous z-ranges — each output file covers a compact rectangle
    * union of key space) and sort within each (so row-group stats
    * narrow further inside the file). One shuffle, paid once at write
    * time; every later scan filtering on EITHER key prunes files by
    * footer stats. */
  def zorder(df: DataFrame, x: Column, y: Column, numPartitions: Int,
      bits: Int = 21): DataFrame =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
