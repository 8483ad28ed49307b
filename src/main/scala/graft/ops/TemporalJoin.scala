package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark has no native operator for, built from shuffle
  * shapes that survive 100 TB (net-new vs the reference, which has no
  * temporal operators at all).
  *
  * - [[asofJoinBackward]]: for each left row, the latest right row at or
  *   before its timestamp (per key) — ONE keyed shuffle + sort via the
  *   union-and-fill formulation, never a per-row lookup or a range
  *   cross-join. This is the classic "enrich events with the dimension
  *   state that was current at event time" operator.
  * - [[intervalJoin]]: point-in-interval join via slot bucketing — each
  *   interval replicates to the ⌈len/slot⌉+1 slots it overlaps, each
  *   point lands in exactly ONE slot, so the equi-join on slot produces
  *   every candidate pair exactly once (no dedup pass) and the exact
  *   containment filter runs scan-side. Beats Spark's default plan for
  *   inequality joins (BroadcastNestedLoopJoin, O(n·m)).
  */
object TemporalJoin {

  /** Backward (inclusive) as-of join. Left keeps all its rows/columns;
    * each gains `rightVals` from the latest right row with
    * `right.ts <= left.ts` for the same `key` (null when none exists —
    * left-outer semantics).
    *
    * Formulation: tag both inputs, union by name, one window per key
    * ordered by (ts, side) with right rows sorting before left rows on
    * ties (ties are inclusive: a right row AT the left timestamp
    * matches), then `last(value, ignoreNulls)` over an unbounded-
    * preceding frame fills each left row with the most recent right
    * value. Cost: one hash shuffle on `key` + one sort — the same bill
    * as any keyed window, independent of time-range density.
    *
    * Note: a NULL in a right value column is indistinguishable from
    * "no newer state" (ignoreNulls skips it) — encode deletions
    * explicitly if they matter. */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "asofJoinBackward needs at least one right value column")
    val leftCols = left.columns.toSeq
    val lAligned = rightVals.foldLeft(left.withColumn("__side", lit(1))) {
      (d, c) => d.withColumn(s"__rv_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rAligned = leftCols.filterNot(c => c == key || c == ts)
      .foldLeft(right.select(
        col(key) +: col(ts) +: rightVals.map(c => col(c).as(s"__rv_$c")): _*)
        .withColumn("__side", lit(0))) {
        (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(lAligned.unionByName(rAligned)) {
      (d, c) => d.withColumn(s"__rv_$c", last(col(s"__rv_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"__rv_$c").as(c)): _*)
  }

  /** Inner join of points to the intervals containing them
    * (`start <= pt <= end`, both ends inclusive). `ptTs`/`startTs`/`endTs`
    * are timestamp (or numeric-seconds) columns; `slotSeconds` is the
    * bucketing granularity — pick it near the median interval length:
    * replication factor per interval is ⌈len/slot⌉+1, while a too-coarse
    * slot packs many candidates into one bucket before the exact filter.
    * Output has the columns of both inputs (caller renames collisions). */
  def intervalJoin(points: DataFrame, ptTs: String, intervals: DataFrame,
      startTs: String, endTs: String, slotSeconds: Long): DataFrame = {
    require(slotSeconds > 0, "slotSeconds must be positive")
    // via timestamp: TIMESTAMP_NTZ refuses a direct long cast, and a
    // numeric-seconds column round-trips unchanged (session tz is only a
    // consistent offset — slotting needs consistency, not an epoch)
    def slotOf(c: Column) = floor(c.cast("timestamp").cast("long") / slotSeconds)
    val p = points.withColumn("__slot", slotOf(col(ptTs)))
    val i = intervals.withColumn("__slot",
      explode(sequence(slotOf(col(startTs)), slotOf(col(endTs)))))
    p.join(i, Seq("__slot"))
      .filter(col(ptTs) >= col(startTs) && col(ptTs) <= col(endTs))
      .drop("__slot")
  }
}
