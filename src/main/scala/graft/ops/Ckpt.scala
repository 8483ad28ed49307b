package graft.ops

import org.apache.spark.sql.DataFrame

/** Release discipline for loop-carried `localCheckpoint` state — the
  * kCore "prevCkpt ladder", shared. `Dataset.unpersist` is a NO-OP for
  * checkpoint storage (it is not CacheManager-tracked), so an iterative
  * op that checkpoints per round without releasing the superseded
  * round's RDD accretes one dead block set per round per invocation.
  * Measured: four back-to-back g16 invocations in one JVM climbed
  * 14.2 → 24.9 s as dead label-table blocks piled into the storage
  * memory the live shuffles wanted (round-16 optimization notes). */
private[graft] object Ckpt {

  /** Handle on a localCheckpoint'ed DataFrame's persisted RDD. Returns
    * None for plans that are not checkpoint-rooted (safe to call on the
    * pre-loop lazy state). Caveat: matches the FIRST LogicalRDD in the
    * plan, so on a lazy projection OVER a checkpoint it returns that
    * underlying checkpoint — only release states whose underlying
    * checkpoint really is superseded. */
  def rddOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd }

  /** Release a SUPERSEDED checkpoint's blocks. Only call once nothing
    * will read `df` again — i.e. after the next round's checkpoint has
    * eagerly materialized (localCheckpoint's default), never on the
    * final state a caller still consumes. */
  def release(df: DataFrame): Unit =
    rddOf(df).foreach(_.unpersist(blocking = false))
}
