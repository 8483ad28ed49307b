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
    * pre-loop lazy state). Caveat: on a lazy projection OVER a
    * checkpoint it returns that underlying checkpoint — only release
    * states whose underlying checkpoint really is superseded. A plan
    * containing MORE than one LogicalRDD (e.g. a join of two
    * checkpointed frames) has no well-defined "its" checkpoint: the
    * old collectFirst silently released an arbitrary one, so this now
    * returns None and logs — a bounded leak instead of a silent
    * release of a frame someone still reads (round-16 ADVICE). */
  def rddOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] = {
    val rdds = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd }
    if (rdds.size > 1) {
      System.err.println(s"[Ckpt] release skipped: plan contains ${rdds.size} " +
        "checkpoint roots (ambiguous owner); blocks leak until JVM exit")
      None
    } else rdds.headOption
  }

  /** Release a SUPERSEDED checkpoint's blocks. Only call once nothing
    * will read `df` again — i.e. after the next round's checkpoint has
    * eagerly materialized (localCheckpoint's default), never on the
    * final state a caller still consumes. */
  def release(df: DataFrame): Unit =
    rddOf(df).foreach(_.unpersist(blocking = false))
}
