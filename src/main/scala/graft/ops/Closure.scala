package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive closure of an edge relation — the engine side of SPARQL 1.1
  * arbitrary-length property paths (`p+`/`p*`). The reference has no
  * property paths at all (its own evaluation drops BSBM Q9/Q11/Q12,
  * evaluation/README.md:9); this is net-new capability.
  *
  * Algorithm: iterated squaring — R_{k+1} = R_k ∪ (R_k ⋈ R_k) — the join
  * analogue of the pointer jumping used by
  * [[Dedup.connectedComponents]]: reachable path length doubles per
  * round, so a graph of diameter d converges in ⌈log₂ d⌉ rounds, not d.
  * 100 TB design: only (src, dst) pairs ride the loop, each round is one
  * keyed shuffle (join on dst=src) + distinct, and `localCheckpoint`
  * truncates lineage so round N's plan does not replay rounds 1..N-1.
  * The closure's SIZE is inherent to the semantics (can be O(n·depth));
  * the loop never materializes more than the closure itself.
  */
object Closure {

  /** Eagerly materialize `df` AND re-root it with fresh attribute ids.
    *
    * `localCheckpoint` alone keeps the child plan's exprIds, so two
    * loop-carried relations that both descend from the same checkpointed
    * edge table share ids — and `union(...).localCheckpoint` then dies in
    * `Union.rewriteConstraints` ("key not found: src#N") when
    * `LogicalRDD.fromDataset` rewrites constraints over duplicate ids.
    * `createDataFrame(df.rdd, df.schema)` cuts the Catalyst lineage with
    * FRESH ids; the follow-up `localCheckpoint(true)` on that plain
    * LogicalRDD (never a Union) materializes eagerly and truncates the
    * RDD lineage so round N does not replay rounds 1..N-1. */
  private def pin(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema).localCheckpoint(true)

  /** All pairs (src, dst) with a directed path src →⁺ dst. Input must
    * have columns `src` and `dst`; null endpoints are dropped (an
    * unterminated hop, e.g. a hierarchy root's absent parent). Throws if
    * the fixpoint is not reached in `maxRounds` squarings — 2^32 hops is
    * beyond any real graph, so exhaustion means a data problem, not a
    * tuning problem. */
  def transitive(edges: DataFrame, maxRounds: Int = 32): DataFrame = {
    var r = edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(true)
    var n = r.count()
    var round = 0
    while (round < maxRounds) {
      val stepped = r.as("a").join(r.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      val next = r.union(stepped).distinct().localCheckpoint(true)
      val n2 = next.count()
      // next's eager checkpoint consumed r — release the superseded
      // round's blocks (graft.ops.Ckpt ladder; the fixpoint result stays)
      Ckpt.release(r)
      if (n2 == n) return next // fixpoint: no new pairs
      r = next; n = n2; round += 1
    }
    sys.error(s"transitive closure did not converge in $maxRounds rounds")
  }

  /** Pairs (src, dst) with a path src →⁺ dst restricted to `src ∈ seeds`
    * — frontier BFS, for SEEDED reachability (the closure subject is
    * constrained to a small start set). Work is O(reachable-from-seeds),
    * not O(full closure): [[transitive]] + post-filter would materialize
    * every ancestor chain in the graph to keep a handful; at 100× data
    * that is the difference between touching the whole graph and
    * touching one subtree. Rounds equal graph DEPTH (one keyed shuffle
    * each, frontier anti-joined against the reached set so cycles
    * terminate), vs [[transitive]]'s log-diameter squarings — the right
    * trade exactly when the seed set is selective.
    *
    * `seeds` needs a `src` column; `edges` needs `src`/`dst` (null
    * endpoints dropped, as in [[transitive]]). */
  def fromSeeds(edges: DataFrame, seeds: DataFrame, maxRounds: Int = 10000): DataFrame = {
    val e = pin(edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    // round 0: one hop out of the seed set
    var frontier = pin(seeds.select(col("src")).distinct().join(e, Seq("src")))
    // the reached set is the union of the per-round frontiers — DISJOINT
    // by construction (each frontier is anti-joined against all earlier
    // ones), so no distinct is needed and, critically, only each round's
    // NEW pairs are ever materialized: re-checkpointing the accumulated
    // set every round would cost O(|reached| x depth) total I/O, this
    // costs O(|closure|). The union of checkpointed leaves stays a flat
    // plan — no recursive lineage to truncate.
    var fronts = List(frontier)
    def reached = fronts.reduce(_.union(_))
    var drained = frontier.isEmpty
    var round = 0
    while (round < maxRounds && !drained) {
      val stepped = frontier.as("f").join(e.as("e"), col("f.dst") === col("e.src"))
        .select(col("f.src").as("src"), col("e.dst").as("dst")).distinct()
      // only genuinely new pairs advance — termination on cyclic graphs
      frontier = pin(stepped.join(reached, Seq("src", "dst"), "left_anti"))
      drained = frontier.isEmpty
      if (!drained) fronts ::= frontier
      round += 1
    }
    // converged iff the frontier drained — round == maxRounds with an
    // empty frontier is still a fixpoint, not an error
    if (!drained)
      sys.error(s"seeded closure did not converge in $maxRounds rounds")
    // the result is the union of the per-round frontier checkpoints; the
    // pinned edge table and the drained (empty, never-appended) final
    // frontier are not part of it (Ckpt ladder)
    Ckpt.release(e)
    if (!fronts.headOption.contains(frontier)) Ckpt.release(frontier)
    reached
  }
}
