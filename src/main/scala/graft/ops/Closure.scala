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
      if (n2 == n) return next // fixpoint: no new pairs
      r = next; n = n2; round += 1
    }
    sys.error(s"transitive closure did not converge in $maxRounds rounds")
  }
}
