package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph operators. In a pretraining pipeline the web link graph is
  * a quality signal (authority-weighted sampling, seed-list expansion),
  * and the graph is the one input that routinely dwarfs the text: edges
  * at 100 TB scale shuffle-join against a rank vector every iteration,
  * so the iteration body must be nothing but one join + one aggregation
  * on pre-partitioned edges. */
object Graph {

  /** PageRank over a directed edge list, fixed iteration count,
    * simplified model (dangling mass is NOT redistributed — a node with
    * no out-edges absorbs rank; deterministic and cheaper by one global
    * aggregate per iteration than the redistributing variant, and the
    * variant any SQL engine can restate for verification).
    *
    * Scale shape: edges are deduplicated, joined once with out-degrees,
    * hash-partitioned by `src` and persisted — every iteration then
    * reuses that layout for its rank join (shuffle only on the
    * aggregation's `dst` side) and `localCheckpoint` truncates the rank
    * lineage so the plan does not grow per iteration (the classic
    * iterative-DataFrame blowup). Rank state is one (node, double) row
    * per vertex.
    *
    * Output: (node, rank), unnormalized ranks of the simplified model. */
  def pageRank(edges: DataFrame, src: Column, dst: Column,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ew = e.join(outdeg, "src").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = lit((1.0 - damping) / n)
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = ew.join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    nodes.unpersist(); ew.unpersist()
    ranks
  }
}
