package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: find pairs of near-identical
  * string keys (vendor names, authors, titles) across or within tables.
  *
  * Scale shape: never the cross product. (1) collapse to the DISTINCT
  * key table first — at corpus scale the value domain is orders of
  * magnitude smaller than the row count (the BPE distinct-word move);
  * (2) self-join only within a cheap blocking key (prefix here; callers
  * pick soundex-lite or length bands via `blockKey`); (3) score the
  * surviving candidates with the codegen'd [[graft.functions.HashFunctions.jaroWinkler]]
  * expression. Scores are floor-rounded to 4 dp BEFORE the threshold
  * compare so keep/drop decisions are bit-identical cross-engine.
  *
  * Blocking trades recall for the quadratic: a true match pair whose
  * keys disagree on the blocking key is never scored. That is the
  * documented contract (same as every LSH gate here) — pick blocking
  * keys the match-invariant of your domain preserves. */
object Linkage {

  /** Within-block near-match pairs of distinct `key` values with
    * Jaro-Winkler ≥ `threshold`. Output: (name_a, name_b, jw),
    * name_a < name_b. */
  def jwPairs(df: DataFrame, key: Column, blockKey: Column => Column,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold out of (0,1]: $threshold")
    val names = df.select(key.as("name")).filter(col("name").isNotNull)
      .distinct()
      .select(col("name"), blockKey(col("name")).as("__blk"))
    val jw = graft.functions.HashFunctions.jaroWinkler(col("name_a"), col("name_b"))
    names.select(col("__blk"), col("name").as("name_a"))
      .join(names.select(col("__blk"), col("name").as("name_b")), Seq("__blk"))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        (floor(jw * 10000 + 0.5) / 10000).as("jw"))
      .filter(col("jw") >= threshold)
  }
}
