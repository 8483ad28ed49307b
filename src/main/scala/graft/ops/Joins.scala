package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-join skew tools.
  *
  * At 100 TB one hot join key (the null-ish user, the default date, the
  * crawler's favourite URL host) lands every matching probe row in ONE
  * reducer task and the stage runs at the speed of that straggler. AQE's
  * runtime skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first-line fix — it re-splits oversized partitions
  * after the shuffle is materialized, costs nothing when skew is absent,
  * and needs no replication. Explicit salting remains the tool for the
  * layouts AQE cannot rewrite: a skewed key arriving through a bucketed
  * (zero-Exchange) scan AQE won't re-split, skew inside a single
  * stream-static join micro-batch, or a deliberately pinned
  * shuffle-partition count. */
object Joins {

  /** Inner equi-join with the probe side's hot keys spread over `salts`
    * reducer partitions: each probe row gets a deterministic salt in
    * [0, salts) hashed from `probeSaltBy` (any column set that varies
    * WITHIN a join key — row identity, a line number; never the key
    * itself), the build side is replicated ×salts with every salt value,
    * and the join runs on (key, salt). A key holding N probe rows thus
    * shuffles as `salts` groups of ≈N/salts rows instead of one group of
    * N. Row-identical to `probe.join(build, key)` — spec-asserted.
    *
    * Cost model: build-side shuffle volume multiplies by `salts` (probe
    * volume is unchanged), so size `salts` to the straggler ratio being
    * fixed — 8–32 covers task-time skews up to ~30× at one extra copy
    * of the (smaller) build side per salt. The salt is appended to the
    * shuffle key, not the row count: no correctness interaction with
    * AQE, which still coalesces/splits the salted partitions freely. */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame, key: String,
      probeSaltBy: Column, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val p = probe.withColumn("__salt",
      pmod(xxhash64(lit("saltj"), probeSaltBy), lit(salts)).cast("int"))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }
}
