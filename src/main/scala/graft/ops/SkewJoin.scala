package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles most cases at
  * runtime (`spark.sql.adaptive.skewJoin.enabled`); explicit salting is the
  * deterministic fallback when one key dominates so hard that even split
  * partitions overwhelm a task, or when AQE is unavailable (e.g. inside a
  * cached/reused exchange).
  *
  * Left rows get a random salt in [0, buckets); right rows are replicated
  * once per salt value. The join key becomes (key, salt), spreading a hot
  * key over `buckets` tasks. Semantics are exactly those of the plain
  * inner equi-join (verified by spec).
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // deterministic salt from the row content is NOT required — any
    // distribution works because the right side carries every salt value
    val salted = left
      .withColumn("__salt", (rand(42) * buckets).cast("int"))
      .withColumn("__lk", leftKey)
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__rk", rightKey)
    salted.join(replicated,
        salted("__lk") === replicated("__rk") &&
          salted("__salt") === replicated("__salt"), "inner")
      .drop("__salt", "__lk", "__rk")
  }
}
