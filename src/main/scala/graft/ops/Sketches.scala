package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch roll-ups (Apache DataSketches HLL via Spark's
  * `hll_sketch_agg` family). The 100 TB pattern this encodes: distinct
  * counts are NOT re-scanned per reporting scope — per-group (or
  * per-partition, per-day) sketches are built once in the corpus pass,
  * persisted as binary columns, and any coarser scope is answered by
  * register-wise union of the stored sketches. The union holds the same
  * register maxima a direct sketch of the combined data would, but its
  * ESTIMATE can differ slightly: a direct sketch answers from its HIP
  * accumulator, while a union result is "out of order" and falls back
  * to the composite estimator (DataSketches HLL documented behavior).
  * Both sit inside the sketch's error bounds — which is what the t22
  * gate pins against the exact twin. */
object Sketches {

  /** Per-group HLL distinct sketches with a merged grand total.
    *
    * Output: one row per group — (scope, n_exact, est, est_direct=null)
    * — plus a `__ALL__` row where `est` is the estimate of the UNION of
    * the per-group sketches and `est_direct` the estimate of a sketch
    * built directly over all rows: both within error bounds of the
    * exact union count (HIP vs composite estimator — see above).
    *
    * `n_exact` (a full distinct aggregation) rides along as the
    * verification twin — at 100 TB only the sketch column runs; the
    * exact twin is what a verifying engine can restate (the t09/t10
    * measured-error shape). */
  def hllRollup(df: DataFrame, group: Column, value: Column,
      lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK out of DataSketches range: $lgK")
    val base = df.select(group.cast("string").as("scope"), value.as("__v"))
    val per = base.groupBy(col("scope")).agg(
      expr(s"hll_sketch_agg(__v, $lgK)").as("sk"),
      countDistinct(col("__v")).as("n_exact"))
    val perOut = per.select(col("scope"), col("n_exact"),
      expr("hll_sketch_estimate(sk)").as("est"),
      lit(null).cast("long").as("est_direct"))
    val merged = per.agg(expr("hll_union_agg(sk)").as("sku"))
    val direct = base.agg(expr(s"hll_sketch_agg(__v, $lgK)").as("skd"),
      countDistinct(col("__v")).as("n_exact"))
    val allOut = direct.crossJoin(merged).select(lit("__ALL__").as("scope"),
      col("n_exact"), expr("hll_sketch_estimate(sku)").as("est"),
      expr("hll_sketch_estimate(skd)").as("est_direct"))
    perOut.unionByName(allOut)
  }

  /** Relative standard error of an HLL sketch at `lgK` (DataSketches
    * HLL_8 bound, ≈1.04/√k) — for callers turning estimates into
    * error-bounded verdicts. */
  def hllRse(lgK: Int): Double = 1.04 / math.sqrt((1 << lgK).toDouble)
}
