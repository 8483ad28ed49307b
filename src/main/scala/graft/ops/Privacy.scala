package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy/governance operators beyond row erasure (the e09 GDPR gate):
  * re-identification risk measurement and suppression for releasing
  * aggregate or row-level extracts of a corpus.
  *
  * k-anonymity: a quasi-identifier (QI) combination held by fewer than
  * k rows re-identifies its holders by linkage. l-diversity: a QI group
  * whose SENSITIVE attribute takes < l distinct values discloses that
  * attribute even at k-anonymous sizes (everyone in the cell shares
  * it). Both are one map-side-combined aggregate over the QI key — the
  * report is cell-count-bounded, never row-bounded; suppression is one
  * window-count filter on the same partitioning (one shuffle total). */
object Privacy {

  /** QI cells with fewer than `k` rows: (qi..., n_rows). Empty result =
    * the release is k-anonymous on these QIs. */
  def kAnonymityReport(df: DataFrame, qis: Seq[Column], k: Int): DataFrame = {
    require(qis.nonEmpty && k >= 2, s"need QIs and k >= 2 (k=$k)")
    df.groupBy(qis: _*).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") < k)
  }

  /** Suppression to k-anonymity: drop every row whose QI cell is
    * smaller than `k` (the minimal-distortion release: no
    * generalization hierarchy needed, at the cost of the suppressed
    * tail). One shuffle — the window count rides the QI partitioning. */
  def suppressSmallGroups(df: DataFrame, qis: Seq[Column], k: Int): DataFrame = {
    require(qis.nonEmpty && k >= 2, s"need QIs and k >= 2 (k=$k)")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(qis: _*)
    df.withColumn("__cell_n", count(lit(1)).over(w))
      .filter(col("__cell_n") >= k)
      .drop("__cell_n")
  }

  /** QI cells whose sensitive attribute shows fewer than `l` distinct
    * values: (qi..., n_rows, n_distinct_sensitive). These cells leak
    * the attribute by membership alone. */
  def lDiversityReport(df: DataFrame, qis: Seq[Column], sensitive: Column,
      l: Int): DataFrame = {
    require(qis.nonEmpty && l >= 2, s"need QIs and l >= 2 (l=$l)")
    df.groupBy(qis: _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(sensitive).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") < l)
  }

  /** t-closeness report for an ORDERED sensitive attribute (Li, Li &
    * Venkatasubramanian 2007): per QI cell, the Earth Mover's Distance
    * between the cell's sensitive-value distribution and the global one
    * under the ordered-distance ground metric,
    * EMD = (1/(m−1)) · Σ_{i<m} |P_cum(v_i) − Q_cum(v_i)| over the m
    * global distinct values. Cells with EMD > `t` leak the attribute's
    * skew even when k-anonymous and l-diverse (the classic salary-range
    * example). Intended for LOW-cardinality ordered attributes (ages,
    * brackets, scores) — the standard t-closeness setting; bucket a
    * continuous attribute first.
    *
    * Exactness: fully integer until one final division —
    * |cumCell·N − cumGlobal·cellN| is an exact DECIMAL(38,0) (int128
    * headroom: safe to N ≈ 10¹⁹ row-pairs), summed exactly, divided
    * once by cellN·N·(m−1) and 6-dp floored. No float cumulative sums,
    * so no summation-order hazard at all.
    *
    * Scale shape: three map-side-combined aggregates (global values,
    * cell sizes, cell×value counts) + a cells×values grid that is
    * report-sized (|cells|·m), never row-sized; the cumulative window
    * partitions by cell over ≤ m rows. Output: (qi..., n_rows, emd6)
    * for cells with emd6 > t. */
  def tClosenessReport(df: DataFrame, qis: Seq[Column], sensitive: Column,
      t: Double): DataFrame = {
    require(qis.nonEmpty && t > 0.0 && t < 1.0, s"need QIs and 0 < t < 1 (t=$t)")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val base = df.select((qis :+ sensitive.as("__v")): _*)
    val qiNames = base.columns.dropRight(1).toSeq
    val qiCols = qiNames.map(col)
    val gvals = base.groupBy(col("__v")).agg(count(lit(1)).as("__gcnt"))
      .withColumn("__gcum", sum(col("__gcnt")).over(
        Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, 0)))
    val stats = gvals.agg(sum(col("__gcnt")).as("n"),
      count(lit(1)).as("m")).head()
    val bigN = stats.getLong(0)
    val m = stats.getLong(1)
    val cells = base.groupBy(qiCols: _*).agg(count(lit(1)).as("n_rows"))
    val cellv = base.groupBy((qiCols :+ col("__v")): _*)
      .agg(count(lit(1)).as("__ccnt"))
    val grid = cells.crossJoin(broadcast(gvals.select(col("__v"), col("__gcum"))))
      .join(cellv, qiNames :+ "__v", "left")
      .withColumn("__ccnt", coalesce(col("__ccnt"), lit(0L)))
    val wCell = Window.partitionBy(qiCols: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val num = grid
      .withColumn("__ccum", sum(col("__ccnt")).over(wCell))
      .withColumn("__d",
        abs(col("__ccum").cast(DecimalType(38, 0)) * bigN
          - col("__gcum").cast(DecimalType(38, 0)) * col("n_rows")))
      .groupBy((qiCols :+ col("n_rows")): _*)
      .agg(sum(col("__d")).as("__num"))
    val emd6 =
      if (m <= 1) lit(0.0)
      else floor(col("__num").cast("double")
        / (col("n_rows").cast("double") * bigN.toDouble * (m - 1).toDouble)
        * 1000000 + 0.5) / 1000000
    num.select((qiCols :+ col("n_rows") :+ emd6.as("emd6")): _*)
      .filter(col("emd6") > t)
  }

  /** Laplace-noised group counts (ε-DP mechanism shape, sensitivity 1,
    * b = 1/ε): the noisy-histogram release for sharing corpus
    * composition without exact membership counts. Noise is drawn by
    * inverse-CDF from the portable salted hash of the group key — NOT
    * fresh randomness: with a public salt this is NOT differential
    * privacy (the noise is recomputable); it is the reproducible-audit
    * mode, where the salt is the secret and any holder of it can verify
    * the release bit-for-bit on any engine. Rotate + withhold the salt
    * for an actual release.
    *
    * One map-side-combined count per group; the noise expression is
    * per-row scan math on the group table (domain-sized). noisy4 is a
    * 4-dp-floored double — one identical IEEE expression per row on
    * every engine (u never hits 0.5 exactly: u = (bucket+0.5)/10⁴ with
    * integer buckets, so sign(u−0.5) is ±1 and ln(1−2|u−0.5|) ≥
    * ln(10⁻⁴) stays finite). Output: (group, n_true, noisy4). */
  def dpNoisyCounts(df: DataFrame, group: Column, epsilon: Double,
      salt: String): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be > 0: $epsilon")
    val counts = df.groupBy(group.as("group")).agg(count(lit(1)).as("n_true"))
    val u = (Pipeline.deterministicBucket(col("group"), salt).cast("double")
      + 0.5) / 10000.0
    val lap = lit(-1.0 / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    counts.select(col("group"), col("n_true"),
      (floor((col("n_true").cast("double") + lap) * 10000 + 0.5) / 10000)
        .as("noisy4"))
  }
}
