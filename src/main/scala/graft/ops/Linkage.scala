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

  /** 9-dp floor — the cross-engine quantization contract of the EM. */
  private def q9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  /** Exact decimal view of a 9-dp-floored double (what SQL's
    * CAST(x AS DECIMAL(38,9)) yields): the double sits within an ulp of
    * k/10⁹, never on a rounding tie, so HALF_UP recovers k/10⁹ in any
    * engine. */
  private def d9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  /** Fellegi-Sunter EM over candidate pairs' field-agreement patterns:
    * unsupervised estimates of P(match) and each field's agreement
    * probability among matches (m) and non-matches (u) — the weights
    * probabilistic record linkage scores pairs with (Fellegi & Sunter
    * 1969; Winkler's EM formulation).
    *
    * Scale shape: ONE distributed pass collapses the pair table to its
    * ≤2^F distinct agreement patterns with counts (F ≤ 10), and EM runs
    * on the driver over that pattern table — n-independent, the s19 PCA
    * discipline (the collect is 2^F-bounded, never pair-bounded). Every
    * EM step is quantized (per-pattern posterior 9-dp-floored; M-step
    * sums exact DECIMAL(38,9); parameter updates 9-dp-floored after one
    * double division), so a SQL twin restates the whole fit
    * bit-for-bit with unrolled per-iteration CTEs.
    *
    * Returns ((p, m, u), patterns) — the fitted parameters and the
    * per-pattern decision table (bits, count, posterior) from a final
    * E-step at the fitted parameters. */
  def fellegiSunterParams(pairs: DataFrame, agreements: Seq[Column],
      iterations: Int = 10, initP: Double = 0.2, initM: Double = 0.8,
      initU: Double = 0.2): ((Double, Array[Double], Array[Double]),
        Seq[(Seq[Int], Long, Double)]) = {
    val f = agreements.size
    require(f >= 1 && f <= 10, s"1..10 comparison fields: $f")
    require(iterations >= 1 && iterations <= 50, s"iterations out of [1,50]: $iterations")
    val gcols = agreements.zipWithIndex.map { case (c, i) =>
      c.cast("int").as(s"g$i")
    }
    val pat = pairs.select(gcols: _*)
      .groupBy((0 until f).map(i => col(s"g$i")): _*)
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => ((0 until f).map(r.getInt).toSeq, r.getLong(f)))
      .toSeq
    val totalN = BigDecimal(pat.map(_._2).sum)
    var p = q9(initP)
    var m = Array.fill(f)(q9(initM))
    var u = Array.fill(f)(q9(initU))
    def eStep(): Seq[(Seq[Int], Long, Double)] = pat.map { case (g, n) =>
      var a = p; var b = 1.0 - p
      var i = 0
      while (i < f) {
        a *= (if (g(i) == 1) m(i) else 1.0 - m(i))
        b *= (if (g(i) == 1) u(i) else 1.0 - u(i))
        i += 1
      }
      (g, n, q9(a / (a + b)))
    }
    for (_ <- 1 to iterations) {
      val ws = eStep()
      val sw = ws.map { case (_, n, w) => d9(w) * BigDecimal(n) }.sum
      val sc = ws.map { case (_, n, w) => d9(1.0 - w) * BigDecimal(n) }.sum
      p = q9(sw.toDouble / totalN.toDouble)
      m = (0 until f).map { i =>
        val num = ws.collect { case (g, n, w) if g(i) == 1 => d9(w) * BigDecimal(n) }.sum
        q9(num.toDouble / sw.toDouble)
      }.toArray
      u = (0 until f).map { i =>
        val num = ws.collect { case (g, n, w) if g(i) == 1 => d9(1.0 - w) * BigDecimal(n) }.sum
        q9(num.toDouble / sc.toDouble)
      }.toArray
    }
    ((p, m, u), eStep())
  }

  /** [[fellegiSunterParams]] as a gate-shaped DataFrame: one row per
    * observed agreement pattern — (pattern, n, w9) where `pattern` is
    * the bit string g0..g(F−1) and w9 the fitted match posterior. This
    * is the linkage decision table: patterns with w9 near 1 auto-link,
    * near 0 auto-reject, the middle goes to review. */
  def fellegiSunter(pairs: DataFrame, agreements: Seq[Column],
      iterations: Int = 10, initP: Double = 0.2, initM: Double = 0.8,
      initU: Double = 0.2): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val (_, ws) = fellegiSunterParams(pairs, agreements, iterations,
      initP, initM, initU)
    ws.map { case (g, n, w) => (g.mkString, n, w) }
      .toDF("pattern", "n", "w9")
  }

  /** Blocking-scheme audit — the numbers that justify (or condemn) a
    * blocking key BEFORE running the expensive comparison stage:
    * reduction ratio RR = 1 − |candidates|/(|A|·|B|) (how much of the
    * quadratic pair space the scheme prunes) and pairs completeness
    * PC = |true pairs surviving blocking|/|true pairs| (the recall the
    * scheme caps every downstream matcher at). The standard trade-off
    * pair from the record-linkage literature; a scheme with RR 0.99
    * and PC 0.7 silently loses 30% of matches no matter how good the
    * comparator is.
    *
    * Exactness: all five counts are integers (candidate count via a
    * block-keyed join aggregate — the blocks themselves are never
    * materialized as pairs; per-block counts multiply); the two ratios
    * are single divisions, 6-dp floored. `truth` rows whose keys are
    * absent from A/B drop out of BOTH numerator and denominator via the
    * inner joins — the audit covers pairs the blocking COULD have kept.
    * Output: one row (n_a, n_b, n_cand, n_truth, n_covered, reduction6,
    * completeness6). */
  def blockingQuality(a: DataFrame, aKey: Column, aBlock: Column,
      b: DataFrame, bKey: Column, bBlock: Column,
      truth: DataFrame, truthA: Column, truthB: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val al = a.select(aKey.as("ka"), aBlock.as("blk"))
    val bl = b.select(bKey.as("kb"), bBlock.as("blk"))
    // candidate count WITHOUT materializing pairs: per-block |A|·|B|
    val cand = al.groupBy(col("blk")).agg(count(lit(1)).as("ca"))
      .join(bl.groupBy(col("blk")).agg(count(lit(1)).as("cb")), Seq("blk"))
      .agg(coalesce(sum((col("ca") * col("cb")).cast(DecimalType(38, 0))),
        lit(0).cast(DecimalType(38, 0))).as("n_cand"))
    val t = truth.select(truthA.as("ka"), truthB.as("kb"))
      .join(al, Seq("ka")).withColumnRenamed("blk", "ba")
      .join(bl, Seq("kb"))
      .select(col("ka"), col("kb"),
        when(col("ba") === col("blk"), 1L).otherwise(0L).as("cov"))
      .groupBy(col("ka"), col("kb")).agg(max(col("cov")).as("cov"))
      .agg(count(lit(1)).as("n_truth"), sum(col("cov")).as("n_covered"))
    val sizes = al.agg(count(lit(1)).as("n_a"))
      .crossJoin(broadcast(bl.agg(count(lit(1)).as("n_b"))))
    sizes.crossJoin(broadcast(cand)).crossJoin(broadcast(t))
      .select(col("n_a"), col("n_b"),
        col("n_cand").cast("double").as("n_cand"),
        col("n_truth"), col("n_covered"),
        (floor((lit(1.0) - col("n_cand").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          * 1e6 + 0.5) / 1e6).as("reduction6"),
        when(col("n_truth") > 0,
          floor(col("n_covered").cast("double") / col("n_truth").cast("double")
            * 1e6 + 0.5) / 1e6).as("completeness6"))
  }

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo's
    * merge/purge): total-order the records by `sortKey` (ties broken by
    * `id`, so the order — and therefore the candidate set — is a pure
    * function of the data) and emit every pair within rank distance
    * `window`. The classic complement to hash blocking ([[jwPairs]]'s
    * prefix blocks): a typo in the block-key's first characters moves a
    * record to a different hash block forever, but usually only a few
    * positions in sort order — SN still pairs it with its true match.
    * Output is O(n·window) pairs by construction, never the cross
    * product.
    *
    * Scale shape: the total order is Spark's distributed sort
    * (repartitionByRange + in-partition sort — no single-partition
    * window), positions come from zipWithIndex's per-partition counts
    * (one count job), and neighbors meet through an equi-join on the
    * rank bucket pos DIV window — each row is re-emitted once for the
    * adjacent bucket, so a pair at distance ≤ window shares exactly one
    * join key. No Exchange ever sees more than 2× the row count.
    *
    * Output: (id_a, id_b, dist) where id_a precedes id_b in sort order
    * and dist = rank distance ∈ [1, window]. */
  def sortedNeighborhood(df: DataFrame, id: Column, sortKey: Column,
      window: Int): DataFrame = {
    require(window >= 1 && window <= 1000, s"window out of [1,1000]: $window")
    val base = df.select(id.as("__id"), sortKey.as("__k"))
    val sorted = base
      .repartitionByRange(col("__k").asc, col("__id").asc)
      .sortWithinPartitions(col("__k").asc, col("__id").asc)
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "pos", org.apache.spark.sql.types.LongType, nullable = false))
    // localCheckpoint: the position table feeds BOTH join sides and
    // zipWithIndex already paid a count job — without pinning, the
    // distributed sort would re-run once per consumer
    val withPos = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (row, i) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i) }, schema)
      .select(col("__id"), col("pos"))
      .localCheckpoint()
    // exact integer division for the bucket key (Column./ is DOUBLE
    // division — at extreme ranks the rounding could mis-bucket a row
    // and silently drop a candidate pair); pos is non-negative so DIV
    // is plain floor division
    val bucket = expr(s"pos DIV $window")
    val left = withPos.select(col("__id").as("id_a"), col("pos").as("pa"),
      bucket.as("bk"))
    // right side re-emitted for its own bucket and the one below, so a
    // left row's single bucket key finds every successor within range
    val right = withPos
      .select(col("__id").as("id_b"), col("pos").as("pb"),
        explode(array(bucket, bucket - 1)).as("bk"))
    left.join(right, Seq("bk"))
      .filter(col("pb") > col("pa") && col("pb") - col("pa") <= window)
      .select(col("id_a"), col("id_b"), (col("pb") - col("pa")).as("dist"))
  }
}
