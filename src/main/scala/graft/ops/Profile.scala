package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the ANALYZE TABLE primitive: per-column row/null/
  * distinct counts and min/max, the first pass every ingest pipeline
  * runs before trusting a new drop. */
object Profile {

  /** Profile the given columns in ONE corpus scan: every measure for
    * every column lands in a single aggregate row (multi-distinct plans
    * through Catalyst's Expand — still one pass over the data, no
    * per-column jobs), which is then reshaped result-side into one row
    * per column.
    *
    * `specs` maps output name → the value expression to profile; the
    * caller canonicalizes types there (e.g. cast a double to
    * DECIMAL(18,2) so min/max stringify identically on every engine).
    * min/max are emitted as strings so heterogeneous columns share one
    * schema — the profile IS a report, not a typed table.
    *
    * Output: (col_name, n_rows, n_null, n_distinct, min_s, max_s). */
  def profile(df: DataFrame, specs: Seq[(String, Column)]): DataFrame = {
    require(specs.nonEmpty, "profile needs at least one column spec")
    val measures = count(lit(1)).as("__n") +: specs.flatMap { case (name, c) =>
      Seq(
        count(when(c.isNull, lit(1))).as(s"__nn_$name"),
        countDistinct(c).as(s"__nd_$name"),
        min(c).cast("string").as(s"__mn_$name"),
        max(c).cast("string").as(s"__mx_$name"))
    }
    val aggRow = df.agg(measures.head, measures.tail: _*)
    // reshape with ONE stack generator over the single aggregate row —
    // a per-column union would re-plan (and re-print) the scan subtree
    // per branch; stack keeps the whole profile a single-subtree plan
    // with exactly one scan
    val stacked = specs.flatMap { case (name, _) =>
      Seq(lit(name), col(s"__nn_$name"), col(s"__nd_$name"),
        col(s"__mn_$name"), col(s"__mx_$name"))
    }
    aggRow.select(col("__n").as("n_rows"),
        stack((lit(specs.size) +: stacked): _*)
          .as(Seq("col_name", "n_null", "n_distinct", "min_s", "max_s")))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** Pearson chi-squared independence test between two CATEGORICAL
    * columns — the "is the lang mix the same across sources?" audit that
    * decides whether a corpus can be mixture-weighted per-source or the
    * cells have to be balanced jointly.
    *
    * One scan to the cell table (|A|·|B| rows — categorical by contract,
    * so cells are metadata-sized and every subsequent join broadcasts);
    * observed counts are exact longs, expected = row·col/N and each
    * cell's (o−e)²/e are computed double from the SAME 6-dp-rounded
    * inputs on every engine, and the statistic is the order-independent
    * DECIMAL(38,6) sum of rounded contributions (the t18/b01 recipe),
    * cast to double only in the OUTPUT column — raw decimals are not a
    * portable cross-engine result representation.
    * Output: one row per cell (obs, exp6, contrib6) with the global dof
    * and chi² repeated — a report table, bounded by the category
    * product. */
  def chi2Independence(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val r6 = (c: Column) => floor(c * 1000000 + 0.5) / 1000000
    val dec6 = (c: Column) => c.cast(
      org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6))
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("obs"))
    val ra = cells.groupBy(col("a")).agg(sum(col("obs")).as("ra"))
    val cb = cells.groupBy(col("b")).agg(sum(col("obs")).as("cb"))
    val tot = cells.agg(sum(col("obs")).as("n"),
      countDistinct(col("a")).as("na"), countDistinct(col("b")).as("nb"))
    val contrib = cells
      .join(broadcast(ra), "a").join(broadcast(cb), "b")
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("obs"),
        ((col("na") - 1) * (col("nb") - 1)).as("dof"),
        r6(col("ra").cast("double") * col("cb").cast("double")
          / col("n").cast("double")).as("exp6"))
      .select(col("a"), col("b"), col("obs"), col("dof"), col("exp6"),
        r6((col("obs").cast("double") - col("exp6"))
          * (col("obs").cast("double") - col("exp6")) / col("exp6"))
          .as("contrib6"))
    val chi = contrib.agg(sum(dec6(col("contrib6"))).cast("double").as("chi2"))
    contrib.crossJoin(broadcast(chi))
  }

  /** Shannon entropy (bits) of each field's value distribution — the
    * dataset-card diversity number: H = −Σ p·log₂p over the value
    * frequencies, 0 for a constant column, log₂(n_distinct) when
    * uniform. A source/language column collapsing toward 0 bits between
    * two crawl snapshots is a concentration regression the row counts
    * alone never show.
    *
    * One scan: fields stack via a literal-array explode (rows × |fields|,
    * still scan-stage), ONE (field, value) count shuffle — value
    * cardinality per field, never row count — then a per-field fold.
    * Cross-engine exactness: p is one double division of exact counts,
    * each −p·log₂p term is 4-dp floor-rounded BEFORE the sum and summed
    * as DECIMAL (the t18 recipe: term order cannot move the total), and
    * log₂ agrees across libms at 4 dp. NULL values count as a regular
    * category (they are part of the distribution). */
  def fieldEntropy(df: DataFrame, fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty, "fieldEntropy needs at least one field")
    val stacked = df.select(explode(array(fields.map { case (name, c) =>
      struct(lit(name).as("field"), c.cast("string").as("v"))
    }: _*)).as("fv")).select(col("fv.field").as("field"), col("fv.v").as("v"))
    val counts = stacked.groupBy(col("field"), col("v"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("field"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
    val p = col("c").cast("double") / col("n").cast("double")
    val term4 = floor(-(p * log2(p)) * 10000 + 0.5) / 10000
    counts.join(broadcast(totals), "field")
      .select(col("field"), col("n"), col("n_distinct"),
        term4.cast("decimal(28,4)").as("t4"))
      .groupBy(col("field"), col("n"), col("n_distinct"))
      .agg(sum(col("t4")).cast("double").as("entropy4"))
  }

  /** EXACT per-group quantiles of an integer measure by the
    * nearest-rank definition — the length-distribution report
    * (p50/p90/p99 document length per source) that length-filter
    * thresholds and packing budgets are read off of. Unlike
    * `percentile_approx`, the answer is deterministic and
    * engine-portable: the rank is pure INTEGER arithmetic
    * (`ceil(n·q/100) = (n·q + 99) div 100` — never a float, so no
    * representation-edge disagreement on where ceil lands), and the
    * selected value is by sorted position with positions inside a
    * value-tie class interchangeable BY VALUE.
    *
    * One shuffle on the group key; the rank window runs inside each
    * group partition. Groups are assumed group-cardinality-bounded
    * (sources, languages) — for a single global quantile over 100 TB
    * use the same rank formula over a pre-aggregated value histogram
    * instead. */
  def groupQuantiles(df: DataFrame, group: Column, value: Column,
      percents: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents out of [1,100]: $percents")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp"))
    val ranked = df.select(group.as("grp"), value.cast("long").as("v"))
      .withColumn("rn", row_number().over(w.orderBy(col("v"))))
      .withColumn("n", count(lit(1)).over(w))
    val picks = percents.distinct.sorted.map { p =>
      max(when(col("rn") === expr(s"(n * $p + 99) div 100"), col("v")))
        .as(s"p$p")
    }
    ranked.groupBy(col("grp"))
      .agg(max(col("n")).as("n"), picks: _*)
  }

  /** Key-skew profile: the top-`k` heaviest keys with their exact share
    * and cumulative share of rows — the diagnostic you run BEFORE a big
    * join or aggregation to decide whether a key needs salting (j01's
    * machinery) or AQE skew handling. One map-side-combined count +
    * one window over the DISTINCT keys ordered by (count desc, key) —
    * deterministic ranks, never a row-sized sort.
    * Output: (rank, key, n, share6, cum_share6), rank ≤ k. */
  def keySkewProfile(df: DataFrame, key: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    val counts = df.select(key.cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n"))).head().getLong(0)
    // top-k FIRST via orderBy+limit (plans as TakeOrderedAndProject —
    // per-partition heaps), so the rank/cumulative window runs over k
    // rows, never over the full distinct-key table (billions at corpus
    // scale — a global single-partition window there is the exact
    // failure this op exists to diagnose)
    val byN = Window.orderBy(col("n").desc, col("key").asc)
    counts.orderBy(col("n").desc, col("key").asc).limit(k)
      .withColumn("rank", row_number().over(byN))
      .withColumn("share6",
        floor(col("n").cast("double") / total * 1000000 + 0.5) / 1000000)
      .withColumn("cum_share6",
        floor(sum(col("n")).over(byN.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double") / total * 1000000 + 0.5) / 1000000)
      .select(col("rank"), col("key"), col("n"), col("share6"), col("cum_share6"))
  }

  /** Gini coefficient of a key's row distribution — the one-number skew
    * summary behind [[keySkewProfile]]'s table (0 = perfectly uniform
    * keys, → 1 = one key holds everything): over the K distinct keys
    * sorted ascending by (count, key), G = Σ(2i − K − 1)·cᵢ / (K·Σc) —
    * every term an exact integer (DECIMAL-summed; i·c reaches K·N =
    * int128 territory at corpus scale), ONE final division, 6-dp floor.
    * Output: one row (n_keys, n_rows, gini6). */
  def keyGini(df: DataFrame, key: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val counts = df.select(key.cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("c"))
    // keys sharing a count value occupy a CONTIGUOUS rank run whose
    // Σ 2i·c has the closed form c·(2t·minrank + t(t−1)) — so the rank
    // pass collapses to a window over the DISTINCT COUNT VALUES (tiny:
    // bounded by the max key frequency, not the key cardinality; a
    // row_number over billions of distinct keys would be a global
    // single-partition sort). Intra-run order cancels, so no key
    // tie-break is needed and the value is identical to the naive
    // per-key rank formula.
    val byCount = counts.groupBy(col("c")).agg(count(lit(1)).as("t"))
    val w = Window.orderBy(col("c")).rowsBetween(Window.unboundedPreceding, -1)
    byCount
      .withColumn("minr", coalesce(sum(col("t")).over(w), lit(0L)) + 1)
      .withColumn("__wsum",
        col("c").cast(DecimalType(38, 0))
          * (col("t") * 2 * col("minr") + col("t") * (col("t") - 1)))
      .agg(sum(col("t")).as("n_keys"), sum(col("c") * col("t")).as("n_rows"),
        sum(col("__wsum")).as("__ws"))
      .select(col("n_keys"), col("n_rows"),
        (floor((col("__ws").cast("double")
          - (col("n_keys") + 1).cast("double") * col("n_rows").cast("double"))
          / (col("n_keys").cast("double") * col("n_rows").cast("double"))
          * 1000000 + 0.5) / 1000000).as("gini6"))
  }

  /** Exact ROC-AUC by the Mann-Whitney rank statistic with midrank tie
    * handling — the quality-classifier acceptance metric (t15/t17 train
    * them; this grades them) computed EXACTLY, not by trapezoid
    * sampling: AUC = (Σ_pos midrank − P(P+1)/2) / (P·N). Midranks over
    * a tie group are (2·minrank + t − 1)/2, so 2·Σ is an exact integer
    * — everything is integer until ONE final division, 6-dp floored.
    *
    * Scale shape: ranks are NOT a row-sized global sort — scores
    * collapse to a per-distinct-score (count, pos-count) table first
    * (map-side combined), and the rank window runs over the DISTINCT
    * score values (score-cardinality-bounded; quantize scores upstream
    * if they're raw floats). Degenerate single-class input → NULL auc.
    * Output: one row (n_pos, n_neg, auc6). */
  /** Cumulative Poisson(1) CDF thresholds, hardcoded so both engines
    * compare against the SAME literal doubles (no transcendental eval
    * at query time). P(X ≤ i) for i = 0..8; beyond 8 the tail is
    * ~1.1e-9 and the multiplicity caps (identically on both sides). */
  private[graft] val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.981011843123846, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988805746001)

  /** Poisson bootstrap CI for a mean — THE bootstrap that works at
    * 100 TB: classical resampling-with-replacement needs global row
    * multinomials (a coordination point), but Poisson(1) multiplicities
    * are independent per row, so each of the B resamples is just a
    * per-row weight derived from a hash — one scan, map-side combined
    * partial sums per rep, shuffle volume B × partitions rows, never
    * data-sized (Chamandy et al., "Estimating Uncertainty for Massive
    * Data Streams", the production recipe at Google scale).
    *
    * Determinism: the multiplicity is inverse-CDF on a 52-bit md5
    * uniform of (salt:rep:id) against hardcoded Poisson(1) thresholds —
    * any engine restates it bit-for-bit. Value sums are exact
    * DECIMAL(18,2)·mult products; each resample mean is one double
    * division, 6-dp floored; the CI bounds are exact rank statistics of
    * the B means. Output one row:
    * (b, mean_full6, lo6, hi6) at ranks ⌈α/2·B⌉ and B−⌈α/2·B⌉+1. */
  /** The published 6-dp floor, replicated exactly as Spark evaluates
    * `floor(s/n * 1e6 + 0.5) / 1e6` on doubles: FLOOR(double) is
    * math.floor(...).toLong (so a 0/0 NaN lands at 0, ±Inf clamps at
    * Long.Min/MaxValue), then a long/double division. */
  private def floor6(x: Double): Double = math.floor(x * 1e6 + 0.5).toLong / 1e6

  /** `Decimal(…, 2).cast(double)` replicated exactly: Spark's
    * Decimal.toDouble is toBigDecimal.doubleValue — one rounding of the
    * exact cents/100 rational, NOT cents.toDouble/100 (two roundings,
    * divergent past 2^53 cents). */
  private def centsToDouble(cents: Long): Double =
    java.math.BigDecimal.valueOf(cents, 2).doubleValue

  /** Per-rep resample sums of ALL B reps in ONE typed aggregation —
    * the B×n exploded row set never exists: each input row derives its
    * B multiplicities in one md5 loop ([[graft.functions.PoissonMults
    * .Sampler]] — same bytes/thresholds as the expression form, spec-
    * tied) and folds value·m into a 2B+1-long buffer (cents exactly —
    * the DECIMAL(18,2) values are scale-2, so unscaled longs ARE the
    * exact sums; Math.addExact/multiplyExact refuse overflow loudly at
    * ~9.2e16 dollars per rep rather than wrapping). Partials combine
    * map-side (ObjectHashAggregate); the only exchange carries
    * numPartitions buffers of 2B+1 longs to a single partition. The
    * prior explode+groupBy(rep) spelling materialized and re-aggregated
    * B×n rows with per-row BigDecimal multiplies — measured 2.3× this
    * form at sf1 (6.5 s vs 2.8 s). */
  private final class BootstrapMeans(b: Int, salt: String)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, String), Array[Long], Seq[Double]] {
    @transient private lazy val sampler =
      new graft.functions.PoissonMults.Sampler(salt, b)
    @transient private lazy val scratch = new ThreadLocal[Array[Int]] {
      override def initialValue() = new Array[Int](b)
    }
    // layout: [0,b) cents sums, [b,2b) multiplicity sums, [2b] row count
    override def zero: Array[Long] = new Array[Long](2 * b + 1)
    override def reduce(buf: Array[Long], in: (Long, String)): Array[Long] = {
      val ms = scratch.get()
      sampler.fill(in._2.getBytes(java.nio.charset.StandardCharsets.UTF_8), ms)
      val cents = in._1
      var r = 0
      while (r < b) {
        val m = ms(r)
        if (m != 0) {
          buf(r) = Math.addExact(buf(r), Math.multiplyExact(cents, m.toLong))
          buf(b + r) += m
        }
        r += 1
      }
      buf(2 * b) += 1
      buf
    }
    override def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 2 * b) { a(i) = Math.addExact(a(i), c(i)); i += 1 }
      a(2 * b) += c(2 * b)
      a
    }
    override def finish(buf: Array[Long]): Seq[Double] =
      // zero input rows → no reps (the groupBy spelling emitted no rows);
      // a rep whose multiplicities all drew 0 divides 0/0 → NaN → the
      // floor's NaN.toLong lands it at 0.0, exactly as the SQL spelling
      if (buf(2 * b) == 0L) Nil
      else Seq.tabulate(b) { r =>
        floor6(centsToDouble(buf(r)) / buf(b + r).toDouble)
      }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact cents (unscaled DECIMAL(18,2)) of the value column; a null
    * value lands at 0 cents, which contributes the same nothing to the
    * resample sums the old null-skipping decimal sum did (while its
    * multiplicities still count toward n, as before). */
  private def centsOf(value: Column): Column =
    coalesce((value.cast("decimal(18,2)") * lit(100)).cast("long"), lit(0L))

  /** [[BootstrapMeans]] for the A/B lift: both arms' per-rep sums in one
    * buffer; finish replays the SQL spelling's null/NaN edges — an arm
    * with ZERO input rows has null sums (→ null diff6), an arm whose
    * multiplicities all drew 0 divides 0/0 (→ NaN → floored to 0). */
  private final class BootstrapLifts(b: Int, salt: String)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, String, Option[Boolean]), Array[Long], Seq[Option[Double]]] {
    @transient private lazy val sampler =
      new graft.functions.PoissonMults.Sampler(salt, b)
    @transient private lazy val scratch = new ThreadLocal[Array[Int]] {
      override def initialValue() = new Array[Int](b)
    }
    // layout: [0,b) sa, [b,2b) na, [2b,3b) sb, [3b,4b) nb,
    // [4b] rows, [4b+1] rowsA, [4b+2] rowsB
    override def zero: Array[Long] = new Array[Long](4 * b + 3)
    override def reduce(buf: Array[Long],
        in: (Long, String, Option[Boolean])): Array[Long] = {
      buf(4 * b) += 1
      // a null treatment joins neither arm (the WHEN spelling's skip),
      // but the row still exists for the empty-input distinction
      if (in._3.isEmpty) return buf
      val ms = scratch.get()
      sampler.fill(in._2.getBytes(java.nio.charset.StandardCharsets.UTF_8), ms)
      val cents = in._1
      val off = if (in._3.get) 0 else 2 * b
      var r = 0
      while (r < b) {
        val m = ms(r)
        if (m != 0) {
          buf(off + r) = Math.addExact(buf(off + r), Math.multiplyExact(cents, m.toLong))
          buf(off + b + r) += m
        }
        r += 1
      }
      buf(if (in._3.get) 4 * b + 1 else 4 * b + 2) += 1
      buf
    }
    override def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 4 * b) { a(i) = Math.addExact(a(i), c(i)); i += 1 }
      a(4 * b) += c(4 * b); a(4 * b + 1) += c(4 * b + 1); a(4 * b + 2) += c(4 * b + 2)
      a
    }
    override def finish(buf: Array[Long]): Seq[Option[Double]] =
      if (buf(4 * b) == 0L) Nil
      else Seq.tabulate(b) { r =>
        if (buf(4 * b + 1) == 0L || buf(4 * b + 2) == 0L) None
        else {
          val ma = floor6(centsToDouble(buf(r)) / buf(b + r).toDouble)
          val mb = floor6(centsToDouble(buf(2 * b + r)) / buf(3 * b + r).toDouble)
          Some(floor6(ma - mb))
        }
      }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Option[Double]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Pre-materialization rep-mean stage of [[poissonBootstrapCi]] —
    * exposed so the plan guard can assert its shape (the checkpoint in
    * the public op truncates the visible plan): ONE typed aggregation
    * over the base rows ([[BootstrapMeans]]) — no B× explode, no
    * rep-keyed shuffle; the single exchange moves numPartitions
    * 2B+1-long buffers. The base rows still spread first (repartition —
    * the per-row work is B md5s, and a one-file scan would serialize
    * it). */
  private[graft] def bootstrapRepMeans(df: DataFrame, value: Column,
      id: Column, b: Int, salt: String): DataFrame = {
    val agg = udaf(new BootstrapMeans(b, salt),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, String)]())
    Dedup.ensureParallelism(
        df.select(centsOf(value).as("__c"), id.cast("string").as("__id"))
          .repartition(col("__id")))
      .agg(agg(col("__c"), col("__id")).as("__ms"))
      .select(posexplode(col("__ms")).as(Seq("rep", "mean6")))
  }

  def poissonBootstrapCi(df: DataFrame, value: Column, id: Column,
      b: Int = 200, salt: String = "pb1", alpha: Double = 0.05): DataFrame = {
    require(b >= 10 && b <= 10000, s"b out of [10,10000]: $b")
    require(alpha > 0 && alpha < 1, s"alpha out of (0,1): $alpha")
    import org.apache.spark.sql.expressions.Window
    val loRank = math.ceil(alpha / 2 * b).toInt.max(1)
    val hiRank = b - loRank + 1
    // materialize the B-row rep table once: the lo/hi rank branches and
    // the window otherwise re-run the whole explode+aggregate per branch
    val reps = bootstrapRepMeans(df, value, id, b, salt).localCheckpoint()
    val ranked = reps.withColumn("r",
      row_number().over(Window.orderBy(col("mean6").asc, col("rep").asc)))
    val full = df.select(value.cast("decimal(18,2)").as("__v"))
      .agg((floor(sum(col("__v")).cast("double") /
        count(lit(1)).cast("double") * 1e6 + 0.5) / 1e6).as("mean_full6"))
    full.crossJoin(
      ranked.filter(col("r") === loRank).select(col("mean6").as("lo6")))
      .crossJoin(
        ranked.filter(col("r") === hiRank).select(col("mean6").as("hi6")))
      .select(lit(b.toLong).as("b"), col("mean_full6"), col("lo6"), col("hi6"))
  }

  /** Poisson-bootstrap CI for an A/B LIFT (difference of arm means) —
    * the uncertainty statement an experiment readout actually needs,
    * with the same one-scan/map-side-combined shape as
    * [[poissonBootstrapCi]]: each rep resamples BOTH arms with
    * independent per-row multiplicities (sharing the rep's hash stream,
    * so arms stay paired per resample) and the lift distribution is
    * the B per-rep mean differences. Per-rep arm means are 6-dp
    * floored, the difference re-floored, CI bounds exact rank
    * statistics. Output: (b, lift_full6, lo6, hi6). */
  def poissonBootstrapAbCi(df: DataFrame, value: Column, id: Column,
      treatment: Column, b: Int = 200, salt: String = "pab1",
      alpha: Double = 0.05): DataFrame = {
    require(b >= 10 && b <= 10000, s"b out of [10,10000]: $b")
    require(alpha > 0 && alpha < 1, s"alpha out of (0,1): $alpha")
    import org.apache.spark.sql.expressions.Window
    val loRank = math.ceil(alpha / 2 * b).toInt.max(1)
    val hiRank = b - loRank + 1
    def mean6(s: Column, n: Column) =
      floor(s.cast("double") / n.cast("double") * 1e6 + 0.5) / 1e6
    // same spread + single-materialization + one-typed-aggregation
    // discipline as [[poissonBootstrapCi]] (see bootstrapRepMeans)
    val agg = udaf(new BootstrapLifts(b, salt),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
        (Long, String, Option[Boolean])]())
    val reps = Dedup.ensureParallelism(
        df.select(centsOf(value).as("__c"), id.cast("string").as("__id"),
          treatment.cast("boolean").as("__t"))
          .repartition(col("__id")))
      .agg(agg(col("__c"), col("__id"), col("__t")).as("__ds"))
      .select(posexplode(col("__ds")).as(Seq("rep", "diff6")))
      .localCheckpoint()
    val ranked = reps.withColumn("r",
      row_number().over(Window.orderBy(col("diff6").asc, col("rep").asc)))
    val full = df.select(value.cast("decimal(18,2)").as("__v"),
        treatment.cast("boolean").as("__t"))
      .agg((floor((mean6(sum(when(col("__t"), col("__v"))),
          sum(when(col("__t"), 1L).otherwise(0L)))
        - mean6(sum(when(!col("__t"), col("__v"))),
          sum(when(!col("__t"), 1L).otherwise(0L)))) * 1e6 + 0.5) / 1e6)
        .as("lift_full6"))
    full.crossJoin(
      ranked.filter(col("r") === loRank).select(col("diff6").as("lo6")))
      .crossJoin(
        ranked.filter(col("r") === hiRank).select(col("diff6").as("hi6")))
      .select(lit(b.toLong).as("b"), col("lift_full6"), col("lo6"), col("hi6"))
  }

  def aucScore(df: DataFrame, score: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(score.cast("double").as("s"),
        label.cast("boolean").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("y"), 1L).otherwise(0L)).as("p"))
    val wPrev = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // 2·Σ midranks reaches N² — DECIMAL(38,0) (int128 headroom), not
    // long, so a 10¹²-row corpus cannot overflow the statistic
    g.withColumn("minr", coalesce(sum(col("c")).over(wPrev), lit(0L)) + 1)
      .agg(sum(col("p").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * (col("minr") * 2 + col("c") - 1)).as("s2"),
        sum(col("p")).as("n_pos"), sum(col("c") - col("p")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          floor((col("s2").cast("double") / 2
            - col("n_pos").cast("double") * (col("n_pos") + 1) / 2)
            / (col("n_pos").cast("double") * col("n_neg").cast("double"))
            * 1000000 + 0.5) / 1000000).as("auc6"))
  }

  /** Split-conformal quantile thresholds, per group (Mondrian /
    * class-conditional conformal): for calibration scores s_1..s_n the
    * threshold is the k-th smallest with k = ⌈(n+1)(1−α)⌉ — the
    * finite-sample-corrected quantile that guarantees ≥1−α marginal
    * coverage on exchangeable data. The selective-filtering primitive:
    * "keep documents whose nonconformity is below qhat" inherits the
    * coverage guarantee per group.
    *
    * Scale shape: the k-th order statistic is NOT a row-sized sort —
    * scores collapse to a per-group DISTINCT-score count table first
    * (map-side combined, the a16 rank discipline), and the cumulative
    * window runs over distinct values within each group. k > n (too
    * few calibration rows for the requested α) → NULL threshold.
    * Output: (grp, n, k, qhat). */
  def conformalThreshold(df: DataFrame, group: Column, score: Column,
      alpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    val g = df.select(group.as("grp"), score.cast("double").as("s"))
      .groupBy(col("grp"), col("s")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
      .withColumn("k",
        ceil((col("n") + 1).cast("double") * lit(1.0 - alpha)).cast("long"))
    cum.groupBy(col("grp"), col("n"), col("k"))
      .agg(min(when(col("cum") >= col("k"), col("s"))).as("qhat"))
      .select(col("grp"), col("n"), col("k"),
        when(col("k") <= col("n"), col("qhat")).as("qhat"))
  }

  /** Unbiased pass@k estimator (the HumanEval eval-aggregation
    * statistic): per task with n samples and c correct,
    * pass@k = 1 − C(n−c,k)/C(n,k), computed as the ordered product
    * Π_{i=0..k−1} (n−c−i)/(n−i) of IEEE double factors — no
    * factorials, no overflow at any n, and the left-associated chain
    * is identical cross-engine so the 6-dp-floored result hash-matches.
    * c > n−k gives exactly 1; n < k gives NULL (the estimator is
    * undefined). One map-side-combined aggregation per task — sample
    * logs of any size collapse to a task-sized table first.
    * Output: (task, n, c, pass6). */
  def passAtK(df: DataFrame, task: Column, correct: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val g = df.groupBy(task.as("task"))
      .agg(count(lit(1)).as("n"),
        sum(when(correct.cast("boolean"), 1L).otherwise(0L)).as("c"))
    val prod = (0 until k).foldLeft(lit(1.0)) { (acc, i) =>
      acc * ((col("n") - col("c") - i).cast("double")
        / (col("n") - i).cast("double"))
    }
    g.select(col("task"), col("n"), col("c"),
      when(col("n") < k, lit(null).cast("double"))
        .when(col("n") - col("c") < k, lit(1.0))
        .otherwise(floor((lit(1.0) - prod) * 1e6 + 0.5) / 1e6).as("pass6"))
  }

  /** Bradley-Terry preference-strength fitting by minorize-maximize
    * iterations — the model a preference/RLHF data pipeline fits to
    * grade annotator comparisons (and the statistic behind Elo-style
    * leaderboards). One distributed map-side-combined aggregation
    * collapses the comparison log to the (winner, loser, count) matrix;
    * everything after runs on that matrix, which is models²-bounded by
    * contract (models are a categorical dimension, the a11/chi2 cell
    * discipline), collected like s19's d² Gram — never corpus-sized.
    *
    * Determinism (the quantized-iteration recipe): each MM round
    * computes D_i = Σ_j floor8(n_ij/(θ_i+θ_j)) with the per-term
    * 8-dp floor taken in IEEE double and the sum taken EXACTLY in
    * decimal, then t_i = floor8(W_i/D_i), then renormalizes to mean 1
    * via θ_i = floor8(t_i·m/Σt) with Σt again a decimal sum — so the
    * trajectory is a pure function of the comparison counts,
    * bit-identical cross-engine. A model with no wins converges to 0;
    * zero-denominator guards mirror on both sides.
    * Output: (model, theta8) — mean-1-normalized strengths. */
  def bradleyTerry(df: DataFrame, a: Column, b: Column, aWins: Column,
      iters: Int = 6): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = df.sparkSession
    def floor8(x: Double): Double = math.floor(x * 1e8 + 0.5) / 1e8
    def bd8(x: Double): BigDecimal =
      BigDecimal.valueOf(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val winRows = df
      .select(a.cast("long").as("a"), b.cast("long").as("b"),
        aWins.cast("boolean").as("aw"))
      .where(col("a") =!= col("b"))
      .select(when(col("aw"), col("a")).otherwise(col("b")).as("wi"),
        when(col("aw"), col("b")).otherwise(col("a")).as("lo"))
      .groupBy(col("wi"), col("lo")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wins = winRows.groupBy(_._1).map { case (i, rs) => i -> rs.map(_._3).sum }
    // symmetric pair totals n_ij = wins(i over j) + wins(j over i)
    val pairs = winRows.flatMap { case (i, j, n) => Seq((i, j, n), (j, i, n)) }
      .groupBy(t => (t._1, t._2))
      .map { case ((i, j), rs) => (i, j, rs.map(_._3).sum) }.toSeq
    val models = pairs.map(_._1).distinct.sorted
    val m = models.size
    var theta = models.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val t = models.map { i =>
        val d = pairs.filter(_._1 == i).map { case (_, j, n) =>
          val s = theta(i) + theta(j)
          if (s > 0) bd8(floor8(n.toDouble / s)) else BigDecimal(0)
        }.foldLeft(BigDecimal(0))(_ + _)
        i -> (if (d > 0)
          floor8(wins.getOrElse(i, 0L).toDouble / d.toDouble) else 0.0)
      }.toMap
      val s = models.map(i => bd8(t(i))).foldLeft(BigDecimal(0))(_ + _)
      theta = models.map(i =>
        i -> (if (s > 0) floor8(t(i) * m.toDouble / s.toDouble) else 0.0)).toMap
    }
    import spark.implicits._
    models.map(i => (i, theta(i))).toDF("model", "theta8")
  }

  /** Spearman rank correlation with midrank tie handling — the monotone
    * dependence measure next to a08's Pearson (Pearson sees a log curve
    * as <1; Spearman sees any monotone relation as 1). Implemented as
    * Pearson over DOUBLED midranks: 2·midrank = 2·minrank + t − 1 is an
    * exact INTEGER, so all five moments are exact (DECIMAL-summed) and
    * the doubling cancels in the correlation — the only float ops are
    * the final products/σ/division, the identical IEEE chain both
    * engines, 6-dp floored.
    *
    * Scale shape: midranks per column come from windows over the
    * DISTINCT values, attached back by two value-keyed joins; the
    * moments are one map-side-combined reduce. That window is
    * cardinality-bounded for the quantized/discrete metrics this op
    * targets (scores, counts, bucketed lengths) — for truly continuous
    * inputs distinct ≈ rows and a global rank is INHERENT to Spearman;
    * quantize first (ranks of quantized values ≈ ranks of raw values
    * wherever quantization preserves order). Constant column → NULL.
    * Output: one row (n, spearman6). */
  def spearmanCorr(df: DataFrame, x: Column, y: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val base = df.select(x.cast("double").as("__x"), y.cast("double").as("__y"))
    def rankTab(c: String): DataFrame = {
      val w = Window.orderBy(col(c)).rowsBetween(Window.unboundedPreceding, -1)
      base.groupBy(col(c)).agg(count(lit(1)).as("__t"))
        .withColumn(s"${c}_r2",
          (coalesce(sum(col("__t")).over(w), lit(0L)) + 1) * 2 + col("__t") - 1)
        .drop("__t")
    }
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val m = base.join(rankTab("__x"), "__x").join(rankTab("__y"), "__y")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("__x_r2"))).as("sx"), sum(dec(col("__y_r2"))).as("sy"),
        sum(dec(col("__x_r2")) * dec(col("__y_r2"))).as("sxy"),
        sum(dec(col("__x_r2")) * dec(col("__x_r2"))).as("sxx"),
        sum(dec(col("__y_r2")) * dec(col("__y_r2"))).as("syy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val cov = nD * d("sxy") - d("sx") * d("sy")
    val vx = nD * d("sxx") - d("sx") * d("sx")
    val vy = nD * d("syy") - d("sy") * d("sy")
    m.select(col("n"),
      when(vx > 0 && vy > 0,
        floor(cov / sqrt(vx * vy) * 1000000 + 0.5) / 1000000)
        .as("spearman6"))
  }

  /** Calibration (reliability) bins for a [0,1] score: per equal-width
    * bin, the mean predicted score next to the observed positive rate —
    * the reliability-diagram table; a well-calibrated classifier has
    * mean6 ≈ frac_pos6 per row. Scores exactly 1.0 fold into the top
    * bin. Mean is over 6-dp-quantized scores (DECIMAL-summed,
    * order-free); the positive rate is an exact integer ratio. One
    * map-side-combined aggregate at bin cardinality.
    * Output: (bin, n, mean_score6, frac_pos6). */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(bins >= 2, s"bins must be >= 2: $bins")
    val s = score.cast("double")
    val base = df.select(
      least(floor(s * bins), lit(bins - 1)).cast("int").as("bin"),
      (floor(s * 1000000 + 0.5) / 1000000).cast(DecimalType(38, 6)).as("s6"),
      label.cast("boolean").as("y"))
    base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("s6")).as("__ss"),
        sum(when(col("y"), 1L).otherwise(0L)).as("__p"))
      .select(col("bin"), col("n"),
        (floor(col("__ss").cast("double") / col("n") * 1000000 + 0.5)
          / 1000000).as("mean_score6"),
        (floor(col("__p").cast("double") / col("n") * 1000000 + 0.5)
          / 1000000).as("frac_pos6"))
  }

  /** Benford first-digit profile of a DECIMAL column — the synthetic-
    * data / fabricated-records tripwire (organically-grown magnitudes
    * follow log₁₀(1+1/d); uniform or hand-seeded generators don't).
    * Observed share per digit next to the Benford expectation, both
    * 6-dp floored; the consumer compares (a15's chi² machinery applies
    * if a single statistic is wanted).
    *
    * The first significant digit is extracted from the DECIMAL's STRING
    * rendering (first [1-9]) — deliberately no float log/pow, whose
    * boundary behavior at exact powers of ten differs across engines;
    * decimal-to-string is identical everywhere. Pass a DECIMAL (or
    * integer/string) column; float columns would hit engine-specific
    * shortest-round-trip rendering and are the caller's risk. One scan,
    * one ≤9-row aggregate. Output: (digit, n, obs_p6, exp_p6). */
  def benfordProfile(df: DataFrame, value: Column): DataFrame = {
    val digit = regexp_extract(abs(value).cast("string"), "([1-9])", 1)
    val counts = df.select(digit.as("__d")).filter(col("__d") =!= "")
      .select(col("__d").cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    counts
      .withColumn("obs_p6",
        floor(col("n").cast("double") / sum(col("n")).over(w) * 1000000 + 0.5)
          / 1000000)
      .withColumn("exp_p6",
        floor(log10(lit(1.0) + lit(1.0) / col("digit")) * 1000000 + 0.5)
          / 1000000)
  }

  /** Per-group ordinary-least-squares fit y ~ a + b·x — the trend/
    * feature-correlation primitive (per-segment drift slopes, scaling-
    * law fits, metric-vs-knob regressions). Complements [[EventAnalytics
    * .theilSen]]: OLS is the efficient estimator when outliers are
    * already filtered; Theil-Sen is the robust one.
    *
    * Determinism/exactness: x and y are 6-dp floored to DECIMAL and the
    * five moment sums (Σx, Σy, Σxy, Σx², Σy²) accumulate as DECIMAL —
    * exact integers-of-10⁻¹² regardless of addition order — so both
    * engines reach bit-identical sums; only the closed-form slope/
    * intercept/r² arithmetic runs in IEEE doubles (identical operation
    * chain both sides), then 8-dp floors. Degenerate groups (n < 2 or
    * var(x) = 0) yield NULL fit columns.
    *
    * Plan at 100 TB: one scan, one map-side-combined groupBy over the
    * group key — the whole statistic is five partial-aggregable sums;
    * no window, no sort, no second pass.
    * Output: (grp, n, slope8, intercept8, r2_8). */
  def olsByGroup(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // (18,6) operands so the product type is DECIMAL(37,12) — EXACT;
    // (38,6) operands would overflow precision and silently round the
    // product back to 6dp (Spark's adjustPrecisionScale)
    val x6 = (floor(x.cast("double") * 1e6 + 0.5) / 1e6).cast(DecimalType(18, 6))
    val y6 = (floor(y.cast("double") * 1e6 + 0.5) / 1e6).cast(DecimalType(18, 6))
    val agg = df.select(group.as("grp"), x6.as("__x"), y6.as("__y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum((col("__x") * col("__y")).cast(DecimalType(38, 12))).as("sxy"),
        sum((col("__x") * col("__x")).cast(DecimalType(38, 12))).as("sxx"),
        sum((col("__y") * col("__y")).cast(DecimalType(38, 12))).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double"); val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val covN = n * sxy - sx * sy       // n² · cov
    val varxN = n * sxx - sx * sx      // n² · var(x)
    val varyN = n * syy - sy * sy      // n² · var(y)
    def r8(c: Column) = floor(c * 1e8 + 0.5) / 1e8
    agg.select(col("grp"), col("n"),
      when(col("n") >= 2 && varxN > 0, r8(covN / varxN)).as("slope8"),
      when(col("n") >= 2 && varxN > 0,
        r8((sy - covN / varxN * sx) / n)).as("intercept8"),
      when(col("n") >= 2 && varxN > 0 && varyN > 0,
        r8(covN * covN / (varxN * varyN))).as("r2_8"))
  }

  /** Benjamini-Hochberg FDR control over a table of hypotheses — the
    * multiple-testing step every metrics sweep needs before acting on
    * "significant" results (m tests at α each expect m·α false alarms;
    * BH caps the FALSE DISCOVERY RATE at q instead): sort p-values
    * ascending, find the largest rank i with p₍ᵢ₎ ≤ (i/m)·q, reject
    * hypotheses 1..i.
    *
    * p-values arrive as exact 52-bit integers (p = pInt/2⁵², the
    * repo's portable-md5 uniform convention) and q as a rational
    * qNumer/qDenom, so the step-up comparison
    * pInt·m·qDenom ≤ i·qNumer·2⁵² runs in exact DECIMAL(38,0) integer
    * arithmetic — no float boundary can flip a rejection cross-engine.
    * Ties in p break by the hypothesis id (deterministic ranks).
    *
    * Scale shape: the input is the HYPOTHESIS table (one row per test
    * — thousands, not corpus-sized), so the single rank window is
    * test-count-bounded by construction; the p-value computation
    * upstream is the caller's corpus-scale aggregate.
    * Output: one row (m, n_rejected, p_max_rejected — exact double,
    * NULL when nothing rejects). */
  def benjaminiHochberg(df: DataFrame, id: Column, pInt52: Column,
      qNumer: Int, qDenom: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(qNumer > 0 && qDenom > 0 && qNumer < qDenom,
      s"q must be a rational in (0,1): $qNumer/$qDenom")
    val base = df.select(id.as("hid"), pInt52.cast("long").as("p"))
    val w = Window.orderBy(col("p"), col("hid"))
    val wAll = Window.partitionBy()
    def d0(c: Column) = c.cast(DecimalType(38, 0))
    val ranked = base.withColumn("i", row_number().over(w))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("rej",
        d0(col("p")) * d0(col("m")) * qDenom <=
          d0(col("i")) * qNumer * d0(lit(4503599627370496L))) // 2^52
    ranked.agg(max(col("m")).as("m"),
        max(when(col("rej"), col("i"))).as("kmax"),
        max(when(col("rej"), col("p"))).as("pmax"))
      .select(col("m"),
        coalesce(col("kmax"), lit(0)).cast("bigint").as("n_rejected"),
        (col("pmax").cast("double") / 4503599627370496.0)
          .as("p_max_rejected"))
  }

  /** Welch's unequal-variance t-test between two samples — the "are
    * these two means actually different" companion to [[ksTwoSample]]
    * (KS asks about the whole distribution; Welch about the mean, the
    * usual A/B metric question when variances differ): t = (m₁−m₂) /
    * √(s₁²/n₁ + s₂²/n₂) with Welch–Satterthwaite degrees of freedom.
    *
    * Determinism: values are 6-dp floored to DECIMAL and the per-sample
    * (n, Σy, Σy²) sums are exact; the closed-form t/dof arithmetic is a
    * fixed IEEE chain over those sums (identical both engines), 6-dp
    * floored. Degenerate inputs (either n < 2, or both variances 0) →
    * NULL t/dof.
    *
    * Plan at 100 TB: ONE scan, one single-row conditional aggregate —
    * both sides' moments come out of the same pass (a row matching both
    * predicates counts on both sides, the two-population contract).
    * Output: one row (n_a, n_b, mean_a6, mean_b6, t6, dof6). */
  def welchTTest(df: DataFrame, inA: Column, inB: Column,
      value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val y6 = (floor(value.cast("double") * 1e6 + 0.5) / 1e6)
      .cast(DecimalType(18, 6))
    val base = df.select(y6.as("__y"), inA.as("__a"), inB.as("__b"))
      .filter(col("__a") || col("__b"))
    def side(cond: Column, tag: String) = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(cond, col("__y"))).as(s"s_$tag"),
      sum(when(cond, (col("__y") * col("__y")).cast(DecimalType(38, 12))))
        .as(s"q_$tag"))
    val aggs = side(col("__a"), "a") ++ side(col("__b"), "b")
    val j = base.agg(aggs.head, aggs.tail: _*)
    def stats(tag: String) = {
      val n = col(s"n_$tag").cast("double")
      val s = col(s"s_$tag").cast("double")
      val q = col(s"q_$tag").cast("double")
      val m = s / n
      val v = (q - s * s / n) / (n - 1) // sample variance
      (n, m, v / n)
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    def f6(c: Column) = floor(c * 1e6 + 0.5) / 1e6
    val ok = col("n_a") >= 2 && col("n_b") >= 2 && (va + vb) > 0
    j.select(col("n_a"), col("n_b"), f6(ma).as("mean_a6"), f6(mb).as("mean_b6"),
      when(ok, f6((ma - mb) / sqrt(va + vb))).as("t6"),
      when(ok, f6((va + vb) * (va + vb)
        / (va * va / (na - 1) + vb * vb / (nb - 1)))).as("dof6"))
  }

  /** Population Stability Index between a reference and a current
    * population over a caller-supplied binning — the industry-standard
    * drift score next to the JSD/TVD drifts (t38/t26): PSI =
    * Σ (p_i − q_i)·ln(p_i/q_i), read against the conventional 0.1
    * (watch) / 0.25 (act) thresholds. Add-1 smoothing over the UNION
    * bin grid keeps one-sided bins finite (the standard epsilon
    * treatment, restated identically by the oracle).
    *
    * Determinism: per-bin terms are 6-dp floored and DECIMAL-summed —
    * the t18/a20 discipline; the shares divide exact integer counts.
    *
    * Plan at 100 TB: one scan, one map-side-combined groupBy on the bin
    * key, a bin-grid-sized window for the totals — nothing row-sized
    * past the first aggregate.
    * Output: one row (n_bins, n_ref, n_cur, psi6). */
  def psiDrift(df: DataFrame, inRef: Column, inCur: Column,
      bin: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val g = df.select(bin.as("b"), when(inRef, 1L).otherwise(0L).as("r"),
        when(inCur, 1L).otherwise(0L).as("c"))
      .filter(col("r") + col("c") > 0)
      .groupBy(col("b")).agg(sum(col("r")).as("cr"), sum(col("c")).as("cc"))
    val w = Window.partitionBy()
    val t = g.withColumn("nr", sum(col("cr")).over(w))
      .withColumn("nc", sum(col("cc")).over(w))
      .withColumn("nb", count(lit(1)).over(w))
    val p = (col("cr") + 1).cast("double") / (col("nr") + col("nb")).cast("double")
    val q = (col("cc") + 1).cast("double") / (col("nc") + col("nb")).cast("double")
    t.select(col("nb"), col("nr"), col("nc"),
        (floor((p - q) * log(p / q) * 1000000 + 0.5) / 1000000)
          .cast(DecimalType(28, 6)).as("term6"))
      .groupBy(col("nb").as("n_bins"), col("nr").as("n_ref"),
        col("nc").as("n_cur"))
      .agg(sum(col("term6")).cast("double").as("psi6"))
  }

  /** Exact two-sample Kolmogorov-Smirnov statistic — the distribution-
    * drift test that, unlike the binned JSD/TVD drifts (t38/t26), needs
    * no bin choice: D = sup |F_a(v) − F_b(v)| over the pooled empirical
    * CDFs. The classic "did this feature's distribution move between
    * snapshots / sources / splits" gate.
    *
    * Exactness: D's numerator max|cumA·n_b − cumB·n_a| is an integer
    * (DECIMAL(38,0) so 10¹²-row samples cannot overflow); one division
    * at the end, 8-dp floored. Ties are handled exactly — the CDF step
    * at a tied value applies both samples' mass before the comparison,
    * the textbook pooled-ECDF definition.
    *
    * Scale shape: rows collapse to a DISTINCT-value count table first
    * (map-side combined, the a16 rank discipline); the cumulative
    * window runs over distinct values only. The asymptotic p-value
    * proxy is the scaled statistic λ = D·√(n_a·n_b/(n_a+n_b)) (compare
    * to 1.358 for α=0.05), emitted 8-dp.
    * Output: (n_a, n_b, d_num, ks8, lambda8) — one row. */
  def ksTwoSample(df: DataFrame, inA: Column, inB: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val g = df.select(value.cast("double").as("v"),
        when(inA, 1L).otherwise(0L).as("a"), when(inB, 1L).otherwise(0L).as("b"))
      .filter(col("a") + col("b") > 0)
      .groupBy(col("v")).agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = g
      .withColumn("cuma", sum(col("ca")).over(w).cast(DecimalType(38, 0)))
      .withColumn("cumb", sum(col("cb")).over(w).cast(DecimalType(38, 0)))
      .withColumn("na", sum(col("ca")).over(wAll).cast(DecimalType(38, 0)))
      .withColumn("nb", sum(col("cb")).over(wAll).cast(DecimalType(38, 0)))
    cum.agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(abs(col("cuma") * col("nb") - col("cumb") * col("na"))).as("d_num"))
      .select(col("n_a").cast("bigint").as("n_a"),
        col("n_b").cast("bigint").as("n_b"),
        // published as double (exact up to 2^53; the ratio below divides
        // the decimal-exact numerator, so ks8 itself never loses bits)
        col("d_num").cast("double").as("d_num"),
        (col("d_num").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("__ks"),
        (col("n_a").cast("double") * col("n_b").cast("double")
          / (col("n_a") + col("n_b")).cast("double")).as("__m"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        (floor(col("__ks") * 1e8 + 0.5) / 1e8).as("ks8"),
        (floor(col("__ks") * sqrt(col("__m")) * 1e8 + 0.5) / 1e8).as("lambda8"))
  }
}
