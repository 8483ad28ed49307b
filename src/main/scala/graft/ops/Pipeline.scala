package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: deterministic
  * (engine/partitioning/retry-independent) sampling and token-budget
  * shard packing. Everything here avoids RNG state on purpose — a 100 TB
  * pipeline re-run after a failure must keep exactly the same rows, and
  * a sample drawn by this engine must be reproducible by any other
  * engine auditing it. */
object Pipeline {

  /** Deterministic per-row bucket in [0, 10000): portable polynomial
    * hash (base 257 mod 2^31−1, the [[graft.functions.PolyHash]] codegen
    * loop) of `salt ++ ":" ++ id`. No RNG, no partition-index
    * dependence: the same row lands in the same bucket in any engine
    * that can fold char codes — which is what makes sampling decisions
    * auditable cross-engine.
    *
    * The salt is PREPENDED deliberately: a polynomial hash is linear in
    * its last characters, so an appended salt would shift every bucket
    * by the same constant and two salts would draw near-identical
    * samples; a prepended salt multiplies through every following char
    * and decorrelates the draws (spec-asserted). */
  def deterministicBucket(id: Column, salt: String): Column =
    pmod(graft.functions.HashFunctions.polyHash(
      concat(lit(salt + ":"), id.cast("string")), 257, 2147483647L), lit(10000))

  /** Deterministic Bernoulli sample at `rate` (codegen filter, pushes
    * into the scan stage; zero shuffles). */
  def sampleDeterministic(df: DataFrame, id: Column, rate: Double,
      salt: String): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate out of [0,1]: $rate")
    df.filter(deterministicBucket(id, salt) < (rate * 10000).toInt)
  }

  /** Stratified deterministic sample: per-stratum keep rates (training
    * mixture weights — e.g. languages, quality buckets), `defaultRate`
    * for unlisted strata. One codegen'd CASE over the stratum column;
    * still zero shuffles. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double, salt: String): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "rates out of [0,1]")
    val threshold = rates.toSeq.sortBy(_._1).foldRight(
      lit((defaultRate * 10000).toInt): Column) { case ((s, r), els) =>
        when(stratum === s, lit((r * 10000).toInt)).otherwise(els)
      }
    df.filter(deterministicBucket(id, salt) < threshold)
  }

  /** Importance resampling by a per-row weight in [0,1] (quality-score
    * resampling — keep good documents with high probability, bad ones
    * rarely, instead of a hard threshold): keep iff
    * bucket(id) < floor(weight·10000). The weight column must itself be
    * a deterministic expression (e.g. [[TextOps.qualityScore]], a
    * 4-dp-rounded classifier margin) for the draw to stay auditable —
    * the decision is then bit-identical cross-engine, like every other
    * sampler here. One codegen'd filter in the scan stage; zero
    * shuffles at any scale. */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
      salt: String): DataFrame =
    df.filter(deterministicBucket(id, salt) <
      floor(weight * 10000).cast("long"))

  /** Per-group contribution cap: keep at most `k` rows per group (the
    * C4 "max N pages per domain" rule — one hot domain must not swamp
    * the mixture). Selection is by salted-hash order with the id as
    * tiebreak, so WHICH k rows survive is deterministic, engine- and
    * partitioning-independent, and changes with the salt (a fresh draw,
    * not "first k in file order" — file order is an accident of the
    * writer). One group-keyed window; for pathologically hot groups the
    * per-group sort is the cost, bounded by the group's row count —
    * the same skew profile as any per-group top-k (see w02's bounded
    * TopK aggregator for the O(k)-state alternative). */
  def capPerGroup(df: DataFrame, id: Column, group: Column, k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    df.withColumn("__bk", deterministicBucket(id, salt))
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(group).orderBy(col("__bk"), id)))
      .filter(col("__rn") <= k)
      .drop("__bk", "__rn")
  }

  /** Token-budget mixture sampling — the "data mixing" step of a
    * pretraining pipeline: each source (web / code / books / …) gets a
    * TOKEN budget, and the operator derives the per-source keep rate
    * from what is actually available, then samples deterministically.
    * rate_s = min(1, budget_s·10000 ÷ tokens_s) in INTEGER arithmetic
    * (floor division), so the decision threshold is bit-identical in any
    * auditing engine. Sources without a budget are dropped (budget 0).
    *
    * Plan shape: one map-side-combined per-source token aggregation
    * (|sources| rows), broadcast back, then the same codegen'd
    * hash-bucket filter as [[sampleDeterministic]] — the corpus itself
    * is never shuffled, so at 100 TB this is one scan + one broadcast
    * join. The sample is token-approximate (documents are atomic): the
    * kept token mass per source lands within one document of
    * rate·available in expectation; exact-budget truncation is
    * [[packByTokenBudget]]'s contiguous regime. */
  def mixByTokenBudget(df: DataFrame, id: Column, source: Column,
      tokenCount: Column, budgets: Map[String, Long], salt: String): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val base = df.withColumn("__src", source).withColumn("__ntok", tokenCount.cast("long"))
    val budgetCol = budgets.toSeq.sortBy(_._1).foldRight(lit(0L): Column) {
      case ((s, b), els) => when(col("__src") === s, lit(b)).otherwise(els)
    }
    val avail = base.groupBy(col("__src")).agg(sum(col("__ntok")).as("__avail"))
    base.join(broadcast(avail), "__src")
      .withColumn("__budget", budgetCol)
      // INTEGER division (div, not /): Spark's / on longs is a double
      // divide, whose floor could disagree with an auditing engine's
      // integer division at representation edges
      .filter(deterministicBucket(id, salt) <
        least(lit(10000L), expr("__budget * 10000 div __avail")))
      .drop("__src", "__ntok", "__avail", "__budget")
  }

  /** Mixture epoch plan — the pre-flight audit [[mixByTokenBudget]] /
    * [[temperatureMixture]] runs are chosen FROM: given target mixture
    * weights and a total token budget, report per source how many
    * tokens the mix wants (`target_tokens = floor(budget·weight)`),
    * how many exist, and the implied repetition count
    * (`epochs = target/available`); flag sources the plan would repeat
    * past `maxEpochs` (the data-constrained regime where more repeats
    * stop helping — the check that catches "2% of the budget assigned
    * to a source holding 0.01% of the tokens" before any training run).
    * Sources absent from `weights` get weight 0 (explicitly in the
    * report, so dropped mass is visible, not silent).
    *
    * One scan + a source-cardinality aggregate. Cross-engine exactness:
    * counts are exact integers; weight is a planted literal;
    * `floor(budget::DOUBLE · weight)` and the 6-dp-floored epoch ratio
    * are the identical IEEE expression in both engines. */
  def epochPlan(df: DataFrame, source: Column, tokenCount: Column,
      weights: Map[String, Double], totalBudget: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    require(weights.values.forall(w => w >= 0 && w <= 1), "weights out of [0,1]")
    require(maxEpochs > 0, s"maxEpochs must be positive: $maxEpochs")
    val weightCol = weights.toSeq.sortBy(_._1).foldRight(lit(0.0): Column) {
      case ((s, w), els) => when(col("source") === s, lit(w)).otherwise(els)
    }
    df.select(source.as("source"), tokenCount.cast("long").as("__ntok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__ntok")).as("n_tokens"))
      .withColumn("weight", weightCol)
      .withColumn("target_tokens",
        floor(lit(totalBudget).cast("double") * col("weight")).cast("long"))
      .withColumn("epochs6",
        when(col("n_tokens") > 0, floor(col("target_tokens").cast("double")
          / col("n_tokens").cast("double") * 1000000 + 0.5) / 1000000))
      .withColumn("over_cap",
        when(col("n_tokens") > 0,
          col("target_tokens").cast("double") / col("n_tokens").cast("double")
            > maxEpochs)
          .otherwise(col("target_tokens") > 0))
  }

  /** Contiguous token-budget shard packing: documents in ascending `id`
    * order are cut into shards of ≈ `budget` tokens (a new shard starts
    * when the running total would cross a budget boundary) — the layout
    * step before writing fixed-size training shards.
    *
    * The running sum is a two-level scan, NOT one global window (which
    * would sort the whole corpus into a single task): rows bucket by
    * `floor(id / bucketWidth)`, the per-bucket prefix sum is a bounded
    * partitioned window, and bucket offsets come from a bucket-totals
    * table that is smaller than the input by a factor of `bucketWidth`
    * (its single-partition window is over n/bucketWidth rows) and
    * broadcast back. The result is bit-identical to the global
    * formulation — spec-asserted. */
  def packByTokenBudget(df: DataFrame, id: Column, tokenCount: Column,
      budget: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    require(budget > 0 && bucketWidth > 0, "budget and bucketWidth must be positive")
    tokenOffsets(df, id, tokenCount, bucketWidth)
      .select(col("doc_id"), col("ntok"),
        floor(col("gstart") / budget).cast("long").as("shard"))
  }

  /** Global token offset per doc in doc_id order — the two-level prefix
    * scan shared by the packers: per-bucket running sums under a
    * partitioned window plus a broadcast bucket-offset table, so there
    * is no global single-task sort at any corpus size.
    * Output: (doc_id, ntok, gstart). */
  private def tokenOffsets(df: DataFrame, id: Column, tokenCount: Column,
      bucketWidth: Long): DataFrame = {
    val base = df.select(id.as("doc_id"), tokenCount.cast("long").as("ntok"),
      floor(id / bucketWidth).cast("long").as("bkt"))
    val inBucket = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = base.withColumn("cum_in", sum(col("ntok")).over(inBucket))
    val acrossBuckets = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("bkt")).agg(sum(col("ntok")).as("tot"))
      .select(col("bkt"), coalesce(sum(col("tot")).over(acrossBuckets), lit(0L)).as("off"))
    withCum.join(broadcast(offsets), "bkt")
      .select(col("doc_id"), col("ntok"),
        (col("off") + col("cum_in") - col("ntok")).as("gstart"))
  }

  /** Fixed-context-window sequence packing — the LLM pretraining layout:
    * the token stream (docs concatenated in doc_id order) is cut into
    * examples of exactly `contextLen` tokens, and docs SPLIT across
    * window boundaries (unlike [[packByTokenBudget]]'s soft shards).
    * Each output row is one doc fragment: which example it lands in,
    * which token span of the doc it carries, and where in the example it
    * starts — everything a writer needs to emit packed examples with
    * correct attention-mask/document-boundary bookkeeping.
    *
    * Same scale shape as the shard packer (two-level prefix scan, no
    * global sort); the fragment fan-out adds ≤ 1 + ntok/contextLen rows
    * per doc via a `sequence` explode — proportional to output, with no
    * shuffle after the offset join.
    *
    * Output: (doc_id, example_id, start_tok, end_tok, off_in_ex),
    * fragment = doc tokens [start_tok, end_tok) placed at off_in_ex. */
  def packFixedWindows(df: DataFrame, id: Column, tokenCount: Column,
      contextLen: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    require(contextLen > 0 && bucketWidth > 0,
      "contextLen and bucketWidth must be positive")
    tokenOffsets(df, id, tokenCount, bucketWidth)
      .filter(col("ntok") > 0)
      .select(col("doc_id"), col("ntok"), col("gstart"),
        explode(sequence(floor(col("gstart") / contextLen).cast("long"),
          floor((col("gstart") + col("ntok") - 1) / contextLen).cast("long")))
          .as("example_id"))
      .select(col("doc_id"), col("example_id"),
        greatest(lit(0L), col("example_id") * contextLen - col("gstart")).as("start_tok"),
        least(col("ntok"), (col("example_id") + 1) * contextLen - col("gstart")).as("end_tok"),
        greatest(lit(0L), col("gstart") - col("example_id") * contextLen).as("off_in_ex"))
  }

  /** Corpus snapshot diff: classify every id across two snapshots as
    * added / removed / changed / same via ONE full-outer join on the id.
    * The payload is reduced to a 64-bit hash BEFORE the join, so the
    * shuffle carries (id, 8 bytes) per side instead of the documents
    * themselves — at corpus scale the diff costs two scans plus an
    * id-width shuffle. A hash collision reports a changed row as `same`
    * with probability 2^-64 per id; acceptable for reporting, use a
    * payload-equality recheck of the `same` class if bit-exactness is
    * ever load-bearing.
    *
    * Output: (id, status). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      id: Column, payload: Column): DataFrame = {
    val a = oldDf.select(id.as("id"), xxhash64(payload).as("h_old"))
    val b = newDf.select(id.as("id"), xxhash64(payload).as("h_new"))
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_new").isNull, "removed")
          .when(col("h_old").isNull, "added")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("same").as("status"))
  }

  /** Distributed ntile over a global (score, id) order — curriculum
    * bucketing without the single-partition sort a bare
    * `ntile(k).over(Window.orderBy(...))` plans. Same two-level scheme
    * as [[packByTokenBudget]]: rows range-bucket by `floor(score *
    * buckets)` (order-contiguous, and score ties never straddle a
    * bucket, so per-bucket row_number + a broadcast bucket-offset table
    * reconstructs the EXACT global rank), then the ntile bucket is
    * computed from (rank, n, k) in closed form — SQL ntile hands the
    * first `n mod k` tiles one extra row each. Bit-identical to the
    * global-window formulation (spec-asserted).
    *
    * Skew note: a score distribution concentrated in few value buckets
    * degrades toward the global sort; `buckets` trades offset-table
    * size against per-bucket width (default 1000 keeps the offset table
    * trivially broadcastable at any corpus size).
    *
    * Output: (id, score, tile). */
  def ntileByScore(df: DataFrame, id: Column, score: Column, k: Int,
      buckets: Int = 1000): DataFrame = {
    require(k > 0 && buckets > 0, "k and buckets must be positive")
    val spark = df.sparkSession
    val base = df.select(id.as("id"), score.cast("double").as("q"))
      .withColumn("bkt", floor(col("q") * buckets).cast("long"))
    // bucket-count pass: the aggregate is ≤ buckets+1 rows, so it is
    // collected once and the offset table + total row count re-enter the
    // plan as literals — no single-partition window, no third corpus
    // scan for the total. Two corpus scans overall (counts + ranks);
    // persist `base`'s narrow projection upstream to make it one.
    val counts = base.groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (bkt, cnt) =>
      val off = acc; acc += cnt; (bkt, off)
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("bkt", "off")
    val inBucket = Window.partitionBy(col("bkt")).orderBy(col("q"), col("id"))
    val ranked = base.withColumn("rn", row_number().over(inBucket))
    val small = n / k                    // floor(n / k) rows per late tile
    val rem = n % k                      // first `rem` tiles get one extra
    val cut = (small + 1) * rem          // ranks 1..cut live in the big tiles
    val r = col("off") + col("rn")
    val tile =
      if (rem == 0) ((r - 1) / small).cast("int") + 1
      else when(r <= cut, ((r - 1) / (small + 1)).cast("int") + 1)
        .otherwise((lit(rem) + (r - cut - 1) / small).cast("int") + 1)
    ranked.join(broadcast(offDf), "bkt")
      .select(col("id"), col("q").as("score"), tile.as("tile"))
  }

  /** Deterministic train/val/test assignment from the same portable
    * hash bucket as [[sampleDeterministic]]: `fractions` are cumulative
    * slice widths in bucket space (e.g. 0.9/0.05/0.05). Hash-based
    * splits are the only ones that survive a 100 TB pipeline's re-runs
    * and incremental appends — a row's split never depends on what
    * other rows exist, so yesterday's train doc cannot migrate into
    * tomorrow's held-out set. Zero shuffles: one codegen'd CASE in the
    * scan stage.
    *
    * Output: the input columns + `split`. */
  def hashSplit(df: DataFrame, id: Column, salt: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fractions")
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * 10000).toInt)
    val bucket = deterministicBucket(id, salt)
    val split = fractions.init.zip(cuts.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), cut), els) =>
        when(bucket < cut, lit(name)).otherwise(els)
      }
    df.withColumn("split", split)
  }

  /** Leakage-safe split: [[hashSplit]] keyed by a GROUP column — e.g.
    * the near-dup cluster label from
    * [[graft.ops.Dedup.connectedComponents]] or a URL domain — so every
    * member of a group lands in the SAME slice and no near-duplicate
    * pair can straddle train and held-out (the contamination mode a
    * per-document split silently produces whenever dedup is inexact or
    * intentionally lenient). Same zero-shuffle, append-stable hash
    * contract. */
  def splitByGroup(df: DataFrame, group: Column, salt: String,
      fractions: Seq[(String, Double)]): DataFrame =
    hashSplit(df, group, salt, fractions)

  /** Per-group winsorization: clip `value` to its group's [lo, hi]
    * exact quantiles (linear interpolation, the quantile_cont contract).
    * The outlier-taming normalizer before loss-weighting or length
    * curricula. The quantile pass aggregates to one row per group —
    * broadcastable at any corpus size when groups are bounded (langs,
    * sources); at 100 TB swap the exact `percentile` for
    * `approx_percentile` with the same plan shape (the exact twin is
    * what a verifying engine can restate).
    *
    * Output: the input columns + `clipped` (4-dp rounded — the clip
    * boundaries are interpolated floats, the interior values pass
    * through the same rounding for one uniform contract). */
  def winsorize(df: DataFrame, group: Column, value: Column,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad quantile range [$lo, $hi]")
    val base = df.withColumn("__g", group).withColumn("__v", value.cast("double"))
    val qs = base.groupBy(col("__g"))
      .agg(expr(s"percentile(__v, array(${lo}D, ${hi}D))").as("__q"))
      .select(col("__g"), element_at(col("__q"), 1).as("__qlo"),
        element_at(col("__q"), 2).as("__qhi"))
    base.join(broadcast(qs), "__g")
      .withColumn("clipped",
        floor(least(greatest(col("__v"), col("__qlo")), col("__qhi")) * 10000 + 0.5) / 10000)
      .drop("__g", "__v", "__qlo", "__qhi")
  }

  /** Per-group z-score normalization of an INTEGER-valued column (token
    * counts, byte lengths): z = (x − μ)/σ with μ, σ derived from the
    * exact integer sums Σx and Σx² — one map-side-combined aggregate per
    * group, broadcast back. Using the moment sums instead of a
    * `stddev` aggregate is what makes the result float-order-INDEPENDENT
    * (integer sums are exact in any order; the float ops that follow are
    * a fixed expression over exact inputs), hence restatable by any
    * verifying engine and stable across partitionings — the same
    * determinism contract as every sampler here.
    *
    * Output: the input columns + `z` (4-dp). Groups with fewer than two
    * rows or zero variance get null z. */
  def zscoreByGroup(df: DataFrame, group: Column, value: Column): DataFrame = {
    val base = df.withColumn("__g", group).withColumn("__v", value.cast("long"))
    val m = base.groupBy(col("__g")).agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__v")).cast("double").as("__s"),
      sum(col("__v") * col("__v")).cast("double").as("__ss"))
    val variance = (col("__ss") - col("__s") * col("__s") / col("__n")) /
      (col("__n") - 1)
    base.join(broadcast(m), "__g")
      .withColumn("z",
        when(col("__n") > 1 && variance > 0,
          floor((col("__v") - col("__s") / col("__n")) / sqrt(variance)
            * 10000 + 0.5) / 10000))
      .drop("__g", "__v", "__n", "__s", "__ss")
  }

  /** Global dense dictionary over the distinct values of a column,
    * ids 0..n−1 in value sort order — surrogate-key/vocabulary
    * construction (string keys → fixed-width ints before a 100 TB
    * shuffle pays string bytes). `row_number` over a global ORDER BY
    * would funnel the dictionary through one partition; instead the
    * sorted distinct values are range-partitioned (the sort's exchange)
    * and `zipWithIndex` assigns contiguous ids from per-partition
    * offsets — one count job, no single-partition stage, deterministic.
    *
    * Output: (value, id). */
  def dictionary(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.select(value.cast("string").as("value"))
      .filter(col("value").isNotNull).distinct().orderBy(col("value"))
    val indexed = sorted.rdd.map(_.getString(0)).zipWithIndex()
    import spark.implicits._
    indexed.toDF("value", "id")
  }

  /** Deterministic LEAKAGE-AWARE negative sampling for contrastive
    * training: for each anchor row, `k` pseudo-random negatives drawn by
    * the portable salted hash, EXCLUDING the anchor itself and anything
    * in the anchor's near-dup cluster — a near-duplicate "negative"
    * teaches the model to push near-identical texts apart, the classic
    * contrastive-data bug; pair with [[Dedup.connectedComponents]] (or
    * any cluster assignment) for the `cluster` column.
    *
    * Mechanism, linear in n: the id domain gets a dense index
    * ([[dictionary]]); each anchor proposes `k · oversample` candidate
    * indexes as `polyHash(salt:id:j) mod n` (no RNG — any engine
    * re-derives the exact draw, re-runs are identical), joins them back
    * to ids and cluster labels through broadcast, filters self/cluster
    * hits, and keeps the first `k` by draw order. Sampling is WITH
    * replacement (a duplicate draw stays, deterministically); an anchor
    * inside a cluster covering most of the corpus may yield fewer than
    * `k`.
    *
    * Output: (id, rank, neg_id), rank 1..k, ids as strings (the
    * dictionary's canonical key form). */
  def negativeSamples(df: DataFrame, id: Column, cluster: Column, k: Int,
      salt: String, oversample: Int = 2): DataFrame = {
    require(k >= 1 && oversample >= 1, "k and oversample must be >= 1")
    val base = df.select(id.cast("string").as("aid"), cluster.cast("string").as("acl"))
    val dict = dictionary(df, id)
    val n = dict.count()
    require(n > 1, "negativeSamples needs at least two distinct ids")
    val tries = base.select(col("aid"), col("acl"),
        explode(sequence(lit(1), lit(k * oversample))).as("j"))
      .withColumn("idx", pmod(graft.functions.HashFunctions.polyHash(
        concat(lit(salt + ":"), col("aid"), lit(":"), col("j").cast("string")),
        257L, 2147483647L), lit(n)))
    // no broadcast hints: the dictionary and cluster tables are id-domain-
    // sized (≫ MB at corpus scale) — AQE picks broadcast when they fit
    val w = Window.partitionBy(col("aid")).orderBy(col("j"))
    tries
      .join(dict.select(col("id").as("idx"), col("value").as("nid")), "idx")
      .join(base.select(col("aid").as("nid"), col("acl").as("ncl")), "nid")
      .filter(col("nid") =!= col("aid") && col("ncl") =!= col("acl"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("aid").as("id"), col("rank"), col("nid").as("neg_id"))
  }

  /** Encode a column through a dictionary built by [[dictionary]]:
    * joins on the raw value and substitutes the dense id. The join is
    * marked broadcast — vocabularies and key domains are MB-scale next
    * to a corpus; drop the hint for a billion-key domain and let AQE
    * pick the strategy. */
  def dictEncode(df: DataFrame, value: Column, dict: DataFrame,
      as: String = "value_id"): DataFrame =
    df.withColumn("__raw", value.cast("string"))
      .join(broadcast(dict.select(col("value").as("__raw"), col("id").as(as))),
        Seq("__raw"), "left")
      .drop("__raw")

  /** Deterministic weighted reservoir sample of `k` rows per group
    * (Efraimidis-Spirtsis A-Res): priority = u^(1/w) with u derived
    * from the portable [[deterministicBucket]] hash — no RNG state, so
    * the draw is reproducible and auditable cross-engine like every
    * other sampling decision here. Higher weight → higher expected
    * priority → more likely into the reservoir, the exact A-Res
    * inclusion law — honored for ALL positive weights including
    * fractional ones (u^(1/w) with the true w); non-positive weights
    * get priority 0 exactly, the w→0+ limit of u^(1/w), so zero-weight
    * rows fill the reservoir only when nothing positive competes.
    * Priorities are 6-dp floor-rounded BEFORE ranking
    * (pow's last ulp is not portable across libm implementations) with
    * the id as final tie-break. One shuffle (the per-group top-k
    * window); swap in [[graft.functions.TopKAggregator]] for bounded
    * state at extreme group cardinality skew.
    * Output: (group, id, weight, rank), rank 1..k. */
  def weightedReservoirPerGroup(df: DataFrame, id: Column, group: Column,
      weight: Column, k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val u = (deterministicBucket(id, salt).cast("double") + 0.5) / 10000.0
    val w = weight.cast("double")
    val pr = when(w <= 0.0, lit(0.0))
      .otherwise(floor(pow(u, lit(1.0) / w) * 1000000 + 0.5) / 1000000)
    val win = Window.partitionBy(col("__g"))
      .orderBy(col("__pr").desc, col("__id").asc)
    df.select(group.as("__g"), id.as("__id"), weight.as("__w"), pr.as("__pr"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("__g").as("group"), col("__id").as("id"),
        col("__w").as("weight"), col("rank"))
  }

  /** Overlapping fixed-window chunking of each document's token stream
    * — the RAG / embedding-input chunker (vs [[packFixedWindows]],
    * which packs MULTIPLE docs into exact-length training examples;
    * this SPLITS single docs with overlap and never crosses doc
    * boundaries). Chunk i of a doc with n tokens covers
    * [i·stride, min(i·stride + window, n)); starts are 0, stride,
    * 2·stride, … while start < n, and a final fully-contained window
    * is not re-emitted (start ≤ n − window bounds the last index when
    * n > window). Zero-token docs drop. Fan-out is one `sequence`
    * explode ∝ output chunks; no shuffle at all.
    * Output: (id, chunk_idx, start_tok, end_tok, n_tok). */
  def chunkWithOverlap(df: DataFrame, id: Column, tokenCount: Column,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window: window=$window stride=$stride")
    val n = tokenCount.cast("long")
    val lastIdx = greatest(ceil((n - window).cast("double") / stride), lit(0.0))
      .cast("long")
    df.select(id.as("id"), n.as("__n"),
        explode(sequence(lit(0L), lastIdx)).as("chunk_idx"))
      .filter(col("__n") > 0)
      .select(col("id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(col("chunk_idx") * stride + window, col("__n")).as("end_tok"))
      .withColumn("n_tok", col("end_tok") - col("start_tok"))
  }

  /** Temperature-scaled mixture weights: the multi-source sampling-rate
    * computation behind multilingual / multi-domain training mixes
    * (sample source i with probability ∝ p_i^alpha, where p_i is its
    * natural share — alpha < 1 upweights the tail, alpha = 1 keeps the
    * natural mix, alpha = 0 is uniform).
    *
    * Cross-engine exactness: p6 and each source's p^alpha are 6-dp
    * floor-rounded doubles computed from exact counts; the normalizer
    * sums the ROUNDED values as DECIMAL(28,6) (order-independent — a
    * double sum over sources would depend on reduce order), and w6 is
    * one final double division. Cost: one map-side-combined count per
    * source + two broadcast 1-row joins; the group table is
    * domain-sized, never corpus-sized.
    * Output: (group, n_docs, p6, w6), Σ w6 ≈ 1. */
  def temperatureMixture(df: DataFrame, group: Column,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"alpha must be in [0,1] (1 = natural mix, 0 = uniform): $alpha")
    val r6 = (c: Column) => floor(c * 1000000 + 0.5) / 1000000
    val dec6 = (c: Column) => c.cast(
      org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6))
    val counts = df.groupBy(group.as("group")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("__n"))
    val scaled = counts.crossJoin(broadcast(tot))
      .select(col("group"), col("n_docs"),
        r6(col("n_docs").cast("double") / col("__n").cast("double")).as("p6"))
      .withColumn("__pa", r6(pow(col("p6"), lit(alpha))))
    val z = scaled.agg(sum(dec6(col("__pa"))).as("__z"))
    scaled.crossJoin(broadcast(z))
      .select(col("group"), col("n_docs"), col("p6"),
        r6(col("__pa") / col("__z").cast("double")).as("w6"))
  }

  /** Deterministic weighted interleave: assign every row a global
    * training position such that any prefix of the order holds each
    * source in proportion to its weight — the data-ORDER half of
    * mixture design ([[temperatureMixture]] decides how much of each
    * source; this decides WHERE its rows land, so a run that stops at
    * 30% has consumed 30% of every source, not all of one and none of
    * another). Weighted-fair-queuing construction: row r (0-based,
    * salted-hash order + id tie-break within its source) gets virtual
    * finish time (r+1)/w; the global order sorts by (finish, source,
    * id). Sources absent from `weights` default to weight 1.
    *
    * Scale shape: one source-partitioned window for in-source ranks,
    * then ONE global range-sort on the finish key — a total order is
    * the deliverable, and Spark's range partitioner is how a total
    * order is priced at 100 TB (no single-task sort; sampling picks
    * the range bounds). Every input is exact-integer-derived, so the
    * finish-time doubles and all tie-breaks replay identically on any
    * engine. Output: (id, group, r_in_source, pos). */
  def interleaveByWeight(df: DataFrame, id: Column, group: Column,
      weights: Map[String, Int], salt: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 1),
      s"weights must be a non-empty map of positive ints: $weights")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(id.as("__id"), group.as("__g"))
      .withColumn("__w", coalesce(
        element_at(typedLit(weights), col("__g")), lit(1)))
      .withColumn("__bk", deterministicBucket(col("__id"), salt))
    val rIn = Window.partitionBy(col("__g"))
      .orderBy(col("__bk").asc, col("__id").asc)
    val ranked = base.withColumn("__r", row_number().over(rIn) - 1)
      .withColumn("__fin",
        (col("__r") + 1).cast("double") / col("__w").cast("double"))
    // Global position WITHOUT an Exchange SinglePartition window: range-
    // repartition on the total sort key + in-partition sort is Spark's
    // distributed total order; zipWithIndex then derives the contiguous
    // 0-based rank from per-partition counts (one count job), so no task
    // ever holds more than its range slice. The sort key is total
    // (id tie-break), so positions are independent of where the sampled
    // range bounds fall.
    val sorted = ranked
      .repartitionByRange(col("__fin").asc, col("__g").asc, col("__id").asc)
      .sortWithinPartitions(col("__fin").asc, col("__g").asc, col("__id").asc)
      .select(col("__id"), col("__g"), col("__r"))
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "pos", org.apache.spark.sql.types.LongType, nullable = false))
    val withPos = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L)) }
    spark.createDataFrame(withPos, schema)
      .select(col("__id").as("id"), col("__g").as("group"),
        col("__r").as("r_in_source"), col("pos"))
  }

  /** Neyman allocation of an evaluation/labeling budget across strata:
    * sample stratum h at n_h ∝ N_h·S_h (size × within-stratum standard
    * deviation of the metric of interest) — the minimum-variance split
    * of a fixed annotation budget, vs proportional allocation which
    * oversamples homogeneous strata. A stratum with zero variance gets
    * weight 0 (one label suffices in theory; floor-rounding may still
    * assign it 0 — callers wanting a per-stratum minimum add it after).
    *
    * Cross-engine exactness: S_h comes from exact decimal-summed integer
    * moments (the a08 recipe; `metric` is cast to long), each N_h·S_h is
    * 4-dp floored then decimal-summed into the normalizer, and the final
    * allocation is floor(budget·share + 0.5). One map-side-combined
    * aggregate; everything after is stratum-table-sized.
    * Output: (stratum, n_rows, sd6, alloc). */
  def neymanAllocation(df: DataFrame, stratum: Column, metric: Column,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    val dec0 = (c: Column) => c.cast(
      org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0))
    val dec4 = (c: Column) => c.cast(
      org.apache.spark.sql.types.DataTypes.createDecimalType(28, 4))
    val m = df.select(stratum.as("stratum"), metric.cast("long").as("__x"))
      .groupBy(col("stratum")).agg(count(lit(1)).as("n_rows"),
        sum(dec0(col("__x"))).as("__sx"),
        sum(dec0(col("__x") * col("__x"))).as("__sxx"))
    val nD = col("n_rows").cast("double")
    val sd = sqrt(nD * col("__sxx").cast("double")
      - col("__sx").cast("double") * col("__sx").cast("double")) / nD
    val scored = m.select(col("stratum"), col("n_rows"),
        (floor(sd * 1000000 + 0.5) / 1000000).as("sd6"))
      .withColumn("__w",
        dec4(floor(nD * col("sd6") * 10000 + 0.5) / 10000))
    val z = scored.agg(sum(col("__w")).as("__z"))
    scored.crossJoin(broadcast(z))
      .select(col("stratum"), col("n_rows"), col("sd6"),
        floor(lit(budget.toDouble) * (col("__w").cast("double")
          / col("__z").cast("double")) + 0.5).cast("long").as("alloc"))
  }
}
