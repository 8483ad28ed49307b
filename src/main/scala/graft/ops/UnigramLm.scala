package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style, Kudo 2018) subword tokenizer
  * training — the second of the two tokenizer families real data
  * pipelines choose between, next to [[Bpe]]. Where BPE grows a vocab
  * bottom-up by greedy merges, the unigram model starts from a large
  * seed vocabulary of frequent substrings and alternates EM
  * re-estimation of piece probabilities with pruning down to the
  * target vocabulary size.
  *
  * Scale shape: the BPE reduction applies identically — after one
  * corpus scan for the distinct-word frequency table, every E-step
  * (a Viterbi segmentation of each distinct word) and M-step (a
  * piece-usage aggregation) runs on that vocabulary-sized table; the
  * artifacts collected to the driver per iteration are piece tables
  * bounded by the `seedSize` knob, never corpus-sized. The Viterbi DP
  * is a scan-stage higher-order-function fold (no UDF, no shuffle
  * inside a step); one map-side-combined `groupBy(piece)` per step is
  * the only exchange. Piece lookups use a literal map whose get is a
  * linear scan — fine at knob-bounded vocab (10³–10⁴); for a mega
  * vocabulary (10⁶) the same E-step decomposes into the unrolled
  * position-join formulation the DuckDB oracle uses, at the cost of
  * `maxWordLen` joins per step.
  *
  * Determinism (what makes an iterative float algorithm oracle-able,
  * the s19 recipe): probabilities are quantized to integer BILLIONTHS
  * — `q = floor(usage * 1e9 / total)` in exact integer math — and the
  * only float arithmetic is IEEE-754 double products of `q / 1e9`
  * values inside the DP, which every engine rounds identically. No
  * transcendental functions anywhere (scores are probability products,
  * not log sums), so the learned vocabulary is a pure function of the
  * corpus, bit-identical cross-engine. Viterbi ties break toward the
  * smallest split point (= longest final piece), pinned on both sides.
  *
  * Quantization floor: a piece whose probability rounds below 1e-9
  * drops out (single characters are floored UP to q=1 instead, so
  * full coverage survives and every word stays segmentable; an
  * encode-time character never seen in training gets the same 1e-9
  * as an UNK fallback). Words longer than `maxWordLen` are excluded
  * from TRAINING (the extreme Zipf tail; negligible mass) — encoding
  * has no length limit.
  *
  * The reference has no tokenizer layer (nothing to cite); this is a
  * net-new LLM-pipeline operator per the build brief.
  */
object UnigramLm {

  /** Probabilities are integers counted in billionths. */
  val Scale = 1000000000L

  /** All substrings of `w` with length 1..`maxPieceLen` (with
    * repetition, position-weighted — the seed-counting statistic). */
  private[graft] def substrPieces(w: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(w)), i =>
      transform(sequence(i, least(i + (maxPieceLen - 1), length(w))), e =>
        w.substr(i, e - i + 1))))

  /** Viterbi DP over the positions of `w` under piece-probability map
    * `pmap` (piece -> q in billionths). Returns a struct of two
    * (len+1)-arrays: `best(i+1)` = probability of the best segmentation
    * of the first i characters, `bp(i+1)` = its last split point.
    * Candidates are scanned j ascending with strict-greater
    * replacement, so ties keep the smallest j — i.e. the longest final
    * piece — matching the oracle's `ORDER BY score DESC, j ASC`.
    * A single character absent from `pmap` scores the UNK floor 1e-9,
    * so the DP never dead-ends. */
  private[graft] def viterbiDp(w: Column, pmap: Column, maxPieceLen: Int): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(
        array(lit(1.0)).cast("array<double>").as("best"),
        array(lit(0)).cast("array<int>").as("bp")),
      (acc, i) => {
        val cand = aggregate(
          sequence(greatest(i - maxPieceLen, lit(0)), i - 1),
          struct(lit(-1.0).as("s"), lit(-1).as("b")),
          (a, j) => {
            val q = element_at(pmap, w.substr(j + 1, i - j))
            val qv = when(q.isNotNull, q)
              .when(i - j === 1, lit(1L)) // UNK single char: 1e-9
            val score = when(qv.isNotNull,
              element_at(acc("best"), j + 1) *
                (qv.cast("double") / lit(Scale.toDouble)))
            when(score.isNotNull && score > a("s"),
              struct(score.as("s"), j.cast("int").as("b"))).otherwise(a)
          })
        struct(
          concat(acc("best"), array(cand("s"))).as("best"),
          concat(acc("bp"), array(cand("b"))).as("bp"))
      })

  /** Reconstruct the Viterbi segmentation from a [[viterbiDp]] struct:
    * walk backpointers from position len(w) down to 0, emitting one
    * piece per step (returned left-to-right). */
  private[graft] def walkPieces(w: Column, dp: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(length(w).as("i"), array().cast("array<string>").as("ps")),
      (a, _) => {
        val bp = element_at(dp("bp"), a("i") + 1)
        when(a("i") > 0,
          struct(bp.as("i"),
            concat(a("ps"),
              array(w.substr(bp + 1, a("i") - bp))).as("ps")))
          .otherwise(a)
      },
      a => reverse(a("ps")))

  private def pieceMap(vocab: Seq[(String, Long)]): Column =
    typedlit(ListMap(vocab.sortBy(_._1): _*))

  /** One hard-EM step: Viterbi-segment every distinct word under the
    * current vocabulary (distributed), aggregate piece usage weighted
    * by word count (distributed, map-side combined), collect the
    * vocab-sized usage table, and re-quantize probabilities in exact
    * integer math. Multi-char pieces that round to q=0 drop out;
    * single chars floor up to q=1 (coverage). */
  private def emStep(words: DataFrame, vocab: Seq[(String, Long)],
      maxPieceLen: Int): Seq[(String, Long)] = {
    val pm = pieceMap(vocab)
    val usage = words
      .withColumn("__dp", viterbiDp(col("w"), pm, maxPieceLen))
      .select(col("cnt"), explode(walkPieces(col("w"), col("__dp"))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = usage.valuesIterator.map(BigInt(_)).sum
    vocab.flatMap { case (p, _) =>
      val q = if (total == 0) 0L
        else (BigInt(usage.getOrElse(p, 0L)) * Scale / total).toLong
      if (p.length == 1) Some(p -> math.max(q, 1L))
      else if (q > 0) Some(p -> q) else None
    }
  }

  /** Train a unigram-LM vocabulary: seed with every single character
    * plus the `seedSize` most frequent multi-char substrings (length
    * <= `maxPieceLen`), run `emIters` hard-EM steps, then prune to
    * `vocabSize` multi-char pieces on a linear schedule over
    * `pruneRounds` rounds (each prune keeps the highest-probability
    * pieces, ties by piece ascending, and is followed by one EM
    * re-estimation). Returns (piece, q) — q the integer-billionths
    * probability, the artifact a tokenizer ships. */
  def learn(df: DataFrame, text: Column, maxPieceLen: Int = 4,
      seedSize: Int = 80, vocabSize: Int = 30, emIters: Int = 2,
      pruneRounds: Int = 2, maxWordLen: Int = 12): DataFrame = {
    val spark = df.sparkSession
    require(maxPieceLen >= 2, "maxPieceLen must be >= 2")
    require(vocabSize >= 1 && seedSize >= vocabSize,
      "need seedSize >= vocabSize >= 1")
    val words = df.select(explode(TextOps.tokens(text)).as("w"))
      .where(length(col("w")).between(1, maxWordLen))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val subs = words
      .select(col("cnt"), explode(substrPieces(col("w"), maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
    val chars = subs.where(length(col("piece")) === 1)
    val multi = subs.where(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece").asc).limit(seedSize)
    val seed = chars.unionByName(multi).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val total0 = seed.map(x => BigInt(x._2)).sum
    var vocab: Seq[(String, Long)] = seed.flatMap { case (p, c) =>
      val q = (BigInt(c) * Scale / total0).toLong
      if (p.length == 1) Some(p -> math.max(q, 1L))
      else if (q > 0) Some(p -> q) else None
    }
    for (_ <- 1 to emIters) vocab = emStep(words, vocab, maxPieceLen)
    val m0 = vocab.count(_._1.length > 1)
    val step = math.max(0,
      (m0 - vocabSize + pruneRounds - 1) / math.max(pruneRounds, 1))
    for (r <- 1 to pruneRounds) {
      val keep = math.max(vocabSize, m0 - r * step)
      val (cs, ms) = vocab.partition(_._1.length == 1)
      vocab = cs ++ ms.sortBy { case (p, q) => (-q, p) }.take(keep)
      vocab = emStep(words, vocab, maxPieceLen)
    }
    import spark.implicits._
    vocab.sortBy(_._1).toDF("piece", "q")
  }

  /** Per-document language-model quality score (the CCNet-style
    * perplexity filter): bits-per-character of each document under the
    * learned unigram LM's Viterbi segmentation. Each DISTINCT word is
    * segmented once; its nats = sum of 6-dp-rounded `ln(q/1e9)` per
    * piece (the t36 recipe — the only transcendental is rounded to a
    * grid both engines land on identically, and all sums are exact
    * DECIMAL); per-doc totals join word instances back. Output:
    * (idCol, n_pieces, bpc4) — bpc4 the 4-dp bits/char over the
    * documents' non-whitespace characters, NULL for token-less rows.
    * Low bpc = repetitive/templated text, high bpc = out-of-model
    * noise; both tails are what a curation pipeline cuts. */
  def docBitsPerChar(df: DataFrame, idCol: String, text: Column,
      vocab: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    val ln2 = 0.6931471805599453
    val pm = pieceMap(vocab.select(col("piece"), col("q")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq)
    val logp6 = vocab.select(col("piece"),
      (floor(log(col("q").cast("double") / lit(Scale.toDouble)) * 1e6 + 0.5) / 1e6)
        .cast("decimal(28,6)").as("__lp"))
    val dw = df.select(col(idCol), explode(TextOps.tokens(text)).as("w"))
    val ws = dw.select(col("w")).distinct()
      .withColumn("__dp", viterbiDp(col("w"), pm, maxPieceLen))
      .select(col("w"), explode(walkPieces(col("w"), col("__dp"))).as("piece"))
      .join(logp6, Seq("piece"), "left")
      // UNK single chars score the quantization floor ln(1e-9), pinned
      // as a 6-dp literal so no engine computes that ln at runtime
      .groupBy(col("w")).agg(
        sum(coalesce(col("__lp"), lit(-20.723266).cast("decimal(28,6)")))
          .as("__nats"),
        count(lit(1)).as("__pc"))
    val perId = dw.join(ws, "w").groupBy(col(idCol)).agg(
      sum(col("__pc")).as("n_pieces"),
      sum(col("__nats")).as("__nats"),
      sum(length(col("w"))).cast("long").as("__nch"))
    df.select(col(idCol)).distinct()
      .join(perId, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        when(col("__nch") > 0,
          floor((-col("__nats").cast("double") / lit(ln2))
            / col("__nch").cast("double") * 1e4 + 0.5) / 1e4).as("bpc4"))
  }

  /** Encode with a learned vocabulary and report subword counts per
    * row: Viterbi-segment each DISTINCT word once (the BPE reduction —
    * per-occurrence work is a join back, not a re-run of the DP) and
    * sum piece counts per `idCol`. Rows whose text holds no tokens
    * report 0. Output: (idCol, n_unigram). */
  def encodeCounts(df: DataFrame, idCol: String, text: Column,
      vocab: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    val pm = pieceMap(vocab.select(col("piece"), col("q")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq)
    val dw = df.select(col(idCol), explode(TextOps.tokens(text)).as("w"))
    val wp = dw.select(col("w")).distinct()
      .withColumn("__dp", viterbiDp(col("w"), pm, maxPieceLen))
      .select(col("w"),
        size(walkPieces(col("w"), col("__dp"))).cast("long").as("__pc"))
    val perId = dw.join(wp, "w")
      .groupBy(col(idCol)).agg(sum(col("__pc")).as("n_unigram"))
    df.select(col(idCol)).distinct()
      .join(perId, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_unigram"), lit(0L)).as("n_unigram"))
  }
}
