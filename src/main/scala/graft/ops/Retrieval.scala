package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Keyword retrieval over a document corpus: inverted-index construction
  * and BM25 scoring (Robertson/Spärck Jones; the Okapi k1/b form). In a
  * training-data pipeline this is the seed-expansion / targeted-harvest
  * primitive: "give me the documents that look like this query" over
  * billions of rows, where a full-text engine is unavailable and the
  * corpus lives in parquet.
  *
  * Scale shape: every stage operates on (doc, term) COUNT pairs, never
  * on raw text past the first scan. The query-term filter is applied to
  * the exploded token stream inside the scan stage (a 3-term query
  * discards ~all token instances before the first exchange), so the one
  * corpus-sized cost is the scan itself; the aggregations that follow
  * see only query-term instances. Corpus statistics (N, Σdl) ride the
  * plan as literals from a single separate aggregate pass. */
object Retrieval {

  /** Inverted index: one row per distinct term — document frequency,
    * total term frequency, and the posting list as a doc_id-sorted
    * array of (doc_id, tf) structs. Postings for web-scale corpora are
    * the classic skewed aggregation: the groupBy shuffles pair COUNTS
    * (bounded by Σ|doc vocab|, far below corpus bytes) and a stopword
    * term's posting array is the one per-key hotspot — cap it with
    * `maxPostings` (0 = unlimited) the way production indexes impose
    * posting budgets. */
  def invertedIndex(df: DataFrame, id: Column, text: Column,
      maxPostings: Int = 0): DataFrame = {
    val tf = df.select(id.as("doc_id"), explode(TextOps.tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val grouped = tf.groupBy(col("term")).agg(
      count(lit(1)).as("df"),
      sum(col("tf")).as("total_tf"),
      sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("postings"))
    if (maxPostings > 0)
      grouped.withColumn("postings", slice(col("postings"), 1, maxPostings))
    else grouped
  }

  /** Probe an inverted index for `terms`: back to flat (term, doc_id, tf)
    * postings. At scale the term predicate is a tiny IN-list pushed to
    * the index's parquet scan — the read is |postings of the queried
    * terms|, not the corpus. */
  def probePostings(index: DataFrame, terms: Seq[String]): DataFrame =
    index.filter(col("term").isin(terms: _*))
      .select(col("term"), explode(col("postings")).as("p"))
      .select(col("term"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))

  /** BM25 scores for every document matching ≥1 query term.
    *
    * score(d) = Σ_t  idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)), df = docs containing t,
    * dl = |tokens(d)|, avgdl = Σdl/N over the whole corpus.
    *
    * Per-term contributions are rounded to 4 dp and summed as decimals,
    * so the document score is independent of Spark's (and any verifying
    * engine's) float-summation order — the same cross-engine contract as
    * [[TextOps.bigramLogProb]]. Output: (doc_id, bm25). */
  /** Proximity search over POSITIONAL postings: documents where
    * `termA` and `termB` co-occur within `window` tokens — the phrase/
    * near-operator a retrieval stack adds on top of [[invertedIndex]]'s
    * doc-level postings. Scale shape: the per-term position lists are
    * filtered FIRST (term-selectivity-sized, the postings-intersection
    * discipline), then one doc-keyed equi-join with the distance
    * predicate — never a positions×positions blow-up beyond the two
    * terms' own occurrence lists. Output: (doc_id, n_pairs, min_dist). */
  def proximitySearch(df: DataFrame, id: Column, text: Column,
      termA: String, termB: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val pos = df.select(id.as("doc_id"),
      posexplode(TextOps.tokens(text)).as(Seq("pos", "w")))
    val pa = pos.filter(col("w") === termA)
      .select(col("doc_id"), col("pos").as("p1"))
    val pb = pos.filter(col("w") === termB)
      .select(col("doc_id"), col("pos").as("p2"))
    pa.join(pb, "doc_id")
      .filter(abs(col("p1") - col("p2")) <= window)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("p1") - col("p2"))).cast("long").as("min_dist"))
  }

  def bm25Scores(df: DataFrame, id: Column, text: Column, query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val toks = df.select(id.as("doc_id"), TextOps.tokens(text).as("tk"))
    // one corpus pass for the two global stats; exact integer sum, so the
    // avgdl division is the same double on every engine
    val statsRow = toks.agg(count(lit(1)).as("n"), sum(size(col("tk"))).as("sumdl")).head()
    val n = statsRow.getLong(0)
    val avgdl = statsRow.getLong(1).toDouble / n
    // explode + query filter inside the scan stage; dl rides along
    val pairs = toks.select(col("doc_id"), size(col("tk")).cast("double").as("dl"),
        explode(col("tk")).as("term"))
      .filter(col("term").isin(query: _*))
    val tf = pairs.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val tfc = col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    tf.join(broadcast(dfreq), "term")
      .select(col("doc_id"),
        (floor(idf * tfc * 10000 + 0.5) / 10000).cast(DecimalType(28, 4)).as("s4"))
      .groupBy(col("doc_id")).agg(sum(col("s4")).as("sum4"))
      .select(col("doc_id"),
        (floor(col("sum4").cast("double") * 10000 + 0.5) / 10000).as("bm25"))
  }

  /** Dirichlet-smoothed query-likelihood scores (Zhai & Lafferty 2001) —
    * the language-model retrieval twin of [[bm25Scores]]:
    * score(q,d) = Σ_{t∈q} ln((tf + μ·cf_t/|C|) / (dl + μ)), decomposed
    * as Σ_{matched t} ln(1 + tf·|C|/(μ·cf_t)) − |q|·ln(dl + μ) + const,
    * const = Σ_{t∈q} ln(μ·cf_t/|C|). Query terms unseen in the corpus
    * (cf = 0) are dropped, the standard LM convention — their true
    * probability is 0 and would −∞ every document equally.
    *
    * Cross-engine exactness: the t18 recipe — every ln term is floored
    * at 4 dp and summed as DECIMAL so the score is float-order-free;
    * |C|, cf, tf, dl are exact integers so each ln's argument is the
    * identical double in both engines. Scored docs = docs matching ≥1
    * seen term (the background-only tail scores the same constant for
    * a given dl and is never wanted in a ranking).
    *
    * Scale shape: one corpus pass for |C|; cf needs only the ≤|q|
    * matched-term counts (collected — query-sized metadata, the same
    * driver pattern as bm25's stats row); the scored relation is
    * match-bounded. Output: (doc_id, ql4). */
  def queryLikelihoodScores(df: DataFrame, id: Column, text: Column,
      query: Seq[String], mu: Double = 2000.0): DataFrame = {
    require(query.nonEmpty, "query likelihood needs at least one query term")
    require(mu > 0, s"Dirichlet mu must be positive: $mu")
    val toks = df.select(id.as("doc_id"), TextOps.tokens(text).as("tk"))
    val totalC = toks.agg(sum(size(col("tk"))).as("c")).head().getLong(0)
    val pairs = toks.select(col("doc_id"), size(col("tk")).cast("double").as("dl"),
        explode(col("tk")).as("term"))
      .filter(col("term").isin(query: _*))
    // corpus frequency of each SEEN query term — ≤|q| rows, metadata
    val cf = pairs.groupBy(col("term")).agg(count(lit(1)).as("cf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val qSeen = cf.size
    // exact DECIMAL-style sum of the 4-dp-floored terms (BigDecimal, so
    // Map iteration order cannot wiggle the last ulp), then ONE rounding
    // to double — the same value DuckDB's DECIMAL sum + DOUBLE cast gives
    val const = cf.valuesIterator
      .map(c => BigDecimal(math.floor(math.log(mu * c / totalC) * 10000 + 0.5))
        / 10000)
      .sum.toDouble
    val tf = pairs.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val cfCol = coalesce(element_at(map(cf.toSeq.flatMap { case (t, c) =>
      Seq(lit(t), lit(c.toDouble)) }: _*), col("term")), lit(0.0))
    val term4 = floor(log(lit(1.0) + col("tf") * totalC / (lit(mu) * cfCol))
      * 10000 + 0.5) / 10000
    tf.select(col("doc_id"), col("dl"), term4.cast(DecimalType(28, 4)).as("s4"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s4")).as("sum4"), first(col("dl")).as("dl"))
      .select(col("doc_id"),
        (floor((col("sum4").cast("double")
          - floor(lit(qSeen.toDouble) * log(col("dl") + mu) * 10000 + 0.5) / 10000
          + const) * 10000 + 0.5) / 10000).as("ql4"))
  }

  /** NDCG@k over a (query, doc, score, graded-relevance) table — the
    * ranking-quality acceptance metric for the retrieval ops (b01–b06
    * produce the scores; this grades them against labels).
    * DCG = Σ_{rank ≤ k} (2^rel − 1)/log₂(rank+1), normalized by the
    * ideal ordering's DCG; all-zero-relevance queries → NULL (no
    * ranking can be graded).
    *
    * Determinism/exactness: ranks are row_numbers with the doc id as
    * the tie-break (reproducible ranking, the t16 discipline); gains
    * are EXACT integers via bit-shift (never pow()); each gain/log₂
    * term is 8-dp floored + DECIMAL-summed so per-query DCG is
    * float-order-free. One window pass per ordering, both on the qid
    * partitioning — per-query work, never global.
    * Output: (qid, n_docs, ndcg6). */
  def ndcgAtK(df: DataFrame, qid: Column, docId: Column, score: Column,
      rel: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    val base = df.select(qid.as("__q"), docId.as("__d"),
      score.cast("double").as("__s"), rel.cast("int").as("__r"))
    val byScore = Window.partitionBy(col("__q"))
      .orderBy(col("__s").desc, col("__d").asc)
    val byRel = Window.partitionBy(col("__q"))
      .orderBy(col("__r").desc, col("__d").asc)
    def term(rank: Column) =
      when(rank <= k,
        (floor((call_function("shiftleft", lit(1L), col("__r")) - 1)
          .cast("double")
          / (log(rank.cast("double") + 1.0) / log(lit(2.0)))
          * 1e8 + 0.5) / 1e8).cast(DecimalType(38, 8)))
    base
      .withColumn("__t", term(row_number().over(byScore)))
      .withColumn("__ti", term(row_number().over(byRel)))
      .groupBy(col("__q").as("qid"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("__dcg"), sum(col("__ti")).as("__idcg"))
      .select(col("qid"), col("n_docs"),
        when(col("__idcg") > 0,
          floor(col("__dcg").cast("double") / col("__idcg").cast("double")
            * 1000000 + 0.5) / 1000000).as("ndcg6"))
  }

  /** Per-query MRR and recall@k — the rank-metric pair next to
    * [[ndcgAtK]] (binary relevance where NDCG wants grades): reciprocal
    * rank of the FIRST relevant result, and the fraction of all
    * relevant docs that surfaced in the top k. The standard eval for
    * retrieval-augmented pipelines (did the gold doc surface, and how
    * high).
    *
    * Determinism/exactness: ranks are row_numbers with the doc id as
    * the tie-break (the t16/b07 discipline); both metrics are ratios of
    * small integers — one division each, 8-dp floored. Queries with no
    * relevant docs emit NULL metrics (counted, not skipped — silent
    * drops would inflate the macro average downstream).
    *
    * Plan at 100 TB: one window pass partitioned by qid (per-query
    * work, never a global sort) and one per-query aggregate.
    * Output: (qid, n_docs, n_rel, first_rel_rank, rr8, hits_at_k,
    * recall8). */
  def mrrRecallAtK(df: DataFrame, qid: Column, docId: Column, score: Column,
      relevant: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    val base = df.select(qid.as("__q"), docId.as("__d"),
      score.cast("double").as("__s"), relevant.cast("boolean").as("__r"))
    val byScore = Window.partitionBy(col("__q"))
      .orderBy(col("__s").desc, col("__d").asc)
    base.withColumn("__rk", row_number().over(byScore))
      .groupBy(col("__q").as("qid"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__r"), 1L).otherwise(0L)).as("n_rel"),
        min(when(col("__r"), col("__rk"))).as("first_rel_rank"),
        sum(when(col("__r") && col("__rk") <= k, 1L).otherwise(0L))
          .as("hits_at_k"))
      .select(col("qid"), col("n_docs"), col("n_rel"), col("first_rel_rank"),
        when(col("n_rel") > 0,
          floor(lit(1e8) / col("first_rel_rank").cast("double") + 0.5) / 1e8)
          .as("rr8"),
        col("hits_at_k"),
        when(col("n_rel") > 0,
          floor(col("hits_at_k").cast("double") / col("n_rel").cast("double")
            * 1e8 + 0.5) / 1e8).as("recall8"))
  }

  /** Top-`k` BM25 retrieval (deterministic: ties broken by doc_id). Plans
    * as TakeOrderedAndProject — per-partition heaps, no global sort. */
  def bm25TopK(df: DataFrame, id: Column, text: Column, query: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(df, id, text, query, k1, b)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(k)

  /** BATCH BM25: top-`k` documents for EVERY query in a query table —
    * the seed-query harvest shape (thousands of topic queries sweeping
    * one corpus pass, not one query per scan). `queries` is (qid, term)
    * pairs, result-sized by definition, so it rides broadcast joins:
    * ONE corpus scan feeds a semi-join on the distinct term set, term
    * statistics (df) are computed once globally, and the per-(query,
    * doc) fan-out is bounded by matches, never |corpus|·|queries|.
    * Ranking runs per qid on the 4-dp-ROUNDED score (ties by doc_id) —
    * the t16 trick that keeps rank reproducible cross-engine.
    *
    * Output: (qid, doc_id, bm25, rank), rank ≤ k. */
  def bm25BatchTopK(df: DataFrame, id: Column, text: Column,
      queries: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("qid"), col("term")).distinct()
    val toks = df.select(id.as("doc_id"), TextOps.tokens(text).as("tk"))
    val statsRow = toks.agg(count(lit(1)).as("n"), sum(size(col("tk"))).as("sumdl")).head()
    val n = statsRow.getLong(0)
    val avgdl = statsRow.getLong(1).toDouble / n
    val pairs = toks.select(col("doc_id"), size(col("tk")).cast("double").as("dl"),
        explode(col("tk")).as("term"))
      .join(broadcast(q.select(col("term")).distinct()), Seq("term"), "leftsemi")
    val tf = pairs.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val tfc = col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    val scored = tf.join(broadcast(dfreq), "term")
      .select(col("doc_id"), col("term"),
        (floor(idf * tfc * 10000 + 0.5) / 10000).cast(DecimalType(28, 4)).as("s4"))
      .join(broadcast(q), "term")
      .groupBy(col("qid"), col("doc_id")).agg(sum(col("s4")).as("sum4"))
      .select(col("qid"), col("doc_id"),
        (floor(col("sum4").cast("double") * 10000 + 0.5) / 10000).as("bm25"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("bm25").desc, col("doc_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack & Clarke
    * 2009) of the BM25 keyword ranking and the embedding-cosine ranking
    * for one query — the curation-harvest shape where neither keywords
    * nor embeddings alone find the right documents. Each side
    * contributes 1/(rrfK + rank) for its top `nPerSide`; a document
    * absent from a side contributes 0 there. Fusion needs only the two
    * result lists (≤ nPerSide rows each), so everything after the two
    * retrieval passes is result-sized: the rank windows and the
    * full-outer fuse join run on ≤ 2·nPerSide rows — the single
    * partition they plan into IS the bounded driver-adjacent work, not a
    * corpus shuffle. Ranks are assigned on the 4-dp-ROUNDED scores with
    * id tiebreaks (the t16/b03 contract) so rank — and therefore the
    * fused score — is reproducible cross-engine.
    *
    * Output: (doc_id, rrf6, r_lex, r_sem), top `k` by fused score. */
  def hybridTopK(docs: DataFrame, id: Column, text: Column,
      embs: DataFrame, eId: Column, eVec: Column,
      queryTerms: Seq[String], queryVec: Seq[Double], k: Int,
      nPerSide: Int = 50, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, id, text, queryTerms, nPerSide)
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("r_lex"))
    val sem = Similarity.bruteForceTopK(embs, eId, eVec, queryVec, nPerSide)
      .withColumn("cos4", floor(col("cosine") * 10000 + 0.5) / 10000)
      .withColumn("r_sem", row_number().over(
        Window.orderBy(col("cos4").desc, col("vec_id").asc)))
      .select(col("vec_id").as("doc_id"), col("r_sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (floor((coalesce(lit(1.0) / (lit(rrfK) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("r_sem")), lit(0.0))) * 1000000 + 0.5)
          / 1000000).as("rrf6"),
        col("r_lex"), col("r_sem"))
      .orderBy(col("rrf6").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Pseudo-relevance-feedback retrieval (Rocchio-lite query expansion):
    * run the query, take the top `r` feedback documents, mine their `m`
    * strongest terms (tf within the feedback set × the t16 idf
    * ln((N+1)/(df+1)), 4-dp rounded, original query terms excluded,
    * term-asc tie-break), append them to the query, retrieve top `k`
    * with the expanded query — the classic recall-boosting harvest loop
    * when the seed query undersamples the topic's vocabulary.
    *
    * Scale shape: two BM25 passes (each one corpus scan over (doc,
    * term) count pairs) plus one expansion-mining pass; the only
    * driver-side state is the r feedback ids and m expansion terms —
    * result-sized by definition. Every ranking is on 4-dp-rounded
    * scores with id/term tie-breaks, so the whole loop — feedback set,
    * expansion terms, final ranking — replays identically on any
    * engine. Output: top `k` (doc_id, bm25) under the expanded query. */
  def prfTopK(df: DataFrame, id: Column, text: Column, query: Seq[String],
      r: Int, m: Int, k: Int): DataFrame = {
    require(r >= 1 && m >= 1 && k >= 1, s"need r,m,k >= 1: r=$r m=$m k=$k")
    val fb = bm25TopK(df, id, text, query, r)
      .select(col("doc_id")).collect().map(_.get(0)).toSeq
    val toks = df.select(id.as("doc_id"), TextOps.tokens(text).as("tk"))
    val n = toks.count()
    val pairs = toks.select(col("doc_id"), explode(col("tk")).as("term"))
    val fbTf = pairs.filter(col("doc_id").isin(fb: _*))
      .filter(!col("term").isin(query: _*))
      .groupBy(col("term")).agg(count(lit(1)).cast("double").as("tf"))
    // df only matters for the candidate terms (the r feedback docs'
    // vocabulary — result-sized): semi-join BEFORE the distinct so the
    // corpus never materializes its full (doc, term) inverted index here
    val dfc = pairs
      .join(broadcast(fbTf.select(col("term"))), Seq("term"), "leftsemi")
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val expansion = fbTf.join(dfc, "term")
      .select(col("term"), (floor(col("tf")
        * log((lit(n.toDouble) + 1.0) / (col("df") + 1.0)) * 10000 + 0.5)
        / 10000).as("s4"))
      .orderBy(col("s4").desc, col("term").asc).limit(m)
      .collect().map(_.getString(0)).toSeq
    bm25TopK(df, id, text, query ++ expansion, k)
  }
}
