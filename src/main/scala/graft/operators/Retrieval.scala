package graft.operators

import graft.Materialize.MatOps
import graft.Tables
import graft.functions.TextFunctions.words
import graft.functions.VectorFunctions.dotProductLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-time retrieval over the curated corpus (SURVEY §2 #56d,
  * #28c): the lookup side of the index artifacts the engine already
  * builds — BM25 lexical ranking next to [[Text.invertedIndex]]'s
  * postings, and ColBERT-style late-interaction (MaxSim) ranking
  * next to the [[Curation.docEmbed]] / ANN vector family. Reference
  * behavior (hw-kafka-flink-health has no retrieval layer): both are
  * engine-native additions for the training-data pipeline — corpus
  * search drives dedup triage, decontamination lookups, and
  * eval-neighbor audits.
  */
object Retrieval {

  /** Query fixture for [[bm25Search]]: every [[QueryStride]]-th
    * document poses a query (its first [[QueryTermCount]] words,
    * distinct), capped at [[MaxQueries]] so the query set — like
    * [[SimilaritySearch.MaxQueries]] — NEVER grows with the corpus:
    * retrieval cost is O(matches · q) with constant q at any scale.
    */
  val QueryStride = 97
  val QueryTermCount = 5
  val MaxQueries = 32
  val Bm25TopK = 10

  /** bm25_search — BM25-ranked lexical retrieval (k1 = 1.2,
    * b = 0.75): for each query, the [[Bm25TopK]] highest-scoring
    * documents under the Robertson term weighting
    *
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Cross-engine exactness: with k1 = 6/5 and b = 3/4 the tf
    * normalization is the pure integer rational
    * 22·A·tf / (10·A·tf + 3·A + 9·dl·N) (A = corpus words, N = doc
    * count, avgdl = A/N folded in), and the log-idf is replaced by
    * its rank-equivalent rational argument (2N − 2df + 1)/(2df + 1)
    * — ln is monotone, so every per-term weight ranks identically to
    * textbook BM25's, and each term contributes one exact DECIMAL(38)
    * integral division on the ppm lattice (the word_pmi convention).
    * Summed as integers, both engines hash identically — no float
    * anywhere. Overflow guard: numerator ≤ 2N·22·A·tf·10⁶; at
    * N = 10¹², A = 10¹⁴ tokens (100 TB), tf ≤ 10⁴ that is ~4·10³⁷ <
    * 10³⁸ (the lm_score DECIMAL(38) convention).
    *
    * Scale shape: NO full-corpus shuffle anywhere. Doc length is a
    * map-side array-size column (no token explode feeds an
    * aggregation); the global (N, A) scalar folds those sizes in one
    * pass (the word_pmi 1-row broadcast class); the token stream is
    * PRUNED against the broadcast ≤ [[MaxQueries]]·[[QueryTermCount]]
    * query-term set before any aggregation, so the only shuffled
    * rows are (query term × holding doc) pairs — and df comes from
    * that same pruned set (it holds exactly the docs containing each
    * query term), never from a corpus-wide term table. The final
    * shortlist runs on the engine's own [[graft.plans.TopKPerKey]]
    * bounded-heap operator — never a per-query sort of the scored
    * corpus. (A first cut built the full inverted_index-style
    * (term, doc, tf) table — three full-token shuffles, 6-9 s at
    * sf0.1; the pruned form measures ~1 s with identical output.)
    */
  def bm25Search(spark: SparkSession, dir: String): DataFrame =
    bm25SearchOn(Tables(spark, dir).documents)

  private[graft] def bm25SearchOn(docs: DataFrame): DataFrame = {
    // dl: map-side word count; normalize() collapses whitespace, so
    // split() never yields empty tokens except on empty text — the
    // length guard replaces a per-element lambda filter (interpreted
    // HOFs measured wildly erratic here: 5-27 s run spreads at
    // sf0.1; this form is pure codegen). Docs with no tokens drop
    // out (they can't match and must not count toward N/avgdl — the
    // inverted-file convention the oracle mirrors).
    val dl = docs
      .filter(length(graft.functions.TextFunctions.normalize(col("text"))) > 0)
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("dl"))
    val scalars = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("a_words"))
    val qterms = docs
      .filter(col("doc_id") % QueryStride === 0 &&
        col("doc_id") < lit(QueryStride.toLong * MaxQueries))
      .select(col("doc_id").as("query_id"),
        explode(slice(words(col("text")), 1, QueryTermCount)).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    // prune the token stream to query terms BEFORE aggregating: the
    // distinct-term broadcast acts as a semi filter inside the scan
    // stage, so only (query term, holding doc) rows ever shuffle.
    // dl attaches AFTERWARDS via a narrow doc-keyed join — carrying
    // size(words(text)) through the explode makes Catalyst hoist
    // that projection ABOVE the Generate and recompute the
    // regex+split per TOKEN (measured 0.5 s → 4-5 s at sf0.1);
    // the join moves 16-byte rows on both sides instead
    val tfm = docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .join(broadcast(qterms.select(col("term")).distinct()), "term")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .materialized // feeds df AND the scoring join: one scan, not two
    val stats = tfm.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val matched = tfm
      .join(broadcast(stats), "term")  // ≤ |query terms| rows
      .join(broadcast(qterms), "term") // fan out per asking query
      .crossJoin(broadcast(scalars))   // the 1-row scalar class
      .withColumn("term_ppm", expr(
        """(CAST(2 * n_docs - 2 * df + 1 AS DECIMAL(38,0)) * 22 * a_words * tf * 1000000) div
          |(CAST(2 * df + 1 AS DECIMAL(38,0)) *
          | (CAST(10 AS DECIMAL(38,0)) * a_words * tf + 3 * a_words + 9 * dl * n_docs))"""
          .stripMargin).cast("long"))
    val scored = matched.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_ppm")).as("score_ppm"), count(lit(1)).as("n_terms"))
    val topk = graft.plans.TopK.topKPerKey(scored,
      keys = Seq(col("query_id")),
      order = Seq(col("score_ppm").desc, col("doc_id").asc), k = Bm25TopK)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
    topk
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_ppm"), col("n_terms"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Query fixture for [[annMaxsim]]: stride co-prime to the BM25
    * one so the two query sets differ; same [[MaxQueries]] cap.
    */
  val MaxsimStride = 131
  val MaxsimTopK = 10

  /** ann_maxsim — late-interaction (ColBERT-style MaxSim) retrieval:
    * documents and queries are BAGS of chunk vectors (the
    * [[Curation.docChunk]] 100-word/80-stride segmentation, each
    * chunk embedded by the [[graft.functions.EmbedKernel]] hashing
    * trick), and score(q, d) = Σ_{qc ∈ q} max_{dc ∈ d} sim(qc, dc) —
    * the retrieval granularity single-vector ANN can't express: a
    * long document matching a query on ONE strong passage ranks by
    * that passage, not its diluted mean.
    *
    * Cross-engine exactness: sim is the signed-cos² ppm lattice
    * max(dot, 0)²·10⁶ div (n2_q·n2_d) — monotone in cosine on the
    * non-negative half (and negative-cosine chunk pairs clamp to 0,
    * the ReLU convention, which also keeps the integral division
    * positive where Spark's `div` truncates but DuckDB's `//`
    * floors). All integers: dot and the squared norms come from the
    * integer hashing-trick vectors, and chunks are ≤ 100 words by
    * construction so dot²·10⁶ ≤ 10¹⁴ is LONG-safe at ANY corpus
    * size. Float sums never cross engines (a float MaxSim sum would
    * be partition-order-dependent).
    *
    * Scale shape: corpus chunks embed MAP-SIDE inside the scan stage
    * (EmbedKernel per chunk — no vocabulary, no shuffle); the
    * ≤ [[MaxQueries]] queries' chunk vectors broadcast from their
    * own pruned scan, and the pairwise scoring is the designed
    * O(corpus_chunks · query_chunks) pass of the ann_topk class;
    * both MaxSim reductions (max over doc chunks, sum over query
    * chunks) are map-side-combinable aggregates, so the shuffle
    * carries ≤ one row per (query, doc) key; shortlist via
    * [[graft.plans.TopKPerKey]]. An IVF-routed candidate cut
    * (score only cells the query probes — [[SimilaritySearch.annIvf]])
    * composes upstream when corpus_chunks · q outgrows the scan.
    */
  def annMaxsim(spark: SparkSession, dir: String): DataFrame =
    annMaxsimOn(Tables(spark, dir).documents)

  private[graft] def annMaxsimOn(docs: DataFrame): DataFrame = {
    def chunkVecs(d: DataFrame): DataFrame =
      Curation.chunksOf(d)
        .withColumn("ev", graft.functions.EmbedKernel.embedKernel(words(col("chunk_text"))))
        .select(col("doc_id"), col("chunk_id"),
          col("ev.vec").as("vec"), col("ev.n2").as("n2"))
    val corpus = chunkVecs(docs)
    val queries = chunkVecs(
        docs.filter(col("doc_id") % MaxsimStride === 0 &&
          col("doc_id") < lit(MaxsimStride.toLong * MaxQueries)))
      .select(col("doc_id").as("qid"), col("chunk_id").as("qcid"),
        col("vec").as("qv"), col("n2").as("qn2"))
    val pairs = corpus.join(broadcast(queries), col("doc_id") =!= col("qid"))
      .withColumn("dot", dotProductLong(col("qv"), col("vec")))
      .withColumn("s2_ppm",
        when(col("dot") > 0 && col("qn2") > 0 && col("n2") > 0,
          expr("(dot * dot * 1000000L) div (qn2 * n2)")).otherwise(lit(0L)))
    val best = pairs.groupBy(col("qid"), col("qcid"), col("doc_id"))
      .agg(max(col("s2_ppm")).as("best_ppm"))
    val scored = best.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("best_ppm")).as("score_ppm"))
    val topk = graft.plans.TopK.topKPerKey(scored,
      keys = Seq(col("qid")),
      order = Seq(col("score_ppm").desc, col("doc_id").asc), k = MaxsimTopK)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
    topk
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("qid"), col("rank"), col("doc_id"), col("score_ppm"))
      .orderBy(col("qid"), col("rank"))
  }
}
