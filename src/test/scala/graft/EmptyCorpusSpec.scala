package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Empty-corpus robustness: an aggressive filter chain (quality gate,
  * dedup, decontamination) can legally leave ZERO rows for a
  * downstream operator, and at 100 TB some partition of the pipeline
  * WILL see that eventually. Every text-family operator must return
  * an empty (correctly-schemed) frame, not throw — the seq_pack
  * null-bounds crash this class of test exists for was found live
  * when a pathological corpus decontaminated to nothing inside
  * pipeline_e2e.
  */
class EmptyCorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  private def emptyDocs: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
    "quality_score" -> (d => operators.Text.qualityScoreOn(d)),
    "rep_stats" -> (d => operators.Text.repStatsOn(d)),
    "rep_scrub" -> (d => operators.Text.repScrubOn(d)),
    "dedup_lines" -> (d => operators.Text.dedupLinesOn(d)),
    "dedup_fuzzy_text" -> (d => operators.Text.dedupFuzzyTextOn(d)),
    "dedup_spans" -> (d => operators.Text.dedupSpansOn(d)),
    "span_scrub" -> (d => operators.Text.spanScrubOn(d)),
    "chunk_dedup" -> (d => operators.Text.chunkDedupOn(d)),
    "ngram_jaccard" ->
      (d => operators.Text.ngramJaccardOn(operators.Text.shingleSetOf(d), 0.5)),
    "winnow_pairs" -> (d => operators.Text.winnowPairsOn(d)),
    "winnow_clusters" -> (d => operators.Text.winnowClustersOn(d)),
    "dedup_minhash" -> (d => operators.Dedup.minhashOn(d)),
    "doc_embed" -> (d => operators.Curation.docEmbedOn(d)),
    "seq_pack" -> (d => operators.Curation.seqPackOn(d)),
    "sample_mixture" -> (d => operators.Curation.sampleMixtureOn(d)),
    "corpus_stats" -> (d => operators.Curation.corpusStatsOn(d)),
    "quantile_sketch" -> (d => operators.Curation.quantileCardOn(d)),
    "corpus_shuffle" -> (d => operators.Curation.corpusShuffleOn(d)),
    "freq_words" -> (d => operators.Text.freqWordsOn(d)),
    "inverted_index" -> (d => operators.Text.invertedIndexOn(d)),
    "html_extract" -> (d => operators.Text.htmlExtractOn(d)),
    "pipeline_e2e" -> (d => operators.Pipeline.pipelineE2eOn(d)),
    // round-7 wave-2/3 curation cards
    "gopher_quality" -> (d => operators.Text.gopherQualityOn(d)),
    "cms_words" -> (d => operators.Text.cmsWordsOn(d)),
    "domain_stats" -> (d => operators.Text.domainStatsOn(d)),
    "domain_topk" -> (d => operators.Text.domainTopkOn(d)),
    "bloom_decontaminate" ->
      (d => operators.Text.bloomDecontaminateOn(operators.Text.shingleSetOf(d))),
    "sample_weighted" -> (d => operators.Curation.sampleWeightedOn(
      d.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang")),
      org.apache.spark.sql.functions.lit(10000L))),
    "word_pmi" -> (d => operators.Text.wordPmiOn(d)),
    "graph_communities" -> (d => {
      import d.sparkSession.implicits._
      operators.Graph.graphCommunitiesOn(
        Seq.empty[Long].toDF("c_custkey"),
        Seq.empty[Long].toDF("s_suppkey"),
        Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"),
        Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"))
    }),
    // the fixpoint loop on zero nodes converges at the 2-half-round
    // minimum and the card (incl. the 1-row meta broadcast) is empty
    "community_stats" -> (d => {
      import d.sparkSession.implicits._
      operators.Graph.communityStatsOn(
        Seq.empty[Long].toDF("c_custkey"),
        Seq.empty[Long].toDF("s_suppkey"),
        Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"),
        Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey"))
    }),
    // round-7 wave-8 retrieval pair
    "bm25_search" -> (d => operators.Retrieval.bm25SearchOn(d)),
    "ann_maxsim" -> (d => operators.Retrieval.annMaxsimOn(d)),
    // round-7 wave-10 unigram tokenizer: empty corpus → empty model
    // → empty frames, and the empty model must still encode
    "unigram_train" -> (d => operators.Tokenizer.unigramModelDf(
      d.sparkSession, operators.Tokenizer.trainUnigramModel(d))),
    "unigram_encode" -> (d => operators.Tokenizer.unigramEncodeOn(
      d, operators.Tokenizer.trainUnigramModel(d))),
    "mix_budget" -> (d => operators.Curation.mixBudgetOn(d)),
    "mix_temperature" -> (d => operators.Curation.mixTemperatureOn(d)),
    "shard_balance" -> (d => operators.Curation.shardBalanceOn(d)),
    "dedup_containment" -> (d => operators.Text.containmentOn(d)),
    "url_filter" -> (d => operators.Text.urlFilterOn(d)),
    "tok_fertility" -> (d => operators.Text.tokFertilityOn(d)),
    "quality_calib" -> (d => operators.Text.qualityCalibOn(d)),
    "comp_ratio" -> (d => operators.Text.compRatioOn(d)),
    // round-10 cards
    "lang_id" -> (d => operators.Text.langIdOn(d)),
    "quality_ensemble" -> (d => operators.Quality.qualityEnsembleOn(d))
  )

  for ((name, op) <- ops)
    test(s"$name survives an empty corpus") {
      assert(op(emptyDocs).count() == 0L, s"$name emitted rows from nothing")
    }

  test("a perplexity gate trained on an empty corpus is a pass-through") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val gate = streaming.CurationStream.trainPerplexityGate(
      emptyDocs.select(col("doc_id"), col("text"), col("lang")))
    assert(gate.vocab == 0L && gate.tailThresholds.isEmpty && gate.c2.isEmpty)
    // no model, no thresholds: the gated stream admits exactly what
    // the ungated one does (what cannot be measured is not dropped)
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("text"), col("lang"))
      .withColumn("event_ts",
        expr("timestamp_micros(CAST(1700000000000000 + doc_id AS BIGINT))"))
    val gated = streaming.CurationStream.curateGated(docs, gate)
      .select("fingerprint").distinct().collect().map(_.getString(0)).toSet
    val ungated = streaming.CurationStream.curate(docs)
      .select("fingerprint").distinct().collect().map(_.getString(0)).toSet
    assert(gated == ungated)
  }

  private def emptyEmb: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
  }

  private val vecOps: Seq[(String, DataFrame => DataFrame)] = Seq(
    "semdedup" -> (e => operators.Clustering.semdedupOn(e)),
    "emb_pca" -> (e => operators.Clustering.embPcaOn(
      e.select(org.apache.spark.sql.functions.col("v")))),
    "ann_pq" -> (e => operators.SimilaritySearch.annPqOn(e, 10, 3)),
    "knn_graph" -> (e => operators.SimilaritySearch.knnGraphOn(e, 5)),
    "contrastive_pairs" -> (e => operators.SimilaritySearch.contrastivePairsOn(e)),
    "dsir_select" -> (_ => operators.LangModel.dsirSelectOn(emptyDocs)),
    "ccnet_buckets" -> (_ => operators.LangModel.ccnetBucketsOn(emptyDocs)),
    // the rest of the ANN/quantization family: an empty corpus means
    // an EMPTY MODEL too (zero centroids, zero-entry PQ codebook,
    // zero LSH buckets) — these paths exercise expression
    // construction with empty matrices, not just zero-row scans
    "ann_topk" -> (e => operators.SimilaritySearch.annTopKOn(e, 10)),
    "ann_ivf" -> (e => operators.SimilaritySearch.annIvfOn(e, 10, 4, trained = true)),
    "ann_ivf_stride" -> (e => operators.SimilaritySearch.annIvfOn(e, 10, 4, trained = false)),
    "ann_lsh" -> (e => operators.SimilaritySearch.annLshOn(e, 10)),
    "ann_radius" -> (e => operators.SimilaritySearch.annRadiusOn(e)),
    "ann_ivf_pq" -> (e => operators.SimilaritySearch.annIvfPqOn(e, 10, 4, 4)),
    "vec_quant" -> (e => operators.SimilaritySearch.vecQuantOn(e)),
    "pq_codes" -> (e => operators.SimilaritySearch.pqCodesOn(e)),
    "dedup_embedding" -> (e => operators.Dedup.embeddingOn(e)),
    "ann_incremental" -> (e => operators.SimilaritySearch.annIncrementalOn(e)),
    "ivf_tune" -> (e => operators.SimilaritySearch.ivfTuneOn(e, 10)),
    "emb_health" -> (e => operators.Clustering.embHealthOn(e))
  )

  for ((name, op) <- vecOps)
    test(s"$name survives an empty vector corpus") {
      assert(op(emptyEmb).count() == 0L, s"$name emitted rows from nothing")
    }

  test("ann_eval survives an empty vector corpus (all-zero card, no ANSI div-by-zero)") {
    // the recall card is a global aggregate: zero queries degrade to
    // one all-zero row PER METHOD, never an integral divide error
    val card = operators.SimilaritySearch.annEvalOn(emptyEmb, 10).collect()
    assert(card.length == 5, s"expected one card row per method, got ${card.length}")
    card.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 0L)
      assert(r.getAs[Long]("n_hits") == 0L)
      assert(r.getAs[Long]("mean_recall_ppm") == 0L)
      assert(r.getAs[Long]("worst_recall_ppm") == 0L)
    }
  }

  // the reference-derived family on a quiet day: an events table with
  // zero rows (a sensor fleet can legally deliver nothing in a window)
  private def emptyEvents: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Double, java.sql.Timestamp)]
      .toDF("event_id", "user_id", "value", "ts")
  }

  private val healthOps: Seq[(String, DataFrame => DataFrame)] = Seq(
    "hr_parse" -> (e => operators.Health.hrParseOn(e)),
    "hr_classify" -> (e => operators.Health.hrClassifyOn(e)),
    "hr_window_tumbling" -> (e => operators.Health.hrWindowTumblingOn(e)),
    "hr_window_sliding" -> (e => operators.Health.hrWindowSlidingOn(e)),
    "hr_episodes" -> (e => operators.Health.hrEpisodesOn(e)),
    "hr_alert_stats" -> (e => operators.Health.hrAlertStatsOn(e))
  )

  for ((name, op) <- healthOps)
    test(s"$name survives an empty events table") {
      assert(op(emptyEvents).count() == 0L, s"$name emitted rows from nothing")
    }

  test("ts_seasonal and q44_dynamic_pivot survive an empty typed-events table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(operators.Temporal.tsSeasonalOn(empty).count() == 0L)
    assert(operators.Relational.q44On(empty).count() == 0L)
    assert(operators.Relational.q45On(empty).count() == 0L)
    assert(operators.Temporal.tsGapsOn(empty).count() == 0L)
    assert(operators.Temporal.tsForecastOn(empty).count() == 0L)
    assert(operators.Curation.eventPathsOn(empty).count() == 0L)
  }

  test("proto_prune survives an empty labeled-embedding table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(operators.Clustering.protoPruneOn(empty).count() == 0L)
  }
}
