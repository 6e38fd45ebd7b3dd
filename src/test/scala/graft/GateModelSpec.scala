package graft

import graft.streaming.CurationStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming-gate LM's size law (the round-7 verdict's
  * design-for-scale item): the model that reaches the driver is
  * pruned to a hard cap BEFORE the collect, so the ingest path can
  * never OOM on a corpus whose bigram-type count outgrows the
  * unigram vocabulary — and the pruning is invisible when the cap
  * doesn't bind.
  */
class GateModelSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private lazy val docs = Tables(spark, sf).documents
    .select(col("doc_id"), col("text"), col("lang"))

  test("default cap does not bind on the test corpus: pruned model ≡ unpruned") {
    val (c2a, c1a, va, tha) = operators.LangModel.perplexityGateData(docs)
    val (c2b, c1b, vb, thb) =
      operators.LangModel.perplexityGateData(docs, Int.MaxValue)
    assert(c2a == c2b, "bigram map changed under a non-binding cap")
    assert(c1a == c1b, "context map changed under a non-binding cap")
    assert(va == vb && tha == thb)
    // sanity: the corpus is actually below the cap (the premise)
    assert(c2a.size < operators.LangModel.GateModelCap)
  }

  test("a binding cap bounds both maps and keeps exactly the top-count entries") {
    val cap = 10
    val (c2p, c1p, vp, _) = operators.LangModel.perplexityGateData(docs, cap)
    val (c2f, c1f, vf, _) =
      operators.LangModel.perplexityGateData(docs, Int.MaxValue)
    assert(c2p.size == cap && c1p.size == cap,
      s"cap=$cap but sizes ${c2p.size}/${c1p.size}")
    // V is a property of the corpus, not the pruned file — unchanged
    assert(vp == vf)
    // the survivors are the deterministic count-ordered winners
    val topC2 = c2f.toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(cap).toMap
    val topC1 = c1f.toSeq.sortBy { case (w, c) => (-c, w) }.take(cap).toMap
    assert(c2p == topC2, "pruned bigrams are not the top-count set")
    assert(c1p == topC1, "pruned contexts are not the top-count set")
  }

  test("the gate still scores and admits under a heavily pruned model") {
    val gate = CurationStream.trainPerplexityGate(docs, modelCap = 10)
    val ingest = docs.withColumn("event_ts",
      expr("timestamp_micros(CAST(1700000000000000 + doc_id * 1000 AS BIGINT))"))
    val out = CurationStream.curateGated(ingest, gate)
    val rows = out.collect()
    assert(rows.nonEmpty, "pruned gate admitted nothing")
    // pruned-away bigrams score as UNSEEN (the add-one floor), so
    // every multi-word doc still gets a non-null score
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("lm_ppm"))),
      "a scored doc lost its lm_ppm under pruning")
  }
}
