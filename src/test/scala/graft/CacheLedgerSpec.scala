package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The artifact-cache retention contract (r9 verdict #8 + the r9
  * advisory): every memoized family is registered in [[CacheLedger]],
  * lookups are corpus-FINGERPRINT-keyed (a corpus regenerated under
  * the same path can never serve a stale artifact — the advisory's
  * staleness scenario, reproduced here), and a drain leaves the
  * SparkContext with zero persisted RDDs, bounding any many-query
  * run's retained storage.
  */
class CacheLedgerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("the ledger lists every artifact family") {
    CacheLedger.touchAll()
    val names = CacheLedger.all.map(_.name).toSet
    val expected = Set("dedup_pairs", "dedup_labels", "lm_scores",
      "bpe_merges", "unigram_models")
    assert(expected.subsetOf(names),
      s"unregistered artifact families: ${expected -- names}")
  }

  test("artifact caches fill on use; drain empties them and leaves zero persisted RDDs") {
    CacheLedger.touchAll()
    CacheLedger.drain(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "drain left persisted RDDs behind")
    // touch three families: dedup pair artifacts (4 methods), cluster
    // labels, LM scores
    operators.Dedup.dedupEval(spark, sf).collect()
    operators.Dedup.clusterStats(spark, sf).collect()
    operators.LangModel.ccnetBuckets(spark, sf).collect()
    assert(CacheLedger.retainedTotal >= 5,
      s"expected >= 5 retained artifacts, got ${CacheLedger.retainedTotal}")
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "artifacts should hold materialized blocks while cached")
    CacheLedger.drain(spark)
    assert(CacheLedger.retainedTotal == 0, "drain left ledger entries")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "drain left persisted RDDs behind after artifact fill")
  }

  test("a corpus regenerated under the same path recomputes the artifact (fingerprint keying)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fp").toString
    def write(texts: Seq[String]): Unit =
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "src", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // corpus 1: two verbatim near-duplicates -> exactly one pair
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    write(Seq(dup, dup + " extra", "something entirely different here today ok"))
    val first = operators.Dedup.ngramJaccardPairs(spark, dir).count()
    assert(first >= 1, "fixture should contain at least one near-dup pair")
    // corpus 2, SAME path: no near-dups at all. The parquet files have
    // different sizes, so the metadata fingerprint must miss and the
    // pair artifact must be rebuilt — a (dir)-keyed cache would serve
    // the stale 1-pair frame here (the advisory's exact scenario).
    write(Seq("alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine",
      "red orange yellow green blue indigo violet colors"))
    val second = operators.Dedup.ngramJaccardPairs(spark, dir).count()
    assert(second == 0,
      s"stale pair artifact served for a regenerated corpus ($second pairs)")
  }
}
