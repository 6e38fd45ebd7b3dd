package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer/encoder semantics: the distributed trainer must equal
  * an INDEPENDENT in-memory reference implementation (plain Scala
  * maps over the collected corpus — no shared code with the
  * operator), and encoding must actually compress.
  */
class TokenizerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  /** Codepoint symbols + UTF-8 byte order, matching the engine's
    * semantics (Spark strings sort by UTF-8 bytes; BpeFunctions
    * splits codepoints) — the winnow UTF-16 lesson applied here.
    */
  private def cpSyms(w: String): Vector[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toVector

  private val u8Order: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n && x(i) == y(i)) i += 1
    if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
  }

  /** Reference trainer: the subword-nmt algorithm verbatim over a
    * word-frequency map.
    */
  private def referenceTrain(wordFreq: Map[String, Long],
      numMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      (cpSyms(w) :+ "</w>") -> f
    }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    while (out.length < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        // deterministic argmax: max count, then lexicographic pair
        // (UTF-8 byte order, as the engine sorts)
        implicit val o: Ordering[String] = u8Order
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < 2) done = true
        else {
          out += ((l, r, c))
          vocab = vocab.map { case (syms, f) =>
            val merged = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                merged += l + r; i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.toVector -> f
          }
        }
      }
    }
    out.toSeq
  }

  private lazy val corpusWordFreq: Map[String, Long] = {
    val texts = Tables(spark, sf).documents.select("text").collect().map(_.getString(0))
    texts.flatMap(_.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
  }

  test("bpe_train equals the independent reference trainer on the full corpus") {
    val expected = referenceTrain(corpusWordFreq, operators.Tokenizer.NumMerges)
    val got = SparkEntry.queries("bpe_train")(spark, sf).collect()
      .map(r => (r.getAs[String]("lsym"), r.getAs[String]("rsym"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(got == expected,
      s"merge tables diverge at rank ${got.zip(expected).indexWhere(t => t._1 != t._2) + 1}")
    assert(got.nonEmpty && got.length <= operators.Tokenizer.NumMerges)
  }

  test("bpe_encode: reference encoding per word, compression, map-side plan") {
    val merges = operators.Tokenizer.trainMerges(
      Tables(spark, sf).documents, operators.Tokenizer.NumMerges)
      .map { case (_, l, r, _) => (l, r) }
    // reference-encode each distinct word with the learned table and
    // derive every doc's token count independently of the expression
    def encodeWord(w: String): Vector[String] = {
      var syms = cpSyms(w) :+ "</w>"
      for ((l, r) <- merges) {
        val merged = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            merged += l + r; i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.toVector
      }
      syms
    }
    val tokensPerWord: Map[String, Long] =
      corpusWordFreq.keySet.map(w => w -> encodeWord(w).length.toLong).toMap
    val docs = Tables(spark, sf).documents.select("doc_id", "text").collect()
    val expected = docs.map { r =>
      val ws = r.getString(1).toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)
      r.getLong(0) -> ws.map(tokensPerWord).sum
    }.toMap
    val df = operators.Tokenizer.bpeEncodeOn(
      Tables(spark, sf).documents, merges)
    val got = df.collect()
    assert(got.map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap == expected)
    // learning happened: tokens per word strictly below characters
    // per word (chars+1 is the unmerged count), and above 1
    val totTok = got.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val totWords = got.map(_.getAs[Long]("n_words")).sum.toDouble
    val totChars = corpusWordFreq.map { case (w, f) => (w.length + 1) * f }.sum.toDouble
    assert(totTok < 0.7 * totChars, s"merges barely compressed: $totTok vs $totChars symbols")
    assert(totTok > totWords, "token count below word count — over-merged")
    // encoding is map-side: the only exchange is the output sort
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.split("Exchange").length - 1 == 1,
      s"bpe_encode should shuffle only for the output sort:\n$plan")
  }

  test("bpe_train: the in-memory and distributed merge loops are bit-identical") {
    // the round-16 volume-adaptive trainer runs the merge rounds
    // driver-side while the vocabulary fits DriverVocabCap; this pins
    // the two paths to each other on the same word-frequency table
    // (the registered query is additionally pinned to the independent
    // reference trainer above and to the DuckDB oracle)
    import graft.functions.TextFunctions.words
    val wf = Tables(spark, sf).documents
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val mat = graft.Materialize.eager(wf)
    try {
      val dist = operators.Tokenizer.trainMergesDistributed(
        mat, operators.Tokenizer.NumMerges)
      val mem = operators.Tokenizer.trainMergesInMemory(
        mat.collect().map(r => (r.getString(0), r.getLong(1))),
        operators.Tokenizer.NumMerges)
      assert(dist.nonEmpty)
      assert(mem == dist,
        s"paths diverge at rank ${mem.zip(dist).indexWhere(t => t._1 != t._2) + 1}")
    } finally graft.Materialize.release(mat)
  }
}
