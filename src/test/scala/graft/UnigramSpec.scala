package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer (unigram_train / unigram_encode): exact
  * equality against an independent in-JVM reference trainer (the
  * bpe_train convention — seed, EM rounds, tie rules re-implemented
  * from the algorithm definition, not shared code), lossless
  * round-trip, compression signal, and partitioning invariance.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  // ---- independent reference implementation ----

  private def refNormalize(t: String): Array[String] =
    t.toLowerCase.replaceAll("\\s+", " ").trim
      .split(" ").filter(_.nonEmpty)

  /** Reference Viterbi under the shared tie convention: best score,
    * then fewer pieces, then the longer last piece per cell.
    */
  private def refSegment(word: String, model: Map[String, Long]): List[String] = {
    val b = math.max(1L, model.values.sum)
    val lnB = math.log(b.toDouble)
    val unk = math.log(0.5) - lnB
    val maxLen = if (model.isEmpty) 1 else model.keys.map(_.length).max
    val n = word.length
    // dp: (score, pieceCount, lastStart)
    val dp = Array.fill[(Double, Int, Int)](n + 1)((Double.NegativeInfinity, 0, -1))
    dp(0) = (0.0, 0, -1)
    for (j <- 1 to n; i <- math.max(0, j - maxLen) until j
         if dp(i)._1 > Double.NegativeInfinity) {
      val sub = word.substring(i, j)
      val sOpt =
        if (model.contains(sub)) Some(dp(i)._1 + math.log(model(sub).toDouble) - lnB)
        else if (j - i == 1) Some(dp(i)._1 + unk)
        else None
      for (s <- sOpt) {
        val k = dp(i)._2 + 1
        val (bs, bk, bi) = dp(j)
        if (s > bs || (s == bs && (k < bk || (k == bk && i < bi))))
          dp(j) = (s, k, i)
      }
    }
    var pos = n
    var out = List.empty[String]
    while (pos > 0) { out = word.substring(dp(pos)._3, pos) :: out; pos = dp(pos)._3 }
    out
  }

  private def refTrain(texts: Seq[String]): Seq[(String, Long)] = {
    import operators.Tokenizer.{UniEmRounds, UniMaxPieceLen, UniSeedCap, UniVocabTarget}
    val freqs = texts.flatMap(refNormalize).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val subCounts = collection.mutable.Map.empty[String, Long]
    for ((w, f) <- freqs; i <- 0 until w.length;
         j <- (i + 1) to math.min(w.length, i + UniMaxPieceLen))
      subCounts(w.substring(i, j)) = subCounts.getOrElse(w.substring(i, j), 0L) + f
    val top = subCounts.toSeq.sortBy { case (p, c) => (-c, p) }.take(UniSeedCap)
    val chars = subCounts.toSeq.filter(_._1.length == 1)
    var model = (top ++ chars).distinctBy(_._1)
      .sortBy { case (p, c) => (-c, p) }
    for (_ <- 1 to UniEmRounds if model.nonEmpty) {
      val m = model.toMap
      val counts = collection.mutable.Map.empty[String, Long]
      for ((w, f) <- freqs; p <- refSegment(w, m))
        counts(p) = counts.getOrElse(p, 0L) + f
      val inModel = m.keySet
      val kept = model.flatMap { case (p, _) =>
        counts.get(p) match {
          case Some(c) => Some((p, c))
          case None if p.length == 1 => Some((p, 1L))
          case None => None
        }
      } ++ counts.toSeq.collect { case (p, c) if !inModel(p) => (p, c) }
      model = kept.sortBy { case (p, c) => (-c, p) }
    }
    (model.take(UniVocabTarget) ++ model.filter(_._1.length == 1))
      .distinctBy(_._1).sortBy { case (p, c) => (-c, p) }
  }

  // ---- tests ----

  test("trained model equals the independent reference trainer exactly") {
    val docs = Tables(spark, sf).documents
    val got = operators.Tokenizer.trainUnigramModel(docs)
    val texts = docs.select(col("text")).collect().map(_.getString(0)).toSeq
    val want = refTrain(texts)
    assert(got == want,
      s"model mismatch:\n got ${got.take(12)}...\nwant ${want.take(12)}...")
    assert(got.nonEmpty && got.exists(_._1.length > 1),
      "model learned no multi-char pieces")
  }

  test("encode is a lossless segmentation and compresses vs characters") {
    val docs = Tables(spark, sf).documents
    val model = operators.Tokenizer.trainUnigramModel(docs)
    val toks = docs
      .withColumn("toks", graft.functions.UnigramFunctions.encodeText(
        graft.functions.TextFunctions.words(col("text")), model))
      .select(col("doc_id"), col("text"), col("toks"))
      .limit(25).collect()
    for (r <- toks) {
      val words = refNormalize(r.getString(1))
      val pieces = r.getSeq[String](2)
      assert(pieces.mkString("") == words.mkString(""),
        s"doc ${r.getLong(0)}: pieces do not reassemble the words")
      assert(pieces.size >= words.length, "each word is at least one piece")
      assert(pieces.size < words.map(_.length).sum,
        s"doc ${r.getLong(0)}: no compression vs characters")
    }
    // registered query shape: n_words <= n_tokens < total chars
    val enc = operators.Tokenizer.unigramEncodeOn(docs, model)
    val bad = enc.join(docs, "doc_id")
      .filter(col("n_tokens") < col("n_words") ||
        col("n_tokens") >= length(col("text")))
      .count()
    assert(bad == 0L, s"$bad docs violate the token-count envelope")
  }

  test("training is partitioning-invariant and the artifact is deterministic") {
    val docs = Tables(spark, sf).documents
    val a = operators.Tokenizer.trainUnigramModel(docs)
    val b = operators.Tokenizer.trainUnigramModel(docs.repartition(7))
    assert(a == b, "model depends on partitioning")
    val q1 = SparkEntry.queries("unigram_train")(spark, sf).collect().toSeq
    val q2 = SparkEntry.queries("unigram_train")(spark, sf).collect().toSeq
    assert(q1 == q2)
    // prob_ppm is the count lattice over the model total
    val total = a.map(_._2).sum
    val first = q1.head
    assert(first.getLong(3) == (BigInt(a.head._2) * 1000000 / total).toLong)
  }

  test("unknown characters segment as themselves at the unknown score") {
    import spark.implicits._
    val model = Seq(("ab", 10L), ("a", 5L), ("b", 5L))
    val out = Seq(Seq("abzab")).toDF("w")
      .select(graft.functions.UnigramFunctions.encodeText(col("w"), model))
      .head().getSeq[String](0)
    assert(out == Seq("ab", "z", "ab"), s"got $out")
  }

  test("out-of-vocab probe: an unknown multi-char substring never becomes a piece") {
    // regression for the boxed-map bug: with primitive map values a
    // missing key's null unboxed to 0.0, so the unknown substring
    // "ab" scored −lnB, beating the legit a+b path (−2·lnB) and
    // emitting a piece OUTSIDE the vocabulary
    val m = new java.util.HashMap[String, java.lang.Double]()
    m.put("a", java.lang.Double.valueOf(math.log(1.0)))
    m.put("b", java.lang.Double.valueOf(math.log(1.0)))
    val segs = graft.functions.UnigramFunctions
      .segmentWord("ab", m, 2, math.log(2.0), math.log(0.5) - math.log(2.0))
    assert(segs.toList == List("a", "b"), s"got ${segs.toList}")
    // and end-to-end: every emitted piece of every encoded doc is in
    // the trained vocabulary or a single character (the unk path)
    val docs = Tables(spark, sf).documents
    val model = operators.Tokenizer.trainUnigramModel(docs)
    val vocab = model.map(_._1).toSet
    import org.apache.spark.sql.functions.{col, explode}
    val pieces = docs
      .select(explode(graft.functions.UnigramFunctions.encodeText(
        graft.functions.TextFunctions.words(col("text")), model)).as("p"))
      .distinct().collect().map(_.getString(0))
    val bad = pieces.filterNot(p => vocab.contains(p) || p.length == 1)
    assert(bad.isEmpty, s"out-of-vocab pieces emitted: ${bad.take(5).toList}")
  }
}
