package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dq_check / drift_check semantics: planted violations are counted
  * exactly (per constraint), clean tables pass wholesale, and the
  * drift card flags a planted distribution shift with the
  * novel-bucket convention.
  */
class QualitySpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()

  test("dq_check: planted violations count exactly, clean corpus passes everything") {
    import spark.implicits._
    // clean baseline at sf0.001
    val clean = operators.Quality.dqCheck(spark, "/root/testdata/sf0.001").collect()
    assert(clean.length == 8)
    clean.foreach(r => assert(r.getLong(3) == 1L,
      s"clean data failed ${r.getString(0)}: ${r.getLong(2)} violations"))

    // dirty fixture: 2 duplicate custkeys, 1 null name, 1 orphan
    // order, 1 bad quantity, 1 bad discount, 2 bad returnflags,
    // 1 orphan lineitem
    val customer = Seq((1L, "alice"), (2L, "bob"), (2L, "bob2"), (3L, null))
      .toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 99L)) // 99: orphan
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (10L, 5.0, 0.05, "A"), (10L, 99.0, 0.05, "N"), // bad quantity
      (11L, 5.0, 0.50, "R"),                         // bad discount
      (11L, 5.0, 0.05, "X"), (11L, 5.0, 0.05, "Y"),  // bad flags
      (77L, 5.0, 0.05, "A"))                         // orphan line
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_returnflag")
    val dirty = operators.Quality.dqCheckOn(customer, orders, lineitem)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(dirty("unique_c_custkey") == ((4L, 1L, 0L)))
    assert(dirty("complete_c_name") == ((4L, 1L, 0L)))
    assert(dirty("ref_o_custkey_in_customer") == ((3L, 1L, 0L)))
    assert(dirty("range_l_quantity_1_50") == ((6L, 1L, 0L)))
    assert(dirty("range_l_discount_0_01") == ((6L, 1L, 0L)))
    assert(dirty("accepted_l_returnflag") == ((6L, 2L, 0L)))
    assert(dirty("ref_l_orderkey_in_orders") == ((6L, 1L, 0L)))
    assert(dirty("unique_o_orderkey") == ((3L, 0L, 1L)))
  }

  test("drift_check: planted shift flagged, stable buckets quiet, novel bucket reads expected 0") {
    import spark.implicits._
    // early half: all english; late half: french appears (novel) and
    // english drops — a real distribution shift
    val docs = ((0 until 100).map { i =>
      val lang = if (i % 2 == 0) "en" else if (i < 50) "en" else "fr"
      (i.toLong, Seq.fill(60)("w").mkString(" "), lang)
    }).toDF("doc_id", "text", "lang")
    val rows = operators.Quality.driftCheckOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // novel bucket: fr only exists late → expected 0, chi2 blows up
    val fr = rows(("lang", "fr"))
    assert(fr._1 == 0L && fr._2 == 25L && fr._3 == 0L)
    assert(fr._4 == 25L * 25L * 1000000L, s"novel-bucket chi2 wrong: $fr")
    // en drifted down: expected 50, observed 25
    val en = rows(("lang", "en"))
    assert(en == ((50L, 25L, 50L, 25L * 25L * 1000000L / 50L)))
    // length is IDENTICAL across halves → zero contribution
    val len = rows(("len", "b1"))
    assert(len._2 == len._3 && len._4 == 0L, s"stable bucket not quiet: $len")
  }

  test("quality_calib: card is consistent with the two registered quality operators") {
    val sf = "/root/testdata/sf0.001"
    val card = operators.Text.qualityCalib(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val scores = operators.Text.qualityScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val keeps = operators.Text.gopherQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep")).toMap
    // partition law: every doc lands in exactly one decile row
    assert(card.map(_._2).sum == scores.size)
    assert(card.map(_._3).sum == keeps.values.sum)
    // per-decile recompute from the registered operators' own outputs
    val expected = scores.toSeq.map { case (id, s) =>
      (math.min(math.floor(s * 10).toLong, 9L), keeps(id))
    }.groupBy(_._1).map { case (d, g) =>
      (d, g.size.toLong, g.map(_._2).sum, g.map(_._2).sum * 1000000L / g.size)
    }.toSeq.sortBy(_._1)
    assert(card.toSeq == expected, "card diverges from the per-doc recompute")
    card.foreach { case (d, n, k, ppm) =>
      assert(d >= 0 && d <= 9 && k <= n && ppm <= 1000000L)
    }
  }

  test("quality_ensemble: card equals an in-JVM pairwise recompute from the registered gates") {
    val sf = "/root/testdata/sf0.001"
    import operators.Quality.EnsembleScoreFloor
    // the five gate vectors, straight from the registered operators
    val gates: Map[String, Map[Long, Long]] = Map(
      "gopher" -> operators.Text.gopherQuality(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep")).toMap,
      "score" -> operators.Text.qualityScore(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (if (r.getAs[Double]("score") >= EnsembleScoreFloor) 1L else 0L)).toMap,
      "url" -> operators.Text.urlFilter(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (if (r.getAs[String]("verdict") == "pass") 1L else 0L)).toMap,
      "lang" -> operators.Text.langId(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (if (r.getAs[String]("pred_lang") == r.getAs[String]("labeled_lang")) 1L
           else 0L)).toMap,
      "ccnet" -> operators.LangModel.ccnetBuckets(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (if (r.getAs[String]("bucket") == "head") 1L else 0L)).toMap)
    val names = gates.keys.toSeq.sorted
    val expected = (for {
      i <- names.indices; j <- i + 1 until names.size
    } yield {
      val (a, b) = (names(i), names(j))
      val (ga, gb) = (gates(a), gates(b))
      val ids = ga.keySet
      assert(ids == gb.keySet, s"gate coverage differs: $a vs $b")
      val n = ids.size.toLong
      val bk = ids.count(id => ga(id) == 1 && gb(id) == 1).toLong
      val bd = ids.count(id => ga(id) == 0 && gb(id) == 0).toLong
      val ka = ga.values.sum; val kb = gb.values.sum
      val peN = BigInt(ka) * kb + BigInt(n - ka) * (n - kb)
      val den = BigInt(n) * n - peN
      val kappa = if (den == 0) 0L
        else ((BigInt(bk + bd) * n - peN) * 1000000 / den).toLong
      (a, b, n, bk, bd, n - bk - bd, (bk + bd) * 1000000L / n, kappa)
    }).sortBy(t => (t._1, t._2))
    val got = operators.Quality.qualityEnsemble(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected, s"got\n${got.mkString("\n")}\nwant\n${expected.mkString("\n")}")
    // a gate paired with itself would be kappa 10⁶; pairs must not be
    assert(got.forall(r => r._1 < r._2) && got.size == 10)
  }

  test("quality_ensemble: fused scan preserves melt semantics when ccnet covers a strict subset") {
    import spark.implicits._
    import operators.Quality.EnsembleScoreFloor
    // every third doc is a single word → no bigram → absent from
    // ccnet's frame (the lmScore ≥2-word contract): the 4 pair rows
    // involving ccnet must count only covered docs — the exact
    // semantics the old doc_id self-join had, now carried by the
    // in_ccnet presence flag inside the fused aggregation
    val docs = (0 until 36).map { i =>
      val text =
        if (i % 3 == 0) "solo"
        else (Seq.fill(i % 7 + 2)(Seq("the", "fox", "runs", "far")(i % 4))
          ++ Seq("and", "it", "is", "a", "good", "day", "to", "run")).mkString(" ")
      (i.toLong, text, if (i % 2 == 0) "en" else "de", s"src${i % 4}",
        text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    // reference: gate vectors straight from the registered single
    // definitions, paired with INTERSECTION coverage (= the old
    // melt's inner self-join on doc_id)
    val gates: Map[String, Map[Long, Long]] = Map(
      "gopher" -> operators.Text.gopherQualityOn(docs).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep")).toMap,
      "score" -> operators.Text.qualityScoreOn(docs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (if (r.getAs[Double]("score") >= EnsembleScoreFloor) 1L else 0L)).toMap,
      "url" -> operators.Text.urlFilterOn(docs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (if (r.getAs[String]("verdict") == "pass") 1L else 0L)).toMap,
      "lang" -> operators.Text.langIdOn(docs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (if (r.getAs[String]("pred_lang") == r.getAs[String]("labeled_lang")) 1L
           else 0L)).toMap,
      "ccnet" -> operators.LangModel.ccnetBucketsOn(docs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (if (r.getAs[String]("bucket") == "head") 1L else 0L)).toMap)
    assert(gates("ccnet").size < gates("gopher").size,
      "fixture must exercise the subset-coverage branch")
    val names = gates.keys.toSeq.sorted
    val expected = (for {
      i <- names.indices; j <- i + 1 until names.size
    } yield {
      val (a, b) = (names(i), names(j))
      val (ga, gb) = (gates(a), gates(b))
      val ids = ga.keySet intersect gb.keySet
      val n = ids.size.toLong
      val bk = ids.count(id => ga(id) == 1 && gb(id) == 1).toLong
      val bd = ids.count(id => ga(id) == 0 && gb(id) == 0).toLong
      val ka = ids.toSeq.map(ga).sum; val kb = ids.toSeq.map(gb).sum
      val peN = BigInt(ka) * kb + BigInt(n - ka) * (n - kb)
      val den = BigInt(n) * n - peN
      val kappa = if (den == 0) 0L
        else ((BigInt(bk + bd) * n - peN) * 1000000 / den).toLong
      (a, b, n, bk, bd, n - bk - bd, (bk + bd) * 1000000L / n, kappa)
    }).sortBy(t => (t._1, t._2))
    val got = operators.Quality.qualityEnsembleOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected, s"got\n${got.mkString("\n")}\nwant\n${expected.mkString("\n")}")
    // empty corpus: every pair vanishes, exactly like the old groupBy
    val empty = operators.Quality.qualityEnsembleOn(docs.filter(col("doc_id") < 0))
    assert(empty.collect().isEmpty)
  }

  test("dedup_keepbest: one best per cluster, argmax law, labels agree with dedup_clusters") {
    val sf = "/root/testdata/sf0.001"
    val rows = operators.Quality.dedupKeepbest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val clusters = operators.Dedup.clusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == clusters.size)
    rows.foreach { case (id, cl, _, _, _) =>
      assert(clusters(id) == cl, s"doc $id label drifted from dedup_clusters") }
    rows.groupBy(_._2).foreach { case (cl, g) =>
      val bests = g.filter(_._5 == 1L)
      assert(bests.length == 1, s"cluster $cl has ${bests.length} best rows")
      // argmax under (gq DESC, score DESC, id ASC)
      val want = g.minBy { case (id, _, gq, s, _) => (-gq, -s, id) }
      assert(bests.head._1 == want._1,
        s"cluster $cl keeper ${bests.head._1} != argmax ${want._1}")
    }
    // the policy must actually differ from min-id somewhere on this
    // corpus (otherwise the operator adds nothing over dedup_clusters)
    val minIdKeepers = rows.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    val bestKeepers = rows.filter(_._5 == 1L).map(_._1).toSet
    assert(bestKeepers != minIdKeepers,
      "fixture has no cluster where quality overrides min-id — weaken the corpus check")
  }
}
