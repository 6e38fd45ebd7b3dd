package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property-based invariants of the hashing/similarity kernels,
  * evaluated through the real Spark expressions (one generated batch
  * per property — not per-case Spark jobs).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val textGen = Gen.nonEmptyListOf(wordGen).map(_.mkString(" "))

  test("hash60 is always in [0, 2^60)") {
    import spark.implicits._
    val texts = Gen.listOfN(200, textGen).sample.getOrElse(List("fallback"))
    val out = texts.toDF("s")
      .select(graft.functions.TextFunctions.hash60(col("s")).as("h"))
      .as[Long].collect()
    assert(out.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("normalize is idempotent") {
    import spark.implicits._
    import graft.functions.TextFunctions.normalize
    val texts = Gen.listOfN(100, Gen.listOfN(8,
      Gen.oneOf(wordGen, Gen.const("  "), Gen.const("\t"))).map(_.mkString(" ")))
      .sample.getOrElse(List("a  b"))
    val out = texts.toDF("s")
      .select(normalize(col("s")).as("n1"), normalize(normalize(col("s"))).as("n2"))
      .collect()
    assert(out.forall(r => r.getString(0) == r.getString(1)))
  }

  test("simhash is word-order invariant (frequency-weighted multiset)") {
    import spark.implicits._
    val docs = Gen.listOfN(30, Gen.nonEmptyListOf(wordGen)).sample.getOrElse(List(List("a")))
    val rows = docs.zipWithIndex.flatMap { case (ws, i) =>
      Seq((i.toLong * 2, ws.mkString(" ")), (i.toLong * 2 + 1, scala.util.Random.shuffle(ws).mkString(" ")))
    }
    val df = rows.toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.simhashSignatures(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.indices.foreach { i =>
      assert(sigs(i.toLong * 2) == sigs(i.toLong * 2 + 1),
        s"simhash differs for permuted doc $i")
    }
  }

  test("cosine kernel: self-similarity is 1, symmetric") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val vecs = Gen.listOfN(40, Gen.listOfN(16,
      Gen.chooseNum(-100, 100).map(_.toDouble / 10))).sample.getOrElse(List(List.fill(16)(1.0)))
      .filter(v => v.exists(_ != 0.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val self = df.select(cosineSim(col("v"), col("v")).as("c")).as[Double].collect()
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(cosineSim(col("a.v"), col("b.v")).as("ab"),
        cosineSim(col("b.v"), col("a.v")).as("ba")).collect()
    assert(pairs.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("minhash end-to-end detects near-identical synthetic docs with high jaccard") {
    import spark.implicits._
    val a = (1 to 80).map(i => s"word$i")
    val df = Seq(
      (0L, a.mkString(" ")),
      (1L, (a.init :+ "changed").mkString(" ")), // one word differs
      (2L, (1 to 80).map(i => s"other$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.minhashOn(df).collect()
    assert(out.length == 1, s"expected exactly the near-identical pair, got ${out.length}")
    assert(out.head.getLong(0) == 0L && out.head.getLong(1) == 1L)
    assert(out.head.getAs[Double]("jaccard") > 0.9)
  }

  test("misra-gries summary: frequent terms guaranteed, error bounded, over-capacity corpus") {
    import spark.implicits._
    // Zipfian synthetic: 400 distinct terms, term i appearing ~1500/i
    // times — far over the 64-counter budget, so evictions DO occur
    val words = (1 to 400).flatMap(i => Seq.fill(1500 / i)(s"term$i"))
    val n = words.length
    val cap = 64
    val summary = words.toDF("w").repartition(8)
      .agg(graft.functions.MisraGriesAgg.frequentTerms(col("w"), cap).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (cap + 1)
    assert(summary.size <= cap)
    summary.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overestimated: $est > ${exact(t)}")
      assert(exact(t) - est <= bound, s"$t error ${exact(t) - est} > $bound")
    }
    // every term with true frequency above the bound must survive
    exact.filter(_._2 > bound).keys.foreach(t =>
      assert(summary.contains(t), s"frequent term $t evicted"))
  }

  test("winnow expression equals the naive reference on random strings") {
    import spark.implicits._
    import graft.functions.{WinnowFingerprints, WinnowFunctions}
    val k = graft.operators.Text.WinnowK
    val w = graft.operators.Text.WinnowW
    // lengths straddle the admission boundary k+w-1 (incl. below it)
    val strGen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaLowerChar, Gen.const(' '))).map(_.mkString))
    val texts = Gen.listOfN(300, strGen).sample.getOrElse(List("fallback string here"))
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), WinnowFunctions.winnowFingerprints(col("t"), k, w).as("e"))
      .as[(Long, Seq[Long])].collect().toMap
    val M = WinnowFingerprints.M; val B = WinnowFingerprints.B
    texts.zipWithIndex.foreach { case (t, i) =>
      val naive = if (t.length - k + 1 < w) Seq.empty[Long] else {
        val h = (0 to t.length - k).map(p =>
          t.substring(p, p + k).foldLeft(0L)((a, c) => (a * B + c) % M))
        (0 to h.length - w).map { q =>
          val win = h.slice(q, q + w)
          q + win.lastIndexOf(win.min)
        }.distinct.map(s => ((s + 1).toLong << 32) | h(s))
      }
      assert(got(i.toLong) == naive, s"winnow diverges on ${t.take(40)}")
    }
  }

  test("quantile lattice: floor, error bound, monotone, fixed points on random longs") {
    import graft.functions.QuantileSketchAgg.{bucketOf, repOf}
    val valGen = Gen.oneOf(
      Gen.chooseNum(0L, 2048L),                       // exact + first blocks
      Gen.chooseNum(0L, Long.MaxValue),               // full range
      Gen.chooseNum(Long.MinValue, 0L),               // clamp domain
      Gen.choose(0, 62).map(1L << _),                 // exact powers
      Gen.choose(0, 62).map(e => (1L << e) - 1))      // power boundaries
    val vals = Gen.listOfN(2000, valGen).sample.getOrElse(List(0L, 1L, Long.MaxValue))
    vals.foreach { v =>
      val x = math.max(v, 0L)
      val idx = bucketOf(v)
      val rep = repOf(idx)
      assert(rep <= x && (x - rep) <= math.max(rep / 32, 0), s"error bound broken at $v")
      assert(bucketOf(rep) == idx, s"rep not a fixed point at $v")
      if (x > 0) assert(bucketOf(x - 1) <= idx, s"non-monotone at $v")
      if (x < Long.MaxValue) assert(bucketOf(x + 1) >= idx, s"non-monotone above $v")
    }
    // sorted-by-index == sorted-by-representative (order statistics
    // on the lattice are order statistics on values)
    val idxSorted = vals.map(v => bucketOf(v)).sorted.map(repOf)
    assert(idxSorted == idxSorted.sorted)
  }

  test("BPE merge pass: conserves content, merges are irreversible-prefix-safe") {
    import graft.functions.BpeFunctions.mergeOnce
    val symGen = Gen.oneOf("a", "b", "c", "ab", "bc")
    val seqGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, symGen).map(_.toArray))
    val cases = Gen.listOfN(500, seqGen).sample.getOrElse(List(Array("a", "b")))
    cases.foreach { syms =>
      val merged = mergeOnce(syms, "a", "b")
      // concatenation invariant: merging never loses or adds characters
      assert(merged.mkString == syms.mkString)
      // exhaustive: no adjacent (a, b) may survive a pass
      assert(!merged.zip(merged.drop(1)).exists(p => p._1 == "a" && p._2 == "b"),
        s"pass left an (a,b) in ${merged.mkString(",")} from ${syms.mkString(",")}")
      // left-to-right greedy: "aab" keeps the leftmost association
      if (syms.sameElements(Array("a", "a", "b")))
        assert(merged.sameElements(Array("a", "ab")))
    }
  }

  test("CMS property: estimates dominate exact counts on random corpora") {
    import spark.implicits._
    // 3 random corpora with skewed vocabularies (collisions likely)
    (1 to 3).foreach { seed =>
      val words = Gen.listOfN(30, wordGen).sample.getOrElse(List("w"))
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 60L).map { i =>
        val n = 5 + rnd.nextInt(40)
        // Zipf-ish: low indices much more likely
        (i, (0 until n).map(_ =>
          words(math.min(words.size - 1,
            (math.pow(rnd.nextDouble(), 2) * words.size).toInt))).mkString(" "))
      }.toDF("doc_id", "text")
      graft.operators.Text.cmsWordsOn(docs).collect().foreach { r =>
        assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_count"),
          s"seed $seed: CMS underestimated ${r.getAs[String]("term")}")
      }
    }
  }

  test("Bloom property: never a false negative on random eval/train splits") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val docs = (0L until 68L).map { i =>
        (i, (0 until 8).map(_ => s"w${rnd.nextInt(40)}").mkString(" "))
      }.toDF("doc_id", "text")
      graft.operators.Text
        .bloomDecontaminateOn(graft.operators.Text.shingleSetOf(docs))
        .collect().foreach { r =>
          assert(r.getAs[Long]("n_bloom_hits") >= r.getAs[Long]("n_overlap"),
            s"seed $seed: bloom missed an exact overlap (false negative)")
        }
    }
  }

  test("E-S weighted sampling property: deterministic, and tilted toward heavy weights") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, "en")).toDF("doc_id", "lang")
    // weight proportional to a deterministic per-doc value
    def w(scaleQ4: Long) =
      (pmod(col("doc_id") * 37, lit(101)) + lit(1)) * lit(scaleQ4)
    val a = graft.operators.Curation.sampleWeightedOn(docs, w(10000L))
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val b = graft.operators.Curation.sampleWeightedOn(docs, w(10000L))
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(a == b) // deterministic
    // the E-S KEY changes under scaling but the top-k ORDER need not
    // be identical in floating point; assert the heavy-tail property
    // instead: the top-weight decile is over-represented vs uniform
    val weights = (1L to 300L).map(i => i -> ((i * 37 % 101) + 1).toDouble).toMap
    val sampleMeanW = a.map(weights).sum / a.size
    val popMeanW = weights.values.sum / weights.size
    assert(sampleMeanW > popMeanW,
      s"weighted sample mean weight $sampleMeanW not above population $popMeanW")
  }

  test("KMV property: overlap estimate within 4/sqrt(k) across random overlap levels") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val common = 500 + rnd.nextInt(1000)
      val onlyEach = 500 + rnd.nextInt(1000)
      val rows =
        (1 to common).map(i => (s"c $i", "sA")) ++
          (1 to onlyEach).map(i => (s"a $i", "sA")) ++
          (1 to common).map(i => (s"c $i", "sB")) ++
          (1 to onlyEach).map(i => (s"b $i", "sB"))
      val docs = rows.zipWithIndex
        .map { case ((t, s), i) => (i.toLong, t, s) }.toDF("doc_id", "text", "source")
      val k = 512
      val r = graft.operators.Curation.sourceOverlapOn(docs, k).collect().head
      val est = r.getAs[Long]("jaccard_est_ppm").toDouble / 1e6
      val trueJ = common.toDouble / (common + 2.0 * onlyEach)
      assert(math.abs(est - trueJ) <= 4.0 / math.sqrt(k),
        s"trial $trial: est $est vs true $trueJ")
    }
  }

  test("waterfill: random cards always fill the budget max-min fairly") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 8) {
      // skewed Zipf-ish token card, 3..12 sources
      val n = 3 + rnd.nextInt(10)
      val card = (0 until n).map(i =>
        (f"s$i%02d", 1 + (math.pow(10, 1 + rnd.nextDouble() * 3)).toLong))
      val docs = card.zipWithIndex.map { case ((s, t), i) =>
        (i.toLong, Seq.fill(t.toInt)("w").mkString(" "), s)
      }.toDF("doc_id", "text", "source")
      val rows = operators.Curation.mixBudgetOn(docs).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      val total = card.map(_._2).sum
      val budget = total / operators.Curation.MixBudgetDen
      val alloc = rows.map(_._3).sum
      assert(alloc <= budget && budget - alloc < n,
        s"trial $trial: budget $budget filled to $alloc over $n sources")
      // max-min fairness: every capped source's alloc >= every
      // uncapped source's tokens... i.e. nobody capped below a
      // source that kept everything
      val capLevel = rows.filter(_._4 == 1L).map(_._3)
      val keptWhole = rows.filter(_._4 == 0L).map(_._2)
      assert(capLevel.distinct.length <= 1, s"trial $trial: $rows")
      if (capLevel.nonEmpty && keptWhole.nonEmpty)
        assert(keptWhole.max <= capLevel.head,
          s"trial $trial: an uncapped source exceeds the water level: $rows")
      rows.foreach { case (_, t, a, c) =>
        assert(a <= t && ((c == 1L) == (a < t)))
      }
    }
  }

  test("rep_scrub closure: rescanning scrubbed output finds nothing to scrub") {
    import spark.implicits._
    // random texts plus planted intra-doc repetition: doc text is
    // (prefix repeated r times) + tail — the scrub must remove every
    // repeated 20-word line and a SECOND scrub must be the identity
    val line = (1 to operators.Text.LineWords).map(i => s"w$i").mkString(" ")
    val docs = (0L until 40L).map { i =>
      val reps = (i % 5 + 1).toInt // 1..5 copies of the same line
      val tail = (1 to ((i % 7).toInt * 3)).map(j => s"t${i}x$j").mkString(" ")
      (i, (Seq.fill(reps)(line) :+ tail).mkString(" ").trim)
    }.toDF("doc_id", "text")
    val out = operators.Text.repScrubOn(docs)
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("new_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length == 40)
    out.foreach { case (_, nl, nk, _) => assert(nk <= nl) }
    // closure: scrub(scrub(x)) == scrub(x) — rescan the rebuilt text
    // (doc ids chosen NOT ≡ 0 mod RepScrubMod so the fixture
    // injection stays off and we test the pure operator)
    val rescan = operators.Text.repScrubOn(
        out.map { case (id, _, _, t) => (id * 4 + 1, t) }.toSeq.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    rescan.foreach { case (nl, nk) =>
      assert(nl == nk, s"second scrub still found repeats: $nl lines, $nk kept") }
    // the planted run really was scrubbed: a doc made of r copies of
    // one line keeps exactly one copy of it
    val planted = out.find(_._1 == 9L).get // 9 % 5 + 1 = 5 copies, no fixture
    assert(planted._2 - planted._3 >= 4L,
      s"5-copy planted line not collapsed: ${planted._2} -> ${planted._3}")
  }

  test("containment dominates jaccard on every pair (C(A->B) >= J(A,B))") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val vocab = (0 until 25).map(i => s"v$i")
    val docs = (0 until 20).map { i =>
      val k = 5 + rnd.nextInt(15)
      (i.toLong, (0 until k).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    def shingleSet(t: String): Set[String] = {
      val w = t.split(" "); if (w.length < 3) Set.empty[String]
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.collect().map(r => (r.getLong(0), shingleSet(r.getString(1))))
      .filter(_._2.nonEmpty).toMap
    val got = operators.Text.containmentOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    for ((a, sa) <- sets; (b, sb) <- sets if a != b && sa.intersect(sb).nonEmpty) {
      val inter = sa.intersect(sb).size
      val cPpm = inter.toLong * 1000000L / sa.size
      val jPpm = inter.toLong * 1000000L / (sa.size + sb.size - inter)
      assert(cPpm >= jPpm, s"($a,$b): containment $cPpm < jaccard $jPpm")
      // and the operator's best is at least this pair's containment
      assert(got(a) >= cPpm, s"doc $a: best ${got(a)} below pair containment $cPpm")
    }
  }

  test("retract-max sketch: random changelogs honor the exact/stale contract at any partitioning") {
    import spark.implicits._
    val opGen = for {
      v <- Gen.chooseNum(0L, 60L)
      s <- Gen.oneOf(1L, 1L, 1L, -1L) // insert-biased, deletes real
    } yield (v, s)
    val caseGen = for {
      ops <- Gen.listOfN(120, opGen)
      parts <- Gen.chooseNum(1, 8)
      cap <- Gen.oneOf(8, 16, 64) // 64 > the 61-value domain: exact regime
    } yield (ops, parts, cap)
    val cases = Gen.listOfN(12, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (ops, parts, cap) =>
      // naive reference: net counts; live max or none
      val net = ops.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
      val trueMax = net.filter(_._2 > 0).keys.reduceOption(_ max _)
      val r = ops.toDF("v", "s").repartition(parts)
        .agg(graft.functions.RetractMaxAgg
          .retractMax(col("v"), col("s"), cap).as("m"))
        .select(col("m.mx"), col("m.exact")).head()
      val mx = if (r.isNullAt(0)) None else Some(r.getLong(0))
      val exact = r.getBoolean(1)
      if (cap > 60) {
        // capacity above the value domain: always exact, any merge order
        assert(exact && mx == trueMax,
          s"exact regime wrong: cap=$cap parts=$parts got ($mx, $exact) want $trueMax")
      } else if (exact) {
        assert(mx == trueMax, s"claimed exact but wrong: $mx vs $trueMax")
      } else {
        // stale bound: reported watermark must dominate the true max
        assert(mx.isDefined && trueMax.forall(_ <= mx.get),
          s"stale bound $mx below true max $trueMax")
      }
    }
  }
}
