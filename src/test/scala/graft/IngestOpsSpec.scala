package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the wave-5 ingest operators: URL canonicalization
  * actually canonicalizes (tracking params, case, ports, fragments
  * gone; collisions grouped), and the multimodal resize/frame-sample
  * arithmetic equals an independent in-memory reference on the same
  * hash-derived fixtures.
  */
class IngestOpsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  test("url_normalize strips tracking/case/port/fragment and groups collisions") {
    val rows = operators.Text.urlNormalize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val norm = r.getAs[String]("url_norm")
      assert(!norm.contains("utm_") && !norm.contains("fbclid"), norm)
      assert(!norm.contains("#"), norm)
      assert(!norm.contains(":80") && !norm.contains(":443"), norm)
      assert(!norm.contains("www."), norm)
      assert(norm == norm.toLowerCase(java.util.Locale.ROOT)
        || norm.count(_ == '?') == 1, norm) // path/host lowered; query preserved
      assert(norm.startsWith("http://") || norm.startsWith("https://"), norm)
      assert(!norm.dropWhile(_ != '/').startsWith("/?") || !norm.endsWith("/"), norm)
    }
    // residue fixture guarantees collisions: some group has n_dups > 1
    assert(rows.exists(_.getAs[Long]("n_dups") > 1L))
    // the keeper is the group minimum and exactly one per group
    val byNorm = rows.groupBy(_.getAs[String]("url_norm"))
    byNorm.foreach { case (_, g) =>
      val ids = g.map(_.getAs[Long]("doc_id"))
      val keepers = g.filter(_.getAs[Long]("is_canonical") == 1L)
      assert(keepers.map(_.getAs[Long]("doc_id")).toSeq == Seq(ids.min))
      assert(g.forall(_.getAs[Long]("keep_id") == ids.min))
    }
  }

  /** Plain-Scala mirror of the stub pixel + integer box filter. */
  private def refResize(fp60: Long): (Long, Long, Long, Long, Long) = {
    val srcW = fp60 % Multimodal.ResizeSrcWMod + Multimodal.ResizeSrcMin
    val srcH = (fp60 / Multimodal.ResizeSrcWMod) % Multimodal.ResizeSrcHMod +
      Multimodal.ResizeSrcMin
    val out = Multimodal.ResizeOutDim
    def cell(i: Long, j: Long): Long = {
      val (x0, x1) = (i * srcW / out, (i + 1) * srcW / out)
      val (y0, y1) = (j * srcH / out, (j + 1) * srcH / out)
      val s = (for (x <- x0 until x1; y <- y0 until y1)
        yield ((fp60 + 31 * x + 17 * y) % 256)).sum
      s / ((x1 - x0) * (y1 - y0))
    }
    val cs = (for (i <- 0L until out; j <- 0L until out)
      yield (out * i + j + 1) * cell(i, j)).sum
    (srcW, srcH, cell(0, 0), cell(out - 1, out - 1), cs)
  }

  test("mm_resize equals the in-memory box-filter reference") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.{hash60, normalize}
    val fp = Tables(spark, sf).documents
      .select(col("doc_id"), hash60(normalize(col("text"))).as("fp60"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Multimodal.mmResize(spark, sf).collect()
    assert(got.length == fp.size)
    got.foreach { r =>
      val (w, h, r00, r77, cs) = refResize(fp(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("src_w") == w && r.getAs[Long]("src_h") == h)
      assert(r.getAs[Long]("r00") == r00 && r.getAs[Long]("r77") == r77)
      assert(r.getAs[Long]("checksum") == cs)
      assert(r00 >= 0 && r00 < 256 && r77 >= 0 && r77 < 256)
    }
  }

  test("mm_resize kernel is row-for-row identical to the SQL higher-order form it replaced") {
    val a = Multimodal.mmResize(spark, sf).collect().map(_.toSeq)
    val b = Multimodal.mmResizeSql(spark, sf).collect().map(_.toSeq)
    assert(a.length == b.length && a.indices.forall(i => a(i) == b(i)))
  }

  test("mm_phash kernel is row-for-row identical to the SQL higher-order form it replaced") {
    val docs = Tables(spark, sf).documents
    val a = Multimodal.phashSigs(docs).orderBy("doc_id").collect().map(_.toSeq)
    val b = Multimodal.phashSigsSql(docs).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.nonEmpty && a.length == b.length && a.indices.forall(i => a(i) == b(i)))
  }

  test("mm_frames respects the sample budget and the timeline") {
    val rows = Multimodal.mmFrames(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, g) =>
      assert(g.length <= Multimodal.FrameTargetSamples)
      val total = g.head.getAs[Long]("n_frames_total")
      val stride = g.head.getAs[Long]("stride")
      val idxs = g.map(_.getAs[Long]("frame_idx")).sorted.toSeq
      assert(idxs == (0L until total by stride).toSeq)
      assert(g.forall(_.getAs[Long]("frame_ts_ms") >= 0))
    }
  }

  test("mm_scenes: cuts fire exactly at scene-bucket crossings, numbering is a running count") {
    val rows = Multimodal.mmScenes(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    var sawCut = false
    byDoc.foreach { case (id, g) =>
      val ordered = g.sortBy(_.getAs[Long]("frame_idx"))
      assert(ordered.head.getAs[Long]("is_cut") == 0L,
        s"doc $id: first sampled frame cannot be a cut")
      var scenes = 0L
      var prevBucket = ordered.head.getAs[Long]("frame_ts_ms") / Multimodal.SceneMs
      var prevSig = ordered.head.getAs[Long]("frame_sig")
      for (r <- ordered.tail) {
        val bucket = r.getAs[Long]("frame_ts_ms") / Multimodal.SceneMs
        val cut = r.getAs[Long]("is_cut")
        // the stub signature is a pure function of the scene bucket,
        // so a cut fires iff the bucket changed
        assert(cut == (if (bucket != prevBucket) 1L else 0L),
          s"doc $id frame ${r.getAs[Long]("frame_idx")}: cut $cut at bucket " +
            s"$prevBucket -> $bucket")
        if (cut == 1L) { scenes += 1; sawCut = true }
        assert(r.getAs[Long]("scene_no") == scenes,
          s"doc $id: scene numbering is not the running cut count")
        assert(cut == 0L || r.getAs[Long]("frame_sig") != prevSig)
        prevBucket = bucket
        prevSig = r.getAs[Long]("frame_sig")
      }
      // scene count bounded by the timeline
      val maxTs = ordered.last.getAs[Long]("frame_ts_ms")
      assert(scenes <= maxTs / Multimodal.SceneMs + 1)
    }
    assert(sawCut, "fixture sanity: some video must span multiple scenes")
  }

  /** Plain-Scala mirror of the stub PCM + energy-delta fingerprint. */
  private def refAudioFp(fp60: Long): (Long, Long, Long, Long) = {
    val nSamples = fp60 % Multimodal.AudioSamplesMod + Multimodal.AudioMinSamples
    val nFrames = nSamples / Multimodal.AudioFrame
    def sample(t: Long): Long = (fp60 + 37 * t + (t * t) % 97) % 65536 - 32768
    val en = (0L until nFrames).map { f =>
      (f * Multimodal.AudioFrame until (f + 1) * Multimodal.AudioFrame)
        .map(t => math.abs(sample(t))).sum
    }
    val afp = (0L until nFrames - 1)
      .map(f => if (en(f.toInt + 1) > en(f.toInt)) 1L << f else 0L).sum
    val cs = en.zipWithIndex.map { case (e, f) => (f + 1) * e }.sum
    (nSamples, nFrames, afp, cs)
  }

  test("mm_audio_fp equals the in-memory PCM reference; fingerprints discriminate") {
    import graft.functions.TextFunctions.{hash60, normalize}
    import org.apache.spark.sql.functions.col
    val fp60s = Tables(spark, sf).documents
      .select(col("doc_id"), hash60(normalize(col("text"))).as("fp60"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Multimodal.mmAudioFp(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ns, nf, afp, cs) = refAudioFp(fp60s(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_samples") == ns)
      assert(r.getAs[Long]("n_frames") == nf)
      assert(r.getAs[Long]("afp") == afp)
      assert(r.getAs[Long]("energy_checksum") == cs)
      // fingerprint fits the frame-boundary bit budget
      assert(afp >= 0 && afp < (1L << (nf - 1)))
    }
    // distinct contents should rarely collide on the fingerprint
    val distinctContents = fp60s.values.toSet.size
    val distinctPrints = rows.map(r =>
      (r.getAs[Long]("n_frames"), r.getAs[Long]("afp"))).toSet.size
    assert(distinctPrints * 10 >= distinctContents * 5,
      s"$distinctPrints prints for $distinctContents contents")
  }

  test("mm_audio_fp kernel is row-for-row identical to the SQL higher-order form it replaced") {
    val a = Multimodal.mmAudioFp(spark, sf).collect().map(_.toSeq)
    val b = Multimodal.mmAudioFpSql(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("mm_audio_match recovers every clip's source track at the cut offset with full votes") {
    import org.apache.spark.sql.functions.col
    val rows = Multimodal.mmAudioMatch(spark, sf).collect()
    assert(rows.nonEmpty, "no clips matched")
    // every eligible track spawned a clip
    val nClips = Tables(spark, sf).documents
      .filter(col("doc_id") % Multimodal.AudioMatchClipMod === 0).count()
    assert(rows.length == nClips, s"${rows.length} matches for $nClips clips")
    // duplicate documents share identical stub audio, so a clip may
    // legitimately resolve to another COPY of its source (tie-break:
    // min track id) — recovery is content-level, not id-level
    import graft.functions.TextFunctions.{hash60, normalize}
    val fp = Tables(spark, sf).documents
      .select(col("doc_id"), hash60(normalize(col("text"))).as("fp60"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (clip, track, votes, rec) = (r.getLong(0), r.getLong(1),
        r.getLong(3), r.getLong(4))
      assert(fp(track) == fp(clip),
        s"clip $clip matched content-different track $track")
      assert((rec == 1L) == (track == clip), s"recovered flag wrong for clip $clip")
      // 6 frames → 5 landmark pairs, all voting for the true offset
      assert(votes == Multimodal.AudioMatchClipLen - 1,
        s"clip $clip: $votes votes (expected all anchors aligned)")
    }
  }

  test("mm_video_dedup: every re-edit pairs with its source; no cross-content pairs") {
    import graft.multimodal.Multimodal
    val rows = Multimodal.mmVideoDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // fixture truth: doc d ≡ VideoEditRes (mod VideoEditMod) with an
    // existing predecessor is a re-encode of d − 1 — the pair MUST be
    // found (second 0 is in every sampling schedule, so ≥ 1 match)
    val ids = Tables(spark, sf).documents.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expected = ids.filter(d =>
      d % Multimodal.VideoEditMod == Multimodal.VideoEditRes && ids(d - 1))
      .map(d => (d - 1, d))
    val got = rows.map(r => (r._1, r._2)).toSet
    expected.foreach(p => assert(got(p), s"re-edit pair $p not detected"))
    // on the all-distinct-text corpus there are NO other pairs (the
    // signature embeds the content hash — false positives impossible)
    assert(got == expected, s"unexpected pairs: ${(got -- expected).take(3)}")
    rows.foreach { case (v1, v2, m, rec) =>
      assert(m >= 1 && m <= Multimodal.FrameTargetSamples,
        s"match count $m outside [1, 32] for ($v1, $v2)")
      assert(rec == (if (v2 == v1 + 1) 1L else 0L))
    }
  }

  test("mm_video_dedup: rep collapse ≡ direct all-docs matching on a dup-planted corpus") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val d = Tables(spark, sf).documents.select(col("doc_id"), col("text"))
    // plant 6 copies of one text at fresh ids spanning every fixture
    // role (10002 ≡ 2 mod 5 → a re-edit whose predecessor 10001 is
    // ALSO a copy — the collapse must keep all of this exact)
    val src = d.filter(col("doc_id") === 3).select(col("text")).head().getString(0)
    val planted = (10000L to 10005L).map(i => (i, src)).toDF("doc_id", "text")
    val docs = d.unionByName(planted)
    val collapse = Multimodal.mmVideoDedupOn(docs).collect().map(_.toSeq).toSeq
    // direct twin: per-DOC signatures, plain self-join (the shape the
    // collapse replaces — quadratic in duplicate mass)
    val sigs = Multimodal.videoSigsOf(Multimodal.videoContentOf(docs))
    val direct = sigs.as("a").join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("v1"), col("b.doc_id").as("v2"))
      .agg(count(lit(1)).as("n_match"))
      .withColumn("recovered", (col("v2") === col("v1") + 1).cast("long"))
      .orderBy(col("v1"), col("v2")).collect().map(_.toSeq).toSeq
    assert(collapse.nonEmpty)
    assert(collapse == direct, "collapse path diverged from the direct twin")
  }

  test("bitext_mine: bounded query card, sides disjoint, margin lattice laws") {
    import graft.operators.SimilaritySearch
    val rows = SimilaritySearch.bitextMine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty, "mining produced no pairs")
    // one best match per query, queries are the bounded even-id batch,
    // matches come from the odd-id pool
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (q, y, c, m, mu) =>
      assert(q % 50 == 0 && q < 1600, s"qid $q outside the query batch")
      assert(y % 2 == 1, s"match $y not from the odd-id pool")
      assert(c >= -1000000L && c <= 1000000L, s"cosine ppm $c off lattice")
      // the winning margin of a top-1 candidate is at least its own
      // contribution to the forward mean: margin > 0 on this corpus
      assert(m > 0, s"non-positive margin $m for query $q")
      assert(mu == 0L || mu == 1L)
    }
  }

  test("url_filter: verdict and penalty equal the serial URL-shape twin") {
    import java.security.MessageDigest
    def hash60(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val srcOf = Tables(spark, sf).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = operators.Text.urlFilter(spark, sf).collect()
    assert(rows.length == srcOf.size)
    var seen = Set.empty[String]
    rows.foreach { r =>
      val (id, host) = (r.getAs[Long]("doc_id"), r.getAs[String]("host"))
      val url = {
        val head = if (id % 4 == 0) s"HTTP://Www.${srcOf(id)}.EXAMPLE.com:80"
        else s"HTTPS://WWW.${srcOf(id)}.Example.COM:443"
        head + s"/News/Item-${id % 13}" + (if (id % 3 == 0) "/" else "") +
          s"?id=${id % 13}" + (if (id % 5 != 0) "&utm_source=rss&fbclid=x1Y2" else "") +
          (if (id % 2 == 0) "#top" else "")
      }
      assert(host == s"${srcOf(id)}.example.com".toLowerCase(java.util.Locale.ROOT))
      val penalty = (if (url.contains("utm_") || url.contains("fbclid")) 2 else 0) +
        (if (url.contains("#")) 1 else 0) +
        (if (url.contains("/?")) 1 else 0) +
        (if ((id % 13) >= 10) 1 else 0)
      assert(r.getAs[Long]("penalty") == penalty, s"doc $id penalty")
      val expected = if (hash60("blk:" + host) % 5 == 0) "blocked"
      else if (penalty >= 3) "flagged" else "pass"
      assert(r.getAs[String]("verdict") == expected, s"doc $id verdict")
      seen += r.getAs[String]("verdict")
    }
    // the fixture reaches all three outcomes at this sf
    assert(seen == Set("blocked", "flagged", "pass"), s"outcomes seen: $seen")
  }

  test("tok_fertility: per-source totals and ppm ratios equal the per-doc recompute") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, sf).documents
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = operators.Text.tokFertility(spark, sf).collect()
    val bySource = docs.groupBy(_._1)
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val g = bySource(r.getAs[String]("source"))
      val words = g.map(_._2.trim.split("\\s+").length.toLong).sum
      val toks = g.map(d =>
        "[a-z]+|[0-9]+|[^a-z0-9 ]".r.findAllIn(d._2).length.toLong).sum
      val chars = g.map(_._2.length.toLong).sum
      val types = g.flatMap(_._2.toLowerCase(java.util.Locale.ROOT)
        .trim.replaceAll("\\s+", " ").split(" ")).filter(_.nonEmpty).distinct.length.toLong
      assert(r.getAs[Long]("n_docs") == g.length.toLong)
      assert(r.getAs[Long]("words") == words)
      assert(r.getAs[Long]("toks") == toks)
      assert(r.getAs[Long]("chars") == chars)
      assert(r.getAs[Long]("fertility_ppm") == toks * 1000000L / words)
      assert(r.getAs[Long]("chars_per_tok_ppm") == chars * 1000000L / toks)
      assert(r.getAs[Long]("ttr_ppm") == types * 1000000L / words)
    }
  }

  /** Independent raw-deflate length at the kernel's settings. */
  private def refDeflate(text: String): Long = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(text.getBytes("UTF-8")); d.finish()
    val b = new Array[Byte](1 << 16)
    var n = 0L
    while (!d.finished()) n += d.deflate(b)
    d.end(); n
  }

  test("comp_ratio: every row equals the independent zip recompute; laws hold") {
    import org.apache.spark.sql.functions.col
    val texts = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = operators.Text.compRatio(spark, sf).collect()
    assert(rows.length == texts.count(_._2.getBytes("UTF-8").nonEmpty))
    rows.foreach { r =>
      val (id, raw, comp, ppm, rep) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw == texts(id).getBytes("UTF-8").length.toLong)
      assert(comp == refDeflate(texts(id)), s"doc $id deflate length")
      assert(ppm == comp * 1000000L / raw)
      assert(rep == (if (ppm < operators.Text.CompRepetitiveppm) 1L else 0L))
    }
  }

  test("comp_ratio: planted repetition collapses, high-entropy text does not") {
    import spark.implicits._
    val repeat = Array.fill(200)("the same line again").mkString("\n")
    val entropy = (1 to 400).map(i =>
      java.util.UUID.nameUUIDFromBytes(Array(i.toByte, (i >> 8).toByte))
        .toString).mkString(" ")
    val docs = Seq((1L, repeat), (2L, entropy)).toDF("doc_id", "text")
    val got = operators.Text.compRatioOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(1L)._2 == 1L, s"repetitive doc not flagged: ${got(1L)}")
    assert(got(2L)._2 == 0L, s"high-entropy doc misflagged: ${got(2L)}")
    assert(got(1L)._1 < got(2L)._1)
  }
}
