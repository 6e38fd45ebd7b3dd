package graft

import graft.operators.{Curation, Temporal, Text}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case behavior of the temporal-join and curation operators
  * (the oracle gate covers the bulk semantics; these pin the corners
  * the oracle data may not exercise).
  */
class CurationTemporalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("asOfJoin: inclusive match, carry-forward, and no-predecessor null") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 150L, 20.0), (2L, 60L, 30.0))
      .toDF("k", "rt", "v")
    val out = Temporal.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .orderBy(col("k"), col("t"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("right_v"))))
    // t=100 matches rt=100 (inclusive); t=200 matches rt=150 (carry
    // past an older row); t=50 has no predecessor → null
    assert(out.toSeq == Seq(("a", Some(10.0)), ("b", Some(20.0)), ("c", None)))
  }

  test("asOfJoin tie-break: greatest tie-break value wins among equal-time right rows") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 100L, 7L, 1.0), (1L, 100L, 9L, 2.0), (1L, 100L, 8L, 3.0))
      .toDF("k", "rt", "id", "v")
    val out = Temporal.asOfJoin(left, right, Seq("k"), "t", "rt",
      Seq("id", "v"), rightTieBreak = Seq("id")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("right_id") == 9L)
    assert(out.head.getAs[Double]("right_v") == 2.0)
  }

  test("asOfJoin: a null-time right row never matches (SQL ASOF semantics)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "early"), (1L, 300L, "late")).toDF("k", "t", "tag")
    val right = Seq((1L, Some(200L), 20.0), (1L, None, 99.0))
      .toDF("k", "rt", "v")
    val out = Temporal.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy(col("t"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("right_v"))))
    // nulls-first sort would otherwise hand the null-time row (v=99)
    // to t=100 as its "most recent predecessor"; ASOF says no match
    assert(out.toSeq == Seq(("early", None), ("late", Some(20.0))))
  }

  test("ts_seasonal: profile mean FLOORS on negative cent sums (cross-engine div law)") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      (1L, "a", Timestamp.valueOf("2024-01-01 09:00:00"), -0.03),
      (2L, "a", Timestamp.valueOf("2024-01-01 09:30:00"), -0.04),
      (3L, "b", Timestamp.valueOf("2024-01-01 10:00:00"), 5.00))
      .toDF("event_id", "event_type", "ts", "value")
    val out = Temporal.tsSeasonalOn(ev).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("seasonal_cents")).toMap
    // (a, 9h) cent sum = -7 over n = 2: the mean must be the FLOOR -4,
    // not the truncate-toward-zero -3 that both engines' bare integer
    // division computes (DuckDB integer `//` truncates: -7 // 2 = -3,
    // probed on the installed 1.0.0) — the pmod correction on BOTH
    // sides is what keeps the engines aligned once fuzz value jitter
    // drives a group's sum negative
    assert(out(1L) == -4L && out(2L) == -4L)
    assert(out(3L) == 500L)
  }

  test("q23 range join bin-and-refine plans no broadcast-nested-loop") {
    val plan = Temporal.q23(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "range join fell back to BNLJ")
    assert(!plan.contains("CartesianProduct"))
  }

  test("doc_chunk: exact boundaries, 20-word overlap, short docs get one chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 5).map(i => s"w$i").mkString(" ")),   // < size → 1 chunk
      (2L, (1 to 250).map(i => s"t$i").mkString(" "))) // 4 chunks: 100,100,90,10
      .toDF("doc_id", "text")
    val out = Curation.docChunkOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("n_chunk_words"), r.getAs[String]("chunk_text")))
    assert(out.count(_._1 == 1L) == 1)
    assert(out.find(_._1 == 1L).get._3 == 5)
    val d2 = out.filter(_._1 == 2L).sortBy(_._2)
    assert(d2.map(_._3).toSeq == Seq(100L, 100L, 90L, 10L))
    // overlap: chunk 1 starts at word 81 — its first 20 words are
    // chunk 0's last 20
    assert(d2(1)._4.startsWith("t81 t82"))
    assert(d2(0)._4.endsWith("t100"))
    assert(d2(3)._4 == (241 to 250).map(i => s"t$i").mkString(" "))
    // every word appears in at least one chunk
    val covered = d2.flatMap(_._4.split(" ")).toSet
    assert((1 to 250).forall(i => covered(s"t$i")))
  }

  test("seq_pack: empty input (everything filtered upstream) yields empty output, not a crash") {
    import spark.implicits._
    val out = Curation.seqPackOn(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(out.columns.toSeq ==
      Seq("pack_id", "n_chunks", "n_words", "first_chunk"))
    assert(out.count() == 0L)
  }

  test("seq_pack: two-level prefix sum matches the serial packing, no single-partition exchange") {
    val out = Curation.seqPack(spark, sf)
    // the distributed plan must not serialize: no global-window
    // single-partition exchange anywhere in the physical plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), "seq_pack plan has a single-partition exchange")
    // bit-identical to the serial reference: global running sum
    // computed on the driver over the collected chunks
    val chunks = Curation.docChunk(spark, sf)
      .select(col("doc_id"), col("chunk_id"), col("n_chunk_words"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    var cum = 0L
    val expected = chunks.map { case (d, c, n) =>
      cum += n
      val pack = math.ceil(cum.toDouble / Curation.PackBudget).toLong - 1
      (pack, d, c, n)
    }.groupBy(_._1).map { case (p, rows) =>
      (p, rows.length.toLong, rows.map(_._4).sum,
        rows.map(r => s"${r._2}#${r._3}").min)
    }.toSeq.sortBy(_._1)
    val got = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expected)
    // packs actually fill toward the budget (not one chunk per pack);
    // a boundary-straddling chunk may overhang by < ChunkWords
    assert(got.map(_._3).max <= Curation.PackBudget + Curation.ChunkWords - 1)
    assert(got.count(_._3 > Curation.PackBudget / 2) > got.length / 2)
  }

  test("autoShards law: floors at the historical constants, scales ∝ n/target, caps") {
    import Curation.{autoShards, ShuffleShards, ShuffleShardDocs, ShuffleMaxShards,
      PackShards, PackShardDocs, PackMaxShards}
    // the r10 watch item closed: the parallelism knobs derive from a
    // row count; every registered SF sits below the floor, so shard
    // counts (and corpus_shuffle's output, where the count is
    // visible) are identical to the former constants
    assert(autoShards(500, ShuffleShards, ShuffleShardDocs, ShuffleMaxShards) == 64)
    assert(autoShards(5000, ShuffleShards, ShuffleShardDocs, ShuffleMaxShards) == 64)
    assert(autoShards(100000, ShuffleShards, ShuffleShardDocs, ShuffleMaxShards) == 98)
    assert(autoShards(100000000L, ShuffleShards, ShuffleShardDocs,
      ShuffleMaxShards) == 97657)
    assert(autoShards(1L << 40, ShuffleShards, ShuffleShardDocs,
      ShuffleMaxShards) == ShuffleMaxShards)
    assert(autoShards(5000, PackShards, PackShardDocs, PackMaxShards) == 32)
    assert(autoShards(1L << 30, PackShards, PackShardDocs, PackMaxShards)
      == PackMaxShards)
    // seq_pack output is shard-count-INVARIANT (the two-level sum is
    // exact): a corpus big enough to engage the law still packs
    // identically to the serial reference — asserted by running the
    // law-engaged span arithmetic against the serial packing above;
    // here pin that the law point used there is engaged
    assert(autoShards(60000, PackShards, PackShardDocs, PackMaxShards) == 59)
  }

  test("doc_chunk: empty word list yields no chunks (no fabricated ids)") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val out = Curation.docChunkOn(docs).collect()
    assert(out.forall(_.getLong(1) >= 0), "negative chunk_id fabricated")
    assert(!out.exists(_.getLong(0) == 2L) || out.filter(_.getLong(0) == 2L).forall(_.getLong(1) == 0L))
  }

  test("pii_scrub removes every injected email/phone and counts them") {
    val out = Curation.piiScrub(spark, sf)
    val injected = out.filter(col("doc_id") % 7 === 0)
    assert(injected.count() > 0)
    assert(injected.filter(col("n_emails") < 1 || col("n_phones") < 1).count() == 0)
    assert(out.filter(col("scrubbed").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
      .count() == 0, "emails survived the scrub")
    assert(out.filter(col("scrubbed").rlike("\\d{3}-\\d{3}-\\d{4}")).count() == 0,
      "phones survived the scrub")
    assert(injected.filter(!col("scrubbed").contains("[EMAIL]")).count() == 0)
  }

  test("tfidf: ranks are dense 1..k per doc and rarer terms outrank at equal tf") {
    val out = Curation.tfidf(spark, sf)
    val byDoc = out.groupBy(col("doc_id"))
      .agg(collect_list(col("rk")).as("rks"), count(lit(1)).as("n"))
    assert(byDoc.filter(col("n") > 5).count() == 0)
    val nonDense = byDoc.filter(array_sort(col("rks")) =!=
      sequence(lit(1L), col("n"))).count()
    assert(nonDense == 0, "ranks not dense 1..n")
    // within a doc, scores are non-increasing by rank
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("rk"))
    assert(out.withColumn("prev", lag(col("score_ppm"), 1).over(w))
      .filter(col("prev").isNotNull && col("score_ppm") > col("prev")).count() == 0)
  }

  test("sample_stratified rebalances: en keep-rate ≈ 15%, others ≈ 50%") {
    val docs = Tables(spark, sf).documents.groupBy(col("lang"))
      .agg(count(lit(1)).as("total"))
    val kept = Curation.sampleStratified(spark, sf).groupBy(col("lang"))
      .agg(count(lit(1)).as("kept"))
    val rates = docs.join(kept, "lang")
      .select(col("lang"), (col("kept") / col("total")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // loose bounds: sf0.001 strata are small (tens of docs)
    assert(rates("en") > 0.02 && rates("en") < 0.35, s"en rate ${rates("en")}")
    rates.filterKeys(_ != "en").foreach { case (l, r) =>
      assert(r > 0.2 && r < 0.8, s"$l rate $r")
    }
  }

  test("token_budget: class decomposition equals the serial greedy prefix") {
    val out = Curation.tokenBudget(spark, sf)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // serial reference: global running sum over (score DESC, doc_id)
    val scored = Text.qualityScore(spark, sf)
      .select(col("doc_id"), col("score"), col("n_words"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (-t._2, t._1))
    val budget = scored.map(_._3).sum / Curation.BudgetDivisor
    var cum = 0L
    val expected = scored.takeWhile { t => cum += t._3; cum <= budget }
      .map(t => (t._1, t._2, t._3)).sortBy(_._1).toSeq
    assert(got == expected, "decomposed prefix diverges from serial greedy")
    // non-degenerate + greedy-maximal: something selected, something
    // rejected, and the FIRST rejected doc in greedy order would
    // overflow the budget (the prefix stops exactly at the boundary)
    assert(got.nonEmpty && got.size < scored.length)
    val selTok = expected.map(_._3).sum
    val firstRejected = scored.drop(expected.length)
    assert(firstRejected.nonEmpty &&
      selTok + firstRejected.head._3 > budget,
      "selection is not greedy-maximal")
  }

  test("token_budget: single-class corpus (worst case) splits via the two-level arm") {
    import spark.implicits._
    // every doc identical text ⇒ ONE score class: the whole budget
    // decision happens inside the boundary-class prefix sum — the
    // pathological shape the two-level decomposition exists for
    val docs = (1L to 90L).map(d => (d, "the quick brown fox and the lazy dog"))
      .toDF("doc_id", "text")
    val out = Curation.tokenBudgetOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    // 8 words per doc, 90 docs ⇒ budget = 720/3 = 240 ⇒ 30 docs
    assert(out.map(_._1) == (1L to 30L), s"wrong selection: ${out.map(_._1)}")
    assert(out.map(_._2).sum == 240L)
  }

  test("token_budget: empty corpus yields empty selection") {
    import spark.implicits._
    val out = Curation.tokenBudgetOn(Seq.empty[(Long, String)]
      .toDF("doc_id", "text"))
    assert(out.columns.toSeq == Seq("doc_id", "score", "n_words"))
    assert(out.count() == 0L)
  }

  test("q45_gap_fill: LOCF carries the last reading, -1 before the first, counts run") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user 1: view (no reading), purchase 5.0, click, signup 7.0, view
    // user 2: clicks only — never a reading, all filled = -1
    val ev = Seq(
      (1L, ts(10), 1L, "view", 9.9), (2L, ts(20), 1L, "purchase", 5.0),
      (3L, ts(30), 1L, "click", 8.8), (4L, ts(40), 1L, "signup", 7.0),
      (5L, ts(50), 1L, "view", 6.6),
      (6L, ts(10), 2L, "click", 1.1), (7L, ts(20), 2L, "error", 2.2))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = operators.Relational.q45On(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1L, 1L, -1.0, 0L), (1L, 2L, 5.0, 1L), (1L, 3L, 5.0, 1L),
      (1L, 4L, 7.0, 2L), (1L, 5L, 7.0, 2L),
      (2L, 6L, -1.0, 0L), (2L, 7L, -1.0, 0L)))
  }

  test("q45_gap_fill: equal timestamps break ties by event_id (total order)") {
    import spark.implicits._
    val t = new java.sql.Timestamp(1000L)
    val ev = Seq(
      (2L, t, 1L, "purchase", 2.0), (1L, t, 1L, "purchase", 1.0),
      (3L, t, 1L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = operators.Relational.q45On(ev)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // frame order is (ts, event_id): id 1 sees its own 1.0, id 2 the
    // later 2.0, id 3 carries 2.0 — regardless of input row order
    assert(got == Seq((1L, 1.0), (2L, 2.0), (3L, 2.0)))
  }

  test("ts_gaps: strict-threshold silences per user, boundary excluded") {
    import spark.implicits._
    import operators.Temporal.GapThresholdMs
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // user 1: gap exactly AT threshold (excluded), one past it
    // (included); user 2: dense, no gaps
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0),
      (2L, ts(GapThresholdMs), 1L, "view", 0.0),           // Δ = T: out
      (3L, ts(2 * GapThresholdMs + 1), 1L, "view", 0.0),   // Δ = T+1: in
      (4L, ts(1000), 2L, "view", 0.0), (5L, ts(2000), 2L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = operators.Temporal.tsGapsOn(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, GapThresholdMs, 2 * GapThresholdMs + 1, GapThresholdMs + 1)))
  }
}
