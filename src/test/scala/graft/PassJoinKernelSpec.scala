package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-16 PassJoin key kernel must emit EXACTLY the keys the
  * r15 SQL enumeration emitted — same (length, segment, xxhash64)
  * triples with the same multiplicities — on the real corpus and on
  * multi-byte texts where the substring/byte-offset arithmetic can
  * diverge. Candidate-join inputs identical ⇒ dedup_fuzzy_text
  * unchanged (the oracle hash is the end-to-end proof; this pins the
  * kernel in isolation so a future edit fails HERE, not at the
  * oracle).
  */
class PassJoinKernelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"
  val tau: Int = operators.Text.FuzzyMaxDist
  val n: Int = tau + 1

  /** The r15 SQL forms, verbatim (explode(sequence) + substring +
    * xxhash64), over a (doc_id, t, len) frame.
    */
  private def sqlIndex(d: org.apache.spark.sql.DataFrame) = d
    .select(col("doc_id").as("id_b"), col("t").as("t_b"),
      col("len").as("len_b"),
      explode(sequence(lit(0L), lit(tau.toLong))).as("i_b"))
    .withColumn("slen", expr(s"((i_b + 1) * len_b) div $n - (i_b * len_b) div $n"))
    .filter(col("slen") >= 1L)
    .withColumn("h", xxhash64(expr(
      s"substring(t_b, cast(1 + (i_b * len_b) div $n as int), cast(slen as int))")))
    .select(col("id_b"), col("i_b"), col("h"))

  private def sqlProbe(d: org.apache.spark.sql.DataFrame) = d
    .select(col("doc_id").as("id_a"), col("t").as("t_a"),
      col("len").as("len_a"),
      explode(sequence(col("len") - tau, col("len"))).as("l2"))
    .filter(col("l2") >= 1L)
    .select(col("id_a"), col("t_a"), col("len_a"), col("l2"),
      explode(sequence(lit(0L), lit(tau.toLong))).as("i_a"))
    .withColumn("off2", expr(s"1 + (i_a * l2) div $n"))
    .withColumn("slen", expr(s"((i_a + 1) * l2) div $n - (i_a * l2) div $n"))
    .filter(col("slen") >= 1L)
    .withColumn("lo", greatest(lit(1L), col("off2") - tau))
    .withColumn("hi", least(col("len_a") - col("slen") + 1L, col("off2") + tau))
    .filter(col("lo") <= col("hi"))
    .select(col("id_a"), col("t_a"), col("l2"), col("i_a"), col("slen"),
      explode(sequence(col("lo"), col("hi"))).as("p"))
    .withColumn("h", xxhash64(expr("substring(t_a, cast(p as int), cast(slen as int))")))
    .select(col("id_a"), col("l2"), col("i_a"), col("h"))

  private def frame(docs: org.apache.spark.sql.DataFrame) = docs
    .select(col("doc_id"),
      graft.functions.TextFunctions.normalize(col("text")).as("t"))
    .withColumn("len", length(col("t")).cast("long"))

  private def kIndex(d: org.apache.spark.sql.DataFrame) = d
    .select(col("doc_id").as("id_b"),
      explode(graft.functions.PassJoinKernel.passJoinIndex(col("t"), tau)).as("m"))
    .select(col("id_b"), col("m.i_b").as("i_b"), col("m.h").as("h"))

  private def kProbe(d: org.apache.spark.sql.DataFrame) = d
    .select(col("doc_id").as("id_a"),
      explode(graft.functions.PassJoinKernel.passJoinProbes(col("t"), tau)).as("m"))
    .select(col("id_a"), col("m.l2").as("l2"), col("m.i_a").as("i_a"),
      col("m.h").as("h"))

  private def bag(rows: Array[org.apache.spark.sql.Row]): Map[Seq[Any], Int] =
    rows.map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  test("kernel keys equal the SQL enumeration on the corpus") {
    val d = frame(Tables(spark, sf).documents)
    assert(bag(kIndex(d).collect()) == bag(sqlIndex(d).collect()))
    val kp = bag(kProbe(d).collect())
    val sp = bag(sqlProbe(d).collect())
    assert(kp.values.sum == sp.values.sum, "probe key volume differs")
    assert(kp == sp)
  }

  test("kernel keys equal the SQL enumeration on multi-byte and degenerate texts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "añé 𝕏 ünïcödé tàil with énough chärs to mäke sevérál ségments"),
      (2L, "ascii only but exactly average english sentence length here okay"),
      (3L, "ab"), // shorter than tau+1: single-char segments, clamped probes
      (4L, ""), // empty: no keys on either side
      (5L, "𝕏𝕐𝕑𝕏𝕐𝕑𝕏𝕐𝕑𝕏𝕐𝕑"), // astral-only: 4-byte chars
      (6L, "x")).toDF("doc_id", "text")
    val d = frame(docs)
    assert(bag(kIndex(d).collect()) == bag(sqlIndex(d).collect()))
    assert(bag(kProbe(d).collect()) == bag(sqlProbe(d).collect()))
    // empty text emits nothing (the "no signature → no pairs" gate)
    assert(kIndex(d.filter(col("doc_id") === 4L)).count() == 0L)
    assert(kProbe(d.filter(col("doc_id") === 4L)).count() == 0L)
  }
}
