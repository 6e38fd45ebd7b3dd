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
}
