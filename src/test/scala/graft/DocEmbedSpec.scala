package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** doc_embed — the hashing-trick text embedding and its bridge into
  * the vector family: determinism at any partitioning, the signed-
  * count structure (identical texts → identical vectors), and the
  * end-to-end path documents → docEmbeddings → dedup_embedding
  * finding exact duplicates at cosine 1.0 with no embeddings table
  * involved.
  */
class DocEmbedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  private val textA = (0 until 30).map(i => s"alpha$i").mkString(" ")
  private val textB = (0 until 30).map(i => s"beta$i").mkString(" ")

  private def corpus(parts: Int): DataFrame = {
    import spark.implicits._
    Seq((1L, textA), (2L, textA), (3L, textB), (4L, "solo words here"), (5L, ""))
      .toDF("doc_id", "text").repartition(parts)
  }

  test("vectors: deterministic across partitionings, dim and norm contract") {
    val a = operators.Curation.docEmbedOn(corpus(1)).collect()
    val b = operators.Curation.docEmbedOn(corpus(5)).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val byId = a.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byId(1L) == byId(2L).copy()) // identical text, identical vector
    assert(byId(1L)._1.split(",").length == operators.Curation.EmbedDim)
    // n2 equals the recomputed squared norm of the shipped vector
    val vec = byId(1L)._1.split(",").map(_.toLong)
    assert(vec.map(x => x * x).sum == byId(1L)._2)
    assert(byId(1L)._2 > 0L)
    assert(byId(5L)._2 == 0L) // empty text: zero vector
    // 30 distinct words, signs ±1: total mass ≤ 30 spread over buckets
    assert(vec.map(math.abs).sum <= 30L)
  }

  test("kernel is row-for-row identical to the SQL higher-order form it replaced") {
    // the interpreted transform/aggregate form doc_embed shipped with
    // before the EmbedKernel rewrite — an independent evaluation path
    // (Spark's own md5/conv/substring + lambda folds) proving the
    // kernel's digest-byte hash60 and bucket/sign math bit-exact
    import org.apache.spark.sql.functions._
    val dim = operators.Curation.EmbedDim
    def h60(c: String) = s"cast(conv(substring(md5($c), 1, 15), 16, 10) as bigint)"
    import spark.implicits._
    val docs = corpus(3)
      .unionByName(Seq((6L, "the the the of And AND \t mixed  Case?"),
        (7L, "unicode Ünïcodé wörds café 北京 résumé"))
        .toDF("doc_id", "text"))
    val sqlForm = docs
      .withColumn("ws", graft.functions.TextFunctions.words(col("text")))
      .withColumn("bs", expr(
        s"""transform(filter(ws, w -> w != ''),
           |  w -> struct(
           |    pmod(${h60("concat('emb:', w)")}, $dim) as b,
           |    if(pmod(${h60("concat('sgn:', w)")}, 2) = 0, 1L, -1L) as s))""".stripMargin))
      .withColumn("vec", expr(
        s"""transform(sequence(0, ${dim - 1}),
           |  i -> aggregate(bs, 0L, (acc, e) -> acc + if(e.b = i, e.s, 0L)))""".stripMargin))
      .select(col("doc_id"),
        concat_ws(",", col("vec")).as("vec_str"),
        expr("aggregate(vec, 0L, (a, x) -> a + x * x)").as("n2"))
      .orderBy(col("doc_id"))
    val a = operators.Curation.docEmbedOn(docs).collect().map(_.toSeq)
    val b = sqlForm.collect().map(_.toSeq)
    assert(a.length == b.length && a.indices.forall(i => a(i) == b(i)))
  }

  test("bridge: dedup_embedding over docEmbeddings finds exact dups at cos 1.0") {
    val pairs = operators.Dedup.embeddingOn(
        operators.Curation.docEmbeddings(corpus(3))
          .filter(org.apache.spark.sql.functions.expr(
            "aggregate(v, 0D, (a, x) -> a + x * x) > 0")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    // disjoint vocabularies: no hash-collision pair reaches the 0.4 bar
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }
}
