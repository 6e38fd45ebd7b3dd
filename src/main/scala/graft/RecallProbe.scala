package graft

import org.apache.spark.sql.functions._

/** Dev tool: knn_graph recall vs sampled exact ground truth
  * (`runMain graft.RecallProbe <dir> [nSample] [k]`) — the evidence
  * harness behind the per-round replica recall numbers: computes the
  * registered knn_graph on the dir, samples the first `nSample`
  * sources by vec_id (deterministic), brute-forces their exact top-k
  * by cosine over the full corpus, and reports recall@k overall and
  * per true-similarity band (the ≥ 0.9 near-dup band, the 0.4–0.9
  * mid band semdedup/contrastive positives consume, and the rest).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nSample = if (args.length > 1) args(1).toInt else 500
    val k = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions.cosineSim

    val t0 = System.nanoTime()
    val got = SparkEntry.queries("knn_graph")(spark, dir).collect()
    val wall = (System.nanoTime() - t0) / 1e9
    val gotBy = got.groupBy(_.getAs[Long]("src"))
      .map { case (s, rows) => s -> rows.map(_.getAs[Long]("dst")).toSet }

    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
    val sample = emb.orderBy(col("vec_id")).limit(nSample)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    // exact top-k for the sample: one broadcast of the sample against
    // the corpus + bounded heap (test-scale corpora only)
    val exact = emb.crossJoin(broadcast(sample))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("dst"),
        cosineSim(col("qv"), col("v")).as("sim"))
    val topk = graft.plans.TopK.topKPerKey(exact,
      keys = Seq(col("qid")),
      order = Seq(col("sim").desc, col("dst").asc), k = k)
      .collect()
    val bands = Seq(("band>=0.9", 0.9, 2.0), ("band0.4-0.9", 0.4, 0.9),
      ("band<0.4", -2.0, 0.4))
    val byQ = topk.groupBy(_.getAs[Long]("qid"))
    var tot = 0; var hit = 0
    val bandTot = collection.mutable.Map(bands.map(_._1 -> 0): _*)
    val bandHit = collection.mutable.Map(bands.map(_._1 -> 0): _*)
    byQ.foreach { case (q, rows) =>
      val g = gotBy.getOrElse(q, Set.empty)
      rows.foreach { r =>
        val d = r.getAs[Long]("dst"); val s = r.getAs[Double]("sim")
        val b = bands.find(bb => s >= bb._2 && s < bb._3).map(_._1)
        tot += 1; if (g(d)) hit += 1
        b.foreach { bb => bandTot(bb) += 1; if (g(d)) bandHit(bb) += 1 }
      }
    }
    def pct(h: Int, t: Int): String = if (t == 0) "n/a" else f"${h.toDouble / t}%.3f ($h/$t)"
    println(f"[recall] dir=$dir n_sample=${byQ.size} k=$k knn_wall=$wall%.1f s")
    println(s"[recall] overall recall@$k = ${pct(hit, tot)}")
    bands.foreach { case (n, _, _) =>
      println(s"[recall] $n recall@$k = ${pct(bandHit(n), bandTot(n))}")
    }
    println(s"[recall] graph rows = ${got.length}")
    spark.stop()
  }
}
