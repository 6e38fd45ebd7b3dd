package graft

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Dev decomposition harness for ngram_jaccard (round 16, guide §1):
  * shingle scan, pair estimate, candidate self-join, scoring, full.
  * `runMain graft.DebugNj <dir> [n]`.
  */
object DebugNj {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Text}

    def time(label: String)(body: => Unit): Unit = {
      for (i <- 1 to n) {
        CacheLedger.drain(spark)
        System.gc()
        val t0 = System.nanoTime()
        body
        println(f"[nj] $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables(spark, dir).documents
    noop(Text.ngramJaccardDocs(docs, 0.5)) // warmup

    time("full ngramJaccardDocs") { noop(Text.ngramJaccardDocs(docs, 0.5)) }
    time("collapse+shingles mat") {
      val (reps, membership) = Dedup.collapseByText(docs)
      val sh = Text.shingleSetOf(reps).materialized
      Materialize.release(sh); Materialize.release(membership)
    }
    time("…+estimate") {
      val (reps, membership) = Dedup.collapseByText(docs)
      val sh = Text.shingleSetOf(reps).materialized
      val (est, rows) = Text.pairEstimateAndCount(sh)
      println(s"[nj] est=$est rows=$rows amp=${est.toDouble / rows}")
      Materialize.release(sh); Materialize.release(membership)
    }
    time("…+selfjoin count inter") {
      val (reps, membership) = Dedup.collapseByText(docs)
      val sh = Text.shingleSetOf(reps).materialized
      val pairs = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      noop(pairs)
      Materialize.release(sh); Materialize.release(membership)
    }
    time("…+groupemit count inter") {
      val (reps, membership) = Dedup.collapseByText(docs)
      val sh = Text.shingleSetOf(reps).materialized
      val pairs = sh.groupBy(col("shingle"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(expr(
          "flatten(transform(sequence(0, size(ds) - 2), " +
            "i -> transform(sequence(i + 1, size(ds) - 1), " +
            "j -> struct(ds[i] AS d1, ds[j] AS d2))))")).as("p"))
        .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(count(lit(1)).as("inter"))
      noop(pairs)
      Materialize.release(sh); Materialize.release(membership)
    }
    spark.stop()
  }
}
