package graft

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Dev decomposition harness for dedup_fuzzy_text (round 16, guide
  * §1): times each pipeline stage in isolation — collapse, the
  * normalized rep frame, the PassJoin index/probe generation, the
  * candidate join+distinct, verification, and the full query — so
  * the optimization targets the stage that actually costs, not the
  * one the VERDICT guessed. `runMain graft.DebugFz <dir> [n]`.
  */
object DebugFz {
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
        println(f"[fz] $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables(spark, dir).documents
    // warmup
    noop(Text.dedupFuzzyTextOn(docs))

    time("full dedupFuzzyTextOn") {
      noop(Text.dedupFuzzyTextOn(docs))
    }
    time("collapse only") {
      val (reps, membership) = Dedup.collapseByText(docs)
      noop(reps)
      Materialize.release(membership)
    }
    time("collapse + d materialized") {
      val (reps, membership) = Dedup.collapseByText(docs)
      val d = reps.select(col("doc_id"),
          graft.functions.TextFunctions.normalize(col("text")).as("t"))
        .withColumn("len", length(col("t")).cast("long"))
        .repartition(col("doc_id"))
        .materialized
      Materialize.release(d); Materialize.release(membership)
    }
    // stage probes via the factored pieces: reuse the real operator
    // body by timing progressively longer prefixes through the
    // private API (same code path, plan-identical)
    time("collapse+d+idx+probe+join") {
      val (reps, membership) = Dedup.collapseByText(docs)
      val d = reps.select(col("doc_id"),
          graft.functions.TextFunctions.normalize(col("text")).as("t"))
        .withColumn("len", length(col("t")).cast("long"))
        .repartition(col("doc_id"))
        .materialized
      val tau = Text.FuzzyMaxDist
      val nn = tau + 1
      val idx = d.select(col("doc_id").as("id_b"),
          col("t").as("t_b"), col("len").as("len_b"),
          explode(sequence(lit(0L), lit(tau.toLong))).as("i_b"))
        .withColumn("slen", expr(s"((i_b + 1) * len_b) div $nn - (i_b * len_b) div $nn"))
        .filter(col("slen") >= 1L)
        .withColumn("h", xxhash64(expr(
          s"substring(t_b, cast(1 + (i_b * len_b) div $nn as int), cast(slen as int))")))
        .select(col("id_b"), col("len_b"), col("i_b"), col("h"))
      val probe = d.select(col("doc_id").as("id_a"), col("t").as("t_a"),
          col("len").as("len_a"),
          explode(sequence(col("len") - tau, col("len"))).as("l2"))
        .filter(col("l2") >= 1L)
        .select(col("id_a"), col("t_a"), col("len_a"), col("l2"),
          explode(sequence(lit(0L), lit(tau.toLong))).as("i_a"))
        .withColumn("off2", expr(s"1 + (i_a * l2) div $nn"))
        .withColumn("slen", expr(s"((i_a + 1) * l2) div $nn - (i_a * l2) div $nn"))
        .filter(col("slen") >= 1L)
        .withColumn("lo", greatest(lit(1L), col("off2") - tau))
        .withColumn("hi", least(col("len_a") - col("slen") + 1L, col("off2") + tau))
        .filter(col("lo") <= col("hi"))
        .select(col("id_a"), col("t_a"), col("l2"), col("i_a"), col("slen"),
          explode(sequence(col("lo"), col("hi"))).as("p"))
        .withColumn("h", xxhash64(expr("substring(t_a, cast(p as int), cast(slen as int))")))
        .select(col("id_a"), col("l2"), col("i_a"), col("h"))
      val cand = probe.join(idx.hint("SHUFFLE_HASH"),
          probe("l2") === idx("len_b") && probe("i_a") === idx("i_b") &&
            probe("h") === idx("h"))
        .filter(col("id_a") =!= col("id_b"))
        .select(least(col("id_a"), col("id_b")).as("id1"),
          greatest(col("id_a"), col("id_b")).as("id2"))
        .distinct()
      val which = sys.env.getOrElse("FZ_STAGE", "cand")
      which match {
        case "probe" => noop(probe)
        case "idx" => noop(idx)
        case "probecnt" => println(s"[fz] probe rows = ${probe.count()}")
        case _ => noop(cand)
      }
      Materialize.release(d); Materialize.release(membership)
    }
    // how many rows flow where (one pass, informational)
    locally {
      val (reps, membership) = Dedup.collapseByText(docs)
      val d = reps.select(col("doc_id"),
          graft.functions.TextFunctions.normalize(col("text")).as("t"))
        .withColumn("len", length(col("t")).cast("long"))
        .repartition(col("doc_id")).materialized
      println(s"[fz] reps=${d.count()} docs=${docs.count()}")
      Materialize.release(d); Materialize.release(membership)
    }
    spark.stop()
  }
}
