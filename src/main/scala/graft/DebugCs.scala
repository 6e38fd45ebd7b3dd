package graft

import org.apache.spark.sql.functions._

/** Dev phase-timer for community_stats (round-16 verdict #7): the
  * card's cold cost decomposes into tables+count (the loop-law
  * footer scan), the mirrored edge build, the LPA fixpoint loop and
  * the modularity grading passes — this prints each phase per run so
  * the optimization targets the phase that actually dominates.
  * runMain graft.DebugCs <dir> [n]
  */
object DebugCs {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.Graph

    for (i <- 1 to n) {
      CacheLedger.drain(spark); System.gc()
      val t0 = System.nanoTime()
      val t = Tables(spark, dir)
      val cnt = t.lineitem.count()
      val parts = Graph.loopShufflePartitions(spark, cnt)
      val t1 = System.nanoTime()
      val out = PlanScope.static(spark, parts) { loop =>
        val tl = Tables(loop, dir)
        val edges = Graph.mirroredTradeEdges(tl.orders, tl.lineitem)
        val t2 = System.nanoTime()
        val nodes = tl.customer.select((col("c_custkey") * 2).as("id"))
          .unionAll(tl.supplier.select((col("s_suppkey") * 2 + 1).as("id")))
        val labels = Graph.lpaFixpoint(nodes, edges)
        val t3 = System.nanoTime()
        val graded = Graph.gradeCommunities(labels, edges)
        graded.write.format("noop").mode("overwrite").save()
        val t4 = System.nanoTime()
        println(f"[debugcs] run$i parts=$parts tables=${(t1 - t0) / 1e9}%.3f " +
          f"edges=${(t2 - t1) / 1e9}%.3f fixpoint=${(t3 - t2) / 1e9}%.3f " +
          f"grade=${(t4 - t3) / 1e9}%.3f total=${(t4 - t0) / 1e9}%.3f")
        if (i == 1) {
          // the internal pass's exchange volume: raw per-edge rows
          // (the pre-r16 shape) vs combined (dst, slbl) rows (the
          // aggregate-before-exchange shape) on THIS converged
          // labeling — the §2.3 bytes evidence
          val lblOnly = labels.select(col("id"), col("lbl"))
          val joined = edges
            .join(lblOnly.hint("SHUFFLE_HASH"), edges("src") === lblOnly("id"))
            .select(col("dst"), col("lbl").as("slbl"))
          val raw = joined.count()
          val combined = joined.groupBy(col("dst"), col("slbl")).count().count()
          println(f"[debugcs] internal-exchange rows: raw=$raw combined=$combined" +
            f" (x${raw.toDouble / math.max(combined, 1L)}%.1f)")
          // the grade subtrees' formatted plans (they materialize at
          // construction time inside gradeCommunities, so PlanDump's
          // query-level output never shows them)
          val fmtM = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
          println("===== grade_combined =====")
          println(Graph.gradeCombined(labels, edges)
            .queryExecution.explainString(fmtM))
          println("===== grade_card =====")
          println(Graph.gradeCard(labels,
              Materialize.eager(Graph.gradeCombined(labels, edges)))
            .queryExecution.explainString(fmtM))
        }
        Materialize.release(labels)
        Materialize.release(edges)
        graded
      }
      Materialize.release(out)
    }
    spark.stop()
  }
}
