package graft

import org.apache.spark.sql.functions._

/** Dev plan dumper for dedup_eval's pair-ARTIFACT shapes (round 16):
  * the artifacts materialize at query-construction time, so their
  * plans never appear in PlanDump's query-level output — this prints
  * each arm's ordered (registered-operator) and unordered (artifact)
  * formatted plan so the removed range-sort is committable evidence.
  * runMain graft.DebugPairPlans <dir>
  */
object DebugPairPlans {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.{Dedup, Text}

    val docs = Tables(spark, dir).documents
    val (reps, membership) = Dedup.collapseByText(docs)
    val sh = Text.shingleSetOf(reps).localCheckpoint(true)
    val shH = sh.select(col("doc_id"),
      pmod(graft.functions.TextFunctions.hash60(col("shingle")),
        lit(Dedup.P)).as("h")).distinct().localCheckpoint(true)
    val arms = Seq(
      ("ngram_jaccard",
        () => Text.ngramJaccardFrom(sh, membership, 0.5),
        () => Text.ngramJaccardFromUnordered(sh, membership, 0.5)),
      ("dedup_minhash",
        () => Dedup.minhashFrom(shH, membership),
        () => Dedup.minhashFromUnordered(shH, membership)),
      ("winnow_pairs",
        () => Text.winnowPairsCollapsed(reps, membership),
        () => Text.winnowPairsCollapsedUnordered(reps, membership)),
      ("dedup_fuzzy_text",
        () => Text.dedupFuzzyTextCollapsed(reps, membership),
        () => Text.dedupFuzzyTextCollapsedUnordered(reps, membership)))
    val fmt = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for ((name, ordered, unordered) <- arms) {
      println(s"===== ${name}_arm_ordered =====")
      println(ordered().queryExecution.explainString(fmt))
      println(s"===== ${name}_arm_unordered =====")
      println(unordered().queryExecution.explainString(fmt))
    }
    spark.stop()
  }
}
