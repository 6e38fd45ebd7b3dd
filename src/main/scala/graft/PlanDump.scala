package graft

/** Dev tool: print the executed plan of registered queries
  * (`runMain graft.PlanDump <dir> <name> [name...]`) — the explain
  * audit loop SURVEY §5a's plan evidence comes from.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PLAN_FMT=1 → .explain("formatted") text instead of
    // the executed plan (the judge-facing plans/ artifact format)
    val formatted = sys.env.get("SPARK_GRAFT_PLAN_FMT").contains("1")
    // SPARK_GRAFT_PLAN_EXEC=1 → run the query (noop sink) FIRST and
    // print the post-execution plan, so AQE's runtime decisions
    // (ReusedExchange, AQEShuffleRead, join rewrites) are visible —
    // the pre-execution dump shows isFinalPlan=false shapes only
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    for (name <- args.drop(1)) {
      val df = SparkEntry.queries(name)(spark, dir)
      if (exec) df.write.format("noop").mode("overwrite").save()
      val qe = df.queryExecution
      val plan =
        if (formatted)
          qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        else qe.executedPlan.toString.split("== Initial Plan ==")(0)
      println(s"===== $name =====")
      println(plan)
    }
    spark.stop()
  }
}
