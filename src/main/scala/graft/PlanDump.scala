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
    for (name <- args.drop(1)) {
      val qe = SparkEntry.queries(name)(spark, dir).queryExecution
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
