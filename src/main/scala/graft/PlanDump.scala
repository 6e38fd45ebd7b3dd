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
    for (name <- args.drop(1)) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      println(s"===== $name =====")
      println(plan)
    }
    spark.stop()
  }
}
