package graft

/** Dev tool: time registered queries N times each at a given sf dir
  * (`runMain graft.TimeOne <name>[,<name>...] <dir> [n]`) — for
  * triaging a bench slope flag, or measuring a query pack at an
  * ad-hoc scale dir (tools/make_scale.py), without a full Bench run.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    // "ALL" = every registered query, name order (stable across dirs
    // so same-JVM artifact warmness is comparable between sweeps)
    val names =
      if (args(0) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq
    val dir = args(1)
    val n = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_DRAIN=1 → drain the artifact caches per run (the
    // Bench cold_artifacts methodology) so EVERY run of an artifact
    // consumer is a cold point, not just the first per JVM
    val drain = sys.env.get("SPARK_GRAFT_DRAIN").contains("1")
    for (name <- names; i <- 1 to n) {
      if (drain) CacheLedger.drain(spark) else spark.catalog.clearCache()
      System.gc() // match Bench's isolation: drain earlier queries' debt
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[timeone] $name $dir run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
