package graft

import org.apache.spark.sql.functions._

/** Dev micro-A/B for the top-word-count expression forms. */
object DebugTw {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions.words

    def time(label: String)(body: => Unit): Unit = {
      for (i <- 1 to n) {
        System.gc()
        val t0 = System.nanoTime()
        body
        println(f"[tw] $label%-14s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val base = Tables(spark, dir).documents
      .withColumn("w", words(col("text")))
      .withColumn("wd", array_distinct(col("w")))
    val old = expr("array_max(transform(wd, x -> size(filter(w, y -> y = x))))")
    val neu = expr("""aggregate(array_sort(w),
      named_struct('p', cast(null as string), 'r', 0, 'b', 0),
      (a, x) -> named_struct(
        'p', x,
        'r', IF(x <=> a.p, a.r + 1, 1),
        'b', greatest(a.b, IF(x <=> a.p, a.r + 1, 1))),
      a -> a.b)""")
    noop(base.select(old.as("c"))); noop(base.select(neu.as("c")))
    time("old") { noop(base.select(old.as("c"))) }
    time("new") { noop(base.select(neu.as("c"))) }
    time("old x3") { noop(base.select(old.as("a"), (old + 1).as("b"), (old + 2).as("c"))) }
    time("new x3") { noop(base.select(neu.as("a"), (neu + 1).as("b"), (neu + 2).as("c"))) }
    // equality check
    val cmp = base.select(old.as("o"), neu.as("n"))
      .filter(!(col("o") <=> col("n"))).count()
    println(s"[tw] mismatches = $cmp")
    spark.stop()
  }
}
