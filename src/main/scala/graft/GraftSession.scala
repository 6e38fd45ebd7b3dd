package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local mode is a stand-in for a multi-executor cluster: every knob
  * here (AQE, shuffle partitions, broadcast threshold) is chosen so
  * the same plans scale to a real cluster — nothing relies on
  * single-JVM behavior.
  */
object GraftSession {
  def builder(master: String = "local[*]", cores: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // cached intermediates here are always repartition(key)-then-
      // cache by design (pagerank edges, propagation edges, inverted-
      // index tf): keep their output partitioning deterministic so
      // downstream stages consume the cache WITHOUT re-shuffling.
      // With the default (true), AQE plans the cache build and
      // InMemoryTableScan reports unknown partitioning at planning
      // time — every consumer then re-inserts an exchange (measured
      // on inverted_index: 3 redundant term shuffles).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // default 100-entry generated-class cache thrashes across a
      // 30+-query workload → Janino recompiles mid-run
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read as epoch-nanos LONG and convert in Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Read ms/µs parquet timestamps as session-TZ timestamps (UTC) so
      // unix_millis & friends apply directly.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
