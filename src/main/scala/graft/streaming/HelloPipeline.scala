package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** The reference's hello-world job
  * (/root/reference/src/hello_flink_job.py, README "Quick
  * Hello-World Check"): read JSON strings, add
  * `"processed_by"` field, write back out. Source-agnostic like
  * HealthMonitor — Kafka in production, MemoryStream in tests.
  */
object HelloPipeline {
  val ProcessedBy = "hello_spark_job"
  val ProcessedByKey = "processed_by"

  /** value:String JSON in → value:String JSON out with the
    * processed_by marker appended (invalid JSON passes through
    * unchanged, matching a defensive hello-world).
    */
  def transform(raw: DataFrame): DataFrame = {
    val parsed = from_json(col("value"), MapType(StringType, StringType))
    // drop any pre-existing processed_by first: map_concat THROWS on
    // duplicate keys under the default mapKeyDedupPolicy=EXCEPTION,
    // and overwrite is the reference job's behavior anyway
    val cleaned = map_filter(parsed, (k, _) => k =!= ProcessedByKey)
    raw.select(
      when(parsed.isNotNull,
        to_json(map_concat(cleaned, map(lit(ProcessedByKey), lit(ProcessedBy)))))
        .otherwise(col("value"))
        .as("value"))
  }
}
