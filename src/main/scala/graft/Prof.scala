package graft
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"TIMING $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val docs = Tables(spark, dir).documents
    val sh = docs.withColumn("w", words(col("text")))
      .select(col("doc_id"), explode(shingles("w")).as("shingle"))
      .select(col("doc_id"), (hash60(col("shingle")) % 2147483647L).as("h"))
    time("shingleHashes")(sh.write.format("noop").mode("overwrite").save())
    val rnd = new scala.util.Random(42)
    val perms = IndexedSeq.fill(128)((rnd.nextLong(2147483646L) + 1, rnd.nextLong(2147483647L)))
    val mhCols = perms.zipWithIndex.map { case ((a, b), i) => min((col("h") * a + b) % 2147483647L).as(s"mh$i") }
    val sigs = sh.groupBy(col("doc_id")).agg(mhCols.head, mhCols.tail: _*)
    time("sigs-agg")(sigs.write.format("noop").mode("overwrite").save())
    val bandCols = (0 until 16).map { bId =>
      struct(lit(bId).as("band"), md5(concat_ws(",", (0 until 8).map(r => col(s"mh${bId*8+r}")): _*)).as("key")) }
    val banded = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    time("banded")(banded.write.format("noop").mode("overwrite").save())
    val cands = banded.as("x").join(banded.as("y"),
      col("x.band") === col("y.band") && col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
    time("candidates")(cands.write.format("noop").mode("overwrite").save())
    time("full")(graft.operators.Dedup.minhash(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
