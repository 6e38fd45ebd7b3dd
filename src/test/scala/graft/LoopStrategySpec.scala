package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The loop fault-tolerance knob (r11 verdict #6):
  * `spark.graft.loopMaterialize` switches every driver loop's
  * per-round lineage truncation between the default local checkpoint
  * (fast, non-replicated — a mid-loop executor loss restarts the
  * operator) and RELIABLE per-round checkpoints to the SparkContext
  * checkpoint dir (an executor loss mid-loop recovers from the round
  * files — what a multi-hour 100 TB loop on a shared fleet wants).
  * Results must be bit-identical under both; only failure semantics
  * move. Pinned here on the two heaviest loop operators (pagerank's
  * rank rounds, k_core's shrinking edge rounds) plus the
  * star-contraction loop dedup_clusters drives.
  */
class LoopStrategySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private def withReliable[T](body: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-loop-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Materialize.LoopStrategyKey, "checkpoint")
    try body
    finally {
      spark.conf.unset(Materialize.LoopStrategyKey)
      // release round files with the run (the spec contract: a REAL
      // deployment keeps them for recovery; tests must not accumulate)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir.toFile)
    }
  }

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("pagerank is bit-identical under reliable per-round checkpoints, and round files land") {
    val default = sorted(operators.Graph.pagerank(spark, sf))
    val (reliable, files) = withReliable {
      val out = sorted(operators.Graph.pagerank(spark, sf))
      val raw = spark.sparkContext.getCheckpointDir.get
      val dir = if (raw.contains(":")) new java.io.File(new java.net.URI(raw))
                else new java.io.File(raw)
      def count(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(count).sum else 1
      (out, count(dir))
    }
    assert(reliable == default, "loop strategy changed pagerank's results")
    assert(files > 0, "reliable strategy wrote no per-round checkpoint files")
  }

  test("k_core and dedup_clusters are bit-identical under reliable per-round checkpoints") {
    val kDefault = sorted(operators.Graph.kCore(spark, sf))
    val cDefault = sorted(SparkEntry.queries("dedup_clusters")(spark, sf))
    withReliable {
      operators.Dedup.clearPairCache() // labels memoize per (op, dir)
      assert(sorted(operators.Graph.kCore(spark, sf)) == kDefault,
        "loop strategy changed k_core's results")
      assert(sorted(SparkEntry.queries("dedup_clusters")(spark, sf)) == cDefault,
        "loop strategy changed dedup_clusters' results")
    }
    operators.Dedup.clearPairCache() // don't leak reliable-run artifacts
  }
}
