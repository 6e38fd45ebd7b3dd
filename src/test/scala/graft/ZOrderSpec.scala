package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof that the Z-order layout actually buys multi-dimensional file
  * skipping: the same rows written (a) Morton-clustered on two bucket
  * columns and (b) linearly sorted on one, then each part-file's
  * min/max rectangle is measured — exactly the stats a file-skipping
  * scanner (or parquet row-group pruning) consults. A box predicate
  * on the SECOND dimension must intersect strictly fewer z-files than
  * linear files (which all span the full second-dimension range).
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
  val NFiles = 8

  private def partFiles(path: String): Seq[String] = {
    val d = new java.io.File(path)
    d.listFiles().filter(f => f.getName.startsWith("part-") &&
      f.getName.endsWith(".parquet")).map(_.getPath).toSeq
  }

  /** Per-file [min,max] of a column — what file-skipping indexes. */
  private def ranges(path: String, c: String): Seq[(Long, Long)] =
    partFiles(path).map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
      (r.getLong(0), r.getLong(1))
    }

  private def intersecting(rs: Seq[(Long, Long)], lo: Long, hi: Long): Int =
    rs.count { case (mn, mx) => mx >= lo && mn <= hi }

  test("morton clustering prunes a second-dimension box; linear layout cannot") {
    val li = Tables(spark, sf).lineitem
    val zPath = "target/tmp/zorder_z"
    val lPath = "target/tmp/zorder_linear"
    operators.Layout.zorderWrite(li, "l_partkey", "l_orderkey", NFiles, zPath)
    operators.Layout.linearWrite(li, "l_partkey", "l_orderkey", NFiles, lPath)
    assert(partFiles(zPath).size == NFiles && partFiles(lPath).size == NFiles)

    // box on the SECOND dimension only: y8 ∈ [96, 127]
    val (yLo, yHi) = (96L, 127L)
    val zHit = intersecting(ranges(zPath, "y8"), yLo, yHi)
    val lHit = intersecting(ranges(lPath, "y8"), yLo, yHi)
    assert(lHit == NFiles, s"linear layout unexpectedly pruned y: $lHit")
    assert(zHit < lHit, s"z-order pruned nothing: z=$zHit linear=$lHit")
    assert(zHit <= NFiles / 2, s"z-order pruning too weak: $zHit of $NFiles")

    // the FIRST dimension still prunes on the z layout too (each
    // z-file's x8 rectangle is bounded, not full-range)
    val zxHit = intersecting(ranges(zPath, "x8"), 32L, 63L)
    assert(zxHit < NFiles, s"z layout lost first-dimension pruning: $zxHit")

    // and the layouts hold identical data: same rows under the box
    // predicate read back from both
    def boxRows(p: String) = spark.read.parquet(p)
      .filter(col("y8").between(yLo, yHi))
      .select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(boxRows(zPath) == boxRows(lPath))
    assert(boxRows(zPath).nonEmpty)
  }

  test("q29 zval is a true bit interleave (inverse recovers both buckets)") {
    val rows = operators.Layout.q29(spark, sf)
      .select("x8", "y8", "zval").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // de-interleave bit by bit
      val gotX = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val gotY = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(gotX == x && gotY == y, s"zval $z does not interleave ($x, $y)")
    }
  }
}
