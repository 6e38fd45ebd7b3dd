package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the embedding-clustering pack (semdedup): k-means
  * determinism at any parallelism, containment in the exact near-dup
  * relation, and co-cluster recall vs the exact all-pairs operator.
  */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private def emb = Tables(spark, sf).embeddings
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("kmeans centroids are bit-identical under repartition (decimal-exact means)") {
    import graft.operators.Clustering._
    val e = emb.filter(col("v").isNotNull)
    val k = autoK(e.count())
    val (ids1, c1) = kmeansCentroids(e, k, KmeansIters)
    val (ids2, c2) = kmeansCentroids(e.repartition(7), k, KmeansIters)
    assert(ids1 == ids2)
    assert(c1 == c2, "means drifted across partitionings — decimal accumulation broken")
  }

  test("autoK: cell COUNT scales with the corpus (constant cell size), driver cap only") {
    import graft.operators.Clustering._
    assert(autoK(10) == 2)
    assert(autoK(50) == 6)
    assert(autoK(500) == 62)
    assert(autoK(5000000L) == MaxCells, "driver-model cap not enforced")
  }

  test("semdedup output is deterministic and cells are bounded by K") {
    import graft.operators.Clustering._
    val n = emb.filter(col("v").isNotNull).count()
    val a = semdedupOn(emb).collect().map(_.toSeq).toSeq
    val b = semdedupOn(emb.repartition(5)).collect().map(_.toSeq).toSeq
    assert(a == b, "semdedup diverges across partitionings")
    val cells = a.map(_(1).asInstanceOf[Long]).distinct
    assert(cells.size <= autoK(n) + 1)
    assert(a.map(_.head.asInstanceOf[Long]).distinct.size == a.size, "a vector appears twice")
  }

  test("semdedup drops only true near-dups (containment in dedup_embedding)") {
    val out = graft.operators.Clustering.semdedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exactPairs = SparkEntry.queries("dedup_embedding")(spark, sf)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exactPairs.nonEmpty)
    // soundness: every dropped vector is the higher id of SOME exact
    // near-dup pair (identical kernel, rounding, and threshold as
    // dedup_embedding, so cell-local pairs are a subset of exact pairs)
    val dupTargets = exactPairs.map(_._2).toSet
    val dropped = out.collect { case (id, (_, keep)) if keep == 0L => id }.toSet
    assert(dropped.nonEmpty, "nothing pruned — threshold never fired")
    assert(dropped.subsetOf(dupTargets),
      s"dropped non-duplicates: ${dropped -- dupTargets}")
  }

  test("semdedup prunes injected near-exact duplicates (the semantic-duplicate class)") {
    // fixture: every 10th vector re-appears under a new id with a tiny
    // uniform scaling — cosine is scale-invariant, so each copy is a
    // PERFECT semantic duplicate (cos = 1) of its source. SemDeDup's
    // contract is exactly this class: the copy must land in its
    // source's cell (assignment is cosine-based) and be pruned. The
    // corpus's own weak cos≈0.4 pairs are NOT the operator's target —
    // k-means cells neither should nor do respect them.
    val base = emb.filter(col("v").isNotNull)
    val offset = 10000L
    val dups = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + offset).as("vec_id"),
        transform(col("v"), x => x * lit(1.000001)).as("v"))
    val out = graft.operators.Clustering.semdedupOn(base.unionAll(dups))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val injected = out.keys.filter(_ >= offset).toSeq
    assert(injected.nonEmpty)
    injected.foreach { id =>
      assert(out(id)._1 == out(id - offset)._1,
        s"copy $id landed in cell ${out(id)._1}, source in ${out(id - offset)._1}")
      assert(out(id)._2 == 0L, s"perfect duplicate $id was kept")
    }
  }

  // ---- emb_pca ----

  test("emb_pca equals an independent in-JVM reference and is partitioning-invariant") {
    import org.apache.spark.sql.functions._
    val emb = Tables(spark, sf).embeddings
      .select(col("embedding").cast("array<double>").as("v"))
    val got = operators.Clustering.embPcaOn(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    assert(got.length == operators.Clustering.PcaComponents)
    // independent reference: same algorithm definition, separate code
    val dim = operators.Clustering.PcaDim
    val vecs = emb.collect().map(_.getSeq[Double](0).toArray)
    val q = vecs.map(_.map(x => math.round(x * operators.Clustering.PcaScale)))
    val n = q.length
    val s = Array.ofDim[Long](dim, dim)
    val sums = new Array[Long](dim)
    for (row <- q; i <- 0 until dim) {
      sums(i) += row(i)
      for (j <- 0 until dim) s(i)(j) += row(i) * row(j)
    }
    val buf = new Array[Long](dim * dim + dim + 1)
    for (i <- 0 until dim; j <- 0 until dim) buf(i * dim + j) = s(i)(j)
    for (i <- 0 until dim) buf(dim * dim + i) = sums(i)
    buf(dim * dim + dim) = n
    val want = operators.Clustering.pcaFromScatter(buf, dim)
    got.zip(want).foreach { case ((_, eig, ppm, vs), (wEig, wPpm, wv)) =>
      assert(eig == wEig && ppm == wPpm)
      assert(vs == wv.map(x => f"$x%.6f").mkString(","))
    }
    // eigen ordering + unit vectors
    assert(got(0)._2 >= got(1)._2 - 1e-9)
    got.foreach { case (_, _, _, vs) =>
      val norm = math.sqrt(vs.split(",").map(_.toDouble).map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-4, s"eigvec not unit: $norm")
    }
    // bit-identical under repartitioning (integer scatter sums)
    val re = operators.Clustering.embPcaOn(emb.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    assert(re.toSeq == got.toSeq, "PCA depends on partitioning")
  }

  test("emb_pca finds a planted dominant axis") {
    import spark.implicits._
    val dim = operators.Clustering.PcaDim
    val rnd = new scala.util.Random(42)
    val docs = (0 until 400).map { _ =>
      val v = Array.fill(dim)(rnd.nextGaussian() * 0.01)
      v(7) += rnd.nextGaussian() * 5.0 // variance concentrated on axis 7
      v.toSeq
    }.toDF("v")
    val rows = operators.Clustering.embPcaOn(docs).collect()
    val v1 = rows(0).getString(3).split(",").map(_.toDouble)
    assert(math.abs(v1(7)) > 0.99, s"dominant axis missed: ${v1(7)}")
    assert(rows(0).getLong(2) > 900000L,
      s"explained variance too low: ${rows(0).getLong(2)}")
  }

  test("coreset_select equals the serial greedy k-center, radius curve nonincreasing") {
    val got = operators.Clustering.coresetSelect(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // serial twin over the collected corpus, same float op order as
    // the CosineSimilarity kernel (dot/(sqrt*sqrt) over min length)
    val vecs = Tables(spark, sf).embeddings
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val mind = scala.collection.mutable.Map[Long, Double]()
    var center = vecs.head
    val expected = (0 until operators.Clustering.CoresetK).map { k =>
      vecs.foreach { case (i, v) =>
        val d = 1.0 - cos(v, center._2)
        if (!mind.contains(i) || d < mind(i)) mind(i) = d
      }
      // argmax, ties to the lower id
      val (fid, fd) = mind.toSeq.map { case (i, d) => (i, d) }
        .maxBy { case (i, d) => (d, -i) }
      val row = (k.toLong, center._1, fd)
      center = vecs.find(_._1 == fid).get
      row
    }
    assert(got == expected, s"coreset diverges:\n got $got\n exp $expected")
    // coverage radius never increases as centers are added
    assert(got.map(_._3).sliding(2).forall(w => w(1) <= w(0)))
    assert(got.map(_._2).distinct.size == got.size, "a center repeated")
  }

  test("proto_prune equals the serial integer twin; keep law holds per cluster") {
    import operators.Clustering.{ProtoKeepPct, ProtoLattice}
    val got = operators.Clustering.protoPrune(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    // serial twin: same lattice, same truncating centroid mean
    val raw = Tables(spark, sf).embeddings
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label").cast("long"),
        col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray.map(x => math.floor(x * ProtoLattice + 0.5).toLong)))
    val expected = raw.groupBy(_._2).toSeq.flatMap { case (label, members) =>
      val n = members.length.toLong
      val dims = members.head._3.length
      val cent = Array.tabulate(dims) { d =>
        members.map(_._3(d)).sum / n // Scala / on Long truncates, same as div
      }
      val keepN = (ProtoKeepPct * n + 99) / 100
      members.map { case (id, _, q) =>
        val dist2 = q.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
        (id, dist2)
      }.sortBy { case (id, d2) => (-d2, id) }.zipWithIndex.map {
        case ((id, d2), i) =>
          (id, label, d2, i + 1L, if (i + 1L <= keepN) 1L else 0L)
      }
    }.sortBy(_._1)
    assert(got == expected, "proto_prune diverges from the serial twin")
    // keep law: each cluster retains exactly ceil(pct·n/100) members
    got.groupBy(_._2).foreach { case (label, g) =>
      val kept = g.count(_._5 == 1L)
      assert(kept == (ProtoKeepPct * g.size + 99) / 100, s"label $label kept $kept")
      // and the kept members are exactly the FARTHEST ones
      assert(g.filter(_._5 == 1L).map(_._4).max <= g.filter(_._5 == 0L)
        .map(_._4).minOption.getOrElse(Long.MaxValue))
    }
  }

  test("emb_health equals an in-JVM lattice recompute and flags a planted dead dimension") {
    import spark.implicits._
    import operators.Clustering.EmbCollapseVarLattice
    // 3-dim fixture: dim 0 healthy, dim 1 COLLAPSED (constant 0.25),
    // dim 2 near-constant but above the variance floor
    val vecs: Seq[(Long, Seq[Double])] = (0L until 40L).map { i =>
      (i, Seq(math.sin(i.toDouble) * 2.0, 0.25, 0.5 + (i % 2) * 0.001))
    }
    val emb = vecs.toDF("vec_id", "v")
    val got = operators.Clustering.embHealthOn(emb).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // independent recompute on the same lattice
    val byDim = (0 until 3).map { d =>
      val ls = vecs.map { case (_, v) => math.floor(v(d) * 1000000d + 0.5d).toLong }
      val n = ls.size.toLong
      val sl = ls.map(BigInt(_)).sum
      val sl2 = ls.map(l => BigInt(l) * BigInt(l)).sum
      val collapsed =
        if (BigInt(n) * sl2 - sl * sl < BigInt(n) * BigInt(n) * EmbCollapseVarLattice) 1L else 0L
      d.toLong -> ((n, (sl / n).toLong, (sl2 / n).toLong, ls.min, ls.max, collapsed))
    }.toMap
    assert(got == byDim, s"got $got\nwant $byDim")
    assert(got(1L)._6 == 1L, "constant dimension must flag collapsed")
    assert(got(0L)._6 == 0L && got(2L)._6 == 0L,
      "healthy / above-floor dimensions must not flag")
    // registered entry runs on the real corpus with one row per dim
    val card = operators.Clustering.embHealth(spark, sf).collect()
    assert(card.length == 64 && card.map(_.getLong(0)).toSeq == (0L until 64L))
  }

  test("emb_drift equals an in-JVM lattice recompute and flags a planted mean shift") {
    import spark.implicits._
    import operators.Clustering.EmbDriftZ2
    // 3-dim fixture over the ann_incremental old/new split
    // (vec_id % 5 == 4 is the new batch): dim 0 stationary, dim 1
    // shifted by +0.5 in the new batch (must flag), dim 2 noisy but
    // unshifted (must not flag)
    val vecs: Seq[(Long, Seq[Double])] = (0L until 50L).map { i =>
      val isNew = i % 5 == 4
      (i, Seq(
        math.sin(i.toDouble),
        math.cos(i.toDouble) * 0.01 + (if (isNew) 0.5 else 0.0),
        math.sin(i.toDouble * 3.0) * 2.0))
    }
    val got = operators.Clustering.embDriftOn(vecs.toDF("vec_id", "v"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    val byDim = (0 until 3).map { d =>
      def side(p: Long => Boolean) =
        vecs.filter(t => p(t._1)).map { case (_, v) =>
          math.floor(v(d) * 1000000d + 0.5d).toLong
        }
      val (o, nw) = (side(_ % 5 != 4), side(_ % 5 == 4))
      val (no, nn) = (o.size.toLong, nw.size.toLong)
      val (slo, sln) = (o.map(BigInt(_)).sum, nw.map(BigInt(_)).sum)
      val sl2o = o.map(l => BigInt(l) * BigInt(l)).sum
      val mo = (slo / no).toLong; val mn = (sln / nn).toLong
      val varO = ((BigInt(no) * sl2o - slo * slo) / (BigInt(no) * BigInt(no))).toLong
      val shift = mn - mo
      val drifted = if (BigInt(shift) * BigInt(shift) * no * nn >
        BigInt(EmbDriftZ2) * varO * (no + nn)) 1L else 0L
      d.toLong -> ((no, nn, mo, mn, varO, shift, drifted))
    }.toMap
    assert(got == byDim, s"got $got\nwant $byDim")
    assert(got(1L)._7 == 1L, "planted mean shift must flag drifted")
    assert(got(0L)._7 == 0L && got(2L)._7 == 0L,
      "stationary dimensions must not flag")
    // registered entry: one row per dim on the real corpus
    val card = operators.Clustering.embDrift(spark, sf).collect()
    assert(card.length == 64 && card.map(_.getLong(0)).toSeq == (0L until 64L))
  }
}
