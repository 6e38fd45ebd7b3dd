package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation (the SemDeDup
  * family: cluster the corpus, then prune semantic duplicates WITHIN
  * clusters — the trick that turns O(n²) semantic dedup into
  * O(Σ cellᵢ²) with cells sized to taste).
  */
object Clustering {

  /** Quantizer geometry. [[autoK]] sizes the cell count ≈
    * n/[[TargetCell]]: cells must hold enough neighbors that near-dup
    * pairs land together (a cell of ~2 vectors separates almost every
    * pair), but few enough that the within-cell quadratic term stays
    * cheap — CONSTANT cell size is what keeps Σ cellᵢ² linear in n.
    * [[MaxCells]] bounds only the DRIVER-side model footprint
    * (MaxCells×dim doubles ≈ 8 MB, broadcast-dimension class); a
    * production run raises it with driver memory. [[KmeansIters]]
    * belongs to [[kmeansCentroids]]/[[kmeansRefine]] (used by the
    * ann_ivf trained quantizer), NOT to semdedup: Lloyd at K ∝ n
    * costs n·K per round = quadratic, so semdedup's fine centroids
    * are a deterministic stride sample instead (the published
    * SemDeDup trains k-means on a bounded sample for the same
    * reason).
    */
  val MaxCells = 16384
  val KmeansIters = 2
  val TargetCell = 8

  /** Cell count for a corpus of n vectors: n/[[TargetCell]] within
    * [2, [[MaxCells]]]. Deterministic in n, so the operator stays
    * reproducible at every SF. K grows WITH the corpus — a fixed K
    * (the pre-round-5 cap of 32) makes cell sizes, and with them the
    * within-cell pairwise pass, grow linearly: measured 36× time at
    * 20× data. With K ∝ n and IVF-routed assignment
    * ([[graft.functions.TwoLevelCellId]]) both the assignment and
    * the pairwise term are linear in n.
    */
  def autoK(n: Long): Int =
    math.max(2L, math.min(MaxCells.toLong, n / TargetCell)).toInt

  /** Same near-dup threshold as dedup_embedding, so the two
    * operators' outputs are directly comparable (asserted in
    * ClusteringSpec).
    */
  val SemThreshold = 0.4

  /** Lattice scale of the Lloyd means: coordinates quantize to
    * `floor(x·10⁶ + 0.5)` before summing, means are integer division
    * (truncating toward zero on both engines), and the centroid
    * coordinate is `latMean / 10⁶` — one correctly-rounded double
    * division of a ≪ 2⁵³ integer. Round 11, the oracle-promotion
    * move: the former DECIMAL(28,18) means were partitioning-exact
    * but NOT cross-engine replicable — Spark's double→decimal cast
    * goes through Java's shortest-string conversion while the
    * oracle engine rounds the binary expansion, so scale-18 digits
    * disagree; every step of the lattice form is arithmetic both
    * engines define identically. Recall impact of a 10⁻⁶ grid on
    * O(1)-magnitude centroids is nil (DedupAnnSpec floors unchanged).
    */
  val KmLatScale = 1000000L

  /** Deterministic Lloyd k-means over an embedding frame
    * ((vec_id, v: array<double>), nulls already dropped).
    *
    * Deterministic at ANY parallelism: init is the first K vectors by
    * vec_id (bounded TakeOrdered); assignment is the map-side
    * [[graft.functions.NearestCentroids]] expression (cosine, ties to
    * the lower centroid id); and the per-cell means accumulate as
    * [[KmLatScale]]-lattice INTEGERS — integer addition is
    * associative and commutative where double addition is not, so
    * the means (and every downstream assignment) are bit-identical
    * however Spark partitions the corpus (asserted under repartition
    * in ClusteringSpec) AND bit-replicable by the DuckDB oracle.
    * Per round the driver sees K×dim aggregated rows — model-sized,
    * never corpus-sized.
    *
    * Empty cells keep their previous centroid (the standard Lloyd
    * convention that avoids dead-centroid NaNs).
    */
  private[graft] def kmeansCentroids(
      emb: DataFrame, k: Int, iters: Int): (Seq[Long], Seq[Seq[Double]]) = {
    val init = emb.orderBy(col("vec_id")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0)).toSeq
    (init.indices.map(_.toLong), kmeansRefine(emb, init, iters))
  }

  /** The Lloyd loop of [[kmeansCentroids]] from a CALLER-SUPPLIED
    * init (same determinism guarantees) — lets a quantizer refine an
    * existing centroid set (ann_ivf's trained flag refines its stride
    * sample in place, keeping the cell count identical so the recall
    * comparison isolates training, not geometry).
    */
  private[graft] def kmeansRefine(
      emb: DataFrame, init: Seq[Seq[Double]], iters: Int): Seq[Seq[Double]] = {
    val ids: Seq[Long] = init.indices.map(_.toLong)
    var cvecs: Seq[Seq[Double]] = init
    for (_ <- 0 until iters) {
      val sums = emb
        .withColumn("cid", element_at(nearestCentroids(col("v"), ids, cvecs, 1), 1))
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(floor(col("x") * KmLatScale + 0.5).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cvecs.map(_.toArray).toArray
      sums.groupBy(_.getLong(0)).foreach { case (cid, rows) =>
        val dim = rows.map(_.getInt(1)).max + 1
        val mean = new Array[Double](dim)
        rows.foreach { r =>
          // truncating integer division (both engines' div), then ONE
          // correctly-rounded double division by the lattice scale
          mean(r.getInt(1)) = (r.getLong(2) / r.getLong(3)).toDouble / KmLatScale
        }
        next(cid.toInt) = mean
      }
      cvecs = next.map(_.toSeq).toSeq
    }
    cvecs
  }

  /** semdedup — SemDeDup-style semantic deduplication: quantize the
    * embedding space into ≈ n/[[TargetCell]] cells, then within each
    * cell drop every vector that has a higher-similarity (cosine ≥
    * [[SemThreshold]]) partner with a LOWER vec_id in the same cell.
    * Output is one row per vector: its cell and its keep flag — the
    * keep-list a curation pipeline feeds the tokenizer.
    *
    * Scale shape (round-5 rework): K grows with the corpus so cell
    * size stays ≈ [[TargetCell]] — the within-cell pairwise join is
    * then n·TargetCell/2 rows, LINEAR in n (a fixed K was measured
    * 36× at 20× data: cells grow linearly and Σ cellᵢ² goes
    * quadratic). Assignment at K ∝ n cannot afford a flat O(K)
    * argmax per vector (that is n·K = quadratic again), so it routes
    * through [[graft.functions.TwoLevelCellId]] — ⌈√K⌉ coarse
    * centroids, nprobe=2 buckets, O(√K) per vector — IVF's own trick
    * applied to the assignment. Fine centroids are a deterministic
    * stride sample (Lloyd at K ∝ n would cost n·K per round; the
    * published SemDeDup trains on a bounded sample for the same
    * reason). Both passes stay one shuffle + map-side expressions.
    * Measured at the 20× replica corpus: slope 7.5 vs linear limit
    * 20 (was 36.2 with fixed K). Rows-only (cell boundaries make it approximate vs the exact
    * all-pairs operator; the containment + recall relation to
    * dedup_embedding is asserted in ClusteringSpec).
    */
  def semdedup(spark: SparkSession, dir: String): DataFrame =
    semdedupOn(Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))

  private[graft] def semdedupOn(embIn: DataFrame): DataFrame = {
    val emb = embIn.filter(col("v").isNotNull)
    // one metadata-sized count sizes the cell grid (dedup_embedding's
    // autoBlocks pattern)
    val n = emb.count()
    val k = autoK(n)
    // fine centroids: deterministic stride sample — every
    // ⌈n/K⌉-th vec_id, so every region of the corpus (and of a
    // replicated corpus's every replica) contributes centroids. The
    // collect is K×dim doubles, the bounded model footprint; a
    // first-K-ids sample would concentrate all centroids in one id
    // range and degenerate cells elsewhere.
    val stride = math.max(TargetCell.toLong, math.ceil(n.toDouble / k).toLong)
    val sampled = emb.filter(col("vec_id") % stride === 0)
      .orderBy(col("vec_id")).select(col("v"))
      .collect().map(_.getSeq[Double](0)).toIndexedSeq
    val fine: Seq[Seq[Double]] =
      if (sampled.nonEmpty) sampled
      else emb.orderBy(col("vec_id")).limit(1).select(col("v"))
        .collect().map(_.getSeq[Double](0)).toIndexedSeq
    // coarse routing level: every ⌈√K⌉-th fine centroid (a SUBSET of
    // fine, so no coarse bucket is empty — each coarse's own fine
    // maps to itself at cosine 1)
    val (coarse, owners) = coarseRouting(fine)
    val cells = emb.withColumn("cluster_id",
      twoLevelCellId(col("v"), coarse, fine, owners, 2))
    // same rounding as dedup_embedding so thresholds bite identically
    val dupped = cells.as("a").join(cells.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(cosineSim(col("a.v"), col("b.v")), 4))
      .filter(col("cos") >= SemThreshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    cells.join(dupped.withColumn("dup", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        (coalesce(col("dup"), lit(0L)) === 0).cast("long").as("keep"))
      .orderBy(col("vec_id"))
  }

  /** The two-level routing model over a fine centroid set, shared by
    * [[semdedupOn]] and the IVF quantizer's corpus-proportional
    * assignment path ([[SimilaritySearch.ivfCellId]]): coarse = every
    * ⌈√K⌉-th fine centroid (a SUBSET of fine, so no coarse bucket is
    * ever empty — each coarse's own fine maps to itself at cosine 1),
    * owners(j) = the nearest coarse of fine centroid j by the same
    * cosine/tie rules the executors use. Driver-side K·√K flops —
    * model-sized, never corpus work.
    */
  private[graft] def coarseRouting(
      fine: Seq[Seq[Double]]): (Seq[Seq[Double]], Seq[Int]) = {
    val cStep = math.max(1, math.ceil(math.sqrt(fine.size.toDouble)).toInt)
    val coarseIdx = fine.indices.by(cStep).toArray
    val coarse: Seq[Seq[Double]] = coarseIdx.map(fine).toIndexedSeq
    def cosD(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      val len = math.min(a.length, b.length)
      var i = 0
      while (i < len) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val owners: Seq[Int] = fine.map { f =>
      var best = 0; var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < coarse.length) {
        val s = cosD(f, coarse(c))
        if (java.lang.Double.compare(s, bestSim) > 0) { best = c; bestSim = s }
        c += 1
      }
      best
    }
    (coarse, owners)
  }

  /** emb_pca lattice scale, iteration budget, component count, and
    * the embeddings-table dimensionality.
    */
  val PcaScale = 1000.0
  val PcaIters = 100
  val PcaComponents = 2
  val PcaDim = 64

  /** emb_pca — top principal components of the embedding corpus (the
    * whitening / compression / drift-axis primitive an embedding
    * pipeline runs before indexing): ONE distributed pass
    * accumulates the integer-lattice scatter matrix
    * ([[graft.functions.ScatterAgg]] — d²+d+1 longs, the
    * kilobyte-summary class: the corpus never shuffles, mergeable
    * buffers do), then the d×d covariance eigendecomposes on the
    * DRIVER by deflated power iteration — the standard
    * Gram-matrix-then-local-eigen design (computing eigenvectors
    * distributed would shuffle n×d rows per iteration to improve a
    * 32 KB matrix). Integer scatter sums are order-independent, and
    * the driver arithmetic runs in one fixed sequence — the output
    * is bit-deterministic at any parallelism (spec-asserted under
    * repartition(7)).
    *
    * Output: one row per component — eigenvalue (x-units),
    * explained-variance ppm against the covariance trace, and the
    * unit eigenvector (round-6, comma-joined — the vec_quant string
    * convention). Oracle-pass (round-12 promotion, previously
    * rows-only): the scatter sums are order-free BIGINT lattice
    * aggregates, and the driver eigensolve runs ONE fixed sequence
    * of double ops — so the DuckDB oracle replays the whole thing
    * (2 components × [[PcaIters]] unrolled power-iteration CTEs over
    * the covariance list-of-lists; `list_sum` is the same left fold
    * as Scala's `foldLeft`/`Seq.sum`, so eigenvalues hash
    * bit-exactly). ClusteringSpec additionally checks the eigenpair
    * residuals, orthogonality, ordering, and exact equality with an
    * independent in-JVM reference.
    */
  def embPca(spark: SparkSession, dir: String): DataFrame =
    embPcaOn(Tables(spark, dir).embeddings
      .select(col("embedding").cast("array<double>").as("v")))

  private[graft] def embPcaOn(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    val dim = PcaDim
    val rows = emb.filter(col("v").isNotNull)
      .agg(graft.functions.ScatterAgg.scatter(col("v"), dim, PcaScale).as("s"))
      .head().getSeq[Long](0).toArray
    val comps = pcaFromScatter(rows, dim)
    comps.zipWithIndex.map { case ((eig, expPpm, vec), i) =>
      (i + 1L, eig, expPpm, vec.map(x => f"$x%.6f").mkString(","))
    }.toSeq.toDF("component", "eigenvalue", "explained_ppm", "eigvec")
      .orderBy(col("component"))
  }

  /** Driver-side deflated power iteration over the integer scatter
    * buffer (shared math for the operator; the spec re-implements it
    * independently). Returns (eigenvalue in x-units, explained ppm,
    * unit eigenvector) per component.
    */
  private[graft] def pcaFromScatter(buf: Array[Long], dim: Int)
      : Seq[(Double, Long, Array[Double])] = {
    val n = buf(dim * dim + dim)
    if (n == 0) return Seq.empty
    // covariance in q-units: C = S/n − μμᵀ
    val mu = Array.tabulate(dim)(i => buf(dim * dim + i).toDouble / n)
    val c = Array.tabulate(dim, dim)((i, j) =>
      buf(i * dim + j).toDouble / n - mu(i) * mu(j))
    val trace = (0 until dim).map(i => c(i)(i)).sum
    val out = Seq.newBuilder[(Double, Long, Array[Double])]
    for (_ <- 1 to PcaComponents) {
      // deterministic start: the largest-diagonal axis (ties → low index)
      var start = 0
      for (i <- 1 until dim) if (c(i)(i) > c(start)(start)) start = i
      var v = Array.tabulate(dim)(i => if (i == start) 1.0 else 0.0)
      for (_ <- 1 to PcaIters) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).foldLeft(0.0)((acc, j) => acc + c(i)(j) * v(j)))
        val norm = math.sqrt(w.map(x => x * x).sum)
        v = if (norm > 0) w.map(_ / norm) else v
      }
      val lambda = (0 until dim).foldLeft(0.0) { (acc, i) =>
        acc + v(i) * (0 until dim).foldLeft(0.0)((a, j) => a + c(i)(j) * v(j))
      }
      // canonical sign: first nonzero coordinate positive
      val flip = v.find(math.abs(_) > 1e-12).exists(_ < 0)
      val vc = if (flip) v.map(-_) else v
      val expPpm = if (trace > 0) (lambda * 1e6 / trace).toLong else 0L
      out += ((lambda / (PcaScale * PcaScale), expPpm, vc))
      // deflate: C ← C − λ v vᵀ
      for (i <- 0 until dim; j <- 0 until dim)
        c(i)(j) -= lambda * vc(i) * vc(j)
    }
    out.result()
  }

  /** Centers selected by [[coresetSelect]]. */
  val CoresetK = 8

  /** coreset_select — greedy k-center (farthest-point) DIVERSITY
    * selection over the embedding corpus: pick the vector farthest
    * (cosine distance 1 − cos) from everything chosen so far, K
    * times — the classic 2-approximation to the k-center objective
    * and the standard "maximally diverse subset" seed for data
    * selection / active learning (the complement of semdedup, which
    * REMOVES the similar; this KEEPS the spread). Emits each center
    * with the corpus coverage radius after its addition — the
    * decreasing curve a team reads to pick K.
    *
    * Scale shape: K driver rounds (K is a small constant), each ONE
    * map-side distance update against the newest center (a broadcast
    * literal — model-sized) + ONE 1-row argmax scalar
    * (max-of-struct, the convergence-scalar allowlist class). The
    * iterating frame re-materializes per round (the pagerank lazy
    * localCheckpoint convention) so lineage stays flat and the K²/2
    * recompute tax never appears. No pairwise term exists anywhere —
    * this is THE k-center formulation that works when n² doesn't.
    *
    * Determinism: distances are pure per-row float expressions of
    * (v, chosen literals) — partitioning-independent; argmax ties
    * break to the LOWER vec_id via max(struct(dist, −vec_id)).
    * Rows-only class (float distances have no stable cross-engine
    * lattice); ClusteringSpec pins the exact in-JVM twin.
    */
  def coresetSelect(spark: SparkSession, dir: String): DataFrame =
    coresetSelectOn(Tables(spark, dir).embeddings
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))

  private[graft] def coresetSelectOn(embIn: DataFrame): DataFrame = {
    val spark = embIn.sparkSession
    import spark.implicits._
    val seedRows = embIn.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("v")).collect()
    if (seedRows.isEmpty)
      return Seq.empty[(Long, Long, Double)].toDF("k", "vec_id", "radius")
    val picks = Seq.newBuilder[(Long, Long, Double)]
    var (id, vec) = (seedRows(0).getLong(0), seedRows(0).getSeq[Double](1))
    var state = graft.Materialize.round(embIn
      .withColumn("mind", lit(1.0) - cosineSim(col("v"), typedLit(vec))))
    for (k <- 0 until CoresetK) {
      // lazy per-round checkpoint (the pagerank convention): the
      // round's own argmax action materializes it, lineage stays flat
      if (k > 0) state = graft.Materialize.round(state
        .withColumn("mind", least(col("mind"),
          lit(1.0) - cosineSim(col("v"), typedLit(vec)))))
      val far = state
        .agg(max(struct(col("mind"), (-col("vec_id")).as("nid"))).as("m"))
        .select(col("m.mind"), col("m.nid")).head()
      picks += ((k.toLong, id, far.getDouble(0)))
      if (k < CoresetK - 1) {
        id = -far.getLong(1)
        vec = embIn.filter(col("vec_id") === id)
          .select(col("v")).head().getSeq[Double](0)
      }
    }
    picks.result().toDF("k", "vec_id", "radius")
  }

  /** Integer lattice for [[protoPrune]]'s quantized geometry — the
    * pq_codes lattice (×10⁴ floor-rounded), fine enough that the
    * prototypicality ORDER matches the float order everywhere the
    * float order is stable, coarse enough that every distance is an
    * exact BIGINT both engines compute identically.
    */
  val ProtoLattice = 10000

  /** Keep fraction for [[protoPrune]], in percent: the hardest 70%
    * of each cluster survives (the published SSL-prototypes sweet
    * spot is 70-80% at LAION scale; a deployment tunes this).
    */
  val ProtoKeepPct = 70

  /** proto_prune — prototypicality pruning (the "SSL prototypes"
    * selection rule from the Beyond-Neural-Scaling-Laws line of
    * work): rank every vector by its distance to its cluster
    * centroid and DROP the most prototypical (closest) tail — easy,
    * redundant examples teach a model least, so pruning them beats
    * random subsampling at equal token budget. The complement of
    * [[coresetSelect]] (which picks a tiny diverse seed set): this
    * grades the WHOLE corpus and keeps the hard majority.
    *
    * Uses the embeddings table's label column as the cluster
    * assignment (the curated-cluster artifact a production run
    * materializes once — cluster_stats consumes the same contract,
    * and that contract makes the label vocabulary METADATA: the
    * centroid/offset tables below are labels-sized and broadcast).
    * Exactness: vectors quantize to the ×10⁴ integer lattice; the
    * per-label centroid is the elementwise TRUNCATING integer mean
    * (`div` here ≡ DuckDB `//` — both truncate toward zero, the
    * ts_seasonal alignment rule); dist² is an exact integer
    * zip-fold. No float crosses the engine boundary.
    *
    * Scale shape: ONE explode → (label, dim)-keyed partial-aggregated
    * sum (map-side combine collapses n×d rows to |labels|×d before
    * the shuffle), centroids re-assembled per label and BROADCAST
    * back, then a map-side zip-fold distance. The per-label rank is
    * [[graft.plans.TwoLevelRank]], never `Window.partitionBy(label)`
    * alone — label cardinality is a property of the upstream
    * clustering, and a coarse labeling would put corpus/|labels|
    * rows on single tasks (the shard_balance bounded-key hazard).
    * The distance card (3 longs/row) materializes once inside the
    * helper for its two consumers (range pass, rank pass).
    */
  def protoPrune(spark: SparkSession, dir: String): DataFrame =
    protoPruneOn(Tables(spark, dir).embeddings)

  private[graft] def protoPruneOn(emb: DataFrame): DataFrame = {
    import graft.Materialize.MatOps
    val spark = emb.sparkSession
    val q = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $ProtoLattice + 0.5d) AS BIGINT))")
          .as("q"))
    val x = q.select(col("vec_id"), col("label"),
      posexplode(col("q")).as(Seq("d", "qd")))
    val cent = x.groupBy(col("label"), col("d"))
      .agg(sum(col("qd")).as("s"), count(lit(1)).as("n"))
      .withColumn("cd", expr("s div n"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(d, cd))), p -> p.cd)")
        .as("c"), max(col("n")).as("n"))
    if (cent.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("vec_id", "label", "dist2", "rnk", "kept")
    }
    val dist = q.join(broadcast(cent), "label")
      .withColumn("dist2",
        expr("aggregate(zip_with(q, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"))
      .select(col("vec_id"), col("label"), col("n"), col("dist2"))
    graft.plans.TwoLevelRank.rowNumberPerKey(dist,
        keys = Seq("label"), value = "dist2",
        descending = true, ties = Seq("vec_id"), out = "rnk")
      .withColumn("kept",
        (col("rnk") <= expr(s"($ProtoKeepPct * n + 99) div 100")).cast("long"))
      .select(col("vec_id"), col("label"), col("dist2"), col("rnk"), col("kept"))
      .orderBy(col("vec_id"))
  }

  /** Collapse threshold for [[embHealth]]: a dimension whose
    * variance (on the 10⁻⁶ lattice, so units of 10⁻¹² of the raw
    * scale) falls below this is carrying ~no information. 100 lattice
    * units² ≈ a raw standard deviation of 10⁻⁵ — far below any
    * healthy embedding dimension, far above float noise.
    */
  val EmbCollapseVarLattice = 100L

  /** emb_health — the embedding-space HEALTH card (the QA pass a
    * team runs before trusting a new embedding dump: a fine-tuned or
    * truncated encoder often ships dimensions that have COLLAPSED to
    * a constant — dead capacity that silently degrades every
    * downstream ANN/dedup/clustering operator): one row per
    * dimension with vector count, mean and mean-square on the exact
    * 10⁻⁶ lattice, the min/max lattice values, and the collapsed
    * flag (population variance below [[EmbCollapseVarLattice]]).
    * Reading the card: collapsed=1 rows are dead dimensions;
    * |mean_ppm| far from 0 on many rows means the dump was not
    * centered; a max-min span near 0 with collapsed=0 localizes
    * near-constant dimensions the variance threshold just misses.
    *
    * Exactness: every value lands on the lattice first
    * (l = floor(x·10⁶ + 0.5), the PQ convention — identical IEEE
    * double ops both engines), and all aggregation is 64-bit integer
    * (sums fit: |l| ≤ ~10⁷ at |x| ≤ 10, squares ≤ 10¹⁴, corpus sums
    * ≤ 10¹⁴·n — DECIMAL(38) guards the variance cross-term n·Σl² −
    * (Σl)², which does overflow int64). Truncating integer `div`
    * matches both engines.
    *
    * Scale shape: ONE map-side explode (dim, lattice) pass — 64 rows
    * per vector, constant factor — into a 64-group map-side-
    * combinable aggregation; the card is dim rows. No shuffle wider
    * than the 64-key agg at any corpus size.
    */
  def embHealth(spark: SparkSession, dir: String): DataFrame =
    embHealthOn(Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))

  /** Drift-flag strength for [[embDrift]]: a dimension flags when the
    * two-sample mean shift clears a z ≈ 3 test against the OLD
    * snapshot's variance — `shift²·n_old·n_new >
    * [[EmbDriftZ2]]·var_old·(n_old + n_new)`, the standard two-sample
    * z² inequality cleared of square roots and divisions so it runs
    * as one EXACT integer comparison.
    */
  val EmbDriftZ2 = 9L

  /** emb_drift — the embedding snapshot DRIFT card (the monitoring
    * pass between [[embHealth]]'s one-snapshot QA and
    * ann_incremental's cell-growth card: an encoder upgrade or a
    * shifted corpus moves the embedding DISTRIBUTION, and an IVF/LSH
    * index built on yesterday's geometry silently degrades — this
    * card says WHICH dimensions moved before anyone pays for a
    * rebuild): per dimension, old-snapshot vs new-batch counts
    * (the ann_incremental vec_id % 5 split), exact lattice means,
    * the mean shift, the old variance, and the drifted flag
    * ([[EmbDriftZ2]]).
    *
    * Exactness: the emb_health discipline end to end — values land
    * on the 10⁻⁶ lattice first, all aggregation is integer
    * (DECIMAL(38) where cross-terms outgrow int64), means and
    * variance use truncating `div`, and the flag is a pure integer
    * product comparison. Oracle replays every step.
    *
    * Scale shape: ONE map-side explode pass (dim, lattice) into ONE
    * dim-keyed map-side-combinable aggregation carrying both sides as
    * conditional sums — one corpus scan, one Exchange, 64 keys. No
    * shuffle wider than the dim agg at any corpus size.
    */
  def embDrift(spark: SparkSession, dir: String): DataFrame =
    embDriftOn(Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))

  private[graft] def embDriftOn(emb: DataFrame): DataFrame = {
    val lat = emb.filter(col("v").isNotNull)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        floor(col("x") * 1000000d + 0.5d).cast("long").as("l"))
    // ONE dim-keyed pass with conditional sums (r11 VERDICT: two
    // separately-filtered aggregations scanned + exploded the corpus
    // twice) — a side with no rows yields NULL sums, exactly what the
    // old full-outer join produced, so every CASE below is unchanged
    val isNew = col("vec_id") % 5 === 4
    def sums(p: Column, tag: String): Seq[Column] = Seq(
      sum(when(p, 1L)).as(s"n_$tag"),
      sum(when(p, expr("CAST(l AS DECIMAL(38,0))"))).as(s"sl_$tag"),
      sum(when(p, expr("CAST(l AS DECIMAL(38,0)) * CAST(l AS DECIMAL(38,0))")))
        .as(s"sl2_$tag"))
    val both = sums(!isNew, "old") ++ sums(isNew, "new")
    lat.groupBy(col("dim")).agg(both.head, both.tail: _*)
      .select(col("dim"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        expr("CASE WHEN n_old IS NULL OR n_old = 0 THEN 0L " +
          "ELSE CAST(sl_old div n_old AS BIGINT) END").as("mean_old_ppm"),
        expr("CASE WHEN n_new IS NULL OR n_new = 0 THEN 0L " +
          "ELSE CAST(sl_new div n_new AS BIGINT) END").as("mean_new_ppm"),
        // old POPULATION variance in lattice² units, truncating div
        expr("CASE WHEN n_old IS NULL OR n_old = 0 THEN 0L " +
          "ELSE CAST((CAST(n_old AS DECIMAL(38,0)) * sl2_old - sl_old * sl_old) " +
          "div (CAST(n_old AS DECIMAL(38,0)) * CAST(n_old AS DECIMAL(38,0))) " +
          "AS BIGINT) END").as("var_old_ppm2"))
      .withColumn("shift_ppm", col("mean_new_ppm") - col("mean_old_ppm"))
      // the z² ≥ EmbDriftZ2 two-sample test as an exact integer
      // product comparison (no sqrt, no division — the flag can never
      // drift across engines); both sides must be populated
      .withColumn("drifted",
        expr(s"""CAST(n_old > 0 AND n_new > 0 AND
                |  CAST(shift_ppm AS DECIMAL(38,0)) * CAST(shift_ppm AS DECIMAL(38,0))
                |    * CAST(n_old AS DECIMAL(38,0)) * CAST(n_new AS DECIMAL(38,0))
                |  > CAST($EmbDriftZ2 AS DECIMAL(38,0))
                |    * CAST(var_old_ppm2 AS DECIMAL(38,0))
                |    * (CAST(n_old AS DECIMAL(38,0)) + CAST(n_new AS DECIMAL(38,0)))
                |  AS BIGINT)""".stripMargin))
      .orderBy(col("dim"))
  }

  private[graft] def embHealthOn(emb: DataFrame): DataFrame =
    emb.filter(col("v").isNotNull)
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        floor(col("x") * 1000000d + 0.5d).cast("long").as("l"))
      .groupBy(col("dim"))
      // DECIMAL(38,0) sums from the start: Σl² is ~10¹⁴ per vector
      // pair of digits — int64 dies near 10⁵ vectors per dimension
      // at full lattice range, and 100 TB is 10¹² (the sample_mixture
      // lesson). The per-row cast is free next to the explode.
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("CAST(l AS DECIMAL(38,0))")).as("sl"),
        sum(expr("CAST(l AS DECIMAL(38,0)) * CAST(l AS DECIMAL(38,0))")).as("sl2"),
        min(col("l")).as("min_ppm"),
        max(col("l")).as("max_ppm"))
      .select(col("dim"), col("n_vecs"),
        expr("CAST(sl div n_vecs AS BIGINT)").as("mean_ppm"),
        expr("CAST(sl2 div n_vecs AS BIGINT)").as("msq_ppm2"),
        col("min_ppm"), col("max_ppm"),
        // population variance · n²: n·Σl² − (Σl)², DECIMAL(38) exact
        expr(s"""CAST(CAST(n_vecs AS DECIMAL(38,0)) * sl2 - sl * sl
                |  < CAST(n_vecs AS DECIMAL(38,0)) * CAST(n_vecs AS DECIMAL(38,0))
                |    * $EmbCollapseVarLattice AS BIGINT)""".stripMargin)
          .as("collapsed"))
      .orderBy(col("dim"))
}
