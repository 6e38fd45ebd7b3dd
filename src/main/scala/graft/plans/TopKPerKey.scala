package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator extension (SURVEY §4: custom LogicalPlan + Strategy
  * + SparkPlan, registered via SparkSessionExtensions): top-k rows
  * per key WITHOUT sorting.
  *
  * Spark's native plan for "top k per key" is a row_number window +
  * filter, which shuffles on the key and then FULLY SORTS every
  * partition — O(n log n) per partition and the whole partition
  * must fit the sorter. This operator keeps a bounded k-row heap per
  * key: O(n log k), constant memory per key, no sort buffer. At
  * 100 TB with millions of keys per partition that's the difference
  * between a spilling sort and a streaming pass.
  *
  * `dedupe` (optional) makes the heap ALSO collapse duplicate rows:
  * a row whose (key, dedupe) tuple is already in the heap is
  * skipped, and one whose twin was already EVICTED can never
  * re-enter (duplicates carry identical order values, so it compares
  * ≥ the heap head that beat its twin). CONTRACT: rows equal on
  * (keys ++ dedupe) must be fully identical rows — the caller's
  * duplicates must be true duplicates (LSH candidates colliding in
  * several tables: same (src, dst) ⇒ same deterministic cosine).
  * This turns "DISTINCT before top-k" into one ≤ k-entry set probe
  * per row: the r13 knn_graph measurement had a corpus-wide DISTINCT
  * spending ~4 s to remove 0.3 % duplicates at the 20× replica —
  * a nearly-all-unique hash aggregate is pure pass-through cost,
  * and at 100 TB it is a full extra shuffle of the candidate table.
  */
case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan,
    dedupe: Seq[Expression] = Nil) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    dedupe: Seq[Expression] = Nil) extends UnaryExecNode {
  import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

  override def output: Seq[Attribute] = child.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numKeys" -> SQLMetrics.createMetric(sparkContext, "distinct keys held in heaps"),
    "heapRows" -> SQLMetrics.createMetric(sparkContext, "peak rows held in heaps"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** Shuffle on the grouping key only — no sort requirement. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  /** Memory contract: a task holds at most k rows per distinct key it
    * sees — O(k × keys-per-partition) with NO spill path. That's the
    * operator's domain (small bounded k; a sort-based plan is the
    * right tool when k×keys approaches partition size). Three layers
    * enforce it: [[TopKPerKeyStrategy]] declines to the window form
    * when compile-time stats prove the violation; AQE's post-shuffle
    * re-optimization re-consults the strategy with REAL row counts
    * and swaps plans mid-query (both asserted in TopKPerKeySpec); and
    * this guard fails fast with an actionable message instead of
    * slowly dying in GC when neither saw it coming. The
    * `heapRows`/`numKeys` SQLMetrics expose the actual footprint.
    */
  def maxRowsPerPartition: Long =
    session.sessionState.conf
      .getConfString(TopKPerKeyExec.MaxRowsKey, "16000000").toLong

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val maxRows = maxRowsPerPartition
    val numKeys = longMetric("numKeys")
    val heapRows = longMetric("heapRows")
    val numOutputRows = longMetric("numOutputRows")
    val dedupeExprs = dedupe
    child.execute().mapPartitions { iter =>
      val ordering = RowOrdering.create(sortOrder, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // dedupe identity = (key, dedupe) so one set per partition
      // suffices (no per-heap allocation); only populated when the
      // caller opted in
      val dedupeProj =
        if (dedupeExprs.isEmpty) null
        else UnsafeProjection.create(keyExprs ++ dedupeExprs, childOutput)
      val inHeap =
        if (dedupeExprs.isEmpty) null
        else scala.collection.mutable.HashSet.empty[UnsafeRow]
      // identity projection to UnsafeRow: the shuffle inserted by
      // requiredChildDistribution usually delivers UnsafeRows already,
      // but a child that satisfies the distribution natively may emit
      // other InternalRow classes (e.g. columnar-to-row) — a blind
      // asInstanceOf would throw at runtime
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // max-heap under `ordering` so the worst of the current best-k
      // is at the head and can be evicted in O(log k); with dedupe,
      // heap entries are (row, its dedupe id) so an eviction can
      // release the id without re-projecting
      val heaps = scala.collection.mutable.HashMap.empty[
        UnsafeRow, scala.collection.mutable.PriorityQueue[(UnsafeRow, UnsafeRow)]]
      val pairOrdering = ordering.on[(UnsafeRow, UnsafeRow)](_._1)
      var held = 0L
      iter.foreach { row =>
        val ur = row match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        // in-heap duplicate: skip before touching the heap. A
        // duplicate whose twin was EVICTED is not in the set, but it
        // compares ≥ the head that beat its twin (identical order
        // values), so the insert path below rejects it — re-entry is
        // structurally impossible.
        val dk = if (dedupeProj == null) null else dedupeProj(ur)
        if (dk == null || !inHeap.contains(dk)) {
          val key = keyProj(ur)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              val h = scala.collection.mutable.PriorityQueue
                .empty[(UnsafeRow, UnsafeRow)](pairOrdering)
              heaps.put(key.copy(), h)
              h
          }
          if (heap.size < kLocal) {
            held += 1
            if (held > maxRows) throw new IllegalStateException(
              s"TopKPerKeyExec holds > $maxRows rows in one task " +
                s"(k=$kLocal × ${heaps.size} keys so far): repartition on more keys, " +
                s"lower k, use a sort-based plan, or raise ${TopKPerKeyExec.MaxRowsKey}")
            val dkc = if (dk == null) null else dk.copy()
            heap.enqueue((ur.copy(), dkc))
            if (dkc != null) inHeap.add(dkc)
          } else if (ordering.compare(ur, heap.head._1) < 0) {
            val evicted = heap.dequeue()
            if (evicted._2 != null) inHeap.remove(evicted._2)
            val dkc = if (dk == null) null else dk.copy()
            heap.enqueue((ur.copy(), dkc))
            if (dkc != null) inHeap.add(dkc)
          }
        }
      }
      numKeys += heaps.size
      heapRows += held
      numOutputRows += held
      // emit each key's rows in rank order (deterministic given a
      // total order in `order`)
      heaps.valuesIterator.flatMap { h =>
        val ranked: Seq[(UnsafeRow, UnsafeRow)] = h.dequeueAll
        ranked.reverseIterator.map(_._1)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Session conf key bounding rows a single task may hold. */
  val MaxRowsKey = "graft.topKPerKey.maxRowsPerPartition"

  val DefaultMaxRows = 16000000L
}

/** Planner strategy mapping the logical node to the exec node —
  * UNLESS the plan's own statistics say the heap contract can't
  * hold. A task holds up to k rows per distinct key; when the
  * estimated per-task footprint (k × distinct keys from CBO column
  * stats when present, else the known row count as the all-keys-
  * distinct worst case, spread over the shuffle partitions) exceeds
  * the [[TopKPerKeyExec.MaxRowsKey]] bound, the strategy plans the
  * SORT-BASED equivalent instead — a row_number window + filter,
  * which sorts but spills — rather than shipping a plan that would
  * fail its runtime guard. Estimate-free sources (parquet scans
  * without ANALYZE expose only sizeInBytes) keep the heap plan; the
  * runtime guard still backstops them.
  */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  import org.apache.spark.sql.catalyst.expressions.{Alias, CurrentRow, LessThanOrEqual, Literal, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window => LogicalWindow}
  import org.apache.spark.sql.internal.SQLConf

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child, dedupe) =>
      if (heapOverBudget(k, keys, child))
        planLater(windowForm(k, keys, order, child, dedupe)) :: Nil
      else TopKPerKeyExec(k, keys, order, planLater(child), dedupe) :: Nil
    case _ => Nil
  }

  private def heapOverBudget(k: Int, keys: Seq[Expression], child: LogicalPlan): Boolean = {
    val conf = SQLConf.get
    val maxRows = conf.getConfString(TopKPerKeyExec.MaxRowsKey,
      TopKPerKeyExec.DefaultMaxRows.toString).toLong
    val parts = math.max(1, conf.numShufflePartitions)
    val stats = child.stats
    val distinctKeys: Option[BigInt] = {
      val per = keys.map {
        case a: Attribute => stats.attributeStats.get(a).flatMap(_.distinctCount)
        case _ => None
      }
      if (per.nonEmpty && per.forall(_.isDefined)) Some(per.flatten.product) else None
    }
    val estHeld = distinctKeys.map(_ * k) // k rows per key…
      .map(e => stats.rowCount.fold(e)(_.min(e))) // …but never more than the input
      .orElse(stats.rowCount) // no column stats: all-distinct worst case
    estHeld.exists(_ / parts > maxRows)
  }

  /** The logical plan of the sort-based fallback: row_number over
    * (keys, order) ≤ k, projected back to the child's columns. With
    * `dedupe`, the child is first Distinct-ed — sound because the
    * dedupe contract requires duplicate (keys ++ dedupe) rows to be
    * FULLY identical, so whole-row dedup is exactly the heap's
    * skip-in-heap behavior.
    */
  private def windowForm(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
      child: LogicalPlan, dedupe: Seq[Expression] = Nil): LogicalPlan = {
    // the Aggregate form of Distinct directly: windowForm is invoked
    // from the STRATEGY (post-optimizer), where a logical Distinct
    // node would never be rewritten and the planner rejects it
    val base =
      if (dedupe.isEmpty) child
      else org.apache.spark.sql.catalyst.plans.logical.Aggregate(
        child.output, child.output, child)
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val rn = Alias(WindowExpression(RowNumber(), WindowSpecDefinition(keys, order, frame)), "__rank")()
    val win = LogicalWindow(Seq(rn), keys, order, base)
    Project(child.output, Filter(LessThanOrEqual(rn.toAttribute, Literal(k)), win))
  }
}

/** Injected optimizer rule (SparkSessionExtensions
  * injectOptimizerRule — the third Catalyst extension point next to
  * the engine's functions and planner strategy): COLUMN PRUNING
  * through [[TopKPerKey]]. Catalyst's own ColumnPruning only
  * understands built-in nodes — a custom operator is opaque to it,
  * so `topKPerKey(df, …).select(narrow)` would otherwise shuffle and
  * heap FULL-WIDTH rows and drop columns afterwards. This rule
  * rewrites Project-over-TopKPerKey to TopKPerKey-over-Project
  * (keeping key/order columns, re-projecting above), so the heap
  * holds only the surviving columns — at 100 TB, heap bytes and
  * shuffle bytes shrink by the pruned fraction. Runs to fixed point
  * inside the main operator-optimization batch; the
  * strictly-narrower guard makes it terminate.
  */
object ProjectThroughTopKPerKey
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, TopKPerKey(k, keys, order, child, dedupe))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      val needed = AttributeSet(projList.map(_.toAttribute)) ++
        AttributeSet(keys.flatMap(_.references)) ++
        AttributeSet(order.flatMap(_.references)) ++
        AttributeSet(dedupe.flatMap(_.references))
      if (needed.subsetOf(child.outputSet) && needed.size < child.output.size) {
        val narrowed = child.output.filter(needed.contains)
        Project(projList, TopKPerKey(k, keys, order, Project(narrowed, child), dedupe))
      } else p
  }
}

/** User-facing API. */
object TopK {
  /** Top `k` rows per `keys` group under `order` (use `.desc`/`.asc`
    * Columns; include tie-break columns for determinism). `dedupe`
    * opts into in-heap duplicate collapse — see [[TopKPerKey]]'s
    * contract: rows equal on (keys ++ dedupe) must be fully
    * identical rows.
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
      dedupe: Seq[Column] = Nil): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val keyExprs = keys.map(Bridge.catalystExpression)
    val sortOrders = order.map { c =>
      Bridge.catalystExpression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    Bridge.ofRows(df.sparkSession, TopKPerKey(k, keyExprs, sortOrders, analyzed,
      dedupe.map(Bridge.catalystExpression)))
  }
}
