package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.GraftColumnBridge

/** Native per-key top-k — the whole-operator extension tier (logical
  * node → planner strategy → physical operators). The naive
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` shuffles
  * EVERY row to its key's reducer before discarding all but k; Spark's
  * own InferWindowGroupLimit rescues exactly that rank-predicate
  * pattern with per-partition SORT + limit. This operator achieves the
  * same bounded shuffle (≤ k rows per key per input partition —
  * NativeTopKSpec measures parity on the clustering exchange) with
  * bounded HEAPS instead: O(n log k) per partition vs the sort's
  * O(n log n), no post-shuffle Window pass, and — being an operator
  * rather than a filter-pattern matcher — it applies to any k-per-key
  * selection a caller requests directly.
  *
  * Semantics: for each distinct key, the first k rows of that key's
  * group under `order` (ties broken by the order itself — pass a total
  * order for deterministic output, as with any top-k). Output rows are
  * unsorted across keys; add a presentation sort downstream.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical per-partition bounded-heap top-k. `partial = true` runs
  * map-side with no distribution requirement; `partial = false`
  * requires clustering by the keys (EnsureRequirements inserts the
  * hash exchange) and produces the exact per-key result from the
  * partial candidates.
  *
  * Memory bound, partial phase: caps its key map at
  * `spark.graft.topk.maxPartialKeys` (default 65536) keys per
  * partition — rows of keys beyond the cap pass through un-heaped
  * (they lose the map-side reduction, never correctness: the final
  * clustered phase re-selects exactly). Without the cap, a
  * high-keys-per-partition input would grow the map without limit —
  * Spark's own partial hash aggregates degrade similarly (they fall
  * back to sort-based passthrough); this is the same shape. The
  * partial is thus O(cap · k) rows of memory regardless of input.
  * A row already holding a heap keeps heaping past the cap, so the
  * reduction still applies to the (hot, by first-seen) resident keys.
  *
  * Memory bound, final phase: O(k) — it additionally declares
  * `requiredChildOrdering` on the keys, so EnsureRequirements plans a
  * SPILLABLE external sort under it, and the operator streams
  * key-contiguous input holding one k-bounded heap at a time. The
  * earlier form (a heap map over every key in the partition) was
  * bounded by output size but could not spill; this matches the
  * memory discipline of Spark's own sort-based aggregate final phase.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "GraftTopKPerKeyPartial" else "GraftTopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  // final phase: any ordering that makes equal keys contiguous lets it
  // stream with one heap of state; EnsureRequirements satisfies this
  // with an external (spillable) sort above the clustering exchange
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(k => SortOrder(k, Ascending)))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numPassThrough" -> SQLMetrics.createMetric(sparkContext,
      "rows passed through un-heaped (partial key cap reached)"),
    "numHeapKeys" -> SQLMetrics.createMetric(sparkContext,
      "heap keys held, summed over partitions"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val maxKeys =
      conf.getConfString("spark.graft.topk.maxPartialKeys", "65536").toInt
    val passMetric = longMetric("numPassThrough")
    val keysMetric = longMetric("numHeapKeys")
    if (partial) child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // "less" = earlier in the requested order; the queue dequeues the
      // WORST kept row first, so eviction is O(log k)
      val ord = RowOrdering.create(sortOrder, childOutput)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      // Lazily interleaved: rows either fold into a bounded heap (and
      // emit nothing now) or — new key past the cap — pass through
      // immediately, so cap overflow adds zero buffering.
      val passThrough = iter.filter { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kLocal) h += row.copy()
            else if (ord.compare(row, h.head) < 0) { h.dequeue(); h += row.copy() }
            false
          case None =>
            if (heaps.size >= maxKeys) { passMetric += 1; true }
            else {
              val h = mutable.PriorityQueue.empty[InternalRow](ord)
              h += row.copy()
              heaps.put(key.copy(), h)
              false
            }
        }
      }
      // ++ evaluates its right side only after passThrough drains, at
      // which point the heaps are complete
      passThrough ++ {
        keysMetric += heaps.size
        heaps.valuesIterator.flatMap(_.iterator)
      }
    }, preservesPartitioning = true)
    // Final phase: input is clustered AND key-sorted (see
    // requiredChildOrdering), so equal keys arrive contiguously and one
    // bounded heap at a time is the entire operator state — O(k) memory
    // no matter how many keys the partition holds; the memory-hungry
    // part of the job (ordering the partition) sits in the spillable
    // external sort below.
    else child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // NOT named `buffered`: inside the anonymous Iterator below that
      // name would resolve to the INHERITED Iterator.buffered method
      // (self-wrapping — infinite recursion), not this val
      val in = iter.buffered
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private def advance(): Unit =
          while (!out.hasNext && in.hasNext) {
            // keyProj reuses its result buffer — copy the group key once
            val groupKey = keyProj(in.head).copy()
            val heap = mutable.PriorityQueue.empty[InternalRow](ord)
            while (in.hasNext && keyProj(in.head) == groupKey) {
              val row = in.next()
              if (heap.size < kLocal) heap += row.copy()
              else if (ord.compare(row, heap.head) < 0) {
                heap.dequeue(); heap += row.copy()
              }
            }
            keysMetric += 1
            out = heap.iterator
          }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): InternalRow = { advance(); out.next() }
      }
    }, preservesPartitioning = true)
  }
}

/** Plans the logical node as final-over-partial, the aggregate-style
  * two-phase split.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** DataFrame surface: top `k` rows per `keyCols` group under
    * `orderCols` (use `.desc` / `.asc` columns; bare columns sort
    * ascending). Installs the planner strategy into the session on
    * first use.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    GraftColumnBridge.ensureStrategy(df.sparkSession, TopKPerKeyStrategy)
    val keys = keyCols.map(GraftColumnBridge.eagerExpression)
    val order = orderCols.map(c => GraftColumnBridge.eagerExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftColumnBridge.ofRows(df.sparkSession,
      TopKPerKey(keys, order, k, df.queryExecution.analyzed))
  }
}
