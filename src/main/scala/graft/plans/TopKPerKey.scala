package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator extension tier (logical plan + strategy + physical
  * operator, registered through [[GraftExtensions]]): bounded top-k
  * per key.
  *
  * The DataFrame idiom for "k best rows per key" —
  * `row_number().over(Window.partitionBy(key).orderBy(...)) <= k` —
  * shuffles EVERY row to the key's reducer and sorts whole partitions
  * before discarding all but k. At 100 TB (the ANN shortlist shape:
  * billions of scored candidates, k=64 per query) the shuffle and the
  * sort are the job. This operator is the aggregation-style plan
  * instead: a partial pass holds a k-bounded heap per key in each
  * input partition and emits at most k rows per (partition, key); the
  * exchange then moves only those survivors; a final pass merges heaps
  * per key. State is O(keys·k) per task, no partition ever sorts, and
  * the shuffle volume drops from n rows to ≤ partitions·keys·k.
  *
  * Semantics: the returned rows are exactly the first k of each key
  * under `order` (ties broken by the ordering itself — callers pass a
  * total order, e.g. score DESC + id ASC, for a deterministic set).
  * Row order WITHIN the result is unspecified, as with any aggregate.
  *
  * Memory envelope: the PARTIAL phase sees every key of its input
  * partition, so its state would be O(distinct-keys·k) unguarded. It
  * therefore flushes — emits the current heaps downstream and resets —
  * whenever the map reaches `spark.graft.topk.maxStateKeys` (default
  * 131072), trading a little extra shuffle volume (≤ one extra k-batch
  * per key per flush) for a hard state bound; correctness is unchanged
  * because the final phase re-merges per key. The FINAL phase cannot
  * flush early (it must see a key's every survivor before emitting k),
  * but its state is only O(keys-in-reducer·k) = distinct-keys/shuffle-
  * partitions · k, which the exchange already bounds.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topKPerKey requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner rule: one partial exec over the child's native partitioning,
  * one final exec requiring clustering on the keys —
  * EnsureRequirements inserts the hash exchange between them exactly
  * like a partial+final aggregate pair. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, finalPhase = false,
        planLater(child))
      TopKPerKeyExec(keys, order, k, finalPhase = true, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, finalPhase: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPhase) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
  override def nodeName: String =
    if (finalPhase) "TopKPerKeyFinal" else "TopKPerKeyPartial"

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val childOutput = child.output
    val numOutputRows = longMetric("numOutputRows")
    // partial-phase state bound: flush heaps downstream when the key
    // map reaches this size (final phase must aggregate fully per key)
    val maxStateKeys =
      conf.getConfString("spark.graft.topk.maxStateKeys", "131072").toInt
    val canFlush = !finalPhase
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val base = GenerateOrdering.generate(sortOrder, childOutput)
      // PriorityQueue dequeues its LARGEST element; under `base`
      // (sort order: "first" compares less) the largest is the worst
      // retained row, so popping on overflow keeps the k best
      val ord = new Ordering[UnsafeRow] {
        def compare(a: UnsafeRow, b: UnsafeRow): Int = base.compare(a, b)
      }
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      // `key` is the caller's keyProj output for `unsafe` — projected
      // once per row (the flush guard needs it too; projecting again
      // here would double key-projection work for every row once the
      // map sits at maxStateKeys)
      def insert(key: UnsafeRow, unsafe: UnsafeRow): Unit = {
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(unsafe.copy())
        else if (base.compare(unsafe, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(unsafe.copy())
        }
      }
      // materializing a flush is O(state) — the same order as the state
      // it replaces, which clear() then releases
      def flush(): Iterator[UnsafeRow] = {
        val a = heaps.valuesIterator.flatMap(_.iterator).toArray
        heaps.clear()
        a.iterator
      }
      new Iterator[InternalRow] {
        private var cur: Iterator[UnsafeRow] = Iterator.empty
        def hasNext: Boolean = {
          while (!cur.hasNext && (it.hasNext || heaps.nonEmpty)) {
            if (!it.hasNext) cur = flush()
            else {
              val unsafe = it.next().asInstanceOf[UnsafeRow]
              val key = keyProj(unsafe)
              if (canFlush && heaps.size >= maxStateKeys &&
                  !heaps.contains(key)) cur = flush()
              insert(key, unsafe)
            }
          }
          cur.hasNext
        }
        def next(): InternalRow = {
          numOutputRows += 1
          cur.next()
        }
      }
    }, preservesPartitioning = true)
  }
}
