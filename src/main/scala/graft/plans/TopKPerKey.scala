package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom Catalyst path (SURVEY.md §7.3 level (c)): top-k
  * rows per key without a window.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(o))
  * ≤ k`) must fully SORT every key partition — O(n log n) comparisons and
  * a complete materialized sort per partition — then throws away all but k
  * rows. This operator keeps a bounded k-element heap per key:
  * O(n log k), memory O(#keys·k), no sort buffer. At 100 TB with heavy
  * keys, that is the difference between spilling sorts and a streaming
  * pass. (The win is algorithmic, not expressible by composing built-ins —
  * hence a physical operator, not an expression.)
  *
  * Plumbing: [[TopKPerKey]] (logical) → [[TopKPerKeyStrategy]] (planner) →
  * [[TopKPerKeyExec]] (physical; declares `ClusteredDistribution` on the
  * key so EnsureRequirements inserts the one needed hash exchange).
  * Registered via [[GraftExtensions]] or
  * `spark.experimental.extraStrategies`.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                      child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      // two-phase, like partial/final hash aggregation: the partial node
      // shrinks every input partition to ≤ #keys·k rows BEFORE the
      // exchange the final node's distribution requirement inserts — at
      // cluster scale the shuffle carries k rows per key per mapper
      // instead of the whole table
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val isPartial = partial
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = RowOrdering.create(sortOrder, childOutput)
      // max-heap on the ordering: head = worst retained row per key
      val heapOrd: Ordering[InternalRow] = (a, b) => ordering.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var rows = 0L
      var abandoned = false
      while (iter.hasNext && !abandoned) {
        val row = iter.next()
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](heapOrd))
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
        rows += 1
        // adaptive fallback (partial phase only, same idea as Spark's
        // partial-aggregation skip): when distinct keys track the row
        // count, the map-side pass reduces nothing — stop buffering and
        // stream the rest through; the final phase is still correct
        if (isPartial && rows >= 8192 && heaps.size * 2L > rows) abandoned = true
      }
      val buffered = heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
      if (abandoned) buffered ++ iter else buffered
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** DataFrame-level API. `order` is a list of (columnName, descending)
  * pairs and must form a TOTAL order for deterministic results (add a
  * unique tie-break column — same rule as row_number). SortOrders are
  * built from the plan's resolved attributes directly: converting a
  * `Column.desc` drags Spark 4's internal ColumnNode into the expression
  * tree, which is not task-serializable. */
object TopK {
  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[(String, Boolean)],
             k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val spark = df.sparkSession
    ensureStrategy(spark)
    val plan = GraftBridge.analyzedPlan(df)
    val byName = plan.output.groupBy(_.name)
    def resolve(n: String): Attribute = byName.get(n) match {
      case Some(Seq(a)) => a
      case Some(as) => throw new IllegalArgumentException(
        s"TopK.perKey: column '$n' is ambiguous (${as.size} attributes match)")
      case None => throw new IllegalArgumentException(
        s"TopK.perKey: no column '$n' among ${plan.output.map(_.name).mkString(", ")}")
    }
    val keys = keyCols.map(n => resolve(n): Expression)
    val sortOrder = order.map { case (n, desc) =>
      SortOrder(resolve(n), if (desc) Descending else Ascending)
    }
    GraftBridge.ofRows(spark, TopKPerKey(k, keys, sortOrder, plan))
  }

  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
}
