package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import scala.collection.mutable

/** Grouped top-k as a first-class operator — the one place in this engine
  * where the built-ins genuinely can't express the efficient plan. The
  * declarative formulation (`row_number().over(partitionBy(keys).orderBy
  * (ord)) <= k`, our Relational.latestPerKey shape) must fully SORT every
  * partition: O(n log n) comparisons and sort-spill pressure at 100 TB,
  * even though only k rows per key survive. This operator keeps a bounded
  * heap per key instead: O(n log k) comparisons, memory O(keys·k) per
  * partition, one shuffle (ClusteredDistribution on the keys) — same
  * result set as the window formulation for any total `order`.
  *
  * Wired through the full extension stack: logical node → planner
  * Strategy → physical UnaryExecNode, registered per-session.
  */
case class GroupedTopK(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

case class GroupedTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keys, child.output)
      val ord = GenerateOrdering.generate(order, child.output)
      // max-heap by `ord`: head is the WORST currently-kept row per key
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator) // best-first
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(keys, order, k, child) =>
      GroupedTopKExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {
  /** Per-key top-k rows ordered by `(column, ascending)` pairs — make the
    * order total (include a unique id) for determinism. Columns are bound
    * to the input's resolved attributes (Spark 4's Column wrapper is
    * opaque to generic resolution inside custom logical nodes, so the
    * operator takes names and resolves them itself). */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val analyzed = ColumnBridge.plan(df)
    def attr(name: String): Expression =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val sortOrders = order.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark,
      GroupedTopK(keyCols.map(attr), sortOrders, k, analyzed))
  }

  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    }
}
