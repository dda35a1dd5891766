package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class physical operator.
  *
  * The declarative formulation — `row_number().over(partitionBy(g).orderBy(o))
  * .filter(rn <= k)` — fully sorts every group before discarding all but k
  * rows. This operator keeps a bounded heap of k rows per group instead:
  * one pass, memory O(groups × k), no sort of the data. The classic
  * "TakeOrderedAndProject, but per group".
  *
  * 100 TB shape: requires only clustering on the group key (one exchange,
  * none if the source is bucketed); per-partition state is the k-row heap
  * per resident group — independent of group size, the property the window
  * formulation lacks when a group is hot.
  */
case class TopKPerGroupNode(child: LogicalPlan, groupExprs: Seq[Expression],
    ordering: Seq[SortOrder], k: Int) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val out = child.output
    val groupB = groupExprs
    val orderB = ordering
    val kB = k
    child.execute().mapPartitions({ iter =>
      val keyGen = UnsafeProjection.create(groupB, out)
      val rowOrd = RowOrdering.create(orderB, out)
      // max-heap under the requested ordering: head = WORST of the kept k,
      // evicted when a better row arrives
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyGen(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kB + 1, rowOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kB) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val outRows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values.forEach { h =>
        val arr = h.toArray(new Array[InternalRow](h.size))
        java.util.Arrays.sort(arr, rowOrd)
        outRows ++= arr
      }
      outRows.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(child, g, o, k) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object NativeTopK {
  /** Top `k` rows per group, ordered by `orderSpecs` — (column, ascending?)
    * pairs, built directly as catalyst SortOrders (Spark 4's `Column.desc`
    * produces an internal AST node that must not leak into a physical
    * operator). Output keeps the child schema; rank the (tiny) survivors
    * downstream if a rank column is needed. Supply a TOTAL order (unique
    * tiebreak column) — under ties at the k-boundary the heap keeps
    * whichever row arrived first, which is partitioning-dependent.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderSpecs: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val plan = GraftPlanBridge.analyzed(df)
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    val groupExprs: Seq[Expression] = groupCols.map(attr)
    val order = orderSpecs.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftPlanBridge.ofRows(df.sparkSession, TopKPerGroupNode(plan, groupExprs, order, k))
  }
}
