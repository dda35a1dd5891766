package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator}
import org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{
  BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode,
  UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

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
  *
  * Spill safety: the resident heap map is capped at `maxGroups` groups per
  * partition. Rows of groups that arrive after the cap is hit are diverted
  * to an [[UnsafeExternalRowSorter]] ordered by (group key, ordering) —
  * Spark's spillable sorter, the same machinery SortExec uses — and their
  * top-k is taken by a streaming first-k-per-key pass over the sorted run.
  * A group is therefore handled EITHER by a heap OR by the sorter, never
  * both, so results are exact. Memory is O(maxGroups × k) rows plus the
  * sorter's spillable pages; pathological group cardinality degrades to
  * the sort-based plan instead of OOMing.
  */
case class TopKPerGroupNode(child: LogicalPlan, groupExprs: Seq[Expression],
    ordering: Seq[SortOrder], k: Int, maxGroups: Int) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(maxGroups > 0, s"maxGroups must be positive, got $maxGroups")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Per-partition accumulation state for [[TopKPerGroupExec]] — one instance
  * per task, driven row-at-a-time by either the interpreted `doExecute`
  * loop or the generated whole-stage code (the [[SortExec]]-style split:
  * pipeline fusion and row access are codegen'd, the heap/sorter state
  * machine stays a JVM object the generated loop calls into).
  */
final class TopKPartitionState(out: Seq[Attribute], groupExprs: Seq[Expression],
    ordering: Seq[SortOrder], k: Int, maxGroups: Int, spilledRows: SQLMetric) {
  private val keyGen = UnsafeProjection.create(groupExprs, out)
  private val rowOrd = RowOrdering.create(ordering, out)
  // max-heap under the requested ordering: head = WORST of the kept k,
  // evicted when a better row arrives
  private val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
  private var sorter: UnsafeExternalRowSorter = null
  private var toUnsafe: UnsafeProjection = null

  def insert(row: InternalRow): Unit = {
    val key = keyGen(row)
    var heap = heaps.get(key)
    if (heap == null && heaps.size() < maxGroups) {
      heap = new java.util.PriorityQueue[InternalRow](k + 1, rowOrd.reverse)
      heaps.put(key.copy(), heap)
    }
    if (heap != null) {
      if (heap.size < k) heap.add(row.copy())
      else if (rowOrd.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.add(row.copy())
      }
    } else {
      // over-cap group: divert to the spillable sorter, ordered by
      // (group, ordering) so top-k falls out of a streaming scan
      if (sorter == null) {
        val fullOrd = RowOrdering.create(
          groupExprs.map(SortOrder(_, Ascending)) ++ ordering, out)
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val zero = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(r: InternalRow) = { zero.value = 0L; zero.isNull = false; zero }
        }
        sorter = UnsafeExternalRowSorter.create(DataTypeUtils.fromAttributes(out), fullOrd,
          PrefixComparators.LONG, prefixComputer, 4L * 1024 * 1024,
          /* canUseRadixSort = */ false)
        toUnsafe = UnsafeProjection.create(out, out)
      }
      sorter.insertRow(row match {
        case u: UnsafeRow => u
        case other => toUnsafe(other)
      })
      spilledRows += 1
    }
  }

  /** Drain: call once after the last [[insert]]. */
  def iterator(): Iterator[InternalRow] = {
    // lazy emit: sort each heap only when the consumer reaches it — no
    // ArrayBuffer of every surviving row, peak memory stays one group
    val heapIter = heaps.values().iterator()
    val resident: Iterator[InternalRow] = new Iterator[InternalRow] {
      private var cur: Iterator[InternalRow] = Iterator.empty
      override def hasNext: Boolean = {
        while (!cur.hasNext && heapIter.hasNext) {
          val h = heapIter.next()
          val arr = h.toArray(new Array[InternalRow](h.size))
          java.util.Arrays.sort(arr, rowOrd)
          cur = arr.iterator
        }
        cur.hasNext
      }
      override def next(): InternalRow = { hasNext; cur.next() }
    }
    val overflow: Iterator[InternalRow] =
      if (sorter == null) Iterator.empty
      else {
        val sorted = sorter.sort() // cleanup is on the task-completion listener
        new Iterator[InternalRow] {
          private var prevKey: UnsafeRow = null
          private var kept = 0
          private var pending: InternalRow = null
          private def advance(): Unit = {
            while (pending == null && sorted.hasNext) {
              val row = sorted.next()
              val key = keyGen(row)
              if (prevKey == null || key != prevKey) { prevKey = key.copy(); kept = 0 }
              if (kept < k) { kept += 1; pending = row }
            }
          }
          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): InternalRow = {
            advance(); val r = pending; pending = null; r
          }
        }
      }
    resident ++ overflow
  }
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, maxGroups: Int, child: SparkPlan)
  extends UnaryExecNode with BlockingOperatorWithCodegen {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "spilledRows" -> SQLMetrics.createMetric(sparkContext,
      "rows diverted to spillable sort (over-cap groups)"))

  /** Called once per task, from generated code or `doExecute`. */
  def createState(): TopKPartitionState =
    new TopKPartitionState(child.output, groupExprs, ordering, k, maxGroups,
      longMetric("spilledRows"))

  override protected def doExecute(): RDD[InternalRow] = {
    child.execute().mapPartitions({ iter =>
      val state = createState()
      while (iter.hasNext) state.insert(iter.next())
      state.iterator()
    }, preservesPartitioning = true)
  }

  // ---- whole-stage codegen (the SortExec blocking-operator shape):
  // upstream pipeline is generated into addToTopK() feeding doConsume's
  // insert calls; this node then drives the downstream pipeline from the
  // drained iterator, so both sides of the barrier stay fused.
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  // Blocking node (drains its child before emitting), so driving the
  // output loop off limitNotReachedCond is legal — same override
  // SortExec/HashAggregateExec use. Without it Spark logs a warning per
  // compile and throws under spark.testing.
  override def canCheckLimitNotReached: Boolean = true

  private var stateVariable: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val needToProcess = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "needToProcess",
      v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("plan", this)
    stateVariable = ctx.addMutableState(classOf[TopKPartitionState].getName, "topkState",
      v => s"$v = $thisPlan.createState();", forceInline = true)
    val outputIter = ctx.addMutableState(
      "scala.collection.Iterator<org.apache.spark.sql.catalyst.InternalRow>",
      "topkOutputIter", forceInline = true)
    val addToState = ctx.freshName("addToTopK")
    val addToStateFunc = ctx.addNewFunction(addToState,
      s"""
         |private void $addToState() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val row = ctx.freshName("topkRow")
    s"""
       |if ($needToProcess) {
       |  $addToStateFunc();
       |  $outputIter = $stateVariable.iterator();
       |  $needToProcess = false;
       |}
       |while ($limitNotReachedCond $outputIter.hasNext()) {
       |  org.apache.spark.sql.catalyst.InternalRow $row =
       |    (org.apache.spark.sql.catalyst.InternalRow) $outputIter.next();
       |  ${consume(ctx, null, row)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    s"""
       |${row.code}
       |$stateVariable.insert((org.apache.spark.sql.catalyst.expressions.UnsafeRow) ${row.value});
     """.stripMargin
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(child, g, o, k, cap) =>
      TopKPerGroupExec(g, o, k, cap, planLater(child)) :: Nil
    case _ => Nil
  }
}

object NativeTopK {
  /** Session conf: resident-group cap per partition before the operator
    * diverts further groups to a spillable sort. */
  val MaxGroupsConf = "spark.graft.topk.maxGroupsPerPartition"
  val MaxGroupsDefault = 1 << 18

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
    val plan = GraftPlanBridge.analyzed(df)
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    val groupExprs: Seq[Expression] = groupCols.map(attr)
    val order = orderSpecs.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val cap = df.sparkSession.conf.get(MaxGroupsConf, MaxGroupsDefault.toString).toInt
    GraftPlanBridge.ofRows(df.sparkSession, TopKPerGroupNode(plan, groupExprs, order, k, cap))
  }
}
