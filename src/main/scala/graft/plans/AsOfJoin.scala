package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator Catalyst extension path
  * (logical node → strategy → physical sort-merge pass), for the one
  * time-series operator Spark lacks as a built-in.
  *
  * Semantics: for each left row, attach the most recent right row with the
  * same key and `rightTime <= leftTime` (backward as-of, ties match —
  * DuckDB `ASOF JOIN` semantics; null right side when no match). NULL keys
  * never match (SQL join semantics): a null-keyed left row gets the
  * null-padded right side, null-keyed right rows are skipped.
  * Two RIGHT rows with identical (key, time) are resolved by sort order,
  * which is not total over the remaining columns — like every as-of
  * implementation, callers needing determinism under such ties must make
  * the right time unique (e.g. add a sequence tiebreak to the time).
  *
  * Physical shape: both children hash-partitioned on the key and sorted by
  * (key, time) — exactly a sort-merge join's requirements — then ONE
  * streaming merge pass per partition with O(1) state (the last matching
  * right row). Versus the composed union+window formulation
  * ([[graft.operators.TimeSeriesOps.asofJoin]]): no union of padded
  * schemas, no window state, one pass.
  *
  * At 100 TB this plans like any co-partitioned merge join: one exchange
  * per side (none if the sources are bucketed by key), sort spills via
  * UnsafeExternalSorter, and the merge itself is pipelined.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceUnits: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** `toleranceUnits`: pandas merge_asof-style max staleness, in the time
  * column's NATIVE units (µs for timestamps, raw for integral times). When
  * set, the nearest prior match is emitted only if
  * `leftTime - matchTime <= tolerance`; a staler match becomes the
  * null-padded right side (no fallback to even older rows — as-of matches
  * the nearest, tolerance only vetoes it). Requires a non-null,
  * long-backed time column (timestamp/long).
  */
/** Per-partition merge state for [[AsOfJoinExec]] — one instance per task,
  * advanced one LEFT row at a time by either the interpreted `doExecute`
  * iterator or the generated whole-stage produce loop (the
  * SortMergeJoin-style split: the outer loop and downstream pipeline are
  * codegen'd, the O(1) merge state machine stays a JVM object).
  */
final class AsOfMerger(lOut: Seq[Attribute], rOut: Seq[Attribute],
    lKeys: Seq[Expression], rKeys: Seq[Expression],
    lTime: Expression, rTime: Expression, tol: Option[Long],
    out: Seq[Attribute], rIter: Iterator[InternalRow]) {
  private val lKeyGen = UnsafeProjection.create(lKeys, lOut)
  private val rKeyGen = UnsafeProjection.create(rKeys, rOut)
  private val lTimeGen = UnsafeProjection.create(Seq(lTime), lOut)
  private val rTimeGen = UnsafeProjection.create(Seq(rTime), rOut)
  private val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
  private val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
  // bind against a nullable view of the right side: the merge emits an
  // all-null right row on no-match, so reads must keep their null checks
  // even when the child attribute is non-nullable
  private val resultProj = UnsafeProjection.create(out, lOut ++ rOut.map(_.withNullability(true)))
  private val joined = new JoinedRow
  private val nullRight = new GenericInternalRow(rOut.size)
  private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
  // O(1) merge state: the latest right row whose (key, time) is <= the
  // current left frontier, plus its key for the final equality check
  private var lastMatch: InternalRow = null
  private var lastMatchKey: InternalRow = null
  private var lastMatchTime: Long = 0L
  private var lastMatchTimeNull: Boolean = false

  /** Result row for one left row; the returned UnsafeRow's buffer is reused
    * across calls (callers buffer → copy; `needCopyResult` in the codegen
    * path).
    */
  def joinedFor(l: InternalRow): UnsafeRow = {
    // no copies: each UnsafeProjection owns its buffer, so lKey/lTime
    // stay valid until the NEXT left row — the only rows that outlive
    // this call (lastMatch/lastMatchKey) are copied below
    val lKey = lKeyGen(l)
    // SQL join semantics: NULL keys never match — null-padded right
    if (lKey.anyNull) return resultProj(joined(l, nullRight))
    val lTimeRow = lTimeGen(l)
    var scanning = rRow != null
    while (scanning) {
      val rk = rKeyGen(rRow)
      if (rk.anyNull) {
        // null-keyed right rows can never match any left row — skip
        // (they sort first under the natural ascending ordering)
        rRow = if (rIter.hasNext) rIter.next() else null
        scanning = rRow != null
      } else {
        val c = keyOrd.compare(rk, lKey)
        if (c < 0) {
          // right rows for keys already passed — no future left row can
          // match them (left is key-sorted too); drop through
          rRow = if (rIter.hasNext) rIter.next() else null
          scanning = rRow != null
        } else if (c == 0 && timeOrd.compare(rTimeGen(rRow), lTimeRow) <= 0) {
          lastMatch = rRow.copy()
          lastMatchKey = rk.copy()
          val rt = rTimeGen(rRow)
          lastMatchTimeNull = rt.isNullAt(0)
          if (!lastMatchTimeNull) lastMatchTime = rt.getLong(0)
          rRow = if (rIter.hasNext) rIter.next() else null
          scanning = rRow != null
        } else scanning = false
      }
    }
    val rSide =
      if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lKey) == 0 &&
        (tol match {
          case None => true
          case Some(t) => // null time or null left time never passes a tolerance
            !lastMatchTimeNull && !lTimeRow.isNullAt(0) &&
              lTimeRow.getLong(0) - lastMatchTime <= t
        })) lastMatch
      else nullRight
    resultProj(joined(l, rSide))
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceUnits: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  /** Called once per task from generated code or `doExecute`. */
  def createMerger(rIter: Iterator[InternalRow]): AsOfMerger =
    new AsOfMerger(left.output, right.output, leftKeys, rightKeys,
      leftTime, rightTime, toleranceUnits, output, rIter)

  override protected def doExecute(): RDD[InternalRow] = {
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val merger = createMerger(rIter)
      lIter.map(merger.joinedFor)
    }
  }

  // ---- whole-stage codegen (the SortMergeJoin stage-root shape): this node
  // drives the generated loop over the two sorted child iterators; the O(1)
  // merge advance stays in AsOfMerger, and everything DOWNSTREAM (projects,
  // filters, aggregates) fuses into this stage instead of paying an
  // iterator boundary per joined row.
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // joinedFor's output buffer is reused across rows — parents that buffer
  // (sort, agg hash map) must copy
  override def needCopyResult: Boolean = true

  // This node is the stage root driving its own produce loop (the
  // SortMergeJoinExec shape), so checking limitNotReachedCond here is
  // legal; without this Spark's guard logs a warning per compile and
  // throws under spark.testing.
  override def canCheckLimitNotReached: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "leftInput",
      v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "rightInput",
      v => s"$v = inputs[1];", forceInline = true)
    val thisPlan = ctx.addReferenceObj("plan", this)
    val merger = ctx.addMutableState(classOf[AsOfMerger].getName, "asofMerger",
      v => s"$v = $thisPlan.createMerger((scala.collection.Iterator) $rightInput);",
      forceInline = true)
    val leftRow = ctx.freshName("asofLeftRow")
    val outRow = ctx.freshName("asofOutRow")
    s"""
       |while ($limitNotReachedCond $leftInput.hasNext()) {
       |  org.apache.spark.sql.catalyst.InternalRow $leftRow =
       |    (org.apache.spark.sql.catalyst.InternalRow) $leftInput.next();
       |  org.apache.spark.sql.catalyst.expressions.UnsafeRow $outRow =
       |    $merger.joinedFor($leftRow);
       |  ${consume(ctx, null, outRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; injected by
  * [[graft.catalyst.GraftExtensions]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public API over the native operator, mirroring
  * [[graft.operators.TimeSeriesOps.asofJoin]]'s output contract:
  * key + left columns + `asof_<rightTime>` + `asof_<carried right cols>`.
  */
object NativeAsOf {
  /** `toleranceUnits`: optional max staleness in the time column's native
    * units (µs for timestamps) — see [[AsOfJoinExec]].
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      toleranceUnits: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    val lPlan = GraftPlanBridge.analyzed(left)
    // Re-alias every right column at the top of the right subtree: if both
    // sides derive from the same relation, the analyzer's
    // DeduplicateRelations re-ids the right subtree's internals — the
    // fresh Alias exprIds here stay stable, so the node's key/time
    // expressions keep resolving (referencing right.output directly would
    // leave them pointing at the LEFT side's ids after dedup).
    val rAnalyzed = GraftPlanBridge.analyzed(right)
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    val rAttrs = rAliases.map(_.toAttribute)
    def lAttr(name: String): Attribute =
      lPlan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${lPlan.output.map(_.name)}"))
    def rAttr(name: String): Attribute =
      rAttrs.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${rAttrs.map(_.name)}"))
    // timeOrd is built from the LEFT time type and the tolerance subtraction
    // compares the two raw values directly, so a mixed pair (Timestamp in µs
    // vs raw Long units) would silently mis-match — demand identical types
    // always, not just when a tolerance is set
    require(lAttr(leftTime).dataType == rAttr(rightTime).dataType,
      s"as-of time columns must have the same type, got " +
        s"${lAttr(leftTime).dataType} for $leftTime vs " +
        s"${rAttr(rightTime).dataType} for $rightTime")
    toleranceUnits.foreach { t =>
      require(t >= 0, s"tolerance must be non-negative, got $t")
      // the tolerance path reads BOTH time columns as raw longs
      // (AsOfJoinExec getLong) — validate both, not just the right side
      Seq(leftTime -> lAttr(leftTime).dataType,
          rightTime -> rAttr(rightTime).dataType).foreach { case (name, dt) =>
        require(dt.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
          dt.isInstanceOf[org.apache.spark.sql.types.LongType],
          s"tolerance needs a timestamp/long time column, got $dt for $name")
      }
    }
    val node = AsOfJoinNode(lPlan, rPlan,
      Seq(lAttr(key)), Seq(rAttr(key)), lAttr(leftTime), rAttr(rightTime),
      toleranceUnits)
    val carried = rAttrs.filter(a => a.name != key && a.name != rightTime)
    val proj = Project(
      lPlan.output.map(a => Alias(a, a.name)()) ++
        Seq(Alias(rAttr(rightTime).withNullability(true), s"asof_$rightTime")()) ++
        carried.map(a => Alias(a.withNullability(true), s"asof_${a.name}")()),
      node)
    GraftPlanBridge.ofRows(spark, proj)
  }
}
