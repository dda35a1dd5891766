package graft.plans

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.util.QueryExecutionListener

/** The observe→advise half of the aggregate-navigator lifecycle
  * ([[MaterializedRollup]] is build→serve→refresh→recover): a
  * `QueryExecutionListener` watches the workload for aggregate-over-scan
  * shapes the rewrite WOULD serve if a rollup existed, accumulates them
  * per base path, and recommends what to materialize — the summary-advisor
  * loop every serious warehouse runs (canonically IBM DB2's summary-table
  * advisor, Zilio et al., VLDB 2004 — public literature).
  *
  * What counts as an observation: a successful query containing an
  * `Aggregate` whose child is the [[RollupRewrite]] subsumable shape
  * (bare scan / pruning Projects / deterministic group-column-only
  * Filters over a single-root parquet relation) with every aggregate in
  * the rewrite's derivable family (COUNT(*) / COUNT(col) / SUM / MIN /
  * MAX / AVG) — judged by the SAME analysis the rewrite runs, so advice
  * never recommends a rollup the rewrite could not serve. Scans of
  * already-registered bases (the rewrite handles those) and of rollup
  * tables themselves are skipped.
  *
  * Per base path the advisor keeps the UNION of observed grouping columns
  * and measures: a rollup on the union grouping serves every observed
  * shape by re-aggregation (coarser group-bys of a finer rollup are
  * sound). The NDV trade is the operator's call and is surfaced, not
  * hidden: `Candidate.shapes` carries each distinct observed shape with
  * its own hit count, so a deployment can build per-shape rollups when
  * the union grouping's NDV approaches the base row count.
  *
  * 100 TB: the listener walks already-analyzed plans (metadata-sized), the
  * stats map is shape-count-sized, and [[buildTop]] delegates to
  * [[MaterializedRollup.build]] — one base pass per built rollup, after
  * which the serve path is NDV-priced. Nothing here touches data on the
  * observe side.
  */
object RollupAdvisor {

  /** One observed subsumable shape. */
  case class Shape(groupCols: Seq[String], measureCols: Seq[String], hits: Long)

  /** Per-base recommendation: the union rollup that serves every observed
    * shape, total hits, the observed byte-size weight of the scans it
    * would replace, and the per-shape breakdown.
    */
  case class Candidate(basePath: String, groupCols: Seq[String],
      measureCols: Seq[String], hits: Long, scannedBytes: Long,
      shapes: Seq[Shape])

  private case class Obs(hits: Long, bytes: Long)
  // (basePath, groups, measures) -> accumulated observations.
  // Bounded: a long-running PipelineApp serving varied ad-hoc workloads
  // would otherwise accumulate one entry per distinct shape forever. Beyond
  // the cap, NEW shapes are dropped (existing shapes keep counting) — the
  // advisor's job is the head of the workload distribution, and a shape
  // that first appears after 4096 others is tail by construction.
  private[plans] val MaxShapes = 4096
  private val seen =
    new ConcurrentHashMap[(String, Seq[String], Seq[String]), Obs]()

  private val listeners =
    new ConcurrentHashMap[SparkSession, QueryExecutionListener]()

  /** Start observing a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    listeners.computeIfAbsent(spark, { s =>
      val l = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          try record(qe.optimizedPlan)
          catch { case scala.util.control.NonFatal(_) => () }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      }
      s.listenerManager.register(l)
      l
    })
    ()
  }

  def uninstall(spark: SparkSession): Unit = {
    Option(listeners.remove(spark)).foreach(spark.listenerManager.unregister)
  }

  def reset(): Unit = seen.clear()

  /** Record every subsumable aggregate-over-scan in the plan. Public so
    * deterministic callers (specs, offline workload replays) can feed
    * plans without the listener's async bus.
    */
  def record(plan: LogicalPlan): Unit = plan.foreach {
    case agg @ Aggregate(ge, ae, child, _) =>
      for ((path, filters) <- scanShape(child)
           if MaterializedRollup.specFor(path).isEmpty && !isRollupTable(agg)) {
        val groups = ge.map {
          case a: AttributeReference => Some(a.name)
          case _ => None
        }
        val filterCols = filters.flatMap(_.references.toSeq.map(_.name)).distinct
        val measures = ae.flatMap(collectMeasures)
        // filter columns JOIN the recommended grouping (the rewrite then
        // re-anchors the predicate onto the rollup) — but never when the
        // same column is also aggregated: grouping by a measure is the
        // degenerate NDV-exploding advice no operator wants
        val derivable = groups.forall(_.isDefined) && ae.forall(aggDerivable) &&
          filterCols.intersect(measures).isEmpty
        val groupSet = (groups.flatten ++ filterCols).distinct.sorted
        if (derivable) {
          val key = (path, groupSet, measures.distinct.sorted)
          if (seen.size < MaxShapes || seen.containsKey(key)) {
            val bytes = try child.stats.sizeInBytes.toLong catch { case _: Throwable => 0L }
            seen.merge(key, Obs(1L, bytes),
              (a, b) => Obs(a.hits + b.hits, a.bytes + b.bytes))
            ()
          }
        }
      }
    case _ => ()
  }

  /** Top recommendations, most-observed first. */
  def advise(top: Int = 5): Seq[Candidate] = {
    import scala.jdk.CollectionConverters._
    seen.asScala.toSeq
      .groupBy(_._1._1)
      .map { case (path, entries) =>
        val shapes = entries.map { case ((_, g, m), o) => Shape(g, m, o.hits) }
          .sortBy(-_.hits)
        Candidate(path,
          entries.flatMap(_._1._2).distinct.sorted,
          entries.flatMap(_._1._3).distinct.sorted,
          entries.map(_._2.hits).sum,
          entries.map(_._2.bytes).sum,
          shapes)
      }
      .toSeq.sortBy(c => (-c.hits, -c.scannedBytes))
      .take(top)
  }

  /** Materialize the top `n` recommendations under `rollupsRoot` (one
    * child dir per base — the PipelineApp recover convention) and register
    * them; subsequent matching queries serve from the rollups immediately.
    * Returns the built specs.
    *
    * Size gate: a rollup only pays when it is meaningfully smaller than
    * its base — a near-unique union grouping (filter columns unioned into
    * the grouping compound NDV) would auto-build a rollup ~the size of the
    * base: wasted build I/O and a serve path with no gain. Before
    * [[MaterializedRollup.build]], one column-pruned probe estimates
    * (distinct union groups) / (base rows) with `approx_count_distinct`
    * over the grouping struct; candidates above `maxGroupRatio` are
    * DECLINED (and returned in no spec). 100 TB posture: the probe scans
    * only the grouping columns (parquet-pruned, partial-agg, ~row-count
    * bytes of shuffle: one HLL sketch per partition), which is the cheap
    * insurance against committing a FULL-width build scan that produces a
    * useless rollup.
    */
  def buildTop(spark: SparkSession, rollupsRoot: String,
      n: Int = 1, maxGroupRatio: Double = 0.5): Seq[MaterializedRollup.Spec] =
    advise(n).filter(_.groupCols.nonEmpty).flatMap { c =>
      if (!worthBuilding(spark, c, maxGroupRatio)) None
      else {
        val name = java.lang.Long.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(c.basePath) & 0xffffffffL)
        Some(MaterializedRollup.build(spark, c.basePath,
          s"$rollupsRoot/advised_$name", c.groupCols, c.measureCols))
      }
    }

  /** The [[buildTop]] size gate, exposed for specs: estimated distinct
    * union-grouping NDV over base rows must be ≤ `maxGroupRatio`. An empty
    * or unreadable base declines (nothing to serve); estimation errors
    * decline (never build on a failed probe).
    */
  def worthBuilding(spark: SparkSession, c: Candidate,
      maxGroupRatio: Double): Boolean =
    try {
      import org.apache.spark.sql.functions.{approx_count_distinct, col, count, lit, struct}
      val probe = spark.read.parquet(c.basePath)
        .agg(approx_count_distinct(struct(c.groupCols.map(col): _*)).as("g"),
          count(lit(1)).as("n"))
        .head()
      val groups = probe.getLong(0)
      val rows = probe.getLong(1)
      rows > 0 && groups.toDouble / rows <= maxGroupRatio
    } catch { case scala.util.control.NonFatal(_) => false }

  // ---- shape analysis (the rewrite's subsumption rules, observe side) ----

  private def scanShape(plan: LogicalPlan): Option[(String, Seq[Expression])] =
    plan match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths match {
          case Seq(one) => Some((one.toString, Nil))
          case _ => None
        }
        case _ => None
      }
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        scanShape(child)
      case Filter(cond, child) if cond.deterministic =>
        scanShape(child).map { case (p, fs) => (p, cond +: fs) }
      case _ => None
    }

  /** A rollup table's own scan must not generate advice (its column names
    * are the tell — `_cnt` plus `_sum_`/`_min_`/`_max_` families).
    */
  private def isRollupTable(agg: Aggregate): Boolean =
    agg.child.output.exists(a => a.name == "_cnt" || a.name.startsWith("_sum_"))

  private def collectMeasures(e: Expression): Seq[String] = e match {
    case Alias(inner, _) => collectMeasures(inner)
    case ag: AggregateExpression => ag.aggregateFunction match {
      case Sum(a: AttributeReference, _) => Seq(a.name)
      case Min(a: AttributeReference) => Seq(a.name)
      case Max(a: AttributeReference) => Seq(a.name)
      case Average(a: AttributeReference, _) => Seq(a.name)
      case Count(Seq(a: AttributeReference)) => Seq(a.name)
      case _ => Nil
    }
    case _ => Nil
  }

  /** Whether one output expression is in the rewrite's derivable family. */
  private def aggDerivable(e: Expression): Boolean = e match {
    case Alias(inner, _) => aggDerivable(inner)
    case _: AttributeReference => true // a grouping column in the output
    case ag: AggregateExpression if !ag.isDistinct && ag.filter.isEmpty =>
      ag.aggregateFunction match {
        case Count(Seq(Literal(_, _))) | Count(Seq()) => true
        case Count(Seq(_: AttributeReference)) => true
        case Sum(_: AttributeReference, _) => true
        case Min(_: AttributeReference) => true
        case Max(_: AttributeReference) => true
        case Average(_: AttributeReference, _) => true
        case _ => false
      }
    case _ => false
  }
}
