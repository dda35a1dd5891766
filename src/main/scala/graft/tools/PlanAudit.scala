package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec

/** Scale-hazard linter over a physical plan — the checks this repo's
  * PlanQualitySpec applies to its own query surface, packaged as a library
  * call so a user can audit THEIR query before it meets a 1000-executor
  * cluster. Heuristics only: every finding carries the operator it fired
  * on; a documented-bounded construct (a window over a count-of-counts
  * table, a 1-row scalar stitch) is for the caller to waive.
  *
  * `audit(df)` plans the query (no execution) and returns findings,
  * worst first.
  */
object PlanAudit {

  final case class Finding(severity: String, rule: String, detail: String) {
    override def toString: String = s"[$severity] $rule: $detail"
  }

  private def firstLine(p: SparkPlan): String =
    p.simpleStringWithNodeId().linesIterator.next().take(160)

  /** Walk every operator, descending into AQE wrappers — including
    * materialized query stages, which are LEAF wrappers after execution
    * (their content is in `.plan`, not `.children`). */
  private def operators(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => operators(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: operators(q.plan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(operators) ++
      p.subqueries.flatMap(operators)
  }

  def audit(df: DataFrame): Seq[Finding] = {
    val ops = operators(df.queryExecution.executedPlan)
    val findings = Seq.newBuilder[Finding]
    ops.foreach {
      case c: CartesianProductExec =>
        findings += Finding("error", "cartesian-product",
          s"unbounded all-pairs join — ${firstLine(c)}")
      case j: BroadcastNestedLoopJoinExec =>
        findings += Finding("warn", "nested-loop-join",
          "broadcast nested loop: fine for a scalar/bounded build side, " +
            s"quadratic otherwise — ${firstLine(j)}")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        findings += Finding("error", "global-window",
          "window with no PARTITION BY moves every row to one task — " +
            s"${firstLine(w)}")
      case e: ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 =>
        findings += Finding("warn", "single-partition-exchange",
          "all rows funnel into one partition: only sound when the input " +
            s"is bounded (scalar agg, post-agg totals) — ${firstLine(e)}")
      case o: ObjectHashAggregateExec =>
        findings += Finding("warn", "object-agg-buffering",
          "aggregate buffers whole groups on-heap (collect_list/percentile " +
            s"family): group size becomes a memory bound — ${firstLine(o)}")
      case _ =>
    }
    val rank = Map("error" -> 0, "warn" -> 1)
    findings.result().sortBy(f => rank(f.severity))
  }

  /** Convenience gate: throw if any `error`-severity finding fires and is
    * not waived by name. */
  def assertScaleSafe(df: DataFrame, waived: Set[String] = Set.empty): Unit = {
    val errs = audit(df).filter(f => f.severity == "error" && !waived(f.rule))
    require(errs.isEmpty, "plan fails scale audit:\n" + errs.mkString("\n"))
  }
}
