package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalOps

/** Interval coalescing + sliding exact distinct: crafted-shape semantics
  * and the plan contracts (partitioned windows only, constant ×7 expansion
  * path for the sliding distinct).
  */
class IntervalOpsSpec extends SparkSpec {

  private def iv(rows: (Long, Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("o_custkey", "o_orderkey", "s0", "e0")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("s0")).as("s"), to_date(col("e0")).as("e"))
  }

  test("mergeIntervals: overlap and touch merge, adjacency does not") {
    val out = IntervalOps.mergeIntervalsOver(iv(
      // customer 1: [1..5] overlaps [3..8]; [8..10] touches; [12..12] adjacent-gap
      (1L, 10L, "2024-01-01", "2024-01-05"),
      (1L, 11L, "2024-01-03", "2024-01-08"),
      (1L, 12L, "2024-01-08", "2024-01-10"),
      (1L, 13L, "2024-01-12", "2024-01-12"),
      // customer 2: a contained interval never splits the island
      (2L, 20L, "2024-02-01", "2024-02-28"),
      (2L, 21L, "2024-02-10", "2024-02-12"),
      (2L, 22L, "2024-03-01", "2024-03-02")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // c1: 4 intervals -> 2 islands ([1..10] 10 days, [12..12] 1 day)
    assert(out(1L) == ((4L, 2L, 11L, 10L)))
    // c2: containment folds in -> [02-01..02-28] 28d + [03-01..03-02] 2d
    assert(out(2L) == ((3L, 2L, 30L, 28L)))
  }

  test("mergeIntervals: out-of-order input is irrelevant (window sorts)") {
    val a = IntervalOps.mergeIntervalsOver(iv(
      (1L, 2L, "2024-01-03", "2024-01-08"), (1L, 1L, "2024-01-01", "2024-01-05")))
    val b = IntervalOps.mergeIntervalsOver(iv(
      (1L, 1L, "2024-01-01", "2024-01-05"), (1L, 2L, "2024-01-03", "2024-01-08")))
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("mergeIntervals plan: windows are customer-partitioned, no global window") {
    // PlanAudit flags any window without a PARTITION BY — a string probe
    // for "windowspecdefinition()" can never fire (order cols fill the parens)
    val errs = graft.tools.PlanAudit.audit(IntervalOps.mergeIntervals(spark, sf0001))
      .filter(f => f.severity == "error")
    assert(errs.isEmpty, errs)
    // sf0.001 sanity: every customer covers at least its own order days
    val df = IntervalOps.mergeIntervals(spark, sf0001)
    assert(df.filter(col("covered_days") < col("max_span_days")).count() == 0)
    assert(df.filter(col("n_merged") > col("n_intervals")).count() == 0)
  }

  test("slidingDistinct: window counts distinct users across the trailing week") {
    import spark.implicits._
    val activity = Seq(
      // day 1: users 1,2 | day 3: user 2 (dup rows collapse) | day 9: user 3
      ("2024-01-01", 1L), ("2024-01-01", 2L), ("2024-01-01", 2L),
      ("2024-01-03", 2L),
      ("2024-01-09", 3L))
      .toDF("day0", "user_id").select(to_date(col("day0")).as("day"), col("user_id"))
    val out = IntervalOps.slidingDistinctOver(activity).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    // only days WITH activity appear; 01-09 window [01-03..01-09] sees users {2,3}
    assert(out.keySet == Set("2024-01-01", "2024-01-03", "2024-01-09"))
    assert(out("2024-01-01") == ((2L, 2L)))
    assert(out("2024-01-03") == ((1L, 2L))) // week back to 2023-12-28 sees {1,2}
    assert(out("2024-01-09") == ((1L, 2L)))
  }

  test("slidingDistinct metrics: the explode emits EXACTLY 7x the deduped pairs") {
    // quantitative form of the scale contract: expansion is a constant x7
    // of the (day, user) dedup, independent of raw event volume
    val df = IntervalOps.slidingDistinct(spark, sf0001)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def all(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => all(a.executedPlan)
      case q: QueryStageExec => q +: all(q.plan)
      case _ => p +: p.children.flatMap(all)
    }
    val generated = all(df.queryExecution.executedPlan).collect {
      case g: org.apache.spark.sql.execution.GenerateExec =>
        g.metrics("numOutputRows").value
    }
    val pairs = Tables.events(spark, sf0001)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct().count()
    assert(generated.nonEmpty && generated.max == 7 * pairs,
      s"generate=$generated pairs=$pairs")
  }

  test("slidingDistinct plan: ×7 explode after dedup, no range join, no cartesian") {
    val df = IntervalOps.slidingDistinct(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "day-range join would be O(days·pairs); the plan must use the ×7 explode")
    assert(plan.contains("Generate explode"), plan.take(2000))
  }
}
