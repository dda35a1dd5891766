package graft

import org.apache.spark.sql.functions._
import graft.plans.{MaterializedRollup, RollupAdvisor}

/** The observe→advise→build→serve loop: the advisor must recommend exactly
  * what the rewrite can serve, merge shapes per base (union grouping serves
  * coarser queries by re-aggregation), skip what it must (served bases,
  * rollup tables, underivable aggregates), and its built output must
  * immediately serve the observed workload.
  */
class RollupAdvisorSpec extends SparkSpec {

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("observed shapes accumulate, merge per base, and build serves them") {
    graft.catalyst.GraftExtensions.register(spark)
    RollupAdvisor.reset()
    val base = tmpDir("adv-base")
    import spark.implicits._
    Seq(("A", "x", 1L), ("A", "y", 3L), ("B", "x", 10L), ("C", "y", 7L))
      .toDF("g", "h", "v").write.mode("overwrite").parquet(base)

    // the dashboard workload: two shapes over one base (deterministic
    // record() calls — the listener path is covered separately)
    val q1 = () => spark.read.parquet(base).groupBy("g", "h")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
    val q2 = () => spark.read.parquet(base).filter(col("h") === "y")
      .groupBy("g").agg(avg("v").as("a"))
    val q3 = () => spark.read.parquet(base).groupBy("g").agg(min("v").as("mn"))
    RollupAdvisor.record(q1().queryExecution.optimizedPlan)
    RollupAdvisor.record(q1().queryExecution.optimizedPlan)
    // q2 NORMALIZES to q1's shape: the filter column joins the grouping
    RollupAdvisor.record(q2().queryExecution.optimizedPlan)
    RollupAdvisor.record(q3().queryExecution.optimizedPlan)

    val advice = RollupAdvisor.advise()
    assert(advice.nonEmpty)
    val c = advice.head
    assert(c.basePath.contains("adv-base"))
    // union grouping (g, h) serves every shape; measure v
    assert(c.groupCols == Seq("g", "h"), c.toString)
    assert(c.measureCols == Seq("v"))
    assert(c.hits == 4L)
    // two distinct normalized shapes: ((g,h),(v)) x3 and ((g),(v)) x1
    assert(c.shapes.map(_.hits).sum == 4L && c.shapes.size == 2, c.shapes.toString)

    // materialize the advice: both observed shapes now serve from it.
    // (maxGroupRatio relaxed — this 4-row fixture is all-distinct under the
    // union grouping by construction; the size gate has its own test below.)
    val rollupsRoot = tmpDir("adv-roots")
    val specs = RollupAdvisor.buildTop(spark, rollupsRoot, n = 1, maxGroupRatio = 1.0)
    assert(specs.size == 1)
    try {
      val expected1 = Seq(("A", "x", 1L, 1L), ("A", "y", 3L, 1L),
        ("B", "x", 10L, 1L), ("C", "y", 7L, 1L))
      assert(physical(q1()).contains(rollupsRoot))
      assert(q1().orderBy("g", "h").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq == expected1)
      assert(physical(q2()).contains(rollupsRoot))
      assert(q2().orderBy("g").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq ==
        Seq(("A", 3.0), ("C", 7.0)))
    } finally MaterializedRollup.deregister(spark, base)
  }

  test("skips served bases, rollup tables, underivable shapes, measure filters") {
    graft.catalyst.GraftExtensions.register(spark)
    RollupAdvisor.reset()
    import spark.implicits._
    val base = tmpDir("adv-base2")
    Seq(("A", 1L), ("B", 5L)).toDF("g", "v").write.mode("overwrite").parquet(base)

    // distinct aggregate: not derivable -> no advice
    RollupAdvisor.record(spark.read.parquet(base).groupBy("g")
      .agg(count_distinct(col("v")).as("nd")).queryExecution.optimizedPlan)
    // filter on the aggregated measure: degenerate advice -> skipped
    RollupAdvisor.record(spark.read.parquet(base).filter(col("v") > 2)
      .groupBy("g").agg(sum("v").as("s")).queryExecution.optimizedPlan)
    assert(RollupAdvisor.advise().isEmpty, RollupAdvisor.advise().toString)

    // an already-registered base needs no advice (the rewrite serves it)
    val roll = tmpDir("adv-roll2") + "/r"
    MaterializedRollup.build(spark, base, roll, Seq("g"), Seq("v"))
    try {
      RollupAdvisor.record(spark.read.parquet(base).groupBy("g")
        .agg(sum("v").as("s")).queryExecution.optimizedPlan)
      assert(RollupAdvisor.advise().isEmpty)
      // and a scan of the rollup TABLE itself never generates advice
      RollupAdvisor.record(spark.read.parquet(roll).groupBy("g")
        .agg(sum("_cnt").as("n")).queryExecution.optimizedPlan)
      assert(RollupAdvisor.advise().isEmpty)
    } finally MaterializedRollup.deregister(spark, base)
  }

  test("buildTop size gate: near-unique grouping declines, coarse grouping builds") {
    graft.catalyst.GraftExtensions.register(spark)
    import spark.implicits._
    val root = tmpDir("adv-gate-roots")

    // near-unique union grouping (id is a key): the rollup would be
    // base-sized — the gate must DECLINE the auto-build entirely
    RollupAdvisor.reset()
    val uniq = tmpDir("adv-gate-uniq")
    (1 to 500).map(i => (i.toLong, i * 2L)).toDF("id", "v")
      .write.mode("overwrite").parquet(uniq)
    RollupAdvisor.record(spark.read.parquet(uniq).groupBy("id")
      .agg(sum("v").as("s")).queryExecution.optimizedPlan)
    assert(RollupAdvisor.advise().nonEmpty) // the SHAPE is observed...
    assert(RollupAdvisor.buildTop(spark, root, n = 1).isEmpty) // ...but declined
    assert(Option(new java.io.File(root).listFiles()).getOrElse(Array.empty).isEmpty)

    // coarse grouping (4 groups over 500 rows): builds and serves as before
    RollupAdvisor.reset()
    val coarse = tmpDir("adv-gate-coarse")
    (1 to 500).map(i => ("g" + (i % 4), i.toLong)).toDF("g", "v")
      .write.mode("overwrite").parquet(coarse)
    val q = () => spark.read.parquet(coarse).groupBy("g").agg(sum("v").as("s"))
    RollupAdvisor.record(q().queryExecution.optimizedPlan)
    val specs = RollupAdvisor.buildTop(spark, root, n = 1)
    assert(specs.size == 1)
    try {
      assert(physical(q()).contains(root))
      assert(q().collect().map(_.getLong(1)).sum == (1 to 500).map(_.toLong).sum)
    } finally MaterializedRollup.deregister(spark, coarse)
  }

  test("listener path: successful actions feed the advisor asynchronously") {
    graft.catalyst.GraftExtensions.register(spark)
    RollupAdvisor.reset()
    import spark.implicits._
    val base = tmpDir("adv-base3")
    Seq(("A", 1L), ("B", 5L)).toDF("g", "v").write.mode("overwrite").parquet(base)
    RollupAdvisor.install(spark)
    try {
      spark.read.parquet(base).groupBy("g").agg(max("v").as("m")).collect()
      // QueryExecutionListener delivery is async on the listener bus
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var advice = RollupAdvisor.advise()
      while (advice.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100); advice = RollupAdvisor.advise()
      }
      assert(advice.exists(c => c.basePath.contains("adv-base3") &&
        c.groupCols == Seq("g") && c.measureCols == Seq("v")), advice.toString)
    } finally RollupAdvisor.uninstall(spark)
  }
}
