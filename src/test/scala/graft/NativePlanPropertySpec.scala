package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.DedupPipeline

/** Property-style checks (seeded RNG, many shapes) pinning the custom
  * physical operators to their declarative formulations on random inputs —
  * the two implementations share no code, so agreement is strong evidence
  * of both.
  */
class NativePlanPropertySpec extends SparkSpec {
  import spark.implicits._

  test("TopKPerGroupExec == window row_number formulation on random tables") {
    graft.catalyst.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val nGroups = 1 + rnd.nextInt(8)
      val n = 50 + rnd.nextInt(500)
      val k = 1 + rnd.nextInt(5)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(nGroups).toLong, rnd.nextInt(40).toDouble, i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
      val native = graft.plans.NativeTopK
        .perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), k)
        .select("g", "v", "id").as[(Long, Double, Long)].collect().toSet
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val declarative = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("g", "v", "id")
        .as[(Long, Double, Long)].collect().toSet
      assert(native == declarative, s"trial $trial (k=$k): " +
        s"native-only=${native -- declarative} declarative-only=${declarative -- native}")
    }
  }

  test("TopKPerGroupExec spill path: over-cap groups match window formulation") {
    graft.catalyst.GraftExtensions.register(spark)
    // Force the resident-group cap far below the key cardinality so most
    // groups take the spillable-sort fallback, then check exact agreement
    // with the window formulation AND that the spill metric actually fired.
    spark.conf.set(graft.plans.NativeTopK.MaxGroupsConf, "8")
    try {
      val rnd = new scala.util.Random(23)
      val n = 20000
      val nGroups = 3000 // >> cap of 8 per partition
      val k = 3
      val rows = (0 until n).map { i =>
        (rnd.nextInt(nGroups).toLong, rnd.nextInt(1000).toDouble, i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
      val sel = graft.plans.NativeTopK
        .perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), k)
        .select("g", "v", "id").as[(Long, Double, Long)]
      val native = sel.collect().toSet
      // AQE wraps stages in leaf QueryStageExec nodes — expand them manually
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def findTopK(p: SparkPlan): Seq[graft.plans.TopKPerGroupExec] = p match {
        case a: AdaptiveSparkPlanExec => findTopK(a.executedPlan)
        case q: QueryStageExec => findTopK(q.plan)
        case e: graft.plans.TopKPerGroupExec => e +: e.children.flatMap(findTopK)
        case other => other.children.flatMap(findTopK)
      }
      val topks = findTopK(sel.queryExecution.executedPlan)
      assert(topks.nonEmpty, "TopKPerGroupExec not found in executed plan")
      val spilled = topks.map(_.metrics("spilledRows").value).sum
      assert(spilled > 0, "expected the over-cap sort fallback to engage")
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val declarative = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("g", "v", "id")
        .as[(Long, Double, Long)].collect().toSet
      assert(native == declarative,
        s"native-only=${(native -- declarative).take(5)} " +
          s"declarative-only=${(declarative -- native).take(5)}")
    } finally spark.conf.unset(graft.plans.NativeTopK.MaxGroupsConf)
  }

  test("driver union-find == distributed pointer jumping on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val nNodes = 5 + rnd.nextInt(30)
      val nEdges = 1 + rnd.nextInt(40)
      val edges = (0 until nEdges).map { _ =>
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        if (a < b) (a, b) else (b, a + 1) // avoid self loops, keep a < b
      }
      val df = edges.toDF("a_id", "b_id")
      val local = DedupPipeline.clusters(df).as[(Long, Long)].collect().toMap
      val dist = DedupPipeline.clusters(df, localThreshold = 0)
        .as[(Long, Long)].collect().toMap
      assert(local == dist, s"trial $trial: local=$local dist=$dist")
      // every label is the component minimum: no label exceeds its node
      assert(local.forall { case (node, lbl) => lbl <= node })
    }
  }
}
