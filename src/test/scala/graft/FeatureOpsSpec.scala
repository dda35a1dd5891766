package graft

import org.apache.spark.sql.functions._
import graft.operators.{FeatureOps, GraphOps, ReconcileOps}

/** Feature-selection, compliance-audit, graph and reconciliation operator
  * pins: crafted-shape semantics plus the plan contracts that keep them
  * scale-safe.
  */
class FeatureOpsSpec extends SparkSpec {

  test("chi2Terms: discriminating term outranks common term; all-docs term drops") {
    val df = FeatureOps.chi2Terms(spark, sf0001, k = 10000)
    val rows = df.collect()
    // the all-documents filter: no term may carry df == n (chi2 undefined)
    val n = graft.Tables.documents(spark, sf0001).count()
    assert(rows.forall(_.getLong(1) < n))
    // chi2 is non-negative and finite everywhere
    assert(rows.forall(r => !r.getDouble(3).isNaN && r.getDouble(3) >= 0.0))
    // ranking is (chi2 desc, term asc) — verify the total order held
    val pairs = rows.map(r => (r.getDouble(3), r.getString(0))).toSeq
    assert(pairs == pairs.sortBy { case (c, t) => (-c, t) })
  }

  test("chi2Terms: hand-checked 2x2 table on a crafted corpus") {
    // 4 docs: 2 en, 2 de; "alpha" only in the 2 en docs -> perfect association
    // chi2 = n = 4; "both" in one of each -> chi2 = 0
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha both", "en"), (2L, "alpha", "en"),
      (3L, "both beta", "de"), (4L, "beta", "de"))
      .toDF("doc_id", "text", "lang")
    docs.createOrReplaceTempView("cheat_docs")
    // re-run the operator body over the crafted frame via the same math
    val y = (col("lang") === "en").cast("long").as("y")
    val d2 = docs.select(col("text"), y)
    val totals = d2.agg(count(lit(1)).as("n"), sum("y").as("pos"))
    val perTerm = d2.select(col("y"),
        explode(array_distinct(graft.functions.TextOps.tokens(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"), sum("y").as("pos_df"))
    val out = perTerm.crossJoin(broadcast(totals))
      .withColumn("b", col("df") - col("pos_df"))
      .withColumn("cc", col("pos") - col("pos_df"))
      .withColumn("dd", col("n") - col("pos") - col("b"))
      .withColumn("delta", (col("pos_df") * col("dd") - col("b") * col("cc")).cast("double"))
      .withColumn("chi2", col("n").cast("double") * col("delta") * col("delta") /
        (col("df").cast("double") * (col("n") - col("df")).cast("double") *
          col("pos").cast("double") * (col("n") - col("pos")).cast("double")))
      .select("term", "chi2").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("alpha") == 4.0 && out("beta") == 4.0)
    assert(out("both") == 0.0)
  }

  test("kAnonymity: levels partition the table and coarser levels imply bigger groups") {
    val out = FeatureOps.kAnonymity(spark, sf0001, k = 10)
    val total = out.agg(sum("n_rows")).first().getLong(0)
    assert(total == graft.Tables.customer(spark, sf0001).count())
    // level column stays in the ladder range
    assert(out.filter(col("level") < 0 || col("level") > 3).count() == 0)
  }

  test("kAnonymity: huge k forces everything past the nation level") {
    val out = FeatureOps.kAnonymity(spark, sf0001, k = 1000000)
    assert(out.filter(col("level") =!= 3).count() == 0)
  }

  test("triangles: crafted graph counts each triangle once") {
    import spark.implicits._
    // orders: o1 = {1,2,3} (one triangle), o2 = {3,4} (edge only),
    // o3 = {1,2} (duplicate edge must not double-count)
    val li = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 3L), (20L, 4L),
      (30L, 1L), (30L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val dir = tmpDir("tri")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = GraphOps.triangles(spark, dir).first()
    assert(out.getLong(0) == 4L, s"edges: $out")     // {12,13,23,34}
    assert(out.getLong(1) == 1L, s"triangles: $out") // {1,2,3}
  }

  test("triangles plan: no cartesian; the only nested-loop is the 1-row scalar stitch") {
    val plan = GraphOps.triangles(spark, sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // the final n_edges x n_triangles crossJoin is 1-row x 1-row; every
    // data-scale join (orientation, adjacency attach) must be key-equi
    assert(plan.split("BroadcastNestedLoop").length <= 2, plan.take(1500))
    // edge-iterator form: the closure count is a per-edge intersection of
    // sorted out-neighbor lists — wedge rows must never materialize
    assert(plan.contains("array_intersect"), plan.take(1500))
  }

  test("snapshotDiff: change-type totals match the deterministic edit recipe") {
    val orders = graft.Tables.orders(spark, sf0001)
    val out = ReconcileOps.snapshotDiff(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val removed = orders.filter(col("o_orderkey") % 97 === 0).count()
    val added = orders.filter(col("o_orderkey") % 101 === 0).count()
    // changed = repriced keys that were NOT deleted
    val changed = orders.filter(col("o_orderkey") % 89 === 0 &&
      col("o_orderkey") % 97 =!= 0).count()
    assert(out.getOrElse("removed", 0L) == removed)
    assert(out.getOrElse("added", 0L) == added)
    assert(out.getOrElse("changed", 0L) == changed)
  }

  test("ivmJoin: the 4-term delta algebra equals the direct join+agg recompute") {
    import org.apache.spark.sql.functions.{round => rnd}
    val direct = graft.Tables.orders(spark, sf0001)
      .select(col("o_custkey"), rnd(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(graft.Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("revenue_cents"))
      .orderBy("c_nationkey").collect().toSeq
    val merged = graft.queries.AnalyticsQueries.ivmJoin(spark, sf0001).collect().toSeq
    assert(merged == direct)
  }

  test("giniOf: uniform keys score 0, extreme concentration approaches (n-1)/n") {
    import spark.implicits._
    // 4 keys x 5 rows each: perfectly equal -> Gini 0
    val uniform = (1 to 4).flatMap(k => Seq.fill(5)(k.toLong)).toDF("k")
    val g0 = graft.operators.SkewOps.giniOf(uniform, "u").first()
    assert(g0.getLong(1) == 4L && g0.getLong(2) == 20L)
    assert(g0.getDouble(3) == 0.0)
    // 1 key with 97 rows + 3 keys with 1: hand-computed Gini
    // sorted x = (1,1,1,97): S = 1+2+3+4*97 = 394, T = 100, n = 4
    // G = (2*394 - 5*100) / (4*100) = 288/400 = 0.72
    val skewed = (Seq.fill(97)(9L) ++ Seq(1L, 2L, 3L)).toDF("k")
    val g1 = graft.operators.SkewOps.giniOf(skewed, "s").first()
    assert(g1.getDouble(3) == 0.72)
  }

  test("compressRatio: repetitive text compresses below prose; deterministic") {
    val out = graft.functions.TextOps.compressRatio(spark, sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // byte accounting sane: zlib output is never empty for non-empty input
    assert(rows.forall(r => r.getLong(1) == 0 || r.getLong(2) > 0))
    // deterministic end to end
    assert(graft.functions.TextOps.compressRatio(spark, sf0001)
      .collect().toSeq == rows.toSeq)
    // a highly repetitive doc must compress below a same-length varied doc
    import spark.implicits._
    val crafted = Seq((1L, "spam " * 200), (2L, (1 to 200).mkString(" ")))
      .toDF("doc_id", "text")
    val dir = tmpDir("zr")
    crafted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = graft.functions.TextOps.compressRatio(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) < m(2L))
  }

  test("cumeNewUsers: last cumulative value equals the type's distinct users") {
    import graft.operators.IntervalOps
    val out = IntervalOps.cumeNewUsers(spark, sf0001)
    val last = out.groupBy("event_type").agg(max("cume_users").as("c"))
    val want = graft.Tables.events(spark, sf0001)
      .groupBy("event_type").agg(countDistinct("user_id").as("w"))
    assert(last.join(want, "event_type").filter(col("c") =!= col("w")).count() == 0)
  }

  test("mmrDiversify: a near-duplicate of the top pick is displaced by diverse results") {
    import spark.implicits._
    // ids: 0 = query; 1,2 = near-identical high-relevance pair; 3 = diverse
    // mid-relevance; 4,5,6 = orthogonal fillers. Pure top-5 by relevance
    // would rank 2 second; MMR must push it out entirely (its similarity
    // to pick 1 exceeds its relevance, scoring below the 0-sim fillers).
    def v(entries: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0.0f)
      entries.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    val emb = Seq(
      (0L, v(0 -> 127f), 0),
      (1L, v(0 -> 127f, 1 -> 127f), 0),
      (2L, v(0 -> 127f, 1 -> 126f), 0),
      (3L, v(0 -> 90f, 50 -> 127f), 0),
      (4L, v(60 -> 127f), 0),
      (5L, v(61 -> 127f), 0),
      (6L, v(62 -> 127f), 0))
      .toDF("vec_id", "embedding", "label")
    val dir = tmpDir("mmr")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val picks = graft.operators.SimilarityOps.mmrDiversify(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(picks.map(_._2) == Seq(1L, 3L, 4L, 5L, 6L), picks)
  }

  test("mmrDiversify: candidate pool smaller than k stops cleanly") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq.fill(64)(1.0f), 0), (1L, Seq.fill(64)(2.0f), 0),
      (2L, Seq.fill(64)(3.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val dir = tmpDir("mmr2")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.operators.SimilarityOps.mmrDiversify(spark, dir).collect()
    assert(out.length == 2)
  }

  test("dqReport: clean data passes every contract; broken FK is counted") {
    val clean = ReconcileOps.dqReport(spark, sf0001).collect()
    assert(clean.length == 7)
    assert(clean.forall(_.getBoolean(3)), clean.mkString("\n"))
    // break referential integrity: drop half the customers
    import spark.implicits._
    val dir = tmpDir("dq")
    graft.Tables.orders(spark, sf0001).write.parquet(s"$dir/orders.parquet")
    graft.Tables.lineitem(spark, sf0001).write.parquet(s"$dir/lineitem.parquet")
    graft.Tables.customer(spark, sf0001).filter(col("c_custkey") % 2 === 0)
      .write.parquet(s"$dir/customer.parquet")
    val broken = ReconcileOps.dqReport(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(broken("orders_custkey_fk") > 0)
    assert(broken("orders_pk_unique") == 0)
  }

  test("greedyCover: gains decrease monotonically and accumulate; picks distinct") {
    val rows = FeatureOps.greedyCover(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == FeatureOps.CoverK)
    val gains = rows.map(_.getLong(2)).toSeq
    // submodularity: each marginal gain is <= the previous one
    assert(gains == gains.sortBy(-_), gains)
    assert(gains.forall(_ > 0))
    val ids = rows.map(_.getLong(1)).toSeq
    assert(ids.distinct.size == ids.size)
    // covered_tokens is the running sum of gains
    assert(rows.map(_.getLong(3)).toSeq == gains.scanLeft(0L)(_ + _).tail)
  }

  test("decayScore: the presented double is the exact dyadic numerator / 256") {
    val rows = graft.operators.IntervalOps.decayScore(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // power-of-two division only shifts the float exponent — exact
      assert(r.getDouble(3) * 256.0 == r.getLong(2).toDouble, r)
    }
  }

  test("transitions: each row's counts sum to its row total") {
    val out = graft.operators.FunnelOps.transitions(spark, sf0001)
    val bad = out.groupBy("from_type")
      .agg(sum("n").as("s"), first("row_total").as("t"))
      .filter(col("s") =!= col("t")).count()
    assert(bad == 0)
  }

  test("colStats: per-column profile is exact on sf0.001") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val out = ReconcileOps.colStats(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 9)
    val n = li.count()
    assert(out.values.forall(_.getLong(1) == n))
    val ok = out("l_orderkey")
    assert(ok.getLong(3) == li.select("l_orderkey").distinct().count())
    assert(ok.getDouble(4) == li.agg(min("l_orderkey")).first().getLong(0).toDouble)
    // string column lands in the string slots, numeric slots null
    val rf = out("l_returnflag")
    assert(rf.isNullAt(4) && rf.isNullAt(5) && !rf.isNullAt(6))
  }
}
