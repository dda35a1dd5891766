package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.{TpchQueries => TQ}

/** The round-9 TPC-H completions: plan-quality pins (the properties that
  * make each shape scale) plus an edge-case certification of the Q21
  * aggregate rewrite against the literal EXISTS/NOT-EXISTS semantics.
  */
class TpchSuiteSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("q4/q20 plan as left-semi joins, q16's NOT IN as left-anti") {
    assert(plan(TQ.q4OrderPriority(spark, sf0001)).contains("LeftSemi"))
    assert(plan(TQ.q20ExcessShipments(spark, sf0001)).contains("LeftSemi"))
    assert(plan(TQ.q16SupplierCnt(spark, sf0001)).contains("LeftAnti"))
  }

  test("dimension sides broadcast: q7, q8, q9, q19") {
    for (q <- Seq(TQ.q7VolumeShipping _, TQ.q8MarketShare _, TQ.q9ProductProfit _,
        TQ.q19Disjunctive _)) {
      val p = plan(q(spark, sf0001))
      assert(p.contains("BroadcastHashJoin"), p.take(2000))
    }
  }

  test("q13 keeps the outer join outer (filter inside the join condition)") {
    val p = plan(TQ.q13CustDist(spark, sf0001))
    assert(p.contains("LeftOuter"), p.take(2000))
    // zero-order customers must survive into the c_count = 0 bucket — pinned
    // on crafted rows (at sf0.001 every customer happens to have an order):
    // c1 has 2 kept orders, c2's only order is filtered BY THE JOIN CONDITION
    // (the Q13 trap: a WHERE would drop c2 entirely), c3 has none.
    import spark.implicits._
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val ord = Seq((10L, 1L, "1-URGENT"), (11L, 1L, "3-MEDIUM"), (12L, 2L, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val dist = cust
      .join(ord, col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "5-LOW",
        "left_outer")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(2L -> 1L, 0L -> 2L), dist)
  }

  test("no cartesian product anywhere in the 13 new shapes") {
    val qs = Seq(TQ.q2MinCost _, TQ.q4OrderPriority _, TQ.q7VolumeShipping _,
      TQ.q8MarketShare _, TQ.q9ProductProfit _, TQ.q11ImportantParts _,
      TQ.q12LateLines _, TQ.q13CustDist _, TQ.q15TopSupplier _,
      TQ.q16SupplierCnt _, TQ.q19Disjunctive _, TQ.q20ExcessShipments _,
      TQ.q21WaitingSupplier _)
    for (q <- qs) {
      val p = plan(q(spark, sf0001))
      // the scalar-subquery cross joins (q11 total, q15 max) broadcast a
      // 1-row side — BroadcastNestedLoopJoin over one row is constant work,
      // a CartesianProduct exchange is not
      assert(!p.contains("CartesianProduct"), p.take(2000))
    }
  }

  test("q21 rewrite matches the literal EXISTS/NOT-EXISTS on crafted edges") {
    import spark.implicits._
    // (orderkey, suppkey, shipdate) — edge cases the rewrite must honor:
    //  o1: unique max holder s1 (late), runner-up s2 → only s1 waits
    //  o2: s1 and s2 TIE at the max → both wait (NOT EXISTS strictly-later)
    //  o3: single supplier → EXISTS other-supplier fails, nobody waits
    //  o4: max holder s1 has TWO lines at distinct dates — only its last
    //      line is ≥ the others' max; earlier line must not count when it
    //      is older than s2's max
    //  o5: s2's later line is from the same supplier as the max — same-
    //      supplier later lines never veto (l3.suppkey <> l1.suppkey)
    val lines = Seq(
      (1L, 1L, "2024-01-09"), (1L, 2L, "2024-01-05"),
      (2L, 1L, "2024-01-07"), (2L, 2L, "2024-01-07"), (2L, 3L, "2024-01-02"),
      (3L, 1L, "2024-01-04"),
      (4L, 1L, "2024-01-03"), (4L, 1L, "2024-01-08"), (4L, 2L, "2024-01-06"),
      (5L, 2L, "2024-01-10"), (5L, 2L, "2024-01-01"), (5L, 1L, "2024-01-02")
    ).toDF("l_orderkey", "l_suppkey", "sd")
      .withColumn("l_shipdate", to_timestamp(col("sd"))).drop("sd")

    // literal form: semi-join EXISTS, anti-join NOT EXISTS
    val l2 = lines.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = lines.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
      col("l_shipdate").as("d3"))
    val literal = lines
      .join(l2, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3") &&
        col("d3") > col("l_shipdate"), "left_anti")
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // the aggregate rewrite, inlined from q21WaitingSupplier
    val perSup = lines.groupBy("l_orderkey", "l_suppkey").agg(max("l_shipdate").as("smax"))
    val o1 = perSup.groupBy(col("l_orderkey").as("k1"))
      .agg(max("smax").as("m1"), count(lit(1)).as("nsup"))
    val o2 = perSup.join(o1, col("l_orderkey") === col("k1"))
      .groupBy(col("l_orderkey").as("kk"), col("m1"), col("nsup"))
      .agg(sum(when(col("smax") === col("m1"), 1L).otherwise(0L)).as("n_at_m1"),
        max(when(col("smax") < col("m1"), col("smax"))).as("m2"))
    val rewrite = lines
      .join(perSup.withColumnsRenamed(Map("l_orderkey" -> "pk", "l_suppkey" -> "ps")),
        col("l_orderkey") === col("pk") && col("l_suppkey") === col("ps"))
      .join(o2, col("l_orderkey") === col("kk"))
      .withColumn("max_others",
        when(col("smax") === col("m1") && col("n_at_m1") === 1, col("m2")).otherwise(col("m1")))
      .filter(col("nsup") > 1 && col("l_shipdate") >= col("max_others"))
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(rewrite == literal, s"rewrite=$rewrite literal=$literal")
    // and the crafted expectations themselves
    assert(literal == Map(1L -> 3L, 2L -> 2L),
      s"o1: s1; o2: s1+s2 tie; o4: s1's late line; o5: s2; got $literal")
  }

  test("q15 returns every supplier tied at the exact max") {
    import spark.implicits._
    // two suppliers with identical integer revenue — both must surface
    val rev = Seq((1L, 123450L), (2L, 123450L), (3L, 99L)).toDF("k", "rev_e4")
    val mx = rev.agg(max("rev_e4").as("max_e4"))
    val winners = rev.crossJoin(broadcast(mx))
      .filter(col("rev_e4") === col("max_e4")).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(winners == Set(1L, 2L))
  }
}
