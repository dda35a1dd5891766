package graft

import graft.queries.{AnalyticsQueries => AQ}

/** Pins the doubled/quadrupled-cents MAD arithmetic against a driver-side
  * BigDecimal brute force — the engine result must equal exact rational
  * median/MAD math, not merely DuckDB's replay of the same float ops.
  */
class RobustStatsSpec extends SparkSpec {

  private def exactMedianX2(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val n = s.size
    if (n % 2 == 1) 2L * s(n / 2) else s(n / 2 - 1) + s(n / 2)
  }

  test("gMadOutliers == BigDecimal brute force at sf0.001") {
    val cents = Tables.orders(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("o_orderstatus"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = cents.groupBy(_._1).toSeq.sortBy(_._1).map { case (st, rows) =>
      val cs = rows.map(_._2)
      val m2 = exactMedianX2(cs)
      val dev2 = cs.map(c => math.abs(2 * c - m2))
      val d4 = exactMedianX2(dev2)
      val outliers = dev2.count(d2 => 4 * d2 > 3 * d4)
      (st, cs.size.toLong, m2, d4, outliers.toLong)
    }
    val got = AQ.gMadOutliers(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(got.exists(_._5 > 0), "at least one group must have outliers to bite")
  }

  test("gExactPcts == sorted-array order statistics at sf0.001") {
    val cents = Tables.lineitem(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("l_returnflag"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("l_extendedprice") * 100)
          .cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def kth(s: Seq[Long], k: Long): Long = s((k - 1).toInt)
    val want = cents.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      val s = rows.map(_._2).sorted
      val n = s.size.toLong
      (g, n, kth(s, (n + 1) / 2), kth(s, (19 * n + 19) / 20), kth(s, (99 * n + 99) / 100))
    }
    val got = AQ.gExactPcts(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("gMode == brute-force most-frequent with smallest-value tie break") {
    val qty = Tables.lineitem(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("l_returnflag"),
        org.apache.spark.sql.functions.col("l_quantity").cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = qty.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      val counts = rows.groupBy(_._2).map { case (v, r) => (v, r.size.toLong) }
      val best = counts.toSeq.minBy { case (v, c) => (-c, v) }
      (g, best._1, best._2)
    }
    val got = AQ.gMode(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("gParetoShare == brute-force top-decile share at sf0.001") {
    import org.apache.spark.sql.functions.{col, round => rnd, sum => fsum}
    val rev = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("o_custkey"))
      .agg(fsum(rnd(col("o_totalprice") * 100).cast("long")).as("v"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    val want = rev.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      val vs = rows.map(_._2).sorted
      val n = vs.size
      val k = (n + 9) / 10
      val top = vs.takeRight(k).sum
      (g, n.toLong, vs.sum, top, top.toDouble / vs.sum.toDouble)
    }
    val got = AQ.gParetoShare(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want)
  }

  test("tsDrawdown == brute-force running-peak gap at sf0.001") {
    import org.apache.spark.sql.functions.{col, round => rnd}
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("ts"), col("event_id"),
        rnd(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0),
        (r.getTimestamp(1).getTime, r.getLong(2)), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      val cs = rows.sortBy(_._2).map(_._3)
      var peak = Long.MinValue; var dd = Long.MinValue
      cs.foreach { c => peak = math.max(peak, c); dd = math.max(dd, peak - c) }
      (t, cs.size.toLong, peak, dd)
    }
    val got = AQ.tsDrawdown(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("gMadOutliers plan: histogram medians, no group-buffering percentile") {
    // a percentile() aggregate materializes every group value in one task
    // (the 100 TB OOM); the histogram form must keep it out of the plan
    val plan = AQ.gMadOutliers(spark, sf0001).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"), plan.take(1500))
    assert(!plan.contains("ObjectHashAggregate"), plan.take(1500))
  }

  test("gArgMinMax is deterministic under value ties") {
    import spark.implicits._
    val df = Seq(("A", 100.0, 1L), ("A", 100.0, 2L), ("A", 50.0, 3L))
      .toDF("o_orderpriority", "o_totalprice", "o_orderkey")
    val dir = tmpDir("argmm")
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = AQ.gArgMinMax(spark, dir).collect()(0)
    // tie at 100.00 -> max(struct) resolves to the larger key
    assert((r.getLong(1), r.getLong(3)) == (2L, 3L))
  }
}
