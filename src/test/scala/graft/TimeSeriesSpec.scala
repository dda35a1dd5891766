package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, String, Double)], timeCol: String) =
    rows.toDF("k", "t", "v")
      .select(col("k"), to_timestamp(col("t")).as(timeCol), col("v"))

  test("asofJoin: most recent right row at or before each left time") {
    val trades = df(Seq(
      (1L, "2024-01-01 10:00:05", 100.0),
      (1L, "2024-01-01 10:00:10", 101.0),
      (2L, "2024-01-01 10:00:01", 50.0)), "ts")
      .withColumnRenamed("v", "trade_px")
    val quotes = df(Seq(
      (1L, "2024-01-01 10:00:00", 99.0),
      (1L, "2024-01-01 10:00:05", 99.5),   // exact-time match: counts (<=)
      (1L, "2024-01-01 10:00:09", 99.9),
      (2L, "2024-01-01 10:00:02", 49.0)), "qts") // after the k=2 trade: no match
      .withColumnRenamed("v", "quote_px")
    val got = TimeSeriesOps.asofJoin(trades, quotes, "k", "ts", "qts")
      .select(col("k"), col("ts"), col("trade_px"), col("asof_quote_px"))
      .orderBy("k", "ts")
      .collect()
    assert(got.length == 3) // left join: every trade kept
    assert(got(0).getDouble(3) == 99.5)  // exact-time quote wins
    assert(got(1).getDouble(3) == 99.9)  // latest prior
    assert(got(2).isNullAt(3))           // no quote at-or-before → null
  }

  test("sessionize splits at gaps and counts events per session") {
    val got = TimeSeriesOps.sessionize(spark, sf0001, gapMinutes = 30)
    val perUser = got.groupBy("user_id")
      .agg(sum("n_events").as("total"))
    val events = graft.Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("total"))
    // every event lands in exactly one session
    assert(perUser.except(events).isEmpty && events.except(perUser).isEmpty)
    // session bounds are ordered
    got.collect().foreach { r =>
      assert(!r.getTimestamp(2).after(r.getTimestamp(3)))
    }
  }

  test("native AsOfJoinExec matches the composed union+window as-of exactly") {
    graft.catalyst.GraftExtensions.register(spark)
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val native = graft.plans.NativeAsOf
      .asofJoin(purchases, clicks, "user_id", "ts", "click_ts")
    // the physical plan runs the custom operator
    val phys = native.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), phys)
    val composed = TimeSeriesOps
      .asofJoin(purchases, clicks, "user_id", "ts", "click_ts")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "value", "asof_click_ts", "asof_click_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3), r.get(4)))
        .sortBy(_._1)
    val n = norm(native)
    val c = norm(composed)
    assert(n.length == c.length && n.length > 0)
    n.zip(c).foreach { case (a, b) => assert(a == b, s"native=$a composed=$b") }
  }

  test("native as-of: ties match and missing keys produce null right side") {
    graft.catalyst.GraftExtensions.register(spark)
    import spark.implicits._
    val l = Seq((1L, ts("2024-03-14 12:00:10"), "t1"),
      (1L, ts("2024-03-14 12:00:20"), "t2"),
      (2L, ts("2024-03-14 12:00:05"), "t3")) // key 2 has no right rows
      .toDF("k", "t", "tag")
    val r = Seq((1L, ts("2024-03-14 12:00:10"), 9.9), // tie with t1 → matches
      (1L, ts("2024-03-14 12:00:15"), 8.8))
      .toDF("k", "rt", "px")
    val got = graft.plans.NativeAsOf.asofJoin(l, r, "k", "t", "rt")
      .orderBy("tag").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Double]("asof_px") == 9.9)   // t1: tie matched
    assert(got(1).getAs[Double]("asof_px") == 8.8)   // t2: latest ≤ 12:00:20
    assert(got(2).isNullAt(got(2).fieldIndex("asof_px"))) // t3: no match
  }

  test("native as-of tolerance: boundary inclusive, stale match vetoed not replaced") {
    graft.catalyst.GraftExtensions.register(spark)
    import spark.implicits._
    val l = Seq(
      (1L, ts("2024-03-14 12:00:30"), "exact"),   // nearest is exactly 30 s old
      (1L, ts("2024-03-14 12:01:31"), "stale"),   // nearest is 31 s old -> vetoed
      (2L, ts("2024-03-14 12:00:10"), "fresh"))   // 5 s old
      .toDF("k", "t", "tag")
    val r = Seq(
      (1L, ts("2024-03-14 12:00:00"), 1.0), // 30 s before "exact"
      (1L, ts("2024-03-14 12:01:00"), 2.0), // 31 s before "stale" — and an older
      //  in-tolerance-of-nothing row must NOT be used as fallback
      (2L, ts("2024-03-14 12:00:05"), 3.0))
      .toDF("k", "rt", "px")
    val got = graft.plans.NativeAsOf
      .asofJoin(l, r, "k", "t", "rt", toleranceUnits = Some(30L * 1000000L))
      .orderBy("tag").collect()
    val byTag = got.map(row => row.getAs[String]("tag") ->
      (if (row.isNullAt(row.fieldIndex("asof_px"))) None else Some(row.getAs[Double]("asof_px")))).toMap
    assert(byTag("exact").contains(1.0)) // <= is inclusive
    assert(byTag("stale").isEmpty)       // vetoed, NOT replaced by the 12:00:00 row
    assert(byTag("fresh").contains(3.0))
    // wrong time type is rejected up front
    val e = intercept[IllegalArgumentException] {
      graft.plans.NativeAsOf.asofJoin(
        l.withColumn("t", col("tag")), r.withColumn("rt", lit("x")), "k", "t", "rt",
        toleranceUnits = Some(1L))
    }
    assert(e.getMessage.contains("tolerance"), e.getMessage)
    // ...including a bad LEFT time with a good right time: an int left vs
    // timestamp right is a MIXED pair, rejected by the unconditional
    // same-type require before the tolerance check ever runs
    val eLeft = intercept[IllegalArgumentException] {
      graft.plans.NativeAsOf.asofJoin(
        l.withColumn("t", lit(7)), r, "k", "t", "rt", toleranceUnits = Some(1L))
    }
    assert(eLeft.getMessage.contains("same type") && eLeft.getMessage.contains("t"),
      eLeft.getMessage)
    // both sides int: same type, so it's the tolerance check that rejects
    val eBoth = intercept[IllegalArgumentException] {
      graft.plans.NativeAsOf.asofJoin(
        l.withColumn("t", lit(7)), r.withColumn("rt", lit(8)), "k", "t", "rt",
        toleranceUnits = Some(1L))
    }
    assert(eBoth.getMessage.contains("tolerance"), eBoth.getMessage)
    // a mixed Timestamp-vs-Long pair is rejected even WITHOUT a tolerance:
    // timeOrd is built from the left type only, so µs-vs-raw-units would
    // silently mis-order instead of erroring
    val eMixed = intercept[IllegalArgumentException] {
      graft.plans.NativeAsOf.asofJoin(
        l, r.withColumn("rt", lit(1234567890123L)), "k", "t", "rt")
    }
    assert(eMixed.getMessage.contains("same type"), eMixed.getMessage)
  }

  test("native as-of: NULL keys never match (SQL join semantics)") {
    graft.catalyst.GraftExtensions.register(spark)
    import spark.implicits._
    val l = Seq(
      (Option(1L), ts("2024-03-14 12:00:10"), "t1"),
      (None: Option[Long], ts("2024-03-14 12:00:10"), "tn"))
      .toDF("k", "t", "tag")
    val r = Seq(
      (Option(1L), ts("2024-03-14 12:00:05"), 1.1),
      // a null-keyed right row must match NOTHING — not even a null left key
      (None: Option[Long], ts("2024-03-14 12:00:01"), 666.0))
      .toDF("k", "rt", "px")
    val got = graft.plans.NativeAsOf.asofJoin(l, r, "k", "t", "rt")
      .orderBy("tag").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Double]("asof_px") == 1.1)        // t1: normal match
    assert(got(1).isNullAt(got(1).fieldIndex("asof_px"))) // tn: null key → no match
  }
}
