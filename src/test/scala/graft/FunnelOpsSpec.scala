package graft

import org.apache.spark.sql.functions._
import graft.operators.FunnelOps

/** Pins the windowFunnel DP against crafted chain topologies and against an
  * independent O(n^3) exists-a-chain reference over real data — the spec is
  * deliberately NOT the greedy-earliest argument the oracle uses, so the
  * DP, the greedy oracle, and the brute force all triangulate.
  */
class FunnelOpsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000L // one hour in micros
  private val t0 = 1700000000000000L

  private def writeEvents(rows: Seq[(Long, Long, String)]): String = {
    val dir = tmpDir("funnel")
    rows.toDF("user_id", "ts_us", "event_type")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("windowFunnel: crafted chain topologies (W = 4h)") {
    val rows = Seq(
      // u1: clean 3-stage chain inside the window
      (1L, t0, "view"), (1L, t0 + 1 * H, "click"), (1L, t0 + 2 * H, "purchase"),
      // u2: first chain times out, a LATER view rescues level 2 (max-anchor DP)
      (2L, t0, "view"), (2L, t0 + 4 * H, "view"), (2L, t0 + 5 * H, "click"),
      // u3: no stage-1 event at all -> level 0
      (3L, t0, "click"), (3L, t0 + 1 * H, "purchase"),
      // u4: stage 1 only
      (4L, t0, "view"),
      // u5: purchase before click -> chain stops at level 1
      (5L, t0, "view"), (5L, t0 + 1 * H, "purchase"),
      // u6: all three at the SAME timestamp -> non-strict chaining, level 3
      (6L, t0, "view"), (6L, t0, "click"), (6L, t0, "purchase"),
      // u7: early anchor reaches only level 2 in-window; later anchor
      // (t0+3h) chains click(3h) + purchase(5h) within 4h -> level 3
      (7L, t0, "view"), (7L, t0 + 3 * H, "view"), (7L, t0 + 3 * H, "click"),
      (7L, t0 + 5 * H, "purchase"))
    val dir = writeEvents(rows)
    val got = FunnelOps.windowFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 3, 7L -> 3))
  }

  test("windowFunnel matches an O(n^3) exists-a-chain reference on sf0.001") {
    val w = FunnelOps.WindowSec * 1000000L
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type").isin(FunnelOps.Stages: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("ts"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val byStage = FunnelOps.Stages.map(st => rows.filter(_._3 == st).map(_._2))
      val l3 = byStage(0).exists(a => byStage(1).exists(b => byStage(2).exists(c =>
        a <= b && b <= c && c - a <= w)))
      val l2 = byStage(0).exists(a => byStage(1).exists(b => a <= b && b - a <= w))
      val l1 = byStage(0).nonEmpty
      u -> (if (l3) 3 else if (l2) 2 else if (l1) 1 else 0)
    }
    val got = FunnelOps.windowFunnel(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want, "funnel levels diverge from the brute-force reference")
    assert(got.values.toSet.size >= 2, "degenerate corpus: all users same level")
  }

  test("retention matches a driver-side fold on sf0.001") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        to_date(col("ts")).cast("string").as("day"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perUser = ev.groupBy(_._1).values.map { rows =>
      val cohort = rows.exists(r => r._2 == "signup" && r._3 < "2024-01-08")
      val viewed = rows.exists(r => r._2 == "view" &&
        r._3 >= "2024-01-08" && r._3 < "2024-01-15")
      val bought = rows.exists(r => r._2 == "purchase" &&
        r._3 >= "2024-01-08" && r._3 < "2024-01-15")
      (cohort, cohort && viewed, cohort && bought)
    }
    val want = (perUser.count(_._1).toLong, perUser.count(_._2).toLong,
      perUser.count(_._3).toLong)
    val r = FunnelOps.retention(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == want)
    assert(r.getLong(0) > 0, "cohort must be non-empty for the spec to bite")
  }

  test("seqMatch: crafted sequences incl. equal-timestamp ties") {
    val dir = writeEvents(Seq(
      // u1: v..c..p -> funnel hit, no error path
      (1L, t0, "view"), (1L, t0 + H, "click"), (1L, t0 + 2 * H, "purchase"),
      // u2: p before c -> "vpc": no funnel
      (2L, t0, "view"), (2L, t0 + H, "purchase"), (2L, t0 + 2 * H, "click"),
      // u3: error then purchase
      (3L, t0, "error"), (3L, t0 + H, "purchase"),
      // u4: tie at t0 -> (ts, ch) order = c before v -> "cv": no funnel
      (4L, t0, "view"), (4L, t0, "click"),
      // u5: signup only
      (5L, t0, "signup")))
    val got = FunnelOps.seqMatch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == Seq(
      (1L, "vcp", 1, 0), (2L, "vpc", 0, 0), (3L, "ep", 0, 1),
      (4L, "cv", 0, 0), (5L, "s", 0, 0)))
  }

  test("streaks: crafted island layouts") {
    val day = 86400L * 1000000L
    val dir = writeEvents(Seq(
      // u1: days 0,1,2 then 10 -> best streak 3, active 4
      (1L, t0, "view"), (1L, t0 + day, "view"), (1L, t0 + 2 * day, "view"),
      (1L, t0 + 10 * day, "view"),
      // u2: two events same day then a gap then 2-day island -> best 2, active 3
      (2L, t0, "view"), (2L, t0 + H, "click"),
      (2L, t0 + 5 * day, "view"), (2L, t0 + 6 * day, "view"),
      // u3: single day
      (3L, t0, "error")))
    val got = FunnelOps.streaks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 4L), (2L, 2L, 3L), (3L, 1L, 1L)))
  }
}
