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
}
