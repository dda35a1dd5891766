package graft

import org.apache.spark.sql.functions._
import graft.ingest.{PartitionStats, TickerIngest}

/** Incremental ANALYZE at ingest commit: per-partition stats rows,
  * stats-only global aggregates, price-range pruning, and the
  * recompute-not-merge refresh contract under re-ingest.
  */
class PartitionStatsSpec extends SparkSpec {

  private def line(ticker: String, seq: Long, price: Double, ts: String) =
    s"$ticker,$seq,$price,15.2,${price + 0.001},100.0,${price - 0.001},80.5,$ts"

  private def put(root: String, date: String, name: String,
      lines: Seq[String]): String = {
    new java.io.File(s"$root/$date").mkdirs()
    val p = s"$root/$date/$name"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      lines.mkString("\n").getBytes)
    p
  }

  test("commit maintains per-partition stats; reads never touch data files") {
    val root = tmpDir("ps")
    val wh = tmpDir("pswh")
    spark.conf.set("spark.graft.ingest.stats", "true")
    try {
      val f1 = put(root, "2024-03-14", "AVA-USDT_PST_2024-03-14", Seq(
        line("AVA-USDT", 100, 0.61, "2024-03-14T10:00:00.000"),
        line("AVA-USDT", 101, 0.63, "2024-03-14T10:00:01.000")))
      val f2 = put(root, "2024-03-15", "BTC-USDT_PST_2024-03-15", Seq(
        line("BTC-USDT", 500, 64000.25, "2024-03-15T09:00:00.000")))
      TickerIngest.ingest(spark, Seq(f1, f2), wh)

      val st = PartitionStats.stats(spark, wh).collect()
        .map(r => r.getAs[String]("file_date") -> r).toMap
      assert(st.keySet == Set("2024-03-14", "2024-03-15"))
      val d1 = st("2024-03-14")
      assert(d1.getLong(0) == 2 && d1.getLong(1) == 1)       // rows, tickers
      assert(d1.getLong(2) == 100 && d1.getLong(3) == 101)   // seq range
      assert(d1.getLong(4) == 61 && d1.getLong(5) == 63)     // price cents
      val d2 = st("2024-03-15")
      assert(d2.getLong(0) == 1 && d2.getLong(4) == 6400025)

      // stats-only global summary matches the warehouse exactly
      val g = PartitionStats.globalSummary(spark, wh).first()
      assert(g.getLong(0) == TickerIngest.warehouse(spark, wh).count())
      assert(g.getLong(1) == 100 && g.getLong(2) == 500)

      // price-range pruning: a cents window touching only one partition
      assert(PartitionStats.pruneByPrice(spark, wh, 50, 100) == Seq("2024-03-14"))
      assert(PartitionStats.pruneByPrice(spark, wh, 6000000, 7000000) == Seq("2024-03-15"))
      assert(PartitionStats.pruneByPrice(spark, wh, 0, Long.MaxValue)
        == Seq("2024-03-14", "2024-03-15"))

      // re-ingest into an existing partition: refresh RECOMPUTES (append
      // grows the count by exactly the new rows; no double counting)
      val f3 = put(root, "2024-03-14", "ETH-USDT_PST_2024-03-14", Seq(
        line("ETH-USDT", 900, 3200.5, "2024-03-14T11:00:00.000")))
      TickerIngest.ingest(spark, Seq(f3), wh)
      val d1b = PartitionStats.stats(spark, wh)
        .filter(col("file_date") === "2024-03-14").first()
      assert(d1b.getLong(0) == 3 && d1b.getLong(1) == 2)
      assert(d1b.getLong(3) == 900 && d1b.getLong(5) == 320050)
      // untouched partition's stats row is untouched
      val d2b = PartitionStats.stats(spark, wh)
        .filter(col("file_date") === "2024-03-15").first()
      assert(d2b.getLong(0) == 1)
    } finally spark.conf.set("spark.graft.ingest.stats", "false")
  }

  test("stats disabled (default): commit writes no stats tree") {
    val root = tmpDir("psoff")
    val wh = tmpDir("psoffwh")
    val f = put(root, "2024-03-14", "AVA-USDT_PST_2024-03-14",
      Seq(line("AVA-USDT", 1, 0.5, "2024-03-14T10:00:00.000")))
    TickerIngest.ingest(spark, Seq(f), wh)
    assert(!new java.io.File(s"$wh/_stats").exists())
  }

  test("compaction preserves stats correctness (content-identical rewrite)") {
    val root = tmpDir("psc")
    val wh = tmpDir("pscwh")
    spark.conf.set("spark.graft.ingest.stats", "true")
    try {
      // several small ingests fragment the partition
      (1 to 4).foreach { i =>
        val f = put(root, "2024-03-14", s"AVA-USDT_${i}_2024-03-14", Seq(
          line("AVA-USDT", 100L + i, 0.60 + i * 0.01, "2024-03-14T10:00:00.000")))
        TickerIngest.ingest(spark, Seq(f), wh)
      }
      val before = PartitionStats.stats(spark, wh).first()
      assert(before.getLong(0) == 4)
      TickerIngest.compactPartition(spark, wh, dt("2024-03-14"))
      // rows unchanged -> the (not-refreshed) stats still describe the data
      val g = PartitionStats.globalSummary(spark, wh).first()
      assert(g.getLong(0) == TickerIngest.warehouse(spark, wh).count())
    } finally spark.conf.set("spark.graft.ingest.stats", "false")
  }
}
