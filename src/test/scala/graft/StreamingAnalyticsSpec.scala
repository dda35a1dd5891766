package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingAnalytics

/** Streaming ingest + watermarked windowed aggregation e2e over file-source
  * fixtures (the always-on twins of the batch hot path and OHLC query).
  */
class StreamingAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def writeTicks(root: String, date: String, name: String,
      lines: Seq[String]): Unit = {
    val dir = new java.io.File(s"$root/$date"); dir.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/$date/$name"),
      lines.mkString("\n").getBytes)
    ()
  }

  private def tick(ticker: String, seq: Long, price: Double, t: String): String =
    s"$ticker,$seq,$price,10.0,${price + 0.01},100.0,${price - 0.01},80.5,$t"

  test("streaming ingest appends validated rows into the partitioned warehouse") {
    val root = tmpDir("singest")
    val wh = tmpDir("swh")
    writeTicks(root, "2024-03-14", "AVA-USDT_PST_2024-03-14", Seq(
      tick("AVA-USDT", 1, 0.61, "2024-03-14T12:00:01.000"),
      "BROKEN,LINE",
      tick("AVA-USDT", 2, 0.62, "2024-03-14T12:00:02.000")))
    val q = StreamingAnalytics.ingestStream(spark, root, wh, tmpDir("sck"),
      trigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      val got = spark.read.parquet(wh)
      assert(got.count() == 2) // corrupt line dropped
      assert(got.select("file_date").distinct().as[java.sql.Date].head() == dt("2024-03-14"))
      // new file in a new date dir arrives → exactly-once append
      writeTicks(root, "2024-03-15", "AVA-USDT_PST_2024-03-15",
        Seq(tick("AVA-USDT", 3, 0.63, "2024-03-15T09:00:00.000")))
      q.processAllAvailable()
      assert(spark.read.parquet(wh).count() == 3)
      q.processAllAvailable() // no new files → no duplicates
      assert(spark.read.parquet(wh).count() == 3)
    } finally q.stop()
  }

  test("watermarked windowed OHLC finalizes windows as the watermark advances") {
    val root = tmpDir("sohlc")
    val out = tmpDir("sohlcOut")
    writeTicks(root, "2024-03-14", "batch1", Seq(
      tick("AVA-USDT", 1, 0.50, "2024-03-14T12:00:05.000"),
      tick("AVA-USDT", 2, 0.70, "2024-03-14T12:00:20.000"),
      tick("AVA-USDT", 3, 0.60, "2024-03-14T12:00:50.000"),
      tick("BTC-USDT", 4, 100.0, "2024-03-14T12:00:30.000")))
    val q = StreamingAnalytics.ohlcStream(spark, root, out, tmpDir("sohlcCk"),
      window_ = "1 minute", watermark = "0 seconds", trigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      // second batch far in the future pushes the watermark past 12:01 →
      // the 12:00 windows finalize and emit
      writeTicks(root, "2024-03-14", "batch2",
        Seq(tick("AVA-USDT", 5, 0.99, "2024-03-14T13:00:00.000")))
      q.processAllAvailable()
      val got = spark.read.parquet(out)
      val ava = got.filter(col("ticker") === "AVA-USDT" &&
        col("bucket_start") === ts("2024-03-14 12:00:00")).collect()
      assert(ava.length == 1)
      val r = ava.head
      assert(r.getAs[Double]("open") == 0.50)
      assert(r.getAs[Double]("high") == 0.70)
      assert(r.getAs[Double]("low") == 0.50)
      assert(r.getAs[Double]("close") == 0.60)
      assert(r.getAs[Long]("n_ticks") == 3)
      assert(got.filter(col("ticker") === "BTC-USDT").count() == 1)
    } finally q.stop()
  }

  test("ingest stream restarts from its checkpoint exactly-once (stop → new files → new query)") {
    val root = tmpDir("restartIngest")
    val wh = tmpDir("restartWh")
    val ck = tmpDir("restartCk")
    writeTicks(root, "2024-03-14", "AVA-USDT_PST_2024-03-14",
      Seq(tick("AVA-USDT", 1, 0.61, "2024-03-14T12:00:01.000")))
    val q1 = StreamingAnalytics.ingestStream(spark, root, wh, ck,
      trigger = Trigger.ProcessingTime(0))
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(wh).count() == 1)
    // files arriving while the query is DOWN...
    writeTicks(root, "2024-03-14", "BTC-USDT_PST_2024-03-14",
      Seq(tick("BTC-USDT", 2, 0.62, "2024-03-14T12:00:02.000")))
    // ...are picked up by a NEW query on the same checkpoint; f1 is not
    // re-ingested (the checkpointed seen-file map survives the restart)
    val q2 = StreamingAnalytics.ingestStream(spark, root, wh, ck,
      trigger = Trigger.ProcessingTime(0))
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(wh)
      assert(got.count() == 2)
      assert(got.select("sequence").as[Long].collect().toSet == Set(1L, 2L))
    } finally q2.stop()
  }

  test("windowed HLL distinct: update-mode estimate across batches == batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val events = in.toDF().toDF("ts", "user_id")
    val q = StreamingAnalytics.windowedDistinctUsers(events, width = "1 hour")
      .writeStream.format("memory").queryName("wdu")
      .outputMode(OutputMode.Update).start()
    val b1 = Seq((ts("2024-03-14 12:05:00"), 1L), (ts("2024-03-14 12:10:00"), 2L),
      (ts("2024-03-14 12:20:00"), 1L))
    val b2 = Seq((ts("2024-03-14 12:40:00"), 3L), (ts("2024-03-14 12:45:00"), 2L),
      (ts("2024-03-14 13:05:00"), 9L))
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      // last update per window = the merged-sketch estimate
      val got = spark.table("wdu").collect()
        .groupBy(_.getAs[java.sql.Timestamp]("bucket_start"))
        .map { case (k, rows) => k -> rows.maxBy(_.getAs[Long]("n_events")) }
      val noon = got(ts("2024-03-14 12:00:00"))
      // batch recompute over the union of both batches
      import spark.implicits._
      val batch = (b1 ++ b2).toDF("ts", "user_id")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("u"))
        .filter(col("window.start") === ts("2024-03-14 12:00:00"))
        .first().getAs[Long]("u")
      assert(noon.getAs[Long]("approx_users") == batch)
      assert(batch == 3L) // tiny cardinality: the sketch is exact here
      assert(noon.getAs[Long]("n_events") == 5L)
    } finally q.stop()
  }

  test("session_window stream: inactivity gap splits sessions, sessions emit past watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val events = in.toDF().toDF("ts", "user_id")
    val q = StreamingAnalytics.sessionizedEvents(events, gap = "10 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (ts("2024-03-14 12:00:00"), 1L), (ts("2024-03-14 12:05:00"), 1L), // session A
        (ts("2024-03-14 12:30:00"), 1L)) // >10 min gap → session B
      q.processAllAvailable()
      in.addData((ts("2024-03-14 15:00:00"), 99L)) // advance watermark → emit
      q.processAllAvailable()
      val got = spark.table("sessions").filter(col("user_id") === 1L).collect()
      assert(got.length == 2, got.mkString("; "))
      val bySize = got.map(r => (r.getAs[Long]("n_events"),
        r.getAs[java.sql.Timestamp]("session_start"))).sortBy(_._2.getTime)
      assert(bySize(0)._1 == 2 && bySize(1)._1 == 1)
    } finally q.stop()
  }

  test("stream-stream interval join: in-horizon clicks attach, late/out-of-horizon do not") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vIn = MemoryStream[(Long, java.sql.Timestamp)]
    val cIn = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingAnalytics.clickAttribution(
        vIn.toDF().toDF("v_user", "view_ts"), cIn.toDF().toDF("c_user", "click_ts"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      vIn.addData((1L, ts("2024-03-14 12:00:00")), (2L, ts("2024-03-14 12:00:00")))
      q.processAllAvailable()
      cIn.addData(
        (1L, ts("2024-03-14 12:30:00")),  // in horizon -> joins
        (2L, ts("2024-03-14 14:30:00")),  // past 1h horizon -> dropped
        (3L, ts("2024-03-14 12:10:00")))  // no matching view -> dropped
      q.processAllAvailable()
      val got = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2))).toSet
      assert(got == Set((1L, ts("2024-03-14 12:30:00"))))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups across micro-batches with bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val rows = in.toDF().toDF("ts", "filename")
    val out = tmpDir("sdedupOut")
    val q = StreamingAnalytics.dedupStream(rows, "ts", "10 minutes", Seq("filename"))
      .writeStream.option("checkpointLocation", tmpDir("sdedupCk"))
      .format("parquet").option("path", out)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData((ts("2024-03-14 12:00:00"), "f1"), (ts("2024-03-14 12:00:01"), "f1"))
      q.processAllAvailable()
      in.addData((ts("2024-03-14 12:00:02"), "f1"), (ts("2024-03-14 12:00:03"), "f2"))
      q.processAllAvailable()
      val got = spark.read.parquet(out)
      assert(got.count() == 2) // f1 once (within watermark), f2 once
      assert(got.select("filename").as[String].collect().toSet == Set("f1", "f2"))
    } finally q.stop()
  }

  test("transformWithState: per-source token budget admits until crossing, state survives batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.{DocIn, SourceBudget}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[DocIn]
    val q = SourceBudget.decisions(in.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("budget")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: webA consumes 60 (admitted, below budget)
      in.addData(DocIn("webA", 1L, 60L), DocIn("books", 10L, 30L))
      q.processAllAvailable()
      // batch 2: webA crosses the budget (60 < 100 → admit, cum 150);
      // books stays under
      in.addData(DocIn("webA", 2L, 90L), DocIn("books", 11L, 30L))
      q.processAllAvailable()
      // batch 3: webA is over (150 >= 100 → reject); books crosses (admit)
      in.addData(DocIn("webA", 3L, 10L), DocIn("books", 12L, 50L))
      q.processAllAvailable()
      val got = spark.table("budget").as[(String, Long, Boolean, Long)].collect()
        .map(r => r._2 -> ((r._3, r._4))).toMap
      assert(got(1L) == ((true, 60L)))
      assert(got(2L) == ((true, 150L)))  // crossing doc admitted
      assert(got(3L) == ((false, 150L))) // post-crossing rejected, state held
      assert(got(10L) == ((true, 30L)) && got(11L) == ((true, 60L)))
      assert(got(12L) == ((true, 110L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join with watermarks (trade ↔ prior quote)") {
    import org.apache.spark.sql.streaming.OutputMode
    val root = tmpDir("ssj")
    writeTicks(root, "2024-03-14", "trades", Seq(
      tick("AVA-USDT", 100, 0.61, "2024-03-14T12:00:30.000")))
    writeTicks(root, "2024-03-14", "quotes", Seq(
      tick("AVA-USDT", 1, 0.60, "2024-03-14T12:00:10.000"),
      tick("AVA-USDT", 2, 0.605, "2024-03-14T12:00:25.000"),
      tick("AVA-USDT", 3, 0.62, "2024-03-14T12:05:00.000"))) // after the trade: no match
    def src(name: String) = spark.readStream
      .schema(graft.schema.Schemas.ticker)
      .option("pathGlobFilter", name)
      .csv(s"$root/*/")
    val trades = src("trades")
      .select(col("ticker"), col("sequence").as("trade_seq"),
        col("price").as("trade_px"), col("transactionTime").as("t_time"))
      .withWatermark("t_time", "0 seconds")
    val quotes = src("quotes")
      .select(col("ticker").as("q_ticker"), col("sequence").as("quote_seq"),
        col("price").as("quote_px"), col("transactionTime").as("q_time"))
      .withWatermark("q_time", "0 seconds")
    // each trade joins quotes from the preceding minute (interval condition
    // bounds both watermarked state stores)
    val joined = trades.join(quotes,
      col("ticker") === col("q_ticker") &&
        col("q_time") <= col("t_time") &&
        col("q_time") > col("t_time") - org.apache.spark.sql.functions.expr("INTERVAL 1 MINUTE"))
    val out = tmpDir("ssjOut")
    val q = joined.writeStream
      .option("checkpointLocation", tmpDir("ssjCk"))
      .format("parquet").option("path", out)
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      val got = spark.read.parquet(out)
      assert(got.count() == 2) // quotes 1 and 2 match; quote 3 is after the trade
      assert(got.select("quote_seq").as[Long].collect().toSet == Set(1L, 2L))
    } finally q.stop()
  }
}
