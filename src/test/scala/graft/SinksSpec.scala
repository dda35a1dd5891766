package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sinks.{ExternalSink, JdbcSink, JdbcSinkConfig, ParquetSink}

/** ExternalSink contract through the testable ParquetSink (the JDBC impl
  * shares the trait; no DB server exists in this harness, so its append path
  * is compile-checked and its config mirrors the reference's DatabaseConfig).
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("A7/A10/A11 passthroughs: append, count, truncate") {
    val sink: ExternalSink = new ParquetSink(tmpDir("sink"))
    assert(sink.count(spark) == 0)
    sink.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    sink.append(Seq((3L, "c")).toDF("id", "v"))
    assert(sink.count(spark) == 3)
    sink.truncate(spark)
    assert(sink.count(spark) == 0)
  }

  test("format matrix: orc / json-lines / tsv round-trip losslessly") {
    val df = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
    val n = df.count()

    val orc = tmpDir("fmtOrc")
    df.write.mode("overwrite").orc(orc)
    assert(spark.read.orc(orc).count() == n)
    assert(spark.read.orc(orc).schema == df.schema)

    val json = tmpDir("fmtJson")
    df.write.mode("overwrite").json(json)
    val back = spark.read.schema(df.schema).json(json)
    assert(back.count() == n)

    val tsv = tmpDir("fmtTsv")
    df.write.mode("overwrite").option("sep", "\t").option("header", "true").csv(tsv)
    val tback = spark.read.option("sep", "\t").option("header", "true")
      .schema(df.schema).csv(tsv)
    assert(tback.count() == n)
    // values survive the round-trip (sum over an exact decimal cast)
    val sumIn = df.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head.getDecimal(0)
    val sumOut = tback.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head.getDecimal(0)
    assert(sumIn == sumOut)
  }

  test("streamFrom attaches the sink to a stream exactly-once") {
    val root = tmpDir("sinkStream")
    new java.io.File(s"$root/d").mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/d/f1.csv"), "1,x\n2,y".getBytes)
    val sink = new ParquetSink(tmpDir("sinkOut"))
    val stream = spark.readStream
      .schema("id LONG, v STRING")
      .csv(s"$root/*/")
    val q = sink.streamFrom(stream, tmpDir("sinkCk"), Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      assert(sink.count(spark) == 2)
      q.processAllAvailable() // no new data, no dups
      assert(sink.count(spark) == 2)
    } finally q.stop()
  }

  test("JdbcSink config carries the reference's tuning shape") {
    val cfg = JdbcSinkConfig("jdbc:clickhouse://localhost:8123/db", "tickers_data", "u", "p")
    assert(cfg.batchSize == 100000 && cfg.numPartitions == 32)
    new JdbcSink(cfg) // constructible; ClickHouse wire path needs a live server
  }

  test("JdbcSink end-to-end against embedded Derby: append, count, truncate, count") {
    // The real DriverManager path (reference: ClickHouseDAO.java:146-202)
    // against the embedded Derby that ships on Spark's classpath — an
    // in-process database, not a JDBC-shaped double. Uppercase table name:
    // Spark's dialect quotes identifiers in its CREATE, and Derby folds the
    // raw TRUNCATE/COUNT statements' unquoted names to uppercase — they
    // must meet at the same catalog entry.
    val cfg = JdbcSinkConfig("jdbc:derby:memory:graftSinkDb;create=true",
      "GRAFT_TICKS", user = "", password = "", numPartitions = 2)
    val sink: ExternalSink = new JdbcSink(cfg)
    try {
      sink.append(Seq((1L, "AVA-USDT", 0.61), (2L, "BTC-USDT", 64000.5))
        .toDF("SEQ", "TICKER", "PRICE"))
      sink.append(Seq((3L, "ETH-USDT", 3200.25)).toDF("SEQ", "TICKER", "PRICE"))
      assert(sink.count(spark) == 3)
      sink.truncate(spark)
      assert(sink.count(spark) == 0)
      // append after truncate lands in the (kept) table
      sink.append(Seq((4L, "SOL-USDT", 180.0)).toDF("SEQ", "TICKER", "PRICE"))
      assert(sink.count(spark) == 1)
    } finally {
      // embedded Derby: dropping the in-memory db signals via SQLException
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftSinkDb;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("exactly-once JDBC publish: replays add zero rows; stale stages reaped") {
    val url = "jdbc:derby:memory:graftEoDb;create=true"
    val cfg = JdbcSinkConfig(url, "EO_TICKS", user = "", password = "",
      numPartitions = 2)
    val sink = new JdbcSink(cfg)
    def rows(xs: (Long, String, Double)*) = xs.toDF("SEQ", "TICKER", "PRICE")
    try {
      // create the target, then empty it — appendExactlyOnce publishes into
      // an existing table (first-boot DDL is the caller's job, as for any
      // external warehouse)
      sink.append(rows((0L, "BOOT", 0.0)))
      sink.truncate(spark)
      assert(sink.appendExactlyOnce(rows((1L, "A", 1.0), (2L, "B", 2.0)), 0L))
      assert(sink.appendExactlyOnce(rows((3L, "C", 3.0)), 1L))
      assert(sink.count(spark) == 3)
      // checkpoint replay of batch 0: the ledger blocks the publish
      assert(!sink.appendExactlyOnce(rows((1L, "A", 1.0), (2L, "B", 2.0)), 0L))
      assert(sink.count(spark) == 3)
      // crash window between commit and stage drop: a stage for an already-
      // ledgered batch lingers — the sweep reaps exactly it
      rows((9L, "X", 9.0)).write.format("jdbc")
        .option("url", url).option("dbtable", "EO_TICKS_STAGE_1")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
      assert(sink.sweepStaleStages() == 1)
      // an unledgered stage (crash BEFORE the txn) must not be reaped —
      // its batch is still owed a publish
      rows((7L, "Y", 7.0)).write.format("jdbc")
        .option("url", url).option("dbtable", "EO_TICKS_STAGE_7")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
      assert(sink.sweepStaleStages() == 0)
      assert(sink.appendExactlyOnce(rows((7L, "Y", 7.0)), 7L))
      assert(sink.count(spark) == 4)
    } finally {
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftEoDb;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("streamFromExactlyOnce: micro-batches publish once through the ledger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val url = "jdbc:derby:memory:graftStreamEoDb;create=true"
    val cfg = JdbcSinkConfig(url, "SEO_TICKS", user = "", password = "",
      numPartitions = 2)
    val sink = new JdbcSink(cfg)
    try {
      sink.append(Seq((0L, "BOOT", 0.0)).toDF("SEQ", "TICKER", "PRICE"))
      sink.truncate(spark)
      implicit val sq = spark.sqlContext
      val in = MemoryStream[(Long, String, Double)]
      val q = sink.streamFromExactlyOnce(
        in.toDF().toDF("SEQ", "TICKER", "PRICE"),
        tmpDir("seo-ckpt"),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      try {
        in.addData((1L, "A", 1.0), (2L, "B", 2.0))
        q.processAllAvailable()
        in.addData((3L, "C", 3.0))
        q.processAllAvailable()
      } finally q.stop()
      assert(sink.count(spark) == 3)
      // the engine-level replay of a committed batch publishes nothing:
      // foreachBatch ids are stable across checkpoint replays, and ids 0/1
      // are in the ledger now
      assert(!sink.appendExactlyOnce(
        Seq((1L, "A", 1.0), (2L, "B", 2.0)).toDF("SEQ", "TICKER", "PRICE"), 0L))
      assert(!sink.appendExactlyOnce(
        Seq((3L, "C", 3.0)).toDF("SEQ", "TICKER", "PRICE"), 1L))
      assert(sink.count(spark) == 3)
    } finally {
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftStreamEoDb;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("JDBC read-back with filter pushdown reaches the external database") {
    val url = "jdbc:derby:memory:graftRbDb;create=true"
    val cfg = JdbcSinkConfig(url, "RB_TICKS", user = "", password = "",
      numPartitions = 2)
    val sink = new JdbcSink(cfg)
    try {
      sink.append(Seq((1L, "AVA", 0.5), (2L, "BTC", 64000.0), (3L, "ETH", 3200.0))
        .toDF("SEQ", "TICKER", "PRICE"))
      // the read half of the external-warehouse loop: filters are pushed
      // INTO the database (the JDBC scan's PushedFilters), not applied in
      // Spark after a full-table fetch
      val back = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "RB_TICKS").load()
        .filter(col("PRICE") > 1000.0)
      assert(back.count() == 2)
      val plan = back.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("PRICE"),
        s"filter not pushed to the JDBC source:\n$plan")
    } finally {
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftRbDb;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }
}
