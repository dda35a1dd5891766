package graft

import org.apache.spark.sql.functions._

/** DataSource V2 connector contract: schema, determinism, partition math,
  * column pruning and source-side filter pushdown.
  */
class TicksSourceSpec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Int = 10000, partitions: Int = 4, tickers: Int = 8) =
    spark.read.format("graft.sources.TicksSourceProvider")
      .option("rows", rows).option("partitions", partitions)
      .option("tickers", tickers).load()

  test("generates exactly `rows` deterministic rows across `partitions` splits") {
    val df = ticks()
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 4)
    val r = df.filter(col("sequence") === 4242L).collect()(0)
    assert(r.getAs[String]("ticker") == "TCK2-USDT") // 4242 % 8 = 2
    assert(r.getAs[Double]("price") == 0.5 + (4242 % 9000) / 10000.0)
    // re-read: identical content (pure function of the index)
    assert(ticks().agg(sum("sequence")).head().getLong(0) ==
      df.agg(sum("sequence")).head().getLong(0))
  }

  test("column pruning reaches the source (ReadSchema carries only requested fields)") {
    val df = ticks().select("sequence", "price")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ticker"), plan)
    assert(df.count() == 10000)
  }

  test("ticker equality pushes into the source; residual filters stay post-scan") {
    val df = ticks().filter(col("ticker") === "TCK3-USDT")
    // pushdown proof, both directions: Spark removed the predicate from the
    // plan (no Filter node survives — only residuals would), AND the result
    // is correct, so the source must have applied it
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Filter"), optimized)
    assert(df.count() == 1250) // 10000 / 8 tickers
    // non-pushable predicate still answered correctly above the scan
    val mixed = ticks().filter(col("ticker") === "TCK3-USDT" && col("price") > 0.6)
    assert(mixed.count() ==
      ticks().collect().count(r => r.getString(0) == "TCK3-USDT" && r.getDouble(2) > 0.6))
  }

  test("micro-batch stream: admission control paces batches, offsets cover every row once") {
    val out = tmpDir("ticksStreamOut")
    val q = spark.readStream.format("graft.sources.TicksSourceProvider")
      .option("rows", 100000).option("partitions", 4).option("tickers", 8)
      .load()
      .writeStream
      .option("checkpointLocation", tmpDir("ticksStreamCk"))
      .format("parquet").option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      val got = spark.read.parquet(out)
      assert(got.count() == 100000)
      // exactly-once: every index exactly one row
      assert(got.select("sequence").distinct().count() == 100000)
      // admission control: 25k-row batches → at least 4 micro-batches ran
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }
}
