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

  test("aggregate pushdown: COUNT/MIN/MAX answered by the source, no agg node in the plan") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    // global aggregate, with a pushed filter underneath
    val global = ticks().filter(col("ticker") === "TCK3-USDT")
      .agg(count(lit(1)).as("n"), min("sequence").as("mn"), max("sequence").as("mx"),
        min("price").as("pmin"), max("price").as("pmax"))
    assert(global.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty,
      global.queryExecution.optimizedPlan.toString)
    val g = global.head()
    assert(g.getLong(0) == 1250 && g.getLong(1) == 3L && g.getLong(2) == 9995L)
    // oracle the min/max price against the brute-force scan
    val brute = ticks().filter(col("ticker") === "TCK3-USDT")
      .selectExpr("min(price)", "max(price)").head()
    assert(g.getDouble(3) == brute.getDouble(0) && g.getDouble(4) == brute.getDouble(1))

    // grouped by ticker: complete pushdown, one row per symbol
    val grouped = ticks().groupBy("ticker").agg(count(lit(1)).as("n"), max("size").as("s"))
    assert(grouped.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty)
    val rows = grouped.collect()
    assert(rows.length == 8 && rows.map(_.getLong(1)).sum == 10000)

    // SUM is not translatable -> graceful fallback to scan + aggregate
    val sumDf = ticks().agg(sum("sequence"))
    assert(sumDf.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty)
    assert(sumDf.head().getLong(0) == 10000L * 9999 / 2)
  }

  test("pushed aggregate over a TRILLION-row table answers instantly (closed form)") {
    val t = spark.read.format("graft.sources.TicksSourceProvider")
      .option("rows", 1000000000000L).option("partitions", 8).option("tickers", 16).load()
    val start = System.nanoTime()
    val r = t.filter(col("ticker") === "TCK7-USDT")
      .agg(count(lit(1)).as("n"), max("sequence").as("mx"), max("price").as("p")).head()
    val elapsedMs = (System.nanoTime() - start) / 1e6
    assert(r.getLong(0) == 62500000000L) // 10^12 / 16
    assert(r.getLong(1) == 999999999991L) // last index ≡ 7 (mod 16)
    assert(r.getDouble(2) == 0.5 + 8999 / 10000.0) // full price cycle present
    assert(elapsedMs < 30000, s"closed-form aggregate took ${elapsedMs} ms")
  }

  test("regression: limit over a pushed grouped aggregate keeps the Limit semantics") {
    // pushLimit must refuse when an aggregate is already pushed — accepting
    // it (with isPartiallyPushed=false) would delete the Limit node while
    // the aggregate branch emits every group
    val df = ticks().groupBy("ticker").agg(count(lit(1)).as("n")).limit(2)
    assert(df.collect().length == 2)
  }

  test("regression: conflicting ticker equalities return the empty set") {
    // only the FIRST equality may be claimed as pushed; the second must
    // stay a post-scan filter (Catalyst does not fold A='x' AND A='y')
    val both = ticks().filter(col("ticker") === "TCK1-USDT" && col("ticker") === "TCK2-USDT")
    assert(both.count() == 0)
    assert(both.agg(count(lit(1))).head().getLong(0) == 0) // through the agg path too
    // duplicate identical equalities still work
    assert(ticks().filter(col("ticker") === "TCK1-USDT" && col("ticker") === "TCK1-USDT")
      .count() == 1250)
  }

  test("regression: grouped agg + pushed equality on an empty ticker stripe emits no group") {
    // rows < tickers leaves the high symbols with zero rows; a pushed
    // ticker-equality on such a symbol must produce NO group, not a phantom
    // (ticker, 0, null, null) row — matching vanilla groupBy-over-nothing
    val t = ticks(rows = 7, partitions = 2, tickers = 16)
    val empty = t.filter(col("ticker") === "TCK9-USDT") // k=9 >= rows=7
      .groupBy("ticker").agg(count(lit(1)).as("n"), min("sequence").as("mn"))
    assert(empty.collect().isEmpty, empty.collect().mkString(","))
    // a populated stripe under the same config still answers
    val one = t.filter(col("ticker") === "TCK5-USDT")
      .groupBy("ticker").agg(count(lit(1)).as("n")).collect()
    assert(one.length == 1 && one(0).getLong(1) == 1L)
  }

  test("aggregate pushdown property: closed form == brute force on random configs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 8) {
      val rows = 1 + rnd.nextInt(20000)
      val tickers = 1 + rnd.nextInt(40)
      val parts = 1 + rnd.nextInt(8)
      val t = ticks(rows, parts, tickers)
      val filt = rnd.nextInt(3) match {
        case 0 => t
        case 1 => t.filter(col("ticker") === s"TCK${rnd.nextInt(tickers * 2)}-USDT")
        case _ => t.filter(col("ticker") === "NOPE") // matches nothing
      }
      val all = filt.select("ticker", "sequence", "price", "size").collect()
      val g = filt.agg(count(lit(1)), min("sequence"), max("sequence"),
        min("price"), max("price"), min("size"), max("size"), min("ticker"), max("ticker"))
        .head()
      assert(g.getLong(0) == all.length, s"trial $trial count")
      if (all.nonEmpty) {
        assert(g.getLong(1) == all.map(_.getLong(1)).min && g.getLong(2) == all.map(_.getLong(1)).max)
        assert(g.getDouble(3) == all.map(_.getDouble(2)).min && g.getDouble(4) == all.map(_.getDouble(2)).max)
        assert(g.getDouble(5) == all.map(_.getDouble(3)).min && g.getDouble(6) == all.map(_.getDouble(3)).max)
        assert(g.getString(7) == all.map(_.getString(0)).min && g.getString(8) == all.map(_.getString(0)).max)
      } else assert(g.isNullAt(1) && g.isNullAt(3) && g.isNullAt(7), s"trial $trial empty-set nulls")
      // grouped: per-ticker count/min/max equal the brute groupings
      val grouped = filt.groupBy("ticker")
        .agg(count(lit(1)).as("n"), min("sequence").as("mn"), max("price").as("mp"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      val brute = all.groupBy(_.getString(0)).map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.map(_.getLong(1)).min, rs.map(_.getDouble(2)).max)) }
      assert(grouped == brute, s"trial $trial grouped")
    }
  }

  test("limit pushdown: scan emits exactly n rows, bounded index walk at any scale") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit}
    val t = spark.read.format("graft.sources.TicksSourceProvider")
      .option("rows", 1000000000000L).option("partitions", 8).option("tickers", 16).load()
    val limited = t.filter(col("ticker") === "TCK5-USDT").limit(5)
    // fully pushed: no Limit survives in the optimized plan
    val lp = limited.queryExecution.optimizedPlan
    assert(lp.collect { case l @ (_: GlobalLimit | _: LocalLimit) => l }.isEmpty, lp.toString)
    val out = limited.collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 21L, 37L, 53L, 69L))
    // limit larger than the (filtered) table: all rows, no phantom padding
    val tiny = ticks(rows = 7, partitions = 2, tickers = 16)
      .filter(col("ticker") === "TCK5-USDT").limit(99)
    assert(tiny.collect().map(_.getLong(1)).toSeq == Seq(5L))
  }

  test("clusterByTicker: key-grouped scan aggregates and joins with no shuffle") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      def clustered() = spark.read.format("graft.sources.TicksSourceProvider")
        .option("rows", 1600).option("tickers", 8)
        .option("clusterByTicker", "true").load()

      // avg is NOT translatable for agg pushdown → a real row scan, whose
      // key-grouped layout must satisfy the aggregation's clustering
      val agg = clustered().groupBy("ticker").agg(avg("price").as("p"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), aggPlan)
      val got = agg.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = ticks(rows = 1600, tickers = 8)
        .groupBy("ticker").agg(avg("price").as("p")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      // layouts sum in different orders → compare to float tolerance
      assert(got.keySet == want.keySet)
      got.foreach { case (t, p) => assert(math.abs(p - want(t)) < 1e-9, t) }

      // storage-partitioned join: both sides report the same key-grouped
      // layout → SortMergeJoin with no exchange on either side
      val right = clustered().filter(col("sequence") < 16)
        .select(col("ticker"), col("price").as("ref_px"))
      val j = clustered().join(right, Seq("ticker"))
      val jPlan = j.queryExecution.executedPlan.toString
      assert(jPlan.contains("SortMergeJoin"), jPlan)
      assert(!jPlan.contains("Exchange"), jPlan)
      assert(j.count() == 1600L * 2) // 2 reference rows per ticker
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("clusterByTicker preserves content, pushdowns unaffected") {
    def clustered(rows: Int) = spark.read.format("graft.sources.TicksSourceProvider")
      .option("rows", rows).option("tickers", 8)
      .option("clusterByTicker", "true").load()
    // same multiset of rows as the range-partitioned layout
    val a = clustered(4000).orderBy("sequence").collect()
    val b = ticks(rows = 4000, tickers = 8).orderBy("sequence").collect()
    assert(a.toSeq == b.toSeq)
    // ticker-equality pushdown prunes to ONE key-grouped partition
    val one = clustered(4000).filter(col("ticker") === "TCK5-USDT")
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == 500)
    // agg pushdown still answers closed-form (no row scan partitions)
    val cnt = clustered(4000).groupBy("ticker").count()
    assert(cnt.collect().map(_.getLong(1)).toSet == Set(500L))
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
