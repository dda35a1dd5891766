package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.{AnalyticsQueries, RelationalQueries}

/** Plan-quality regressions: these assertions pin the physical-plan
  * properties that make the queries scale (filter pushdown to parquet,
  * column pruning, broadcast of dimension sides, top-k without global sort,
  * whole-stage codegen) — if a refactor silently loses one, this suite
  * fails even though results stay correct.
  */
class PlanQualitySpec extends SparkSpec {

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("filters are pushed into the parquet scan (a2, a3)") {
    val p = formatted(RelationalQueries.a3PointLookup(spark, sf0001))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("EqualTo(o_orderkey,42)"), p)
  }

  test("column pruning: q1 reads only the 5 needed lineitem columns") {
    val p = formatted(AnalyticsQueries.q1PricingSummary(spark, sf0001))
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"))
    assert(!read.contains("l_orderkey") && !read.contains("l_partkey"), read)
  }

  test("q3/q5 join dimension sides by broadcast") {
    assert(physicalPlan(AnalyticsQueries.q3ShippingPriority(spark, sf0001))
      .contains("BroadcastHashJoin"))
    assert(physicalPlan(AnalyticsQueries.q5LocalSupplier(spark, sf0001))
      .contains("BroadcastHashJoin"))
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(physicalPlan(RelationalQueries.b10TopK(spark, sf0001))
      .contains("TakeOrderedAndProject"))
  }

  test("rank-filter windows get Spark's own group-limit pruning (no custom rule needed)") {
    // `row_number() OVER (...) <= k` is covered by Spark 4's built-in
    // InferWindowGroupLimit: a PARTIAL WindowGroupLimit prunes each map-side
    // partition to k rows per group BEFORE the exchange and a FINAL one
    // after it, so the idiom is already 100 TB-safe out of the box. Pinned
    // here so a conf regression (window.group.limit.threshold) or a future
    // custom rule duplicating the work gets caught. The native
    // TopKPerGroupExec remains the explicit API for the heap/spill-cap
    // execution shape; auto-lowering on top of this would be redundant
    // (investigated round 9: the built-in rule fires first).
    val df = AnalyticsQueries.wRank(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit") && p.contains("Partial") && p.contains("Final"), p)
  }

  test("semi/anti joins plan as join semantics, not materialized subqueries") {
    val semi = physicalPlan(RelationalQueries.a1SemiJoin(spark, sf0001))
    assert(semi.contains("LeftSemi"), semi)
    val anti = physicalPlan(RelationalQueries.b6AntiJoin(spark, sf0001))
    assert(anti.contains("LeftAnti"), anti)
  }

  test("q1 aggregation is covered by whole-stage codegen") {
    // AQE finalizes the plan only on execution
    val df = AnalyticsQueries.q1PricingSummary(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE wraps materialized stages so WholeStageCodegenExec nodes don't
    // surface via collect(); the *(n) markers in the plan string are the
    // codegen span ids
    assert(plan.toString.contains("*("), plan.toString)
  }

  test("q17 plans both the dimension and the per-part aggregate as broadcasts") {
    val p = physicalPlan(graft.queries.PipelineQueries.q17SmallQty(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("term top-k: partial (map-side) aggregation below the shuffle, top-k without global sort") {
    val p = physicalPlan(graft.queries.PipelineQueries.termTopK(spark, sf0001))
    assert(p.contains("partial_count"), p) // map-side combine before exchange
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("vocab/OOV: top-V without a global sort, bounded vocab probed by broadcast") {
    val p = physicalPlan(graft.queries.PipelineQueries.vocabOov(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p) // vocab = bounded top-k
    assert(p.contains("BroadcastHashJoin"), p)     // the corpus never reshuffles
    assert(p.contains("partial_count"), p)         // map-side combine on counts
  }

  test("bigram LM: counts and per-doc rollup both partial-aggregate below their shuffles") {
    val p = physicalPlan(graft.queries.PipelineQueries.bigramLm(spark, sf0001))
    assert(p.contains("partial_count"), p)
    // the 2-row totals side reaches the scorer by broadcast, never a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("contamination joins the benchmark side by broadcast") {
    val p = physicalPlan(graft.queries.PipelineQueries.contamination(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("similarity scoring uses the native codegen'd DotProduct (no interpreted lambda fold)") {
    val p = physicalPlan(graft.operators.SimilarityOps.cosineNearDup(spark, sf0001))
    assert(p.toLowerCase.contains("dotproduct"), p)
    assert(!p.contains("aggregate(zip_with"), p)
  }

  test("pii scrub is a pure projection: no exchange except the output sort") {
    val p = physicalPlan(graft.queries.PipelineQueries.piiScrub(spark, sf0001))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p") // fanOut + rangepartition for sort
  }

  test("kmeans assignment is map-only: centroids as literals, no join, no data shuffle") {
    val p = physicalPlan(graft.operators.SimilarityOps.kmeans(spark, sf0001))
    // the only joins allowed are broadcasts of the k-row centroid-sum side
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    // final plan: k-row groupBy + broadcast join + k-row sort — the vector
    // table itself is never exchanged for the assignment
    assert(!p.contains("CartesianProduct"), p)
  }

  test("source cap runs through TopKPerGroupExec with one exchange and no window") {
    val p = physicalPlan(graft.queries.PipelineQueries.sourceCap(spark, sf0001))
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window"), p) // the declarative formulation would sort every group
  }

  test("dup-span fraction: partial aggregation below the posting shuffle, long keys only") {
    val p = physicalPlan(graft.operators.DedupOps.dupSpanFrac(spark, sf0001))
    // the partial (map-side) aggregate must sit BELOW the shuffle: in the
    // top-down plan text, a partial_count appears after the last Exchange
    val partialIdx = p.lastIndexOf("partial_count")
    assert(partialIdx >= 0, p)
    // the deepest partial aggregate must sit below the deepest shuffle
    assert(partialIdx > p.lastIndexOf("Exchange"), s"no map-side combine below the shuffle:\n$p")
    assert(!p.toLowerCase.contains("cartesian"), p)
  }

  test("mixture sampling is a map-side filter ahead of one aggregation exchange") {
    val p = physicalPlan(graft.queries.PipelineQueries.mixtureSample(spark, sf0001))
    // filter must run before EVERY exchange (no shuffle of dropped rows) and
    // nothing but the groupBy + output sort may exchange
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p")
    val filterIdx = p.indexOf("Filter")
    assert(filterIdx >= 0 && p.contains("Exchange"), p)
    assert(filterIdx > p.lastIndexOf("Exchange"), // plan prints top-down
      s"filter should be below (after in text) the LAST exchange:\n$p")
  }

  test("q10 broadcasts both dimensions and plans top-k without a global sort") {
    val p = physicalPlan(graft.queries.PipelineQueries.q10Returned(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q18 joins the HAVING aggregate back by broadcast (facts never reshuffle)") {
    val p = physicalPlan(graft.queries.PipelineQueries.q18LargeOrders(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("no query in the surface plans an unbroadcast CartesianProduct") {
    // s_ann_brute is brute force BY DESIGN (the exact baseline); its cross
    // join broadcasts the tiny query side, so even it must not cartesian
    (SparkEntry.queries ++ SparkEntry.specOnlyQueries).foreach { case (name, fn) =>
      val plan = physicalPlan(fn(spark, sf0001))
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
    }
  }

  test("native grouped top-k plans one exchange and no sort of the data") {
    graft.catalyst.GraftExtensions.register(spark)
    val df = graft.plans.NativeTopK.perGroup(
      Tables.orders(spark, sf0001).select("o_orderpriority", "o_orderkey", "o_totalprice"),
      Seq("o_orderpriority"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    val p = physicalPlan(df)
    assert(p.contains("TopKPerGroup"), p)
    assert("Exchange".r.findAllIn(p).length <= 1, p)
    assert(!p.contains("Sort "), p) // heap pass, not a sort
    // collect() (not count(), which plans its OWN QueryExecution) so this
    // df's adaptive plan finalizes and codegen stages become readable
    assert(df.collect().length == 15) // 5 priorities x 3
    // whole-stage codegen fence: the operator must be INSIDE a codegen span
    // (a `*(id)` prefix), not an iterator island between two generated stages
    val finalPlan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) TopKPerGroup""".r.findFirstIn(finalPlan).isDefined,
      s"TopKPerGroupExec not fused into whole-stage codegen:\n$finalPlan")
  }

  test("native as-of join fuses into whole-stage codegen") {
    graft.catalyst.GraftExtensions.register(spark)
    val ticks = Tables.events(spark, sf0001)
      .selectExpr("user_id as k", "ts as t", "event_type as tag")
    val marks = Tables.events(spark, sf0001)
      .selectExpr("user_id as k", "ts as rt", "value as px")
    val df = graft.plans.NativeAsOf.asofJoin(ticks, marks, "k", "t", "rt")
    assert(df.collect().nonEmpty)
    val finalPlan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(finalPlan).isDefined,
      s"AsOfJoinExec not fused into whole-stage codegen:\n$finalPlan")
  }

  test("partitioned warehouse prunes partitions on file_date") {
    import spark.implicits._
    val wh = tmpDir("prune") + "/data"
    Seq(("A", "2024-03-14"), ("B", "2024-03-15"), ("C", "2024-03-16"))
      .toDF("ticker", "fd")
      .select(col("ticker"), col("fd").cast("date").as("file_date"))
      .write.partitionBy("file_date").parquet(wh)
    val pruned = spark.read.parquet(wh)
      .filter(col("file_date") === lit(dt("2024-03-15")))
    val scan = formatted(pruned)
    val pf = scan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("file_date"), scan) // pruning predicate reached the scan
    // and the executed scan reads exactly one of the three partition dirs
    pruned.collect()
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    assert(scanned == 1, s"scanned $scanned files")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    import spark.implicits._
    // the 100× scan-pruning story for the analytics layer: the fact is
    // partitioned by file_date, the filter arrives on a DIMENSION attribute
    // (not the partition column), and DPP must translate it into a runtime
    // partition filter on the fact scan via the reused broadcast
    val wh = tmpDir("dpp") + "/fact"
    val dates = (1 to 10).map(i => f"2024-03-$i%02d")
    dates.flatMap(fd => (1 to 20).map(i => (i, fd)))
      .toDF("v", "fd")
      .select(col("v"), col("fd").cast("date").as("file_date"))
      .coalesce(1) // one file per partition → numFiles counts partitions
      .write.partitionBy("file_date").parquet(wh)
    // the dim must be a real (file-backed) relation: an in-memory Seq
    // constant-folds the filter into a LocalTableScan, and without a
    // surviving selective Filter node the PartitionPruning rule bails
    val dimPath = tmpDir("dpp") + "/dim"
    dates.map(fd => (fd, if (fd == "2024-03-03") "hot" else "cold"))
      .toDF("fd", "temp")
      .select(col("fd").cast("date").as("file_date"), col("temp"))
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.read.parquet(wh)
      .join(broadcast(dim).filter(col("temp") === "hot"), Seq("file_date"))
    assert(joined.collect().length == 20) // one hot date × 20 fact rows
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("dynamicpruning"),
      s"no dynamic-pruning predicate on the fact scan:\n$finalPlan")
    // runtime proof: the fact scan read exactly ONE of the ten partitions.
    // AdaptiveSparkPlanExec and QueryStageExec are leaf wrappers — recurse
    // through them explicitly or collectLeaves never reaches the scans
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    // the fact side is the partitioned scan (it carries a numPartitions
    // metric; the dim scan does not)
    val fact = scans(joined.queryExecution.executedPlan)
      .filter(_.metrics.contains("numPartitions"))
    assert(fact.nonEmpty, "no partitioned fact scan found in the final plan")
    assert(fact.head.metrics("staticFilesNum").value == 10, "fixture should have 10 files")
    val scanned = fact.head.metrics("numFiles").value
    assert(scanned == 1, s"DPP did not prune: scanned $scanned of 10 partition files")
  }

  test("bucketed co-located join needs no shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previously-failed run can leave orphan managed-table dirs behind
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rec)
        f.delete(); ()
      }
      if (dir.exists) rec(dir)
    }
    Tables.orders(spark, sf0001)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, sf0001)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    // force the shuffle-join path (tiny test tables would auto-broadcast)
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val p = physicalPlan(joined)
      // bucketing co-locates both sides: the join runs as SMJ with no
      // shuffle exchange on either key (only the final agg exchanges)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
      assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
      assert(joined.collect().nonEmpty)
    } finally spark.conf.set(thresholdKey, old)
  }

  test("scd2: one hash exchange serves both windows AND the run collapse") {
    val p = physicalPlan(graft.operators.TimeSeriesOps.scd2History(spark, sf0001))
    // hash(user_id) is established once; the lag/sum windows, the
    // (user_id, version) aggregation and the lead window all reuse it —
    // a second hash exchange would mean the run collapse re-shuffled
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, p)
    // partial aggregation below the (already partitioned) final agg
    assert(p.contains("partial_min"), p)
  }

  test("chunking and normalization stay map-side above the doc sort") {
    // the explode/md5 (chunk) and regexp/NFC (normalize) projections must
    // sit ABOVE the range sort — below it the range partitioner's sampling
    // pass would evaluate them twice — and add no exchange of their own
    for (df <- Seq(graft.functions.TextOps.chunkDf(spark, sf0001),
        graft.functions.TextOps.normalizeDf(spark, sf0001))) {
      val p = physicalPlan(df)
      val exchanges = "Exchange ".r.findAllIn(p).length
      assert(exchanges == 2, p) // fanOut round-robin + the doc_id range sort
      val sortIdx = p.indexOf("Sort [doc_id")
      assert(sortIdx >= 0, p)
      val heavyIdx = math.max(p.indexOf("md5"), p.indexOf("nfcnormalize"))
      assert(heavyIdx >= 0 && heavyIdx < sortIdx,
        "heavy projection should print above (before) the sort\n" + p)
    }
  }

  test("sequence packing: data-scale window is partitioned by block, not global") {
    // the only GLOBAL window in sequencePack runs over per-block totals
    // (n/blockSize rows, post-aggregate); the window over the raw documents
    // must hash-partition on blk — a plan regression to a single-partition
    // data window would still be correct and this is what catches it
    val p = physicalPlan(graft.queries.PipelineQueries.sequencePack(spark, sf0001))
    assert(p.contains("hashpartitioning(blk"), p)
  }

  test("sequence packing recursion: forced multi-level plan, identical result") {
    // force the prefix-sum recursion on the 500-doc corpus: blockSize=8 →
    // 63 block totals > maxWindowRows=4 → recurse (8 totals) → recurse
    // (1 total) → terminal global window. Every data-bearing level must
    // hash-partition on its block id; exactly ONE single-partition exchange
    // may remain — the terminal window over ≤ maxWindowRows bounded rows.
    val forced = graft.queries.PipelineQueries.sequencePack(spark, sf0001,
      blockSize = 8, maxWindowRows = 4)
    val p = physicalPlan(forced)
    assert(p.contains("hashpartitioning(blk"), p)
    assert(p.contains("hashpartitioning(_blk1"), p)
    assert(p.contains("hashpartitioning(_blk2"), p)
    val singles = "Exchange SinglePartition".r.findAllIn(p).size
    assert(singles == 1, s"expected exactly 1 terminal single-partition window, " +
      s"got $singles:\n$p")
    // block size and recursion depth are plan knobs, never result knobs
    val default = graft.queries.PipelineQueries.sequencePack(spark, sf0001)
    assert(forced.collect().toSeq == default.collect().toSeq)
  }

  test("bucketed range-frame count plans NO window operator (scale-safe twin)") {
    // sql_window_range is the grammar demo — its un-partitioned ORDER BY
    // plans a single-partition Window by construction. The pattern users
    // should copy at scale is windowRangeScaled: same result through a
    // bucketed equi-join, with no Window node anywhere in the plan.
    val p = physicalPlan(graft.queries.PipelineQueries.windowRangeScaled(spark, sf0001))
    assert(!p.contains("Window"), p)
    // and the work distributes: the join is a real shuffled equi-join on the
    // bucket key, not a broadcast of the whole dataset to one task
    assert(p.contains("bucket"), p)
  }
}
