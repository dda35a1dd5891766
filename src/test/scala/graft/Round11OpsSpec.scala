package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.NumOps
import graft.ingest.{PartitionStats, TickerIngest}
import graft.operators.FingerprintStore
import graft.sinks.{JdbcSink, JdbcSinkConfig}
import graft.streaming.StreamingTopK

/** Round-11 hardening: negative-zero output hygiene, integer-domain
  * sequence packing, non-deterministic-input pinning in the fingerprint
  * store, JDBC identifier-case/LIKE-escape + txn rollback, the streaming
  * top-k fold (k-bounded store at any stream age), and stats-store
  * must-read pruning + verified-freshness acceleration.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private val negZeroBits = java.lang.Double.doubleToRawLongBits(-0.0)

  // ---- NumOps -------------------------------------------------------------

  test("nzero collapses -0.0 to +0.0 and is the identity elsewhere") {
    val df = Seq(Some(-0.0), Some(0.0), Some(1.5), Some(-2.5),
      Some(Double.NaN), None).toDF("x")
    val out = df.select(NumOps.nzero(col("x")).as("x")).collect()
    val zeroBits = out.take(2).map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
    assert(zeroBits.forall(_ == 0L), "both zeros must be +0.0")
    assert(out(2).getDouble(0) == 1.5 && out(3).getDouble(0) == -2.5)
    assert(out(4).getDouble(0).isNaN)
    assert(out(5).isNullAt(0))
  }

  test("normalizeSignedZeros scrubs double, float and array<double> columns") {
    val df = Seq((-0.0, -0.0f, Seq(-0.0, 1.0), "s"))
      .toDF("d", "f", "a", "keep")
    val out = NumOps.normalizeSignedZeros(df)
    assert(out.columns.toSeq == Seq("d", "f", "a", "keep"))
    val r = out.collect()(0)
    assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) == 0L)
    assert(java.lang.Float.floatToRawIntBits(r.getFloat(1)) == 0)
    assert(java.lang.Double.doubleToRawLongBits(r.getSeq[Double](2).head) == 0L)
    assert(r.getString(3) == "s")
  }

  test("dsirSelect llr never carries the -0.0 sign bit (the r10 hash fail)") {
    val llr = graft.queries.PipelineQueries.dsirSelect(spark, sf0001)
      .select("llr").collect().map(_.getDouble(0))
    assert(llr.nonEmpty)
    assert(!llr.exists(v => java.lang.Double.doubleToRawLongBits(v) == negZeroBits))
  }

  // ---- sequencePack integer domain ---------------------------------------

  test("sequencePack sequence ids come from integer division (driver replay)") {
    val rows = graft.queries.PipelineQueries.sequencePack(spark, sf0001)
      .select("global_offset", "n_tokens", "seq_start", "seq_end").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, n) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == Math.floorDiv(off, 512L), s"seq_start at off=$off")
      assert(r.getLong(3) == Math.floorDiv(off + n - 1, 512L), s"seq_end at off=$off")
    }
  }

  // ---- FingerprintStore: non-deterministic inputs pinned ------------------

  test("admit pins a non-deterministic input before evaluating it twice") {
    val dir = tmpDir("fp-nondet")
    // a genuinely random fingerprint column: without the localCheckpoint
    // pin, the driver-side prefix collect and the anti-join would see two
    // DIFFERENT sets of fingerprints
    val wild = spark.range(64)
      .withColumn("fp", md5(concat(col("id").cast("string"),
        rand().cast("string"))))
    val admitted = FingerprintStore.admit(spark, wild, "fp", dir)
    val first = admitted.select("fp").collect().map(_.getString(0)).sorted.toSeq
    val second = admitted.select("fp").collect().map(_.getString(0)).sorted.toSeq
    assert(first == second, "admit's result must be stable across actions")
    // and the pinned frame round-trips the store exactly: append it, admit
    // it again -> zero rows (an unpinned plan would re-randomize and leak
    // duplicates past the history probe)
    FingerprintStore.append(admitted, "fp", dir)
    assert(FingerprintStore.admit(spark, admitted, "fp", dir).count() == 0L)
  }

  // ---- JdbcSink: identifier case + LIKE escape + rollback -----------------

  test("exactly-once publish survives a lowercase table name (Derby folds case)") {
    val url = "jdbc:derby:memory:graftLcDb;create=true"
    val cfg = JdbcSinkConfig(url, "eo_ticks_lc", user = "", password = "",
      numPartitions = 2)
    val sink = new JdbcSink(cfg)
    def rows(xs: (Long, String, Double)*) = xs.toDF("SEQ", "TICKER", "PRICE")
    try {
      sink.append(rows((0L, "BOOT", 0.0)))
      sink.truncate(spark)
      // pre-fix, the SECOND call died here: the metadata lookup for
      // 'eo_ticks_lc_LEDGER' (stored as EO_TICKS_LC_LEDGER) missed, and
      // the retried CREATE TABLE threw on every subsequent batch
      assert(sink.appendExactlyOnce(rows((1L, "A", 1.0)), 0L))
      assert(sink.appendExactlyOnce(rows((2L, "B", 2.0)), 1L))
      assert(!sink.appendExactlyOnce(rows((1L, "A", 1.0)), 0L)) // replay
      assert(sink.count(spark) == 2)
      // stale-stage sweep under the folded case: ledgered stage reaped,
      // unledgered stage kept
      rows((9L, "X", 9.0)).write.format("jdbc")
        .option("url", url).option("dbtable", "eo_ticks_lc_STAGE_1")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
      rows((7L, "Y", 7.0)).write.format("jdbc")
        .option("url", url).option("dbtable", "eo_ticks_lc_STAGE_7")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
      assert(sink.sweepStaleStages() == 1)
      assert(sink.appendExactlyOnce(rows((7L, "Y", 7.0)), 7L))
      assert(sink.count(spark) == 3)
    } finally {
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftLcDb;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("a failing publish txn rolls back and surfaces the ORIGINAL error") {
    val url = "jdbc:derby:memory:graftRbDb;create=true"
    val cfg = JdbcSinkConfig(url, "RB_TICKS", user = "", password = "",
      numPartitions = 1)
    val sink = new JdbcSink(cfg)
    def rows(xs: (Long, String, Double)*) = xs.toDF("SEQ", "TICKER", "PRICE")
    try {
      sink.append(rows((0L, "BOOT", 0.0)))
      sink.truncate(spark)
      // sabotage: drop the target AFTER the stage write path is set up, so
      // the transactional INSERT INTO target throws mid-txn
      val c = java.sql.DriverManager.getConnection(url)
      c.createStatement().execute("DROP TABLE RB_TICKS")
      c.close()
      val e = intercept[java.sql.SQLException] {
        sink.appendExactlyOnce(rows((1L, "A", 1.0)), 0L)
      }
      // Derby's "connection closed with active transaction" error must NOT
      // mask the real one: the surfaced exception names the missing table
      assert(e.getMessage.toUpperCase.contains("RB_TICKS"), e.getMessage)
    } finally {
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftRbDb;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  // ---- StreamingTopK: fold + fresh-store + crash recovery -----------------

  private def board(store: String, k: Int): Seq[(String, Long, Long)] =
    StreamingTopK.mergedTopK(spark, store, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("a fresh store reads as an empty board, not PATH_NOT_FOUND") {
    val b = board(tmpDir("hh-fresh"), 8)
    assert(b.isEmpty)
  }

  test("fold preserves the board exactly when k covers the vocabulary") {
    val store = tmpDir("hh-fold-exact")
    val k = 16
    StreamingTopK.processBatch(
      Seq(1L -> "a a a b b c").toDF("doc_id", "text"), 0L, store, k)
    StreamingTopK.processBatch(
      Seq(2L -> "b c c d").toDF("doc_id", "text"), 1L, store, k)
    val before = board(store, k)
    val (folded, upto) = StreamingTopK.compact(spark, store, k)
    assert(folded == 2 && upto == 1L)
    assert(board(store, k) == before)
    // the store is k-bounded again: no batch dirs survive the fold
    assert(!new java.io.File(s"$store/summaries").exists() ||
      new java.io.File(s"$store/summaries").listFiles()
        .count(_.getName.startsWith("batch_id=")) == 0)
    // and new batches keep merging on top of the folded sketch
    StreamingTopK.processBatch(
      Seq(3L -> "a d d d").toDF("doc_id", "text"), 2L, store, k)
    val counts = board(store, k).map(t => t._1 -> t._2).toMap
    assert(counts("a") == 4L && counts("d") == 4L && counts("b") == 3L)
  }

  test("fold keeps MG bounds with small k; replayed folded batches are ignored") {
    val store = tmpDir("hh-fold-k")
    val k = 3
    val b0 = Seq(1L -> "x x x x y y z w v", 2L -> "x y q")
    val b1 = Seq(3L -> "y y y z z p o n m")
    val truth = (b0 ++ b1).flatMap(_._2.trim.split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    StreamingTopK.processBatch(b0.toDF("doc_id", "text"), 0L, store, k)
    StreamingTopK.processBatch(b1.toDF("doc_id", "text"), 1L, store, k)
    StreamingTopK.compact(spark, store, k)
    val b = board(store, k)
    assert(b.nonEmpty && b.length <= k)
    val err = b.head._3
    b.foreach { case (tok, lb, _) =>
      assert(lb >= 1 && lb <= truth(tok), s"$tok lb=$lb true=${truth(tok)}")
      assert(truth(tok) - lb <= err, s"$tok slack out of bound")
    }
    // checkpoint replay of an already-folded batch: the rewritten dir is
    // invisible to readers (id <= upto) and swept by the next fold
    StreamingTopK.processBatch(b0.toDF("doc_id", "text"), 0L, store, k)
    assert(board(store, k) == b)
    val (refolded, _) = StreamingTopK.compact(spark, store, k)
    assert(refolded == 0)
    assert(board(store, k) == b)
  }

  test("fold crash window: .folded_old is restored before the next read") {
    val store = tmpDir("hh-fold-crash")
    val k = 8
    StreamingTopK.processBatch(
      Seq(1L -> "r r r s s t").toDF("doc_id", "text"), 0L, store, k)
    StreamingTopK.compact(spark, store, k)
    val before = board(store, k)
    // simulate a crash between the two swap renames: live parked in trash
    val (fs, live) = graft.ingest.HadoopFs.forPath(spark, s"$store/folded")
    val trash = new org.apache.hadoop.fs.Path(s"$store/.folded_old")
    assert(fs.rename(live, trash))
    assert(board(store, k) == before, "recovery must restore the folded sketch")
    assert(fs.exists(live) && !fs.exists(trash))
  }

  test("a concurrent reader never throws while folds run") {
    val store = tmpDir("hh-chaos")
    val k = 4
    StreamingTopK.processBatch(
      Seq(0L -> "seed seed base").toDF("doc_id", "text"), 0L, store, k)
    @volatile var readerError: Option[Throwable] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && readerError.isEmpty) {
        try {
          val b = board(store, k)
          b.foreach { case (_, lb, _) => assert(lb >= 1) }
        } catch { case t: Throwable => readerError = Some(t) }
      }
    })
    reader.start()
    try {
      (1 to 6).foreach { i =>
        StreamingTopK.processBatch(
          Seq(i.toLong -> s"seed tok$i tok$i extra").toDF("doc_id", "text"),
          i.toLong, store, k)
        StreamingTopK.compact(spark, store, k)
      }
    } finally { stop = true; reader.join(30000) }
    assert(readerError.isEmpty, s"reader failed: ${readerError.map(_.toString)}")
    val b = board(store, k)
    assert(b.map(_._1).contains("seed"))
  }

  // ---- LogSink flush knobs (size + timeout triggers) ----------------------

  private def rec(i: Int) = graft.schema.LogRecord(
    ts("2024-08-08 10:00:00"), "INFO", "t", s"msg $i", Map.empty, None, None)

  // tmpDir pre-creates the directory, so guard on part files, not existence
  private def logRows(out: String): Long = {
    val files = Option(new java.io.File(out).listFiles).map(_.toSeq).getOrElse(Nil)
    if (files.exists(_.getName.endsWith(".parquet")))
      spark.read.parquet(out).count()
    else 0L
  }

  test("log sink size trigger: crossing bufferSize flushes without the timeout") {
    // timeout deliberately enormous — only the size path can flush
    val sink = new graft.streaming.LogSink(spark, bufferSize = 3,
      flushTimeoutSec = 3600)
    val out = tmpDir("lsize")
    val q = sink.start(out, tmpDir("lsize-ckpt"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      sink.enqueue(rec(1)); sink.enqueue(rec(2))
      q.processAllAvailable()
      assert(logRows(out) == 0, "below bufferSize: no flush yet")
      sink.enqueue(rec(3)) // crosses the line -> synchronous flush
      q.processAllAvailable()
      assert(logRows(out) == 3)
    } finally sink.close()
  }

  test("log sink timeout trigger: a sub-buffer residue flushes after flushTimeoutSec") {
    val sink = new graft.streaming.LogSink(spark, bufferSize = 1000,
      flushTimeoutSec = 1)
    val out = tmpDir("ltime")
    val q = sink.start(out, tmpDir("ltime-ckpt"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      sink.enqueue(rec(1)) // far below bufferSize
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var n = 0L
      while (n == 0L && System.nanoTime() < deadline) {
        Thread.sleep(200)
        q.processAllAvailable()
        n = logRows(out)
      }
      assert(n == 1L, "timeout flusher must drain the residue")
    } finally sink.close()
  }

  // ---- DSIR count-min scale path ------------------------------------------

  test("cms_estimate never under-counts and is exact at tight eps") {
    import graft.catalyst.HashFunctions.cms_estimate
    val words = Seq("alpha", "alpha", "alpha", "beta", "beta", "gamma")
      .toDF("w")
    val bytes = words
      .agg(count_min_sketch(col("w"), lit(0.0001), lit(0.999), lit(42)))
      .first().getAs[Array[Byte]](0)
    val est = words.distinct()
      .select(col("w"), cms_estimate(col("w"), bytes).as("est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 1L))
  }

  test("dsirSelectCms matches the exact path's selection (>= 97% overlap)") {
    val exact = graft.queries.PipelineQueries.dsirSelect(spark, sf0001)
      .select("doc_id", "selected").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cms = graft.queries.PipelineQueries.dsirSelectCms(spark, sf0001)
      .select("doc_id", "selected").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(exact.keySet == cms.keySet)
    val agree = exact.keys.count(k => exact(k) == cms(k))
    assert(agree.toDouble / exact.size >= 0.97,
      s"selection overlap ${agree.toDouble / exact.size}")
  }

  test("the vocabulary cutover routes dsirSelect onto the sketch path") {
    spark.conf.set("spark.graft.dsir.cmsVocabCutover", "1")
    try {
      val routed = graft.queries.PipelineQueries.dsirSelect(spark, sf0001)
        .select("doc_id", "selected").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val direct = graft.queries.PipelineQueries.dsirSelectCms(spark, sf0001)
        .select("doc_id", "selected").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(routed == direct, "cutover must route to the CMS path")
    } finally spark.conf.set("spark.graft.dsir.cmsVocabCutover", "0")
  }

  // ---- round-11 board additions: kcore / spearman / ewma ------------------

  test("kCoreOver peels a crafted graph to its known core") {
    // a 4-clique with three pendant nodes: the 3-core is exactly the clique
    val cl = for (i <- 0L to 3L; j <- 0L to 3L if i != j) yield (i, j)
    val pend = Seq((0L, 10L), (10L, 0L), (1L, 11L), (11L, 1L), (2L, 12L), (12L, 2L))
    val e = (cl ++ pend).toDF("src", "dst")
    val core = graft.operators.GraphOps.kCoreOver(e, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet == Set(0L, 1L, 2L, 3L))
    assert(core.values.forall(_ == 3L), "each clique node keeps exactly 3 in-core edges")
    // k above the max degree peels everything
    assert(graft.operators.GraphOps.kCoreOver(e, k = 10).count() == 0L)
  }

  test("spearman: monotone pair gives rho 1; bounds hold on the board query") {
    val rows = graft.queries.AnalyticsQueries.spearman(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho = r.getDouble(2)
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, s"rho out of range: $rho")
      assert(r.getLong(1) > 0)
    }
  }

  test("ewma: integer fold replays the sequential recursion exactly") {
    val out = graft.operators.TimeSeriesOps.ewma(spark, sf0001).collect()
    assert(out.nonEmpty)
    // driver-side sequential replay over one user's daily closes
    val u = out.head.getLong(0)
    val closes = graft.Tables.events(spark, sf0001)
      .filter(col("user_id") === u)
      .withColumn("c", (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
      .filter(col("c") > 0)
      .withColumn("day", col("ts").cast("date"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "day").orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select("day", "c").orderBy("day").collect().map(_.getLong(1))
    val expected = closes.map(_ * 10000L).reduceLeft((acc, x) => Math.floorDiv(x + 4 * acc, 5L))
    val row = out.find(_.getLong(0) == u).get
    assert(row.getLong(3) == expected, s"ewma mismatch for user $u")
    assert(row.getLong(1) == closes.length)
    assert(row.getLong(2) == closes.last)
    assert(row.getBoolean(4) == (closes.last * 10000L > expected))
  }

  test("varEs: ES never exceeds VaR; k-tail accounting holds") {
    val rows = graft.operators.TimeSeriesOps.varEs(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, varMicro, es) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0)
      // the mean of the k worst returns cannot exceed the k-th worst
      assert(es <= varMicro.toDouble / 1e6 + 1e-9,
        s"es=$es var=${varMicro / 1e6.toDouble}")
    }
  }

  test("mutualInfo: information inequalities hold (0 <= MI <= min(H); NMI in [0,1])") {
    val r = graft.queries.AnalyticsQueries.mutualInfo(spark, sf0001).collect()(0)
    val (mi, hx, hy) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(mi >= -1e-6, s"MI must be non-negative: $mi")
    assert(mi <= math.min(hx, hy) + 1e-6, s"MI <= min(H): $mi vs $hx/$hy")
    assert(hx > 0 && hy > 0)
    val nmi = r.getDouble(4)
    assert(nmi >= -1e-6 && nmi <= 1 + 1e-6)
  }

  test("attribution: crafted journey splits credit by the three models exactly") {
    // user 1: click(t1), view(t2), click(t3) -> purchase(t4):
    //   first = click, last = click, linear = click 2/3, view 1/3
    // user 2: view outside the 7-day window -> purchase unattributed
    val ev = Seq(
      (1L, 10L, ts("2024-03-10 10:00:00"), "click"),
      (1L, 11L, ts("2024-03-11 10:00:00"), "view"),
      (1L, 12L, ts("2024-03-12 10:00:00"), "click"),
      (1L, 13L, ts("2024-03-13 10:00:00"), "purchase"),
      (2L, 20L, ts("2024-03-01 10:00:00"), "view"),
      (2L, 21L, ts("2024-03-13 10:00:00"), "purchase"),
      (1L, 14L, ts("2024-03-12 11:00:00"), "error")) // non-touch noise
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.operators.FunnelOps.attributionOver(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("click") == ((2L, 1L, 1L, 666666L)))  // 2*1e6 div 3
    assert(out("view") == ((1L, 0L, 0L, 333333L)))   // 1*1e6 div 3
    // credit conservation: linear credit sums to ~1e6 per attributed
    // conversion, short only the div-floor dust (< k per conversion)
    val lin = out.values.map(_._4).sum
    assert(lin <= 1000000L && lin > 1000000L - 3)
  }

  test("attribution board query: totals are conserved at sf0.001") {
    val rows = graft.operators.FunnelOps.attribution(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val firstSum = rows.map(_.getLong(2)).sum
    val lastSum = rows.map(_.getLong(3)).sum
    assert(firstSum == lastSum, "every attributed conversion has exactly one first and one last")
    val linSum = rows.map(_.getLong(4)).sum
    // linear micro-credit sums to 1e6 per attributed conversion minus floor dust
    assert(linSum <= firstSum * 1000000L)
    assert(linSum >= firstSum * 1000000L - firstSum * 50L)
  }

  test("srmCheck: accounting identity and the textbook chi2 replay") {
    val r = graft.queries.AnalyticsQueries.srmCheck(spark, sf0001).collect()(0)
    val (n, na, nb, chi2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(na + nb == n && n > 0)
    val e = n / 2.0
    val expected = BigDecimal((na - e) * (na - e) / e + (nb - e) * (nb - e) / e)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(chi2 == expected)
    assert(r.getBoolean(4) == (chi2 > 3.841))
  }

  test("stickiness: bounds and accounting hold (avg DAU never exceeds MAU)") {
    val rows = graft.operators.IntervalOps.stickiness(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDays, mau, sumDau, st) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nDays > 0 && mau > 0)
      assert(sumDau >= mau, "every monthly-active user has at least one active day")
      assert(sumDau <= nDays * mau, "no day's DAU can exceed MAU")
      assert(st > 0 && st <= 1.0 + 1e-9)
    }
  }

  test("cramersV: chi2 >= 0 and V in [0, 1]; consistent with mutual info") {
    val r = graft.queries.AnalyticsQueries.cramersV(spark, sf0001).collect()(0)
    val (n, rr, cc, chi2, v) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    assert(n > 0 && rr > 1 && cc > 1)
    assert(chi2 >= 0)
    assert(v >= 0 && v <= 1 + 1e-9)
    // both association measures must agree on (near-)independence
    val mi = graft.queries.AnalyticsQueries.mutualInfo(spark, sf0001)
      .collect()(0).getDouble(1)
    if (mi < 0.001) assert(v < 0.2, s"MI ~ 0 but V = $v")
  }

  test("bestSplit: driver brute-force replay agrees; gain is non-negative") {
    val r = graft.queries.AnalyticsQueries.bestSplit(spark, sf0001).collect()(0)
    val (n, p, thr, gain) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0 && p > 0 && p < n)
    assert(gain >= 0, "splitting can never increase impurity")
    // brute-force: recompute the best threshold driver-side
    val xs = graft.Tables.documents(spark, sf0001)
      .select(col("n_chars").cast("long"),
        when(col("lang") === "en", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def gini(pos: Long, cnt: Long): Double = {
      val q = pos.toDouble / cnt; 1.0 - q * q - (1 - q) * (1 - q)
    }
    val parent = gini(p, n)
    val hist = xs.groupBy(_._1).map { case (x, g) =>
      (x, g.length.toLong, g.map(_._2).sum) }.toSeq.sortBy(_._1)
    var (nl, pl) = (0L, 0L)
    var best = (Long.MinValue, Long.MinValue) // (gain_e6, -x)
    for ((x, c, pp) <- hist) {
      nl += c; pl += pp
      if (nl < n) {
        val w = nl.toDouble / n * gini(pl, nl) +
          (n - nl).toDouble / n * gini(p - pl, n - nl)
        val g6 = math.round((parent - w) * 1000000)
        if (g6 > best._1 || (g6 == best._1 && -x > best._2)) best = (g6, -x)
      }
    }
    assert(thr == -best._2 && gain == best._1,
      s"engine ($thr, $gain) vs replay (${-best._2}, ${best._1})")
  }

  test("dowStrength: bounded in [~0, 1]; peak dow is a valid weekday index") {
    val r = graft.operators.TimeSeriesOps.dowStrength(spark, sf0001).collect()(0)
    val (nDays, strength, peak) = (r.getLong(0), r.getDouble(1), r.getInt(2))
    assert(nDays > 7)
    // residual SS can exceed total SS only by rounding dust
    assert(strength <= 1.0 + 1e-9 && strength >= -0.1, s"strength=$strength")
    assert(peak >= 0 && peak <= 6)
  }

  test("featureRank: three features ranked; chars agrees with bestSplit") {
    val rows = graft.queries.AnalyticsQueries.featureRank(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet == Set("chars", "tokens", "uniq"))
    rows.foreach(r => assert(r.getLong(2) >= 0, "gain is non-negative"))
    // gains are sorted descending
    val gains = rows.map(_.getLong(2)).toSeq
    assert(gains == gains.sorted.reverse)
    // the chars row must equal the single-feature bestSplit answer
    val bs = graft.queries.AnalyticsQueries.bestSplit(spark, sf0001).collect()(0)
    val chars = rows.find(_.getString(0) == "chars").get
    assert(chars.getLong(1) == bs.getLong(2) && chars.getLong(2) == bs.getLong(3))
  }

  // ---- PartitionStats: must-read pruning + verified acceleration ----------

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

  test("pruneByPrice unions stats-less partitions as must-read") {
    val root = tmpDir("ps-mr")
    val wh = tmpDir("ps-mrwh")
    // date 1 committed WITH stats, date 2 WITHOUT (feature enabled late /
    // crash before refresh): pruning must still read date 2 for any window
    spark.conf.set("spark.graft.ingest.stats", "true")
    try {
      TickerIngest.ingest(spark, Seq(put(root, "2024-03-14",
        "AVA_1_2024-03-14",
        Seq(line("AVA-USDT", 1, 0.50, "2024-03-14T10:00:00.000")))), wh)
    } finally spark.conf.set("spark.graft.ingest.stats", "false")
    TickerIngest.ingest(spark, Seq(put(root, "2024-03-15",
      "BTC_1_2024-03-15",
      Seq(line("BTC-USDT", 2, 64000.0, "2024-03-15T10:00:00.000")))), wh)
    // window matches neither recorded range, but the uncovered partition
    // is must-read — dropping it would silently lose matching rows
    assert(PartitionStats.pruneByPrice(spark, wh, 100, 200) == Seq("2024-03-15"))
    // window matching date 1 returns both (one by stats, one by must-read)
    assert(PartitionStats.pruneByPrice(spark, wh, 40, 60)
      == Seq("2024-03-14", "2024-03-15"))
  }

  test("summaryExact: stats-served when provably fresh, scan fallback when not") {
    val root = tmpDir("ps-se")
    val wh = tmpDir("ps-sewh")
    spark.conf.set("spark.graft.ingest.stats", "true")
    try {
      TickerIngest.ingest(spark, Seq(
        put(root, "2024-03-14", "AVA_1_2024-03-14",
          Seq(line("AVA-USDT", 10, 0.50, "2024-03-14T10:00:00.000"),
            line("AVA-USDT", 11, 0.52, "2024-03-14T10:00:01.000"))),
        put(root, "2024-03-15", "BTC_1_2024-03-15",
          Seq(line("BTC-USDT", 99, 64000.0, "2024-03-15T10:00:00.000")))), wh)
      val (n1, max1, fast1) = PartitionStats.summaryExact(spark, wh)
      assert(fast1, "fresh stats must serve the summary")
      assert(n1 == 3L && max1.contains(99L))
      // stale injection: a commit lands WITHOUT a stats refresh — the
      // listing fingerprint no longer matches, so the answer must come
      // from the scan (and still be right)
      spark.conf.set("spark.graft.ingest.stats", "false")
      TickerIngest.ingest(spark, Seq(
        put(root, "2024-03-14", "AVA_2_2024-03-14",
          Seq(line("AVA-USDT", 500, 0.61, "2024-03-14T11:00:00.000")))), wh)
      val (n2, max2, fast2) = PartitionStats.summaryExact(spark, wh)
      assert(!fast2, "stale stats must NOT serve the summary")
      assert(n2 == 4L && max2.contains(500L))
      // the next stats-on touch of the partition heals freshness
      spark.conf.set("spark.graft.ingest.stats", "true")
      TickerIngest.ingest(spark, Seq(
        put(root, "2024-03-14", "AVA_3_2024-03-14",
          Seq(line("AVA-USDT", 501, 0.62, "2024-03-14T12:00:00.000")))), wh)
      val (n3, max3, fast3) = PartitionStats.summaryExact(spark, wh)
      assert(fast3 && n3 == 5L && max3.contains(501L))
    } finally spark.conf.set("spark.graft.ingest.stats", "false")
  }

  test("compaction re-stamps the stats fingerprint (freshness survives rewrite)") {
    val root = tmpDir("ps-cf")
    val wh = tmpDir("ps-cfwh")
    spark.conf.set("spark.graft.ingest.stats", "true")
    try {
      (1 to 3).foreach { i =>
        TickerIngest.ingest(spark, Seq(put(root, "2024-03-14",
          s"AVA_${i}_2024-03-14",
          Seq(line("AVA-USDT", 100L + i, 0.60, "2024-03-14T10:00:00.000")))), wh)
      }
      TickerIngest.compactPartition(spark, wh, dt("2024-03-14"))
      val (n, maxSeq, fast) = PartitionStats.summaryExact(spark, wh)
      assert(fast, "compaction must leave stats provably fresh")
      assert(n == 3L && maxSeq.contains(103L))
    } finally spark.conf.set("spark.graft.ingest.stats", "false")
  }
}
