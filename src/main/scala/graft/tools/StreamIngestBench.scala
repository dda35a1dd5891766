package graft.tools

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingAnalytics

/** Streaming-ingest micro-bench — the apples-to-apples shape of the
  * reference's headline metric (it IS a streaming file loader: watcher →
  * validate → bulk insert at a published 300–500k rows/s). Here the same
  * contract runs as one Structured Streaming query: file-source discovery
  * over date dirs, PERMISSIVE validation, exactly-once append into the
  * partitioned parquet warehouse, end-to-end through the checkpoint.
  *
  * Two measurements, one query:
  *  1. THROUGHPUT (waves 1–2): rows/s cold and steady-state.
  *  2. LATENCY SLO: the reference's "300–500k rows/s SUSTAINED" headline
  *     is really a latency-under-sustained-load claim, so this phase
  *     publishes `latWaves` uniform waves at a fixed cadence (default 80
  *     waves / 250 ms ≈ 300k rows/s offered load) and measures, per wave,
  *     file-visible → queryable-warehouse-row: the wall clock from the
  *     atomic rename to the completion of the exactly-once micro-batch
  *     that committed the wave's last row (a `StreamingQueryListener`
  *     progress event timestamps the commit; waves are uniform, so
  *     cumulative input rows identify exactly which waves each batch
  *     completed — FIFO discovery holds because waves are renamed in
  *     order with a full cadence gap). Reported as p50/p95/p99.
  *
  * Usage: runMain graft.tools.StreamIngestBench [totalRows] [files] [latWaves] [latIntervalMs] [latOfferedRps]
  *   latWaves=0 skips the latency phase; latOfferedRps sizes the waves
  *   (default 300000 = the reference band's floor; 500000 = its ceiling).
  */
object StreamIngestBench {

  /** Per-wave latency: for wave i (0-based), the first progress event
    * whose cumulative row count covers `base + (i+1)·rowsPerWave`, minus
    * the wave's publish instant. Pure — spec-tested. `events` are
    * (wallNanos, cumulativeRows) in arrival order; a wave no event covers
    * is a dropped-row bug and throws.
    */
  def waveLatencies(publishNanos: Seq[Long], events: Seq[(Long, Long)],
      rowsPerWave: Long, base: Long): Seq[Long] =
    publishNanos.zipWithIndex.map { case (p, i) =>
      val need = base + (i + 1) * rowsPerWave
      events.find(_._2 >= need).map(_._1 - p).getOrElse(
        throw new IllegalStateException(
          s"wave $i never fully committed (need $need rows, " +
            s"saw ${events.lastOption.map(_._2).getOrElse(0L)})"))
    }

  /** Nearest-rank percentile over an UNSORTED sample. */
  def percentile(xs: Seq[Double], p: Double): Double = {
    require(xs.nonEmpty)
    val s = xs.sorted
    s(math.max(0, math.min(s.size - 1, math.ceil(p / 100.0 * s.size).toInt - 1)))
  }

  /** One latency-tier measurement (all figures ms). */
  case class LatencyResult(offeredRps: Long, p50: Double, p95: Double,
      p99: Double, maxMs: Double, waves: Int, intervalMs: Long,
      rowsPerWave: Long)

  /** Self-contained latency-SLO measurement of ONE offered-load tier:
    * fresh watched tree / warehouse / checkpoint, a SEEDED source tree +
    * warm-up wave, then `waves` uniform waves published at a fixed
    * `intervalMs` cadence with per-wave file-visible →
    * queryable-warehouse-row wall time measured through a
    * `StreamingQueryListener` (see the class doc). Reusable by both the
    * one-shot bench main and [[SloGate]] — the gate needs tiers isolated
    * from each other (no inherited backlog), so each tier gets its own
    * stream.
    *
    * The seed phase (`seedWaves` tiny bulk waves, processed before the
    * baseline) exists because a FRESH tree cannot register the regression
    * class the gate hunts: per-batch costs that scale with accumulated
    * state. After seeding, every timed micro-batch pays the source-dir
    * file census and seen-files bookkeeping over ~600 already-ingested
    * files (plus the 320 the timed waves themselves accrue), so an
    * O(files-seen) cost regression shows up at measurement scale instead
    * of vanishing against an empty dir. Seed rows are tiny — file COUNT
    * drives listing-class costs, not bytes.
    */
  def measureLatencyTier(spark: SparkSession, offeredRps: Long,
      waves: Int, intervalMs: Long, seedWaves: Int = 150): LatencyResult = {
    val root = java.nio.file.Files.createTempDirectory("slo-src").toString
    val wh = java.nio.file.Files.createTempDirectory("slo-wh").toString
    val ck = java.nio.file.Files.createTempDirectory("slo-ck").toString
    val day = LocalDate.parse("2024-03-14")
    val latFiles = 4
    val latRowsPerFile = math.max(1, (offeredRps * intervalMs / 1000 / latFiles).toInt)
    val rowsPerWave = latFiles.toLong * latRowsPerFile
    // seed + warm-up published before the stream starts: the first batches
    // absorb startup cost, ingest the seed census, and set the baseline
    (0 until seedWaves).foreach(i =>
      publish(stageWave(root, day, 1000 + i, latFiles, rows = 50)))
    publish(stageWave(root, day, 1, latFiles, latRowsPerFile))
    val q = StreamingAnalytics.ingestStream(spark, root, wh, ck,
      maxFilesPerTrigger = 8192, trigger = Trigger.ProcessingTime(0))
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      val events = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      val cum = new java.util.concurrent.atomic.AtomicLong(0L)
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val c = cum.addAndGet(e.progress.numInputRows)
        events.synchronized { events += ((System.nanoTime(), c)); () }
      }
    }
    spark.streams.addListener(listener)
    try {
      q.processAllAvailable()
      // ALL waves staged before the clock starts: generation must never
      // steal cadence from the publisher (renames are instant)
      val staged = (0 until waves)
        .map(i => stageWave(root, day, 100 + i, latFiles, latRowsPerFile))
      // deterministic drain (straggler seed/warm-up progress events must
      // land BEFORE the baseline is read), then baseline the counter
      org.apache.spark.graft.SparkInternals.drainListenerBus(spark.sparkContext)
      val base = listener.cum.get()
      val publishNanos = new Array[Long](waves)
      val start = System.nanoTime()
      staged.zipWithIndex.foreach { case (wave, i) =>
        val deadline = start + i * intervalMs * 1000000L
        val wait = (deadline - System.nanoTime()) / 1000000L
        if (wait > 0) Thread.sleep(wait)
        publishNanos(i) = System.nanoTime()
        publish(wave)
      }
      q.processAllAvailable()
      org.apache.spark.graft.SparkInternals.drainListenerBus(spark.sparkContext)
      val lats = waveLatencies(publishNanos.toSeq,
        listener.events.synchronized(listener.events.toSeq), rowsPerWave, base)
        .map(_ / 1e6) // ms
      LatencyResult(offeredRps, percentile(lats, 50), percentile(lats, 95),
        percentile(lats, 99), lats.max, waves, intervalMs, rowsPerWave)
    } finally {
      // listener removal and temp cleanup must survive a failed tier: a
      // leaked listener accumulates events for the session's lifetime and
      // repeated gate runs would otherwise fill /tmp
      spark.streams.removeListener(listener)
      try q.stop() finally Seq(root, wh, ck).foreach { d =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Stage one wave of `files` CSV files OUTSIDE the watched tree (see the
    * staging note in main); returns (tmp, destination) pairs for
    * [[publish]]. Deterministic content keyed by (wave, file, row).
    */
  def stageWave(root: String, day: LocalDate, wave: Int, files: Int,
      rows: Int): Seq[(java.nio.file.Path, java.nio.file.Path)] =
    (0 until files).map { f =>
      val date = day.plusDays(f % 4)
      new java.io.File(s"$root/$date").mkdirs()
      val tmp = java.nio.file.Files.createTempFile("stream-stage", ".csv")
      val w = new java.io.BufferedWriter(new java.io.FileWriter(tmp.toFile), 1 << 20)
      var i = 0
      while (i < rows) {
        val mm = i % 60
        val ss = (i / 60) % 60
        w.write(f"TCK$f%d-USDT,${(wave * 100 + f) * 10000000L + i}%d,0.${1000 + i % 9000}%d,${i % 50}%d.5," +
          f"0.${1100 + i % 900}%d,100.0,0.${900 + i % 900}%d,80.5," +
          f"2024-03-14T12:$mm%02d:$ss%02d.${i % 1000}%03d")
        w.newLine(); i += 1
      }
      w.close()
      tmp -> java.nio.file.Paths.get(s"$root/$date/TCK$f-USDT_W${wave}_PST_$date")
    }

  /** Atomically rename staged files into the watched tree — only complete
    * files may become visible (the reference's upload protocol).
    */
  def publish(staged: Seq[(java.nio.file.Path, java.nio.file.Path)]): Unit =
    staged.foreach { case (tmp, dst) =>
      java.nio.file.Files.move(tmp, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

  def main(args: Array[String]): Unit = {
    val totalRows = args.headOption.map(_.toInt).getOrElse(4_000_000)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(32)
    val latWaves = args.lift(2).map(_.toInt).getOrElse(80)
    val latIntervalMs = args.lift(3).map(_.toLong).getOrElse(250L)
    val latOfferedRps = args.lift(4).map(_.toLong).getOrElse(300_000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.localBuilder(cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("stream-bench").toString
    val rowsPerFile = totalRows / nFiles
    val day = LocalDate.parse("2024-03-14")
    // Files are STAGED outside the watched tree and atomically renamed in
    // ([[stageWave]]/[[publish]]): the file source reads each path exactly
    // once, so a producer writing in place would be observed half-written
    // and the tail silently lost (this bench failed its row-count assert
    // exactly that way before the rename). Same contract as the
    // reference's upload protocol and our ingest staging: only complete
    // files may become visible.
    def writeWave(wave: Int): Unit =
      publish(stageWave(root, day, wave, nFiles, rowsPerFile))

    val wh = java.nio.file.Files.createTempDirectory("stream-wh").toString
    val ck = java.nio.file.Files.createTempDirectory("stream-ck").toString
    // Wave 1: absorbs the one-time stream startup (source init, first file
    // listing, codegen). Wave 2 is the STEADY-STATE number — what a
    // continuously-running loader sustains per micro-batch; the cold
    // end-to-end rate (startup included) is reported alongside.
    writeWave(1)
    println(s"[stream-bench] wrote wave 1: $nFiles files x $rowsPerFile rows")
    val t0 = System.nanoTime()
    val q = StreamingAnalytics.ingestStream(spark, root, wh, ck,
      maxFilesPerTrigger = 8192, trigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      val coldSec = (System.nanoTime() - t0) / 1e9
      val staged2 = stageWave(root, day, 2, nFiles, rowsPerFile)
      println(s"[stream-bench] staged wave 2: $nFiles files x $rowsPerFile rows")
      // the timer starts BEFORE the renames: the running Trigger(0) stream
      // may begin processing as soon as the first file becomes visible, so
      // starting the clock after publish() would undercount the work
      val t1 = System.nanoTime()
      publish(staged2)
      q.processAllAvailable()
      val warmSec = (System.nanoTime() - t1) / 1e9
      q.recentProgress.foreach { p =>
        println(s"[stream-bench] batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      val waveRows = nFiles.toLong * rowsPerFile // actual rows, not the CLI ask
      val rows = spark.read.parquet(wh).count()
      assert(rows == 2L * waveRows, s"row loss: $rows != ${2L * waveRows}")
      val coldRps = (waveRows / coldSec).toLong
      val warmRps = (waveRows / warmSec).toLong
      println(f"[stream-bench] cold (startup incl.): $waveRows%d rows in $coldSec%.2f s = $coldRps%d rows/sec; " +
        f"steady-state: $waveRows%d rows in $warmSec%.2f s = $warmRps%d rows/sec " +
        "(reference baseline: 300k-500k rows/sec to remote ClickHouse)")
      println(s"""{"metric":"stream_ingest_rows_per_sec","value":$warmRps,"unit":"rows/sec","cold":$coldRps,"rows":$rows,"cold_sec":$coldSec,"warm_sec":$warmSec}""")

    } finally q.stop()
    // ---- latency SLO phase: file-visible -> queryable, sustained load ----
    // isolated tier measurement (own stream/dirs) so the throughput
    // phase's backlog never pollutes the cadence — the same function
    // SloGate gates per-tier
    if (latWaves > 0) {
      val r = measureLatencyTier(spark, latOfferedRps, latWaves, latIntervalMs)
      println(f"[stream-bench] latency SLO (file-visible -> queryable row, " +
        f"${r.waves}%d waves @ ${r.intervalMs}%dms): p50=${r.p50}%.0f ms p95=${r.p95}%.0f ms " +
        f"p99=${r.p99}%.0f ms max=${r.maxMs}%.0f ms")
      println(f"""{"metric":"stream_ingest_latency_ms","p50":${r.p50}%.1f,"p95":${r.p95}%.1f,"p99":${r.p99}%.1f,"max":${r.maxMs}%.1f,"waves":${r.waves}%d,"interval_ms":${r.intervalMs}%d,"rows_per_wave":${r.rowsPerWave}%d}""")
    }
    spark.stop()
  }
}
