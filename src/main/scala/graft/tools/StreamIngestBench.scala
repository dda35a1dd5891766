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
  * Usage: runMain graft.tools.StreamIngestBench [totalRows] [files]
  */
object StreamIngestBench {
  def main(args: Array[String]): Unit = {
    val totalRows = args.headOption.map(_.toInt).getOrElse(4_000_000)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.localBuilder(cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("stream-bench").toString
    val rowsPerFile = totalRows / nFiles
    val day = LocalDate.parse("2024-03-14")
    // Files are STAGED outside the watched tree and atomically renamed in:
    // the file source reads each path exactly once, so a producer writing
    // in place would be observed half-written and the tail silently lost
    // (this bench failed its row-count assert exactly that way before the
    // rename). Same contract as the reference's upload protocol and our
    // ingest staging: only complete files may become visible.
    def stageWave(wave: Int): Seq[(java.nio.file.Path, java.nio.file.Path)] =
      (0 until nFiles).map { f =>
        val date = day.plusDays(f % 4)
        new java.io.File(s"$root/$date").mkdirs()
        val tmp = java.nio.file.Files.createTempFile("stream-stage", ".csv")
        val w = new java.io.BufferedWriter(new java.io.FileWriter(tmp.toFile), 1 << 20)
        var i = 0
        while (i < rowsPerFile) {
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
    // all generation done before any rename; the renames land near-simultaneously
    def publish(staged: Seq[(java.nio.file.Path, java.nio.file.Path)]): Unit =
      staged.foreach { case (tmp, dst) =>
        java.nio.file.Files.move(tmp, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    def writeWave(wave: Int): Unit = publish(stageWave(wave))

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
      val staged2 = stageWave(2)
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
    spark.stop()
  }
}
