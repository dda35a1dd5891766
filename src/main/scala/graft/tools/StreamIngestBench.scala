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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("stream-bench").toString
    val rowsPerFile = totalRows / nFiles
    val day = LocalDate.parse("2024-03-14")
    (0 until nFiles).foreach { f =>
      val date = day.plusDays(f % 4)
      val dir = new java.io.File(s"$root/$date"); dir.mkdirs()
      val w = new java.io.BufferedWriter(
        new java.io.FileWriter(s"$root/$date/TCK$f-USDT_PST_$date"), 1 << 20)
      var i = 0
      while (i < rowsPerFile) {
        val mm = i % 60
        val ss = (i / 60) % 60
        w.write(f"TCK$f%d-USDT,${f * 10000000L + i}%d,0.${1000 + i % 9000}%d,${i % 50}%d.5," +
          f"0.${1100 + i % 900}%d,100.0,0.${900 + i % 900}%d,80.5," +
          f"2024-03-14T12:$mm%02d:$ss%02d.${i % 1000}%03d")
        w.newLine(); i += 1
      }
      w.close()
    }
    println(s"[stream-bench] wrote $nFiles files x $rowsPerFile rows")

    val wh = java.nio.file.Files.createTempDirectory("stream-wh").toString
    val ck = java.nio.file.Files.createTempDirectory("stream-ck").toString
    val t0 = System.nanoTime()
    val q = StreamingAnalytics.ingestStream(spark, root, wh, ck,
      maxFilesPerTrigger = 8192, trigger = Trigger.ProcessingTime(0))
    try q.processAllAvailable() finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.parquet(wh).count()
    val rps = (rows / sec).toLong
    println(f"[stream-bench] streamed $rows%d rows in $sec%.2f s = $rps%d rows/sec " +
      "(reference baseline: 300k-500k rows/sec to remote ClickHouse)")
    println(s"""{"metric":"stream_ingest_rows_per_sec","value":$rps,"unit":"rows/sec","rows":$rows,"sec":$sec}""")
    spark.stop()
  }
}
