package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDrift

/** Streaming PSI drift monitor: per-micro-batch scoring against a stored
  * reference histogram, including the replay idempotence the log's
  * exactly-once contract rests on.
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("in-distribution batch scores low, shifted batch high; replay rewrites identically") {
    val ref = tmpDir("drift-ref")
    val log = tmpDir("drift-log")
    // reference: a 3-token vocabulary with a clear head
    val refDocs = (1L to 60L).map(i =>
        (i, if (i % 3 == 0) "beta gamma" else "alpha alpha beta"))
      .toDF("doc_id", "text")
    StreamingDrift.buildReference(refDocs, ref, k = 3)

    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDrift.start(in.toDF().toDF("doc_id", "text"),
      ref, log, tmpDir("drift-ckpt"))
    try {
      // batch 0: drawn from the same distribution as the reference
      in.addData((101L, "alpha alpha beta"), (102L, "beta gamma"),
        (103L, "alpha alpha beta"))
      q.processAllAvailable()
      // batch 1: collapsed to a single tail token — a real shift
      in.addData((201L, "gamma gamma gamma gamma"), (202L, "gamma gamma"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = StreamingDrift.driftLog(spark, log).collect()
      .map(r => r.getLong(3) -> r).toMap
    assert(rows.keySet == Set(0L, 1L))
    val (psi0, psi1) = (rows(0L).getDouble(2), rows(1L).getDouble(2))
    assert(psi0 >= 0.0 && psi1 >= 0.0)
    assert(psi1 > psi0, s"shifted batch must out-score in-distribution: $psi1 <= $psi0")
    assert(psi1 > 0.25, s"collapsed batch should read as 'shifted': $psi1") // the PSI rule of thumb
    // token accounting: batch 1 had 6 tokens, all tracked
    assert(rows(1L).getLong(0) == 6L && rows(1L).getLong(1) == 6L)

    // ---- replay batch 1 as the engine would after a crash between the log
    // write and the offset commit: the row must come back identical
    val b1 = Seq((201L, "gamma gamma gamma gamma"), (202L, "gamma gamma"))
      .toDF("doc_id", "text")
    StreamingDrift.processBatch(b1, 1L, ref, log)
    val replayed = StreamingDrift.driftLog(spark, log).collect()
      .map(r => r.getLong(3) -> r).toMap
    assert(replayed(1L).getDouble(2) == psi1)
    assert(replayed.size == 2)
  }

  test("wired app flow: monitor is None on cold start, arms from the admitted corpus") {
    val warehouse = tmpDir("drift-wh")
    val docsDir = s"${tmpDir("drift-docs")}/docs"
    val trig = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)
    // cold start: nothing admitted yet — no baseline, no monitor
    assert(graft.app.PipelineApp
      .driftMonitor(spark, docsDir, warehouse, 1, trig).isEmpty)
    def put(name: String, docs: Seq[(Long, String)]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$docsDir/$name"),
        docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes)
      ()
    }
    // admit a baseline corpus through flow 5's own wiring
    val adm = graft.app.PipelineApp.corpusAdmission(spark, docsDir, warehouse,
      maxFilesPerTrigger = 1, trigger = trig)
    try {
      put("b1.json", Seq(1L -> "alpha beta alpha", 2L -> "beta gamma"))
      adm.processAllAvailable()
    } finally adm.stop()
    // warm boot: the monitor builds its reference from that corpus and
    // scores the drop dir from the beginning (its own checkpoint)
    val mon = graft.app.PipelineApp.driftMonitor(spark, docsDir, warehouse, 2, trig)
    assert(mon.nonEmpty)
    try {
      put("b2.json", Seq(3L -> "gamma gamma gamma gamma gamma")) // skewed drop
      mon.get.processAllAvailable()
    } finally mon.get.stop()
    val log = StreamingDrift.driftLog(spark, s"$warehouse/_drift_log").collect()
    assert(log.nonEmpty)
    assert(log.forall(r => r.getDouble(2) >= 0.0 && !r.getDouble(2).isNaN))
    assert(log.map(_.getDouble(2)).max > 0.0) // the skewed drop registered
  }

  test("empty batch is skipped, not scored as drift; half-written reference is rebuilt") {
    val ref = tmpDir("drift-ref3")
    val log = tmpDir("drift-log3")
    StreamingDrift.buildReference(
      (1L to 10L).map(i => (i, "alpha alpha beta")).toDF("doc_id", "text"), ref, k = 2)
    // empty batch: a zero-row drop must not log a spurious uniform-vs-ref alarm
    StreamingDrift.processBatch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 0L, ref, log)
    val (lfs, lp) = graft.ingest.HadoopFs.forPath(spark, log)
    assert(!lfs.exists(lp) || lfs.listStatus(lp).isEmpty)

    // crash between the terms and total writes: the monitor must rebuild,
    // not boot a stream that throws on the missing total table forever
    val wh = tmpDir("drift-wh3")
    val docsDir = s"${tmpDir("drift-docs3")}/docs"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(docsDir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$docsDir/b1.json"),
      """{"doc_id":1,"text":"alpha beta"}""".getBytes)
    val adm = graft.app.PipelineApp.corpusAdmission(spark, docsDir, wh,
      maxFilesPerTrigger = 1, trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try adm.processAllAvailable() finally adm.stop()
    // simulate the half-written reference: terms committed, total missing
    (1L to 5L).map(i => (i, "x y")).toDF("doc_id", "text")
      .groupBy("text").count()
      .selectExpr("text AS token", "CAST(count AS LONG) AS ref_n")
      .write.mode("overwrite").parquet(s"$wh/_drift_ref/terms")
    val mon = graft.app.PipelineApp.driftMonitor(spark, docsDir, wh, 1,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    assert(mon.nonEmpty) // rebuilt from the corpus instead of bricking
    try mon.get.processAllAvailable() finally mon.get.stop()
    assert(StreamingDrift.driftLog(spark, s"$wh/_drift_log").count() >= 1)
  }

  test("a feature missing from the batch contributes finite divergence (add-1 smoothing)") {
    val ref = tmpDir("drift-ref2")
    val log = tmpDir("drift-log2")
    StreamingDrift.buildReference(
      (1L to 10L).map(i => (i, "alpha beta gamma")).toDF("doc_id", "text"), ref, k = 3)
    // the batch produces only one of the three tracked features
    StreamingDrift.processBatch(
      Seq((1L, "alpha alpha")).toDF("doc_id", "text"), 0L, ref, log)
    val r = StreamingDrift.driftLog(spark, log).collect()
    assert(r.length == 1)
    val psi = r(0).getDouble(2)
    assert(!psi.isNaN && !psi.isInfinite && psi > 0.0, s"psi=$psi")
  }
}
