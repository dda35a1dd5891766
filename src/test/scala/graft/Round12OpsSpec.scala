package graft

import org.apache.spark.sql.functions._
import graft.streaming.{StreamingQuantiles, StreamingTopK}

/** Round-12 hardening: the cleanup-cadence folds that keep the streaming
  * sketch stores bounded in a long-running app, and the LogSink shutdown
  * drain that makes "no record is lost" true at close.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def batchDirs(store: String, sub: String): Int =
    Option(new java.io.File(s"$store/$sub").listFiles())
      .map(_.count(f => f.isDirectory && f.getName.startsWith("batch_id=")))
      .getOrElse(0)

  test("cleanup-cadence folds keep both sketch stores' batch dirs bounded " +
      "across app cycles, and boards stay exact") {
    val hh = tmpDir("r12-hh")
    val len = tmpDir("r12-len")
    // Simulate the PipelineApp loop: each cleanup cycle a few micro-batches
    // have landed (flows 8/9), then the cleanup cadence folds both stores —
    // the in-stream foldEvery counter alone would let a slow drip
    // accumulate dirs for days. Dir counts must be bounded by the per-cycle
    // drip, never by stream age.
    var next = 0L
    for (cycle <- 0 until 5) {
      for (_ <- 0 until 3) {
        val id = next; next += 1
        StreamingTopK.processBatch(
          Seq((id, s"tok$cycle common")).toDF("doc_id", "text"), id, hh, k = 8)
        StreamingQuantiles.processBatch(
          Seq(id.toDouble).toDF("len"), "len", id, len)
      }
      StreamingTopK.compact(spark, hh, k = 8)
      StreamingQuantiles.compact(spark, len)
      assert(batchDirs(hh, "summaries") == 0 && batchDirs(hh, "meta") == 0,
        s"cycle $cycle: hh store must fold to zero batch dirs")
      assert(batchDirs(len, "summaries") == 0 && batchDirs(len, "meta") == 0,
        s"cycle $cycle: len store must fold to zero batch dirs")
    }
    // the merged board after 5 fold generations is still exact (vocab 6
    // ≤ k=8, so every MG count is lossless and err_bound is 0)
    val board = StreamingTopK.mergedTopK(spark, hh, k = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(board("common") == 15L, s"common=15 expected, got $board")
    (0 until 5).foreach(c => assert(board(s"tok$c") == 3L))
    // and the quantile board still certifies the true median's interval:
    // values were 0..14, true median (rank 8 of 15) = 7.0 = 7e6 micro
    val med = StreamingQuantiles.quantiles(spark, len, Seq(0.5)).collect()(0)
    assert(med.getLong(2) <= 7000000L && 7000000L <= med.getLong(3),
      s"median interval must contain 7e6 micro: $med")
  }

  test("log sink close() drains the buffered residue through a final " +
      "micro-batch before stopping the query") {
    // bufferSize 1000 + huge timeout: nothing can flush except close()
    val sink = new graft.streaming.LogSink(spark, bufferSize = 1000,
      flushTimeoutSec = 3600)
    val out = tmpDir("r12-logclose")
    val q = sink.start(out, tmpDir("r12-logclose-ckpt"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    sink.enqueue(graft.schema.LogRecord(
      ts("2024-08-08 10:00:00"), "INFO", "t", "shutdown residue",
      Map.empty, None, None))
    q.processAllAvailable() // residue is sub-buffer: still unwritten
    sink.close()            // flush -> final cycle -> stop, in that order
    assert(!q.isActive, "close() must stop the query")
    assert(spark.read.parquet(out).count() == 1L,
      "the residue buffered at shutdown must reach the table")
  }
}
