package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDedup

/** Streaming incremental dedup: per-micro-batch admission against the
  * persistent FingerprintStore, including the replay scenarios the
  * exactly-once corpus contract is built for.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("stream admits fresh docs, drops history + within-batch dups, survives replay") {
    val store = tmpDir("sd-store")
    val corpus = tmpDir("sd-corpus")
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(in.toDF().toDF("doc_id", "text"),
      store, corpus, tmpDir("sd-ckpt"))
    try {
      // batch 0: one exact dup inside the batch (keeps min doc_id), plus a
      // whitespace variant (same normalized fingerprint)
      in.addData((1L, "alpha beta gamma"), (2L, "delta epsilon"),
        (3L, "alpha beta gamma"), (4L, "  delta   epsilon "))
      q.processAllAvailable()
      val c0 = StreamingDedup.corpus(spark, corpus)
      assert(c0.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

      // batch 1: one historical dup (vs batch 0), one fresh
      in.addData((5L, "alpha beta gamma"), (6L, "fresh document text"))
      q.processAllAvailable()
      val c1 = StreamingDedup.corpus(spark, corpus)
      assert(c1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 6L))
    } finally q.stop()

    // ---- replay: re-run batch 1's admission as the streaming engine would
    // after a crash where the store append HAD succeeded but the offset
    // commit had not. The batch_id<n history filter must exclude batch 1's
    // own fingerprints, so the identical admitted set is recomputed and the
    // corpus dir is rewritten, not emptied or doubled.
    val b1 = Seq((5L, "alpha beta gamma"), (6L, "fresh document text"))
      .toDF("doc_id", "text")
    StreamingDedup.processBatch(b1, 1L, store, corpus)
    val replayed = StreamingDedup.corpus(spark, corpus)
    assert(replayed.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 6L))
    // store now carries duplicate rows for batch 1's fingerprints — which
    // must NOT change any future admission (the store is a set)
    val b2 = Seq((7L, "fresh document text"), (8L, "another new one"))
      .toDF("doc_id", "text")
    StreamingDedup.processBatch(b2, 2L, store, corpus)
    assert(StreamingDedup.corpus(spark, corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 6L, 8L))

    // corpus rows carry their fingerprints; every fingerprint is unique
    val fps = StreamingDedup.corpus(spark, corpus).select("fp_exact").as[String].collect()
    assert(fps.length == fps.distinct.length)
  }

  test("concurrent admission batches and store compactions lose nothing") {
    // the per-store maintenanceLock contract, hammered: an admission
    // thread drives micro-batches (probe→corpus write→store append) while
    // a maintenance thread compacts the store's buckets under it. Without
    // the lock a compaction swap could eat a concurrent append's file, and
    // the dropped fingerprints would re-admit forever after.
    val store = tmpDir("sdc-store")
    val corpus = tmpDir("sdc-corpus")
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val batches = 8
    val perBatch = 40
    def docsFor(b: Int) = spark.range(b * perBatch, (b + 1) * perBatch)
      .selectExpr("id AS doc_id", "concat('uniq doc body ', id) AS text")
    val admitter = new Thread(() =>
      try for (b <- 0 until batches)
        StreamingDedup.processBatch(docsFor(b), b.toLong, store, corpus)
      catch { case t: Throwable => failures.add(t); () })
    val compactor = new Thread(() =>
      try for (_ <- 0 until 12) {
        graft.operators.FingerprintStore.compact(spark, store, threshold = 1)
        Thread.sleep(20)
      } catch { case t: Throwable => failures.add(t); () })
    admitter.start(); compactor.start()
    admitter.join(); compactor.join()
    assert(failures.isEmpty, s"thread failures: ${failures.toArray.mkString("; ")}")
    // every unique doc admitted exactly once, and the store still vetoes
    // all of them on a full replay of every batch
    val admitted = StreamingDedup.corpus(spark, corpus)
    assert(admitted.count() == batches.toLong * perBatch)
    for (b <- 0 until batches)
      StreamingDedup.processBatch(docsFor(b), b.toLong, store, corpus)
    assert(StreamingDedup.corpus(spark, corpus).count() == batches.toLong * perBatch)
    // and a brand-new batch duplicating old content is fully rejected
    StreamingDedup.processBatch(docsFor(0), batches.toLong, store, corpus)
    assert(StreamingDedup.corpus(spark, corpus).count() == batches.toLong * perBatch)
  }

  test("wired app flow: JSON drop-dir admission through PipelineApp.corpusAdmission") {
    // the continuous-mode wiring, driven file-by-file: same drop-dir file
    // source, same store/corpus layout under the warehouse dir
    val warehouse = tmpDir("sd-wh")
    val docsDir = s"${tmpDir("sd-docs")}/docs"
    def put(name: String, docs: Seq[(Long, String)]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$docsDir/$name"),
        docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes)
      ()
    }
    val q = graft.app.PipelineApp.corpusAdmission(spark, docsDir, warehouse,
      maxFilesPerTrigger = 1,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      // micro-batch 1: in-batch exact dup (min doc_id wins)
      put("b1.json", Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon",
        3L -> "alpha beta gamma"))
      q.processAllAvailable()
      assert(StreamingDedup.corpus(spark, s"$warehouse/_corpus")
        .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      // micro-batch 2: historical dup vs batch 1, plus one fresh doc
      put("b2.json", Seq(4L -> "delta epsilon", 5L -> "a brand new doc"))
      q.processAllAvailable()
      assert(StreamingDedup.corpus(spark, s"$warehouse/_corpus")
        .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L))
      // every flow-5 artifact is underscore-prefixed: a ticker-warehouse
      // partition-discovery read over the SHARED root must still work (a
      // visible corpus/batch_id tree would make it throw conflicting
      // partition columns)
      val srcDir = tmpDir("sd-ticks")
      val csv = s"$srcDir/AVA-USDT_PST_2024-03-14"
      java.nio.file.Files.write(java.nio.file.Paths.get(csv),
        "AVA-USDT,1,0.61,15.2,0.62,100.0,0.60,80.5,2024-03-14T12:34:56.123".getBytes)
      graft.ingest.TickerIngest.ingest(spark, Seq(csv), warehouse)
      assert(graft.ingest.TickerIngest.warehouse(spark, warehouse).count() == 1)
    } finally q.stop()
  }
}
