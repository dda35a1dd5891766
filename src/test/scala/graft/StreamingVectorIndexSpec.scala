package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.StreamingVectorIndex

/** Incremental IVF index: frozen quantizer, partitioned growth, pruned
  * queries, replay idempotence.
  */
class StreamingVectorIndexSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf0001)
    .select(col("vec_id"), col("embedding"))

  test("two batches index everything; full-probe query equals index-free brute force") {
    val cent = tmpDir("svi-cent"); val idx = tmpDir("svi-idx")
    StreamingVectorIndex.buildCentroids(emb.filter(col("vec_id") < 25), cent, k = 4)
    StreamingVectorIndex.processBatch(emb.filter(col("vec_id") < 25), 0L, cent, idx)
    StreamingVectorIndex.processBatch(emb.filter(col("vec_id") >= 25), 1L, cent, idx)
    val n = emb.count()
    val all = StreamingVectorIndex.indexed(spark, idx)
    assert(all.count() == n)
    assert(all.select("vec_id").distinct().count() == n)

    val queries = emb.filter(col("vec_id") < 4)
    val viaIndex = StreamingVectorIndex.query(spark, cent, idx, queries,
      probes = 4, topK = 5).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // brute force through a DIFFERENT code path: no index, no partitions —
    // same d2 = |c|²−2q·c ordering over the raw table
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.catalyst.HashFunctions.dot_product(a, b)
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("eq"))
    val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("ec"))
    val w = Window.partitionBy("q_id").orderBy(col("d2"), col("c_id"))
    val brute = q.crossJoin(c).filter(col("q_id") =!= col("c_id"))
      .withColumn("d2", dot(col("ec"), col("ec")) - lit(2.0) * dot(col("eq"), col("ec")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("q_id", "rnk", "c_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(viaIndex.toSeq.sorted == brute.toSeq.sorted)

    // partial probes trade recall for scan width — still above the floor
    val part = StreamingVectorIndex.query(spark, cent, idx, queries,
      probes = 1, topK = 5).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bruteSet = brute.map(r => (r._1, r._3)).toSet
    val recall = part.intersect(bruteSet).size.toDouble / bruteSet.size
    assert(recall >= 0.5, s"single-probe recall $recall")
  }

  test("wired app flow: first drop bootstraps the quantizer, replay of it converges") {
    val warehouse = tmpDir("svi-wh")
    val vecsDir = s"${tmpDir("svi-drop")}/vecs"
    def put(name: String, vecs: Seq[(Long, Seq[Double])]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$vecsDir/$name"),
        vecs.map { case (id, v) =>
          s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}""" }
          .mkString("\n").getBytes)
      ()
    }
    val q = graft.app.PipelineApp.vectorIndexer(spark, vecsDir, warehouse,
      maxFilesPerTrigger = 1,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      put("v1.json", Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0), 3L -> Seq(0.9, 0.1)))
      q.processAllAvailable()
      // first batch trained the quantizer AND got indexed
      assert(spark.read.parquet(s"$warehouse/_vec_centroids").count() > 0)
      assert(StreamingVectorIndex.indexed(spark, s"$warehouse/_vec_index").count() == 3)
      put("v2.json", Seq(4L -> Seq(0.1, 0.95)))
      q.processAllAvailable()
      assert(StreamingVectorIndex.indexed(spark, s"$warehouse/_vec_index").count() == 4)
    } finally q.stop()

    // replay of the BOOTSTRAP batch: centroids rebuilt deterministically,
    // index unchanged
    val centBefore = spark.read.parquet(s"$warehouse/_vec_centroids").collect()
      .map(_.toString).sorted.toSeq
    import spark.implicits._
    val b0 = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)), (3L, Seq(0.9, 0.1)))
      .toDF("vec_id", "embedding")
    // simulate the crash window: quantizer lost mid-replay is the worst
    // case — delete it so the replayed batch 0 retrains from scratch
    val (fs, cp) = graft.ingest.HadoopFs.forPath(spark, s"$warehouse/_vec_centroids")
    fs.delete(cp, true)
    StreamingVectorIndex.processBatch(b0, 0L,
      s"$warehouse/_vec_centroids", s"$warehouse/_vec_index")
    val centAfter = spark.read.parquet(s"$warehouse/_vec_centroids").collect()
      .map(_.toString).sorted.toSeq
    assert(centAfter == centBefore)
    assert(StreamingVectorIndex.indexed(spark, s"$warehouse/_vec_index").count() == 4)
  }

  test("bootstrap crash window: an uncommitted centroid write is rebuilt, not frozen") {
    val cent = tmpDir("svi-cent4"); val idx = tmpDir("svi-idx4")
    // simulate a crash mid-centroid-write: the dir exists with debris but
    // no _SUCCESS — treating it as a quantizer would index zero vectors
    java.nio.file.Files.write(
      java.nio.file.Paths.get(cent, "part-junk.parquet.tmp"), Array[Byte](1, 2))
    StreamingVectorIndex.processBatch(emb.filter(col("vec_id") < 25), 0L, cent, idx)
    assert(spark.read.parquet(cent).count() > 0)
    assert(StreamingVectorIndex.indexed(spark, idx).count() == 25)
  }

  test("index compaction: fragmented cells collapse to one dir, content and queries unchanged") {
    val cent = tmpDir("svi-cent5"); val idx = tmpDir("svi-idx5")
    StreamingVectorIndex.buildCentroids(emb, cent, k = 2)
    // 10 tiny batches: each touched cell gains one batch dir per batch
    for (b <- 0 until 10)
      StreamingVectorIndex.processBatch(
        emb.filter(col("vec_id") % 10 === b), b.toLong, cent, idx)
    val beforeRows = StreamingVectorIndex.indexed(spark, idx)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    val q0 = StreamingVectorIndex.query(spark, cent, idx,
      emb.filter(col("vec_id") < 3), probes = 2, topK = 5).collect().toSeq

    val (cells, before, after) = StreamingVectorIndex.compactIndex(spark, idx, threshold = 2)
    assert(cells > 0 && before > after, s"($cells, $before, $after)")
    val (fs, root) = graft.ingest.HadoopFs.forPath(spark, idx)
    for (cd <- fs.listStatus(root) if cd.getPath.getName.startsWith("cid="))
      assert(fs.listStatus(cd.getPath)
        .count(_.getPath.getName.startsWith("batch_id=")) == 1, cd.getPath)

    // (vec_id, cid) content identical; query results identical
    val afterRows = StreamingVectorIndex.indexed(spark, idx)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    assert(afterRows == beforeRows)
    assert(StreamingVectorIndex.query(spark, cent, idx,
      emb.filter(col("vec_id") < 3), probes = 2, topK = 5).collect().toSeq == q0)
    // the stream keeps appending above the consolidated id
    StreamingVectorIndex.processBatch(
      emb.filter(col("vec_id") < 5).withColumn("vec_id", col("vec_id") + 1000),
      10L, cent, idx)
    assert(StreamingVectorIndex.indexed(spark, idx).count() == beforeRows.size + 5)
  }

  test("promote crash window: a cell lost mid-promote is regenerated by the replay") {
    val cent = tmpDir("svi-cent3"); val idx = tmpDir("svi-idx3")
    StreamingVectorIndex.buildCentroids(emb, cent, k = 4)
    StreamingVectorIndex.processBatch(emb.filter(col("vec_id") < 25), 0L, cent, idx)
    val b1 = emb.filter(col("vec_id") >= 25)
    StreamingVectorIndex.processBatch(b1, 1L, cent, idx)
    val full = StreamingVectorIndex.indexed(spark, idx).count()

    // crash mid-promote: one cell's batch-1 partition never made it and the
    // staging tree died with the JVM — drop that partition to simulate
    val (fs, root) = graft.ingest.HadoopFs.forPath(spark, idx)
    val victim = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cid="))
      .flatMap(cd => fs.listStatus(cd.getPath))
      .find(_.getPath.getName == "batch_id=1")
    assume(victim.nonEmpty)
    fs.delete(victim.get.getPath, true)
    assert(StreamingVectorIndex.indexed(spark, idx).count() < full)

    // the streaming engine re-runs the uncommitted batch: assignment is a
    // pure function of (centroids, batch), promote deletes dest first —
    // the index converges to exactly the full content
    StreamingVectorIndex.processBatch(b1, 1L, cent, idx)
    val after = StreamingVectorIndex.indexed(spark, idx)
    assert(after.count() == full)
    assert(after.select("vec_id").distinct().count() == full)
  }

  test("query scan is partition-pruned to the probed cells; replay converges") {
    val cent = tmpDir("svi-cent2"); val idx = tmpDir("svi-idx2")
    StreamingVectorIndex.buildCentroids(emb, cent, k = 4)
    StreamingVectorIndex.processBatch(emb.filter(col("vec_id") < 25), 0L, cent, idx)
    StreamingVectorIndex.processBatch(emb.filter(col("vec_id") >= 25), 1L, cent, idx)
    val nCells = spark.read.parquet(cent).count()
    assert(nCells > 1) // pruning is only meaningful with multiple cells

    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val one = emb.filter(col("vec_id") === 7)
      val res = StreamingVectorIndex.query(spark, cent, idx, one, probes = 1, topK = 3)
      res.collect()
      val scans = res.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("svi-idx2")) => f
      }
      assert(scans.nonEmpty)
      assert(scans.head.partitionFilters.nonEmpty, scans.head.toString)
      val parts = scans.head.metrics.get("numPartitions").map(_.value)
      // one probed cell × ≤2 batch dirs, out of nCells×2 total
      assert(parts.exists(p => p >= 1 && p <= 2), s"partitions read: $parts")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)

    // replay of batch 1 (crash after promote, before offset commit):
    // same content, same layout, nothing doubled
    val before = StreamingVectorIndex.indexed(spark, idx).count()
    StreamingVectorIndex.processBatch(emb.filter(col("vec_id") >= 25), 1L, cent, idx)
    val after = StreamingVectorIndex.indexed(spark, idx)
    assert(after.count() == before)
    assert(after.select("vec_id").distinct().count() == before)
  }
}
