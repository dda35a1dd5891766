package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.ingest.DirSwap

/** Incremental IVF vector index as a streaming flow — the vector sibling of
  * [[StreamingDedup]]: a FROZEN coarse quantizer (k centroids, trained once
  * from a bootstrap sample) assigns every incoming embedding micro-batch to
  * its nearest cell, and the vectors land in a `cid=<k>/batch_id=<n>`
  * partitioned store. Queries probe the few nearest cells and scan ONLY
  * those cid partitions — partition pruning IS the index. This is how a
  * production vector store actually grows: the quantizer stays fixed (so
  * cell assignment is a pure map), history lives in the partitioned layout,
  * and a rebuild with a fresh quantizer is a new directory.
  *
  * Replay safety follows the [[StreamingDedup]] contract: the batch write
  * is per-batch-directory `overwrite` under each cell, and assignment
  * depends only on the immutable centroids plus the batch's own rows — a
  * replayed batch rewrites its partitions byte-identically.
  *
  * 100 TB posture: the centroid table is k·dim doubles — always broadcast;
  * per batch the only data-scale work is one broadcast nested-loop scoring
  * pass (k rows per vector, argmin via a per-vector window — frames are
  * k-sized, partitioned by vec_id) and one partitioned write. Query cost is
  * `probes/k` of the corpus, enforced by the scan's partition filter.
  */
object StreamingVectorIndex {

  val DefaultK = 8
  val DefaultProbes = 2
  val DefaultTopK = 10

  private def dot(a: Column, b: Column): Column =
    graft.catalyst.HashFunctions.dot_product(a, b)

  /** Train the frozen coarse quantizer from a bootstrap frame (`vec_id`,
    * `embedding`): seeds are the `k` lowest vec_ids' embeddings (a total
    * order — deterministic), refined by one Lloyd step (assign all
    * bootstrap vectors to their nearest seed, recompute exact per-cell
    * component means). Written as a k-row parquet table under `centDir`.
    * One step is enough for a usable quantizer; more Lloyd rounds are the
    * same two jobs repeated.
    */
  def buildCentroids(bootstrap: DataFrame, centDir: String, k: Int = DefaultK): Unit = {
    val seeds = bootstrap.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding"))
      .withColumn("cid",
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int"))
      .select(col("cid"), col("embedding").as("centroid"))
    // the seed frame is k rows: the global row_number window above is
    // k-sized by construction (post-limit), not data-scale
    val assigned = assign(bootstrap, seeds)
    assigned
      .select(col("cid"), posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy("cid", "j")
      .agg((sum(col("x").cast("decimal(20,8)")).cast("double") / count(lit(1))).as("c"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("c")))),
        e => e.getField("c")).as("centroid"))
      .write.mode("overwrite").parquet(centDir)
  }

  /** Nearest-cell assignment of `vecs` (`vec_id`, `embedding`) against a
    * centroid frame (`cid`, `centroid`): argmin of squared L2 via
    * `|c|² − 2·x·c` (the |x|² term is constant per vector), ties to the
    * smallest cid. The centroid side is broadcast; the window frame is the
    * k candidate rows of one vector.
    */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val scored = vecs.crossJoin(broadcast(
        cents.select(col("cid"),
          col("centroid"),
          dot(col("centroid"), col("centroid")).as("cc"))))
      .withColumn("d2", col("cc") - lit(2.0) * dot(col("embedding"), col("centroid")))
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(vecs.columns.map(col) :+ col("cid"): _*)
  }

  private def readCentroids(spark: SparkSession, centDir: String): DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("cid", IntegerType),
        StructField("centroid", ArrayType(DoubleType)))))
      .parquet(centDir)

  /** Index one micro-batch: assign against the frozen quantizer, land the
    * vectors under `cid=<k>/batch_id=<n>`. Public so specs drive replay.
    *
    * Cold-start bootstrap: if no quantizer exists yet, the FIRST batch
    * trains it (the practical bootstrap every vector store uses) — and
    * because [[buildCentroids]] is a deterministic function of the batch
    * content, a replay of that first batch rebuilds the identical
    * centroids before re-indexing, preserving the replay contract.
    */
  def processBatch(batch: DataFrame, batchId: Long,
      centDir: String, indexDir: String): Unit = {
    val spark = batch.sparkSession
    val (fs, cp) = graft.ingest.HadoopFs.forPath(spark, centDir)
    // COMMITTED quantizer, not just a non-empty dir: a crash mid-write
    // leaves partial files (no _SUCCESS) — treating those as a quantizer
    // would freeze an unreadable/empty one and silently drop every future
    // vector. No marker → rebuild (the overwrite clears the debris).
    val committed = fs.exists(new org.apache.hadoop.fs.Path(cp, "_SUCCESS"))
    if (!committed) {
      val b = batch.localCheckpoint(true) // bootstrap + assignment read it
      // an EMPTY first batch (a zero-byte drop file) must not freeze a
      // zero-centroid quantizer — that would silently drop every future
      // vector; skip it and let the first non-empty batch bootstrap
      if (b.isEmpty) return
      buildCentroids(b.select("vec_id", "embedding"), centDir)
      return indexAssigned(b, batchId, centDir, indexDir)
    }
    indexAssigned(batch, batchId, centDir, indexDir)
  }

  private def indexAssigned(batch: DataFrame, batchId: Long,
      centDir: String, indexDir: String): Unit = {
    val spark = batch.sparkSession
    assign(batch.select(col("vec_id"), col("embedding")),
        readCentroids(spark, centDir))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .partitionBy("cid", "batch_id")
      .parquet(s"$indexDir/_in/batch_id=$batchId")
    // two-phase: the assignment write above lands in a private per-batch
    // staging dir (overwrite = replay-idempotent), then moves into the
    // live cid-partitioned layout via rename — a replayed batch first
    // clears its own earlier files (same names, deterministic content)
    promote(spark, s"$indexDir/_in/batch_id=$batchId", indexDir, batchId)
  }

  /** Move `cid=K/batch_id=N` staging trees into the live layout. Renames
    * only, through the Hadoop FileSystem (SCALE.md §7b applies on object
    * stores); the per-(cid, batch) target dir is deleted first so a replay
    * converges to exactly one copy.
    */
  private def promote(spark: SparkSession, staging: String, indexDir: String,
      batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val (fs, src) = graft.ingest.HadoopFs.forPath(spark, staging)
    if (!fs.exists(src)) return
    for (cidDir <- fs.listStatus(src) if cidDir.isDirectory &&
        cidDir.getPath.getName.startsWith("cid=")) {
      for (bDir <- fs.listStatus(cidDir.getPath) if bDir.isDirectory) {
        val dest = new Path(new Path(indexDir, cidDir.getPath.getName),
          bDir.getPath.getName)
        fs.delete(dest, true)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(bDir.getPath, dest))
          throw new java.io.IOException(s"rename failed: ${bDir.getPath} -> $dest")
      }
    }
    fs.delete(src, true)
    ()
  }

  /** Wire a streaming embedding source (`vec_id`, `embedding`) into the
    * indexer. One partitioned append per micro-batch, replay-idempotent.
    */
  def start(vecs: DataFrame, centDir: String, indexDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, centDir, indexDir)
      }
      .start()

  /** Small-files maintenance for the index — the same loop the warehouse
    * runs per date partition and the fingerprint store per hash bucket,
    * here per CELL: every micro-batch appends one `batch_id=<n>` dir per
    * touched cell, so a long-lived stream leaves thousands of tiny dirs
    * behind, and query cost becomes task-per-file. Each fragmented cell is
    * rewritten into a single consolidated `batch_id=<maxBatch>` dir via
    * the crash-safe [[graft.ingest.DirSwap]] protocol (build `.__new`
    * complete, verify the row count, two-rename swap; [[recover]] repairs
    * the crash windows).
    *
    * CONTRACT: run in a maintenance window, with the indexing stream
    * STOPPED (the cleanup-cadence slot PipelineApp uses for the other
    * stores). Consolidation folds batch dirs together, so it is only
    * replay-safe once their offsets are committed — which stopping the
    * stream guarantees; a replay after restart starts at a batch id above
    * every consolidated one. Returns (cellsCompacted, dirsBefore,
    * dirsAfter).
    */
  def compactIndex(spark: SparkSession, indexDir: String,
      threshold: Int = 8): (Int, Int, Int) = {
    import org.apache.hadoop.fs.Path
    val (fs, root) = graft.ingest.HadoopFs.forPath(spark, indexDir)
    if (!fs.exists(root)) return (0, 0, 0)
    var (cells, before, after) = (0, 0, 0)
    for (cd <- fs.listStatus(root)
        if cd.isDirectory && cd.getPath.getName.startsWith("cid=") &&
          !cd.getPath.getName.contains(".__")) {
      def batchDirs = fs.listStatus(cd.getPath).filter(st =>
        st.isDirectory && st.getPath.getName.startsWith("batch_id=") &&
          !st.getPath.getName.contains(".__"))
      val dirs = batchDirs
      if (dirs.length > threshold) {
        cells += 1; before += dirs.length
        val maxBatch = dirs.map(_.getPath.getName.stripPrefix("batch_id=").toLong).max
        // leaf read of the whole cell: rows carry (vec_id, embedding) —
        // the partition cols come back from the rewritten layout
        val rows = spark.read
          .option("basePath", indexDir).parquet(cd.getPath.toString)
          .select("vec_id", "embedding")
        val n = rows.count()
        DirSwap.replace(fs, cd.getPath) { newDir =>
          rows.coalesce(1).write.mode("overwrite")
            .parquet(new Path(newDir, s"batch_id=$maxBatch").toString)
        } { newDir =>
          require(spark.read.parquet(newDir.toString).count() == n,
            s"index compaction verify failed for ${cd.getPath}")
        }
        after += batchDirs.length
      }
    }
    (cells, before, after)
  }

  /** Startup repair for [[compactIndex]]'s crash windows (the shared
    * [[graft.ingest.DirSwap.recover]] sweep over the cell dirs). */
  def recover(spark: SparkSession, indexDir: String): Int = {
    val (fs, root) = graft.ingest.HadoopFs.forPath(spark, indexDir)
    if (!fs.exists(root)) 0 else DirSwap.recover(fs, root)
  }

  /** The indexed corpus (all cells, all batches). */
  def indexed(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType)),
        StructField("cid", IntegerType),
        StructField("batch_id", LongType))))
      .option("basePath", indexDir)
      .parquet(indexDir)

  /** ANN over the index: per query, probe the `probes` cells with the
    * smallest query→centroid distance, then exact-rerank ONLY those cells'
    * members — the scan carries a literal `cid IN (...)` partition filter,
    * so unprobed cells' files are never opened (the spec pins the scan's
    * partition count). The probed-cid set is a bounded driver collect
    * (≤ queries × probes, and ≤ k absolutely).
    */
  def query(spark: SparkSession, centDir: String, indexDir: String,
      queries: DataFrame, probes: Int = DefaultProbes,
      topK: Int = DefaultTopK): DataFrame = {
    val cents = readCentroids(spark, centDir)
    val qc = queries.select(col("vec_id").as("q_id"), col("embedding").as("eq"))
      .crossJoin(broadcast(cents.select(col("cid"), col("centroid"),
        dot(col("centroid"), col("centroid")).as("cc"))))
      .withColumn("d2", col("cc") - lit(2.0) * dot(col("eq"), col("centroid")))
    val wCell = Window.partitionBy("q_id").orderBy(col("d2"), col("cid"))
    val probed = qc.withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= probes)
      .select(col("q_id"), col("eq"), col("cid"))
      .localCheckpoint(true) // feeds the bounded cid collect AND the rerank join
    val cids = probed.select("cid").distinct()
      .collect().map(_.getInt(0)).toSeq // bounded: ≤ min(k, queries·probes)
    val members = indexed(spark, indexDir)
      .filter(col("cid").isin(cids: _*))
      .select(col("vec_id").as("c_id"), col("embedding").as("ec"), col("cid"))
    val scored = probed.join(members, Seq("cid"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("d2",
        dot(col("ec"), col("ec")) - lit(2.0) * dot(col("eq"), col("ec")))
    val wTop = Window.partitionBy("q_id").orderBy(col("d2"), col("c_id"))
    scored.withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("c_id"))
      .orderBy("q_id", "rnk")
  }
}
