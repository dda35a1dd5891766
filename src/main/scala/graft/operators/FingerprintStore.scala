package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent fingerprint history for incremental dedup — the table a
  * 100 TB daily-ingest pipeline probes most often (see
  * [[DedupOps.incrementalDedup]] for the in-memory join shape).
  *
  * Layout: one row per historical fingerprint, hive-partitioned by the
  * first two hex chars of the hash (`fp_prefix`, 256 balanced buckets —
  * md5 is uniform, so each holds 1/256 of history). The admit probe then
  * filters the scan to the prefixes actually PRESENT in the incoming
  * batch, which partition-prunes at the file listing — a targeted recheck
  * (one source, one shard, one backfill window) touches a handful of
  * buckets and reads 1/256th of history per bucket instead of the whole
  * store. A full daily batch naturally covers all 256 prefixes; for that
  * shape the same layout still bounds every anti-join task's build side to
  * one bucket and keeps compaction per-bucket (256 independent rewrite
  * units instead of one monolithic table).
  *
  * The prefix set is collected driver-side but is bounded by construction
  * (≤ 256 two-hex-char values) — a metadata-sized collect, never data.
  */
object FingerprintStore {

  val PrefixCol = "fp_prefix"

  private def prefixOf(fpCol: String) = substring(col(fpCol), 1, 2)

  /** Whether the store holds at least one hive bucket dir — through the
    * Hadoop FileSystem API, so the store can live on HDFS/object storage,
    * not just the local disk the specs use.
    */
  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists(
      _.getPath.getName.startsWith(PrefixCol + "="))
  }

  /** Append a batch of fingerprints to the store at `dir` — every column of
    * `fps` is kept (callers may carry provenance such as a `batch_id`). The
    * pre-shuffle `repartition` on the prefix keeps the file count bounded
    * (each writing task owns whole buckets) — without it every task writes
    * into every partition dir and the store fragments into
    * tasks × 256 small files per day. Duplicate fingerprint ROWS are
    * harmless by design: the store is semantically a set (the admit
    * anti-join is multiplicity-blind), which is what lets streaming callers
    * re-append on replay without corrupting anything.
    */
  /** Serializes [[append]] against [[compact]]/[[recover]] in-process —
    * the same single-maintainer contract as the warehouse's
    * maintenanceLock, but PER STORE DIRECTORY: an append landing a file in
    * a bucket between the compaction's snapshot and its swap would vanish
    * with the `.__old` trash, while two independent stores in one JVM
    * (separate admission streams, parallel suites) share no state and must
    * not convoy on each other's micro-batches.
    */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(dir: String): Object =
    locks.computeIfAbsent(dir.stripSuffix("/"), _ => new Object)

  /** Run `f` holding `dir`'s maintenance lock (reentrant — [[append]] on
    * the same dir inside `f` is fine).
    * [[graft.streaming.StreamingDedup.processBatch]] wraps its whole
    * probe-then-append sequence in this so a concurrent [[compact]] can
    * neither hide a bucket from the admit scan mid-swap nor throw away a
    * just-appended file with the `.__old` trash.
    */
  private[graft] def withMaintenanceLock[T](dir: String)(f: => T): T =
    lockFor(dir).synchronized(f)

  def append(fps: DataFrame, fpCol: String, dir: String): Unit =
    withMaintenanceLock(dir) {
      fps.filter(col(fpCol).isNotNull)
        .withColumn(PrefixCol, prefixOf(fpCol))
        .repartition(col(PrefixCol))
        .write.mode("append").partitionBy(PrefixCol).parquet(dir)
    }

  /** Rows of `newDocs` whose `fpCol` has no match in the store. The store
    * scan is partition-pruned to the batch's own prefixes; null
    * fingerprints are always admitted (an anti-join null key matches
    * nothing), mirroring [[DedupOps.incrementalDedup]]. An empty or absent
    * store admits everything (the first batch of a fresh corpus).
    * `histFilter` restricts which store rows count as history — streaming
    * callers pass `batch_id < currentBatch` so a replayed batch excludes
    * its own earlier append and recomputes the identical admitted set.
    *
    * CONTRACT: `newDocs` must be deterministic and cheap to recompute —
    * it is evaluated twice (once for the driver-side prefix set, once in
    * the anti-join). A non-deterministic source could yield a prefix set
    * inconsistent with the joined rows (a fingerprint whose prefix was
    * never collected would skip its history probe and be over-admitted).
    * Expensive inputs: `localCheckpoint()` first, as
    * [[graft.streaming.StreamingDedup]] does. NON-deterministic inputs are
    * materialized here automatically — the plan is scanned for a
    * non-deterministic expression and pinned with `localCheckpoint(eager)`
    * before the first evaluation, because an inconsistent prefix set is an
    * over-admission (silent duplicate) the caller could never see.
    */
  def admit(spark: SparkSession, newDocs: DataFrame, fpCol: String, dir: String,
      histFilter: Column = lit(true)): DataFrame = {
    import spark.implicits._
    val nonDeterministic = newDocs.queryExecution.analyzed.exists(p =>
      p.expressions.exists(e => e.exists(!_.deterministic)))
    val docs = if (nonDeterministic) newDocs.localCheckpoint(true) else newDocs
    if (!hasData(spark, dir)) return docs
    val prefixes = docs.select(prefixOf(fpCol).as("p"))
      .filter(col("p").isNotNull).distinct().as[String].collect().toSeq
    if (prefixes.isEmpty) return docs
    val hist = spark.read.parquet(dir)
      .filter(histFilter)
      .filter(col(PrefixCol).isin(prefixes: _*))
      .select(col(fpCol))
    docs.join(hist, Seq(fpCol), "left_anti")
  }

  private def fsFor(spark: SparkSession, dir: String) =
    graft.ingest.HadoopFs.forPath(spark, dir)

  /** Bucket dirs currently holding more than `threshold` part files — the
    * store's compaction work list. Every [[append]] adds one file per
    * bucket per batch, so a store fed daily holds N files per bucket after
    * N days; admit-probe cost is task-per-file.
    */
  def fragmentedBuckets(spark: SparkSession, dir: String, threshold: Int): Seq[String] = {
    val (fs, root) = fsFor(spark, dir)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(PrefixCol + "=") &&
        !s.getPath.getName.contains(".__"))
      .filter(s => fs.listStatus(s.getPath)
        .count(f => f.isFile && f.getPath.getName.startsWith("part-")) > threshold)
      .map(_.getPath.getName.stripPrefix(PrefixCol + "="))
  }

  /** Rewrite each listed bucket to a single file via the crash-safe
    * [[graft.ingest.DirSwap]] protocol (build `.__new` complete, verify
    * the row count, two-rename swap) — the same maintenance the warehouse
    * runs per date partition, here per hash bucket: 256 independent
    * rewrite units, each 1/256th of history. Returns
    * (bucketsCompacted, filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String, threshold: Int = 8): (Int, Int, Int) =
    withMaintenanceLock(dir) {
      val (fs, root) = fsFor(spark, dir)
      val buckets = fragmentedBuckets(spark, dir, threshold)
      var (before, after) = (0, 0)
      buckets.foreach { b =>
        val live = new org.apache.hadoop.fs.Path(root, s"$PrefixCol=$b")
        def nFiles = fs.listStatus(live)
          .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
        before += nFiles
        // leaf-dir read: rows carry every column BUT the partition col,
        // exactly what the rewritten data files must contain
        val rows = spark.read.parquet(live.toString)
        val n = rows.count()
        graft.ingest.DirSwap.replace(fs, live) { newDir =>
          rows.coalesce(1).write.mode("overwrite").parquet(newDir.toString)
        } { newDir =>
          require(spark.read.parquet(newDir.toString).count() == n,
            s"fingerprint compaction verify failed for $live")
        }
        after += nFiles
      }
      (buckets.size, before, after)
    }

  /** Startup repair for [[compact]]'s crash windows (shared
    * [[graft.ingest.DirSwap.recover]] sweep). Returns buckets restored.
    */
  def recover(spark: SparkSession, dir: String): Int = withMaintenanceLock(dir) {
    val (fs, root) = fsFor(spark, dir)
    graft.ingest.DirSwap.recover(fs, root)
  }
}
