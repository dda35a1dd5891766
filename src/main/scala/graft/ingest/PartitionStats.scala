package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental ANALYZE for the ticker warehouse: per-partition column
  * statistics maintained at ingest COMMIT (config-gated, like the z-order
  * write path), so table-wide COUNT/MIN/MAX and partition pruning can be
  * answered from a partition-count-sized store without touching data —
  * the reference's ClickHouse gets this from its MergeTree part metadata
  * (`system.parts`); a parquet warehouse has per-FILE footer stats but
  * nothing partition-level that survives compaction, so the engine keeps
  * its own.
  *
  * Consistency contract: [[refresh]] recomputes a touched partition's row
  * from the partition's full post-commit contents (partition-sized read,
  * NOT incremental-merge — so re-ingest, compaction and quarantine
  * replays can never double-count) and replaces its directory atomically
  * (build in a dot-hidden temp dir Spark's partition discovery never
  * sees, then rename into place — a reader concurrent with a refresh
  * observes either the old complete row or the new complete row, never a
  * partially-written store). The caller (commit) holds the ingest
  * maintenance lock, so stats never race a concurrent commit/compaction
  * of the same partition. A crash between data commit and stats refresh
  * leaves stats one batch stale, which the next touch of that partition
  * heals — so:
  *
  *  - [[globalSummary]] / [[stats]] are ADVISORY (display aggregates,
  *    monitoring): at most one batch stale, never torn.
  *  - [[pruneByPrice]] is SAFE TO GATE A SCAN: every live warehouse
  *    partition that has NO stats row (stats enabled late, pre-existing
  *    warehouse, crash window) is unioned into the result as must-read,
  *    so absent stats can only widen the scan, never drop matching rows.
  *  - [[summaryExact]] is CORRECT BY CONSTRUCTION: each stats row records
  *    the partition's file listing fingerprint at refresh time; the
  *    summary is answered from stats only when every live partition's
  *    CURRENT listing matches (a metadata-only check), and falls back to
  *    the data scan otherwise — stale or missing stats degrade to the
  *    scan, never to a wrong answer.
  *
  * 100 TB: refresh cost is one partition scan per touched partition per
  * batch (amortized by partition-locality of daily ingest); every read
  * API below is partition-count-sized, and the freshness check is one
  * `listStatus` per partition — the same metadata pass a scan's file
  * listing would do anyway.
  */
object PartitionStats {

  private def statsDir(warehouseDir: String) = s"$warehouseDir/_stats"

  private val statsSchema = StructType(Seq(
    StructField("n_rows", LongType),
    StructField("n_tickers", LongType),
    StructField("min_seq", LongType),
    StructField("max_seq", LongType),
    StructField("min_price_cents", LongType),
    StructField("max_price_cents", LongType),
    StructField("files_fp", LongType)))

  /** Fingerprint of a partition's data-file listing — changes whenever a
    * commit lands a file or a compaction rewrites the partition, which
    * are exactly the events that stale a stats row. 64 bits of an MD5
    * over the SORTED (name, length, mtime) listing: [[summaryExact]]
    * serves ANSWERS from rows this guards, so a collision is a silent
    * wrong answer — no xor folding (pairwise cancellation could hide a
    * two-file swap), no 32-bit truncation, and mtime makes a same-name
    * same-length rewrite visible.
    */
  private def listingFingerprint(spark: SparkSession, partDir: String): Long = {
    val (fs, p) = HadoopFs.forPath(spark, partDir)
    if (!fs.exists(p)) 0L
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      fs.listStatus(p)
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime} ")
        .sorted
        .foreach(e => md.update(e.getBytes("UTF-8")))
      java.nio.ByteBuffer.wrap(md.digest()).getLong
    }
  }

  /** Recompute + atomically replace the stats rows of `dates` from the
    * committed warehouse. Call under the ingest maintenance lock, after
    * commit (and after compaction — the rewrite changes the listing
    * fingerprint, so the row must re-stamp to stay fresh).
    */
  def refresh(spark: SparkSession, warehouseDir: String,
      dates: Seq[String]): Unit =
    dates.foreach { dt =>
      val fp = listingFingerprint(spark, s"$warehouseDir/file_date=$dt")
      val row = TickerIngest.warehouse(spark, warehouseDir)
        .filter(col("file_date") === dt)
        .agg(
          count(lit(1)).as("n_rows"),
          count_distinct(col("ticker")).as("n_tickers"),
          min("sequence").as("min_seq"),
          max("sequence").as("max_seq"),
          min(round(col("price") * 100).cast("long")).as("min_price_cents"),
          max(round(col("price") * 100).cast("long")).as("max_price_cents"))
        .withColumn("files_fp", lit(fp))
      // atomic replace: build complete in a dot-hidden temp dir (invisible
      // to partition discovery AND to the hive `file_date=` glob), then
      // rename over the live dir. Spark's own overwrite is delete-then-
      // write — a concurrent reader could catch the gap; this one's only
      // window is between the two renames, where the partition is simply
      // ABSENT (reads as "no stats row" — safe under the contract above).
      val live = s"${statsDir(warehouseDir)}/file_date=$dt"
      val tmp = s"${statsDir(warehouseDir)}/.stats_tmp_$dt"
      row.coalesce(1).write.mode("overwrite").parquet(tmp)
      val (fs, livePath) = HadoopFs.forPath(spark, live)
      val (_, tmpPath) = HadoopFs.forPath(spark, tmp)
      if (fs.exists(livePath)) fs.delete(livePath, true)
      require(fs.rename(tmpPath, livePath),
        s"stats swap failed: $tmpPath -> $livePath")
    }

  private def hasStats(spark: SparkSession, warehouseDir: String): Boolean = {
    val (fs, p) = HadoopFs.forPath(spark, statsDir(warehouseDir))
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("file_date="))
  }

  /** The stats table: one row per covered partition, partition-count-sized.
    * An absent or empty store reads as zero rows, not an error — a fresh
    * warehouse or one that enabled stats late is a normal state.
    */
  def stats(spark: SparkSession, warehouseDir: String): DataFrame =
    if (!hasStats(spark, warehouseDir))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        statsSchema.add("file_date", StringType))
    else spark.read
      .schema(statsSchema.add("file_date", StringType))
      .option("basePath", statsDir(warehouseDir))
      .parquet(statsDir(warehouseDir))

  /** Table-wide COUNT/MIN/MAX from the stats store alone — zero data files
    * read. ADVISORY: at most one batch stale after a crash, and blind to
    * partitions with no stats row; gate correctness-sensitive consumers
    * through [[summaryExact]] instead.
    */
  def globalSummary(spark: SparkSession, warehouseDir: String): DataFrame =
    stats(spark, warehouseDir).agg(
      sum("n_rows").as("n_rows"),
      min("min_seq").as("min_seq"),
      max("max_seq").as("max_seq"),
      min("min_price_cents").as("min_price_cents"),
      max("max_price_cents").as("max_price_cents"))

  /** Table-wide (COUNT(*), MAX(sequence)) — the warehouse's A11/A5 shape —
    * answered from the stats store when it provably covers the live
    * warehouse (every partition has a row AND the row's listing
    * fingerprint matches the partition's current files), else from the
    * data scan. Returns the answer plus whether stats served it. The
    * freshness proof is pure file metadata: cost is one `listStatus` per
    * partition on the accelerated path — at 1000 partitions that is 1000
    * RPCs instead of a 100 TB scan.
    */
  def summaryExact(spark: SparkSession, warehouseDir: String): (Long, Option[Long], Boolean) = {
    val liveDates = partitionDates(spark, warehouseDir)
    val rows = stats(spark, warehouseDir)
      .select("file_date", "n_rows", "max_seq", "files_fp").collect()
    val byDate = rows.map(r => r.getString(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toMap
    val fresh = liveDates.nonEmpty && liveDates.forall { dt =>
      byDate.get(dt).exists { case (_, _, fp) =>
        fp == listingFingerprint(spark, s"$warehouseDir/file_date=$dt")
      }
    }
    if (fresh) {
      val covered = liveDates.map(byDate)
      val maxSeq = covered.flatMap(_._2) match {
        case s if s.isEmpty => None
        case s => Some(s.max)
      }
      (covered.map(_._1).sum, maxSeq, true)
    } else {
      val wh = TickerIngest.warehouse(spark, warehouseDir)
      val r = wh.agg(count(lit(1)), max("sequence")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), false)
    }
  }

  /** Partitions a price-ranged scan must read: those whose recorded
    * [min, max] price range intersects [loCents, hiCents], UNIONED with
    * every live partition that has no stats row — missing stats mean
    * "must read", so enabling stats late (or a crash before refresh) can
    * only widen the scan, never silently drop matching rows. Stats-
    * covered partitions follow the one-batch-staleness contract: the
    * caller that needs scan-exact pruning refreshes the touched dates
    * first (commit already does, under the lock).
    */
  def pruneByPrice(spark: SparkSession, warehouseDir: String,
      loCents: Long, hiCents: Long): Seq[String] = {
    val rows = stats(spark, warehouseDir)
      .select("file_date", "min_price_cents", "max_price_cents").collect()
    val covered = rows.map(_.getString(0)).toSet
    val matching = rows.filter { r =>
      !r.isNullAt(2) && !r.isNullAt(1) &&
        r.getLong(2) >= loCents && r.getLong(1) <= hiCents
    }.map(_.getString(0))
    val mustRead = partitionDates(spark, warehouseDir).filterNot(covered)
    (matching ++ mustRead).distinct.sorted.toSeq
  }

  /** The `file_date=D` partition names present under a staged (or live)
    * warehouse tree — used by commit to know which partitions a batch
    * touched before the staging dirs are renamed away.
    */
  private[ingest] def partitionDates(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("file_date="))
      .map(_.getPath.getName.stripPrefix("file_date="))
  }
}
