package graft.journal

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.{FileStatus, Schemas}

/** The metadata journal — our native replacement for the reference's
  * ClickHouse `ticker_files` table and its 11 DAO query shapes
  * (`/root/reference/MainService/src/main/java/com/crypto/service/dao/ClickHouseDAO.java:31-202`).
  *
  * The reference mutates rows in place (`ALTER TABLE ... UPDATE`,
  * `ClickHouseDAO.java:169-182`). A file-backed Spark table has no mutation,
  * so the journal is **append-only events + a latest-wins view**
  * (SURVEY §2.1 op 9): every status change appends
  * `(filename, create_date, status, updated_at, batch_seq)` and [[current]]
  * resolves per-filename latest by `(updated_at, batch_seq)`.
  *
  * Concurrency contract (SURVEY §7.4 hard part 1): single writer — exactly
  * like the reference, where one scheduler thread per flow step owns the
  * journal write. Idempotence: re-appending an identical transition batch
  * changes nothing observable (latest-wins picks the same status).
  *
  * 100 TB design: the journal is metadata (one row per *file*, not per data
  * row) — millions of rows at worst. The latest-wins window shuffles once on
  * filename; [[compact]] bounds event-log growth exactly like delta-log
  * checkpointing, so the view never scans unbounded history.
  */
class TickerFileJournal(val spark: SparkSession, val dir: String) {
  import spark.implicits._

  /** The journal directory's FileSystem + qualified path. Every filesystem
    * touch below goes through this (not `java.io.File`), so the journal
    * can live on HDFS/object storage like the warehouse it tracks.
    */
  private def fsPath(p: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) =
    graft.ingest.HadoopFs.forPath(spark, p)

  private def dirHasData: Boolean = {
    val (fs, d) = fsPath(dir)
    fs.exists(d) && fs.listStatus(d).exists { s =>
      val n = s.getPath.getName
      n.endsWith(".parquet") || n.startsWith("part-")
    }
  }

  private val eventSchema = Schemas.tickerFile
    .add(org.apache.spark.sql.types.StructField("batch_seq", org.apache.spark.sql.types.LongType))

  /** All journal events (empty-safe). */
  def events: DataFrame =
    if (dirHasData) spark.read.schema(eventSchema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], eventSchema)

  /** Cached max batch_seq — valid under the single-writer contract. Without
    * the cache every transition scans the full event log for max(batch_seq):
    * O(events) per append between compactions.
    */
  private var cachedMaxSeq: Option[Long] = None

  private def nextBatchSeq(): Long = cachedMaxSeq match {
    case Some(s) => s + 1L
    case None =>
      val s = maxBatchSeq
      cachedMaxSeq = Some(s)
      s + 1L
  }

  private def noteAppended(seq: Long): Unit = cachedMaxSeq = Some(seq)

  private def append(df: DataFrame): Unit =
    df.select("filename", "create_date", "status", "updated_at", "batch_seq")
      .coalesce(1) // journal batches are tiny metadata; one file per batch
      .write.mode(SaveMode.Append).parquet(dir)

  /** Latest-wins view — one row per filename with its current status.
    * Formulated as max_by over (updated_at, batch_seq) rather than a
    * row_number window: an aggregate gets map-side partial combine, so the
    * shuffle carries one row per file per map task instead of the full
    * event history — the difference between O(events) and O(files) shuffle
    * bytes as history accumulates between [[compact]]s.
    */
  def current: DataFrame = latestWins(events)

  private def latestWins(ev: DataFrame): DataFrame =
    ev.groupBy("filename")
      .agg(max_by(
        struct(col("create_date"), col("status"), col("updated_at")),
        struct(col("updated_at"), col("batch_seq"))).as("_latest"))
      .select(col("filename"), col("_latest.create_date"),
        col("_latest.status"), col("_latest.updated_at"))

  /** Snapshot-isolation read: the latest-wins view AS OF batch `seq` —
    * replays only events with `batch_seq <= seq`, so a reader pins the
    * exact journal state that existed after that batch committed, immune
    * to concurrent appends (the delta-log time-travel shape). History
    * horizon: [[compact]] folds all events into batch 0, so snapshots
    * reach back only to the last compaction — `asOf(anything)` after a
    * compact returns the compacted state, never a partial one.
    */
  def asOf(seq: Long): DataFrame =
    latestWins(events.filter(col("batch_seq") <= seq))

  /** Highest batch_seq present in the log (0 when empty/just compacted) —
    * the snapshot handle a reader pairs with [[asOf]].
    */
  def maxBatchSeq: Long =
    if (dirHasData) events.agg(coalesce(max("batch_seq"), lit(0L))).as[Long].head()
    else 0L

  /** B6 — journal the unseen subset of `candidates(filename, create_date)`
    * as DISCOVERED (anti-join dedup,
    * `SaveNewFilesToDbFlow.java:216-248`). Returns inserted count.
    *
    * Mutators (`appendDiscovered` / `transitionWhere` / `claimReady` /
    * [[compact]] / [[truncate]]) are synchronized on the journal instance:
    * in [[graft.app.PipelineApp]] the three lifecycle flows and the
    * discovery stream each run on their own thread against one journal, so
    * an unsynchronized interleave could collide batch_seq values or — worse
    * — land an append between compact's snapshot and its truncate, deleting
    * the only copy of those events. Mutations are metadata-sized (seconds
    * at worst), so serializing them costs nothing observable. Lazy READERS
    * racing a compact's file swap can throw transiently; every flow already
    * catches-and-retries next cycle, which makes that self-healing.
    */
  def appendDiscovered(candidates: DataFrame, now: Timestamp): Long = this.synchronized {
    val seq = nextBatchSeq()
    val fresh = candidates
      .select("filename", "create_date").distinct()
      .join(events.select("filename").distinct(), Seq("filename"), "left_anti")
      .withColumn("status", lit(FileStatus.Discovered.name))
      .withColumn("updated_at", lit(now))
      .withColumn("batch_seq", lit(seq))
      .cache()
    val n = fresh.count()
    if (n > 0) { append(fresh); noteAppended(seq) }
    fresh.unpersist()
    n
  }

  /** A9 — transition the named files to `to`. Illegal transitions (per
    * [[FileStatus.legal]]) are skipped, mirroring the reference's UPDATEs
    * which are already filtered to the eligible set by the caller.
    */
  def transition(filenames: Seq[String], to: FileStatus, now: Timestamp): Long =
    transitionWhere(col("filename").isin(filenames: _*), to, now)

  /** A9 with an arbitrary predicate over the [[current]] view. */
  def transitionWhere(cond: org.apache.spark.sql.Column, to: FileStatus,
      now: Timestamp): Long = this.synchronized {
    val legalFrom = FileStatus.all.filter(f => FileStatus.canTransition(f, to) && f != to)
      .map(_.name)
    val seq = nextBatchSeq()
    val hit = current.filter(cond && col("status").isin(legalFrom: _*))
      .withColumn("status", lit(to.name))
      .withColumn("updated_at", lit(now))
      .withColumn("batch_seq", lit(seq))
      .cache()
    val n = hit.count()
    if (n > 0) { append(hit); noteAppended(seq) }
    hit.unpersist()
    n
  }

  /** Claim step (`UploadTickerFilesStatusAndDataFlow.java:83-94`): flip
    * READY_FOR_PROCESSING → IN_PROGRESS and return the claimed set — the
    * flip-before-processing is what prevents double-processing across cycles.
    *
    * `limit` bounds the claim to the `limit` OLDEST ready files
    * (create_date, then filename): the collect, the transition in-list and
    * the caller's processing batch all stay O(limit) no matter how many
    * files are journaled — at 100M ready files an unbounded claim would be
    * a multi-GB driver collect. The default is therefore a conservative
    * batch ([[TickerFileJournal.DefaultClaimLimit]]), NOT unbounded:
    * draining more than one batch per cycle is a caller loop, and an
    * unbounded claim is deliberately not expressible through this API.
    */
  def claimReady(now: Timestamp,
      limit: Int = TickerFileJournal.DefaultClaimLimit): Seq[(String, Date)] = this.synchronized {
    require(limit > 0, s"claimReady limit must be positive, got $limit")
    val ready = current.filter(col("status") === FileStatus.ReadyForProcessing.name)
      .select("filename", "create_date")
      .sort(col("create_date"), col("filename")).limit(limit)
      .as[(String, Date)].collect().toSeq
    if (ready.nonEmpty) transition(ready.map(_._1), FileStatus.InProgress, now)
    ready
  }

  // ---- Plane-A read surface (SURVEY §2.1) ----

  /** A1 — filenames already journaled among `names`. */
  def knownAmong(names: Seq[String]): Seq[String] =
    current.filter(col("filename").isin(names: _*))
      .select("filename").as[String].collect().toSeq

  /** A2 — all current rows for one date. */
  def onDate(d: Date): DataFrame = current.filter(col("create_date") === lit(d))

  /** A3 — point status lookup. */
  def statusOf(filename: String): Option[FileStatus] =
    current.filter(col("filename") === filename)
      .select("status").as[String].collect().headOption.map(FileStatus.fromName)

  /** A4 — current rows whose status ∈ set. */
  def byStatus(statuses: FileStatus*): DataFrame =
    current.filter(col("status").isin(statuses.map(_.name): _*))

  /** A5 — latest create_date ever journaled (catch-up start point). */
  def maxCreateDate: Option[Date] =
    events.agg(max("create_date")).as[Option[Date]].head()

  /** A6 — MIN or MAX create_date over one status. */
  def minMaxDateForStatus(fn: String, status: FileStatus): Option[Date] = {
    require(fn == "MIN" || fn == "MAX", s"fn must be MIN or MAX, got $fn")
    byStatus(status).agg(expr(s"$fn(create_date)")).as[Option[Date]].head()
  }

  /** A11 — current file count. */
  def countFiles(): Long = current.count()

  /** A10 — truncate. */
  def truncate(): Unit = this.synchronized {
    val (fs, d) = fsPath(dir)
    if (fs.exists(d)) { fs.listStatus(d).foreach(s => fs.delete(s.getPath, true)); () }
    cachedMaxSeq = Some(0L)
  }

  /** Checkpoint the event log down to the current view (delta-log-style
    * compaction — keeps the latest-wins scan bounded as transitions
    * accumulate).
    *
    * Fully distributed: the snapshot is written executor-side to a sibling
    * temp directory and the part files are then swapped in — the current
    * view never passes through the driver, so compacting a journal of 100M
    * files costs a shuffle, not a multi-GB driver collect.
    */
  def compact(now: Timestamp): Unit = this.synchronized {
    val tmp = dir.stripSuffix("/") + ".compact-tmp"
    val (fs, tmpPath) = fsPath(tmp)
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
    current.withColumn("batch_seq", lit(0L))
      .select("filename", "create_date", "status", "updated_at", "batch_seq")
      .write.mode(SaveMode.Overwrite).parquet(tmp) // executes BEFORE the swap
    truncate()
    val (_, target) = fsPath(dir)
    fs.mkdirs(target)
    fs.listStatus(tmpPath).filter(_.getPath.getName.startsWith("part-")).foreach { s =>
      val dest = new org.apache.hadoop.fs.Path(target, s.getPath.getName)
      if (!fs.rename(s.getPath, dest))
        throw new java.io.IOException(s"journal compact swap failed: ${s.getPath} -> $dest")
    }
    fs.delete(tmpPath, true)
    cachedMaxSeq = Some(0L)
  }
}

object TickerFileJournal {
  /** Default [[TickerFileJournal.claimReady]] batch: bounds the driver
    * collect and the downstream processing batch regardless of how many
    * files are ready. Matches the reference's per-cycle processing scale
    * (a day of per-ticker files is O(100s)) with generous headroom.
    */
  val DefaultClaimLimit: Int = 10000
}
