package graft.ingest

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
  * replays can never double-count) and overwrites its directory. The
  * caller (commit) holds the ingest maintenance lock, so stats never race
  * a concurrent commit/compaction of the same partition. A partition dir
  * under `_stats/` therefore always describes a fully-committed partition;
  * a crash between data commit and stats refresh leaves stats one batch
  * stale, which the next touch of that partition heals (stats are an
  * acceleration structure, not a source of truth).
  *
  * 100 TB: refresh cost is one partition scan per touched partition per
  * batch (amortized by partition-locality of daily ingest); every read
  * API below is partition-count-sized.
  */
object PartitionStats {

  private def statsDir(warehouseDir: String) = s"$warehouseDir/_stats"

  private val statsSchema = StructType(Seq(
    StructField("n_rows", LongType),
    StructField("n_tickers", LongType),
    StructField("min_seq", LongType),
    StructField("max_seq", LongType),
    StructField("min_price_cents", LongType),
    StructField("max_price_cents", LongType)))

  /** Recompute + overwrite the stats rows of `dates` from the committed
    * warehouse. Call under the ingest maintenance lock, after commit.
    */
  def refresh(spark: SparkSession, warehouseDir: String,
      dates: Seq[String]): Unit =
    dates.foreach { dt =>
      TickerIngest.warehouse(spark, warehouseDir)
        .filter(col("file_date") === dt)
        .agg(
          count(lit(1)).as("n_rows"),
          count_distinct(col("ticker")).as("n_tickers"),
          min("sequence").as("min_seq"),
          max("sequence").as("max_seq"),
          min(round(col("price") * 100).cast("long")).as("min_price_cents"),
          max(round(col("price") * 100).cast("long")).as("max_price_cents"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"${statsDir(warehouseDir)}/file_date=$dt")
    }

  /** The stats table: one row per partition, partition-count-sized. */
  def stats(spark: SparkSession, warehouseDir: String): DataFrame =
    spark.read
      .schema(statsSchema.add("file_date", StringType))
      .option("basePath", statsDir(warehouseDir))
      .parquet(statsDir(warehouseDir))

  /** Table-wide COUNT/MIN/MAX answered purely from the stats store — zero
    * data files read, the warehouse twin of the DSv2 aggregate pushdown.
    */
  def globalSummary(spark: SparkSession, warehouseDir: String): DataFrame =
    stats(spark, warehouseDir).agg(
      sum("n_rows").as("n_rows"),
      min("min_seq").as("min_seq"),
      max("max_seq").as("max_seq"),
      min("min_price_cents").as("min_price_cents"),
      max("max_price_cents").as("max_price_cents"))

  /** Partitions whose [min, max] price range intersects [loCents, hiCents]
    * — the stats-driven pruning list a price-ranged scan needs to read.
    */
  def pruneByPrice(spark: SparkSession, warehouseDir: String,
      loCents: Long, hiCents: Long): Seq[String] =
    stats(spark, warehouseDir)
      .filter(col("max_price_cents") >= loCents &&
        col("min_price_cents") <= hiCents)
      .select("file_date").collect().map(_.getString(0)).sorted.toSeq

  /** The `file_date=D` partition names present under a staged (or live)
    * warehouse tree — used by commit to know which partitions a batch
    * touched before the staging dirs are renamed away.
    */
  private[ingest] def partitionDates(spark: SparkSession, dir: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("file_date="))
      .map(_.getPath.getName.stripPrefix("file_date="))
  }
}
