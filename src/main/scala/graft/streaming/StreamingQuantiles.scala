package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Continuous quantile tracking over a value stream — the sibling of
  * [[StreamingTopK]] in the streaming sketch family (dedup admission,
  * drift, heavy hitters, vector index, quantiles): each micro-batch is
  * summarized into a fixed-grid histogram on the round-6 micro-integer
  * value domain (`bucket = value_micro div width`), and the store of
  * per-batch histograms merges on read — histogram merge is plain count
  * addition, so unlike sampled sketches the merge is EXACT and the only
  * approximation is the grid itself: any quantile's true value is
  * CERTIFIED to lie inside the returned bucket interval
  * `[lo_micro, hi_micro]` (width = one grid cell). Equi-width histogram
  * summaries and their mergeability are textbook (Ioannidis 2003, "The
  * history of histograms"); the certified-interval read is what a
  * monitoring consumer actually wants ("p99 is between 4.1 and 4.2 ms").
  *
  * Store discipline — byte-for-byte the [[StreamingTopK]] contract:
  * per-batch-directory overwrite (pure function of the batch ⇒ replay
  * rewrites identically), [[compact]] folds batch dirs into one
  * grid-bounded `folded/` histogram behind a rename swap with
  * crash recovery, readers combine folded + batch dirs newer than the
  * fold watermark, fold and read serialize on a per-store lock.
  *
  * 100 TB posture: per batch one partial-aggregable groupBy(bucket);
  * sketch size is bounded by the VALUE RANGE / width, independent of row
  * count; the merge frame is grid × batches-since-fold, grid-bounded
  * again after every fold. Nothing data-sized ever reaches the driver.
  */
object StreamingQuantiles {

  /** Default grid width in round-6 micro units (10^4 micro = 0.01). */
  val DefaultWidthMicro = 10000L

  val DefaultFoldEvery = 64

  private def histSchema = StructType(Seq(
    StructField("bucket", LongType), StructField("cnt", LongType)))
  private def metaSchema = StructType(Seq(
    StructField("n", LongType), StructField("min_m", LongType),
    StructField("max_m", LongType)))
  private def foldedMetaSchema = StructType(Seq(
    StructField("n", LongType), StructField("min_m", LongType),
    StructField("max_m", LongType), StructField("upto", LongType)))

  import FoldedBatchStore.{batchFrame, batchIds, dropBatchDirs, foldedDir,
    fsFor, lockFor, recoverFold, swapInFolded}

  /** Summarize one micro-batch of `valueCol` (double) into its grid
    * histogram + meta row. Values land on the round-6 micro-int grid
    * first (the engine-wide cross-engine discipline), then bucket by
    * integer FLOOR division, so every cell is exactly
    * `[b*W, (b+1)*W - 1]` for negative values too.
    */
  def processBatch(batch: DataFrame, valueCol: String, batchId: Long,
      storeDir: String, widthMicro: Long = DefaultWidthMicro): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val m = batch.select(round(col(valueCol) * 1000000).cast("long").as("vm"))
      .filter(col("vm").isNotNull)
      .localCheckpoint(true) // feeds the histogram AND the meta row
    // FLOOR division (pmod is non-negative), not truncating `div`: under
    // truncation bucket 0 would absorb both signs and negative buckets
    // would shift — floor keeps every cell exactly [b*W, (b+1)*W - 1]
    val hist = m.select(
        expr(s"(vm - pmod(vm, $widthMicro)) div $widthMicro").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    hist.coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/summaries/batch_id=$batchId")
    m.agg(count(lit(1)).as("n"), min("vm").as("min_m"), max("vm").as("max_m"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/meta/batch_id=$batchId")
  }

  // ---- folded state (directory mechanics shared via FoldedBatchStore) ----

  /** `(n, min, max, upto)`; upto = -1 before the first fold. */
  private def foldedMeta(spark: SparkSession, storeDir: String): (Long, Long, Long, Long) = {
    val (fs, p) = fsFor(spark, s"${foldedDir(storeDir)}/meta")
    if (!fs.exists(p)) (0L, Long.MaxValue, Long.MinValue, -1L)
    else {
      val r = spark.read.schema(foldedMetaSchema).parquet(p.toString).first()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }


  /** Fold batch histograms newer than the previous fold into the single
    * grid-bounded `folded/` histogram (count addition — exact), then drop
    * the folded batch dirs. Crash/replay semantics identical to
    * [[StreamingTopK.compact]].
    */
  def compact(spark: SparkSession, storeDir: String): (Int, Long) =
    lockFor(storeDir).synchronized {
      val sumsDir = s"$storeDir/summaries"
      val metaDir = s"$storeDir/meta"
      recoverFold(spark, storeDir)
      val (bn, bmin, bmax, upto0) = foldedMeta(spark, storeDir)
      dropBatchDirs(spark, storeDir, batchIds(spark, sumsDir).filter(_ <= upto0))
      val foldable = batchIds(spark, sumsDir).filter(_ > upto0)
      if (foldable.isEmpty) return (0, upto0)
      val w = foldable.max
      val inRange = col("batch_id") > upto0 && col("batch_id") <= w
      val base =
        if (upto0 >= 0)
          spark.read.schema(histSchema).parquet(s"${foldedDir(storeDir)}/summaries")
        else batchFrame(spark, sumsDir, histSchema, lit(false))
          .select("bucket", "cnt")
      val merged = base.unionByName(
          batchFrame(spark, sumsDir, histSchema, inRange).select("bucket", "cnt"))
        .groupBy("bucket").agg(sum("cnt").as("cnt"))
        .collect().toSeq // grid-bounded by construction
      val ma = batchFrame(spark, metaDir, metaSchema, inRange)
        .agg(coalesce(sum("n"), lit(0L)),
          coalesce(min("min_m"), lit(Long.MaxValue)),
          coalesce(max("max_m"), lit(Long.MinValue))).first()
      val (n2, mn2, mx2) =
        (bn + ma.getLong(0), math.min(bmin, ma.getLong(1)), math.max(bmax, ma.getLong(2)))
      swapInFolded(spark, storeDir) { tmp =>
        spark.createDataFrame(spark.sparkContext.parallelize(merged, 1), histSchema)
          .write.parquet(s"$tmp/summaries")
        spark.createDataFrame(
            spark.sparkContext.parallelize(Seq(Row(n2, mn2, mx2, w)), 1),
            foldedMetaSchema)
          .write.parquet(s"$tmp/meta")
      }
      dropBatchDirs(spark, storeDir, foldable)
      (foldable.size, w)
    }

  /** Certified quantile intervals over the whole stream: for each q in
    * `qs`, the row `(q, rank, lo_micro, hi_micro, est_micro)` where the
    * true q-quantile (rank `ceil(q·n)` order statistic) is GUARANTEED to
    * lie in `[lo_micro, hi_micro]` (one grid cell, clamped to the
    * observed min/max) and `est_micro` is the cell midpoint. A fresh
    * store reads as an empty board.
    */
  def quantiles(spark: SparkSession, storeDir: String, qs: Seq[Double],
      widthMicro: Long = DefaultWidthMicro): DataFrame =
    lockFor(storeDir).synchronized {
      import spark.implicits._
      recoverFold(spark, storeDir)
      val (bn, bmin, bmax, upto) = foldedMeta(spark, storeDir)
      val newer = col("batch_id") > upto
      val base =
        if (upto >= 0)
          spark.read.schema(histSchema).parquet(s"${foldedDir(storeDir)}/summaries")
        else batchFrame(spark, s"$storeDir/summaries", histSchema, lit(false))
          .select("bucket", "cnt")
      val hist = base.unionByName(
          batchFrame(spark, s"$storeDir/summaries", histSchema, newer)
            .select("bucket", "cnt"))
        .groupBy("bucket").agg(sum("cnt").as("cnt"))
        .collect().sortBy(_.getLong(0)) // grid-bounded
      val ma = batchFrame(spark, s"$storeDir/meta", metaSchema, newer)
        .agg(coalesce(sum("n"), lit(0L)),
          coalesce(min("min_m"), lit(Long.MaxValue)),
          coalesce(max("max_m"), lit(Long.MinValue))).first()
      val (n, mn, mx) =
        (bn + ma.getLong(0), math.min(bmin, ma.getLong(1)), math.max(bmax, ma.getLong(2)))
      if (n == 0L)
        return Seq.empty[(Double, Long, Long, Long, Long)]
          .toDF("q", "rank", "lo_micro", "hi_micro", "est_micro")
      val cum = hist.scanLeft(0L)(_ + _.getLong(1)).tail
      val rows = qs.map { q =>
        val rank = math.max(1L, math.ceil(q * n).toLong)
        val i = cum.indexWhere(_ >= rank)
        val b = hist(i).getLong(0)
        val lo = math.max(b * widthMicro, mn)
        val hi = math.min((b + 1) * widthMicro - 1, mx)
        (q, rank, lo, hi, (lo + hi) / 2)
      }
      rows.toDF("q", "rank", "lo_micro", "hi_micro", "est_micro")
    }

  /** Wire a value stream into the tracker; folds every `foldEvery`
    * batches (0 disables).
    */
  def start(values: DataFrame, valueCol: String, storeDir: String,
      checkpointDir: String, widthMicro: Long = DefaultWidthMicro,
      trigger: Trigger = Trigger.ProcessingTime(0),
      foldEvery: Int = DefaultFoldEvery): StreamingQuery =
    values.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, valueCol, id, storeDir, widthMicro)
        if (foldEvery > 0 && id > 0 && id % foldEvery == 0)
          compact(b.sparkSession, storeDir)
        ()
      }
      .start()
}
