package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Continuous heavy-hitter tracking — the streaming form of
  * [[graft.operators.FrequencyOps.heavyHitters]]: each micro-batch is
  * summarized into a bounded Misra–Gries sketch (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012 —
  * both public), and the store of per-batch sketches merges on read into a
  * valid sketch of the whole stream with a hard undercount bound. This is
  * the "what is the corpus mostly made of right now" wire a continuously-
  * fed pipeline runs next to admission ([[StreamingDedup]]) and drift
  * ([[StreamingDrift]]).
  *
  * Per batch: exact token counts (partial-aggregable), then one-shot
  * MG compression — `m` = the (k+1)-th largest count (0 when ≤ k distinct),
  * every token keeps `count − m` if positive. At most k survivors, each
  * undercounted by exactly `m`. The merged sketch sums survivors by token
  * and compresses once more; any token's true stream count minus its
  * merged counter is ≤ Σ per-batch m + the final m — the bound
  * [[mergedTopK]] reports as `err_bound`, making every reported count a
  * certified LOWER bound with certified slack.
  *
  * Replay safety is the [[StreamingDrift]] contract: a batch's sketch is a
  * pure function of its own rows, written by per-batch-directory
  * `overwrite` — a replayed batch rewrites its directory byte-identically.
  * No read-modify-write of shared state for the PER-BATCH path, so
  * admission/compaction-style locking is unnecessary there.
  *
  * The store does NOT grow with stream age: [[compact]] periodically folds
  * every batch sketch into one k-row `folded/` sketch (sum + one MG
  * compression — the same merge the read path performs), records the
  * highest batch id folded (`upto`), and deletes the folded batch dirs.
  * Readers combine the folded sketch with batch dirs `> upto` ONLY, so a
  * checkpoint-replayed batch that rewrites an already-folded dir is
  * ignored rather than double-counted (same data, same id — Structured
  * Streaming's epoch contract), and the next fold sweeps it. Fold and
  * read serialize on a per-store in-process lock (the
  * [[graft.operators.FingerprintStore]] discipline), so a reader never
  * observes the swap window; the swap itself is build-complete-then-rename
  * (crash ⇒ old folded state intact or new one complete, never a mix).
  *
  * 100 TB posture: the only data-scale work per batch is one token count;
  * the sketch rows (≤ k), threshold scan (k+1 rows), and merge frame
  * (k × batches-since-last-fold, k-bounded again after every [[compact]])
  * are all bounded. Driver materialization is capped at k+1 rows per
  * batch plus the k-row fold.
  */
object StreamingTopK {

  /** Sketch capacity: survivors per batch sketch and per merged report. */
  val DefaultK = 32

  /** [[start]] folds the store every this many batches by default. */
  val DefaultFoldEvery = 64

  private def tokens(c: Column) = graft.functions.TextOps.tokens(c)

  private def summarySchema = StructType(Seq(
    StructField("token", StringType), StructField("counter", LongType)))
  private def metaSchema = StructType(Seq(
    StructField("m", LongType), StructField("n_tokens", LongType)))
  private def foldedMetaSchema = StructType(Seq(
    StructField("dec", LongType), StructField("n_tokens", LongType),
    StructField("upto", LongType)))

  import FoldedBatchStore.{batchFrame, batchIds, dropBatchDirs, foldedDir,
    fsFor, lockFor, recoverFold, swapInFolded}

  /** `(m, compressed)` — MG one-shot compression of an exact count table:
    * `m` = (k+1)-th largest count (0 when ≤ k rows), survivors keep
    * `count − m > 0`. Bounded: the threshold probe materializes k+1 rows.
    */
  private def compress(counts: DataFrame, k: Int): (Long, DataFrame) = {
    val top = counts.orderBy(col("n").desc, col("token").asc).limit(k + 1)
      .collect()
    val m = if (top.length <= k) 0L else top.map(_.getLong(1)).min
    (m, counts.filter(col("n") > m)
      .select(col("token"), (col("n") - m).as("counter")))
  }

  /** Summarize one micro-batch into its MG sketch + meta row — public so
    * specs can drive replay directly.
    */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      k: Int = DefaultK): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val counts = batch.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds threshold probe, filter, and total
    val (m, sketch) = compress(counts, k)
    val total = counts.agg(coalesce(sum("n"), lit(0L)).as("n_tokens"))
      .first().getLong(0)
    sketch.coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/summaries/batch_id=$batchId")
    import spark.implicits._
    Seq((m, total)).toDF("m", "n_tokens").coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/meta/batch_id=$batchId")
  }

  // ---- folded state (directory mechanics shared via FoldedBatchStore) ----

  /** `(dec, n_tokens, upto)` of the folded sketch; upto = -1 when no fold
    * has happened yet.
    */
  private def foldedMeta(spark: SparkSession, storeDir: String): (Long, Long, Long) = {
    val (fs, p) = fsFor(spark, s"${foldedDir(storeDir)}/meta")
    if (!fs.exists(p)) (0L, 0L, -1L)
    else {
      val r = spark.read.schema(foldedMetaSchema).parquet(p.toString).first()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
  }

  private def foldedSums(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.schema(summarySchema)
      .parquet(s"${foldedDir(storeDir)}/summaries")


  /** Fold every batch sketch with id > the previous fold into the single
    * k-row `folded/` sketch, then delete the folded batch dirs — the
    * periodic maintenance that keeps the merge frame k-bounded no matter
    * how old the stream is. Returns (batchesFolded, newUpto). Idempotent
    * and crash-safe: the new folded dir is built complete beside the live
    * one and renamed into place before any batch dir is deleted; a crash
    * anywhere re-runs cleanly (leftover batch dirs ≤ upto are ignored by
    * readers and swept by the next fold).
    */
  def compact(spark: SparkSession, storeDir: String,
      k: Int = DefaultK): (Int, Long) = lockFor(storeDir).synchronized {
    val sumsDir = s"$storeDir/summaries"
    recoverFold(spark, storeDir)
    val (baseDec, baseTok, upto0) = foldedMeta(spark, storeDir)
    // replay leftovers from before the previous fold: already counted in
    // the folded sketch, invisible to readers — sweep and move on
    dropBatchDirs(spark, storeDir, batchIds(spark, sumsDir).filter(_ <= upto0))
    val foldable = batchIds(spark, sumsDir).filter(_ > upto0)
    if (foldable.isEmpty) return (0, upto0)
    val w = foldable.max
    val inRange = col("batch_id") > upto0 && col("batch_id") <= w
    val batchSums = batchFrame(spark, sumsDir, summarySchema, inRange)
      .select("token", "counter")
    val base =
      if (upto0 >= 0) foldedSums(spark, storeDir) else batchSums.limit(0)
    val sums = base.unionByName(batchSums)
      .groupBy("token").agg(sum("counter").as("n"))
    val (m2, sketch) = compress(sums, k)
    // materialize BEFORE touching directories — the plan reads the live
    // folded dir, which the swap below replaces. ≤ k rows by construction.
    val sketchRows = sketch.collect().toSeq
    val metaAgg = batchFrame(spark, s"$storeDir/meta", metaSchema, inRange)
      .agg(coalesce(sum("m"), lit(0L)), coalesce(sum("n_tokens"), lit(0L))).first()
    val (dec, ntok) = (baseDec + metaAgg.getLong(0) + m2,
      baseTok + metaAgg.getLong(1))
    swapInFolded(spark, storeDir) { tmp =>
      spark.createDataFrame(spark.sparkContext.parallelize(sketchRows, 1),
          summarySchema)
        .write.parquet(s"$tmp/summaries")
      spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(Row(dec, ntok, w)), 1),
          foldedMetaSchema)
        .write.parquet(s"$tmp/meta")
    }
    dropBatchDirs(spark, storeDir, foldable)
    (foldable.size, w)
  }

  /** Merge the folded sketch (if any) with every batch sketch newer than
    * the fold into one k-bounded heavy-hitter board:
    * `(token, counter, err_bound)` ordered by counter desc. `counter` is a
    * certified lower bound on the token's true stream count; the true
    * count is ≤ counter + err_bound. Tokens whose true count exceeds
    * err_bound are guaranteed present (the MG guarantee survives merging
    * AND folding — a fold is exactly the read-path merge, persisted). A
    * fresh store (no batches yet) reads as an empty board.
    */
  def mergedTopK(spark: SparkSession, storeDir: String,
      k: Int = DefaultK): DataFrame = {
    // Materialize (≤ k rows) INSIDE the per-store lock and return a local
    // relation: a lazy plan would snapshot the batch-dir file index under
    // the lock but execute after release, racing a concurrent [[compact]]
    // (auto-triggered by [[start]]) that deletes those dirs mid-read —
    // the same discipline as compact's sketchRows and
    // StreamingQuantiles.quantiles.
    val rows = lockFor(storeDir).synchronized {
      recoverFold(spark, storeDir)
      val (baseDec, _, upto) = foldedMeta(spark, storeDir)
      val newer = col("batch_id") > upto
      val batchSums = batchFrame(spark, s"$storeDir/summaries", summarySchema, newer)
        .select("token", "counter")
      val base =
        if (upto >= 0) foldedSums(spark, storeDir) else batchSums.limit(0)
      val sums = base.unionByName(batchSums)
        .groupBy("token").agg(sum("counter").as("n"))
      val (m2, merged) = compress(sums, k)
      val batchDec = batchFrame(spark, s"$storeDir/meta", metaSchema, newer)
        .agg(coalesce(sum("m"), lit(0L)).as("dec"))
        .first().getLong(0)
      val bound = baseDec + batchDec + m2
      merged.orderBy(col("counter").desc, col("token").asc).collect()
        .toSeq.map(r => Row(r.get(0), r.get(1), bound))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      summarySchema.add(StructField("err_bound", LongType)))
  }

  /** Wire a streaming document source (`doc_id`, `text`) into the tracker.
    * One sketch directory per micro-batch, replay-idempotent; every
    * `foldEvery` batches the store folds to its k-row bound (0 disables).
    */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String,
      k: Int = DefaultK,
      trigger: Trigger = Trigger.ProcessingTime(0),
      foldEvery: Int = DefaultFoldEvery): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, storeDir, k)
        if (foldEvery > 0 && id > 0 && id % foldEvery == 0)
          compact(b.sparkSession, storeDir, k)
        ()
      }
      .start()
}
