package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * No read-modify-write of shared state, so admission/compaction-style
  * locking is unnecessary.
  *
  * 100 TB posture: the only data-scale work per batch is one token count;
  * the sketch rows (≤ k), threshold scan (k+1 rows), and merge frame
  * (k × batches, collapsible by the same compress whenever it grows) are
  * all bounded. Driver materialization is capped at k+1 rows per batch.
  */
object StreamingTopK {

  /** Sketch capacity: survivors per batch sketch and per merged report. */
  val DefaultK = 32

  private def tokens(c: Column) = graft.functions.TextOps.tokens(c)

  private def summarySchema = StructType(Seq(
    StructField("token", StringType), StructField("counter", LongType)))
  private def metaSchema = StructType(Seq(
    StructField("m", LongType), StructField("n_tokens", LongType)))

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

  /** Merge every stored batch sketch into one k-bounded heavy-hitter board:
    * `(token, counter, err_bound)` ordered by counter desc. `counter` is a
    * certified lower bound on the token's true stream count; the true count
    * is ≤ counter + err_bound. Tokens whose true count exceeds err_bound
    * are guaranteed present (the MG guarantee survives merging).
    */
  def mergedTopK(spark: SparkSession, storeDir: String,
      k: Int = DefaultK): DataFrame = {
    val sums = spark.read.schema(summarySchema.add("batch_id", LongType))
      .option("basePath", s"$storeDir/summaries").parquet(s"$storeDir/summaries")
      .groupBy("token").agg(sum("counter").as("n"))
    val (m2, merged) = compress(sums, k)
    val decrements = spark.read.schema(metaSchema.add("batch_id", LongType))
      .option("basePath", s"$storeDir/meta").parquet(s"$storeDir/meta")
      .agg(coalesce(sum("m"), lit(0L)).as("dec"))
      .first().getLong(0)
    merged.withColumn("err_bound", lit(decrements + m2))
      .orderBy(col("counter").desc, col("token").asc)
  }

  /** Wire a streaming document source (`doc_id`, `text`) into the tracker.
    * One sketch directory per micro-batch, replay-idempotent.
    */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String,
      k: Int = DefaultK,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, storeDir, k)
      }
      .start()
}
