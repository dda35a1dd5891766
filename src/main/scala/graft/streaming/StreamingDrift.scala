package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Continuous distribution-drift monitoring — the streaming form of
  * [[graft.queries.PipelineQueries.psiDrift]]: a REFERENCE token histogram
  * (the corpus a model was trained/validated on) is built once and stored;
  * every incoming micro-batch is scored against it with the Population
  * Stability Index over the reference's tracked feature set, and one row
  * per batch lands in a drift LOG table. This is the alarm wire a
  * continuously-fed corpus runs next to admission ([[StreamingDedup]]):
  * dedup decides what enters, drift decides whether what's entering still
  * looks like what the consumers were built on.
  *
  * Replay safety follows the [[StreamingDedup]] contract: the log write is
  * per-batch-directory `overwrite`, and the score depends only on the
  * immutable reference plus the batch's own rows — a replayed batch
  * rewrites its log row byte-identically. The reference is read-only after
  * [[buildReference]]; refreshing it is a new directory + a new stream.
  *
  * 100 TB posture: the reference is K rows (tracked features) + one totals
  * row — always broadcast; per batch the only data-scale work is one
  * partial-aggregable token count restricted by that broadcast. The drift
  * log grows one row per batch. Nothing about corpus history is carried in
  * stream state.
  */
object StreamingDrift {

  /** Tracked feature count (the PSI-board convention: score a fixed top-K
    * feature set, not the open vocabulary — see
    * [[graft.queries.PipelineQueries.psiDrift]]).
    */
  val DefaultK = 50

  // the batch psiDrift's tokenizer, not a re-implementation — if
  // tokenization ever changes, the streaming histogram moves with it
  private def tokens(c: org.apache.spark.sql.Column) =
    graft.functions.TextOps.tokens(c)

  /** Build the reference histogram from a static corpus frame (`doc_id`,
    * `text`): the top-`k` tokens by count (count desc, token asc — a total
    * order) with their counts, plus the tracked-total row the smoothing
    * denominator needs. Two tiny parquet tables under `refDir`.
    */
  def buildReference(docs: DataFrame, refDir: String, k: Int = DefaultK): Unit = {
    val top = docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("ref_n"))
      .orderBy(col("ref_n").desc, col("token"))
      .limit(k)
      .localCheckpoint(true) // K rows; feeds the table write AND the total
    top.write.mode("overwrite").parquet(s"$refDir/terms")
    top.agg(sum("ref_n").as("ref_total"), count(lit(1)).as("k"))
      .write.mode("overwrite").parquet(s"$refDir/total")
  }

  private def refTerms(spark: SparkSession, refDir: String): DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("token", StringType), StructField("ref_n", LongType))))
      .parquet(s"$refDir/terms")

  private def refTotal(spark: SparkSession, refDir: String): DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("ref_total", LongType), StructField("k", LongType))))
      .parquet(s"$refDir/total")

  /** Score one micro-batch against the reference and upsert its drift-log
    * row — public so specs can drive replay directly. PSI is computed over
    * the reference's K tracked features with add-1 smoothing on both sides
    * (a feature absent from the batch contributes its full divergence
    * instead of an infinity). Log row: `batch_id, n_tokens` (all batch
    * tokens), `n_tracked` (those on the board), `psi` (round 6).
    */
  def processBatch(batch: DataFrame, batchId: Long,
      refDir: String, logDir: String): Unit = {
    val spark = batch.sparkSession
    // an EMPTY batch has no distribution to score — smoothing would
    // collapse it to uniform and log a spurious full-blown drift alarm;
    // skip it (trivially replay-idempotent: the replay skips too)
    if (batch.isEmpty) return
    val terms = refTerms(spark, refDir)
    val toks = batch.select(explode(tokens(col("text"))).as("token"))
    // one pass over the batch: total token count + per-tracked-feature
    // counts (left join keeps features the batch never produced at 0)
    val counts = toks.groupBy("token").agg(count(lit(1)).as("bn"))
      .localCheckpoint(true) // feeds the total AND the feature join
    val batchTotals = counts.agg(
      coalesce(sum("bn"), lit(0L)).as("n_tokens"))
    val scored = terms
      .join(counts, Seq("token"), "left")
      .withColumn("bn", coalesce(col("bn"), lit(0L)))
      .crossJoin(broadcast(refTotal(spark, refDir)))
      .crossJoin(broadcast(
        counts.join(terms, Seq("token")).agg(
          coalesce(sum("bn"), lit(0L)).as("tracked_total"))))
      .withColumn("p",
        (col("ref_n") + 1).cast("double") / (col("ref_total") + col("k")).cast("double"))
      .withColumn("q",
        (col("bn") + 1).cast("double") / (col("tracked_total") + col("k")).cast("double"))
      .agg(
        // per-feature contributions round to 6 dp and sum as DECIMAL — the
        // replay-idempotence claim needs an order-independent sum, and a
        // raw double fold over the K rows is not one
        sum(round((col("p") - col("q")) * round(log(col("p") / col("q")), 6), 6)
          .cast(DecimalType(18, 6))).cast("double").as("psi"),
        coalesce(sum("bn"), lit(0L)).as("n_tracked"))
    // batch_id rides in the partition DIRECTORY only (the StreamingDedup
    // convention) — embedding it as a file column too would store it twice
    // and lean on Spark's partition-column shadowing at read time
    scored.crossJoin(broadcast(batchTotals))
      .select(col("n_tokens"), col("n_tracked"), col("psi"))
      .write.mode("overwrite").parquet(s"$logDir/batch_id=$batchId")
  }

  /** Wire a streaming document source (`doc_id`, `text`) into the drift
    * monitor. One log row per micro-batch, replay-idempotent.
    */
  def start(docs: DataFrame, refDir: String, logDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, refDir, logDir)
      }
      .start()

  /** The drift log across all batches. */
  def driftLog(spark: SparkSession, logDir: String): DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("n_tokens", LongType),
        StructField("n_tracked", LongType),
        StructField("psi", DoubleType),
        StructField("batch_id", LongType))))
      .option("basePath", logDir)
      .parquet(logDir)
}
