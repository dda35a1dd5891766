package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.FingerprintStore

/** Continuous corpus admission — the streaming form of incremental dedup
  * ([[graft.operators.DedupOps.incrementalDedup]] /
  * [[graft.operators.FingerprintStore]]): a document stream is
  * deduplicated against the persistent fingerprint store every
  * micro-batch; admitted documents land in the corpus, their fingerprints
  * in the store. This is the shape a continuously-fed training corpus
  * actually runs: history grows monotonically, each batch probes it once.
  *
  * Replay safety (restart mid-batch) is engineered, not assumed:
  *
  *  1. the corpus write is per-batch-directory `overwrite` — a replayed
  *     batch rewrites `batch_id=<n>` byte-identically instead of
  *     double-appending;
  *  2. store rows carry their `batch_id`, and the admit filters history to
  *     `batch_id < n` — so a replay of batch n excludes its OWN earlier
  *     append and recomputes the identical admitted set (without this, a
  *     crash after the store append would make the replayed admit come up
  *     empty and overwrite the batch's corpus dir with nothing: data loss);
  *  3. re-appending fingerprints on replay is harmless — the store is
  *     semantically a set (admit is multiplicity-blind).
  *
  * 100 TB posture: per batch, one prefix-pruned anti-join against the
  * store (see FingerprintStore) + one partitioned write; no unbounded
  * state in the stream itself — history lives in the store, not in
  * executor memory, so a year of corpus history costs the stream nothing.
  */
object StreamingDedup {

  /** Exact fingerprint of a document batch: md5 over whitespace-normalized
    * text (same normalization as [[graft.operators.DedupOps.exactDedup]]);
    * within-batch duplicates collapse to the smallest doc_id
    * (deterministic, so replays admit identical rows).
    */
  def fingerprinted(batch: DataFrame): DataFrame =
    batch
      .withColumn("fp_exact", md5(regexp_replace(trim(col("text")), "\\s+", " ")))
      .groupBy("fp_exact")
      .agg(min(struct(col("doc_id"), col("text"))).as("d"))
      .select(col("fp_exact"), col("d.doc_id").as("doc_id"), col("d.text").as("text"))

  /** One micro-batch of admission — public so specs can drive replay
    * scenarios directly. Order matters: corpus BEFORE store (see class
    * doc), both idempotent under re-execution of the same `batchId`.
    */
  def processBatch(batch: DataFrame, batchId: Long,
      storeDir: String, corpusDir: String): Unit =
      FingerprintStore.withMaintenanceLock(storeDir) {
    val spark = batch.sparkSession
    // materialize the fingerprint shuffle ONCE: admit consumes it twice
    // (driver-side prefix collect + the anti-join), which would otherwise
    // recompute the groupBy per consumer on every micro-batch
    val fps = fingerprinted(batch).localCheckpoint(true)
    val admitted = FingerprintStore.admit(
      spark, fps, "fp_exact", storeDir,
      histFilter = col("batch_id") < batchId)
    // localCheckpoint: admitted feeds two writes; recomputing it after the
    // corpus write would re-scan the store under a state it just changed
    val mat = admitted.localCheckpoint(true)
    mat.select("doc_id", "text", "fp_exact")
      .write.mode("overwrite").parquet(s"$corpusDir/batch_id=$batchId")
    FingerprintStore.append(
      mat.select(col("fp_exact"), lit(batchId).as("batch_id")), "fp_exact", storeDir)
  }

  /** Wire a streaming document source (`doc_id`, `text`) into the admit
    * loop. Exactly-once corpus contract per the class doc.
    */
  def start(docs: DataFrame, storeDir: String, corpusDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, storeDir, corpusDir)
      }
      .start()

  /** The admitted corpus across all batches. */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("fp_exact",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("batch_id",
          org.apache.spark.sql.types.LongType))))
      .option("basePath", corpusDir)
      .parquet(corpusDir)
}
