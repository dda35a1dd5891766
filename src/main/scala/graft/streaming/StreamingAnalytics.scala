package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.schema.Schemas

/** The streaming analytics surface (SURVEY §2.3 "Streaming"): the reference
  * has only crude micro-batching (B3) with no event-time semantics; a
  * complete engine exposes watermarked event-time windows and streaming
  * ingest. Both queries here run on any streaming source; tests drive them
  * with file sources over fixture dirs.
  *
  * 100 TB / always-on design: state is bounded by the watermark (late data
  * beyond 10 min is dropped, window state evicted), aggregation state is
  * per (window, key) — independent of input rate; checkpointing gives
  * exactly-once output into the parquet sink.
  */
object StreamingAnalytics {

  /** Watermarked tumbling-window OHLC over a ticker stream — the streaming
    * twin of [[graft.queries.AnalyticsQueries.wTimeBucketOhlc]] and the
    * flagship Grafana shape the reference delegates to ClickHouse.
    */
  def windowedOhlc(ticks: DataFrame,
      window_ : String = "1 minute", watermark: String = "10 minutes"): DataFrame =
    ticks
      .withWatermark("transactionTime", watermark)
      .groupBy(window(col("transactionTime"), window_), col("ticker"))
      .agg(
        min_by(col("price"), col("transactionTime")).as("open"),
        max("price").as("high"),
        min("price").as("low"),
        max_by(col("price"), col("transactionTime")).as("close"),
        count(lit(1)).as("n_ticks"),
        sum("size").as("volume"))
      .select(col("window.start").as("bucket_start"), col("ticker"),
        col("open"), col("high"), col("low"), col("close"), col("n_ticks"), col("volume"))

  /** Sliding-window tick statistics: window(width, slide) emits one row per
    * overlapping bucket — the moving-average shape. State per (window, key)
    * is still watermark-bounded; a slide of width/k multiplies state by k,
    * which is the knob to watch at scale.
    */
  def slidingStats(ticks: DataFrame, width: String = "1 minute",
      slide: String = "30 seconds", watermark: String = "10 minutes"): DataFrame =
    ticks
      .withWatermark("transactionTime", watermark)
      .groupBy(window(col("transactionTime"), width, slide), col("ticker"))
      .agg(avg("price").as("avg_price"), count(lit(1)).as("n_ticks"))
      .select(col("window.start").as("bucket_start"), col("ticker"),
        col("avg_price"), col("n_ticks"))

  /** Windowed distinct-user counting as a stream, via mergeable HLL
    * sketches: the streaming twin of the batch
    * [[graft.operators.SketchOps.hllIncremental]] partials table. Exact
    * streaming distinct needs per-key state proportional to the universe;
    * the sketch keeps every window's state at a fixed few KB and merges
    * associatively across micro-batches — so the update-mode estimate
    * after N batches equals the batch recompute over their union
    * (StreamingAnalyticsSpec pins that equality). At 100 TB/day the same
    * query shape runs unchanged: state size is windows × sketch size,
    * independent of cardinality.
    */
  def windowedDistinctUsers(events: DataFrame, width: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("bucket_start"),
        hll_sketch_estimate(col("sketch")).as("approx_users"),
        col("n_events"))

  /** Event-time sessionization as a stream: session_window merges rows
    * within `gap` of each other per user — the streaming twin of
    * [[graft.operators.TimeSeriesOps.sessionize]]'s lag/running-sum batch
    * plan. Sessions emit when the watermark passes their close.
    */
  def sessionizedEvents(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup with bounded state:
    * dropDuplicatesWithinWatermark keeps each key's state only until the
    * watermark passes — the always-on twin of
    * [[graft.operators.DedupOps.exactDedup]] (unbounded-state
    * dropDuplicates would OOM an always-on pipeline).
    */
  def dedupStream(rows: DataFrame, eventTimeCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    rows
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join with watermarks on BOTH sides — the
    * attribution query ("click within `horizon` after its view") as an
    * always-on stream. The time-range join predicate PLUS the two
    * watermarks let Spark bound the join state: buffered views expire once
    * the click watermark passes `view_ts + horizon`, buffered clicks once
    * the view watermark passes `click_ts` — without both, a stream-stream
    * join buffers forever and an always-on pipeline OOMs. Inner join emits
    * incrementally in append mode; at scale the join is a co-partitioned
    * symmetric hash join on `user_id`, state in the state store.
    */
  def clickAttribution(views: DataFrame, clicks: DataFrame,
      delay: String = "30 minutes", horizonSec: Long = 3600L): DataFrame = {
    val v = views.withWatermark("view_ts", delay)
    val c = clicks.withWatermark("click_ts", delay)
    v.join(c,
      col("v_user") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizonSec SECONDS"))
      .select(col("v_user").as("user_id"), col("view_ts"), col("click_ts"))
  }

  /** Streaming CSV ingest: the always-on twin of the batch hot path
    * (`TickerIngest`) — file-source discovery of ticker CSVs under
    * `root/<date>/`, schema-validated, appended to the warehouse parquet
    * exactly-once via the checkpoint. maxFilesPerTrigger mirrors the
    * reference's 8192-file flush cap (B3).
    */
  def ingestStream(spark: SparkSession, dataRoot: String, warehouseDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 8192,
      trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery = {
    val ticks = spark.readStream
      .schema(Schemas.tickerWithCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(s"$dataRoot/*/")
      // filename from the tail of the path, file_date from the date DIRECTORY
      // (the layout contract): two substring_index calls per row instead of a
      // regexp + array split — this projection runs once per ingested row, so
      // it is the hottest scalar code in the engine
      .withColumn("filename", substring_index(input_file_name(), "/", -1))
      .withColumn("file_date",
        to_date(substring_index(substring_index(input_file_name(), "/", -2), "/", 1)))
    ticks.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .partitionBy("file_date")
      .trigger(trigger)
      .format("parquet")
      .option("path", warehouseDir)
      .outputMode(OutputMode.Append)
      .start()
  }

  /** Run a windowed OHLC query over a ticker stream into a parquet sink
    * (append mode: windows finalize when the watermark passes).
    */
  def ohlcStream(spark: SparkSession, dataRoot: String, outDir: String,
      checkpointDir: String, window_ : String = "1 minute",
      watermark: String = "10 minutes",
      trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery = {
    val ticks = spark.readStream
      .schema(Schemas.ticker)
      .option("mode", "DROPMALFORMED")
      .csv(s"$dataRoot/*/")
    windowedOhlc(ticks, window_, watermark)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet")
      .option("path", outDir)
      .outputMode(OutputMode.Append)
      .start()
  }
}
