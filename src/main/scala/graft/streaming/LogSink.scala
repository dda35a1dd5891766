package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.schema.LogRecord

/** B16 — the log→table sink: the reference ships JSON log events to a
  * `tickers_logs` table through a buffering Log4j2 appender
  * (`/root/reference/MainService/src/main/resources/log4j2.origin.xml:4-18`,
  * layout `LogMsgLayout.json:1-30`). Here: an in-memory event queue feeding a
  * second streaming query on the shared SparkSession — same size/time
  * micro-batch semantics (B3) via the trigger, exactly-once append via the
  * checkpoint.
  *
  * The two flush knobs are the reference appender's own
  * (`bufferSize`/`flushTimeoutSec`, log4j2.origin.xml:5-6), config-exposed
  * through [[graft.app.GraftConfig]].logging: records buffer in the sink
  * until the buffer holds `bufferSize` records (the SIZE trigger — drained
  * inside the enqueue that crossed the line) or `flushTimeoutSec` elapses
  * (the TIMEOUT trigger — a daemon flusher started with the query), which-
  * ever comes first. The default `bufferSize = 1` keeps the sink unbuffered
  * (every enqueue flushes through immediately) unless a deployment opts in.
  */
class LogSink(spark: SparkSession, bufferSize: Int = 1, flushTimeoutSec: Int = 15) {
  import spark.implicits._

  private val stream = MemoryStream[LogRecord](spark)
  private val buf = scala.collection.mutable.ArrayBuffer.empty[LogRecord]
  private var flusher: Option[java.util.concurrent.ScheduledExecutorService] = None
  private var query: Option[StreamingQuery] = None

  /** Non-blocking enqueue — callable from any thread, like a log appender.
    * Crossing `bufferSize` flushes synchronously (the reference appender's
    * size trigger); smaller residues wait for the timeout flusher.
    */
  def enqueue(records: LogRecord*): Unit = synchronized {
    buf ++= records
    if (buf.size >= bufferSize) flush()
  }

  /** Drain the buffer into the table stream (both triggers land here). */
  def flush(): Unit = synchronized {
    if (buf.nonEmpty) {
      stream.addData(buf.toSeq)
      buf.clear()
    }
  }

  /** The JSON wire shape of one record (LogMsgLayout.json round-trip). */
  def asJson(df: DataFrame): DataFrame =
    df.select(to_json(struct(
      col("timestamp"), col("severity"), col("thread"), col("message"),
      col("mdc_fields"),
      struct(col("exception_class").as("class"),
        col("exception_message").as("message")).as("exception"))).as("json"))

  /** Start the sink query appending to the `tickers_logs` parquet table,
    * plus the timeout flusher (daemon — stopped by [[close]]).
    */
  def start(outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery = {
    synchronized {
      flusher.foreach(_.shutdownNow())
      val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
        (r: Runnable) => { val t = new Thread(r, "graft-log-flusher"); t.setDaemon(true); t })
      ex.scheduleWithFixedDelay(() => flush(),
        flushTimeoutSec.toLong, flushTimeoutSec.toLong,
        java.util.concurrent.TimeUnit.SECONDS)
      flusher = Some(ex)
    }
    val q = stream.toDF().writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
        ()
      }
      .start()
    synchronized { query = Some(q) }
    q
  }

  /** Orderly shutdown — call this INSTEAD of stopping the query yourself:
    * flush the buffered residue into the stream, run one final micro-batch
    * cycle so it reaches the parquet table, THEN stop the query and the
    * timeout flusher. A record added to a MemoryStream after the last
    * micro-batch is never written, so flushing after `query.stop()` (the
    * pre-round-12 contract) silently dropped up to a full buffer at
    * shutdown; draining before the stop is what makes "no record is lost"
    * true. Stopping an already-stopped query is a no-op, so a caller that
    * stopped the query first loses only what that ordering always lost.
    */
  def close(): Unit = {
    val q = synchronized { flush(); query }
    // drain OUTSIDE the sink lock: processAllAvailable blocks on the
    // micro-batch thread, and a concurrent enqueue (appenders log from any
    // thread) must not deadlock against it
    q.foreach { qq =>
      try { if (qq.isActive) { qq.processAllAvailable(); qq.stop() } }
      catch { case scala.util.control.NonFatal(_) => () }
    }
    synchronized {
      flusher.foreach(_.shutdownNow())
      flusher = None
      query = None
    }
  }
}

object LogSink {
  /** The config-wired constructor: flush knobs from
    * [[graft.app.GraftConfig]].logging (the log4j2.origin.xml:5-6 pair).
    */
  def apply(spark: SparkSession, cfg: graft.app.GraftConfig): LogSink =
    new LogSink(spark, cfg.logging.bufferSize, cfg.logging.flushTimeoutSec)
}
