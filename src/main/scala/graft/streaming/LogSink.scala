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
  */
class LogSink(spark: SparkSession) {
  import spark.implicits._

  private val stream = MemoryStream[LogRecord](spark)

  /** Non-blocking enqueue — callable from any thread, like a log appender. */
  def enqueue(records: LogRecord*): Unit = { stream.addData(records); () }

  /** The JSON wire shape of one record (LogMsgLayout.json round-trip). */
  def asJson(df: DataFrame): DataFrame =
    df.select(to_json(struct(
      col("timestamp"), col("severity"), col("thread"), col("message"),
      col("mdc_fields"),
      struct(col("exception_class").as("class"),
        col("exception_message").as("message")).as("exception"))).as("json"))

  /** Start the sink query appending to the `tickers_logs` parquet table. */
  def start(outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    stream.toDF().writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
        ()
      }
      .start()
}
