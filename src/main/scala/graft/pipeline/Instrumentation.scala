package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** B17 — instrumentation aggregates: the reference hand-times compression /
  * upload and ships MB, MB/s, seconds through log MDC fields
  * (`/root/reference/MainService/src/main/java/com/crypto/service/util/CompressionHandler.java:113-134`,
  * `flow/UploadTickerFilesStatusAndDataFlow.java:199-206`). Spark-native:
  * `observe()` metrics ride the job itself (no second pass, exact, no
  * collect), and a QueryExecutionListener captures wall time per action.
  */
object Instrumentation {

  /** Attach observed metrics to a ticker DataFrame before an action; read
    * them back from the returned observation after the action completes.
    * Metric shapes mirror the reference's MDC fields: row count (data_size
    * analog) and value volume.
    */
  def observed(df: DataFrame, name: String = "ingest_metrics")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val instrumented = df.observe(obs,
      count(lit(1)).as("rows"),
      sum(col("size")).as("total_size"),
      approx_count_distinct(col("ticker")).as("approx_tickers"))
    (instrumented, obs)
  }

  /** Wall-time per completed action, captured engine-side (the analog of the
    * reference's System.currentTimeMillis deltas around upload).
    */
  final class TimingListener extends QueryExecutionListener {
    val timings = new ConcurrentLinkedQueue[(String, Long)]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      timings.add(funcName -> durationNs); ()
    }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    def snapshot: Seq[(String, Long)] = {
      val it = timings.iterator()
      val b = Seq.newBuilder[(String, Long)]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  def withTimingListener(spark: SparkSession): TimingListener = {
    val l = new TimingListener
    spark.listenerManager.register(l)
    l
  }
}
