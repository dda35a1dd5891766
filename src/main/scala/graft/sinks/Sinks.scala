package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** External sink abstraction (SURVEY §7.1 step 6): the engine's internal
  * store is parquet; ClickHouse (or any JDBC warehouse) is an OPTIONAL
  * external sink, exactly inverting the reference — which had ClickHouse as
  * its only store and hand-rolled the wire path
  * (`/root/reference/MainService/src/main/java/com/crypto/service/dao/ClickHouseDAO.java:146-158`).
  */
trait ExternalSink {
  /** A7/A8 — append a batch. */
  def append(df: DataFrame): Unit
  /** A10 — truncate the target table. */
  def truncate(spark: SparkSession): Unit
  /** A11 — count rows in the target table. */
  def count(spark: SparkSession): Long

  /** Attach this sink to a stream exactly-once via foreachBatch. */
  def streamFrom(stream: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) => append(batch) }
      .start()
}

/** Parquet-backed sink — the internal store and the test double for the
  * JDBC path (same ExternalSink contract, fully exercisable offline).
  */
class ParquetSink(dir: String) extends ExternalSink {
  private def fsPath(spark: SparkSession) = graft.ingest.HadoopFs.forPath(spark, dir)
  override def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(dir)
  override def truncate(spark: SparkSession): Unit = {
    val (fs, d) = fsPath(spark)
    if (fs.exists(d)) { fs.listStatus(d).foreach(s => fs.delete(s.getPath, true)); () }
  }
  override def count(spark: SparkSession): Long = {
    val (fs, d) = fsPath(spark)
    if (fs.exists(d) && fs.listStatus(d).nonEmpty) spark.read.parquet(dir).count()
    else 0L
  }
}

/** Connection settings mirroring the reference's `DatabaseConfig`
  * (`config/DatabaseConfig.java:3-14`) — generic JDBC, no vendor coupling.
  */
case class JdbcSinkConfig(
    url: String,                 // e.g. jdbc:clickhouse://host:8123/tickers_data_db
    table: String,
    user: String,
    password: String,
    batchSize: Int = 100000,     // large batches: the JDBC-path analog of the
                                 // reference's async_insert tuning (SURVEY §7.4.5)
    numPartitions: Int = 32)     // writer-side fan-out (reference: 32 threads)

/** JDBC sink — `df.write.format("jdbc")` for appends; raw JDBC for the
  * TRUNCATE/COUNT passthroughs (A10/A11). Compile-checked here; the harness
  * has no database server, so tests run against [[ParquetSink]] through the
  * shared trait.
  */
class JdbcSink(cfg: JdbcSinkConfig) extends ExternalSink {
  private def writer(df: DataFrame) =
    df.repartition(cfg.numPartitions)
      .write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", cfg.batchSize)
      .option("isolationLevel", "NONE") // bulk append, reference is at-least-once

  override def append(df: DataFrame): Unit = writer(df).mode(SaveMode.Append).save()

  private def withConnection[T](f: java.sql.Connection => T): T = {
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try f(conn) finally conn.close()
  }
  override def truncate(spark: SparkSession): Unit =
    withConnection { c => c.createStatement().execute(s"TRUNCATE TABLE ${cfg.table}"); () }
  override def count(spark: SparkSession): Long =
    withConnection { c =>
      val rs = c.createStatement().executeQuery(s"SELECT COUNT(*) FROM ${cfg.table}")
      rs.next(); rs.getLong(1)
    }
}
