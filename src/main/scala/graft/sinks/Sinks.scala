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

  // ---- exactly-once publish ---------------------------------------------
  // The reference's ClickHouse path is at-least-once (SURVEY §2.2 B4); this
  // is the stronger contract: stage-then-transactionally-publish, the
  // warehouse DirSwap protocol translated to SQL. A replayed batch rewrites
  // its stage (overwrite, harmless) and finds its batch_id in the ledger,
  // so the publish is skipped — duplicates are impossible no matter where
  // a crash lands:
  //   crash in stage write      -> nothing visible; replay rewrites stage
  //   crash inside the txn      -> rollback; replay publishes
  //   crash after txn, pre-drop -> stale stage; sweepStaleStages() reaps it
  // The target table must exist (first create it with [[append]] or DDL);
  // `INSERT INTO target SELECT *` relies on stage/target sharing the df's
  // column order, which both do because Spark creates both from the same
  // schema.

  private def ledgerTable = s"${cfg.table}_LEDGER"
  private def stageTable(batchId: Long) = s"${cfg.table}_STAGE_$batchId"

  /** The identifier as the database's metadata catalog stores it —
    * unquoted identifiers fold case per the driver (Derby/H2/ClickHouse
    * store upper; Postgres stores lower), and a lookup in the wrong case
    * silently misses an existing table.
    */
  private def metaCase(c: java.sql.Connection, name: String): String = {
    val md = c.getMetaData
    if (md.storesUpperCaseIdentifiers) name.toUpperCase(java.util.Locale.ROOT)
    else if (md.storesLowerCaseIdentifiers) name.toLowerCase(java.util.Locale.ROOT)
    else name
  }

  /** Escape LIKE metacharacters for `DatabaseMetaData.getTables` patterns
    * — `_` is a single-char wildcard there, so an unescaped
    * `EO_TICKS_LEDGER` also matches `EOXTICKSXLEDGER`, and worse, an
    * unescaped PREFIX match can sweep tables that are not ours.
    */
  private def escapeLike(c: java.sql.Connection, s: String): String = {
    val esc = c.getMetaData.getSearchStringEscape
    s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
  }

  private def tableExists(c: java.sql.Connection, name: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null,
      escapeLike(c, metaCase(c, name)), null)
    try rs.next() finally rs.close()
  }

  private def ensureLedger(c: java.sql.Connection): Unit =
    if (!tableExists(c, ledgerTable)) {
      // CREATE can still lose a race (another writer, or a metadata miss on
      // an exotic driver) — "already exists" is success, not failure; a
      // permanently failing stream over a healthy ledger is the one
      // outcome this method exists to prevent
      try {
        c.createStatement().execute(
          s"CREATE TABLE $ledgerTable (BATCH_ID BIGINT PRIMARY KEY)")
        ()
      } catch {
        case e: java.sql.SQLException if tableExists(c, ledgerTable) => ()
      }
    }

  private def ledgerHas(c: java.sql.Connection, batchId: Long): Boolean = {
    val ps = c.prepareStatement(
      s"SELECT COUNT(*) FROM $ledgerTable WHERE BATCH_ID = ?")
    ps.setLong(1, batchId)
    val rs = ps.executeQuery(); rs.next()
    val n = rs.getLong(1); rs.close(); ps.close()
    n > 0
  }

  /** Publish `df` as batch `batchId` exactly once. Returns true when this
    * call performed the publish, false when the ledger showed the batch
    * already applied (a replay).
    */
  def appendExactlyOnce(df: DataFrame, batchId: Long): Boolean = {
    val stage = stageTable(batchId)
    // distributed, idempotent: overwrite drops + recreates the stage
    df.repartition(cfg.numPartitions)
      .write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", stage)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", cfg.batchSize)
      .mode(SaveMode.Overwrite).save()
    withConnection { c =>
      ensureLedger(c)
      c.setAutoCommit(false)
      // explicit rollback on the exception path: closing a connection with
      // an open transaction makes Derby throw from close(), which would
      // mask the original failure in withConnection's finally (and leak
      // the txn on drivers that don't throw). Exactly-once never depended
      // on this — the retry re-publishes — but diagnosis does.
      val published =
        try {
          if (ledgerHas(c, batchId)) { c.rollback(); false }
          else {
            c.createStatement()
              .executeUpdate(s"INSERT INTO ${cfg.table} SELECT * FROM $stage")
            val ps = c.prepareStatement(s"INSERT INTO $ledgerTable VALUES (?)")
            ps.setLong(1, batchId); ps.executeUpdate(); ps.close()
            c.commit(); true
          }
        } catch {
          case e: Throwable =>
            try c.rollback()
            catch { case s: java.sql.SQLException => e.addSuppressed(s) }
            throw e
        } finally {
          try c.setAutoCommit(true)
          catch { case _: java.sql.SQLException => () }
        }
      // best-effort cleanup; a crash here leaves a stale stage for the sweep
      try { c.createStatement().execute(s"DROP TABLE $stage"); () }
      catch { case _: java.sql.SQLException => () }
      published
    }
  }

  /** Drop stage tables whose batch is already in the ledger (the crash
    * window between commit and stage drop). Returns the count reaped.
    */
  def sweepStaleStages(): Int = withConnection { c =>
    // stored-case prefix, LIKE-escaped (an unescaped `_` wildcard here
    // could match — and then DROP — tables that are not our stages)
    val prefix = metaCase(c, s"${cfg.table}_STAGE_")
    val rs = c.getMetaData.getTables(null, null, escapeLike(c, prefix) + "%", null)
    var stale = List.empty[String]
    while (rs.next()) stale ::= rs.getString("TABLE_NAME")
    rs.close()
    ensureLedger(c)
    stale.count { t =>
      val id = t.stripPrefix(prefix)
      // non-numeric suffixes are not ours; leave them alone
      id.toLongOption.exists { b =>
        if (ledgerHas(c, b)) {
          try { c.createStatement().execute(s"DROP TABLE $t"); true }
          catch { case _: java.sql.SQLException => false }
        } else false
      }
    }
  }

  /** Stream attachment under the exactly-once contract: the foreachBatch
    * batchId (stable across replays by Structured Streaming's contract)
    * keys the ledger, so checkpoint-replayed batches publish zero rows.
    */
  def streamFromExactlyOnce(stream: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendExactlyOnce(batch, id); ()
      }
      .start()
}
