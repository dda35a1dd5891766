package graft.sinks

import java.net.{HttpURLConnection, URL, URLEncoder}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Connection settings for the ClickHouse HTTP wire path — the knob set
  * the reference's `ConnectionHandler` exposes
  * (`/root/reference/MainService/src/main/java/com/crypto/service/util/ConnectionHandler.java:44-67`:
  * host/port/database/credentials + custom HTTP params + socket/connect
  * timeouts), minus SSL (no egress in this sandbox to prove it against).
  * `customParams` defaults to the reference deployment's async-insert pair
  * (SURVEY §7.4.5): the server buffers small inserts and the client waits
  * for the flush acknowledgement.
  *
  * `asyncInsertDeduplicate` (default ON) pins `async_insert_deduplicate=1`
  * on every TOKENED insert — without it ClickHouse ignores the dedup token
  * for async inserts and wire-exactly-once silently degrades to
  * at-least-once. The setting exists server-side since ClickHouse 22.9,
  * the minimum version the tokened path supports with the flag on; a
  * pre-22.9 server rejects the unknown setting over HTTP, so deployments
  * stuck below it must set this false and accept the documented
  * degradation (or insert synchronously: the token dedups sync inserts
  * into a *MergeTree dedup window without this setting).
  */
case class ClickHouseHttpConfig(
    host: String,
    port: Int,
    database: String,
    table: String,
    user: String = "default",
    password: String = "",
    customParams: Map[String, String] =
      Map("async_insert" -> "1", "wait_for_async_insert" -> "1"),
    connectTimeoutMs: Int = 5000,
    socketTimeoutMs: Int = 30000,
    asyncInsertDeduplicate: Boolean = true)

/** The reference's actual wire path, re-expressed Spark-first: ClickHouse
  * HTTP inserts of GZIP-compressed CSV
  * (`dao/ClickHouseDAO.java:146-158` — `ClickHousePassThruStream.of(pin,
  * ClickHouseCompression.GZIP, ClickHouseFormat.CSV)` fed by a
  * `PipedOutputStream` a compression thread writes into,
  * `data/TickersDataLoader.java:113-137`). Differences that ARE the
  * Spark design, not omissions:
  *
  *  - **Per-partition uploads from executors.** The reference pipelines
  *    one compression thread into one insert stream per batch on a single
  *    JVM; here every partition opens its own chunked-streaming POST, so
  *    upload parallelism is the data's partitioning (32-way locally, any
  *    width on a cluster) and nothing funnels through the driver.
  *  - **The pipe is the stream stack, not threads.** The hand-rolled
  *    PipedInput/OutputStream pair + AtomicBoolean handshake collapses
  *    into `GZIPOutputStream(chunked HTTP output)`: rows compress and
  *    upload as they serialize, whole-batch buffering never happens
  *    (`setChunkedStreamingMode` — the Content-Length is never needed).
  *  - **Same delivery contract, plus a wire-exactly-once upgrade.**
  *    [[append]] is at-least-once under retry, exactly like the
  *    reference's `maxFlushDataAttempts` loop; the engine's B4 retry
  *    layers wrap it unchanged. [[appendBatch]] additionally sends a
  *    per-partition `insert_deduplication_token` (stable across task
  *    retries AND checkpoint replays), so the server itself drops the
  *    duplicate a half-consumed-then-retried POST would otherwise
  *    create — the one exposure a client-side ledger cannot close.
  *    (The transactional ledger upgrade lives in
  *    [[JdbcSink.appendExactlyOnce]] for transactional targets.)
  *
  * Wire shape per request: `POST /?query=INSERT INTO <db>.<table> FORMAT
  * CSV&async_insert=1&...` with `Content-Encoding: gzip`,
  * `X-ClickHouse-User`/`X-ClickHouse-Key` auth headers, body = gzip'd
  * ClickHouse-CSV rows (`"`-quoted with `""` doubling, `\N` for NULL).
  * Proven against an in-process protocol double (ClickHouseHttpSinkSpec)
  * that validates method, query, params, gzip, chunking, and row
  * round-trips — the real server is unreachable from this sandbox.
  *
  * 100 TB: one POST per partition per batch; executor-side gzip (the same
  * ~12× ticker-CSV ratio as the ingest path); no driver-side collect;
  * upload width follows `df.rdd.getNumPartitions`, so the B11 32-way
  * fan-out (or a cluster's thousands) applies unchanged.
  */
class ClickHouseHttpSink(cfg: ClickHouseHttpConfig) extends ExternalSink {
  import ClickHouseHttpSink._

  override def append(df: DataFrame): Unit = {
    val c = cfg // serializable snapshot for the executor closure
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) postRows(c, rows, token = None)
    }
  }

  /** Wire-exactly-once append: each partition's POST carries an
    * `insert_deduplication_token` derived from (batchId, partitionId) —
    * both stable across Spark task retries — so a retry after the server
    * consumed part (or all) of a half-acknowledged POST dedups SERVER-side
    * (ClickHouse drops an insert whose token matches one in the table's
    * dedup window) instead of duplicating rows. This closes the one gap
    * `append` + task retry leaves: a mid-stream HTTP failure after the
    * server consumed rows. The ledger above ([[JdbcSink.appendExactlyOnce]]'s
    * contract) dedups whole batches; the token dedups partition POSTs.
    * `batchId` must be stable across replays (foreachBatch's id is, by
    * Structured Streaming's contract).
    *
    * `streamId` namespaces the token with the writing stream's identity
    * (see [[streamInstanceId]]): WITHOUT it, a checkpoint reset (batchId
    * restarts at 0) or two streaming queries writing the same table would
    * REUSE tokens, and ClickHouse would silently DROP fresh rows whose
    * token matches one still in the dedup window — data loss, not failed
    * dedup. Direct batch callers with a single writer may omit it.
    *
    * Server-side contract for the token to actually dedup (documented
    * here because the client cannot verify it over the wire): the target
    * must be a MergeTree-family table with a live deduplication window —
    * Replicated*MergeTree dedups by default; NON-replicated MergeTree
    * requires `non_replicated_deduplication_window > 0` or the token is
    * ignored and delivery silently stays at-least-once. Async inserts
    * ignore the token too unless `async_insert_deduplicate=1`, so
    * [[ClickHouseHttpSink.postRows]] pins that setting on every tokened
    * request (harmlessly ignored when the insert is synchronous).
    */
  def appendBatch(df: DataFrame, batchId: Long,
      streamId: Option[String] = None): Unit = {
    val c = cfg
    // an EMPTY stream id is the legacy (pre-namespace) checkpoint marker —
    // those tokens must stay byte-identical to what the checkpoint's
    // in-flight batch already sent (see streamInstanceId)
    val ns = streamId.filter(_.nonEmpty).map(s => s"-s$s").getOrElse("")
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        postRows(c, rows, token = Some(s"graft-${c.table}$ns-b$batchId-p$pid"))
      }
    }
  }

  /** Stream attachment upgraded to the tokened path: the foreachBatch id
    * keys the per-partition dedup tokens — namespaced by a per-checkpoint
    * stream id — so a checkpoint replay OR a task retry inserts each
    * partition at most once server-side, while a checkpoint RESET or a
    * second stream into the same table gets a fresh namespace instead of
    * colliding with tokens still in the server's dedup window.
    */
  override def streamFrom(df: DataFrame, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger): org.apache.spark.sql.streaming.StreamingQuery = {
    val sid = ClickHouseHttpSink.streamInstanceId(df.sparkSession, checkpointDir)
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(batch, id, Some(sid))
      }
      .start()
  }

  override def truncate(spark: SparkSession): Unit = {
    exec(cfg, s"TRUNCATE TABLE ${cfg.database}.${cfg.table}"); ()
  }

  override def count(spark: SparkSession): Long =
    exec(cfg, s"SELECT count() FROM ${cfg.database}.${cfg.table} FORMAT TabSeparated")
      .trim.toLong
}

object ClickHouseHttpSink {

  /** Build the sink from the reference-shaped config tree's
    * `DatabaseConfig` section — the comma-separated `customHttpParams`
    * string ("async_insert=1, wait_for_async_insert=1") parses to the
    * per-request param map exactly as the reference's CUSTOM_PARAMS
    * option does. Callers should check `db.enabled` first; an empty host
    * means the deployment runs without an external sink.
    */
  /** Params the sink itself owns; a config entry using one of these would
    * silently override the statement being executed (`query`, `database`)
    * or defeat the wire-exactly-once token — reject loudly at startup.
    */
  private val ReservedParams = Set("query", "database",
    "insert_deduplication_token", "async_insert_deduplicate")

  /** The stable per-stream token namespace: a short random id persisted as
    * `<checkpointDir>/graft-sink-id` next to the stream's own state. The
    * lifecycle is exactly the checkpoint's — a restart of the same
    * checkpoint rereads the same id (so replayed batches re-send
    * byte-identical tokens and dedup correctly), while a checkpoint RESET
    * (wiped dir, batchId back to 0) or a second stream (its own
    * checkpoint) mints a fresh id, so their tokens can never collide with
    * ones still in the server's dedup window. Hadoop FS API: checkpoints
    * live on cluster storage, not the local disk.
    *
    * Two subtleties the simple create-then-write version got wrong:
    *  - The id is written to a temp name and RENAMED into place, so a
    *    concurrent second attachment (degenerate — Structured Streaming
    *    itself locks a checkpoint — but the utility must not rely on
    *    that) can never observe a created-but-empty id file and silently
    *    adopt a different namespace; the rename loser rereads the
    *    winner's complete id.
    *  - A checkpoint that PREDATES the namespace (has committed offsets
    *    but no id file) continues with the LEGACY un-namespaced tokens —
    *    persisted as an empty id — because a batch in flight across the
    *    upgrade replays with whatever tokens its first attempt sent, and
    *    switching namespaces mid-checkpoint would re-insert it (the
    *    exact duplication the token exists to prevent). Fresh checkpoints
    *    get a real id.
    */
  private[graft] def streamInstanceId(spark: SparkSession,
      checkpointDir: String): String = {
    val dir = new org.apache.hadoop.fs.Path(checkpointDir)
    val p = new org.apache.hadoop.fs.Path(dir, "graft-sink-id")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def read(): String = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
    }
    if (fs.exists(p)) return read()
    val offsets = new org.apache.hadoop.fs.Path(dir, "offsets")
    val legacy = fs.exists(offsets) && fs.listStatus(offsets).nonEmpty
    val id = if (legacy) "" else java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".graft-sink-id.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, /* overwrite = */ false)
    try out.write(id.getBytes("UTF-8")) finally out.close()
    // read-after-rename on BOTH outcomes: RawLocalFileSystem's rename
    // overwrites an existing destination and returns true, so under a
    // bypassed checkpoint lock TWO racers can both "win" — returning the
    // local `id` would let the first winner keep sending tokens under a
    // namespace the second winner's rename just replaced on disk,
    // splitting the namespace this file exists to unify. Converging on
    // whatever byte content actually landed is correct on every FS: with
    // atomic no-overwrite renames (HDFS) the read returns the winner's id
    // anyway, and on local FS both racers adopt the last landed content.
    if (!fs.rename(tmp, p)) fs.delete(tmp, false)
    read()
  }

  def fromConfig(db: graft.app.DatabaseConf, table: String): ClickHouseHttpSink = {
    val params = db.customHttpParams.split(",").iterator
      .map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty => k.trim -> v.trim
          case _ => throw new IllegalArgumentException(
            s"customHttpParams entry '$kv' is not key=value " +
              s"(full setting: '${db.customHttpParams}')")
        }
      }.toMap
    params.keys.find(ReservedParams)
      .foreach { k =>
        throw new IllegalArgumentException(
          s"customHttpParams may not set reserved param '$k' " +
            s"(reserved: ${ReservedParams.mkString(", ")})")
      }
    new ClickHouseHttpSink(ClickHouseHttpConfig(
      host = db.host, port = db.port, database = db.database, table = table,
      user = db.username, password = db.password, customParams = params,
      connectTimeoutMs = db.connectTimeoutMs, socketTimeoutMs = db.socketTimeoutMs))
  }

  private def endpoint(cfg: ClickHouseHttpConfig, query: String,
      extra: Map[String, String]): URL = {
    // custom params FIRST so the sink-owned ones (query/database/token)
    // always win — a customParams entry named "query" must never replace
    // the statement being executed
    val params = (cfg.customParams ++
      Map("query" -> query, "database" -> cfg.database) ++ extra)
      .toSeq.sortBy(_._1)
      .map { case (k, v) =>
        s"${URLEncoder.encode(k, "UTF-8")}=${URLEncoder.encode(v, "UTF-8")}"
      }.mkString("&")
    new URL(s"http://${cfg.host}:${cfg.port}/?$params")
  }

  private def open(cfg: ClickHouseHttpConfig, query: String,
      extra: Map[String, String] = Map.empty): HttpURLConnection = {
    val conn = endpoint(cfg, query, extra).openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(cfg.connectTimeoutMs)
    conn.setReadTimeout(cfg.socketTimeoutMs)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("X-ClickHouse-User", cfg.user)
    conn.setRequestProperty("X-ClickHouse-Key", cfg.password)
    conn
  }

  /** Read the response; non-200 must THROW with the server's message so
    * the caller's retry layer engages — a swallowed error here would be a
    * silent data-loss path (the one failure mode an at-least-once
    * contract cannot have).
    */
  private def finish(conn: HttpURLConnection): String = {
    val code = conn.getResponseCode
    val body = {
      val in = if (code == 200) conn.getInputStream else conn.getErrorStream
      if (in == null) "" else try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    if (code != 200)
      throw new java.io.IOException(s"clickhouse http $code: ${body.take(500)}")
    body
  }

  /** One streaming insert: rows serialize → gzip → chunked POST, all in
    * one pass (the PipedStream pipeline as a stream stack). Executor-side.
    */
  private def postRows(cfg: ClickHouseHttpConfig, rows: Iterator[Row],
      token: Option[String]): Unit = {
    // a token without async_insert_deduplicate=1 is a silent no-op under
    // the default async_insert=1 (ClickHouse ignores the token for async
    // inserts unless that setting is on; for sync inserts the setting is
    // ignored, so pinning it is always safe ON SERVERS THAT KNOW IT) —
    // the wire-exactly-once claim must not depend on the deployment
    // remembering a second knob. Pre-22.9 servers reject the unknown
    // setting outright, hence the config escape hatch (see
    // ClickHouseHttpConfig.asyncInsertDeduplicate for the tradeoff).
    val conn = open(cfg,
      s"INSERT INTO ${cfg.database}.${cfg.table} FORMAT CSV",
      token.map(t => Map("insert_deduplication_token" -> t) ++
        (if (cfg.asyncInsertDeduplicate) Map("async_insert_deduplicate" -> "1")
         else Map.empty)).getOrElse(Map.empty))
    conn.setDoOutput(true)
    conn.setChunkedStreamingMode(64 * 1024) // pipelined: no whole-batch buffer
    conn.setRequestProperty("Content-Encoding", "gzip")
    val out = new GZIPOutputStream(conn.getOutputStream, 64 * 1024)
    try {
      val sb = new java.lang.StringBuilder(256)
      rows.foreach { r =>
        sb.setLength(0)
        var i = 0
        val n = r.length
        while (i < n) {
          if (i > 0) sb.append(',')
          sb.append(csvField(r.get(i)))
          i += 1
        }
        sb.append('\n')
        out.write(sb.toString.getBytes("UTF-8"))
      }
    } finally out.close() // flushes the gzip trailer before the response read
    finish(conn)
    ()
  }

  /** Non-insert statements (TRUNCATE, SELECT count()): empty POST body. */
  private def exec(cfg: ClickHouseHttpConfig, query: String): String = {
    val conn = open(cfg, query)
    conn.setDoOutput(true)
    conn.getOutputStream.close()
    finish(conn)
  }

  /** ClickHouse CSV cell: `\N` for NULL, `"` quoting with `""` doubling
    * when the value contains a comma, quote, or newline — or STARTS with a
    * backslash: an unquoted `\N` is ClickHouse's NULL literal (a silent
    * value→NULL corruption for that exact string value), and unquoted
    * leading backslashes are escape-prefix territory the quoted form
    * round-trips verbatim. Everything else as its plain string form
    * (numbers/booleans/timestamps).
    */
  private[graft] def csvField(v: Any): String = v match {
    case null => "\\N"
    case s: String =>
      if (s.startsWith("\\") ||
          s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    case other => other.toString
  }
}
