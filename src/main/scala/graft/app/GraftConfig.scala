package graft.app

import scala.jdk.CollectionConverters._

import graft.pipeline.RetryPolicy

/** Discovery flow knobs (`application.origin.yaml:23-27`). */
case class DiscoveryConf(filesBufferSize: Int, flushTimeoutSec: Int, retry: RetryPolicy)

/** One scheduled flow: cadence + retry (`application.origin.yaml:29-43`). */
case class FlowConf(workCycleSec: Int, retry: RetryPolicy)

/** Ingest/upload knobs (`application.origin.yaml:13-21`). */
case class IngestConf(maxFlushAttempts: Int, fanOutParts: Int, dataPath: String,
                      sleepOnRetryMs: Long, compressionBufferSize: Int)

/** The reference's `DatabaseConfig` section (`application.origin.yaml:1-11`,
  * `config/DatabaseConfig.java:4-13`) — connection material for the
  * OPTIONAL external ClickHouse sink
  * ([[graft.sinks.ClickHouseHttpSink]]). Key names match the reference,
  * so a deployment's config file carries over verbatim; an empty `host`
  * (the shipped default) means "no external sink", and the engine's
  * parquet warehouse remains the only store.
  */
case class DatabaseConf(
    host: String,
    port: Int,
    username: String,
    password: String,
    database: String,
    customHttpParams: String,
    socketTimeoutMs: Int,
    connectTimeoutMs: Int) {
  def enabled: Boolean = host.trim.nonEmpty
}

/** Log-sink flush knobs — the reference appender's `bufferSize` /
  * `flushTimeoutSec` pair (`log4j2.origin.xml:5-6`), lifted out of the
  * XML into the engine's one config tree so a deployment tunes log
  * batching where it tunes everything else. Consumed by
  * [[graft.streaming.LogSink]]: flush at `bufferSize` records OR after
  * `flushTimeoutSec`, whichever first.
  */
case class LoggingConf(bufferSize: Int, flushTimeoutSec: Int)

/** The engine's configuration tree — one case-class object mirroring the
  * reference's `application.origin.yaml:1-43` (same section and key names,
  * so a reference deployment's config carries over), loaded by
  * [[PipelineApp]] via `--config <path>`. The `DatabaseConfig` section
  * binds to [[DatabaseConf]] for the optional external ClickHouse sink
  * ([[graft.sinks.ClickHouseHttpSink.fromConfig]]); with the shipped
  * empty `host` it stays disabled and parquet remains the only store.
  * Unknown keys anywhere are ignored, so the file may keep reference-only
  * entries (`ssl`, `socketKeepAlive`).
  */
case class GraftConfig(
    discovery: DiscoveryConf,
    proceedStatus: FlowConf,
    uploadData: FlowConf,
    cleanup: FlowConf,
    ingest: IngestConf,
    logging: LoggingConf,
    database: DatabaseConf)

object GraftConfig {

  /** The reference's shipped values (`application.origin.yaml`). */
  val default: GraftConfig = GraftConfig(
    discovery = DiscoveryConf(filesBufferSize = 8192, flushTimeoutSec = 15,
      retry = RetryPolicy(3, 3000)),
    proceedStatus = FlowConf(20, RetryPolicy(3, 3000)),
    uploadData = FlowConf(30, RetryPolicy(3, 3000)),
    cleanup = FlowConf(3 * 3600, RetryPolicy(3, 3000)),
    ingest = IngestConf(maxFlushAttempts = 3, fanOutParts = 32, dataPath = "",
      sleepOnRetryMs = 500, compressionBufferSize = 131072),
    logging = LoggingConf(bufferSize = 8192, flushTimeoutSec = 15),
    database = DatabaseConf(host = "", port = 8123, username = "default",
      password = "", database = "default",
      customHttpParams = "async_insert=1, wait_for_async_insert=1",
      socketTimeoutMs = 300000, connectTimeoutMs = 5000))

  def load(path: String): GraftConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Parse the reference-shaped YAML; any missing key falls back to
    * [[default]] (the reference's Jackson binding behaves the same way for
    * absent primitives).
    */
  def fromYaml(text: String): GraftConfig = {
    val root = Option(new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Object]](text))
      .map(_.asScala.toMap).getOrElse(Map.empty[String, Object])

    def section(m: Map[String, Object], key: String): Map[String, Object] =
      m.get(key) match {
        case Some(sub: java.util.Map[_, _]) =>
          sub.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }.toMap
        case _ => Map.empty
      }
    def int(m: Map[String, Object], key: String, dflt: Int): Int =
      m.get(key) match {
        case Some(n: Number) => n.intValue
        case Some(s: String) if s.trim.nonEmpty => s.trim.toInt
        case _ => dflt
      }
    def long(m: Map[String, Object], key: String, dflt: Long): Long =
      m.get(key) match {
        case Some(n: Number) => n.longValue
        case Some(s: String) if s.trim.nonEmpty => s.trim.toLong
        case _ => dflt
      }
    def str(m: Map[String, Object], key: String, dflt: String): String =
      m.get(key) match {
        case Some(null) => dflt
        case Some(v)    => v.toString
        case None       => dflt
      }
    def retry(m: Map[String, Object], dflt: RetryPolicy): RetryPolicy = RetryPolicy(
      int(m, "maxReconnectAttempts", dflt.maxAttempts),
      long(m, "sleepOnReconnectMs", dflt.sleepMs))

    val flows = section(root, "MainFlowsConfig")
    val disc = section(flows, "DiscoverNewFilesConfig")
    val proceed = section(flows, "ProceedFilesStatusConfig")
    val upload = section(flows, "UploadTickersDataConfig")
    val cleanup = section(flows, "CleanupUploadedFilesConfig")
    val data = section(root, "TickersDataConfig")
    val logging = section(root, "LoggingConfig")
    val uploader = section(data, "TickersDataUploaderConfig")
    val compression = section(data, "CompressionHandlerConfig")
    val d = default

    GraftConfig(
      discovery = DiscoveryConf(
        int(disc, "filesBufferSize", d.discovery.filesBufferSize),
        int(disc, "flushDiscoveredFilesTimeoutSec", d.discovery.flushTimeoutSec),
        retry(disc, d.discovery.retry)),
      proceedStatus = FlowConf(
        int(proceed, "workCycleTimeSec", d.proceedStatus.workCycleSec),
        retry(proceed, d.proceedStatus.retry)),
      uploadData = FlowConf(
        int(upload, "workCycleTimeSec", d.uploadData.workCycleSec),
        retry(upload, d.uploadData.retry)),
      cleanup = FlowConf(
        int(cleanup, "workCycleTimeHours", d.cleanup.workCycleSec / 3600) * 3600,
        retry(cleanup, d.cleanup.retry)),
      ingest = IngestConf(
        int(uploader, "maxFlushDataAttempts", d.ingest.maxFlushAttempts),
        int(uploader, "divideDataPartsQuantity", d.ingest.fanOutParts),
        str(uploader, "tickersDataPath", d.ingest.dataPath),
        long(uploader, "sleepOnReconnectMs", d.ingest.sleepOnRetryMs),
        int(compression, "compressionBufferSize", d.ingest.compressionBufferSize)),
      logging = LoggingConf(
        int(logging, "bufferSize", d.logging.bufferSize),
        int(logging, "flushTimeoutSec", d.logging.flushTimeoutSec)),
      database = {
        val db = section(root, "DatabaseConfig")
        DatabaseConf(
          str(db, "host", d.database.host),
          int(db, "port", d.database.port),
          str(db, "username", d.database.username),
          str(db, "password", d.database.password),
          str(db, "database", d.database.database),
          str(db, "customHttpParams", d.database.customHttpParams),
          int(db, "socketTimeout", d.database.socketTimeoutMs),
          int(db, "connectTimeout", d.database.connectTimeoutMs))
      })
  }
}
