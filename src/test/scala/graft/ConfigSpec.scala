package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.app.GraftConfig
import graft.pipeline.{Retry, RetryPolicy}

/** Config tree + retry loop semantics — mirrors the reference's Jackson
  * binding of `application.origin.yaml:1-43` (`MainApplication.java:33-49`,
  * `config/ApplicationConfig.java:5-15`) and `FlowsUtil.java:25-49`.
  */
class ConfigSpec extends AnyFunSuite {

  test("reference-shaped YAML binds every section; unknown keys ignored") {
    val yaml =
      """DatabaseConfig:
        |  host: example
        |  ssl: true
        |  customHttpParams: async_insert=1, wait_for_async_insert=1
        |
        |TickersDataConfig:
        |  TickersDataUploaderConfig:
        |    maxFlushDataAttempts: 5
        |    divideDataPartsQuantity: 16
        |    tickersDataPath: /data/ticks
        |    sleepOnReconnectMs: 250
        |  CompressionHandlerConfig:
        |    compressionBufferSize: 65536
        |
        |MainFlowsConfig:
        |  DiscoverNewFilesConfig:
        |    filesBufferSize: 4096
        |    flushDiscoveredFilesTimeoutSec: 10
        |    sleepOnReconnectMs: 1000
        |    maxReconnectAttempts: 4
        |  ProceedFilesStatusConfig:
        |    workCycleTimeSec: 25
        |    sleepOnReconnectMs: 2000
        |    maxReconnectAttempts: 2
        |  UploadTickersDataConfig:
        |    workCycleTimeSec: 45
        |    sleepOnReconnectMs: 3000
        |    maxReconnectAttempts: 3
        |  CleanupUploadedFilesConfig:
        |    workCycleTimeHours: 6
        |    sleepOnReconnectMs: 3000
        |    maxReconnectAttempts: 3
        |""".stripMargin
    val c = GraftConfig.fromYaml(yaml)
    assert(c.discovery.filesBufferSize == 4096)
    assert(c.discovery.flushTimeoutSec == 10)
    assert(c.discovery.retry == RetryPolicy(4, 1000))
    assert(c.proceedStatus.workCycleSec == 25)
    assert(c.proceedStatus.retry == RetryPolicy(2, 2000))
    assert(c.uploadData.workCycleSec == 45)
    assert(c.cleanup.workCycleSec == 6 * 3600)
    assert(c.ingest.maxFlushAttempts == 5)
    assert(c.ingest.fanOutParts == 16)
    assert(c.ingest.dataPath == "/data/ticks")
    assert(c.ingest.sleepOnRetryMs == 250)
    assert(c.ingest.compressionBufferSize == 65536)
    // the DatabaseConfig section binds for the optional ClickHouse sink
    assert(c.database.enabled && c.database.host == "example")
    assert(c.database.customHttpParams == "async_insert=1, wait_for_async_insert=1")
  }

  test("DatabaseConfig carries into the ClickHouse HTTP sink factory; empty host disables") {
    val c = GraftConfig.fromYaml(
      """DatabaseConfig:
        |  host: ch.internal
        |  port: 8443
        |  username: writer
        |  password: s3cret
        |  database: tickers_data_db
        |  customHttpParams: async_insert=1, wait_for_async_insert=1
        |  socketTimeout: 300000
        |  connectTimeout: 5000
        |""".stripMargin)
    assert(c.database.enabled)
    // the factory parses the reference's comma-separated CUSTOM_PARAMS form
    val sink = graft.sinks.ClickHouseHttpSink.fromConfig(c.database, "tickers_data")
    assert(sink != null)
    // shipped default: empty host = no external sink (parquet is the store)
    assert(!GraftConfig.default.database.enabled)
    assert(!GraftConfig.fromYaml("DatabaseConfig:\n  host:\n").database.enabled)
  }

  test("LoggingConfig binds the log4j2 appender's flush knobs; defaults mirror it") {
    val c = GraftConfig.fromYaml(
      """LoggingConfig:
        |  bufferSize: 512
        |  flushTimeoutSec: 3
        |""".stripMargin)
    assert(c.logging.bufferSize == 512)
    assert(c.logging.flushTimeoutSec == 3)
    // absent section -> the reference appender's shape with engine defaults
    assert(GraftConfig.fromYaml("").logging.bufferSize == 8192)
    assert(GraftConfig.fromYaml("").logging.flushTimeoutSec == 15)
  }

  test("missing keys / empty file fall back to the reference's shipped defaults") {
    val partial = GraftConfig.fromYaml(
      """MainFlowsConfig:
        |  UploadTickersDataConfig:
        |    workCycleTimeSec: 99
        |""".stripMargin)
    assert(partial.uploadData.workCycleSec == 99)
    assert(partial.uploadData.retry == RetryPolicy(3, 3000))   // default
    assert(partial.discovery.filesBufferSize == 8192)          // default
    assert(GraftConfig.fromYaml("") == GraftConfig.default)
    assert(GraftConfig.default.cleanup.workCycleSec == 3 * 3600)
  }

  test("load() round-trips through a file") {
    val f = java.nio.file.Files.createTempFile("graft-cfg", ".yaml")
    java.nio.file.Files.write(f,
      "MainFlowsConfig:\n  ProceedFilesStatusConfig:\n    workCycleTimeSec: 7\n".getBytes)
    assert(GraftConfig.load(f.toString).proceedStatus.workCycleSec == 7)
  }

  test("Retry: succeeds on a later attempt; exhaustion rethrows the last failure") {
    var n = 0
    val out = Retry(RetryPolicy(3, 0L), "t") { n += 1; if (n < 3) sys.error(s"fail $n"); n }
    assert(out == 3 && n == 3)
    var m = 0
    val ex = intercept[RuntimeException] {
      Retry(RetryPolicy(2, 0L), "t") { m += 1; sys.error(s"fail $m") }
    }
    assert(m == 2 && ex.getMessage == "fail 2")
    intercept[IllegalArgumentException] { RetryPolicy(0, 0L) }
  }
}
