package graft.streaming

import java.sql.Timestamp
import scala.jdk.CollectionConverters._

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.{LoggerConfig, Property}

import graft.schema.LogRecord

/** The missing half of B16: the reference's Log4j2 appender captures the
  * service's OWN log events into the `tickers_logs` table
  * (`/root/reference/MainService/src/main/resources/log4j2.origin.xml:4-18`
  * — a buffering appender with the `LogMsgLayout.json:2-29` JSON layout).
  * [[LogSink]] implements the table/layout/micro-batch side over a
  * MemoryStream; this appender closes the loop by routing REAL log events
  * from the live Log4j2 runtime (the logging backend Spark itself ships)
  * into that sink, so `logger.warn(...)` anywhere in the engine lands as a
  * typed row with severity/thread/message/MDC/exception fields.
  *
  * Field mapping mirrors the reference layout resolver-for-resolver:
  * `%level` → severity, thread name → thread, formatted message → message,
  * stringified MDC → mdc_fields, thrown class/message → exception.*.
  */
class GraftLogAppender(name: String, sink: LogSink)
    extends AbstractAppender(name, null, null, true, Property.EMPTY_ARRAY) {

  override def append(event: LogEvent): Unit = {
    val thrown = Option(event.getThrown)
    sink.enqueue(LogRecord(
      timestamp = new Timestamp(event.getTimeMillis),
      severity = event.getLevel.name,
      thread = event.getThreadName,
      message = event.getMessage.getFormattedMessage,
      mdc_fields = event.getContextData.toMap.asScala.toMap,
      exception_class = thrown.map(_.getClass.getName),
      exception_message = thrown.flatMap(t => Option(t.getMessage))))
  }
}

object LogAppenderBridge {

  /** Attach a [[GraftLogAppender]] to `loggerName` (exact logger config —
    * created if only an ancestor exists) at `level`, mirroring the
    * reference's `<Logger name="..." level="INFO">` + appender-ref wiring.
    * Returns the installed appender; pass it to [[uninstall]] to detach.
    *
    * Default target is the `graft` hierarchy at INFO — the engine's own
    * logs, like the reference captures its own service package. Attaching
    * to the ROOT logger is possible but discouraged: Spark's internals log
    * heavily, and an ERROR inside the sink's own streaming query would feed
    * back into itself.
    */
  def install(sink: LogSink, loggerName: String = "graft",
      level: Level = Level.INFO): GraftLogAppender = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val appender = new GraftLogAppender(s"graft-log-bridge-$loggerName", sink)
    appender.start()
    cfg.addAppender(appender)
    val existing = cfg.getLoggerConfig(loggerName)
    val target =
      if (existing.getName == loggerName) existing
      else {
        val fresh = new LoggerConfig(loggerName, level, /* additive = */ true)
        cfg.addLogger(loggerName, fresh)
        fresh
      }
    if (target.getLevel.intLevel() < level.intLevel()) target.setLevel(level)
    target.addAppender(appender, level, null)
    ctx.updateLoggers()
    appender
  }

  /** Detach and stop a bridge appender installed by [[install]]. */
  def uninstall(appender: GraftLogAppender, loggerName: String = "graft"): Unit = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getLoggerConfig(loggerName).removeAppender(appender.getName)
    cfg.getAppenders.remove(appender.getName)
    appender.stop()
    ctx.updateLoggers()
  }
}
