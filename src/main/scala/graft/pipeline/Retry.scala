package graft.pipeline

/** Bounded-retry policy — the reference's per-flow
  * `sleepOnReconnectMs` / `maxReconnectAttempts` pair
  * (`/root/reference/MainService/src/main/resources/application.origin.yaml:27-43`).
  */
case class RetryPolicy(maxAttempts: Int = 3, sleepMs: Long = 0L) {
  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
}

/** The reference's flow-level retry loop
  * (`FlowsUtil.java:25-49` `manageRetryOperation`): run the operation up to
  * `maxAttempts` times, sleeping `sleepMs` between failures, rethrowing the
  * last failure on exhaustion. Callers decide what exhaustion means —
  * [[Lifecycle.processReady]] quarantines the claimed set as ERROR.
  */
object Retry {
  // Log4j2, not stderr: the engine's log-appender bridge
  // ([[graft.streaming.LogAppenderBridge]]) captures the `graft` hierarchy
  // into the `tickers_logs` table, so retries become queryable rows — the
  // reference logs its reconnect attempts the same way.
  private val log = org.apache.logging.log4j.LogManager.getLogger(getClass)

  def apply[T](policy: RetryPolicy, label: String)(op: => T): T = {
    var attempt = 0
    var last: Exception = null
    while (attempt < policy.maxAttempts) {
      try return op
      catch {
        case e: Exception =>
          attempt += 1
          last = e
          log.warn(
            s"[retry] $label failed (attempt $attempt/${policy.maxAttempts}), " +
              s"retrying in ${policy.sleepMs} ms: $e")
          if (attempt < policy.maxAttempts && policy.sleepMs > 0)
            Thread.sleep(policy.sleepMs)
      }
    }
    throw last
  }
}
