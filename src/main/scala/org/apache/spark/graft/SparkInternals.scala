package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Narrow bridge to `private[spark]` internals the measurement tools need.
  * Lives under `org.apache.spark` so the Scala compiler grants the
  * package-private access (the standard pattern Spark's own downstream
  * test harnesses use); keep it to exactly one method so the surface
  * stays auditable.
  */
object SparkInternals {

  /** Deterministically drain the async listener bus: block until every
    * queued event (task-end metrics included) has been delivered, instead
    * of sleeping a fixed interval and hoping. A fixed sleep is racy — on
    * a loaded box straggler `onTaskEnd` events arrive after it,
    * undercounting listener-accumulated shuffle records, which can push a
    * ScaleGate query under the record-floor exemption or mask a genuine
    * super-linear shuffle (both false PASSes of the gate's "deterministic"
    * signal). Bounded wait: a bus that cannot drain in `timeoutMs` is a
    * real fault worth surfacing, so the TimeoutException propagates.
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
