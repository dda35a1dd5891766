package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.schema.FileStatus

/** One status-change event for a file (streaming input). */
case class StatusEvent(filename: String, status: String, at: Timestamp)

/** Emitted on every applied transition (streaming output). */
case class TransitionRecord(filename: String, from: String, to: String,
                            at: Timestamp, applied: Boolean)

/** The file-status state machine as a *streaming* stateful operator:
  * `flatMapGroupsWithState` keyed by filename, holding each file's current
  * status in the state store (SURVEY §1.1 — "if run as a stream,
  * mapGroupsWithState keyed by filename"). The batch journal remains the
  * system of record; this operator serves always-on pipelines that need
  * transition decisions inline (illegal transitions are emitted with
  * `applied = false` — the quarantine signal — and do not mutate state).
  *
  * Scale: state is one small record per tracked file, partitioned by
  * filename across executors; the state store checkpoints incrementally, so
  * a million in-flight files is a few tens of MB of state.
  */
object StatefulLifecycle {

  def applyEvents(filename: String, events: Iterator[StatusEvent],
      state: GroupState[String]): Iterator[TransitionRecord] = {
    var current: Option[String] = state.getOption
    val out = Seq.newBuilder[TransitionRecord]
    // state-store order: process each micro-batch's events in time order
    events.toSeq.sortBy(e => (e.at.getTime, e.status)).foreach { e =>
      val from = current
      val legal = from match {
        case None => e.status == FileStatus.Discovered.name // files enter as DISCOVERED
        case Some(f) =>
          FileStatus.canTransition(FileStatus.fromName(f), FileStatus.fromName(e.status))
      }
      out += TransitionRecord(filename, from.getOrElse(""), e.status, e.at, legal)
      if (legal) current = Some(e.status)
    }
    current.foreach(state.update)
    out.result().iterator
  }

  /** Wire the operator over a stream of [[StatusEvent]]s. */
  def track(spark: SparkSession, events: Dataset[StatusEvent]): Dataset[TransitionRecord] = {
    import spark.implicits._
    events.groupByKey(_.filename)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(applyEvents)
  }
}
