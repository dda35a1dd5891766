package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Per-source token-budget admission as an always-on stream — the streaming
  * counterpart of the batch `t_source_cap` quota (that op caps DOCUMENT
  * COUNT per source by rank; this one caps cumulative TOKENS in arrival
  * order — complementary knobs, not the same admitted set), built on
  * Spark 4's `transformWithState` (the arbitrary-state API that supersedes
  * `flatMapGroupsWithState`: typed state handles, TTL, timers, RocksDB
  * state store).
  *
  * Semantics: a document is ADMITTED while its source's cumulative admitted
  * tokens are below the budget (the crossing document is admitted — quota
  * enforcement cuts only after the running total crosses the threshold);
  * everything after is rejected with the standing total attached. Admission
  * is therefore arrival-order-dependent, as any online quota must be.
  *
  * Scale shape: state is ONE long per source (the cumulative counter) in
  * the RocksDB store — independent of document rate; the shuffle is the
  * groupByKey hash on source, exactly the partitioning the batch quota
  * query uses. Decisions stream out per micro-batch, so downstream sinks
  * see admit/reject verdicts with bounded latency instead of end-of-day
  * batch truncation.
  */
case class DocIn(source: String, docId: Long, nTokens: Long)
case class DocDecision(source: String, docId: Long, admitted: Boolean, cumTokens: Long)

class SourceBudgetProcessor(budget: Long)
    extends StatefulProcessor[String, DocIn, DocDecision] {

  @transient private var cum: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[DocIn],
      timerValues: TimerValues): Iterator[DocDecision] = {
    var c = if (cum.exists()) cum.get() else 0L
    // materialize before the state update: the returned iterator may be
    // consumed after handleInputRows returns, but the store write must
    // reflect every row of THIS batch
    val out = rows.map { r =>
      val admit = c < budget
      if (admit) c += r.nTokens
      DocDecision(key, r.docId, admit, c)
    }.toList
    cum.update(c)
    out.iterator
  }
}

object SourceBudget {
  /** Wire the processor over a typed document stream. */
  def decisions(docs: Dataset[DocIn], budget: Long): Dataset[DocDecision] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new SourceBudgetProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }
}
