package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StatefulLifecycle, StatusEvent, TransitionRecord}

/** The streaming status state machine: legal transitions apply and persist
  * across micro-batches; illegal ones are flagged and leave state untouched.
  */
class StatefulLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState tracks per-file status across micro-batches") {
    val input = MemoryStream[StatusEvent](spark)
    val out = StatefulLifecycle.track(spark, input.toDS())
    val q = out.writeStream.format("memory").queryName("transitions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        StatusEvent("f1", "DISCOVERED", ts("2024-08-08 10:00:00")),
        StatusEvent("f1", "READY_FOR_PROCESSING", ts("2024-08-08 10:01:00")),
        StatusEvent("f2", "FINISHED", ts("2024-08-08 10:00:00"))) // illegal entry
      q.processAllAvailable()
      // second micro-batch continues from checkpointed state
      input.addData(
        StatusEvent("f1", "IN_PROGRESS", ts("2024-08-08 10:02:00")),
        StatusEvent("f1", "DISCOVERED", ts("2024-08-08 10:03:00"))) // illegal re-entry
      q.processAllAvailable()
      val got = spark.table("transitions").as[TransitionRecord].collect()
        .sortBy(r => (r.filename, r.at.getTime, r.to))
      val f1 = got.filter(_.filename == "f1").map(r => (r.from, r.to, r.applied)).toSeq
      assert(f1 == Seq(
        ("", "DISCOVERED", true),
        ("DISCOVERED", "READY_FOR_PROCESSING", true),
        ("READY_FOR_PROCESSING", "IN_PROGRESS", true),     // state crossed batches
        ("IN_PROGRESS", "DISCOVERED", false)))             // illegal, state kept
      val f2 = got.filter(_.filename == "f2").map(r => (r.from, r.to, r.applied)).toSeq
      assert(f2 == Seq(("", "FINISHED", false)))           // files must enter DISCOVERED
    } finally q.stop()
  }
}
