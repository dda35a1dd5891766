package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingTopK

/** Streaming heavy hitters: per-batch Misra–Gries sketches, on-read merge
  * with a certified undercount bound, replay idempotence, app wiring.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(docs: Seq[(Long, String)]): Map[String, Long] =
    docs.flatMap(_._2.trim.split("\\s+")).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap

  test("merged board: counts are certified lower bounds within err_bound") {
    val store = tmpDir("hh-store")
    val k = 4
    // batch 0: 'alpha' dominates; batch 1: 'beta' dominates + a long tail
    val b0 = Seq(1L -> "alpha alpha alpha beta gamma delta epsilon",
      2L -> "alpha alpha beta")
    val b1 = Seq(3L -> "beta beta beta beta zeta eta theta iota",
      4L -> "beta alpha kappa")
    StreamingTopK.processBatch(b0.toDF("doc_id", "text"), 0L, store, k)
    StreamingTopK.processBatch(b1.toDF("doc_id", "text"), 1L, store, k)
    val board = StreamingTopK.mergedTopK(spark, store, k).collect()
    assert(board.nonEmpty && board.length <= k)
    val truth = exactCounts(b0 ++ b1)
    val err = board.head.getLong(2)
    board.foreach { r =>
      val (tok, lb) = (r.getString(0), r.getLong(1))
      // lower bound and certified slack
      assert(lb >= 1 && lb <= truth(tok), s"$tok lb=$lb true=${truth(tok)}")
      assert(truth(tok) - lb <= err, s"$tok slack=${truth(tok) - lb} err=$err")
    }
    // the MG guarantee survives merging: any token with true count > err
    // MUST be on the board
    val tracked = board.map(_.getString(0)).toSet
    truth.filter(_._2 > err).keySet.foreach(t =>
      assert(tracked.contains(t), s"guaranteed hitter $t missing (err=$err)"))
    // the two dominators are the top-2
    assert(board.take(2).map(_.getString(0)).toSet == Set("alpha", "beta"))
  }

  test("replay rewrites a batch sketch byte-identically (exactly-once store)") {
    val store = tmpDir("hh-replay")
    val b0 = Seq(1L -> "x x x y y z", 2L -> "x w")
    val b1 = Seq(3L -> "y y w v u t s r q p")
    StreamingTopK.processBatch(b0.toDF("doc_id", "text"), 0L, store, k = 3)
    StreamingTopK.processBatch(b1.toDF("doc_id", "text"), 1L, store, k = 3)
    val before = StreamingTopK.mergedTopK(spark, store, k = 3).collect().toSeq
    // crash-between-write-and-commit replay of batch 0
    StreamingTopK.processBatch(b0.toDF("doc_id", "text"), 0L, store, k = 3)
    val after = StreamingTopK.mergedTopK(spark, store, k = 3).collect().toSeq
    assert(after.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ==
      before.map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
  }

  test("small batches compress losslessly (m=0 when distinct <= k)") {
    val store = tmpDir("hh-exact")
    val b0 = Seq(1L -> "a a a b b c")
    StreamingTopK.processBatch(b0.toDF("doc_id", "text"), 0L, store, k = 8)
    val board = StreamingTopK.mergedTopK(spark, store, k = 8).collect()
    // err_bound 0: every count is exact
    assert(board.forall(_.getLong(2) == 0L))
    assert(board.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("streaming wiring: MemoryStream micro-batches land as sketch dirs") {
    val store = tmpDir("hh-stream")
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingTopK.start(in.toDF().toDF("doc_id", "text"), store,
      tmpDir("hh-ckpt"), k = 4)
    try {
      in.addData((1L, "m m m n"), (2L, "m o"))
      q.processAllAvailable()
      in.addData((3L, "n n n n p"))
      q.processAllAvailable()
    } finally q.stop()
    val board = StreamingTopK.mergedTopK(spark, store, k = 4).collect()
    val byTok = board.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTok.contains("m") && byTok.contains("n"))
    assert(byTok("m") <= 4L && byTok("n") <= 5L) // lower bounds never exceed truth
  }
}
