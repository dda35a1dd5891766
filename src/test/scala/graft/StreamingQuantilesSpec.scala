package graft

import graft.streaming.StreamingQuantiles

/** Streaming grid-histogram quantiles: certified intervals, exact merge,
  * fold-to-bound, replay idempotence, fresh-store emptiness.
  */
class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def toBatch(vs: Seq[Double]) = vs.toDF("v")

  private def board(store: String, qs: Seq[Double]): Seq[(Double, Long, Long, Long)] =
    StreamingQuantiles.quantiles(spark, store, qs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("certified intervals contain the true quantiles; merge across batches is exact") {
    val store = tmpDir("sq-basic")
    val b0 = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val b1 = Seq(6.0, 7.0, 8.0, 9.0, 10.0)
    StreamingQuantiles.processBatch(toBatch(b0), "v", 0L, store)
    StreamingQuantiles.processBatch(toBatch(b1), "v", 1L, store)
    val all = (b0 ++ b1).sorted
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    board(store, qs).foreach { case (q, rank, lo, hi) =>
      assert(rank == math.max(1L, math.ceil(q * all.length).toLong))
      val truthMicro = math.round(all((rank - 1).toInt) * 1e6)
      assert(lo <= truthMicro && truthMicro <= hi,
        s"q=$q truth=$truthMicro outside [$lo, $hi]")
    }
  }

  test("fold preserves the board exactly and bounds the store") {
    val store = tmpDir("sq-fold")
    (0 to 4).foreach { i =>
      StreamingQuantiles.processBatch(
        toBatch(Seq(i * 1.0, i * 1.0 + 0.5, 42.0)), "v", i.toLong, store)
    }
    val qs = Seq(0.25, 0.5, 0.75, 1.0)
    val before = board(store, qs)
    val (folded, upto) = StreamingQuantiles.compact(spark, store)
    assert(folded == 5 && upto == 4L)
    assert(board(store, qs) == before, "fold must not change any answer")
    // no batch dirs survive; new batches merge on top of the fold
    assert(new java.io.File(s"$store/summaries").listFiles()
      .count(_.getName.startsWith("batch_id=")) == 0)
    StreamingQuantiles.processBatch(toBatch(Seq(100.0)), "v", 5L, store)
    val after = board(store, Seq(1.0))
    assert(after.head._3 <= 100000000L && 100000000L <= after.head._4,
      "the new max must be visible after the fold")
  }

  test("replayed folded batches are ignored; crash window recovers") {
    val store = tmpDir("sq-replay")
    StreamingQuantiles.processBatch(toBatch(Seq(1.0, 2.0, 3.0)), "v", 0L, store)
    StreamingQuantiles.compact(spark, store)
    val before = board(store, Seq(0.5))
    // checkpoint replay of the folded batch id
    StreamingQuantiles.processBatch(toBatch(Seq(1.0, 2.0, 3.0)), "v", 0L, store)
    assert(board(store, Seq(0.5)) == before)
    // crash between the two swap renames
    val (fs, live) = graft.ingest.HadoopFs.forPath(spark, s"$store/folded")
    val trash = new org.apache.hadoop.fs.Path(s"$store/.folded_old")
    assert(fs.rename(live, trash))
    assert(board(store, Seq(0.5)) == before, "recovery must restore the fold")
  }

  test("fresh store reads as an empty board; streaming wiring lands batches") {
    assert(board(tmpDir("sq-fresh"), Seq(0.5)).isEmpty)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val store = tmpDir("sq-stream")
    val in = MemoryStream[Double]
    val q = StreamingQuantiles.start(in.toDF().toDF("v"), "v", store,
      tmpDir("sq-ckpt"))
    try {
      in.addData(1.0, 2.0, 3.0, 4.0)
      q.processAllAvailable()
      in.addData(5.0, 6.0)
      q.processAllAvailable()
    } finally q.stop()
    val med = board(store, Seq(0.5)).head
    assert(med._2 == 3L) // rank ceil(0.5*6)
    val truthMicro = 3000000L
    assert(med._3 <= truthMicro && truthMicro <= med._4)
  }
}
