package graft

import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.app.PipelineApp
import graft.ingest.TickerIngest
import graft.journal.TickerFileJournal
import graft.pipeline.Lifecycle
import graft.schema.FileStatus
import graft.streaming.{Discovery, StreamingDedup, StreamingQuantiles, StreamingTopK, StreamingVectorIndex}

/** The composed failure-injection run the per-component chaos specs imply
  * but never exercise together: one PipelineApp-shaped cycle across all
  * flows, killed mid-cycle with EVERY store parked in its worst crash
  * window at once — a claimed-and-staged-but-uncommitted ticker batch, a
  * warehouse partition, a fingerprint bucket AND a vector-index cell each
  * caught between DirSwap's two renames — then restarted through the
  * app's exact startup recovery sequence (`PipelineApp.runContinuous`
  * order) with exactly-once / no-loss invariants asserted store by store.
  * The point is composition: each recovery is individually spec'd
  * (LifecycleSpec, CompactionSpec, FingerprintStoreSpec,
  * StreamingVectorIndexSpec); this pins that running them TOGETHER, in
  * the app's order, over one shared warehouse root, restores a consistent
  * whole — no recovery step may depend on state another step hasn't
  * restored yet.
  */
class ChaosRunSpec extends SparkSpec {
  import spark.implicits._

  private val goodLine =
    "AVA-USDT,123456789,0.6123,15.2,0.6125,100.0,0.6121,80.5,2024-03-14T12:34:56.123"
  private val today = LocalDate.parse("2024-08-08")

  private def writeCsv(root: String, date: String, name: String,
      lines: Seq[String]): Unit = {
    new java.io.File(s"$root/$date").mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/$date/$name"),
      lines.mkString("\n").getBytes)
    ()
  }
  private def putJson(dir: String, name: String, lines: Seq[String]): Unit = {
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
      lines.mkString("\n").getBytes)
    ()
  }

  /** Park a live store dir in DirSwap's between-the-renames crash window:
    * live → `.__old`, live absent — the state recover() must restore.
    */
  private def parkMidSwap(dir: java.io.File): Unit = {
    assert(dir.isDirectory, s"cannot park non-existent $dir")
    assert(dir.renameTo(new java.io.File(dir.getPath + ".__old")))
  }

  test("chaos: crash mid-cycle across all flows; one restart restores every invariant") {
    val root = tmpDir("chaosRoot")
    val wh = tmpDir("chaosWh")
    val j = new TickerFileJournal(spark, tmpDir("chaosJournal"))
    val docsDir = s"$root/docs"
    val vecsDir = s"$root/vecs"
    // every stream checkpoints under the warehouse (the app's wiring), so
    // the restart resumes the SAME checkpoints the "killed" process left
    val trig = Trigger.ProcessingTime(0)

    // ---- healthy cycle 1: every flow lands real state ---------------------
    writeCsv(root, "2024-08-05", "AVA-USDT_PST_2024-08-05", Seq(goodLine, goodLine))
    writeCsv(root, "2024-08-06", "BTC-USDT_PST_2024-08-06", Seq(goodLine, "BAD,LINE"))
    assert(Discovery.catchUp(spark, j, root, today, ts("2024-08-08 09:00:00")) == 2)
    Lifecycle.advanceStatuses(j, today, ts("2024-08-08 09:01:00"))
    val rep1 = Lifecycle.processReady(spark, j, root, wh, ts("2024-08-08 09:02:00"))
    assert(rep1.finished == 2 && rep1.rows == 3 && rep1.corruptRows == 1)

    // flow 5: batch 1 admits {1, 2} (3 is a whitespace-variant dup of 1)
    putJson(docsDir, "b1.json", Seq(
      """{"doc_id":1,"text":"alpha beta"}""",
      """{"doc_id":2,"text":"gamma delta"}""",
      """{"doc_id":3,"text":"alpha  beta"}"""))
    locally {
      val q = PipelineApp.corpusAdmission(spark, docsDir, wh, 3, trig)
      try q.processAllAvailable() finally q.stop()
    }
    assert(StreamingDedup.corpus(spark, s"$wh/_corpus").count() == 2)
    // flow 7: batch 1 bootstraps the quantizer and indexes {1, 2, 3}
    putJson(vecsDir, "v1.json", Seq(
      """{"vec_id":1,"embedding":[1.0,0.0]}""",
      """{"vec_id":2,"embedding":[0.0,1.0]}""",
      """{"vec_id":3,"embedding":[0.9,0.1]}"""))
    locally {
      val q = PipelineApp.vectorIndexer(spark, vecsDir, wh, 3, trig)
      try q.processAllAvailable() finally q.stop()
    }
    // flows 8/9: one tracked batch each
    locally {
      val q = PipelineApp.heavyHitterTracker(spark, docsDir, wh, 3, trig)
      try q.processAllAvailable() finally q.stop()
    }
    locally {
      val q = PipelineApp.docLengthTracker(spark, docsDir, wh, 3, trig)
      try q.processAllAvailable() finally q.stop()
    }

    // ---- the crash: cycle 2 dies with every store mid-maneuver ------------
    // (a) a fresh ticker file is claimed and FULLY staged, never committed —
    // the worst point for a plain append (re-ingest would double the rows)
    writeCsv(root, "2024-08-07", "ETH-USDT_PST_2024-08-07", Seq(goodLine))
    assert(Discovery.catchUp(spark, j, root, today, ts("2024-08-08 10:00:00")) == 1)
    Lifecycle.advanceStatuses(j, today, ts("2024-08-08 10:01:00"))
    val claimed = j.claimReady(ts("2024-08-08 10:02:00"))
    assert(claimed.size == 1)
    TickerIngest.stage(spark, claimed.map { case (f, d) => s"$root/$d/$f" }, wh)
    // ...JVM "dies" here: StagedIngest dropped, no commit, claim wedged
    // (b) a warehouse-partition compaction killed between the two renames
    parkMidSwap(new java.io.File(s"$wh/file_date=2024-08-05"))
    // (c) a fingerprint bucket caught in the same window
    val fpBucket = new java.io.File(s"$wh/_fp_store").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("fp_prefix=")).head
    parkMidSwap(fpBucket)
    // (d) a vector-index cell too
    val vecCell = new java.io.File(s"$wh/_vec_index").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid=")).head
    parkMidSwap(vecCell)
    // (e) the outage doesn't stop producers: new drops land while down.
    // doc 4 is a CONTENT dup of doc 2 — its rejection must flow through
    // the fingerprint bucket being restored in (c)
    putJson(docsDir, "b2.json", Seq(
      """{"doc_id":4,"text":"gamma delta"}""",
      """{"doc_id":5,"text":"epsilon zeta"}"""))
    putJson(vecsDir, "v2.json", Seq("""{"vec_id":4,"embedding":[0.1,0.95]}"""))

    // pre-recovery: the parked partition's only copy sits in `.__old` (a
    // warehouse READ here would fail partition inference loudly — which is
    // why the app's startup order runs recovery before anything reads),
    // and the killed run's claim is wedged IN_PROGRESS
    assert(!new java.io.File(s"$wh/file_date=2024-08-05").exists)
    assert(new java.io.File(s"$wh/file_date=2024-08-05.__old").isDirectory)
    assert(j.byStatus(FileStatus.InProgress).count() == 1)

    // ---- restart: the app's startup sequence, in runContinuous order ------
    assert(Lifecycle.recoverOrphaned(j, ts("2024-08-08 10:10:00")) == 1)
    assert(TickerIngest.recoverCompaction(spark, wh) == 1)
    assert(graft.operators.FingerprintStore.recover(spark, s"$wh/_fp_store") == 1)
    assert(StreamingVectorIndex.recover(spark, s"$wh/_vec_index") == 1)

    // flows resume on their surviving checkpoints
    val rep2 = Lifecycle.processReady(spark, j, root, wh, ts("2024-08-08 10:11:00"))
    assert(rep2.claimed == 1 && rep2.finished == 1)
    locally {
      val q = PipelineApp.corpusAdmission(spark, docsDir, wh, 3, trig)
      try q.processAllAvailable() finally q.stop()
    }
    // flow 6 arms now (an admitted corpus exists) and scores a skewed drop
    putJson(docsDir, "b3.json",
      Seq("""{"doc_id":6,"text":"epsilon epsilon epsilon epsilon"}"""))
    locally {
      val q = PipelineApp.driftMonitor(spark, docsDir, wh, 3, trig)
        .getOrElse(fail("drift monitor must arm once a corpus exists"))
      try q.processAllAvailable() finally q.stop()
    }
    locally {
      val q = PipelineApp.vectorIndexer(spark, vecsDir, wh, 3, trig)
      try q.processAllAvailable() finally q.stop()
    }
    locally {
      val q = PipelineApp.heavyHitterTracker(spark, docsDir, wh, 3, trig)
      try q.processAllAvailable() finally q.stop()
    }
    locally {
      val q = PipelineApp.docLengthTracker(spark, docsDir, wh, 3, trig)
      try q.processAllAvailable() finally q.stop()
    }

    // ---- invariants, store by store ---------------------------------------
    // warehouse: exactly-once THROUGH the crash — 3 healthy rows + 1 from
    // the re-ingested orphan; the killed run's staged copy never surfaced,
    // and the restored partition lost nothing
    val whRows = TickerIngest.warehouse(spark, wh)
    assert(whRows.count() == 4, s"warehouse rows: ${whRows.count()}")
    assert(whRows.filter(col("file_date") === lit(dt("2024-08-05"))).count() == 2)
    assert(!new java.io.File(s"$wh/_staging").exists, "staging swept on commit")
    // journal: no wedged claims, every file accounted FINISHED (the bad
    // line was quarantined at ROW level, not file level)
    assert(j.byStatus(FileStatus.InProgress).count() == 0)
    assert(j.byStatus(FileStatus.Finished).count() == 3)
    // corpus: exactly-once admission through the restored fingerprint
    // store — {1, 2} pre-crash, {5} post-crash; 4 (dup content) rejected
    // by a bucket that was mid-swap when the process died
    val corpus = StreamingDedup.corpus(spark, s"$wh/_corpus")
    assert(corpus.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))
    // vector index: all four vectors exactly once, incl. the cell parked
    // mid-swap and the batch that arrived during the outage
    val idx = StreamingVectorIndex.indexed(spark, s"$wh/_vec_index")
    val ids = idx.select("vec_id").as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L, 4L), s"indexed: $ids")
    // drift: the skewed post-restart drop scored against the pre-crash
    // baseline — a positive PSI proves the reference survived the outage
    val drift = graft.streaming.StreamingDrift.driftLog(spark, s"$wh/_drift_log")
    assert(drift.count() >= 1)
    assert(drift.agg(max("psi")).first().getDouble(0) > 0.0)
    // heavy hitters: Misra–Gries certification holds across the crash —
    // "epsilon" truly occurred 5× (b2: 1, b3: 4); counter ≤ true ≤ counter+err
    val hh = StreamingTopK.mergedTopK(spark, s"$wh/_hh_store")
      .filter(col("token") === "epsilon").collect()
    assert(hh.length == 1, "epsilon must be tracked")
    val (cnt, err) = (hh.head.getLong(1), hh.head.getLong(2))
    assert(cnt <= 5L && cnt + err >= 5L, s"counter=$cnt err=$err true=5")
    // doc-length quantiles: 6 docs seen in total; the certified p50
    // interval must bracket the true median length (11 chars)
    val p50 = StreamingQuantiles.quantiles(spark, s"$wh/_len_store", Seq(0.5))
      .collect().head
    assert(p50.getLong(1) == 3L, s"rank ceil(0.5*6)=3, got ${p50.getLong(1)}")
    assert(p50.getLong(2) <= 11000000L && 11000000L <= p50.getLong(3),
      s"p50 interval [${p50.getLong(2)}, ${p50.getLong(3)}] must cover 11 chars")
  }

  // ---- seeded sweep: the composed run generalized over trajectories --------

  /** One sweep trajectory: WHERE in the ticker cycle the kill lands and
    * WHICH stores are parked in DirSwap's between-renames window when it
    * does (plus whether producers keep dropping during the outage). The
    * composed run above is the hand-picked worst case (kill after stage,
    * everything parked at once); the sweep covers the orderings it can't
    * — e.g. a kill BEFORE the claim with only the vector index mid-swap,
    * where a recovery step that implicitly depended on `recoverOrphaned`
    * having requeued something would break.
    */
  private case class Trajectory(seed: Int, killPoint: Int, parkWh: Boolean,
      parkFp: Boolean, parkVec: Boolean, drops: Boolean)

  private def trajectory(seed: Int): Trajectory = {
    val rnd = new scala.util.Random(seed)
    Trajectory(seed, rnd.nextInt(3), rnd.nextBoolean(), rnd.nextBoolean(),
      rnd.nextBoolean(), rnd.nextBoolean())
  }

  private def runTrajectory(t: Trajectory): Unit = {
    val clue = s"[trajectory $t] "
    val root = tmpDir(s"sweepRoot${t.seed}")
    val wh = tmpDir(s"sweepWh${t.seed}")
    val j = new TickerFileJournal(spark, tmpDir(s"sweepJournal${t.seed}"))
    val docsDir = s"$root/docs"
    val vecsDir = s"$root/vecs"
    val trig = Trigger.ProcessingTime(0)
    def admitCorpus(): Unit = locally {
      val q = PipelineApp.corpusAdmission(spark, docsDir, wh, 3, trig)
      try q.processAllAvailable() finally q.stop()
    }
    def indexVectors(): Unit = locally {
      val q = PipelineApp.vectorIndexer(spark, vecsDir, wh, 3, trig)
      try q.processAllAvailable() finally q.stop()
    }

    // ---- healthy cycle 1: the state the crash will park -------------------
    writeCsv(root, "2024-08-05", "AVA-USDT_PST_2024-08-05", Seq(goodLine))
    assert(Discovery.catchUp(spark, j, root, today, ts("2024-08-08 09:00:00")) == 1, clue)
    Lifecycle.advanceStatuses(j, today, ts("2024-08-08 09:01:00"))
    val rep1 = Lifecycle.processReady(spark, j, root, wh, ts("2024-08-08 09:02:00"))
    assert(rep1.finished == 1 && rep1.rows == 1, clue + rep1)
    putJson(docsDir, "b1.json", Seq(
      """{"doc_id":1,"text":"alpha beta"}""",
      """{"doc_id":2,"text":"gamma delta"}"""))
    admitCorpus()
    assert(StreamingDedup.corpus(spark, s"$wh/_corpus").count() == 2, clue)
    if (t.parkVec) {
      putJson(vecsDir, "v1.json", Seq(
        """{"vec_id":1,"embedding":[1.0,0.0]}""",
        """{"vec_id":2,"embedding":[0.0,1.0]}""",
        """{"vec_id":3,"embedding":[0.9,0.1]}"""))
      indexVectors()
    }

    // ---- the crash: cycle 2 dies at killPoint with stores parked ----------
    writeCsv(root, "2024-08-06", "BTC-USDT_PST_2024-08-06", Seq(goodLine))
    assert(Discovery.catchUp(spark, j, root, today, ts("2024-08-08 10:00:00")) == 1, clue)
    Lifecycle.advanceStatuses(j, today, ts("2024-08-08 10:01:00"))
    if (t.killPoint >= 1) {
      val claimed = j.claimReady(ts("2024-08-08 10:02:00"))
      assert(claimed.size == 1, clue + claimed)
      if (t.killPoint == 2)
        TickerIngest.stage(spark, claimed.map { case (f, d) => s"$root/$d/$f" }, wh)
    }
    // ...JVM "dies" here; park the chosen stores in the crash window
    if (t.parkWh) parkMidSwap(new java.io.File(s"$wh/file_date=2024-08-05"))
    if (t.parkFp) parkMidSwap(new java.io.File(s"$wh/_fp_store").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("fp_prefix=")).head)
    if (t.parkVec) parkMidSwap(new java.io.File(s"$wh/_vec_index").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid=")).head)
    if (t.drops) {
      // producers don't stop for the outage; doc 4 is a content dup of
      // doc 2 and must be rejected through whatever fingerprint state the
      // restart restores (parked or not)
      putJson(docsDir, "b2.json", Seq(
        """{"doc_id":4,"text":"gamma delta"}""",
        """{"doc_id":5,"text":"epsilon zeta"}"""))
      if (t.parkVec)
        putJson(vecsDir, "v2.json", Seq("""{"vec_id":4,"embedding":[0.1,0.95]}"""))
    }

    // ---- restart, in PipelineApp.runContinuous order -----------------------
    assert(Lifecycle.recoverOrphaned(j, ts("2024-08-08 10:10:00")) ==
      (if (t.killPoint >= 1) 1 else 0), clue + "orphan requeue count")
    assert(TickerIngest.recoverCompaction(spark, wh) ==
      (if (t.parkWh) 1 else 0), clue + "warehouse partition recovery count")
    assert(graft.operators.FingerprintStore.recover(spark, s"$wh/_fp_store") ==
      (if (t.parkFp) 1 else 0), clue + "fingerprint bucket recovery count")
    if (t.parkVec)
      assert(StreamingVectorIndex.recover(spark, s"$wh/_vec_index") == 1,
        clue + "vector cell recovery count")
    val rep2 = Lifecycle.processReady(spark, j, root, wh, ts("2024-08-08 10:11:00"))
    assert(rep2.claimed == 1 && rep2.finished == 1, clue + rep2)
    admitCorpus()
    if (t.parkVec) indexVectors()

    // ---- invariants, store by store ----------------------------------------
    val whRows = TickerIngest.warehouse(spark, wh)
    assert(whRows.count() == 2, clue + s"warehouse rows: ${whRows.count()}")
    assert(whRows.filter(col("file_date") === lit(dt("2024-08-05"))).count() == 1,
      clue + "the (possibly parked) partition must lose nothing")
    assert(!new java.io.File(s"$wh/_staging").exists, clue + "staging swept")
    assert(j.byStatus(FileStatus.InProgress).count() == 0, clue + "no wedged claims")
    assert(j.byStatus(FileStatus.Finished).count() == 2, clue)
    val corpusIds = StreamingDedup.corpus(spark, s"$wh/_corpus")
      .select("doc_id").as[Long].collect().toSet
    val expect = Set(1L, 2L) ++ (if (t.drops) Set(5L) else Set.empty[Long])
    assert(corpusIds == expect, clue + s"corpus: $corpusIds != $expect")
    if (t.parkVec) {
      val ids = StreamingVectorIndex.indexed(spark, s"$wh/_vec_index")
        .select("vec_id").as[Long].collect().toSeq.sorted
      val want = if (t.drops) Seq(1L, 2L, 3L, 4L) else Seq(1L, 2L, 3L)
      assert(ids == want, clue + s"indexed: $ids != $want")
    }
  }

  test("chaos sweep: 10 seeded trajectories (kill point x parked stores) all recover") {
    // 8 seeded draws over the (3 kill points x 2^4 park/drop subsets)
    // space plus the two pinned corners the draws may miss: the everything
    // corner (kill after stage, all stores parked, producers dropping) and
    // the nothing corner (kill before the claim, nothing parked — the
    // recovery steps must all be clean no-ops). Fixed seeds: a failure
    // reproduces exactly, and the clue names the trajectory.
    val corners = Seq(
      Trajectory(-1, killPoint = 2, parkWh = true, parkFp = true,
        parkVec = true, drops = true),
      Trajectory(-2, killPoint = 0, parkWh = false, parkFp = false,
        parkVec = false, drops = false))
    (corners ++ (1 to 8).map(trajectory)).foreach(runTrajectory)
  }
}
