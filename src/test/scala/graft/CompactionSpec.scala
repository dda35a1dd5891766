package graft

import org.apache.spark.sql.functions._
import graft.ingest.TickerIngest

/** Warehouse small-files compaction: content-preserving rewrite, crash-window
  * repair, leftover cleanup.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val goodLine =
    "AVA-USDT,%d,0.6123,15.2,0.6125,100.0,0.6121,80.5,2024-03-14T12:34:56.123"

  private def ingestBatch(root: String, wh: String, name: String, n: Int): Unit = {
    val dir = new java.io.File(s"$root/2024-03-14"); dir.mkdirs()
    val path = s"$root/2024-03-14/$name"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (1 to n).map(i => goodLine.format(i)).mkString("\n").getBytes)
    TickerIngest.ingest(spark, Seq(path), wh)
  }

  private def partFiles(wh: String): Array[java.io.File] =
    Option(new java.io.File(s"$wh/file_date=2024-03-14").listFiles())
      .getOrElse(Array.empty).filter(f => f.isFile && f.getName.startsWith("part-"))

  private def contentKey(wh: String): Seq[Long] =
    TickerIngest.warehouse(spark, wh).select("sequence").as[Long].collect().sorted.toSeq

  test("compaction merges per-batch file sets, preserving content exactly") {
    val root = tmpDir("cmp-src")
    val wh = tmpDir("cmp-wh")
    (1 to 3).foreach(b => ingestBatch(root, wh, s"AVA-USDT_PST_2024-03-14_b$b", 50))
    val before = partFiles(wh).length
    assert(before >= 3, s"expected >=3 files from 3 commits, got $before")
    val key = contentKey(wh)
    val (nb, na) = TickerIngest.compactPartition(spark, wh,
      java.sql.Date.valueOf("2024-03-14"), targetRowsPerFile = 1000000L)
    assert(nb == before && na == 1)
    assert(partFiles(wh).length == 1)
    assert(contentKey(wh) == key) // byte-for-byte the same rows
    // single-file partitions are left alone (no churn)
    assert(TickerIngest.compactPartition(spark, wh,
      java.sql.Date.valueOf("2024-03-14")) == ((1, 1)))
  }

  test("concurrent commits and compactions on one partition lose nothing") {
    // The maintenanceLock contract, hammered: an ingest thread lands batch
    // after batch into the partition while a maintenance thread compacts it
    // over and over. Without the lock, a commit between the compaction's
    // snapshot and its dir swap would vanish with the .__old trash.
    val root = tmpDir("cmp3-src")
    val wh = tmpDir("cmp3-wh")
    val date = java.sql.Date.valueOf("2024-03-14")
    (1 to 4).foreach(b => ingestBatch(root, wh, s"AVA-USDT_PST_2024-03-14_b$b", 25))

    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ingester = new Thread(() =>
      try (5 to 12).foreach(b =>
        ingestBatch(root, wh, s"AVA-USDT_PST_2024-03-14_b$b", 25))
      catch { case t: Throwable => failures.add(t); () })
    val compactor = new Thread(() =>
      try (1 to 6).foreach { _ =>
        TickerIngest.compactPartition(spark, wh, date, targetRowsPerFile = 1000000L)
        Thread.sleep(30)
      }
      catch { case t: Throwable => failures.add(t); () })
    ingester.start(); compactor.start()
    ingester.join(120000); compactor.join(120000)
    assert(failures.isEmpty, s"thread failures: ${failures.toArray.mkString("; ")}")

    // no crash windows left behind, and a final compaction converges to 1 file
    assert(TickerIngest.recoverCompaction(spark, wh) == 0)
    TickerIngest.compactPartition(spark, wh, date, targetRowsPerFile = 1000000L)
    assert(partFiles(wh).length == 1)
    // every row of every batch survived, exactly once: batch b wrote
    // sequences 1..25 — 12 batches of the same 25-key set, 300 rows total
    val seqs = TickerIngest.warehouse(spark, wh).select("sequence").as[Long].collect()
    assert(seqs.length == 300, s"expected 300 rows, got ${seqs.length}")
    assert(seqs.groupBy(identity).forall(_._2.length == 12))
  }

  test("crash between the swap renames is repaired at startup; leftovers cleaned") {
    val root = tmpDir("cmp2-src")
    val wh = tmpDir("cmp2-wh")
    ingestBatch(root, wh, "AVA-USDT_PST_2024-03-14_x", 40)
    val key = contentKey(wh)
    val live = new java.io.File(s"$wh/file_date=2024-03-14")

    // crash window: live was renamed to .__old, the new dir never landed
    val oldDir = new java.io.File(live.getPath + ".__old")
    assert(live.renameTo(oldDir))
    assert(TickerIngest.recoverCompaction(spark, wh) == 1)
    assert(live.exists && !oldDir.exists)
    assert(contentKey(wh) == key) // nothing lost

    // completed compaction's unfinished trash delete: .__old beside live
    oldDir.mkdirs()
    java.nio.file.Files.write(new java.io.File(oldDir, "part-stale").toPath,
      "stale".getBytes)
    // and an abandoned half-written copy
    val newDir = new java.io.File(live.getPath + ".__new")
    newDir.mkdirs()
    assert(TickerIngest.recoverCompaction(spark, wh) == 0)
    assert(!oldDir.exists && !newDir.exists && live.exists)
    assert(contentKey(wh) == key)
  }
}
