package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.FingerprintStore

/** The bucketed incremental-dedup history at (small-machine) scale: a
  * million historical fingerprints, a targeted probe batch, and the
  * assertion that the anti-join's store scan is PARTITION-PRUNED to the
  * probe's own hash prefixes — the property that keeps the most-frequent
  * production operation (daily admit / targeted recheck) from rescanning
  * the whole history.
  */
class FingerprintStoreSpec extends SparkSpec {
  import spark.implicits._

  test("1M-fingerprint store: probe prunes to its prefix partitions, dups dropped") {
    val dir = tmpDir("fpstore")
    FingerprintStore.append(
      spark.range(1000000).select(md5(col("id").cast("string")).as("fp_exact")),
      "fp_exact", dir)
    // all 256 hive buckets exist on disk
    val buckets = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .count(_.getName.startsWith(FingerprintStore.PrefixCol + "="))
    assert(buckets == 256)

    // targeted probe: known dups (fps of history ids) + genuinely fresh
    // fps, restricted to 4 of the 256 prefixes (the "recheck one shard"
    // shape). doc_id ranges mark provenance.
    val pset = Seq("00", "01", "02", "03")
    val dups = spark.range(0, 5000)
      .select((col("id") + 10000000L).as("doc_id"), md5(col("id").cast("string")).as("fp_exact"))
    val fresh = spark.range(1000000, 1005000)
      .select((col("id") + 20000000L).as("doc_id"), md5(col("id").cast("string")).as("fp_exact"))
    val probe = dups.union(fresh)
      .filter(substring(col("fp_exact"), 1, 2).isin(pset: _*))
      .localCheckpoint(true)
    val nFresh = probe.filter(col("doc_id") >= 20000000L).count()
    assert(nFresh > 0 && probe.count() > nFresh) // both kinds present

    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // traversable plan
    try {
      val admitted = FingerprintStore.admit(spark, probe, "fp_exact", dir)
      val got = admitted.collect()
      // every fresh row admitted, every dup dropped
      assert(got.length.toLong == nFresh)
      assert(got.forall(_.getAs[Long]("doc_id") >= 20000000L))

      // the store scan read exactly the probe's 4 prefix partitions
      val scans = admitted.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("fpstore")) => f
      }
      assert(scans.nonEmpty, admitted.queryExecution.executedPlan.toString)
      val scan = scans.head
      assert(scan.partitionFilters.nonEmpty, scan.toString)
      val partsRead = scan.metrics.get("numPartitions").map(_.value)
      assert(partsRead.contains(4L),
        s"expected 4 of 256 partitions read, got $partsRead")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("bucket compaction: N appends collapse to 1 file per bucket, admit unchanged") {
    val dir = tmpDir("fpcompact")
    // 5 daily batches: each appends one file per touched bucket
    for (day <- 0 until 5)
      FingerprintStore.append(
        spark.range(day * 2000, (day + 1) * 2000)
          .select(md5(col("id").cast("string")).as("fp_exact")),
        "fp_exact", dir)
    val frag = FingerprintStore.fragmentedBuckets(spark, dir, threshold = 3)
    assert(frag.nonEmpty, "5 appends should fragment buckets past 3 files")

    val probe = spark.range(9000, 11000) // half dup (9000-9999), half fresh
      .select(col("id").as("doc_id"), md5(col("id").cast("string")).as("fp_exact"))
      .localCheckpoint(true)
    val beforeAdmit = FingerprintStore.admit(spark, probe, "fp_exact", dir)
      .select("doc_id").as[Long].collect().sorted.toSeq

    val (nBuckets, filesBefore, filesAfter) = FingerprintStore.compact(spark, dir, threshold = 3)
    assert(nBuckets == frag.size && filesAfter == nBuckets && filesBefore > filesAfter,
      s"($nBuckets, $filesBefore, $filesAfter)")
    assert(FingerprintStore.fragmentedBuckets(spark, dir, threshold = 3).isEmpty)

    val afterAdmit = FingerprintStore.admit(spark, probe, "fp_exact", dir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(afterAdmit == beforeAdmit, "compaction must not change admit results")
    assert(afterAdmit == (10000L until 11000L).toSeq)
  }

  test("compaction crash windows: recover restores orphaned buckets, drops trash") {
    val dir = tmpDir("fprecover")
    FingerprintStore.append(
      spark.range(0, 500).select(md5(col("id").cast("string")).as("fp_exact")),
      "fp_exact", dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val buckets = fs.listStatus(root)
      .filter(_.getPath.getName.startsWith(FingerprintStore.PrefixCol + "="))
    assert(buckets.length >= 3)
    val total = spark.read.parquet(dir).count()

    // crash between the two swap renames: live gone, .__old holds the data
    val b0 = buckets(0).getPath
    require(fs.rename(b0, b0.suffix(".__old")))
    // crash mid-build: .__new incomplete beside an intact live dir
    val b1 = buckets(1).getPath
    fs.mkdirs(b1.suffix(".__new"))
    // finished swap, unfinished trash delete: .__old beside an intact live
    val b2 = buckets(2).getPath
    fs.mkdirs(b2.suffix(".__old"))

    assert(FingerprintStore.recover(spark, dir) == 1) // only b0 needed restoring
    val names = fs.listStatus(root).map(_.getPath.getName).toSet
    assert(names.contains(b0.getName) && !names.exists(_.contains(".__")), names)
    assert(spark.read.parquet(dir).count() == total, "no fingerprint lost")
  }
}
