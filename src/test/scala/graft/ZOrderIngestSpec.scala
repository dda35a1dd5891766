package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ingest.TickerIngest

/** End-to-end proof that the z-ordered warehouse layout skips files.
  *
  * One synthetic day of ticks (64 tickers x uniform minutes) is ingested
  * twice: once date-only (the default layout) and once z-clustered
  * (`spark.graft.ingest.zorder=true`). For a two-dimension predicate
  * (one ticker AND a one-hour window) we then count the files whose
  * footer-level (min, max) of ticker/minute could contain matching rows —
  * exactly the decision a parquet reader's row-group statistics filter
  * makes. Date-only layout: every file is a candidate (uniform rows land
  * everywhere). Z-ordered: only the files whose tile intersects the
  * predicate's rectangle.
  */
class ZOrderIngestSpec extends SparkSpec {

  private def fileStats(wh: String): Array[Row] = {
    val m = hour(col("transactionTime")) * 60 + minute(col("transactionTime"))
    TickerIngest.warehouse(spark, wh)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("ticker").as("tmin"), max("ticker").as("tmax"),
        min(m).as("mmin"), max(m).as("mmax"))
      .collect()
  }

  // files a stats-driven reader must open for ticker = 'DD-USD' AND
  // minute in [600, 659]
  private def candidates(stats: Array[Row]): Int = stats.count { r =>
    r.getString(1) <= "DD-USD" && r.getString(2) >= "DD-USD" &&
      r.getInt(3) <= 659 && r.getInt(4) >= 600
  }

  test("z-clustered layout prunes files on a 2-D predicate; date-only layout cannot") {
    val root = tmpDir("zord-src")
    val rnd = new scala.util.Random(42)
    val names = (for (a <- 'A' to 'H'; b <- 'A' to 'H') yield s"$a$b-USD").toIndexedSeq
    val lines = (1 to 32000).map { i =>
      val t = names(rnd.nextInt(names.length))
      val minute = rnd.nextInt(1440)
      val ts = f"2024-03-14 ${minute / 60}%02d:${minute % 60}%02d:00"
      s"$t,$i,100.0,1.0,100.1,1.0,99.9,1.0,$ts"
    }
    val csv = new java.io.File(root, "MIX_PST_2024-03-14.csv")
    java.nio.file.Files.write(csv.toPath, lines.mkString("\n").getBytes("UTF-8"))

    // date-only layout: split the CSV read small so the plain ingest also
    // produces many files — otherwise "all 1 of 1 files touched" would be a
    // trivial comparison rather than a fair one
    val maxPB = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (128 * 1024).toString)
    val whPlain = tmpDir("zord-whp")
    try TickerIngest.ingest(spark, Seq(csv.getAbsolutePath), whPlain)
    finally spark.conf.set("spark.sql.files.maxPartitionBytes", maxPB)

    val whZ = tmpDir("zord-whz")
    spark.conf.set("spark.graft.ingest.zorder", "true")
    spark.conf.set("spark.graft.ingest.zorder.partitions", "16")
    try TickerIngest.ingest(spark, Seq(csv.getAbsolutePath), whZ)
    finally {
      spark.conf.set("spark.graft.ingest.zorder", "false")
      spark.conf.unset("spark.graft.ingest.zorder.partitions")
    }

    // same rows landed in both layouts
    assert(TickerIngest.warehouse(spark, whZ).count() == 32000)
    assert(TickerIngest.warehouse(spark, whPlain).count() == 32000)

    val plain = fileStats(whPlain)
    val z = fileStats(whZ)
    assert(plain.length >= 8, s"plain layout produced only ${plain.length} files")
    assert(z.length >= 8, s"z layout produced only ${z.length} files")

    // uniform data: EVERY date-only file intersects the predicate
    assert(candidates(plain) == plain.length)
    // z-clustered: the predicate's (ticker-band x hour) rectangle touches
    // only a few tiles — at least two thirds of the files are skippable
    val zc = candidates(z)
    assert(zc <= z.length / 3,
      s"z layout: $zc of ${z.length} files are candidates — expected heavy pruning")
    // and the candidates really contain all matching rows (sanity: the
    // pruning decision is sound, not just small)
    val matches = TickerIngest.warehouse(spark, whZ)
      .withColumn("f", input_file_name())
      .filter(col("ticker") === "DD-USD" &&
        (hour(col("transactionTime")) * 60 + minute(col("transactionTime")))
          .between(600, 659))
    val candidateFiles = z.filter { r =>
      r.getString(1) <= "DD-USD" && r.getString(2) >= "DD-USD" &&
        r.getInt(3) <= 659 && r.getInt(4) >= 600
    }.map(_.getString(0)).toSet
    val touched = matches.select("f").distinct().collect().map(_.getString(0)).toSet
    assert(touched.nonEmpty && touched.subsetOf(candidateFiles))

    // ---- maintenance must not undo the layout: fragment the partition
    // with a second ingest cycle (two file sets), then compact with zorder
    // still configured — the rewrite re-sorts by the same key at the same
    // tile granularity, so pruning survives the merge
    spark.conf.set("spark.graft.ingest.zorder", "true")
    spark.conf.set("spark.graft.ingest.zorder.partitions", "16")
    val (nb, na) = try {
      TickerIngest.ingest(spark, Seq(csv.getAbsolutePath), whZ) // now 32 files
      graft.ingest.TickerIngest.compactPartition(spark, whZ,
        java.sql.Date.valueOf("2024-03-14"), targetRowsPerFile = 4000L)
    } finally {
      spark.conf.set("spark.graft.ingest.zorder", "false")
      spark.conf.unset("spark.graft.ingest.zorder.partitions")
    }
    assert(nb == 32 && na == 16, s"expected 32 -> 16 files, got $nb -> $na")
    assert(TickerIngest.warehouse(spark, whZ).count() == 64000) // content intact
    val zc2 = fileStats(whZ)
    assert(zc2.length == 16)
    // pruning survives the rewrite: still at most a third of files candidate
    assert(candidates(zc2) <= zc2.length / 3,
      s"compaction scrambled the layout: ${candidates(zc2)} of ${zc2.length} candidates")
  }

  test("hilbert curve mode clusters the warehouse identically well and survives compaction") {
    val root = tmpDir("hil-src")
    val rnd = new scala.util.Random(7)
    val names = (for (a <- 'A' to 'H'; b <- 'A' to 'H') yield s"$a$b-USD").toIndexedSeq
    val lines = (1 to 32000).map { i =>
      val t = names(rnd.nextInt(names.length))
      val minute = rnd.nextInt(1440)
      val ts = f"2024-03-14 ${minute / 60}%02d:${minute % 60}%02d:00"
      s"$t,$i,100.0,1.0,100.1,1.0,99.9,1.0,$ts"
    }
    val csv = new java.io.File(root, "MIX_PST_2024-03-14.csv")
    java.nio.file.Files.write(csv.toPath, lines.mkString("\n").getBytes("UTF-8"))

    val wh = tmpDir("hil-wh")
    spark.conf.set("spark.graft.ingest.zorder", "true")
    spark.conf.set("spark.graft.ingest.cluster.curve", "hilbert")
    spark.conf.set("spark.graft.ingest.zorder.partitions", "16")
    val (nb, na) = try {
      TickerIngest.ingest(spark, Seq(csv.getAbsolutePath), wh)
      val first = fileStats(wh)
      assert(first.length >= 8)
      assert(candidates(first) <= first.length / 3,
        s"hilbert layout: ${candidates(first)} of ${first.length} candidates")
      // fragment + compact under the SAME curve config: layout must survive
      TickerIngest.ingest(spark, Seq(csv.getAbsolutePath), wh)
      TickerIngest.compactPartition(spark, wh,
        java.sql.Date.valueOf("2024-03-14"), targetRowsPerFile = 4000L)
    } finally {
      spark.conf.set("spark.graft.ingest.zorder", "false")
      spark.conf.unset("spark.graft.ingest.cluster.curve")
      spark.conf.unset("spark.graft.ingest.zorder.partitions")
    }
    assert(nb == 32 && na == 16, s"expected 32 -> 16 files, got $nb -> $na")
    assert(TickerIngest.warehouse(spark, wh).count() == 64000)
    val after = fileStats(wh)
    assert(after.length == 16)
    assert(candidates(after) <= after.length / 3,
      s"compaction scrambled the hilbert layout: ${candidates(after)} of ${after.length}")
  }
}
