package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MultimodalOps, SimilarityOps}
import graft.functions.TextOps
import graft.streaming.{LogAppenderBridge, LogSink}
import graft.schema.LogRecord

/** Invariant specs for the training-data operators at sf0.001 (the oracle
  * hash-compare is the driver's job; these assert semantic invariants the
  * hash can't express).
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup: no planted exact dups → every group has count 1") {
    val d = DedupOps.exactDedup(spark, sf0001)
    assert(d.count() == 500)
    assert(d.filter(col("dup_count") > 1).count() == 0)
  }

  test("ngram jaccard: symmetric-free (a<b), all >= threshold, finds planted near-dups") {
    val p = DedupOps.ngramJaccardPairs(spark, sf0001, 0.8).collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0)
    }
  }

  test("minhash LSH candidates superset-match high-jaccard pairs") {
    val exact = DedupOps.ngramJaccardPairs(spark, sf0001, 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.minhashLshPairs(spark, sf0001)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // banded minhash at j>=0.9: P(miss) = (1-s^2)^4 ≈ 0.0005 at s=0.9 — all planted pairs found
    val recall = exact.intersect(lsh).size.toDouble / math.max(exact.size, 1)
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} exact pairs")
  }

  test("simhash: 32-bit range; near-dup pairs have close hashes") {
    val sh = DedupOps.simhash(spark, sf0001)
    assert(sh.count() == 500)
    sh.select("simhash").as[Long].collect().foreach(h =>
      assert(h >= 0 && h < (1L << 32)))
    val pairs = DedupOps.simhashPairs(spark, sf0001, 6)
    assert(pairs.count() > 0) // planted near-dups collide
  }

  test("ann brute force: top-k per query, self excluded, scores sorted") {
    val r = SimilarityOps.annBruteForce(spark, sf0001).collect()
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.size == SimilarityOps.NumQueries)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == SimilarityOps.TopK)
      assert(rows.forall(_.getLong(2) != q))
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ann LSH: results are a subset-quality approximation of brute force") {
    val brute = SimilarityOps.annBruteForce(spark, sf0001)
      .filter(col("rnk") === 1).select("q_id", "c_id").as[(Long, Long)].collect().toMap
    val lsh = SimilarityOps.annLsh(spark, sf0001).collect()
    // every LSH hit shares the query's bucket by construction; sanity: scores valid
    lsh.foreach(r => assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0))
    assert(lsh.nonEmpty)
  }

  test("language id: totals consistent; quality ratios in [0,1]") {
    val l = TextOps.langIdDf(spark, sf0001)
    assert(l.count() == 500)
    val q = TextOps.qualityDf(spark, sf0001).collect()
    q.foreach { r =>
      assert(r.getDouble(r.fieldIndex("punct_ratio")) >= 0.0)
      assert(r.getDouble(r.fieldIndex("punct_ratio")) <= 1.0)
      assert(r.getDouble(r.fieldIndex("stop_ratio")) >= 0.0)
      assert(r.getDouble(r.fieldIndex("stop_ratio")) <= 1.0)
    }
  }

  test("multimodal: mapPartitions metadata extraction is deterministic and typed") {
    val m1 = MultimodalOps.extractMeta(spark, sf0001).collect().sortBy(_.doc_id)
    val m2 = MultimodalOps.extractMeta(spark, sf0001).collect().sortBy(_.doc_id)
    assert(m1.toSeq == m2.toSeq)
    assert(m1.length == 500)
    m1.foreach { m =>
      assert(m.byte_len > 0 && m.width >= 64 && m.height >= 64 && m.n_frames >= 1)
      assert(m.content_hash.length == 32)
    }
    val frames = MultimodalOps.sampleFrames(spark, sf0001, stride = 8).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.doc_id).foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).distinct.length == fs.length)
    }
  }

  test("multimodal: real PNG decode recovers generated dims and raster exactly") {
    // corpus blobs are genuine PNGs (magic bytes), not passthrough buffers
    val sample = MultimodalOps.pngCorpus(spark, sf0001).take(5)
    sample.foreach { case (_, blob) =>
      assert(blob.length > 8)
      assert((blob(0) & 0xff) == 0x89 && blob(1) == 'P' && blob(2) == 'N' && blob(3) == 'G',
        "blob is not a PNG")
    }
    val decoded = MultimodalOps.decodeImages(spark, sf0001).collect().sortBy(_.doc_id)
    assert(decoded.length == 500)
    decoded.foreach { d =>
      val (w, h) = MultimodalOps.dims(d.doc_id)
      assert(d.width == w && d.height == h, s"doc ${d.doc_id}: ${d.width}x${d.height} != ${w}x$h")
      // closed-form checksum replay — equal only if the decoded raster is
      // bit-identical to the generated pixels (PNG is lossless)
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w)
        expect += MultimodalOps.gray(d.doc_id, x, y).toLong * (1 + x + w * y)
      assert(d.px_checksum == expect, s"doc ${d.doc_id} checksum")
    }
  }

  test("aHash banded blocking is LOSSLESS at the threshold (pigeonhole)") {
    // 4 bands over 64 bits: any pair at Hamming ≤ 3 shares an intact band,
    // so band-equality candidates must contain EVERY brute-force pair at
    // the ≤ 2 operating threshold — verified against an all-pairs sweep of
    // the collected signatures (driver-side: 500 rows of 4 longs)
    val sigs = MultimodalOps.ahashBands(spark, sf0001).collect()
      .map(r => (r.getLong(0), Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .sortBy(_._1)
    assert(sigs.length == 500)
    val brute = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      d = (0 until 4).map(k =>
        java.lang.Long.bitCount(sigs(i)._2(k) ^ sigs(j)._2(k))).sum
      if d <= MultimodalOps.AHashMaxHamming
    } yield (sigs(i)._1, sigs(j)._1, d.toLong)).toSet
    val banded = MultimodalOps.ahashNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banded ${banded.size} pairs != brute ${brute.size}")
    assert(brute.nonEmpty, "corpus should contain at least one near-dup pair")
  }

  test("log sink: enqueued records land in the parquet table") {
    val sink = new LogSink(spark)
    val out = tmpDir("logs")
    sink.enqueue(
      LogRecord(ts("2024-08-08 10:00:00"), "INFO", "main", "compressed",
        Map("data_size" -> "1048576", "compression_rate" -> "12.50"), None, None),
      LogRecord(ts("2024-08-08 10:00:01"), "ERROR", "worker", "boom",
        Map.empty, Some("java.io.IOException"), Some("pipe closed")))
    val q = sink.start(out, tmpDir("logckpt"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 2)
    assert(got.filter(col("severity") === "ERROR").select("exception_class")
      .as[String].head() == "java.io.IOException")
    val js = sink.asJson(got).as[String].collect().mkString
    assert(js.contains("compression_rate"))
  }

  test("log appender bridge: real log4j2 events land in tickers_logs with layout fields") {
    import org.apache.logging.log4j.{LogManager, ThreadContext}
    val sink = new LogSink(spark)
    val appender = LogAppenderBridge.install(sink, "graft.testbridge")
    try {
      // emit through the REAL logging runtime, not sink.enqueue
      ThreadContext.put("flow", "discovery")
      val logger = LogManager.getLogger("graft.testbridge.inner")
      logger.warn("disk almost full")
      logger.error("ingest failed", new java.io.IOException("pipe closed"))
      ThreadContext.clearAll()
      val out = tmpDir("logbridge")
      val q = sink.start(out, tmpDir("logbridgeckpt"),
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      try q.processAllAvailable() finally q.stop()
      val got = spark.read.parquet(out)
      assert(got.count() == 2)
      val warn = got.filter(col("severity") === "WARN").collect()(0)
      assert(warn.getAs[String]("message") == "disk almost full")
      assert(warn.getAs[String]("thread").nonEmpty)
      assert(warn.getAs[Map[String, String]]("mdc_fields") == Map("flow" -> "discovery"))
      val err = got.filter(col("severity") === "ERROR").collect()(0)
      assert(err.getAs[String]("exception_class") == "java.io.IOException")
      assert(err.getAs[String]("exception_message") == "pipe closed")
      assert(err.getAs[Map[String, String]]("mdc_fields") == Map("flow" -> "discovery"))
    } finally LogAppenderBridge.uninstall(appender, "graft.testbridge")
  }

  test("approx sketches: HLL distinct within 5% of exact, quantile sketch near exact median") {
    val li = Tables.lineitem(spark, sf0001)
    val exactParts = li.select("l_partkey").distinct().count()
    val apx = li.agg(approx_count_distinct(col("l_partkey"))).as[Long].head()
    assert(math.abs(apx - exactParts).toDouble / exactParts <= 0.05,
      s"HLL $apx vs exact $exactParts")
    val apxMed = li.agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    val qs = li.stat.approxQuantile("l_quantity", Array(0.4, 0.6), 0.001)
    assert(apxMed >= qs(0) && apxMed <= qs(1), s"median sketch $apxMed outside [${qs(0)}, ${qs(1)}]")
    // the oracled query's in-band booleans hold and carry the exact values
    val row = graft.queries.PipelineQueries.approxSketches(spark, sf0001).collect()(0)
    assert(row.getAs[Boolean]("parts_ok") && row.getAs[Boolean]("median_ok"))
    assert(row.getAs[Long]("exact_parts") == exactParts)
  }

  test("kmeans: partitions the corpus, deterministic, assignment improves over seeding") {
    val out = SimilarityOps.kmeans(spark, sf0001).collect()
    assert(out.length == SimilarityOps.KmeansK)
    assert(out.map(_.getLong(1)).sum == 500) // every vector assigned exactly once
    assert(out.map(_.getInt(0)).toSeq == (0 until SimilarityOps.KmeansK))
    // pure function of the input: a second run is identical
    val again = SimilarityOps.kmeans(spark, sf0001).collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq ==
      again.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq)
    // Lloyd iterations should spread mass off the seed clusters: no cluster
    // holds everything (seeds are 4 arbitrary vectors, data has >=4 labels)
    assert(out.map(_.getLong(1)).max < 500)
  }
}
