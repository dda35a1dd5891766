package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.{JoinOps, LayoutOps, SimilarityOps}

/** Round-7 operator surface: document chunking, int8 embedding
  * quantization, Bloom-pruned semi-join, z-order layout keys.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunking tiles every document: stride starts, bounded sizes, stable hashes") {
    val chunks = TextOps.chunkDf(spark, sf0001, chunkTokens = 64, stride = 48).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet) // every doc chunked, none invented
    for ((id, cs) <- byDoc) {
      val n = docs(id).length
      val sorted = cs.sortBy(_.getInt(1))
      // chunk indexes are 0..k-1 with starts 0, 48, 96, ... covering n tokens
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices.toSeq)
      assert(sorted.size == (n - 1) / 48 + 1) // starts at 0, 48, ... <= n-1
      sorted.zipWithIndex.foreach { case (r, i) =>
        val start = i * 48
        val expectLen = math.min(64, n - start)
        assert(r.getInt(2) == expectLen, s"doc $id chunk $i")
        val slice = docs(id).slice(start, start + 64).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(r.getString(3) == md, s"doc $id chunk $i hash")
      }
    }
  }

  test("int8 quantization: codes in range, dequant error <= scale/2, zero-safe") {
    val rows = SimilarityOps.quantizeInt8(spark, sf0001).collect()
    assert(rows.length == 500)
    val orig = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect().toMap
    rows.foreach { r =>
      val (id, scale) = (r.getLong(0), r.getDouble(1))
      // codes are canonicalized to a comma-joined string for the oracle gate
      val q = r.getString(2).split(",").map(_.toInt).toSeq
      val v = orig(id).map(_.toDouble)
      assert(q.length == v.length)
      assert(q.forall(c => c >= -127 && c <= 127), s"vec $id code range")
      if (scale == 0.0) assert(q.forall(_ == 0))
      else v.zip(q).foreach { case (x, c) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-12, s"vec $id")
      }
      assert(r.getLong(3) == q.map(c => math.abs(c).toLong).sum)
    }
  }

  test("bloom-pruned semi-join == plain semi-join; bloom filter sits below the join") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val urgent = Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val pruned = JoinOps.bloomPrunedSemiJoin(li, "l_orderkey", urgent, "o_orderkey")
    val plain = li.join(urgent.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi")
    assert(pruned.count() == plain.count())
    assert(pruned.select(sum("l_orderkey")).head().getLong(0) ==
      plain.select(sum("l_orderkey")).head().getLong(0))
    // the Bloom predicate must be a pre-join Filter on the probe side
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("LeftSemi")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "bloom filter should appear below (after, in tree print) the semi-join")
  }

  test("bloom-pruned semi-join with an empty build side is empty, not an error") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val none = Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "no-such-priority").select("o_orderkey")
    assert(JoinOps.bloomPrunedSemiJoin(li, "l_orderkey", none, "o_orderkey").count() == 0)
  }

  test("nfc_normalize: composes decomposed sequences, ASCII untouched, SQL-reachable") {
    graft.catalyst.GraftExtensions.register(spark)
    import graft.catalyst.HashFunctions
    // all non-ASCII spelled as \u escapes: a tool that NFC-normalizes the
    // source file would otherwise silently reduce this test to ASCII identity
    val df = Seq(
      "e\u0301clair",   // decomposed e + COMBINING ACUTE -> e-acute
      "\u00e9clair",    // precomposed - already NFC
      "plain ascii",
      "A\u030a",        // A + COMBINING RING -> A-ring
      "").toDF("s").select(HashFunctions.nfc_normalize(col("s")).as("n"))
    val got = df.as[String].collect().toSeq
    assert(got == Seq("\u00e9clair", "\u00e9clair", "plain ascii", "\u00c5", ""))
    // null propagates, SQL text path agrees
    assert(Seq(Option.empty[String]).toDF("s")
      .select(HashFunctions.nfc_normalize(col("s"))).head().isNullAt(0))
    Seq("e\u0301").toDF("s").createOrReplaceTempView("nfc_docs")
    assert(spark.sql("SELECT nfc_normalize(s) FROM nfc_docs").head().getString(0) == "\u00e9")
    // wrong input type is an analysis error naming the function
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("x").select(HashFunctions.nfc_normalize(col("x"))).collect()
    }
    assert(e.getMessage.contains("nfc_normalize"), e.getMessage)
  }

  test("scd2 history: runs collapse, intervals tile, open interval is current") {
    import graft.operators.TimeSeriesOps
    val rows = TimeSeriesOps.scd2History(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
      .groupBy(_._1).map { case (u, es) =>
        u -> es.sortBy(e => (e._2.getTime, e._3)).map(_._4).toSeq
      }
    // every user with events has history — a plan regression that drops
    // whole users must fail here, not slip past the per-user checks
    assert(byUser.keySet == ev.keySet)
    for ((u, history) <- byUser) {
      val sorted = history.sortBy(_.getLong(1))
      // versions are 1..k
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq, s"user $u")
      // consecutive rows never share a type (otherwise they were one run)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(2) != b.getString(2), s"user $u")
        case _ =>
      }
      // schema: user_id(0), version(1), event_type(2), valid_from(3),
      // n_events(4), valid_to(5), is_current(6)
      // intervals tile: valid_to == next valid_from; only the last is open/current
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(5) == b.getTimestamp(3), s"user $u tiling")
        case _ =>
      }
      assert(sorted.init.forall(!_.getBoolean(6)) && sorted.last.getBoolean(6))
      // run-length encoding of the raw type sequence matches (type, count) runs
      val rle = ev(u).foldLeft(List.empty[(String, Long)]) {
        case ((t, c) :: rest, x) if t == x => (t, c + 1) :: rest
        case (acc, x) => (x, 1L) :: acc
      }.reverse
      assert(sorted.map(r => (r.getString(2), r.getLong(4))).toSeq == rle, s"user $u rle")
    }
  }

  test("z-order: spread-bits closed form, key bijective on a 32x32 grid, tiles local") {
    // spread(0xFFFF) = 0x55555555; spread(0) = 0
    val sp = Seq(0L, 0xFFFFL, 1L, 2L, 0x00FFL).toDF("v")
      .select(LayoutOps.spreadBits16(col("v")).as("s")).as[Long].collect()
    assert(sp.toSeq == Seq(0L, 0x55555555L, 1L, 4L, 0x5555L))
    // bijective on the grid: 1024 distinct keys for 1024 distinct (x, y)
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val keys = grid.select(LayoutOps.zkey(col("x"), col("y")).as("z"))
    assert(keys.distinct().count() == 1024)
    assert(keys.agg(max("z")).head().getLong(0) == 1023) // 32x32 fills 0..1023
    // layout query: every "file" tile spans <= 32 values in EACH dimension
    val stats = graft.operators.LayoutOps.zorderLayout(spark, sf0001).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 31, s"x span in bucket ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) <= 31, s"y span in bucket ${r.getLong(0)}")
    }
  }

  test("z-order key inverts exactly for random 16-bit pairs") {
    // software inverse: collect every even/odd bit back into its dimension
    def unspread(z: Long): Long = {
      var v = 0L
      var i = 0
      while (i < 16) { v |= ((z >> (2 * i)) & 1L) << i; i += 1 }
      v
    }
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = xs.toDF("x", "y")
      .select(col("x"), col("y"), LayoutOps.zkey(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(unspread(z) == x && unspread(z >> 1) == y, s"($x, $y) -> $z")
    }
  }

  test("incremental dedup: exact and near-dup collisions drop, fresh docs admitted") {
    import graft.operators.DedupOps
    // hand corpus: hist (even ids) and a new batch (odd ids) with one exact
    // dup, one whitespace-variant dup, one unique, and one short doc whose
    // min-shingle fingerprint is null (must be admitted, not dropped by the
    // null key)
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (1L, "alpha beta gamma delta epsilon"),   // exact dup of 0 -> dropped
      (3L, "one  two   three four five six"),   // ws-variant of 2 -> dropped (norm + shingles)
      (5L, "completely fresh document text here"), // admitted
      (7L, "hi")                                  // < 3 tokens: null min-shingle -> admitted
    ).toDF("doc_id", "text")
    val norm = regexp_replace(trim(col("text")), "\\s+", " ")
    val sh = graft.catalyst.HashFunctions.shingles3(TextOps.tokens(col("text")))
    val fps = docs.select(col("doc_id"), md5(norm).as("fp_exact"),
      array_min(transform(sh, x => md5(x))).as("fp_min_shingle"))
    val admitted = DedupOps.incrementalDedup(
      fps.filter(col("doc_id") % 2 === 1), fps.filter(col("doc_id") % 2 === 0))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(admitted == Seq(5L, 7L))
    // the oracle-gated query runs end to end on the real corpus
    val q = DedupOps.incrementalDedupQuery(spark, sf0001).collect()
    assert(q.nonEmpty && q.forall(_.getLong(0) % 2 == 1))
  }
}
