package graft

import org.apache.spark.sql.functions._
import graft.streaming.{StreamingQuantiles, StreamingTopK}

/** Round-12 hardening: the cleanup-cadence folds that keep the streaming
  * sketch stores bounded in a long-running app, and the LogSink shutdown
  * drain that makes "no record is lost" true at close.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def batchDirs(store: String, sub: String): Int =
    Option(new java.io.File(s"$store/$sub").listFiles())
      .map(_.count(f => f.isDirectory && f.getName.startsWith("batch_id=")))
      .getOrElse(0)

  test("cleanup-cadence folds keep both sketch stores' batch dirs bounded " +
      "across app cycles, and boards stay exact") {
    val hh = tmpDir("r12-hh")
    val len = tmpDir("r12-len")
    // Simulate the PipelineApp loop: each cleanup cycle a few micro-batches
    // have landed (flows 8/9), then the cleanup cadence folds both stores —
    // the in-stream foldEvery counter alone would let a slow drip
    // accumulate dirs for days. Dir counts must be bounded by the per-cycle
    // drip, never by stream age.
    var next = 0L
    for (cycle <- 0 until 5) {
      for (_ <- 0 until 3) {
        val id = next; next += 1
        StreamingTopK.processBatch(
          Seq((id, s"tok$cycle common")).toDF("doc_id", "text"), id, hh, k = 8)
        StreamingQuantiles.processBatch(
          Seq(id.toDouble).toDF("len"), "len", id, len)
      }
      StreamingTopK.compact(spark, hh, k = 8)
      StreamingQuantiles.compact(spark, len)
      assert(batchDirs(hh, "summaries") == 0 && batchDirs(hh, "meta") == 0,
        s"cycle $cycle: hh store must fold to zero batch dirs")
      assert(batchDirs(len, "summaries") == 0 && batchDirs(len, "meta") == 0,
        s"cycle $cycle: len store must fold to zero batch dirs")
    }
    // the merged board after 5 fold generations is still exact (vocab 6
    // ≤ k=8, so every MG count is lossless and err_bound is 0)
    val board = StreamingTopK.mergedTopK(spark, hh, k = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(board("common") == 15L, s"common=15 expected, got $board")
    (0 until 5).foreach(c => assert(board(s"tok$c") == 3L))
    // and the quantile board still certifies the true median's interval:
    // values were 0..14, true median (rank 8 of 15) = 7.0 = 7e6 micro
    val med = StreamingQuantiles.quantiles(spark, len, Seq(0.5)).collect()(0)
    assert(med.getLong(2) <= 7000000L && 7000000L <= med.getLong(3),
      s"median interval must contain 7e6 micro: $med")
  }

  test("log sink close() drains the buffered residue through a final " +
      "micro-batch before stopping the query") {
    // bufferSize 1000 + huge timeout: nothing can flush except close()
    val sink = new graft.streaming.LogSink(spark, bufferSize = 1000,
      flushTimeoutSec = 3600)
    val out = tmpDir("r12-logclose")
    val q = sink.start(out, tmpDir("r12-logclose-ckpt"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    sink.enqueue(graft.schema.LogRecord(
      ts("2024-08-08 10:00:00"), "INFO", "t", "shutdown residue",
      Map.empty, None, None))
    q.processAllAvailable() // residue is sub-buffer: still unwritten
    sink.close()            // flush -> final cycle -> stop, in that order
    assert(!q.isActive, "close() must stop the query")
    assert(spark.read.parquet(out).count() == 1L,
      "the residue buffered at shutdown must reach the table")
  }

  test("Kneser-Ney bigram xent matches the hand-computed model on a toy " +
      "corpus, and sub-2-token docs stay unscored") {
    // corpus: d1 = "a b a b", d2 = "a b c", d3 = "x" (unscorable)
    // cbg: (a,b)=3 (b,a)=1 (b,c)=1; left: a->(cl 3,n1l 1), b->(cl 2,n1l 2)
    // cont: a=1 b=1 c=1; n1tot=3; D=0.75
    // P(b|a) = (2.25 + .75*1*(1/3))/3 = 2.5/3   -> ln r6 = -0.182322
    // P(a|b) = (0.25 + .75*2*(1/3))/2 = 0.375   -> ln r6 = -0.980829
    // P(c|b) = same shape as P(a|b)             -> ln r6 = -0.980829
    // d1 xent = (2*0.182322 + 0.980829)/3 -> 0.4485
    // d2 xent = (0.182322 + 0.980829)/2   -> 0.5816
    val dir = tmpDir("r12-kn")
    Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = graft.queries.PipelineQueries.knBigram(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows(1L) == ((3L, Some(0.4485))), s"d1: ${rows(1L)}")
    assert(rows(2L) == ((2L, Some(0.5816))), s"d2: ${rows(2L)}")
    assert(rows(3L) == ((0L, None)), s"d3 must be unscored: ${rows(3L)}")
    // the KN-vs-add-1 divergence the operator exists to expose: the add-1
    // unconditional LM scores d1 and d2 with DIFFERENT xent too, but KN's
    // conditional model must agree with the hand model, not the add-1 one
    val add1 = graft.queries.PipelineQueries.bigramLm(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(add1(1L) != rows(1L)._2.map(identity),
      "KN and add-1 must not collapse to the same score on the toy corpus")
  }

  test("unigram-LM vocab costs and Viterbi encode match the hand-computed " +
      "model on a toy corpus; degenerate words are filtered structurally") {
    // corpus: d1 = "ab ab ab", d2 = "abc", d3 = whitespace-only,
    //         d4 = one 20-char word (over the UniMaxWordLen=16 cap)
    // substring freqs (len 1..4 over distinct words, weighted by count):
    //   a=4 b=4 c=1 ab=4 bc=1 abc=1  -> total = 15
    // cost_u(f) = round(1e6 * ln(15/f))
    val dir = tmpDir("r12-uni")
    Seq((1L, "ab ab ab"), (2L, "abc"), (3L, "   "), (4L, "a" * 20))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    def cu(f: Long): Long = Math.round(1e6 * Math.log(15.0 / f))
    val vocab = graft.operators.TokenizerOps.unigramVocab(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(vocab == Map(
      "a" -> ((4L, cu(4))), "b" -> ((4L, cu(4))), "c" -> ((1L, cu(1))),
      "ab" -> ((4L, cu(4))), "bc" -> ((1L, cu(1))), "abc" -> ((1L, cu(1)))),
      s"vocab: $vocab")
    // Viterbi: "ab" -> [ab] (1 piece, cost cu(4) beats [a,b] = 2*cu(4));
    // "abc" -> [abc] (cu(1) beats cu(4)+cu(1) for [ab,c]/[a,bc])
    def nats(totalU: Long): Double =
      BigDecimal(totalU / 1e6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val seg = graft.operators.TokenizerOps.unigramSegment(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(seg == Map(
      1L -> ((3L, 3L, nats(3 * cu(4)))),
      2L -> ((1L, 1L, nats(cu(1))))),
      s"whitespace-only and over-cap docs must vanish, rest exact: $seg")
  }

  test("WordPiece role-split vocab and greedy longest-match encode match the " +
      "hand model; greedy is longest-first, not fewest-pieces") {
    // corpus: d1 = "abcde abcde", d2 = "ab", d3 = whitespace-only,
    //         d4 = one 20-char word (over the cap) — words: abcde(2), ab(1)
    val dir = tmpDir("r12-wp")
    Seq((1L, "abcde abcde"), (2L, "ab"), (3L, "   "), (4L, "a" * 20))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val vocab = graft.operators.TokenizerOps.wordpieceVocab(spark, dir).collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // per-role substring counts weighted by word count (abcde×2, ab×1)
    assert(vocab == Map(
      ("a", false) -> 3L, ("ab", false) -> 3L, ("abc", false) -> 2L,
      ("abcd", false) -> 2L,
      ("b", true) -> 3L, ("bc", true) -> 2L, ("bcd", true) -> 2L,
      ("bcde", true) -> 2L, ("c", true) -> 2L, ("cd", true) -> 2L,
      ("cde", true) -> 2L, ("d", true) -> 2L, ("de", true) -> 2L,
      ("e", true) -> 2L), s"vocab: $vocab")
    // greedy on "abcde": longest initial piece "abcd" (maxPiece=4), then
    // cont "e" -> 2 pieces — NOT the 1-piece optimum a Viterbi would want
    // if "abcde" fit, and NOT [ab][cde] (fewest-lookups); "ab" -> whole
    val seg = graft.operators.TokenizerOps.wordpieceSegment(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(seg == Map(1L -> ((2L, 4L, 0L)), 2L -> ((1L, 1L, 1L))),
      s"whitespace-only and over-cap docs must vanish, rest exact: $seg")
  }

  test("UnigramSeg Viterbi equals brute-force min over ALL segmentations on " +
      "200 random vocab/word draws (packed cost-then-pieces order)") {
    val rnd = new scala.util.Random(12021)
    val chars = Array("a", "b", "c")
    for (_ <- 1 to 200) {
      val multis = Seq.fill(rnd.nextInt(7))(
        Seq.fill(2 + rnd.nextInt(3))(chars(rnd.nextInt(3))).mkString).distinct
      val pieces = (chars.toSeq ++ multis).distinct
      val vocab = new java.util.HashMap[String, java.lang.Long]
      pieces.foreach(p => vocab.put(p, 1L + rnd.nextInt(1000000).toLong))
      val word = Seq.fill(1 + rnd.nextInt(10))(chars(rnd.nextInt(3))).mkString
      val n = word.length
      // brute force: every cut mask; segment valid iff every piece is in
      // the vocab and <= maxPiece chars; value packs (cost, pieces)
      var best = Long.MaxValue
      for (mask <- 0 until (1 << (n - 1))) {
        var ok = true; var v = 0L; var start = 0
        for (pos <- 1 to n if ok) {
          if (pos == n || ((mask >> (pos - 1)) & 1) == 1) {
            val seg = word.substring(start, pos)
            val c = vocab.get(seg)
            if (seg.length > 4 || c == null) ok = false
            else { v += c.longValue() * 100L + 1L; start = pos }
          }
        }
        if (ok && v < best) best = v
      }
      val got = graft.catalyst.HashUtil.unigramSeg(
        org.apache.spark.unsafe.types.UTF8String.fromString(word), vocab, 4)
      assert(got != null && got.getInt(0) == (best % 100).toInt &&
        got.getLong(1) == best / 100,
        s"word=$word vocab=$pieces got=$got want np=${best % 100} cost=${best / 100}")
    }
  }

  test("WordPieceSeg greedy equals an independent recursive reference on " +
      "200 random role-split vocab/word draws") {
    val rnd = new scala.util.Random(31337)
    val chars = Array("a", "b", "c")
    def refGreedy(word: String, init: Set[String], cont: Set[String]): Int = {
      def go(rest: String, first: Boolean, acc: Int): Int =
        if (rest.isEmpty) acc
        else {
          val set = if (first) init else cont
          (math.min(4, rest.length) to 1 by -1)
            .find(l => set.contains(rest.take(l))) match {
            case Some(l) => go(rest.drop(l), first = false, acc + 1)
            case None    => -1
          }
        }
      go(word, first = true, 0)
    }
    for (_ <- 1 to 200) {
      def draw(): Seq[String] = (chars.toSeq ++ Seq.fill(rnd.nextInt(7))(
        Seq.fill(2 + rnd.nextInt(3))(chars(rnd.nextInt(3))).mkString)).distinct
      val init = draw(); val cont = draw()
      val is = new java.util.HashSet[String]; init.foreach(is.add)
      val cs = new java.util.HashSet[String]; cont.foreach(cs.add)
      val word = Seq.fill(1 + rnd.nextInt(12))(chars(rnd.nextInt(3))).mkString
      val want = refGreedy(word, init.toSet, cont.toSet)
      val got = graft.catalyst.HashUtil.wordpieceSeg(
        org.apache.spark.unsafe.types.UTF8String.fromString(word), is, cs, 4)
      assert(got == want, s"word=$word init=$init cont=$cont got=$got want=$want")
    }
  }

  test("temp-alloc sums exactly to K, label-outlier margins agree with " +
      "predictions, keep-longest canon picks the true cluster maximum") {
    // p_temp_alloc: largest-remainder allocation is exact by construction
    val alloc = graft.queries.PipelineQueries.tempAlloc(spark, sf0001).collect()
    assert(alloc.map(_.getLong(3)).sum == graft.queries.PipelineQueries.TempAllocK,
      "sum(n_alloc) must equal the budget exactly")
    assert(alloc.forall(_.getLong(3) >= 0L))
    // s_label_outliers: margin > 0 iff some other centroid is strictly
    // closer, which forces pred != label; margin <= 0 forces pred == label
    // (argmin ties break to the LOWEST label, and a tie at the own-label
    // distance can only lower the argmin to it or below)
    val lo = graft.operators.SimilarityOps.labelOutliers(spark, sf0001, k = 500)
      .collect()
    assert(lo.nonEmpty)
    lo.foreach { r =>
      val (lbl, pred, margin) = (r.getInt(1), r.getInt(2), r.getLong(3))
      if (margin > 0) assert(pred != lbl, s"margin>0 must flip the pred: $r")
      else assert(pred == lbl || margin == 0, s"margin<0 must keep the label: $r")
    }
    // d_canon_longest: the kept doc really is its cluster's (nc, -doc_id) max
    val cl = graft.operators.DedupPipeline
      .clusters(graft.operators.DedupOps.ngramJaccardPairs(spark, sf0001))
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("nc"))
    val byCluster = cl.join(docs, Seq("doc_id")).collect()
      .groupBy(_.getLong(1))
      .map { case (c, rs) =>
        c -> rs.map(r => (r.getLong(2), -r.getLong(0))).max }
    val canon = graft.operators.DedupPipeline.canonLongest(spark, sf0001).collect()
    assert(canon.nonEmpty)
    canon.foreach { r =>
      val (c, keep, nc) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(byCluster(c) == ((nc, -keep)), s"cluster $c: kept ($keep,$nc) " +
        s"but true max is ${byCluster(c)}")
    }
  }

  test("Adamic-Adar and HITS replay hand-computed models on a 3x3 bipartite " +
      "graph (integer micro-nat weights; unnormalized integer iterations)") {
    // incidence: c1-{s1,s2}, c2-{s1,s2,s3}, c3-{s3}
    val dir = tmpDir("r12-graph")
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 2L), (6L, 3L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L), (5L, 3L), (6L, 3L))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
    // AA wedges through c1 (deg 2, w=round(1e6/ln2)=1442695) and c2 (deg 3,
    // w=round(1e6/ln3)=910239); c3 is structurally wedge-free at deg 1
    val aa = graft.operators.GraphOps.adamicAdar(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toList
    assert(aa == List(("s1", "s2", 2L, 2352934L),
      ("s1", "s3", 1L, 910239L), ("s2", "s3", 1L, 910239L)), s"aa=$aa")
    // HITS hand iteration: a3 = (s1 48, s2 48, s3 36), h3 = (c1 96, c2 132,
    // c3 36); ppm vs side max with exact floor division
    val hits = graft.operators.GraphOps.hits(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
    assert(hits == List(
      ("auth", "s1", 1000000L), ("auth", "s2", 1000000L), ("auth", "s3", 750000L),
      ("hub", "c2", 1000000L), ("hub", "c1", 727272L), ("hub", "c3", 272727L)),
      s"hits=$hits")
  }

  test("Benjamini-Hochberg replays a hand family: uniform group accepted, " +
      "concentrated group rejected, kstar stops the step-up exactly") {
    // priority a: 9 orders spread 3/3/3 over date-mod-3 -> chi2 0, p_u 1e6
    // priority b: 8 orders all in bucket 0 -> chi2 16, p = exp(-8) -> 335
    val dir = tmpDir("r12-bh")
    val d0 = java.sql.Date.valueOf("1970-01-01")
    val d1 = java.sql.Date.valueOf("1970-01-02")
    val d2 = java.sql.Date.valueOf("1970-01-03")
    val rows = Seq.fill(3)(("a", d0)) ++ Seq.fill(3)(("a", d1)) ++
      Seq.fill(3)(("a", d2)) ++ Seq.fill(8)(("b", d0))
    rows.toDF("o_orderpriority", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    val got = graft.queries.AnalyticsQueries.bhFdr(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(got("a") == ((9L, 0.0, 1000000L, 2L, false)), s"a=${got("a")}")
    assert(got("b") == ((8L, 16.0, 335L, 1L, true)), s"b=${got("b")}")
  }

  test("TextRank replays the weighted update rule exactly on a hand-computed " +
      "3-node graph (nano-space integer scores)") {
    // corpus "a b", "b c", "a b" -> edges a-b w2, b-c w1; wdeg a=2 b=3 c=1
    // init 1e9; three synchronous rounds of
    //   WS(v) = round(0.15e9 + 0.85 * sum(round(WS(u) * w / wdeg(u))))
    // hand-rolled: r3 = b 1741625000, a 788916667, c 469458333
    val dir = tmpDir("r12-textrank")
    Seq((1L, "a b"), (2L, "b c"), (3L, "a b"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.queries.PipelineQueries.textrank(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == List(("b", 1741625000L), ("a", 788916667L), ("c", 469458333L)),
      s"got $got")
  }
}
