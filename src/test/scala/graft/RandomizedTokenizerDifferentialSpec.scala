package graft

import java.math.RoundingMode

import graft.operators.TokenizerOps

/** Randomized differential tests for the tokenizer trilogy — the
  * round-16 COVERAGE.md ledger's "nearest gap": seeded adversarial
  * corpora (merge-overlap runs like "aaaa", tie-rank pair frequencies,
  * words exactly ON and past the [[TokenizerOps.UniMaxWordLen]] cap,
  * greedy-vs-optimal WordPiece traps, corpora whose pair supply exhausts
  * before k merges, mixed-whitespace separators, null texts) run through
  * the PUBLIC train/encode queries and compared against independent
  * driver-side replays of each tokenizer's documented conventions:
  *
  *  - BPE: per-round pair frequencies weighted by word count, winner =
  *    (freq desc, l, r), greedy LEFT-TO-RIGHT NON-OVERLAPPING merge
  *    application ("a a a a" → "aa aa", never "aa a a"), early stop when
  *    pairs exhaust.
  *  - Unigram LM: occurrence-weighted substring frequencies, full
  *    single-char coverage + top-K multi (freq desc, piece), integer
  *    micro-nat costs `round(1e6·ln(total/freq))`, packed-long Viterbi
  *    min over (cost, pieces), the +50 floor-div half-up at the end.
  *  - WordPiece: role-split (word-initial vs continuation) vocabularies,
  *    greedy LONGEST-match scan — the documented convention even where a
  *    shorter first piece would yield fewer total pieces.
  *
  * The hand-computed toy models in Round9/12OpsSpec pin each algorithm
  * on one fixed example; these seeds cover the shapes those examples
  * and the driver corpus never produce.
  */
class RandomizedTokenizerDifferentialSpec extends SparkSpec {
  import spark.implicits._
  import TokenizerOps.{UniMaxPiece, UniMaxWordLen, UniVocabK, WpVocabK}

  // ---- shared conventions --------------------------------------------------

  /** Spark's `round(double)` at scale 0 / scale 4: HALF_UP. */
  private def hup0(d: Double): Long =
    java.math.BigDecimal.valueOf(d).setScale(0, RoundingMode.HALF_UP).longValue()
  private def hup4(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(4, RoundingMode.HALF_UP).doubleValue()

  private def dEq(a: Double, b: Double): Boolean =
    java.lang.Double.compare(a, b) == 0

  /** TextOps.tokens' convention: whitespace split of the trimmed text. */
  private def toks(text: String): Seq[String] = text.trim.split("\\s+").toSeq

  // ---- corpora -------------------------------------------------------------

  private case class Doc(id: Long, lang: String, text: Option[String])

  /** Seeded random corpus over a small alphabet, salted with every
    * adversarial shape: overlap runs, a maximal-cap word (length exactly
    * [[UniMaxWordLen]]), an over-cap word (BPE sees it, unigram/WordPiece
    * must EXCLUDE it), single-char words, mixed separators, a null text.
    */
  private def genDocs(seed: Int): Seq[Doc] = {
    val r = new scala.util.Random(seed * 6151 + 3)
    val alpha = "abcde"
    def word(): String = {
      val n = 1 + r.nextInt(8)
      (1 to n).map(_ => alpha(r.nextInt(alpha.length))).mkString
    }
    val seps = Seq(" ", "  ", "\t", " \n ")
    val bulk = (0 until (20 + r.nextInt(15))).map { i =>
      val ws = (1 to (4 + r.nextInt(10))).map(_ => word())
      Doc(i.toLong, Seq("en", "de", "fr")(r.nextInt(3)),
        Some(ws.mkString(seps(r.nextInt(seps.size)))))
    }
    val crafted = Seq(
      Doc(900L, "en", Some("aaaa aaaa aa aaa")),              // merge-overlap runs
      Doc(901L, "de", Some("a" * UniMaxWordLen)),              // exactly on the cap
      Doc(902L, "fr", Some("b" * (UniMaxWordLen + 1) + " cc")), // past the cap
      Doc(903L, "en", Some("q")),                              // singleton char, unique
      Doc(904L, "de", None),                                   // null text
      Doc(905L, "fr", Some("abcde abcd abc ab a de cde"))      // greedy-trap prefixes
    )
    r.shuffle(bulk ++ crafted)
  }

  private def writeDocs(docs: Seq[Doc], tag: String): String = {
    val dir = tmpDir(s"tokdiff$tag")
    docs.map(d => (d.id, d.lang, "src", d.text.orNull))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** (word -> corpus count) over non-null texts — the shared prelude. */
  private def wordCounts(docs: Seq[Doc]): Map[String, Long] =
    docs.flatMap(_.text).flatMap(toks).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap

  // ---- BPE brute force -----------------------------------------------------

  /** One greedy left-to-right non-overlapping merge pass. */
  private def mergePass(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** bpeTrain's loop: per-round occurrence-weighted adjacent-pair counts
    * over the CURRENT symbol tables, winner (freq desc, l, r), early stop
    * on pair exhaustion. Returns the merge rows and the final symbol
    * tables (for the segment replay).
    */
  private def bpeBrute(wc: Map[String, Long], k: Int)
      : (Seq[(Int, String, String, Long)], Map[String, List[String]]) = {
    var symsOf: Map[String, List[String]] = wc.keys.map(w => w -> w.split("").toList).toMap
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val freqs = scala.collection.mutable.Map.empty[(String, String), Long]
      symsOf.foreach { case (w, syms) =>
        if (syms.length >= 2) syms.zip(syms.tail).foreach { p =>
          freqs(p) = freqs.getOrElse(p, 0L) + wc(w)
        }
      }
      if (freqs.isEmpty) exhausted = true
      else {
        val ((l, r), f) = freqs.toSeq.minBy { case ((l, r), f) => (-f, l, r) }
        merges += ((rank, l, r, f))
        symsOf = symsOf.map { case (w, syms) => w -> mergePass(syms, l, r) }
        rank += 1
      }
    }
    (merges.result(), symsOf)
  }

  test("bpeTrain + bpeSegment == greedy merge-loop brute force (overlap runs, tie ranks, exhaustion)") {
    Seq(5, 31).foreach { seed =>
      val docs = genDocs(seed)
      val dir = writeDocs(docs, s"bpe$seed")
      val wc = wordCounts(docs)
      val k = if (seed == 5) 4 else TokenizerOps.Merges // cover both depths
      val (wantMerges, finalSyms) = bpeBrute(wc, k)
      val gotMerges = TokenizerOps.bpeTrain(spark, dir, k).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(gotMerges == wantMerges, s"seed $seed merges:\ngot  $gotMerges\nwant $wantMerges")
      // segment: all words (no length cap on the BPE board), per-doc sums
      val wantSeg = docs.filter(_.text.nonEmpty).map { d =>
        val ws = toks(d.text.get)
        (d.id, ws.size.toLong, ws.map(_.length.toLong).sum,
          ws.map(w => finalSyms(w).size.toLong).sum)
      }.sortBy(_._1)
      val gotSeg = TokenizerOps.bpeSegment(spark, dir, k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(gotSeg == wantSeg, s"seed $seed segment:\ngot  $gotSeg\nwant $wantSeg")
      // the overlap-run convention is actually exercised: some word merged
      // an (x, x) self-pair somewhere, or the crafted a-run did
      assert(finalSyms("aaaa").size < 4, "the a-run must have merged")
    }
    // pair exhaustion BEFORE k: a one-word corpus merges once, then stops
    val dir = writeDocs(Seq(Doc(0L, "en", Some("ab ab ab"))), "bpeExhaust")
    val got = TokenizerOps.bpeTrain(spark, dir, 8).collect()
    assert(got.length == 1 &&
      got.head.getString(1) == "a" && got.head.getString(2) == "b" &&
      got.head.getLong(3) == 3L,
      "a pair-exhausted corpus must stop early with the single real merge")
  }

  // ---- unigram-LM brute force ---------------------------------------------

  /** unigramVocab's replay: occurrence-weighted substring freqs over
    * capped words, full single-char coverage + top-K multi, micro-nat
    * costs off the vocab total.
    */
  private def uniVocabBrute(wc: Map[String, Long]): Seq[(String, Long, Long)] = {
    val freqs = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, cnt) =>
      if (w.length >= 1 && w.length <= UniMaxWordLen)
        for (pos <- 0 until w.length; len <- 1 to UniMaxPiece
             if pos + len <= w.length) {
          val p = w.substring(pos, pos + len)
          freqs(p) = freqs.getOrElse(p, 0L) + cnt
        }
    }
    val singles = freqs.filter(_._1.length == 1).toSeq
    val multis = freqs.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(UniVocabK)
    val vocab = singles ++ multis
    val total = vocab.map(_._2).sum
    vocab.map { case (p, f) => (p, f, hup0(1e6 * math.log(total.toDouble / f))) }
      .sortBy(_._1)
  }

  /** The packed-long Viterbi: min (cost·100 + pieces) over piece splits. */
  private def viterbi(word: String, cost: Map[String, Long]): Long = {
    val dp = Array.fill[Long](word.length + 1)(Long.MaxValue)
    dp(0) = 0L
    for (j <- 1 to word.length; i <- 1 to math.min(UniMaxPiece, j)) {
      cost.get(word.substring(j - i, j)).foreach { c =>
        if (dp(j - i) != Long.MaxValue)
          dp(j) = math.min(dp(j), dp(j - i) + c * 100 + 1)
      }
    }
    dp(word.length)
  }

  test("unigramVocab + unigramSegment == Viterbi brute force (cap boundary, packed-long ties)") {
    Seq(11, 47).foreach { seed =>
      val docs = genDocs(seed)
      val dir = writeDocs(docs, s"uni$seed")
      val wc = wordCounts(docs)
      val wantVocab = uniVocabBrute(wc)
      val gotVocab = TokenizerOps.unigramVocab(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(gotVocab == wantVocab, s"seed $seed vocab:\ngot  $gotVocab\nwant $wantVocab")
      val cost = wantVocab.map(t => t._1 -> t._3).toMap
      val wantSeg = docs.filter(_.text.nonEmpty).flatMap { d =>
        val ws = toks(d.text.get).filter(w => w.length >= 1 && w.length <= UniMaxWordLen)
        if (ws.isEmpty) None
        else {
          val vals = ws.map(w => viterbi(w, cost))
          assert(vals.forall(_ != Long.MaxValue), "full coverage must make every word segmentable")
          val cu = vals.map(_ / 100).sum
          Some((d.id, ws.size.toLong, vals.map(_ % 100).sum,
            (math.floor((cu + 50).toDouble / 100.0).toLong) / 10000.0))
        }
      }.sortBy(_._1)
      val gotSeg = TokenizerOps.unigramSegment(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(gotSeg.map(t => (t._1, t._2, t._3)) == wantSeg.map(t => (t._1, t._2, t._3)),
        s"seed $seed seg counts:\ngot  $gotSeg\nwant $wantSeg")
      gotSeg.zip(wantSeg).foreach { case (g, w) =>
        assert(dEq(g._4, w._4), s"cost_nats doc ${g._1}: got ${g._4} want ${w._4}")
      }
      // the over-cap word is EXCLUDED: doc 902's capped word count is 1 ("cc")
      assert(gotSeg.find(_._1 == 902L).exists(_._2 == 1L),
        "the 17-char word must be excluded from the unigram board")
      // the exactly-on-cap word is INCLUDED
      assert(gotSeg.find(_._1 == 901L).exists(_._2 == 1L))
    }
  }

  // ---- WordPiece brute force ----------------------------------------------

  /** wordpieceVocab's replay: role-split substring freqs over capped
    * words, full per-role single-char coverage + top-K multi by
    * (freq desc, role asc, piece asc).
    */
  private def wpVocabBrute(wc: Map[String, Long]): Seq[(String, Boolean, Long)] = {
    val freqs = scala.collection.mutable.Map.empty[(String, Boolean), Long]
    wc.foreach { case (w, cnt) =>
      if (w.length >= 1 && w.length <= UniMaxWordLen)
        for (pos <- 0 until w.length; len <- 1 to UniMaxPiece
             if pos + len <= w.length) {
          val key = (w.substring(pos, pos + len), pos > 0)
          freqs(key) = freqs.getOrElse(key, 0L) + cnt
        }
    }
    val singles = freqs.filter(_._1._1.length == 1).toSeq
    val multis = freqs.filter(_._1._1.length >= 2).toSeq
      .sortBy { case ((p, c), f) => (-f, if (c) 1 else 0, p) }.take(WpVocabK)
    (singles ++ multis).map { case ((p, c), f) => (p, c, f) }
      .sortBy { case (p, c, _) => (p, if (c) 1 else 0) }
  }

  /** The greedy longest-match scan — the documented convention, even
    * where a shorter first piece would segment into fewer total pieces.
    */
  private def wpGreedy(word: String, init: Set[String], cont: Set[String]): Long = {
    var pos = 0
    var np = 0L
    while (pos < word.length) {
      val vocab = if (pos > 0) cont else init
      var len = math.min(UniMaxPiece, word.length - pos)
      while (len > 1 && !vocab(word.substring(pos, pos + len))) len -= 1
      assert(vocab(word.substring(pos, pos + len)),
        s"full per-role coverage must make greedy total: '$word' at $pos")
      np += 1; pos += len
    }
    np
  }

  test("wordpieceVocab + wordpieceSegment + fertility == greedy longest-match brute force") {
    Seq(17, 59).foreach { seed =>
      val docs = genDocs(seed)
      val dir = writeDocs(docs, s"wp$seed")
      val wc = wordCounts(docs)
      val wantVocab = wpVocabBrute(wc)
      val gotVocab = TokenizerOps.wordpieceVocab(spark, dir).collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).toSeq
      assert(gotVocab == wantVocab, s"seed $seed vocab:\ngot  $gotVocab\nwant $wantVocab")
      val init = wantVocab.collect { case (p, false, _) => p }.toSet
      val cont = wantVocab.collect { case (p, true, _) => p }.toSet
      def perDoc[K](key: Doc => K): Map[K, (Long, Long, Long)] =
        docs.filter(_.text.nonEmpty).groupBy(key).flatMap { case (kk, ds) =>
          val ws = ds.flatMap(d => toks(d.text.get))
            .filter(w => w.length >= 1 && w.length <= UniMaxWordLen)
          if (ws.isEmpty) None else {
            val nps = ws.map(w => wpGreedy(w, init, cont))
            Some(kk -> ((ws.size.toLong, nps.sum, nps.count(_ == 1L).toLong)))
          }
        }
      val wantSeg = perDoc(_.id).toSeq
        .map { case (id, (nw, np, nwh)) => (id, nw, np, nwh) }.sortBy(_._1)
      val gotSeg = TokenizerOps.wordpieceSegment(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(gotSeg == wantSeg, s"seed $seed seg:\ngot  $gotSeg\nwant $wantSeg")
      // fertility: the same counts re-aggregated by lang + two round-4 divides
      val wantFert = perDoc(_.lang).toSeq.map { case (lang, (nw, np, nwh)) =>
        (lang, nw, np, hup4(np.toDouble / nw), hup4(nwh.toDouble / nw))
      }.sortBy(_._1)
      val gotFert = TokenizerOps.wordpieceFertility(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .toSeq
      assert(gotFert.map(t => (t._1, t._2, t._3)) == wantFert.map(t => (t._1, t._2, t._3)),
        s"seed $seed fert counts:\ngot  $gotFert\nwant $wantFert")
      gotFert.zip(wantFert).foreach { case (g, w) =>
        assert(dEq(g._4, w._4) && dEq(g._5, w._5), s"fertility ${g._1}: got $g want $w")
      }
    }
    // the greedy-longest convention pinned on a crafted trap: "abcd" is a
    // frequent initial piece, so greedy segments "abcde" as abcd|e —
    // taking the LONGEST first match is the convention even when another
    // split exists; the engine row must equal the greedy brute exactly
    val docs = Seq(
      Doc(0L, "en", Some(("abcd " * 9) + ("de " * 9) + "abcde")),
      Doc(1L, "en", Some("a b c d e"))) // per-role single coverage
    val dir = writeDocs(docs, "wpTrap")
    val v = TokenizerOps.wordpieceVocab(spark, dir).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).toSeq
    assert(v == wpVocabBrute(wordCounts(docs)))
    assert(v.exists(t => t._1 == "abcd" && !t._2), "abcd must be an initial-role piece")
    val init = v.collect { case (p, false, _) => p }.toSet
    val cont = v.collect { case (p, true, _) => p }.toSet
    assert(wpGreedy("abcde", init, cont) == 2L, "greedy must take abcd then e")
    val gotTrap = TokenizerOps.wordpieceSegment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val wantTrap = docs.map { d =>
      val ws = toks(d.text.get)
      val nps = ws.map(w => wpGreedy(w, init, cont))
      (d.id, ws.size.toLong, nps.sum, nps.count(_ == 1L).toLong)
    }.sortBy(_._1)
    assert(gotTrap == wantTrap, s"trap:\ngot  $gotTrap\nwant $wantTrap")
  }
}
