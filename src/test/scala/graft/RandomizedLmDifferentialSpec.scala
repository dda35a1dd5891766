package graft

import java.math.RoundingMode

import graft.queries.{PipelineQueries => PQ}

/** Randomized differential tests for the statistical-LM scoring family —
  * the last toy-model-only corner of the text plane (COVERAGE.md
  * ledger): add-1 bigram cross-entropy, interpolated Kneser–Ney, and
  * DSIR importance selection, each replayed driver-side from the
  * documented conventions (round-6 DECIMAL log terms, exact integer
  * counts, one double divide + round-4 per document, the exact p75
  * order-statistic cutoff on integer ten-thousandths) over seeded
  * adversarial corpora: single-token and null-text documents, c = 1
  * bigrams sitting on the Kneser–Ney discount floor, repeated-bigram
  * runs, duplicate documents manufacturing ties AT the DSIR cutoff,
  * mixed-sign scores (the truncating-div histogram-bucket concern), and
  * target-domain extremes (zero-"en" and all-"en" corpora).
  */
class RandomizedLmDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def hup(d: Double, s: Int): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d).setScale(s, RoundingMode.HALF_UP).doubleValue()
  private def hup0(d: Double): Long =
    java.math.BigDecimal.valueOf(d).setScale(0, RoundingMode.HALF_UP).longValue()
  private def nz(d: Double): Double = if (d == 0.0) 0.0 else d
  private def dEq(a: Double, b: Double): Boolean =
    java.lang.Double.compare(a, b) == 0

  /** Round-6 log term carried exactly (the DECIMAL(18,6) convention). */
  private def lp6(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(math.log(x))
      .setScale(6, RoundingMode.HALF_UP))

  private def toks(text: String): Seq[String] = text.trim.split("\\s+").toSeq

  private case class Doc(id: Long, lang: String, text: Option[String])

  /** Seeded corpus: small vocab so bigrams repeat, salted with the
    * adversarial shapes. Duplicate documents (ids 880-883 share one
    * text) manufacture equal scores — tie candidates at the DSIR
    * cutoff; "zz zz zz" makes a repeated self-bigram run; singles and
    * null texts probe the no-bigram path.
    */
  private def genDocs(seed: Int, langs: Seq[String]): Seq[Doc] = {
    val r = new scala.util.Random(seed * 9973 + 7)
    val vocab = Seq("the", "cat", "sat", "on", "mat", "und", "der", "hund")
    val bulk = (0 until (22 + r.nextInt(12))).map { i =>
      Doc(i.toLong, langs(r.nextInt(langs.size)),
        Some((1 to (2 + r.nextInt(9))).map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")))
    }
    val crafted = Seq(
      Doc(870L, langs.head, Some("solo")),              // 1 token: no bigrams
      Doc(871L, langs.last, None),                      // null text
      Doc(872L, langs.head, Some("zz zz zz zz")),       // self-bigram run
      Doc(873L, langs.last, Some("once only")),         // hapax bigram (c = 1)
      Doc(880L, langs.head, Some("the cat sat")),       // duplicate docs: tied
      Doc(881L, langs.head, Some("the cat sat")),       //   scores at the
      Doc(882L, langs.last, Some("the cat sat")),       //   quartile cutoff
      Doc(883L, langs.last, Some("the cat sat")))
    r.shuffle(bulk ++ crafted)
  }

  private def writeDocs(docs: Seq[Doc], tag: String): String = {
    val dir = tmpDir(s"lmdiff$tag")
    docs.map(d => (d.id, d.lang, "src", d.text.orNull))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def bigramsOf(docs: Seq[Doc]): Seq[(Long, (String, String))] =
    docs.flatMap(d => d.text.toSeq.flatMap { t =>
      val ws = toks(t)
      if (ws.size < 2) Nil else ws.zip(ws.tail).map(d.id -> _)
    })

  // ---- add-1 bigram LM -----------------------------------------------------

  test("bigramLm == add-1 brute force (no-bigram docs NULL, rare counts, self-runs)") {
    Seq(2, 28).foreach { seed =>
      val docs = genDocs(seed, Seq("en", "de"))
      val dir = writeDocs(docs, s"blm$seed")
      val occ = bigramsOf(docs)
      val c = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val t = occ.size.toLong
      val v = c.size.toLong
      // EVERY doc appears (the engine left-joins the full doc_id list):
      // null-text and single-token docs read 0 bigrams and NULL xent
      val want = docs.map { d =>
        val bgs = occ.filter(_._1 == d.id).map(_._2)
        if (bgs.isEmpty) (d.id, 0L, 0L, None: Option[Double])
        else {
          val s = bgs.map(b => lp6((c(b) + 1).toDouble / (t + v))).sum
          (d.id, bgs.size.toLong, bgs.count(b => c(b) <= PQ.RareBigramMax).toLong,
            Some(hup(-s.toDouble / bgs.size, 4)))
        }
      }.sortBy(_._1)
      val got = PQ.bigramLm(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
      assert(got.map(x => (x._1, x._2, x._3)) == want.map(x => (x._1, x._2, x._3)),
        s"seed $seed counts:\ngot  $got\nwant $want")
      got.zip(want).foreach { case (g, w) =>
        assert((g._4, w._4) match {
          case (Some(a), Some(b)) => dEq(a, b)
          case (None, None)       => true
          case _                  => false
        }, s"xent doc ${g._1}: got ${g._4} want ${w._4}")
      }
      assert(got.find(_._1 == 870L).exists(x => x._2 == 0L && x._4.isEmpty),
        "a single-token doc must read 0 bigrams and NULL xent")
      assert(got.find(_._1 == 873L).exists(_._3 >= 1L), "the hapax bigram must count as rare")
    }
  }

  // ---- interpolated Kneser–Ney --------------------------------------------

  test("knBigram == interpolated-KN brute force (discount floor, continuation mass)") {
    spark.conf.set("spark.graft.kn.cmsTypeCutover", "0") // exact path
    Seq(6, 40).foreach { seed =>
      val docs = genDocs(seed, Seq("en", "de"))
      val dir = writeDocs(docs, s"kn$seed")
      val occ = bigramsOf(docs)
      val c = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val cl = c.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
      val n1l = c.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n1r = c.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n1tot = c.size.toLong
      val D = PQ.KnDiscount
      def lp(b: (String, String)): BigDecimal =
        lp6((math.max(c(b) - D, 0.0) +
          D * n1l(b._1) * (n1r(b._2).toDouble / n1tot)) / cl(b._1))
      val want = docs.filter(_.text.nonEmpty).map { d =>
        val bgs = occ.filter(_._1 == d.id).map(_._2)
        if (bgs.isEmpty) (d.id, 0L, None: Option[Double])
        else (d.id, bgs.size.toLong,
          Some(nz(hup(-bgs.map(lp).sum.toDouble / bgs.size, 4))))
      }.sortBy(_._1) ++
        docs.filter(_.text.isEmpty).map(d => (d.id, 0L, None: Option[Double]))
      val wantSorted = want.sortBy(_._1)
      val got = PQ.knBigram(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
      assert(got.map(x => (x._1, x._2)) == wantSorted.map(x => (x._1, x._2)),
        s"seed $seed counts:\ngot  $got\nwant $wantSorted")
      got.zip(wantSorted).foreach { case (g, w) =>
        assert((g._3, w._3) match {
          case (Some(a), Some(b)) => dEq(a, b)
          case (None, None)       => true
          case _                  => false
        }, s"xent_kn doc ${g._1}: got ${g._3} want ${w._3}")
      }
      // the discount floor is live: a c=1 bigram's raw term is 0.25/cl
      // plus back-off mass — assert a hapax bigram exists so the
      // max(c−D, 0) branch was actually exercised near its floor
      assert(c.values.exists(_ == 1L), "the corpus must carry a hapax bigram")
    }
  }

  // ---- DSIR importance selection ------------------------------------------

  private def dsirBrute(docs: Seq[Doc]): Seq[(Long, Long, Double, Boolean)] = {
    val occ = docs.flatMap(d => d.text.toSeq.flatMap(t => toks(t).map(w => (d.id, d.lang, w))))
    val cs = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = occ.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ts = cs.values.sum; val v = cs.size.toLong; val tt = ct.values.sum
    val perDoc = occ.groupBy(_._1).toSeq.map { case (id, os) =>
      val s = os.map { case (_, _, w) =>
        lp6((ct.getOrElse(w, 0L) + 1).toDouble / (tt + v)) -
          lp6((cs(w) + 1).toDouble / (ts + v))
      }.sum
      val llr = nz(hup(s.toDouble / os.size, 4))
      (id, os.size.toLong, llr, hup0(llr * 10000))
    }
    val e4s = perDoc.map(_._4).sorted
    val k75 = (3 * e4s.size + 3) / 4
    val c75 = e4s(k75 - 1)
    perDoc.map { case (id, n, llr, e4) => (id, n, llr, e4 >= c75) }.sortBy(_._1)
  }

  test("dsirSelect == LLR + exact-p75-cutoff brute force (mixed signs, cutoff ties, domain extremes)") {
    spark.conf.set("spark.graft.dsir.cmsVocabCutover", "0") // exact path
    def check(docs: Seq[Doc], tag: String): Seq[(Long, Long, Double, Boolean)] = {
      val dir = writeDocs(docs, tag)
      val want = dsirBrute(docs)
      val got = PQ.dsirSelect(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
      assert(got.map(x => (x._1, x._2, x._4)) == want.map(x => (x._1, x._2, x._4)),
        s"$tag:\ngot  $got\nwant $want")
      got.zip(want).foreach { case (g, w) =>
        assert(dEq(g._3, w._3), s"$tag llr doc ${g._1}: got ${g._3} want ${w._3}")
      }
      got
    }
    Seq(14, 52).foreach { seed =>
      val docs = genDocs(seed, Seq("en", "de"))
      val got = check(docs, s"dsir$seed")
      // mixed-sign scores actually occurred (the truncating-div bucket
      // map must hold for negative e4), and the duplicate docs carry
      // identical llr — the inclusive-cutoff tie shape
      assert(got.exists(_._3 < 0) && got.exists(_._3 > 0),
        "corpus must produce mixed-sign llr")
      val dups = got.filter(t => t._1 >= 880L && t._1 <= 883L)
      assert(dups.map(_._3).distinct.size == 1 && dups.map(_._4).distinct.size == 1,
        "duplicate docs must score and select identically")
    }
    // domain extremes: no target-domain docs at all (tt = 0 — the target
    // term degenerates to the constant −ln v, and rare tokens still score
    // POSITIVE via the add-1 source ratio, which is exactly why the
    // differential, not a sign intuition, is the oracle here), then
    // all-target; the inclusive cutoff must still keep ≥ a quartile
    val noEn = check(genDocs(3, Seq("de", "fr")), "dsirNoEn")
    assert(noEn.count(_._4) * 4 >= noEn.size, "inclusive cutoff keeps at least a quartile")
    val allEn = check(genDocs(4, Seq("en", "en")), "dsirAllEn")
    assert(allEn.count(_._4) * 4 >= allEn.size, "inclusive cutoff keeps at least a quartile")
  }
}
