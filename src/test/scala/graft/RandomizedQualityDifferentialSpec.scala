package graft

import java.math.RoundingMode

import graft.operators.QualityClassifier

/** Randomized differential tests for the frozen quality-LR surface — the
  * COVERAGE.md ledger's final toy-model-only cell: the six-feature chain
  * ([[QualityClassifier.featureExprs]]), the left-folded raw-weight
  * score, the round-6 threshold, and the per-source funnel are replayed
  * driver-side in the exact documented IEEE order over seeded
  * adversarial texts the driver corpus never contains: EMPTY (non-null)
  * strings through the `greatest` guards, whitespace-only padding,
  * all-punctuation and all-digit lines, case-sensitive stopwords ("THE"
  * is NOT a stopword), unicode letters landing in the punctuation class
  * (the `[a-zA-Z0-9\s]` complement), and multi-space separators that
  * make `f_toklen` intentionally diverge from naive average token
  * length (separator chars count — the documented convention).
  *
  * The trainer stays spec-verified (QualityClassifierSpec): float
  * gradient sums across partitions are not bit-reproducible against a
  * driver fold, and the oracled contract is the frozen surface.
  */
class RandomizedQualityDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def hup6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP).doubleValue()
  private def dEq(a: Double, b: Double): Boolean =
    java.lang.Double.compare(a, b) == 0

  private val stop = Set("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")
  private val W = Array(0.04, 2.0, 8.0, 0.05, 1.0, 1.0)
  private val Bias = -1.0

  /** The six features in the exact engine order and IEEE association.
    * Two conventions this suite itself surfaced (the first brute used
    * Java's and diverged on the whitespace-only doc):
    *  - Spark's `trim` strips SPACES ONLY (' '), not tabs/newlines —
    *    unlike Java's `String.trim` (≤ U+0020). DuckDB's `trim` is also
    *    space-only, so the engines agree and the replica must too:
    *    "   \t  " trims to "\t" (length 1), scoring Bias + 0.04·√1.
    *  - Spark's `split` uses limit -1: TRAILING empty fields are kept
    *    ("\t".split over \s+ is ["", ""], two tokens), where Java's
    *    default limit 0 drops them.
    */
  private def sTrim(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
  private def zrOf(text: String): Double = {
    val t = sTrim(text)
    val n = t.length
    val toks = t.split("\\s+", -1).toSeq
    val ntok = toks.size
    def g(x: Int): Int = math.max(x, 1)
    val f = Array(
      math.sqrt(n.toDouble),
      text.replaceAll("[a-zA-Z0-9\\s]", "").length.toDouble / g(n),
      toks.count(stop).toDouble / g(ntok),
      (n - (ntok - 1)).toDouble / g(ntok),
      text.replaceAll("[^0-9]", "").length.toDouble / g(n),
      text.replaceAll("[^A-Z]", "").length.toDouble / g(n))
    var z = Bias
    var i = 0
    while (i < 6) { z = z + W(i) * f(i); i += 1 }
    hup6(z)
  }

  private case class Doc(id: Long, source: String, text: Option[String])

  private def genDocs(seed: Int): Seq[Doc] = {
    val r = new scala.util.Random(seed * 3163 + 19)
    val words = Seq("the", "cat", "sat", "on", "Mat", "DOG", "und", "42", "x!")
    val bulk = (0 until (25 + r.nextInt(15))).map { i =>
      Doc(i.toLong, s"s${r.nextInt(3)}",
        Some((1 to (1 + r.nextInt(12))).map(_ => words(r.nextInt(words.size)))
          .mkString(if (r.nextInt(4) == 0) "  " else " ")))
    }
    val crafted = Seq(
      Doc(950L, "edge", Some("")),                    // empty NON-NULL: both guards fire
      Doc(951L, "edge", Some("   \t  ")),             // whitespace-only: trims to empty
      Doc(952L, "edge", Some("!!! ??? ...")),         // all punctuation
      Doc(953L, "edge", Some("12345 678 90")),        // all digits
      Doc(954L, "edge", Some("THE CAT SAT")),         // caps; "THE" is NOT a stopword
      Doc(955L, "edge", Some("the the the the")),     // pure stopwords
      Doc(956L, "edge", Some("héllo wörld")),         // unicode letters -> punct class
      Doc(957L, "edge", Some("a  b\t\tc")),           // multi-space: f_toklen counts seps
      Doc(958L, "edge", None))                        // null: no row at all
    r.shuffle(bulk ++ crafted)
  }

  private def writeDocs(docs: Seq[Doc], tag: String): String = {
    val dir = tmpDir(s"qdiff$tag")
    docs.map(d => (d.id, "en", d.source, d.text.orNull))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("frozenScores == six-feature IEEE chain brute force (guards, case, unicode, separators)") {
    Seq(8, 44).foreach { seed =>
      val docs = genDocs(seed)
      val dir = writeDocs(docs, s"fs$seed")
      val want = docs.filter(_.text.nonEmpty)
        .map(d => (d.id, zrOf(d.text.get))).sortBy(_._1)
      val got = QualityClassifier.frozenScores(
          graft.Tables.documents(spark, dir)).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
      assert(got.map(_._1) == want.map(_._1), s"seed $seed doc set")
      got.zip(want).foreach { case (g, w) =>
        assert(dEq(g._2, w._2), s"seed $seed zr doc ${g._1}: got ${g._2} want ${w._2}")
      }
      assert(!got.exists(_._1 == 958L), "null text must have no score row")
      // the guards actually fired: the EMPTY string scores exactly Bias
      // (every denominator clamped, sqrt(0) = 0) — while the tab-padded
      // doc does NOT (space-only trim leaves the tab: n = 1, + 0.04·√1)
      assert(dEq(got.find(_._1 == 950L).get._2, hup6(Bias)))
      assert(dEq(got.find(_._1 == 951L).get._2, hup6(Bias + 0.04)))
    }
  }

  test("lrFunnel == per-source DECIMAL-mean brute force (strict threshold)") {
    Seq(8, 44).foreach { seed =>
      val docs = genDocs(seed)
      val dir = writeDocs(docs, s"fn$seed")
      val want = docs.filter(_.text.nonEmpty).groupBy(_.source).toSeq.map {
        case (src, ds) =>
          val zrs = ds.map(d => zrOf(d.text.get))
          val sum = zrs.map(z => BigDecimal(java.math.BigDecimal.valueOf(z)
            .setScale(6, RoundingMode.HALF_UP))).sum
          (src, ds.size.toLong, zrs.count(_ > QualityClassifier.KeepTau).toLong,
            sum.toDouble / ds.size)
      }.sortBy(_._1)
      val got = QualityClassifier.lrFunnel(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got.map(t => (t._1, t._2, t._3)) == want.map(t => (t._1, t._2, t._3)),
        s"seed $seed funnel:\ngot  $got\nwant $want")
      got.zip(want).foreach { case (g, w) =>
        assert(dEq(g._4, w._4), s"seed $seed avg_z ${g._1}: got ${g._4} want ${w._4}")
      }
      // the threshold is STRICT >: a doc sitting exactly at tau is dropped
      // (no crafted row can reliably land on 0.45 after round-6, so the
      // contract is pinned arithmetically instead)
      assert(!(0.45 > QualityClassifier.KeepTau), "tau must compare strictly")
    }
  }
}
