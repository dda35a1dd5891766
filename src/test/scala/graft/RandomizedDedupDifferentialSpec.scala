package graft

/** Randomized differential tests for the EXACT dedup pair generators —
  * the claim under test is completeness, not arithmetic: the prefix-filter
  * index ([[graft.operators.DedupOps.prefixFilterPairs]], Bayardo/Xiao
  * prefix rule) prunes candidate generation but promises the EXACT
  * thresholded join, and the capped posting-list join
  * ([[graft.operators.DedupOps.ngramJaccardPairs]]) promises the same set
  * whenever no posting list exceeds its cap. Both are checked against a
  * driver-side all-pairs brute force over seeded corpora built to contain
  * exact clones, single-token edits straddling the 0.8 threshold, a
  * strict-subset pair sitting EXACTLY on J = 0.8 (the inclusive boundary),
  * shared boilerplate shingles (the prefix rule must keep them in
  * suffixes), and sub-3-token documents (zero shingles, must vanish).
  */
class RandomizedDedupDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val T = 0.8 // PfNum / PfDen

  /** Docs as token lists; text = single-space join so TextOps.tokens
    * reproduces the list exactly.
    */
  private def genDocs(seed: Int): Seq[(Long, Vector[String])] = {
    val r = new scala.util.Random(seed * 53 + 7)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    def sentence(len: Int) = Vector.fill(len)(vocab(r.nextInt(vocab.size)))
    var id = -1L
    def nid() = { id += 1; id }
    val out = Seq.newBuilder[(Long, Vector[String])]
    // base docs + near-dup families
    for (_ <- 1 to 10) {
      val base = sentence(24 + r.nextInt(12))
      out += ((nid(), base))
      r.nextInt(3) match {
        case 0 => out += ((nid(), base)) // exact clone: J = 1
        case 1 => // one token replaced: ~J >= 0.8 at this length
          val i = 2 + r.nextInt(base.size - 4)
          out += ((nid(), base.updated(i, "zz" + r.nextInt(999))))
        case _ => // heavier edit: usually BELOW threshold
          val i = 2 + r.nextInt(base.size - 8)
          out += ((nid(), base.patch(i, sentence(4), 4)))
      }
    }
    // the exact J = 0.8 boundary pair: Y's shingles a strict subset of X's
    // (7 distinct tokens -> 5 distinct shingles; prefix of 6 -> 4)
    val distinct7 = Vector("b1", "b2", "b3", "b4", "b5", "b6", "b7")
    out += ((nid(), distinct7))
    out += ((nid(), distinct7.take(6)))
    // shared boilerplate header on otherwise-unrelated docs: its shingles
    // have high document frequency, land in prefix SUFFIXES, and must not
    // manufacture pairs
    val boiler = Vector("terms", "of", "service", "apply", "here")
    for (_ <- 1 to 6) out += ((nid(), boiler ++ sentence(20 + r.nextInt(8))))
    // degenerate: empty and sub-3-token docs carry zero shingles
    out += ((nid(), Vector.empty))
    out += ((nid(), Vector("aa", "bb")))
    out.result()
  }

  private def shingleSet(toks: Vector[String]): Set[String] =
    if (toks.size < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet

  /** All-pairs brute force: (a_id, b_id, round4 jaccard) for J >= T using
    * the engine's integer form common*5 >= union*4 (no float threshold).
    */
  private def brutePairs(docs: Seq[(Long, Vector[String])]): Seq[(Long, Long, Double)] = {
    val sets = docs.map { case (id, t) => (id, shingleSet(t)) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      common = (sa intersect sb).size.toLong
      union = sa.size + sb.size - common
      if common * 5 >= union * 4
    } yield (a, b,
      java.math.BigDecimal.valueOf(common.toDouble / union)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())).sortBy(t => (t._1, t._2))
  }

  private def writeDocs(docs: Seq[(Long, Vector[String])]): String = {
    val dir = tmpDir("rddiff")
    docs.map { case (id, t) => (id, t.mkString(" ")) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("prefixFilterPairs == all-pairs brute force (pruning loses NOTHING above threshold)") {
    Seq(4, 21, 77).foreach { seed =>
      val docs = genDocs(seed)
      val dir = writeDocs(docs)
      val got = graft.operators.DedupOps.prefixFilterPairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val want = brutePairs(docs)
      assert(got == want, s"seed $seed:\n got $got\nwant $want")
      // non-vacuity: the corpus must produce clones AND the exact boundary
      assert(want.exists(_._3 == 1.0), s"seed $seed lacks an exact clone pair")
      assert(want.exists(_._3 == 0.8), s"seed $seed lacks the J = 0.8 boundary pair")
      assert(want.size < docs.size * (docs.size - 1) / 4,
        s"seed $seed: threshold keeps the pair set sparse, else the test is trivial")
    }
  }

  test("ngramJaccardPairs agrees with the prefix-filtered exact join below the posting cap") {
    val docs = genDocs(4)
    val dir = writeDocs(docs)
    val a = graft.operators.DedupOps.ngramJaccardPairs(spark, dir, T).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a == brutePairs(docs),
      "capped posting join must equal brute force when no list exceeds the cap")
  }

  test("prefix index prunes candidates without dropping pairs (counts strictly shrink)") {
    val docs = genDocs(21)
    val (plain, pruned) = graft.operators.DedupOps.prefixCandidateCounts(spark, writeDocs(docs))
    assert(pruned < plain, s"prefix index must prune: plain=$plain pruned=$pruned")
    assert(pruned >= brutePairs(docs).size.toLong,
      "candidates can never undercount the true pair set")
  }
}
