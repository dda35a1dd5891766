package graft

import graft.operators.{RetrievalOps => R}

/** Randomized differential test for BM25 scoring — the retrieval family's
  * formula core (Robertson/Sparck Jones k1=1.2, b=0.75 variant used
  * here): seeded corpora with adversarial shapes (a term in EVERY doc so
  * idf bottoms out near ln(1+0.5/(N+0.5)), saturated tf, one-token docs,
  * very long docs dragging avgdl, null-text rows that must vanish before
  * N/avgdl are computed), the engine's [[R.bm25For]] vs a driver-side
  * brute force replaying the documented float chain exactly: one ln per
  * (term, df), round-6 per-term partials summed as DECIMAL(18,6), top-k
  * by (score desc, doc_id).
  */
class RandomizedRetrievalDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val Terms = Seq("alpha", "beta", "gamma")

  private def genCorpus(seed: Int): Seq[(Long, String)] = {
    val r = new scala.util.Random(seed * 61 + 29)
    val filler = Vector.tabulate(30)(i => s"f$i")
    def doc(len: Int, tfs: Map[String, Int]): String = {
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      tfs.foreach { case (t, n) => toks ++= Seq.fill(n)(t) }
      while (toks.size < len) toks += filler(r.nextInt(filler.size))
      r.shuffle(toks).mkString(" ")
    }
    var id = -1L
    def nid() = { id += 1; id }
    val bulk = (1 to 25).map { _ =>
      val tfs = Terms.filter(_ => r.nextInt(3) > 0)
        .map(t => t -> (1 + r.nextInt(4))).toMap
      (nid(), doc(8 + r.nextInt(30), tfs))
    }
    val crafted = Seq(
      (nid(), doc(12, Map("alpha" -> 1, "beta" -> 1, "gamma" -> 1))),
      (nid(), "alpha"),                        // dl = 1, pure term
      (nid(), doc(10, Map("alpha" -> 8))),     // saturated tf
      (nid(), doc(220, Map("beta" -> 2))),     // very long doc drags avgdl
      (nid(), filler.take(9).mkString(" ")),   // no query terms: must not match
      (nid(), null.asInstanceOf[String]))      // null text: out before N/avgdl
    // "alpha" additionally seeded into every bulk doc? no — instead make
    // one term near-universal: append it to every OTHER bulk doc
    val universal = bulk.zipWithIndex.map { case ((i, t), ix) =>
      if (ix % 2 == 0) (i, t + " gamma") else (i, t)
    }
    universal ++ crafted
  }

  private def hup6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def bruteBm25(docs: Seq[(Long, String)], k: Int): Seq[(Long, Double, Long)] = {
    val toked = docs.collect { case (id, t) if t != null =>
      (id, t.trim.split("\\s+").filter(_.nonEmpty).toVector)
    }
    val n = toked.size.toLong
    val avgdl = toked.map(_._2.size.toLong).sum.toDouble / n
    val tf = for {
      (id, toks) <- toked; t <- Terms
      c = toks.count(_ == t) if c > 0
    } yield (id, toks.size.toLong, t, c.toLong)
    val dfm = tf.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val scored = tf.groupBy(_._1).toSeq.map { case (id, rows) =>
      val s = rows.map { case (_, dl, t, c) =>
        val df = dfm(t)
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        java.math.BigDecimal.valueOf(hup6(
          idf * ((c * 2.2) / (c + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))))
      }.reduce(_ add _)
      (id, s.doubleValue(), rows.size.toLong)
    }
    scored.sortBy(t => (-t._2, t._1)).take(k)
  }

  test("bm25For == driver-side formula replay (universal term, saturated tf, dl extremes)") {
    Seq(8, 44, 101).foreach { seed =>
      val docs = genCorpus(seed)
      val dir = tmpDir(s"rretr$seed")
      docs.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = R.bm25For(spark, dir, Terms, 15).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      val want = bruteBm25(docs, 15)
      assert(got.size == want.size && got.zip(want).forall { case (g, w) =>
        g._1 == w._1 && java.lang.Double.compare(g._2, w._2) == 0 && g._3 == w._3
      }, s"seed $seed:\n got $got\nwant $want")
      // non-vacuity: the no-term and null docs are absent, a 3-term doc ranks
      assert(!got.exists(g => docs.drop(docs.size - 2).exists(_._1 == g._1)))
      assert(got.exists(_._3 == 3L), "a doc matching all three terms must appear")
    }
  }
}
