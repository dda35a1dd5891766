package graft

import java.math.RoundingMode

import graft.queries.{PipelineQueries => PQ}

/** Randomized differential tests for the pipeline-primitive family —
  * the sampling/packing/allocation arithmetic a training-data pipeline
  * stakes its token accounting on: seeded adversarial corpora (sparse
  * gappy doc_ids, token counts exactly ON sequence boundaries, a
  * certainty-unit document holding ~90% of the PPS weight, NULL/zero/
  * negative n_chars, tied temperature-allocation remainders, zero-mass
  * sources, null texts) run through the public queries and compared to
  * driver-side replays of the documented exact-integer conventions:
  * Madow's systematic PPS grid over the seeded md5 permutation, the
  * largest-remainder temperature allocation (sqrt as the single
  * correctly-rounded float op), the two-level exclusive-prefix sequence
  * packing (forced into its RECURSIVE levels via a tiny maxWindowRows),
  * and the md5 shuffle-shard manifest.
  */
class RandomizedPipelineDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def hup0(d: Double): Long =
    java.math.BigDecimal.valueOf(d).setScale(0, RoundingMode.HALF_UP).longValue()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---- corpora -------------------------------------------------------------

  private case class Doc(id: Long, lang: String, source: String,
      text: Option[String], nChars: Option[Long])

  private def writeDocs(docs: Seq[Doc], tag: String): String = {
    val dir = tmpDir(s"pdiff$tag")
    docs.map(d => (d.id, d.lang, d.source, d.text.orNull, d.nChars))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Mixed corpus for pps/tempAlloc/shuffleShard: sparse ids, a
    * certainty-unit weight, NULL/zero/negative n_chars, tied source
    * masses, a zero-mass source, one null text.
    */
  private def genMixed(seed: Int): Seq[Doc] = {
    val r = new scala.util.Random(seed * 2087 + 11)
    val bulk = (0 until (25 + r.nextInt(20))).map { i =>
      val id = i.toLong * (1 + r.nextInt(7)) + 1000 // sparse, non-contiguous
      Doc(id, Seq("en", "de")(r.nextInt(2)), s"s${r.nextInt(4)}",
        Some((1 to (2 + r.nextInt(6))).map(_ => "tok").mkString(" ")),
        Some((50 + r.nextInt(200)).toLong))
    }.distinctBy(_.id)
    val crafted = Seq(
      Doc(1L, "en", "huge", Some("w w w"), Some(50000L)), // certainty unit (~90% of weight)
      Doc(2L, "en", "tieA", Some("a b"), Some(777L)),     // tied masses -> tied rems
      Doc(3L, "en", "tieB", Some("c d"), Some(777L)),
      Doc(4L, "de", "zero", Some("e"), None),             // mass 0 via NULL n_chars
      Doc(5L, "de", "zero", Some("f"), Some(0L)),
      Doc(6L, "fr", "s0", None, Some(100L)),              // null text
      Doc(7L, "fr", "s1", Some("g"), Some(-5L))           // negative n_chars -> w=1
    )
    bulk ++ crafted
  }

  /** All-text corpus for sequence packing: token counts engineered to
    * land exactly ON and AROUND the seqLen boundary, sparse ids forcing
    * single-doc blocks, ids not starting at zero.
    */
  private def genPack(seed: Int): Seq[Doc] = {
    val r = new scala.util.Random(seed * 4447 + 5)
    def text(n: Int) = (1 to n).map(_ => "t").mkString(" ")
    val bulk = (0 until (30 + r.nextInt(20))).map { i =>
      val id = 100L + i * (1 + r.nextInt(9)) // gaps -> sparse blocks
      Doc(id, "en", "s", Some(text(1 + r.nextInt(40))), Some(1L))
    }.distinctBy(_.id)
    val crafted = Seq(
      Doc(10L, "en", "s", Some(text(16)), Some(1L)),  // exactly one full sequence
      Doc(11L, "en", "s", Some(text(45)), Some(1L)),  // spans ≥ 3 sequences of 16
      Doc(12L, "en", "s", Some(text(1)), Some(1L)),
      Doc(13L, "en", "s", Some(text(15)), Some(1L)))  // ends 1 short of a boundary
    bulk ++ crafted
  }

  // ---- PPS systematic sampling --------------------------------------------

  test("ppsSample == Madow grid brute force (certainty unit, null/zero/negative weights)") {
    Seq(3, 21, 55).foreach { seed =>
      val docs = genMixed(seed)
      val dir = writeDocs(docs, s"pps$seed")
      val k = PQ.PpsSampleK
      val keyed = docs.map { d =>
        val w = math.max(d.nChars.getOrElse(1L), 1L)
        (d.id, w, md5hex(s"pps|${d.id}"))
      }.sortBy { case (id, _, skey) => (skey, id) }
      val tw = keyed.map(_._2).sum
      var ci = 0L
      val want = keyed.flatMap { case (id, w, _) =>
        ci += w
        val n = (ci * k) / tw - ((ci - w) * k) / tw
        if (n >= 1) Some((id, w, n)) else None
      }.sortBy(_._1)
      val got = PQ.ppsSample(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"seed $seed:\ngot  $got\nwant $want")
      assert(got.map(_._3).sum == k.toLong, "the telescoping grid draws exactly k")
      assert(got.find(_._1 == 1L).exists(_._3 >= 10),
        "the certainty unit must be drawn many times (PPS up-sampling)")
      assert(got.filter(t => Seq(4L, 5L, 7L).contains(t._1)).forall(_._2 == 1L),
        "null/zero/negative n_chars must clamp to weight 1")
    }
  }

  // ---- temperature-scaled allocation --------------------------------------

  test("tempAlloc == largest-remainder brute force (tied remainders, zero-mass source)") {
    Seq(3, 21, 55).foreach { seed =>
      val docs = genMixed(seed)
      val dir = writeDocs(docs, s"ta$seed")
      val k = PQ.TempAllocK.toLong
      val mass = docs.filter(_.text.nonEmpty).groupBy(_.source)
        .view.mapValues(_.map(_.nChars.getOrElse(0L)).sum).toMap
      val w = mass.view.mapValues(m => hup0(1e6 * math.sqrt(m.toDouble))).toMap
      val tw = w.values.sum
      val base = w.view.mapValues(wu => (k * wu) / tw).toMap
      val rem = w.view.mapValues(wu => (k * wu) % tw).toMap
      val extra = k - base.values.sum
      val want = mass.keys.toSeq.sorted.map { src =>
        val nbetter = mass.keys.count(o =>
          rem(o) > rem(src) || (rem(o) == rem(src) && o < src))
        (src, mass(src), w(src),
          base(src) + (if (nbetter + 1 <= extra) 1L else 0L))
      }
      val got = PQ.tempAlloc(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == want, s"seed $seed:\ngot  $got\nwant $want")
      assert(got.map(_._4).sum == k, "largest-remainder must conserve the budget exactly")
      assert(got.find(_._1 == "zero").exists(t => t._2 == 0L && t._3 == 0L),
        "the zero-mass source must survive with w_u = 0")
      val (ta, tb) = (got.find(_._1 == "tieA").get, got.find(_._1 == "tieB").get)
      assert(ta._2 == tb._2 && ta._3 == tb._3,
        "the tied sources must carry identical mass and weight")
    }
  }

  // ---- sequence packing through the recursive prefix levels ---------------

  test("sequencePack + packedSequences == exclusive-prefix brute force (boundaries, forced recursion)") {
    val seqLen = 16
    Seq(9, 33).foreach { seed =>
      val docs = genPack(seed).sortBy(_.id)
      // blockSize 4 + maxWindowRows 4 FORCES the recursive prefix levels
      // (sparse ids make the range-derived block bound far exceed 4)
      val dir = writeDocs(docs, s"pack$seed")
      val toksOf = docs.map(d => d.id -> d.text.get.trim.split("\\s+").length.toLong).toMap
      var off = 0L
      val wantPack = docs.map { d =>
        val n = toksOf(d.id)
        val row = (d.id, n, off, off / seqLen, (off + n - 1) / seqLen, off % seqLen)
        off += n
        row
      }
      val gotPack = PQ.sequencePack(spark, dir, seqLen, blockSize = 4, maxWindowRows = 4L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
      assert(gotPack == wantPack, s"seed $seed pack:\ngot  $gotPack\nwant $wantPack")
      // the boundary shapes actually occur: some doc starts a sequence
      // exactly (off_in_seq == 0 beyond the first) and some doc spans ≥ 2
      assert(gotPack.count(_._6 == 0L) >= 2, "a mid-corpus boundary-aligned doc must exist")
      assert(gotPack.exists(t => t._5 - t._4 >= 2), "a ≥3-sequence spanning doc must exist")

      // manifest: per-sequence doc tiling off the same offsets
      val wantSeq = wantPack.flatMap { case (id, n, off0, s0, s1, _) =>
        (s0 to s1).map { sq =>
          val len = math.min((sq + 1) * seqLen, off0 + n) - math.max(sq * seqLen, off0)
          (sq, id, len)
        }
      }.groupBy(_._1).toSeq.map { case (sq, ps) =>
        (sq, ps.size.toLong, ps.map(_._3).sum, ps.map(_._2).min, ps.map(_._2).max)
      }.sortBy(_._1)
      val gotSeq = PQ.packedSequences(spark, dir, seqLen).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      assert(gotSeq == wantSeq, s"seed $seed manifest:\ngot  $gotSeq\nwant $wantSeq")
      // the tiling invariant: every sequence except the last holds exactly seqLen
      gotSeq.dropRight(1).foreach(t =>
        assert(t._3 == seqLen.toLong, s"sequence ${t._1} must hold exactly $seqLen tokens"))
    }
  }

  // ---- shuffle-shard manifest ---------------------------------------------

  test("shuffleShard == md5-permutation brute force (null-text token sums)") {
    Seq(3, 21).foreach { seed =>
      val docs = genMixed(seed)
      val dir = writeDocs(docs, s"shard$seed")
      val keyed = docs.map { d =>
        val skey = md5hex(s"${PQ.ShuffleSeed}|${d.id}")
        val toks = d.text.map(_.trim.split("\\s+").length.toLong)
        (("0123456789abcdef".indexOf(skey.head)), d.id, skey, toks)
      }
      val want = keyed.groupBy(_._1).toSeq.map { case (shard, ds) =>
        val tagged = ds.map(t => (s"${t._3}|${t._2}", t._4))
        (shard, ds.size.toLong,
          // SUM over an all-NULL group is NULL in both engines
          if (ds.forall(_._4.isEmpty)) None else Some(ds.flatMap(_._4).sum),
          tagged.map(_._1).min, tagged.map(_._1).max)
      }.sortBy(_._1)
      val got = PQ.shuffleShard(spark, dir).collect()
        .map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getString(3), r.getString(4))).toSeq
      assert(got == want, s"seed $seed:\ngot  $got\nwant $want")
      assert(got.map(_._2).sum == docs.size.toLong, "every doc lands in exactly one shard")
    }
  }
}
