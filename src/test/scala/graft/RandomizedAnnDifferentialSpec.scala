package graft

import graft.operators.{SimilarityOps => S}

/** Randomized differential tests for the ANN family: the exact baseline
  * ([[S.annBruteForce]]) must equal a driver-side brute force bit-for-bit
  * (round-4 cosine, ties by candidate id — this pins the native
  * dot_product expression and the top-k operator on data the fixed
  * fixtures never shaped), and each approximate variant's recall@10
  * against that baseline must clear a floor on a clustered corpus — the
  * regime ANN indexes exist for. Seeded generation makes every recall a
  * DETERMINISTIC number, so the floors are regression pins, not
  * statistical hopes.
  */
class RandomizedAnnDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8 // planted clusters = IVF cells (the `label` column)

  /** Graded-neighborhood corpus: 8 hypercube-corner centers; per center,
    * one query (vec_id < NumQueries, tiny noise) and 12 planted neighbors
    * with STEPPED noise levels, so successive true-neighbor cosines carry
    * gaps (~0.01-0.05) wider than any index's quantization error — recall
    * then measures the index, not tie-scrambling among near-duplicates.
    * 200 background vectors on random corners sit near cosine 0 to every
    * center.
    */
  private def genEmbeddings(seed: Int): Seq[(Long, Int, Array[Float])] = {
    val r = new scala.util.Random(seed * 97 + 13)
    val centers = Array.fill(K, S.Dim)(if (r.nextBoolean()) 1.0f else -1.0f)
    def around(c: Int, sigma: Double) = Array.tabulate(S.Dim)(j =>
      centers(c)(j) + (r.nextGaussian() * sigma).toFloat)
    var id = -1L
    def nid() = { id += 1; id }
    val queries = (0 until K).map(c => (nid(), c, around(c, 0.05)))
    val planted = for (c <- 0 until K; j <- 0 until 12)
      yield (nid(), c, around(c, 0.10 * (j + 1)))
    val background = (0 until 200).map { i =>
      (nid(), i % K, Array.fill(S.Dim)(
        (if (r.nextBoolean()) 1.0f else -1.0f) + (r.nextGaussian() * 0.2).toFloat))
    }
    queries ++ planted ++ background
  }

  private def writeEmb(rows: Seq[(Long, Int, Array[Float])]): String = {
    val dir = tmpDir("rannDiff")
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** The engine's exact ranking, replicated driver-side: left-to-right
    * double-widened dot products, round-4 HALF_UP cosine, ties by
    * candidate id, top-10 per query.
    */
  private def bruteTopK(rows: Seq[(Long, Int, Array[Float])]): Map[Long, Seq[Long]] = {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val nrm = rows.map { case (id, _, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = rows.map { case (id, _, v) => id -> v }.toMap
    rows.filter(_._1 < S.NumQueries).map { case (q, _, vq) =>
      val scored = rows.filter(_._1 != q).map { case (c, _, vc) =>
        val cos = java.math.BigDecimal.valueOf(dot(vq, vc) / (nrm(q) * nrm(c)))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        (c, cos)
      }
      q -> scored.sortBy(t => (-t._2, t._1)).take(S.TopK).map(_._1)
    }.toMap
  }

  private def engineTopK(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

  private def recall(approx: Map[Long, Seq[Long]], exact: Map[Long, Seq[Long]]): Double =
    exact.map { case (q, ids) =>
      approx.getOrElse(q, Seq.empty).toSet.intersect(ids.toSet).size.toDouble / ids.size
    }.sum / exact.size

  test("annBruteForce == driver-side exact ranking on random clustered embeddings") {
    Seq(6, 33).foreach { seed =>
      val rows = genEmbeddings(seed)
      val dir = writeEmb(rows)
      val got = engineTopK(S.annBruteForce(spark, dir))
      val want = bruteTopK(rows)
      assert(got == want, s"seed $seed: exact baseline diverged")
    }
  }

  test("approximate ANN variants clear deterministic recall@10 floors vs the exact baseline") {
    val rows = genEmbeddings(6)
    val dir = writeEmb(rows)
    val exact = engineTopK(S.annBruteForce(spark, dir))
    val rIvf = recall(engineTopK(S.annIvf(spark, dir)), exact)
    val rSq8 = recall(engineTopK(S.annSq8(spark, dir)), exact)
    val rPq = recall(engineTopK(S.annPq(spark, dir)), exact)
    val rLsh = recall(engineTopK(S.annLsh(spark, dir)), exact)
    info(f"recall@10 ivf=$rIvf%.3f sq8=$rSq8%.3f pq=$rPq%.3f lsh=$rLsh%.3f")
    // measured on this fixed seed: ivf 1.000, pq 0.913, sq8 0.863 (the
    // 8-bit grid still swaps adjacent planted ranks at the tight end),
    // lsh 0.438 (default banding on corner geometry). Floors sit under
    // those deterministic values with margin; a real index bug (wrong
    // cell routed, codebook corrupted, bands mis-hashed) collapses recall
    // toward the ~0.03 random baseline and fails every one of them.
    assert(rIvf >= 0.95, f"IVF recall $rIvf%.3f below floor")
    assert(rSq8 >= 0.80, f"SQ8 recall $rSq8%.3f below floor")
    assert(rPq >= 0.85, f"PQ recall $rPq%.3f below floor")
    assert(rLsh >= 0.35, f"LSH recall $rLsh%.3f below floor")
  }
}
