package graft

import org.apache.spark.sql.functions._
import graft.operators.RetrievalOps

/** BM25 posting-list retrieval: exact scores on a crafted corpus, the
  * candidate prefilter, and the scale shape of the top-k plan.
  */
class RetrievalOpsSpec extends SparkSpec {

  test("bm25 exact on a crafted corpus (hand-computed reference)") {
    import spark.implicits._
    // vocabulary overlaps QueryTerms = vector, window, fast, key
    val corpus = Seq(
      (1L, "vector vector window sort"), // tf(vector)=2, tf(window)=1, dl=4
      (2L, "fast key merge"),            // tf(fast)=1, tf(key)=1,  dl=3
      (3L, "sort merge batch"),          // no query terms,          dl=3
      (4L, "key"))                       // tf(key)=1,               dl=1
      .toDF("doc_id", "text")
    val dir = tmpDir("bm25")
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = RetrievalOps.bm25TopK(spark, dir, k = 10).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    // reference scorer, same formula in plain Scala
    val n = 4.0; val avgdl = 11.0 / 4.0
    def idf(df: Int) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def part(tf: Int, df: Int, dl: Int) = {
      val raw = idf(df) * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val exp1 = part(2, 1, 4) + part(1, 1, 4) // vector df=1, window df=1
    val exp2 = part(1, 1, 3) + part(1, 2, 3) // fast df=1, key df=2
    val exp4 = part(1, 2, 1)
    assert(got.keySet == Set(1L, 2L, 4L)) // doc 3 has no query term
    assert(math.abs(got(1L)._1 - exp1) < 1e-9, s"${got(1L)} vs $exp1")
    assert(math.abs(got(2L)._1 - exp2) < 1e-9, s"${got(2L)} vs $exp2")
    assert(math.abs(got(4L)._1 - exp4) < 1e-9, s"${got(4L)} vs $exp4")
    assert(got(1L)._2 == 2 && got(2L)._2 == 2 && got(4L)._2 == 1)
  }

  test("postings prefilter: documents without any query term never explode") {
    import spark.implicits._
    val corpus = Seq((1L, "vector sort"), (2L, "merge batch"), (3L, "key key"))
      .toDF("doc_id", "text")
    val dir = tmpDir("bm25pf")
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p = RetrievalOps.postings(spark, dir, RetrievalOps.QueryTerms)
    assert(p.select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // the exists() candidate filter sits below the explode in the plan
    val plan = p.queryExecution.executedPlan.toString
    assert(plan.contains("exists"), plan)
    assert(plan.indexOf("Generate") < plan.indexOf("exists"), plan)
  }

  test("top-k plan: bounded-heap take, broadcast stats join, no global sort") {
    val plan = RetrievalOps.bm25TopK(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the only Sort allowed is inside TakeOrderedAndProject (none standalone)
    assert(!plan.linesIterator.exists(l => l.trim.startsWith("+- Sort") ||
      l.trim.startsWith("Sort ")), plan)
  }

  test("sf0.001 ranking is deterministic and bounded by k") {
    val a = RetrievalOps.bm25TopK(spark, sf0001).collect()
    val b = RetrievalOps.bm25TopK(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length <= 15 && a.length > 0)
    // scores non-increasing
    a.map(_.getDouble(1)).sliding(2).foreach(p => assert(p(1) <= p(0)))
  }

  test("rrf fusion: scores recompute from the leg ranks; lex ranks match bm25 order") {
    val rows = RetrievalOps.rrfFusion(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val k0 = RetrievalOps.RrfK0
    rows.foreach { r =>
      val (rl, rd) = (r.getInt(2), r.getInt(3))
      assert(rl > 0 || rd > 0, s"doc ${r.getLong(0)} retrieved by neither leg")
      assert(rl <= RetrievalOps.LegK && rd <= RetrievalOps.LegK)
      val want = BigDecimal(
        (if (rl > 0) 1.0 / (k0 + rl) else 0.0) +
          (if (rd > 0) 1.0 / (k0 + rd) else 0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(1) == want, s"rrf mismatch on ${r.getLong(0)}: $r")
    }
    // output sorted by (rrf desc, doc_id)
    rows.sliding(2).foreach { p =>
      if (p.length == 2)
        assert(p(1).getDouble(1) < p(0).getDouble(1) ||
          (p(1).getDouble(1) == p(0).getDouble(1) && p(1).getLong(0) > p(0).getLong(0)))
    }
    // the lexical leg's rank order IS the bm25 top-k order
    val bmOrder = RetrievalOps.bm25TopK(spark, sf0001, RetrievalOps.LegK)
      .collect().map(_.getLong(0))
    rows.filter(_.getInt(2) > 0).foreach { r =>
      assert(bmOrder(r.getInt(2) - 1) == r.getLong(0),
        s"r_lex ${r.getInt(2)} is not bm25 position for doc ${r.getLong(0)}")
    }
  }

  test("rrf fusion plan: leg truncation is a bounded heap, dense query is broadcast") {
    // plan-assertion convention: AQE off so the executed plan is the real
    // tree, not an AdaptiveSparkPlan wrapper around an initial plan
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = RetrievalOps.rrfFusion(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), plan)
      assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
