package graft

import org.apache.spark.sql.DataFrame
import graft.queries.PipelineQueries

/** Round-13 hardening: the Kneser–Ney sketch path ([[PipelineQueries
  * .knBigramCms]]) must preserve the exact path's document ranking, route
  * automatically under the type-count cutover, and keep the sketch-free
  * figures (n_bigrams, doc set) exactly.
  */
class Round13OpsSpec extends SparkSpec {

  private def byDoc(df: DataFrame): Map[Long, (Long, Option[Double])] =
    df.collect().map { r =>
      r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toMap

  /** Top-quartile doc set by (xent desc, doc_id) — the rank statistic a
    * curation board consumes (high xent = improbable text to drop).
    */
  private def topQuartile(m: Map[Long, (Long, Option[Double])]): Set[Long] = {
    val scored = m.toSeq.collect { case (id, (_, Some(x))) => (id, x) }
      .sortBy { case (id, x) => (-x, id) }
    scored.take(math.max(1, scored.size / 4)).map(_._1).toSet
  }

  test("knBigramCms preserves the exact ranking (>= 97% top-quartile overlap)") {
    val exact = byDoc(PipelineQueries.knBigram(spark, sf0001))
    val cms = byDoc(PipelineQueries.knBigramCms(spark, sf0001))
    // sketch-free figures are EXACT: same docs, same bigram counts, same
    // NULL set (docs with < 2 tokens)
    assert(exact.keySet == cms.keySet)
    assert(exact.forall { case (k, (n, x)) =>
      cms(k)._1 == n && cms(k)._2.isDefined == x.isDefined })
    val (qe, qc) = (topQuartile(exact), topQuartile(cms))
    val overlap = qe.intersect(qc).size.toDouble / qe.size
    assert(overlap >= 0.97, s"top-quartile overlap $overlap")
  }

  test("knBigramCms is EXACTLY knBigram where the sketch is collision-free") {
    // a toy corpus keeps every CMS estimate exact (no collisions at this
    // cardinality), so the sketch path must reproduce the exact path
    // bit-for-bit — scores included, not just ranks
    import spark.implicits._
    val dir = tmpDir("kn-toy")
    Seq(
      (1L, "en", "src", "the cat sat on the mat"),
      (2L, "en", "src", "the cat ran"),
      (3L, "en", "src", "a dog sat"),
      (4L, "en", "src", "single"),           // < 2 tokens -> NULL xent
      (5L, "en", "src", "the mat sat on the cat")
    ).toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = byDoc(PipelineQueries.knBigram(spark, dir))
    val cms = byDoc(PipelineQueries.knBigramCms(spark, dir))
    assert(exact == cms, s"\nexact: $exact\ncms:   $cms")
    assert(exact(4L)._2.isEmpty, "a 1-token doc must score NULL")
    assert(exact.size == 5)
  }

  test("the type-count cutover routes knBigram onto the sketch path") {
    spark.conf.set("spark.graft.kn.cmsTypeCutover", "1")
    try {
      val routed = byDoc(PipelineQueries.knBigram(spark, sf0001))
      val direct = byDoc(PipelineQueries.knBigramCms(spark, sf0001))
      assert(routed == direct, "cutover must route to the CMS path")
    } finally spark.conf.set("spark.graft.kn.cmsTypeCutover", "0")
  }

  test("knBigramCms audits clean and never shuffles on the bigram key") {
    val df = PipelineQueries.knBigramCms(spark, sf0001)
    val errs = graft.tools.PlanAudit.audit(df).filter(_.severity == "error")
    assert(errs.isEmpty, errs.toString)
    // the design claim: after the sketch builds, scoring is map-only —
    // no exchange in the SCORING plan may hash-partition on w1/w2/bg
    // (the only legal shuffles are the per-doc rollup and the sort).
    // AQE off for the walk: AdaptiveSparkPlanExec hides its children from
    // a pre-execution collect.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exchanges = PipelineQueries.knBigramCms(spark, sf0001)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.outputPartitioning.toString
        }
      assert(exchanges.nonEmpty) // per-doc rollup exists
      exchanges.foreach { p =>
        assert(!p.contains("w1") && !p.contains("w2") && !p.contains("bg"),
          s"bigram-key shuffle in the CMS scoring plan: $p")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // ---- streaming-ingest latency SLO measurement machinery ----------------

  test("waveLatencies maps each wave to its committing batch's wall clock") {
    import graft.tools.StreamIngestBench.waveLatencies
    // 3 waves of 100 rows published at t=0/10/20; batches commit at
    // t=5 (80 rows: covers nothing), t=12 (220: covers waves 1+2),
    // t=30 (300: covers wave 3). base=1000 rows from an earlier phase.
    val events = Seq((5L, 1080L), (12L, 1220L), (30L, 1300L))
    val lats = waveLatencies(Seq(0L, 10L, 20L), events, 100L, base = 1000L)
    assert(lats == Seq(12L, 2L, 10L))
    // a wave the stream never commits is a dropped-row bug, not a sample
    intercept[IllegalStateException] {
      waveLatencies(Seq(0L, 10L), Seq((5L, 1100L)), 100L, base = 1000L)
    }
  }

  test("percentile: nearest-rank on small SLO samples") {
    import graft.tools.StreamIngestBench.percentile
    val xs = Seq(5.0, 1.0, 3.0, 2.0, 4.0)
    assert(percentile(xs, 50) == 3.0)
    assert(percentile(xs, 99) == 5.0)
    assert(percentile(xs, 1) == 1.0)
    assert(percentile(Seq(7.5), 99) == 7.5)
  }
}
