package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Round-9 operator pins: boilerplate fixed point. */
class Round9OpsSpec extends SparkSpec {

  /** Crafted 100-doc corpus (threshold = ceil(0.07·100) = 7) where one
    * pass is NOT a fixed point: "x y" is frequent (df 15) and its excision
    * makes "u v" adjacent in group A, pushing df("u v") from 4 (group C
    * only — below threshold) to 9 — frequent ONLY in round 2.
    */
  private def craftedDocs = {
    import spark.implicits._
    val a = (0 until 5).map(i => (100L + i, "u x y v"))
    val b = (0 until 10).map(i => (200L + i, s"w$i x y z$i"))
    val c = (0 until 4).map(i => (300L + i, s"s$i u v t$i"))
    val filler = (0 until 81).map(i => (400L + i, s"f$i"))
    (a ++ b ++ c ++ filler).toDF("doc_id", "text")
  }

  test("boilerplate fixpoint: round 2 excises a window created by round 1") {
    val fp = TextOps.boilerplateScrubFixpointOver(craftedDocs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // group A: "u x y v" -> r1 removes "x y" -> "u v" -> r2 removes it -> ""
    for (i <- 0 until 5) {
      val r = fp(100L + i)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((1, 1, 0)), r)
      assert(r.getString(4) == "" && r.getInt(5) == 0, r)
    }
    // group B: loses "x y" in round 1, then stable (unique pairs)
    for (i <- 0 until 10) {
      val r = fp(200L + i)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((1, 0, 0)), r)
      assert(r.getString(4) == s"w$i z$i" && r.getInt(5) == 2, r)
    }
    // group C: untouched in round 1 (df("u v")=4 < 7), loses "u v" in round 2
    for (i <- 0 until 4) {
      val r = fp(300L + i)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((0, 1, 0)), r)
      assert(r.getString(4) == s"s$i t$i" && r.getInt(5) == 2, r)
    }
    // filler: never touched
    val f0 = fp(400L)
    assert((f0.getInt(1), f0.getInt(2), f0.getInt(3)) == ((0, 0, 0)))
    assert(f0.getString(4) == "f0" && f0.getInt(5) == 1)
  }

  test("boilerplate fixpoint: converged output is a true fixed point") {
    // a wider unroll changes nothing: round 4 is a structural no-op and
    // every clean_text is identical — which is also the property that makes
    // the fixed-3-round oracle SQL exact for an early-exiting loop
    val r3 = TextOps.boilerplateScrubFixpointOver(craftedDocs)
      .select("doc_id", "clean_text", "n_tokens_kept").collect().toSeq
    val r4df = TextOps.boilerplateScrubFixpointOver(craftedDocs, maxRounds = 4)
    assert(r4df.columns.toSeq ==
      Seq("doc_id", "n_spans_r1", "n_spans_r2", "n_spans_r3", "n_spans_r4",
        "clean_text", "n_tokens_kept"))
    assert(r4df.agg(sum("n_spans_r4")).first().getLong(0) == 0L)
    val r4 = r4df.select("doc_id", "clean_text", "n_tokens_kept").collect().toSeq
    assert(r3 == r4)
  }

  test("boilerplate fixpoint on the documents table matches the one-pass scrub's round 1") {
    // on the real corpus, round-1 excisions equal the one-pass operator's
    // n_spans doc for doc (same threshold, same windows)
    val onePass = TextOps.boilerplateScrub(spark, sf0001)
      .select("doc_id", "n_spans").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fp = TextOps.boilerplateScrubFixpoint(spark, sf0001)
      .select("doc_id", "n_spans_r1").collect()
    assert(fp.nonEmpty)
    fp.foreach(r => assert(r.getInt(1) == onePass(r.getLong(0)), r))
  }
}
