package graft

import graft.queries.PipelineQueries
import graft.tools.{SloGate, StreamIngestBench}

/** Round-14 evidence hardening: the bench canary must GATE commits (not
  * just annotate them), the latency SLO must be a failing verdict, and
  * `d_lev_fuzzy` must be provably non-vacuous (a 0-row oracle match
  * cannot distinguish a correct blocked Levenshtein from one that never
  * matches anything).
  */
class Round14OpsSpec extends SparkSpec {

  // ---- Bench canary commit gate ------------------------------------------

  test("canaryVerdict: quiet box passes, loaded or load-shifted box refuses") {
    import Bench.canaryVerdict
    // both ends inside the pinned idle band: commit
    assert(canaryVerdict(0.10, 0.12, bound = 0.14, maxRatio = 1.5).isEmpty)
    // r13's exact committed artifact (start 0.168, end 0.064): refuse —
    // the board ran on a loaded box and overstated itself ~30%
    val r13 = canaryVerdict(0.168, 0.064, bound = 0.14, maxRatio = 1.5)
    assert(r13.exists(_.contains("out of bounds")), r13.toString)
    // end loaded is just as disqualifying as start loaded
    assert(canaryVerdict(0.08, 0.20, 0.14, 1.5).exists(_.contains("out of bounds")))
    // both ends under the bound but the END slowed: load ARRIVED
    // mid-board — the late alphabet silently inflated (the r12 drift
    // signature) — refuse with the drift reason
    val shift = canaryVerdict(0.06, 0.13, bound = 0.14, maxRatio = 1.5)
    assert(shift.exists(_.contains("slowed mid-board")), shift.toString)
    // the drift check is DIRECTIONAL: a faster end is JVM maturity (the
    // end canary runs after ~280 queries of C2 compilation; measured idle
    // runs read start 0.14 / end 0.06) and only makes the figures
    // conservative — commit
    assert(canaryVerdict(0.139, 0.058, 0.14, 1.5).isEmpty)
    // boundary: exactly at the bound and exactly at the ratio both pass
    assert(canaryVerdict(0.14, 0.14, 0.14, 1.5).isEmpty)
    assert(canaryVerdict(0.06, 0.09, 0.14, 1.5).isEmpty)
  }

  // ---- latency-SLO gate verdict logic -------------------------------------

  test("SloGate.parseBounds: committed artifact parses; malformed fails loudly") {
    val b = SloGate.parseBounds(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SLO_BOUNDS.json")), "UTF-8"))
    assert(b.waves > 0 && b.intervalMs > 0)
    // the reference's published sustained band must both be gated
    assert(b.p99MsByRps.contains(300000L) && b.p99MsByRps.contains(500000L))
    // bounds are regression-class thresholds: above the measured ~1 s
    // idle p99, far below anything a per-batch cost regression would read
    b.p99MsByRps.foreach { case (rps, ms) =>
      assert(ms >= 1000 && ms <= 5000, s"$rps: $ms") }
    intercept[IllegalArgumentException] { SloGate.parseBounds("{}") }
    intercept[IllegalArgumentException] {
      SloGate.parseBounds("""{"waves":80,"interval_ms":250}""") }
    intercept[IllegalArgumentException] {
      SloGate.parseBounds("""{"waves":80,"interval_ms":250,"p99_ms":{}}""") }
  }

  test("SloGate.violations: regressions fail, jitter passes, unbounded tiers flag") {
    def res(rps: Long, p99: Double) = StreamIngestBench.LatencyResult(
      rps, p99 / 2, p99 * 0.9, p99, p99 * 1.1, 80, 250L, 75000L)
    val b = SloGate.Bounds(80, 250L, Map(300000L -> 1500.0, 500000L -> 1500.0))
    // measured idle band (r13: p99 996/967 ms): pass
    assert(SloGate.violations(Seq(res(300000L, 996), res(500000L, 967)), b).isEmpty)
    // a per-batch cost regression (p99 past the bound): fail, named
    val bad = SloGate.violations(Seq(res(300000L, 2100), res(500000L, 900)), b)
    assert(bad.size == 1 && bad.head._1.offeredRps == 300000L)
    assert(bad.head._2.contains("p99"), bad.head._2)
    // a tier measured without a committed bound is a coverage bug, not a pass
    val uncov = SloGate.violations(Seq(res(700000L, 500)), b)
    assert(uncov.size == 1 && uncov.head._2.contains("no committed bound"))
    // exactly at the bound passes (the bound is the first failing value's cap)
    assert(SloGate.violations(Seq(res(300000L, 1500)), b).isEmpty)
  }

  // ---- d_lev_fuzzy de-vacuation -------------------------------------------

  test("levFuzzy pins the exact match set on a seeded edit-distance corpus") {
    import spark.implicits._
    val dir = tmpDir("lev-seed")
    val x60 = "x" * 60
    Seq(
      // doc 1 vs doc 2: identical 60-char prefixes (edits live past the
      // prefix) -> lev 0, same lang, same 16-char length bucket: THE match
      (1L, "en", "seed", x60 + "aaaa", 64L),
      (2L, "en", "seed", x60 + "bbzz", 64L),
      // doc 3: same (lang, bucket) but prefix-distance 60 > 30: candidate
      // pair generated, predicate rejects it (an inverted predicate would
      // keep exactly this pair and drop (1,2))
      (3L, "en", "seed", "q" * 64, 64L),
      // doc 4: byte-identical text to doc 1 but lang-blocked out
      (4L, "de", "seed", x60 + "aaaa", 64L),
      // doc 5: identical prefix to doc 1 but a different length bucket —
      // blocked out (the documented boundary-recall tradeoff)
      (5L, "en", "seed", x60 + "y" * 140, 200L)
    ).toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.levFuzzy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 2L, 0)), s"match set: ${got.toList}")
  }

  test("q22NoOrders pins its predicate directions on a seeded micro-warehouse") {
    // the board's one remaining 0-row-green oracle (data-legitimate at
    // sf0.01: every above-average-balance customer has orders there) — a
    // 0-row hash match cannot distinguish the correct anti-join from an
    // inverted one, so pin the exact output on seeded data where every
    // branch matters: 3 has orders (anti-join must drop), 5 doesn't
    // (keep), 6 sits EXACTLY at the positive-balance average (strict >
    // must drop), 4 is negative (excluded from the average)
    import spark.implicits._
    val dir = tmpDir("q22-seed")
    Seq(
      (1L, "SEG_A", 100.0), (2L, "SEG_A", 500.0), (3L, "SEG_B", 900.0),
      (4L, "SEG_B", -50.0), (5L, "SEG_A", 600.0), (6L, "SEG_C", 525.0)
    ).toDF("c_custkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // positive-balance average = (100+500+900+600+525)/5 = 525.0 exactly
    val got = PipelineQueries.q22NoOrders(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("SEG_A", 1L, 600.0)), s"q22 result: ${got.toList}")
  }

  test("d_lev_fuzzy is non-vacuous at every committed test SF") {
    // the r13 vacuity: 0 rows at sf0.01 hash-matched a 0-row oracle. The
    // bucketed blocking key must yield real matches at the smallest SF
    // (and therefore at the larger ones, which superset the corpus shapes).
    assert(PipelineQueries.levFuzzy(spark, sf0001).limit(1).count() == 1L)
  }
}
