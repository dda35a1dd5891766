package graft

import graft.queries.{MonotoneRouteCache, PipelineQueries}
import graft.tools.{SloGate, StreamIngestBench}

/** Round-15 evidence hardening: a REFUSED bench run must be
  * self-adjudicating in the driver-recorded stdout artifact, the kn/dsir
  * route caches must key on data identity (a corpus replaced under the
  * same path re-probes), and the latency SLO gate must cover the measured
  * capacity knee, with a strict-at-parse bounds artifact.
  */
class Round15OpsSpec extends SparkSpec {

  // ---- bench refusal self-adjudication ------------------------------------

  test("committedSummary parses the committed BENCH_FULL.json and rejects junk") {
    // against the REAL committed artifact — the exact input the refusal
    // line will read in production
    val real = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_FULL.json")), "UTF-8")
    val parsed = Bench.committedSummary(real)
    assert(parsed.nonEmpty, "committed BENCH_FULL.json must parse")
    val (total, cs, ce) = parsed.get
    assert(total > 10 && total < 10000, s"total $total")
    assert(cs > 0 && cs < 5 && ce > 0 && ce < 5, s"canary $cs/$ce")
    // a corrupted artifact yields None, never a throw mid-bench
    assert(Bench.committedSummary("").isEmpty)
    assert(Bench.committedSummary("""{"value":"oops"}""").isEmpty)
    assert(Bench.committedSummary("""{"value":1.5}""").isEmpty,
      "missing canaries must not half-parse")
  }

  test("a refused run's stdout line carries the verdict AND the committed totals") {
    import Bench.adjudicationFields
    // a committed (non-refused) run adds nothing
    assert(adjudicationFields(None, Some("""{"value":1,"canary_start_s":0.1,"canary_end_s":0.1}""")) == "")
    val committed =
      """{"metric":"total","value":220.71738,"unit":"sec","repeat":3,""" +
        """"canary_start_s":0.10823,"canary_end_s":0.07792,"queries":{"a":1.0}}"""
    val f = adjudicationFields(
      Some("canary out of bounds: start=0.150 / end=0.080 s vs pinned 0.140"),
      Some(committed))
    // parsed fields, not prose in a tail: the driver records this line
    assert(f.contains(""""refused":"canary out of bounds"""), f)
    assert(f.contains(""""committed_total":220.72"""), f)
    assert(f.contains(""""committed_canary":[0.108,0.078]"""), f)
    // the fragment must splice into a JSON object without corrupting it:
    // leading comma, balanced quotes/brackets
    assert(f.startsWith(","), f)
    assert(f.count(_ == '"') % 2 == 0, f)
    // refusal text is scrubbed — one raw quote/backslash/control char
    // would corrupt the whole line the driver parses
    val dirty = adjudicationFields(Some("why \"quoted\"\\backslash\u0007bell"), None)
    assert(!dirty.drop(",\"refused\":\"".length).dropRight(1).exists(c =>
      c == '"' || c == '\\' || c.isControl), dirty)
    // a refusal with an unreadable committed artifact still self-flags
    assert(adjudicationFields(Some("why"), None) == ""","refused":"why"""")
  }

  // ---- monotone route caches on data identity ------------------------------

  test("MonotoneRouteCache: positive-only memo with LRU eviction, not clear-all") {
    val c = new MonotoneRouteCache(maxEntries = 3)
    var calls = 0
    def probe(v: Boolean): Boolean = { calls += 1; v }
    assert(c.crossed("a")(probe(true)) && calls == 1)
    // memoized: the (contradictory) probe never runs
    assert(c.crossed("a")(probe(false)) && calls == 1)
    assert(c.probes.get() == 1)
    // the NEGATIVE verdict is never memoized — a grown corpus must re-probe
    assert(!c.crossed("b")(probe(false)) && calls == 2)
    assert(!c.crossed("b")(probe(false)) && calls == 3)
    // eviction is LRU and one-at-a-time (the r14 twins cleared the WHOLE
    // set on overflow, evicting hot entries with cold): fill to capacity,
    // touch the oldest, overflow — the untouched middle entry goes, the
    // touched oldest survives
    assert(c.crossed("c")(probe(true)) && calls == 4)
    assert(c.crossed("d")(probe(true)) && calls == 5)
    assert(c.crossed("a")(probe(false)) && calls == 5) // LRU-touch "a"
    assert(c.crossed("e")(probe(true)) && calls == 6)
    assert(c.size == 3)
    assert(c.containsKey("a") && c.containsKey("d") && c.containsKey("e"))
    assert(!c.containsKey("c"), "evict the least-recently-used, and only it")
  }

  test("route caches re-probe and re-route when a corpus is replaced under the same path") {
    import spark.implicits._
    import graft.plans.MaterializedRollup.dataFingerprint
    val dir = tmpDir("route-fp")
    val docsPath = s"$dir/documents.parquet"
    def write(texts: Seq[String]): Unit =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, "en", "src", t) }
        .toDF("doc_id", "lang", "source", "text")
        .write.mode("overwrite").parquet(docsPath)
    // dir-specific cache keys, so concurrent suites touching the shared
    // caches (the round-11/13 cutover tests route sf0.001) cannot race
    // these assertions
    spark.conf.set("spark.graft.kn.cmsTypeCutover", "4")
    spark.conf.set("spark.graft.dsir.cmsVocabCutover", "4")
    try {
      // ---- kn: 5 distinct bigrams >= cutover 4 -> crossed, memoized ----
      write(Seq("a b c d e f"))
      val fpBig = dataFingerprint(spark, docsPath)
      val bigBi = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"))
        .toDF("w1", "w2")
      val smallBi = Seq(("a", "b")).toDF("w1", "w2")
      assert(PipelineQueries.knUseCms(spark, dir, bigBi))
      assert(PipelineQueries.knRouteCache.containsKey((dir, 4L, fpBig)),
        "positive verdict must be memoized under the full data-identity key")
      // REPLACE the corpus under the same path (the round-9 driver-data
      // regeneration / reused-fixture case): the listing fingerprint
      // changes, the memo misses, and the route re-probes — and routes
      // back to the EXACT path for the shrunken corpus. A (dir, cutover)
      // key would have answered TRUE here from the stale memo.
      write(Seq("a b"))
      val fpSmall = dataFingerprint(spark, docsPath)
      assert(fpSmall != fpBig, "replacing the files must change the fingerprint")
      assert(!PipelineQueries.knUseCms(spark, dir, smallBi),
        "replaced-and-shrunk corpus must re-route to exact")
      assert(!PipelineQueries.knRouteCache.containsKey((dir, 4L, fpSmall)),
        "the negative verdict must stay unmemoized (append-only growth re-probes)")

      // ---- dsir twin through the same shared helper ----
      write(Seq("v w x y z"))
      val fpBig2 = dataFingerprint(spark, docsPath)
      val bigToks = Seq("v", "w", "x", "y", "z").toDF("w")
      val smallToks = Seq("v").toDF("w")
      assert(PipelineQueries.dsirUseCms(spark, dir, bigToks))
      assert(PipelineQueries.dsirRouteCache.containsKey((dir, 4L, fpBig2)))
      write(Seq("v"))
      assert(!PipelineQueries.dsirUseCms(spark, dir, smallToks))
      assert(!PipelineQueries.dsirRouteCache.containsKey(
        (dir, 4L, dataFingerprint(spark, docsPath))))
    } finally {
      spark.conf.set("spark.graft.kn.cmsTypeCutover", "0")
      spark.conf.set("spark.graft.dsir.cmsVocabCutover", "0")
    }
  }

  // ---- knee-adjacent SLO tier ----------------------------------------------

  test("SLO_BOUNDS pins a knee-adjacent tier and the verdict gates a capacity loss") {
    val b = SloGate.parseBounds(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SLO_BOUNDS.json")), "UTF-8"))
    // the measured capacity knee sits between 1M (p99 ~1.4 s idle) and 2M
    // rows/s (backlogs at ~21 s): without a tier NEAR the knee, a capacity
    // regression to ~600k rows/s would pass the 300k/500k band tiers
    assert(b.p99MsByRps.contains(1000000L), "knee-adjacent 1M tier missing")
    assert(b.p99MsByRps(1000000L) >= 2000 && b.p99MsByRps(1000000L) <= 3500,
      "the knee tier's bound must sit in the same margin class over its ~1.4 s idle p99")
    def res(rps: Long, p99: Double) = StreamIngestBench.LatencyResult(
      rps, p99 / 2, p99 * 0.9, p99, p99 * 1.1, b.waves, b.intervalMs, 250000L)
    // the measured idle knee p99 passes; the measured past-knee backlog
    // signature (the 2M regime's 21 s) fails loudly
    assert(SloGate.violations(Seq(res(1000000L, 1420.0)), b).isEmpty)
    val bad = SloGate.violations(Seq(res(1000000L, 21000.0)), b)
    assert(bad.size == 1 && bad.head._2.contains("p99"), bad.toString)
  }

  test("BoxCanary: shared quiet-bound model and loaded-box verdict") {
    import graft.tools.BoxCanary
    // the Bench bound model, now shared by both gates: 0.14 s pinned at
    // local[32], ~linear in 32/cpus below, clamped at the pin above
    assert(BoxCanary.quietBound("32", None) == 0.14)
    assert(math.abs(BoxCanary.quietBound("4", None) - 1.12) < 1e-9)
    assert(BoxCanary.quietBound("64", None) == 0.14,
      "a 32-partition canary cannot beat the local[32] pin — don't shrink the bound")
    // non-numeric cpus (the local[*] builder path) falls back instead of
    // throwing after a full measurement has already run
    assert(BoxCanary.quietBound("*", None) == 0.14)
    assert(BoxCanary.quietBound("32", Some("0.5")) == 0.5, "explicit re-pin wins")
    // the verdict that turns a gate failure into "loaded box", never
    // "phantom regression"
    assert(BoxCanary.verdict(0.12, 0.14).isEmpty)
    assert(BoxCanary.verdict(0.14, 0.14).isEmpty, "exactly at the bound is quiet")
    val loaded = BoxCanary.verdict(0.31, 0.14)
    assert(loaded.exists(_.contains("loaded")), loaded.toString)
  }

  test("SloGate.parseBounds rejects non-positive waves/interval at parse time") {
    // waves=0 used to crash DEEP in measurement (lats.max on an empty
    // sample, after the stream already ran); the contract is strict parse
    intercept[IllegalArgumentException] {
      SloGate.parseBounds("""{"waves":0,"interval_ms":250,"p99_ms":{"1000":1500}}""")
    }
    intercept[IllegalArgumentException] {
      SloGate.parseBounds("""{"waves":80,"interval_ms":0,"p99_ms":{"1000":1500}}""")
    }
    // the committed artifact itself satisfies the stricter contract
    val b = SloGate.parseBounds(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SLO_BOUNDS.json")), "UTF-8"))
    assert(b.waves > 0 && b.intervalMs > 0)
  }
}
