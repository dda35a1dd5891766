package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.CalibrateCanary

/** Round-17 gate-layer hardening: the bench commit gate grows a per-query
  * drift arm (the canary's proven mid-board blind spot — r16's driver board
  * passed BOTH canaries yet inflated 55/277 medians and overwrote the board
  * of record), refused runs carry a calibration probe so a refusal streak
  * self-adjudicates into "bound drifted" vs "box loaded", and the even-count
  * median bias in the calibration tool is fixed. Every assertion here runs
  * the PURE helpers on the real committed artifacts — including a replay of
  * the actual r16 contaminated board preserved under src/test/resources.
  */
class Round17OpsSpec extends AnyFunSuite {

  private def read(p: String) = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  private def medMin(json: String): Seq[(String, (Double, Double))] = {
    val med = Bench.boardMap(json, "queries")
    val mn = Bench.boardMap(json, "queries_min")
    med.toSeq.map { case (k, v) => k -> ((v, mn.getOrElse(k, v))) }
  }

  private val ContaminatedPath = "src/test/resources/BENCH_contaminated_r16.json"

  // ---- artifact parsing -----------------------------------------------------

  test("boardMap / committedBoard parse the committed artifact; garbled inputs degrade") {
    val quiet = read("BENCH_FULL.json")
    val qs = Bench.boardMap(quiet, "queries")
    val mins = Bench.boardMap(quiet, "queries_min")
    assert(qs.size > 250 && qs.size == mins.size,
      s"full board expected: ${qs.size} medians / ${mins.size} mins")
    val Some((cMeds, cMins)) = Bench.committedBoard(quiet): @unchecked
    assert(cMeds == qs)
    assert(cMins == mins)
    // the writer invariant, not a pinned figure (the board of record is
    // re-captured across rounds): "value" is exactly the sum of medians
    val total = """"value"\s*:\s*([0-9.eE+-]+)""".r.findFirstMatchIn(quiet)
      .get.group(1).toDouble
    assert(math.abs(total - qs.values.sum) < 1e-6, s"total $total vs median sum")
    // mins are mins: never above the medians they pair with
    qs.foreach { case (k, med) => assert(mins(k) <= med + 1e-12, k) }
    // garbled inputs: empty map / None, never a throw
    assert(Bench.boardMap("", "queries").isEmpty)
    assert(Bench.boardMap("""{"queries":{}}""", "queries").isEmpty)
    assert(Bench.committedBoard("").isEmpty)
    assert(Bench.committedBoard("""{"value":214.66}""").isEmpty,
      "a board without the min column cannot adjudicate drift")
    assert(Bench.committedBoard("""{"queries_min":{"a":1.0}}""").isEmpty)
  }

  // ---- the drift arm: replay the REAL r16 event ----------------------------

  test("driftVerdict replays the r16 contaminated board as refused — by BOTH arms") {
    val cont = medMin(read(ContaminatedPath))
    assert(cont.size > 250, s"fixture must be the full board: ${cont.size}")
    // arm (b)'s replay compares against the PRESERVED r17 quiet board —
    // the board contemporaneous with the r16 event — NOT the live
    // BENCH_FULL.json: the r18 optimization round made the committed
    // board ~21% faster per query, so the stale contamination's mins now
    // legitimately read as a genuine regression against the CURRENT board
    // (min-ratio > 1.35 → arm (b) commits, exactly as designed). The
    // regression test's subject is the r16 adjudication, so it replays
    // against the r16-era reference.
    val committed = Bench.committedBoard(
      read("src/test/resources/BENCH_quiet_r17.json"))
    assert(committed.nonEmpty)
    // arm (a) alone — no committed board needed: the run's own med/min
    // spreads (g_unpivot 22.6x, x_bootstrap_ci 20.4x, x_merkle_diff 3.4x,
    // r_bm25_topk 2.8x, x_conformal 2.7x) are the fingerprint
    val a = Bench.driftVerdict(cont, committed = None)
    assert(a.exists(_.contains("per-query drift")), a.toString)
    assert(a.exists(_.contains("g_unpivot")), "worst offender named: " + a)
    // arm (b) alone (spread arm disabled by an absurd cap): the live
    // total (408.99 s) is >1.8x the contemporaneous quiet board
    // (223.08 r17) while the min column's median live/committed ratio is
    // ~1.1-1.2 <= 1.35 — plans unchanged, box load
    val b = Bench.driftVerdict(cont, committed, spreadCap = 1e9)
    assert(b.exists(_.contains("board inflated")), b.toString)
    // the full verdict (both arms armed) refuses
    assert(Bench.driftVerdict(cont, committed).nonEmpty)
  }

  test("driftVerdict replays the quiet board of record as committed") {
    val quiet = read("BENCH_FULL.json")
    val qm = medMin(quiet)
    // vs itself (the steady-state re-bench case: total ratio 1.0): commits
    assert(Bench.driftVerdict(qm, Bench.committedBoard(quiet)).isEmpty)
    // spread arm on the quiet board: worst committed quiet spread is 2.17x
    // (x_bootstrap_ci, adjudicated as heap debt) — under the 2.5x cap
    assert(Bench.driftVerdict(qm, None).isEmpty)
  }

  test("arm (b) lets a genuine board-wide regression commit, refuses pure box inflation") {
    // synthetic board: 60 queries, committed median 1.0 / min 0.9 each
    // (shared committed total 60)
    val committed = Some(((1 to 60).map(i => s"q$i" -> 1.0).toMap,
      (1 to 60).map(i => s"q$i" -> 0.9).toMap))
    // genuine regression: medians AND mins both moved (min ratio
    // 1.35/0.9 = 1.5 > 1.35 cap) — must COMMIT so the regression stays
    // visible (spread 2.0/1.35 = 1.48 keeps arm (a) silent)
    val regressed = (1 to 60).map(i => s"q$i" -> ((2.0, 1.35)))
    assert(Bench.driftVerdict(regressed, committed).isEmpty)
    // box inflation: inflated medians (total 120 > 1.5 x 60) but mins
    // still near committed (ratio 1.1/0.9 = 1.22 <= 1.35; spread
    // 2.0/1.1 = 1.8x keeps arm (a) silent, isolating arm (b)) — refused
    val boxed = (1 to 60).map(i => s"q$i" -> ((2.0, 1.1)))
    val v = Bench.driftVerdict(boxed, committed)
    assert(v.exists(_.contains("board inflated")), v.toString)
    // below the box band (total 84 < 1.5 x 60): commits either way
    val mild = (1 to 60).map(i => s"q$i" -> ((1.4, 1.1)))
    assert(Bench.driftVerdict(mild, committed).isEmpty)
    // board GROWTH: 30 new heavy queries (not in the committed maps) push
    // the raw live total to 2.7x the committed 60 — but the shared subset
    // is quiet, so the run commits instead of false-refusing
    val grown = (1 to 60).map(i => s"q$i" -> ((1.05, 0.95))) ++
      (1 to 30).map(i => s"new$i" -> ((3.5, 3.4)))
    assert(Bench.driftVerdict(grown, committed).isEmpty)
  }

  test("driftVerdict guards: partial boards, zero mins, ms-scale noise") {
    val committed = Some(((1 to 60).map(i => s"q$i" -> 1.0).toMap,
      (1 to 60).map(i => s"q$i" -> 0.9).toMap))
    // a partial SPARK_GRAFT_ONLY board (3 queries) never reaches arm (b),
    // whatever its totals look like
    val partial = Seq("q1" -> ((200.0, 90.0)), "q2" -> ((200.0, 90.0)))
    assert(Bench.driftVerdict(partial, committed, spreadCap = 1e9).isEmpty)
    // millisecond-scale queries spread wildly on scheduler noise — the
    // medFloor keeps them out of arm (a)'s count
    val tiny = (1 to 10).map(i => s"t$i" -> ((0.04, 0.008)))
    assert(Bench.driftVerdict(tiny, None).isEmpty)
    // ...but the same spreads above the floor DO count
    val loud = (1 to 10).map(i => s"t$i" -> ((4.0, 0.8)))
    assert(Bench.driftVerdict(loud, None).nonEmpty)
    // a zero min (defensive: can only come from a garbled artifact) is
    // excluded from both arms rather than dividing by zero
    val zeroMin = (1 to 10).map(i => s"z$i" -> ((4.0, 0.0)))
    assert(Bench.driftVerdict(zeroMin, None).isEmpty)
  }

  // ---- the post-refusal calibration probe ----------------------------------

  test("calibVerdict: loaded box waits, quiet-but-slow recalibrates, else transient") {
    // high load average: whatever the re-measure says, the box is busy
    assert(Bench.calibVerdict(Some(0.52), 0.11, 0.142) == "box-loaded-wait")
    // low load but the quiet-path re-measure still exceeds the bound: the
    // BOUND drifted (new hardware profile / thermal state) — recalibrate
    assert(Bench.calibVerdict(Some(0.02), 0.2, 0.142) == "bound-drift-recalibrate")
    assert(Bench.calibVerdict(None, 0.2, 0.142) == "bound-drift-recalibrate",
      "unreadable loadavg falls through to the median check")
    // low load, re-measure back in bound: the burst drained — retry
    assert(Bench.calibVerdict(Some(0.02), 0.11, 0.142) == "transient-retry")
    // boundary: load exactly at maxLoad is not "loaded"
    assert(Bench.calibVerdict(Some(0.15), 0.11, 0.142) == "transient-retry")
  }

  test("calibFields: refused-line JSON fragment; empty without samples") {
    assert(Bench.calibFields(None, Nil, 0.142) == "")
    val f = Bench.calibFields(Some(0.02), Seq(0.12, 0.1, 0.11), 0.142)
    assert(f == ""","calib_loadavg":0.020,"calib_median":0.110,""" +
      """"calib_verdict":"transient-retry"""", f)
    val drift = Bench.calibFields(None, Seq(0.2, 0.21, 0.19), 0.142)
    assert(drift.contains(""""calib_loadavg":null"""))
    assert(drift.contains(""""calib_verdict":"bound-drift-recalibrate""""), drift)
    // even sample count: median averages the middle pair (0.1+0.2)/2
    val even = Bench.calibFields(Some(0.02), Seq(0.2, 0.1), 0.142)
    assert(even.contains(""""calib_median":0.150"""), even)
  }

  test("loosenGuard: a step-loosened re-stamp is refused; tightening and override pass") {
    // the steal scenario measured live in r17: samples ~0.22 during a
    // co-tenant steal window (loadavg 0.09) would stamp 0.275 over the
    // committed 0.142 — refused
    assert(CalibrateCanary.loosenGuard(0.275, Some(0.142), allow = false).nonEmpty)
    // within the idle box's stamp-to-stamp band (15%): allowed
    assert(CalibrateCanary.loosenGuard(0.160, Some(0.142), allow = false).isEmpty)
    // tightening is always allowed
    assert(CalibrateCanary.loosenGuard(0.120, Some(0.142), allow = false).isEmpty)
    // explicit override for a genuine hardware change
    assert(CalibrateCanary.loosenGuard(0.275, Some(0.142), allow = true).isEmpty)
    // first-ever stamp (no committed artifact): nothing to guard against
    assert(CalibrateCanary.loosenGuard(0.275, None, allow = false).isEmpty)
  }

  // ---- even-count median (advice fix) ---------------------------------------

  test("medianOf averages the two middle elements for even counts") {
    assert(math.abs(CalibrateCanary.medianOf(Seq(0.1, 0.2)) - 0.15) < 1e-12,
      "upper-middle selection would read 0.2 and bias the bound upward")
    assert(CalibrateCanary.medianOf(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(math.abs(CalibrateCanary.medianOf(Seq(0.18, 0.11, 0.1, 0.12)) - 0.115) < 1e-12)
    // the calibration-tool path: an even sample count with a decaying
    // contaminated head no longer lands on the inflated upper element
    def near(v: Double, want: Double) = math.abs(v - want) <= 0.001 + 1e-12
    assert(near(CalibrateCanary.boundOf(Seq(0.18, 0.112, 0.108, 0.110), 1.25), 0.139),
      "upper-middle would have stamped 0.140 from the 0.112 element")
  }
}
