package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.{ScaleGate, StealProbe}

/** Round-18 additions: the DIRECT co-tenant-steal probe (the r17 verdict's
  * named gap — "the certification cannot see steal, only refuse its
  * consequence"), its wiring into the calibration verdicts, and the
  * RESTAMP_PENDING protocol that replaces red-test-as-status-banner.
  */
class Round18OpsSpec extends AnyFunSuite {

  // ---- StealProbe: /proc/stat parsing ----

  test("parseProcStat reads the aggregate cpu line: busy excludes idle+iowait") {
    // the actual line shape from this box (user nice system IDLE IOWAIT
    // irq softirq STEAL guest guest_nice)
    val s = StealProbe.parseProcStat(
      "cpu  10447682 0 4238331 235997307 45287 0 87980 1737058 0 0").get
    assert(s.steal == 1737058L)
    // busy = everything minus idle minus iowait (steal itself is demand)
    assert(s.busy == 10447682L + 4238331L + 87980L + 1737058L)
  }

  test("parseProcStat degrades to None / steal-less, never throws") {
    assert(StealProbe.parseProcStat("").isEmpty)
    assert(StealProbe.parseProcStat("intr 12345").isEmpty)
    assert(StealProbe.parseProcStat("cpu0 1 2 3 4 5 6 7 8").isEmpty) // per-cpu, not aggregate
    assert(StealProbe.parseProcStat("cpu 1 2 notanumber").isEmpty)
    // an ancient kernel without steal/iowait columns parses as steal-less
    val old = StealProbe.parseProcStat("cpu 100 0 50 1000 10").get
    assert(old.steal == 0L && old.busy == 150L)
    val ancient = StealProbe.parseProcStat("cpu 100 0 50 1000").get
    assert(ancient.steal == 0L && ancient.busy == 150L)
  }

  test("stealFraction: steal share of DEMANDED cpu, None on degenerate windows") {
    val a = StealProbe.CpuSample(10000, 100)
    assert(StealProbe.stealFraction(a, StealProbe.CpuSample(11000, 200)).contains(0.1))
    assert(StealProbe.stealFraction(a, StealProbe.CpuSample(11000, 100)).contains(0.0))
    // the live storm-onset shape (2026-08-16 ~22:05 UTC): ~70 steal
    // jiffies/s against ~170 busy jiffies/s on a near-idle box — 41% of
    // demand stolen (the total-relative form read 2% and hid it)
    val storm = StealProbe.stealFraction(
      StealProbe.CpuSample(100000, 50000),
      StealProbe.CpuSample(100170, 50070)).get
    assert(storm > 0.40 && storm < 0.42)
    // empty or backwards window (counter wrap): no signal, not a number
    assert(StealProbe.stealFraction(a, a).isEmpty)
    assert(StealProbe.stealFraction(a, StealProbe.CpuSample(9000, 100)).isEmpty)
    assert(StealProbe.stealFraction(a, StealProbe.CpuSample(11000, 50)).isEmpty)
    // steal delta exceeding the busy delta is accounting skew, not signal
    assert(StealProbe.stealFraction(a, StealProbe.CpuSample(10100, 250)).isEmpty)
  }

  // ---- StealProbe: verdicts ----

  test("verdict names the contention mode: steal first, in-guest second") {
    // the r17 steal signature: high steal column, low share
    val steal = StealProbe.verdict(StealProbe.Probe(Some(0.30), 0.65))
    assert(steal.exists(_.contains("co-tenant CPU steal")))
    assert(steal.exists(_.contains("30%")))
    // steal counter quiet but spinners starved: in-guest competition
    val guest = StealProbe.verdict(StealProbe.Probe(Some(0.01), 0.60))
    assert(guest.exists(_.contains("in-guest")))
    // no /proc/stat at all: the share signal still adjudicates
    assert(StealProbe.verdict(StealProbe.Probe(None, 0.60))
      .exists(_.contains("in-guest")))
    // quiet box (this box's measured idle: steal 0-2%, share ~0.95-1.0)
    assert(StealProbe.verdict(StealProbe.Probe(Some(0.015), 0.97)).isEmpty)
    assert(StealProbe.verdict(StealProbe.Probe(None, 1.0)).isEmpty)
  }

  test("live probe returns sane ranges and terminates") {
    val p = StealProbe.probe(threads = 4, wallMs = 200)
    assert(p.cpuShare > 0.0 && p.cpuShare <= 1.0, p.toString)
    p.stealFrac.foreach(f => assert(f >= 0.0 && f <= 1.0, p.toString))
  }

  // ---- cold-start canary warm-up ----

  test("warmUntil stops at the first under-bound pass; a loaded box caps out") {
    import graft.tools.BoxCanary
    // the measured decay series from the live CanaryWatch run that pinned
    // the artifact (certified-quiet box: steal 0.000, cpu share 1.00):
    // a cold JVM/clock reads over-bound for the first ~4 measures
    val decay = Iterator(0.217, 0.181, 0.175, 0.146, 0.124, 0.100)
    var runs = 0
    val n = BoxCanary.warmUntil(0.142, 15) { () => runs += 1; decay.next() }
    assert(n == 5 && runs == 5) // 0.124 is the first under-bound pass
    // a genuinely loaded box never demonstrates quiet speed: cap, then
    // the caller's measured min-of-3 aborts exactly as before
    assert(BoxCanary.warmUntil(0.142, 15)(() => 0.3) == 15)
    // an already-warm quiet box costs exactly one pass
    assert(BoxCanary.warmUntil(0.142, 15)(() => 0.09) == 1)
  }

  test("warmStable rides the measured JIT decay to its plateau, stops fast when already warm") {
    // the measured g_mad_outliers per-rep series (fresh JVM, quiet box):
    // 40.779 first warm, then 8.193 6.585 4.864 4.668 — improvements
    // 80%/20%/26%/4%: the 4% rep is the plateau
    val decay = Iterator(8.193, 6.585, 4.864, 4.668)
    assert(graft.tools.ScaleBench.warmStable(40.779)(() => decay.next()) == 4)
    // an already-warm query pays exactly one confirming run
    assert(graft.tools.ScaleBench.warmStable(2.5)(() => 2.4) == 1)
    // a never-stabilizing series caps at maxExtra
    var t = 100.0
    assert(graft.tools.ScaleBench.warmStable(200.0, maxExtra = 5)(() => { t /= 2; t }) == 5)
  }

  // ---- calibration verdict wiring ----

  test("calibVerdict: measured steal overrides the loadavg/bound reading") {
    // the exact r17 false-alarm vector: loadavg 0.09 (quiet), canary
    // median 0.244 over the 0.142 bound — WITHOUT the steal signal this
    // reads bound-drift-recalibrate, the verdict that sent an operator
    // toward a steal-window calibration loosenGuard then had to refuse
    assert(Bench.calibVerdict(Some(0.09), 0.244, 0.142) == "bound-drift-recalibrate")
    // WITH the probe's steal measurement the cause is named directly
    assert(Bench.calibVerdict(Some(0.09), 0.244, 0.142, steal = Some(0.30))
      == "co-tenant-steal-wait")
    // steal below the cap changes nothing
    assert(Bench.calibVerdict(Some(0.09), 0.244, 0.142, steal = Some(0.01))
      == "bound-drift-recalibrate")
    assert(Bench.calibVerdict(Some(0.50), 0.244, 0.142, steal = Some(0.01))
      == "box-loaded-wait")
    assert(Bench.calibVerdict(Some(0.02), 0.100, 0.142, steal = Some(0.0))
      == "transient-retry")
  }

  test("calibFields carries the steal evidence on refused lines") {
    val f = Bench.calibFields(Some(0.09), Seq(0.24, 0.25, 0.26), 0.142,
      steal = Some(0.312), cpuShare = Some(0.647))
    assert(f.contains(""""calib_steal":0.312"""))
    assert(f.contains(""""calib_cpu_share":0.647"""))
    assert(f.contains(""""calib_verdict":"co-tenant-steal-wait""""))
    // absent probe fields stay absent (valid JSON either way)
    val bare = Bench.calibFields(Some(0.09), Seq(0.24), 0.142)
    assert(!bare.contains("calib_steal") && !bare.contains("calib_cpu_share"))
    assert(bare.contains(""""calib_verdict":"bound-drift-recalibrate""""))
  }

  // ---- boardMap field quoting ----

  test("boardMap treats the field name as a literal, not a regex") {
    val json = """{"q.x":{"a":1.0},"qqx":{"b":2.0}}"""
    // unquoted, "q.x" would also match "qqx" (dot = any char) and
    // findFirstMatchIn order would decide the winner silently
    assert(Bench.boardMap(json, "q.x") == Map("a" -> 1.0))
    assert(Bench.boardMap(json, "qqx") == Map("b" -> 2.0))
  }

  // ---- RESTAMP_PENDING protocol ----

  test("pendingKeys parses keys, skips comments and blanks") {
    assert(ScaleGate.pendingKeys(
      "# awaiting a quiet-window gate run\ng_mad_outliers\n\n  x_foo  \n") ==
      Set("g_mad_outliers", "x_foo"))
    assert(ScaleGate.pendingKeys("# only a comment\n").isEmpty)
  }

  test("restampState: all five branches") {
    import ScaleGate.{restampState, InSync, Pending, Diverged}
    val art = Set("a", "b")
    // in sync, no marker: green
    assert(restampState(art, art, None) == InSync)
    // in sync but a stale marker survives the re-stamp: red
    assert(restampState(art, art, Some("c\n")).isInstanceOf[Diverged])
    // declared pending: json-only keys exactly match the marker -> canceled
    restampState(art, art + "c", Some("# steal window\nc\n")) match {
      case Pending(reason) => assert(reason.contains("c"))
      case other => fail(s"expected Pending, got $other")
    }
    // undeclared json-only divergence: red (the r17 state, pre-marker)
    assert(restampState(art, art + "c", None).isInstanceOf[Diverged])
    // marker that declares the WRONG keys: red
    assert(restampState(art, art + "c", Some("d\n")).isInstanceOf[Diverged])
    // artifact-only keys are never pendable (an artifact row without a
    // committed bound means bounds were DELETED without re-stamping): red
    assert(restampState(art + "z", art, Some("z\n")).isInstanceOf[Diverged])
  }
}
