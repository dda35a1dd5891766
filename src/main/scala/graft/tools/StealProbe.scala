package graft.tools

/** Direct measurement of host co-tenant CPU STEAL — the contention mode
  * the round-17 gate refusals proved invisible to every instrument the
  * repo had: eighteen ScaleGate attempts aborted on canary 0.17–0.55 s
  * while the 1-min load average read 0.04–0.09, because loadavg counts
  * runnable tasks INSIDE the guest and steal happens OUTSIDE it (the
  * hypervisor deschedules the vCPU while the guest believes it idle).
  * The consequences were only refusable indirectly ([[CalibrateCanary
  * .loosenGuard]] blocks the loose bound a steal-window calibration
  * would stamp; [[graft.Bench.driftVerdict]] refuses the inflated
  * board) — this probe measures the cause itself, with two independent
  * signals:
  *
  *  1. `/proc/stat` steal column (field 8 after the `cpu` tag):
  *     jiffies the hypervisor reports as "vCPU runnable but not
  *     running", deltaed across the probe window. Authoritative where
  *     the kernel exposes it (this box accumulated 1.7M steal jiffies
  *     through the r17 afternoon — the counter works here); `None`
  *     where it doesn't (bare metal, some containers), never a throw.
  *  2. cpu-share of a deliberately SPINNING thread set: steal only
  *     accrues while vCPUs *want* to run, so an idle-box sample reads 0
  *     steal even mid-steal-storm — the probe therefore provokes demand
  *     (a few busy threads for ~0.4 s) and compares each thread's
  *     scheduled CPU time (ThreadMXBean) to wall time. A quiet box
  *     gives share ≈ 1.0; the r17 steal window (canary 0.244 s vs the
  *     0.135 quiet pin ≈ 45% slower) reads ≈ 0.55–0.7. This signal
  *     needs no kernel support, but also dips under in-guest
  *     competition — which is why the verdict reads BOTH: steal column
  *     high → co-tenant steal (wait it out; recalibration would be
  *     wrong); steal 0 but share low → in-guest load (loadavg-visible,
  *     wait or kill the competitor).
  *
  * Costs ~0.5 s; runs only in gate preambles, calibration
  * certification, and post-refusal probes — never inside a timed
  * section. Pure parsing/verdict logic spec-tested in Round18OpsSpec;
  * the live probe smoke-tested for sane ranges.
  */
object StealProbe {

  /** One `/proc/stat` aggregate-cpu sample: (busy = non-idle jiffies,
    * steal jiffies). After the `cpu` tag the columns are user nice
    * system IDLE IOWAIT irq softirq STEAL guest guest_nice; busy is
    * everything minus idle and iowait — i.e. time the guest DEMANDED
    * cpu, which includes steal (demanded but not delivered). Lines
    * without the steal column (ancient kernels) read as steal-less,
    * not as errors.
    */
  final case class CpuSample(busy: Long, steal: Long)

  /** Parse the FIRST line of `/proc/stat` (`cpu  u n s i io irq sirq
    * st ...`). None on anything malformed — a probe must degrade to
    * "no signal", never throw inside a gate preamble.
    */
  def parseProcStat(line: String): Option[CpuSample] = {
    val f = line.trim.split("\\s+")
    if (f.length < 5 || f(0) != "cpu") None
    else {
      val vals = f.drop(1).flatMap(_.toLongOption)
      if (vals.length < 4) None
      else {
        val iowait = if (vals.length > 4) vals(4) else 0L
        Some(CpuSample(vals.sum - vals(3) - iowait,
          if (vals.length > 7) vals(7) else 0L))
      }
    }
  }

  /** Steal fraction over a window: Δsteal / Δbusy — the share of the
    * cpu time the guest DEMANDED that the hypervisor withheld. Not
    * Δsteal/Δtotal: total is dominated by the idle columns, so on a
    * 32-cpu box a storm stealing half of an 8-thread probe's cpu would
    * read ~6% of total but reads 50% of demand — and demand share is
    * the number that maps onto "how much slower will the canary run".
    * (Live capture, the night this shipped: the storm's onset read
    * ~70 steal jiffies/s against ~100 busy jiffies/s on an otherwise
    * idle box — total-relative that's 2%, demand-relative 40%.)
    * None when the window is empty/backwards (counter wrap) — a
    * fraction from a degenerate window would be noise wearing a
    * number's clothes. Pure — spec-tested.
    */
  def stealFraction(before: CpuSample, after: CpuSample): Option[Double] = {
    val dBusy = after.busy - before.busy
    val dSteal = after.steal - before.steal
    if (dBusy <= 0 || dSteal < 0 || dSteal > dBusy) None
    else Some(dSteal.toDouble / dBusy)
  }

  /** A completed probe: the `/proc/stat` steal fraction over the
    * provoked window (None where unreadable) and the median spinning
    * thread's cpu-time/wall share (always available on the JVM).
    */
  final case class Probe(stealFrac: Option[Double], cpuShare: Double)

  /** Pure verdict: Some(reason) when the box is NOT quiet, naming the
    * contention mode so the operator's next move is in the message.
    * `stealCap` defaults to 5% — the r17 steal windows that broke the
    * gates measured 30–60% canary inflation, far above it, while a
    * genuinely quiet box reads 0–2% (measured on this box) — and
    * `shareFloor` 0.85 sits under the quiet box's own ~0.95–1.0
    * scheduling band but above the r17 steal signature (≈0.55–0.7).
    */
  def verdict(p: Probe, stealCap: Double = 0.05,
      shareFloor: Double = 0.85): Option[String] =
    p.stealFrac.filter(_ > stealCap).map(s =>
      f"co-tenant CPU steal: ${s * 100}%.0f%% of cpu stolen during the " +
        "probe window (hypervisor-level — invisible to loadavg; wait it " +
        "out, do NOT recalibrate)")
      .orElse(Option.when(p.cpuShare < shareFloor)(
        f"spinning threads scheduled only ${p.cpuShare * 100}%.0f%% of " +
          "wall time with steal counter quiet — in-guest competition " +
          "(check for a concurrent JVM/compile)"))

  /** One cumulative sample of the aggregate cpu line — public so gates
    * can bracket a WHOLE measured phase (sample before, sample after,
    * [[stealFraction]] across) instead of relying on point probes: steal
    * arrives in waves, and a wave that ends before the end-of-run probe
    * is invisible to it but fully accrued in the cumulative counters.
    */
  def sample(): Option[CpuSample] =
    try parseProcStat(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/stat")), "UTF-8").linesIterator.next())
    catch { case _: Throwable => None }

  private def readProcStat(): Option[CpuSample] = sample()

  /** The live probe: spin `threads` busy threads for `wallMs`, sample
    * `/proc/stat` around the window, measure each spinner's scheduled
    * cpu time. The spin is demand-provocation (see the scaladoc) — an
    * unprovoked sample on an idle guest reads 0 steal even while the
    * host is saturated. Median share, not min: one thread losing a
    * scheduling quantum to a kernel task is normal; the median moves
    * only when contention is box-wide.
    */
  def probe(threads: Int = 8, wallMs: Long = 400): Probe = {
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
    val before = readProcStat()
    val deadline = System.nanoTime() + wallMs * 1000000L
    val shares = new Array[Double](threads)
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => {
        val id = Thread.currentThread().getId
        val w0 = System.nanoTime()
        val c0 = mx.getThreadCpuTime(id)
        var x = 0L
        while (System.nanoTime() < deadline) { x += 1; if (x == Long.MaxValue) x = 0 }
        val wall = (System.nanoTime() - w0).toDouble
        val c1 = mx.getThreadCpuTime(id)
        // -1 = cpu-time unsupported on this JVM: report a full share, not
        // a zero one — "no signal" must not read as "box saturated"
        shares(i) =
          if (c0 < 0 || c1 < 0 || wall <= 0) 1.0
          else math.min((c1 - c0).toDouble / wall, 1.0)
      })
      t.setDaemon(true); t.start(); t
    }
    ts.foreach(_.join(wallMs * 4)) // bounded: a wedged thread must not hang a gate
    val after = readProcStat()
    val share = CalibrateCanary.medianOf(shares.toSeq)
    Probe(for { a <- before; b <- after; f <- stealFraction(a, b) } yield f, share)
  }
}
