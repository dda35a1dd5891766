package graft.tools

import java.nio.file.{Files, Paths}

/** One-shot calibration of the box-canary quiet bound: measures
  * [[BoxCanary.measure]] on a CERTIFIED-idle box and commits the result as
  * `CANARY_BOUNDS.json`, which [[BoxCanary.boundFromArtifact]] (every gate
  * preamble + the bench) then reads in place of the historical hand-pinned
  * 0.14 constant. Re-stamp on new hardware instead of reaching for the
  * `SPARK_GRAFT_CANARY_BOUND` env override; the override remains the
  * emergency escape hatch, the artifact is the durable, reviewable pin.
  *
  * Certification: the 1-minute load average must be below
  * `SPARK_GRAFT_CALIB_MAXLOAD` (default 0.5 — <2% of a 32-cpu box; the
  * round-15 note pins "cool to load avg < 0.2" as the conservative target)
  * BEFORE any Spark work starts, else the tool refuses — a bound stamped
  * on a loaded box would be permanently loose and mask real load in every
  * later gate run. The bound itself is `max(samples) × margin` (margin
  * default 1.25, `SPARK_GRAFT_CALIB_MARGIN`): the max of
  * `SPARK_GRAFT_CALIB_SAMPLES` (default 5) min-of-3 measurements absorbs
  * sample-to-sample idle jitter, and the margin covers the residual
  * run-to-run band an idle box still shows (~±8%, SCALE.md) with room to
  * spare — idle samples of ~0.10–0.11 s land the stamped bound at the same
  * ~0.14 the hand pin chose, by measurement instead of decree.
  */
object CalibrateCanary {

  /** 1-min load average from a `/proc/loadavg` line; None when unreadable
    * (non-Linux) — callers then skip certification with a warning rather
    * than refuse, since the measurement itself is still meaningful.
    */
  def loadavg1(procLine: String): Option[Double] =
    procLine.trim.split("\\s+").headOption.flatMap(_.toDoubleOption)

  /** The artifact body. Pure — spec-tested: round-trips through
    * [[BoxCanary.parseCalibration]], carries the evidence fields
    * (samples, load, date, cpus) a re-stamp review needs.
    */
  def artifactJson(bound: Double, cpus: Int, samples: Seq[Double],
      load1: Option[Double], margin: Double, date: String): String = {
    def n(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val ss = samples.map(n).mkString("[", ",", "]")
    val lv = load1.map(n).getOrElse("null")
    s"""{"bound_s":${n(bound)},"cpus":$cpus,"margin":${n(margin)},""" +
      s""""samples_s":$ss,"loadavg1":$lv,"date":"$date"}"""
  }

  /** bound = max(samples) × margin, rounded UP at 3 decimals so the
    * stamped figure is never tighter than the measurement that justified
    * it. Pure — spec-tested.
    */
  def boundOf(samples: Seq[Double], margin: Double): Double =
    math.ceil(samples.max * margin * 1000.0) / 1000.0

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxLoad = sys.env.get("SPARK_GRAFT_CALIB_MAXLOAD")
      .flatMap(_.toDoubleOption).getOrElse(0.5)
    val margin = sys.env.get("SPARK_GRAFT_CALIB_MARGIN")
      .flatMap(_.toDoubleOption).getOrElse(1.25)
    val nSamples = sys.env.get("SPARK_GRAFT_CALIB_SAMPLES")
      .flatMap(_.toIntOption).getOrElse(5).max(2)

    val load = try Some(new String(Files.readAllBytes(Paths.get("/proc/loadavg")), "UTF-8"))
      .flatMap(loadavg1) catch { case _: Throwable => None }
    load match {
      case Some(l) if l > maxLoad =>
        throw new RuntimeException(
          f"CalibrateCanary REFUSED: 1-min load average $l%.2f > $maxLoad%.2f — " +
            "calibrating on a loaded box would stamp a permanently loose bound. " +
            "Cool the box first (SPARK_GRAFT_CALIB_MAXLOAD re-pins the threshold).")
      case None =>
        System.err.println("[calibrate] /proc/loadavg unreadable — skipping " +
          "idle certification; verify box state by hand before committing")
      case _ => ()
    }

    val spark = graft.Sessions.localBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    BoxCanary.measure(spark) // warm the range/codegen path (uncounted)
    val samples = (1 to nSamples).map(_ => BoxCanary.measure(spark))
    spark.stop()

    val bound = boundOf(samples, margin)
    val json = artifactJson(bound, cpus.toIntOption.getOrElse(32), samples,
      load, margin, java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString)
    Files.write(Paths.get(BoxCanary.ArtifactPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    val parsed = BoxCanary.parseCalibration(json)
    require(parsed.contains(bound),
      s"stamped artifact must round-trip through parseCalibration: $parsed vs $bound")
  }
}
