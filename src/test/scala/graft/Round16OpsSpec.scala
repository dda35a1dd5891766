package graft

import graft.tools.{BoxCanary, CalibrateCanary}

/** Round-16 gate-layer hardening: the box-canary quiet bound is a
  * committed calibration artifact (measured, re-stampable) instead of a
  * hand constant, and a refused bench run's headline `"value"` carries
  * the committed quiet total so naive cross-round consumers never read
  * box load as a board figure.
  */
class Round16OpsSpec extends SparkSpec {

  // ---- canary calibration artifact ----------------------------------------

  test("parseCalibration: committed artifact parses; garbled/missing falls back") {
    // the REAL committed artifact — the exact input every gate preamble reads
    val real = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(BoxCanary.ArtifactPath)), "UTF-8")
    val parsed = BoxCanary.parseCalibration(real)
    assert(parsed.nonEmpty, "committed CANARY_BOUNDS.json must parse")
    assert(parsed.exists(b => b > 0.05 && b < 1.0),
      s"calibrated bound $parsed must be a plausible local[32] figure")
    // staleness path: garbled artifacts yield the fallback, never a throw
    assert(BoxCanary.parseCalibration("").isEmpty)
    assert(BoxCanary.parseCalibration("""{"bound_s":"oops"}""").isEmpty)
    assert(BoxCanary.parseCalibration("""{"bound_s":-0.1}""").isEmpty,
      "a non-positive bound would certify every loaded box as quiet")
    assert(BoxCanary.parseCalibration("""{"bound_s":0}""").isEmpty)
    assert(BoxCanary.calibratedBase(None) == BoxCanary.FallbackBound)
    assert(BoxCanary.calibratedBase(Some("junk")) == BoxCanary.FallbackBound)
    assert(BoxCanary.calibratedBase(Some(real)) == parsed.get)
  }

  test("quietBound scales the calibrated base by the same 32/cpus model") {
    // the calibrated base rides the identical clamp-at-32 linear model the
    // 0.14 hand pin used (Round15OpsSpec pins the fallback-base behavior)
    assert(BoxCanary.quietBound("32", None, base = 0.12) == 0.12)
    assert(math.abs(BoxCanary.quietBound("4", None, base = 0.12) - 0.96) < 1e-9)
    assert(BoxCanary.quietBound("64", None, base = 0.12) == 0.12)
    assert(BoxCanary.quietBound("32", Some("0.5"), base = 0.12) == 0.5,
      "the env override outranks the calibration artifact")
  }

  test("CalibrateCanary pure helpers: loadavg parse, margin bound, artifact round-trip") {
    assert(CalibrateCanary.loadavg1("0.08 0.41 0.80 1/326 13257").contains(0.08))
    assert(CalibrateCanary.loadavg1("garbled").isEmpty)
    // bound = MEDIAN(samples) x margin, rounded UP at 3 decimals — the
    // median rejects the decaying JVM-boot-residue head that made the
    // first calibration attempt's max-based bound read 0.225 against a
    // ~0.11 true idle floor
    def near(v: Double, want: Double) = math.abs(v - want) <= 0.001 + 1e-12
    assert(near(CalibrateCanary.boundOf(Seq(0.101, 0.1117, 0.108), 1.25), 0.135))
    assert(near(CalibrateCanary.boundOf(Seq(0.18, 0.165, 0.112, 0.108, 0.111), 1.25), 0.14),
      "a contaminated decaying head must not inflate the stamped bound")
    assert(CalibrateCanary.boundOf(Seq(0.1), 1.0) >= 0.1, "never tighter than the measurement")
    assert(near(CalibrateCanary.boundOf(Seq(0.1001), 1.0), 0.101), "round up, not half-even")
    val json = CalibrateCanary.artifactJson(0.14, 32, Seq(0.101, 0.112),
      Some(0.05), 1.25, "2026-08-16")
    assert(BoxCanary.parseCalibration(json).contains(0.14),
      "a stamped artifact must round-trip through the gate parser")
    assert(json.contains(""""cpus":32""") && json.contains(""""date":"2026-08-16""""))
    // unreadable /proc/loadavg stamps null, still parseable
    val noLoad = CalibrateCanary.artifactJson(0.14, 32, Seq(0.1), None, 1.25, "2026-08-16")
    assert(noLoad.contains(""""loadavg1":null"""))
    assert(BoxCanary.parseCalibration(noLoad).contains(0.14))
  }

  // ---- refused-run headline swap ------------------------------------------

  test("a refused bench run headlines the committed total; live total rides live_total") {
    import Bench.headline
    // committed run: live total is the headline, nothing swapped
    assert(headline(None, 215.0, Some(214.66)) == ((215.0, None)))
    // refused + committed artifact parses: committed total becomes the
    // headline "value", the contaminated live total is still carried
    assert(headline(Some("canary out of bounds"), 547.53, Some(214.66)) ==
      ((214.66, Some(547.53))))
    // refused but the committed artifact is unreadable: nothing better to
    // headline — keep the live figure rather than inventing one
    assert(headline(Some("canary out of bounds"), 547.53, None) ==
      ((547.53, None)))
  }
}
