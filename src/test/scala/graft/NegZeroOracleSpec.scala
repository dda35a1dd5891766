package graft

/** Pins the signed-zero oracle class (round-11/12 verdict): the driver's
  * correctness gate hashes STRING forms of values, so a DuckDB oracle that
  * emits `-0.0` where Spark's dump boundary (normalized wholesale by
  * [[graft.functions.NumOps.normalizeSignedZeros]]) emits `+0.0`
  * hash-mismatches even though the values are IEEE-equal. The fix is the
  * `+ 0.0` idiom on every signed rounded/divided double OUTPUT column in
  * the oracle SQL; this spec runs EVERY oracle through DuckDB
  * (tools/negzero_audit.py) on the sf0.001 tables and fails if any float
  * output cell carries the negative sign bit on a zero — so a newly added
  * oracle that forgets the idiom fails here, not two rounds later in the
  * driver's gate. Cancels (does not fail) when python3+duckdb is
  * unavailable, so the suite stays green in plain JVM-only environments.
  */
class NegZeroOracleSpec extends SparkSpec {

  private def haveDuckdb: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  test("no oracle emits a negative-zero float output (sf0.001, DuckDB)") {
    assume(new java.io.File(sf0001).isDirectory, "testdata missing")
    assume(new java.io.File("tools/negzero_audit.py").isFile,
      "audit tool missing (test not run from repo root)")
    assume(haveDuckdb, "python3/duckdb unavailable")
    val out = tmpDir("negzero")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"), Verify.oracleManifest())
    val pb = new ProcessBuilder(
      "python3", "tools/negzero_audit.py", out, sf0001)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    assert(code == 0, s"negzero audit failed (exit $code):\n$log")
    assert(log.contains("OK: 0 negative-zero"), log)
  }
}
