package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric output hygiene shared by the query board.
  *
  * The one class of false hash mismatch the oracle gate has ever produced
  * is IEEE negative zero: `round(sum(x)/n, k)` of a tiny negative mean
  * keeps the sign bit in Spark (`-0.0`), while DuckDB's `round` returns
  * `+0.0`. The two values are `==`-equal in both engines but differ in the
  * bit pattern the driver hashes. `-0.0` carries no information any query
  * on this board intends to expose, so every rounded-double output column
  * that can straddle zero is normalized through [[nzero]] — IEEE 754
  * guarantees `-0.0 + 0.0 == +0.0` and `x + 0.0 == x` for every other
  * value (including NaN propagation), so the transform is the identity
  * everywhere except the sign bit of zero.
  */
object NumOps {

  /** Collapse IEEE `-0.0` to `+0.0`; identity for every other double. */
  def nzero(c: Column): Column = c + lit(0.0)

  /** `round(c, scale)` with the negative-zero sign bit collapsed — the
    * drop-in for every rounded-double output that can straddle zero.
    */
  def roundz(c: Column, scale: Int): Column = nzero(round(c, scale))

  /** Degenerate-denominator-safe division: NULL when `den` is zero, else
    * `num / den` — the pinned contract for every statistic whose
    * denominator can reach zero on a degenerate but schema-valid corpus
    * (a zero-variance group under a correlation, an all-tied two-sample
    * pool under a rank test's tie-corrected σ_U, a one-class pool under
    * n₁·n₂). Two failure modes this closes, found by
    * [[graft.RandomizedDifferentialSpec]]:
    *
    *  1. Under ANSI mode (Spark 4's default, and what every session
    *     builder here runs) a raw `x / 0.0` THROWS `DIVIDE_BY_ZERO` and
    *     kills the whole job — at 100 TB one constant column in one group
    *     partition must degrade that group's statistic, not the query.
    *  2. DuckDB (the oracle engine) returns NULL for x/0 in every numeric
    *     type, so NULL — not NaN — is the cross-engine value for
    *     "statistic undefined here"; a NaN would hash-mismatch the oracle
    *     the first time real data produced the degenerate case.
    *
    * The `when` guard is the lazy-branch idiom the board already relies on
    * (theilSen's join-local division): CaseWhen branches are not evaluated
    * speculatively in codegen, so the division cannot trip ANSI even
    * transiently.
    *
    * Contract limits, pinned: the guard covers the ZERO case only. A NaN
    * denominator passes `=!= 0.0` and propagates NaN — callers must keep
    * denominators NaN-free (every current site divides by exact
    * integer/decimal combinations or `sqrt` of provably nonnegative
    * values). That is deliberate: DuckDB errors outright on the operations
    * that would manufacture a NaN denominator (e.g. sqrt of a negative),
    * so a NaN-swallowing guard here would silently diverge from the
    * oracle instead of surfacing the caller's broken invariant. A NULL
    * denominator yields NULL through both the guard and the division —
    * same as DuckDB.
    */
  def safeDiv(num: Column, den: Column): Column =
    when(den =!= lit(0.0), num / den).otherwise(lit(null))

  /** Normalize every float/double in a result frame — top level and one
    * array level deep — so `-0.0` can never reach the correctness dump.
    * Applied at the [[graft.Verify]] dump boundary as the systematic
    * backstop: per-site [[roundz]] keeps individual operators honest, this
    * keeps the whole 200+-query board immune to the class. Column names,
    * types, and nullability are unchanged (`+ 0.0` preserves null and NaN).
    */
  def normalizeSignedZeros(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      val fixed = f.dataType match {
        case DoubleType => nzero(c)
        case FloatType  => (c.cast(DoubleType) + lit(0.0)).cast(FloatType)
        case ArrayType(DoubleType, _) => transform(c, x => x + lit(0.0))
        case ArrayType(FloatType, _) =>
          transform(c, x => (x.cast(DoubleType) + lit(0.0)).cast(FloatType))
        case _ => c
      }
      fixed.as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
