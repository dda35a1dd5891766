package graft.tools

/** Per-repetition wall-time series for ONE board query against ONE data
  * dir — the narrow-aperture companion to [[ScaleBench]] (two-point
  * min-of-reps) and [[CanaryWatch]] (box-speed series). Born from the r18
  * g_mad_outliers investigation: its two-point exponent read −0.41 and
  * +1.06 across two clean gate-grade runs with IDENTICAL shuffle-record
  * counts, meaning the wall time of one leg was bimodal while the data
  * and plan were not — a property min-of-reps aggregation hides by
  * construction. This prints every rep (plus a first optional
  * `explain=formatted` of the plan) so the mode structure is visible:
  * steady-state vs warm-up decay vs a bimodal flip between plan variants.
  *
  * Usage: runMain graft.tools.QueryReps <dataDir> <queryName> [reps] [explain]
  */
object QueryReps {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryReps <dataDir> <queryName> [reps] [explain]")
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 10
    val doExplain = args.length > 3 && args(3) == "explain"
    val fn = graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query: $name"))
    val spark = ScaleBench.session()
    try {
      if (doExplain) fn(spark, dir).explain("formatted")
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[queryreps] $name rep $i%3d  $t%7.3f s")
      }
    } finally spark.stop()
  }
}
