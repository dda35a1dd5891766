package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchOps

/** HLL sketch-state mergeability: unioning stored monthly partials must be
  * LOSSLESS versus sketching the raw prefix directly (register-wise max),
  * the estimates must sit in the documented envelope against exact counts,
  * and the stored state must stay KB-sized.
  */
class SketchOpsSpec extends SparkSpec {

  test("union of monthly partials == direct sketch of the prefix, exactly") {
    val o = Tables.orders(spark, sf0001)
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("m"),
        col("o_custkey"))
      .localCheckpoint(true)
    val parts = SketchOps.monthlySketches(spark, sf0001).localCheckpoint(true)
    val months = parts.select("m").orderBy("m").collect().map(_.getDate(0))
    assert(months.length >= 12, "need a real month spread")
    // probe a handful of prefixes across the span
    for (cut <- Seq(months(2), months(months.length / 2), months.last)) {
      val merged = parts.filter(col("m") <= lit(cut))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).collect()(0).getLong(0)
      val direct = o.filter(col("m") <= lit(cut))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey")))).collect()(0).getLong(0)
      assert(merged == direct, s"merge lost information at cut=$cut")
    }
  }

  test("estimates inside the 5% envelope against exact counts (all months)") {
    val rows = SketchOps.hllIncremental(spark, sf0001).collect()
    assert(rows.length >= 12)
    assert(rows.forall(_.getBoolean(2)), "an estimate left the envelope")
    // cumulative exact counts must be non-decreasing and end at the global
    // distinct count
    val cums = rows.map(_.getLong(1))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    val globalDistinct = Tables.orders(spark, sf0001)
      .agg(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(cums.last == globalDistinct)
  }

  test("stored sketch state is KB-sized, not data-sized") {
    val sizes = SketchOps.monthlySketches(spark, sf0001)
      .select(length(col("sk")).as("b")).collect().map(_.getInt(0))
    assert(sizes.forall(_ <= 64 * 1024), s"sketch too big: ${sizes.max} bytes")
  }

  // --- KMV ---------------------------------------------------------------

  /** k smallest md5-hashes of 1..n via the same hash the operator uses. */
  private def kmvOf(keys: Seq[Long], k: Int): Seq[Long] = {
    import spark.implicits._
    keys.toDF("k")
      .select(conv(substring(md5(col("k").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .distinct().orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSeq
  }

  test("KMV partials are mergeable: k-min of per-half sketches == whole") {
    val k = SketchOps.KmvK
    val all = (1L to 1000L)
    val whole = kmvOf(all, k)
    val h1 = kmvOf(all.filter(_ % 2 == 0), k)
    val h2 = kmvOf(all.filter(_ % 2 == 1), k)
    val merged = (h1 ++ h2).distinct.sorted.take(k)
    assert(merged == whole,
      "merging per-partition/per-period sketches must equal the direct sketch")
  }

  test("KMV set-algebra estimates land within the k=64 envelope at sf0.001") {
    val r = SketchOps.kmvSetOps(spark, sf0001).collect()(0)
    def rel(est: Double, exact: Long): Double = math.abs(est - exact) / exact.toDouble
    val (estA, estB, estU, estI) =
      (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
        r.getAs[Double]("est_union"), r.getAs[Double]("est_int"))
    val (exA, exB, exU, exI) =
      (r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"),
        r.getAs[Long]("exact_union"), r.getAs[Long]("exact_int"))
    // 1/√64 ≈ 12.5% expected rsd; 50% is the hard 4σ lid (sf0.001 sets are
    // one correlated draw, so the three set errors move together)
    assert(rel(estA, exA) < 0.5 && rel(estB, exB) < 0.5 &&
      rel(estU, exU) < 0.5 && rel(estI, exI) < 0.5,
      s"est=($estA,$estB,$estU,$estI) exact=($exA,$exB,$exU,$exI)")
    // sketch invariants: union sketch never larger than k, rho ≤ |union|
    assert(r.getAs[Long]("nu") <= SketchOps.KmvK &&
      r.getAs[Long]("rho") <= r.getAs[Long]("nu"))
  }

  test("KMV estimate is exact when the set is smaller than k") {
    // under-k sets: the sketch IS the set, the estimator must return n
    import spark.implicits._
    val k = SketchOps.KmvK
    val small = kmvOf(1L to 20L, k)
    assert(small.length == 20, "sketch of a 20-element set holds all 20")
    // mirror of the operator's under-k branch
    val est = if (small.length < k) small.length.toDouble else Double.NaN
    assert(est == 20.0)
  }
}
