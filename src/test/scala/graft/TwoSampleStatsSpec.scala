package graft

import org.apache.spark.sql.functions._
import graft.queries.{AnalyticsQueries => AQ}

/** Driver-side brute-force replays for the two-sample test family
  * (Kolmogorov–Smirnov, Mann–Whitney U), WOE/IV feature screening, and the
  * closed-form two-regressor OLS — each recomputed independently from
  * collected rows (different algorithm shape: sort-and-scan instead of
  * bucketed cumulated histograms; Gaussian elimination instead of Cramer).
  */
class TwoSampleStatsSpec extends SparkSpec {

  private def samples(): (Array[Long], Array[Long]) = {
    val rows = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("purchase", "view"))
      .select(round(col("value") * 100).cast("long").as("v"), col("event_type"))
      .collect()
    (rows.filter(_.getString(1) == "purchase").map(_.getLong(0)),
      rows.filter(_.getString(1) == "view").map(_.getLong(0)))
  }

  test("ksTest: sup-distance agrees with a sort-and-scan replay") {
    val r = AQ.ksTest(spark, sf0001).collect()(0)
    val (n1, n2, ks, crit) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val (a, b) = samples()
    assert(n1 == a.length && n2 == b.length)
    // replay: evaluate |F1 - F2| at every pooled value via sorted scans
    val values = (a ++ b).distinct.sorted
    val sa = a.sorted
    val sb = b.sorted
    def cdfCount(s: Array[Long], v: Long): Long = {
      // count of elements <= v (upper bound by binary search)
      var lo = 0; var hi = s.length
      while (lo < hi) { val m = (lo + hi) / 2; if (s(m) <= v) lo = m + 1 else hi = m }
      lo.toLong
    }
    val dnum = values.map(v =>
      math.abs(cdfCount(sa, v) * n2 - cdfCount(sb, v) * n1)).max
    val expect = BigDecimal(dnum.toDouble / (n1.toDouble * n2.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ks == expect, s"engine $ks vs replay $expect")
    assert(crit > 0 && ks >= 0 && ks <= 1.0)
    // same-sample sanity: D(F, F) = 0 is implied by |.| >= 0; reject flag is
    // consistent with the comparison of the two reported numbers
    assert(r.getBoolean(4) == (ks > crit))
  }

  test("mannWhitney: U and z agree with a midrank replay") {
    val r = AQ.mannWhitney(spark, sf0001).collect()(0)
    val (n1, n2, u, z) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val (a, b) = samples()
    assert(n1 == a.length && n2 == b.length)
    // replay: pooled midranks via groupBy + running position
    val pooled = (a.map((_, 1)) ++ b.map((_, 2))).sortBy(_._1)
    val byValue = pooled.groupBy(_._1).toSeq.sortBy(_._1)
    var pos = 0L
    var r1x2 = BigInt(0) // doubled rank sum of sample 1
    var tieTerm = BigInt(0)
    for ((_, g) <- byValue) {
      val t = g.length.toLong
      val lo = pos + 1
      val hi = pos + t
      val c1 = g.count(_._2 == 1).toLong
      r1x2 += BigInt(c1) * (lo + hi)
      tieTerm += BigInt(t) * t * t - t
      pos += t
    }
    val u1x2 = r1x2 - BigInt(n1) * (n1 + 1)
    val expectU = BigDecimal(u1x2.toDouble / 2)
      .setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(u == expectU, s"engine U $u vs replay $expectU")
    val nd = (n1 + n2).toDouble
    val varU = n1.toDouble * n2.toDouble / 12.0 *
      ((nd + 1.0) - tieTerm.toDouble / (nd * (nd - 1.0)))
    val zRep = (u1x2 - BigInt(n1) * n2).toDouble / (2.0 * math.sqrt(varU))
    assert(math.abs(z - zRep) < 1e-6, s"engine z $z vs replay $zRep")
    assert(r.getBoolean(4) == (math.abs(z) > 1.96))
  }

  test("welchTTest: t and df agree with a driver moment replay") {
    val r = AQ.welchTTest(spark, sf0001).collect()(0)
    val (n1, n2, t, df) =
      (r.getLong(0), r.getLong(1), r.getDouble(4), r.getDouble(5))
    val (a, b) = samples()
    assert(n1 == a.length && n2 == b.length)
    def moments(s: Array[Long]): (Double, Double) = {
      val n = s.length.toDouble
      val m = s.map(BigInt(_)).sum.toDouble / n
      val v = s.map(x => (x - m) * (x - m)).sum / (n - 1.0)
      (m, v)
    }
    val (m1, v1) = moments(a)
    val (m2, v2) = moments(b)
    val se2 = v1 / n1 + v2 / n2
    val tRep = (m1 - m2) / math.sqrt(se2)
    val dfRep = se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1.0) +
      (v2 / n2) * (v2 / n2) / (n2 - 1.0))
    assert(math.abs(t - tRep) < 1e-5, s"t $t vs $tRep")
    assert(math.abs(df - dfRep) < 0.1, s"df $df vs $dfRep")
    assert(df > 1 && df <= (n1 + n2 - 2).toDouble + 1e-9)
    assert(r.getBoolean(6) == (math.abs(t) > 1.96))
  }

  test("anovaF: F and eta-squared agree with a driver decomposition") {
    val r = AQ.anovaF(spark, sf0001).collect()(0)
    val (n, k, f, eta) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val rows = Tables.events(spark, sf0001)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(n == rows.length)
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    assert(k == byG.size)
    val grand = rows.map(_._2.toDouble).sum / n
    val ssb = byG.values.map { vs =>
      val m = vs.sum / vs.length; vs.length * (m - grand) * (m - grand) }.sum
    val ssw = byG.values.flatMap { vs =>
      val m = vs.sum / vs.length; vs.map(x => (x - m) * (x - m)) }.sum
    val fRep = ssb / (k - 1.0) / (ssw / (n.toDouble - k))
    val etaRep = ssb / (ssb + ssw)
    assert(math.abs(f - fRep) < 1e-4, s"F $f vs $fRep")
    assert(math.abs(eta - etaRep) < 1e-6, s"eta $eta vs $etaRep")
    assert(eta >= 0 && eta <= 1.0)
  }

  test("cmhTest: statistic and MH odds ratio agree with a driver replay") {
    val r = AQ.cmhTest(spark, sf0001).collect()(0)
    val (k, chi2, or) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), (col("n_chars") >= 200).as("e"),
        (col("lang") === "en").as("y"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    val strata = docs.groupBy(_._1)
    assert(k == strata.size)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var (sa, se, sv, sad, sbc) =
      (0L, BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0))
    for ((_, g) <- strata) {
      val n11 = g.count(x => x._2 && x._3).toDouble
      val n10 = g.count(x => x._2 && !x._3).toDouble
      val n01 = g.count(x => !x._2 && x._3).toDouble
      val n00 = g.count(x => !x._2 && !x._3).toDouble
      val n = n11 + n10 + n01 + n00
      sa += n11.toLong
      se += BigDecimal(r6((n11 + n10) * (n11 + n01) / n))
      sv += BigDecimal(r6((n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00) /
        (n * n * (n - 1.0))))
      sad += BigDecimal(r6(n11 * n00 / n))
      sbc += BigDecimal(r6(n10 * n01 / n))
    }
    val num = math.abs(sa.toDouble - se.toDouble) - 0.5
    assert(math.abs(chi2 - num * num / sv.toDouble) < 1e-5, s"chi2 $chi2")
    assert(math.abs(or - sad.toDouble / sbc.toDouble) < 1e-5, s"OR $or")
    assert(or > 0)
    assert(r.getBoolean(3) == (chi2 > 3.841))
  }

  test("woeIv: per-bucket WOE/IV agree with a driver replay; IV totals") {
    val rows = AQ.woeIv(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf0001)
      .select((col("n_chars") / 100).cast("long").as("b"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pt = docs.map(_._2).sum.toDouble
    val nt = docs.length - pt
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var ivSum = BigDecimal(0)
    for (row <- rows) {
      val (bucket, pos, neg) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val g = docs.filter(_._1 == bucket)
      assert(pos == g.map(_._2).sum && neg == g.length - pos)
      val pb = (pos + 0.5) / pt
      val nb = (neg + 0.5) / nt
      val woe = r6(math.log(pb / nb))
      assert(row.getDouble(3) == woe, s"bucket $bucket WOE")
      val term = r6((pb - nb) * woe)
      assert(row.getDouble(4) == term, s"bucket $bucket IV term")
      ivSum += BigDecimal(term)
    }
    // IV total is the exact decimal sum of the rounded terms, on every row
    rows.foreach(row => assert(row.getDouble(5) == ivSum.toDouble))
    // buckets are disjoint and exhaustive
    assert(rows.map(_.getLong(1)).sum + rows.map(_.getLong(2)).sum == docs.length)
  }

  test("linreg2f: coefficients agree with a Gaussian-elimination solve") {
    val r = AQ.linreg2f(spark, sf0001).collect()(0)
    val (n, b0, b1, b2, r2) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    // independent replay: assemble (x1, x2, y) per order on the driver and
    // solve the normal equations by partial-pivot Gaussian elimination
    val rows = Tables.lineitem(spark, sf0001)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("x1"), sum(col("l_quantity").cast("long")).as("x2"),
        sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("y"))
      .select("x1", "x2", "y").collect()
      .map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble))
    assert(n == rows.length)
    val a = Array.ofDim[Double](3, 4)
    for ((x1, x2, y) <- rows) {
      val v = Array(1.0, x1, x2)
      for (i <- 0 until 3; j <- 0 until 3) a(i)(j) += v(i) * v(j)
      for (i <- 0 until 3) a(i)(3) += v(i) * y
    }
    for (c <- 0 until 3) { // partial-pivot elimination
      val p = (c until 3).maxBy(i => math.abs(a(i)(c)))
      val t = a(c); a(c) = a(p); a(p) = t
      for (i <- 0 until 3 if i != c) {
        val f = a(i)(c) / a(c)(c)
        for (j <- c until 4) a(i)(j) -= f * a(c)(j)
      }
    }
    val beta = Array(a(0)(3) / a(0)(0), a(1)(3) / a(1)(1), a(2)(3) / a(2)(2))
    assert(math.abs(b0 - beta(0)) < 1.0, s"b0 $b0 vs ${beta(0)}") // cents
    assert(math.abs(b1 - beta(1)) < 1e-2, s"b1 $b1 vs ${beta(1)}")
    assert(math.abs(b2 - beta(2)) < 1e-2, s"b2 $b2 vs ${beta(2)}")
    // more lines mean more revenue; per-line price and quantity are
    // independent in this data, so quantity's coefficient is NOT sign-pinned
    assert(b1 > 0)
    assert(r2 > 0.5 && r2 <= 1.0)
  }
}
