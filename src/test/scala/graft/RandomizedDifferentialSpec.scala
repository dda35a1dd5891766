package graft

import java.math.RoundingMode
import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.DataFrame

import graft.queries.{AnalyticsQueries => AQ}

/** Randomized differential tests for the rank/tie/rounding-sensitive
  * statistics operators: adversarially-shaped random inputs (heavy ties,
  * singleton groups, zero-variance groups, ties straddling trim/percentile
  * rank boundaries) are written as mini parquet warehouses, the engine's
  * public query runs over them, and the result is compared to an
  * independent driver-side brute force that follows each operator's
  * DECLARED conventions (HALF_UP cents, midranks as centered double-ranks,
  * exact integer moments, one final double divide + round).
  *
  * The DuckDB oracle gates these operators on the FIXED driver testdata
  * (CORRECTNESS_r*.json) and [[RobustStatsSpec]] brute-forces them on
  * sf0.001 — both replay one data shape. These seeds cover the edge shapes
  * that data never produces: a 10%-trim boundary landing inside a tie run,
  * a zero-variance Spearman group (rho = NaN through both engines' float
  * path), an all-tied two-sample pool (tie-corrected sigma_U = 0), a
  * single-row group whose p5 and p95 are the same order statistic, and
  * negative cents exercising HALF_UP's away-from-zero direction.
  */
class RandomizedDifferentialSpec extends SparkSpec {
  import spark.implicits._

  // ---- shared arithmetic conventions (the operators' documented ones) ----

  /** Spark's `round(double, s)`: BigDecimal.valueOf + HALF_UP, NaN/Inf pass. */
  private def hup(d: Double, scale: Int): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d).setScale(scale, RoundingMode.HALF_UP).doubleValue()

  /** The `round(col * 100).cast("long")` cents path, double in. */
  private def centsOf(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 100.0).setScale(0, RoundingMode.HALF_UP).longValue()

  /** Spearman's y path: `cast(DECIMAL(18,2)) * 100` then long. */
  private def centsDec18(v: Double): Long =
    java.math.BigDecimal.valueOf(v).setScale(2, RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  /** NaN-equal, -0.0-normalized double equality (roundz semantics). */
  private def dEq(a: Double, b: Double): Boolean = {
    def n(x: Double) = if (x == 0.0) 0.0 else x
    java.lang.Double.compare(n(a), n(b)) == 0
  }

  /** The engine's NumOps.safeDiv contract, driver-side: None when the
    * denominator is zero (DuckDB's x/0 → NULL), else the division.
    */
  private def safeDivD(num: Double, den: Double): Option[Double] =
    if (den == 0.0) None else Some(num / den)

  private def optEq(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
    case (Some(x), Some(y)) => dEq(x, y)
    case (None, None)       => true
    case _                  => false
  }

  private def optD(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
    if (r.isNullAt(i)) None else Some(r.getDouble(i))

  private def utcTs(d: LocalDate): java.sql.Timestamp =
    java.sql.Timestamp.from(d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant)

  private val epoch = LocalDate.of(1992, 1, 1)

  // ---- generated mini warehouses -----------------------------------------

  private case class LRow(flag: String, qty: Double, price: Double)
  private case class ORow(status: String, total: Double, day: LocalDate)
  private case class ERow(kind: String, value: Double)

  /** Lineitem rows: two bulk groups with heavy ties on a coarse cents grid
    * (negatives included), a zero-variance group E, a singleton group Z,
    * and a group T sized so the 10%-trim boundary ranks land inside tie
    * runs (values drawn from a 3-point grid).
    */
  private def genLineitem(seed: Int): Seq[LRow] = {
    val r = new scala.util.Random(seed)
    val bulk = for {
      g <- Seq("A", "B"); _ <- 1 to (90 + r.nextInt(60))
    } yield LRow(g, (1 + r.nextInt(8)).toDouble, (r.nextInt(30) - 5) * 25 / 100.0)
    val zeroVar = Seq.fill(7)(LRow("E", 7.0, 3.14))
    val single = Seq(LRow("Z", 3.0, -1.25))
    val tieBoundary = for (_ <- 1 to (14 + r.nextInt(10)))
      yield LRow("T", (1 + r.nextInt(3)).toDouble, Seq(1.0, 2.5, 4.0)(r.nextInt(3)))
    r.shuffle(bulk ++ zeroVar ++ single ++ tieBoundary)
  }

  /** Orders rows: D distinct non-contiguous days (D varies odd/even pair
    * counts across seeds), 1..9 rows per day; statuses F/O/P in bulk plus
    * a singleton S and an all-equal E; negative totals included.
    */
  private def genOrders(seed: Int): Seq[ORow] = {
    val r = new scala.util.Random(seed * 31 + 1)
    val nDays = 6 + seed % 5
    val days = {
      var d = LocalDate.of(1995, 3, 1); val b = Seq.newBuilder[LocalDate]
      for (_ <- 1 to nDays) { b += d; d = d.plusDays(1 + r.nextInt(6).toLong) }
      b.result()
    }
    val bulk = for {
      day <- days; _ <- 1 to (1 + r.nextInt(9))
    } yield ORow(Seq("F", "O", "P")(r.nextInt(3)), (r.nextInt(40) - 8) * 25 / 100.0, day)
    val crafted = Seq(ORow("S", 12.34, days.head)) ++
      Seq.fill(12)(ORow("E", -2.22, days.last))
    r.shuffle(bulk ++ crafted)
  }

  /** Events rows: purchase/view on a coarse tied cents grid plus click
    * noise rows with outlier values that MUST be filtered out.
    */
  private def genEvents(seed: Int): Seq[ERow] = {
    val r = new scala.util.Random(seed * 17 + 5)
    val bulk = for (_ <- 1 to (120 + r.nextInt(80))) yield {
      val t = r.nextInt(10) match {
        case 0 | 1 | 2 => "purchase"
        case 9         => "click"
        case _         => "view"
      }
      val v = if (t == "click") 99999.0 else r.nextInt(12) * 50 / 100.0
      ERow(t, v)
    }
    r.shuffle(bulk ++ Seq(ERow("purchase", 0.0), ERow("view", 0.0)))
  }

  private def writeWarehouse(seed: Int): (String, Seq[LRow], Seq[ORow], Seq[ERow]) = {
    val dir = tmpDir(s"rdiff$seed")
    val li = genLineitem(seed)
    val or = genOrders(seed)
    val ev = genEvents(seed)
    li.map(r => (r.flag, r.qty, r.price))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    or.map(r => (r.status, r.total, utcTs(r.day)))
      .toDF("o_orderstatus", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    ev.map(r => (utcTs(LocalDate.of(2024, 1, 2)), r.kind, r.value))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    (dir, li, or, ev)
  }

  private val seeds = Seq(11, 42, 97)
  private lazy val warehouses = seeds.map(writeWarehouse)

  // ---- brute forces -------------------------------------------------------

  /** Centered double-ranks per distinct value: 2*cum_before + cnt - n. */
  private def doubleRanks(vals: Seq[Long]): Map[Long, Long] = {
    val n = vals.size.toLong
    val cnt = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var cum = 0L
    cnt.keys.toSeq.sorted.map { v =>
      val c = cnt(v); val r = 2 * cum + c - n; cum += c; v -> r
    }.toMap
  }

  private def bruteSpearman(li: Seq[LRow]): Seq[(String, Long, Option[Double])] =
    li.groupBy(_.flag).toSeq.sortBy(_._1).map { case (g, rs) =>
      val xs = rs.map(_.qty.toLong) // the cast("long") truncation path
      val ys = rs.map(r => centsDec18(r.price))
      val rx = doubleRanks(xs); val ry = doubleRanks(ys)
      var sxy, vx, vy = BigInt(0)
      xs.zip(ys).foreach { case (x, y) =>
        sxy += BigInt(rx(x)) * ry(y); vx += BigInt(rx(x)) * rx(x); vy += BigInt(ry(y)) * ry(y)
      }
      (g, rs.size.toLong,
        safeDivD(sxy.toDouble, math.sqrt(vx.toDouble * vy.toDouble)).map(hup(_, 6)))
    }

  private def bruteTrimmed(li: Seq[LRow]): Seq[(String, Long, Long, Double)] =
    li.groupBy(_.flag).toSeq.sortBy(_._1).map { case (g, rs) =>
      val s = rs.map(r => centsOf(r.price)).sorted
      val n = s.size.toLong
      val klo = n / 10 + 1; val khi = n - n / 10
      val kept = s.slice((klo - 1).toInt, khi.toInt)
      (g, n, khi - klo + 1, hup(kept.sum.toDouble / kept.size, 4))
    }

  private def bruteWinsor(or: Seq[ORow]): Seq[(String, Long, Long, Long, Double)] =
    or.groupBy(_.status).toSeq.sortBy(_._1).map { case (g, rs) =>
      val s = rs.map(r => centsOf(r.total)).sorted
      val n = s.size.toLong
      val k5 = (n + 19) / 20; val k95 = (19 * n + 19) / 20
      val v5 = s((k5 - 1).toInt); val v95 = s((k95 - 1).toInt)
      val sum = s.map(v => math.max(v5, math.min(v95, v))).sum
      (g, n, v5, v95, hup(sum.toDouble / n, 4))
    }

  private def bruteTheilSen(or: Seq[ORow]): (Long, Long, Long, Double) = {
    val dly = or.groupBy(_.day).toSeq
      .map { case (d, rs) => (ChronoUnit.DAYS.between(epoch, d), rs.size.toLong) }
      .sortBy(_._1)
    val slopes = (for {
      (di, ni) <- dly; (dj, nj) <- dly if dj > di
    } yield java.math.BigDecimal.valueOf((nj - ni).toDouble / (dj - di) * 1e6)
      .setScale(0, RoundingMode.HALF_UP).longValue()).sorted
    val np = slopes.size.toLong
    val k1 = (np + 1) / 2; val k2 = (np + 2) / 2
    val sen2 = slopes((k1 - 1).toInt) + slopes((k2 - 1).toInt)
    (dly.size.toLong, np, sen2, sen2.toDouble / 2000000.0)
  }

  /** Pooled per-value (c1, c2) histogram for the two-sample tests. */
  private def pooled(ev: Seq[ERow]): Seq[(Long, Long, Long)] =
    ev.filter(e => e.kind == "purchase" || e.kind == "view")
      .groupBy(e => centsOf(e.value)).toSeq.sortBy(_._1)
      .map { case (v, rs) =>
        (v, rs.count(_.kind == "purchase").toLong, rs.count(_.kind == "view").toLong)
      }

  private def bruteKs(ev: Seq[ERow]): (Long, Long, Double, Double, Boolean) = {
    val h = pooled(ev)
    val n1 = h.map(_._2).sum; val n2 = h.map(_._3).sum
    var h1, h2 = 0L; var dnum = BigInt(0)
    h.foreach { case (_, c1, c2) =>
      h1 += c1; h2 += c2
      dnum = dnum.max((BigInt(h1) * n2 - BigInt(h2) * n1).abs)
    }
    val ks = hup(dnum.toDouble / (n1.toDouble * n2.toDouble), 6)
    val crit = hup(1.358 * math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2.toDouble)), 6)
    (n1, n2, ks, crit, ks > crit)
  }

  private def bruteMw(ev: Seq[ERow]): (Long, Long, Double, Option[Double]) = {
    val h = pooled(ev)
    val n1 = h.map(_._2).sum; val n2 = h.map(_._3).sum
    var hi = 0L; var r1x2, tc = BigInt(0)
    h.foreach { case (_, c1, c2) =>
      val t = c1 + c2; val lo = hi + 1; hi += t
      r1x2 += BigInt(c1) * (lo + hi)
      tc += BigInt(t) * t * t - t
    }
    val u1x2 = r1x2 - BigInt(n1) * (n1 + 1)
    val nd = (n1 + n2).toDouble
    val varU = safeDivD(tc.toDouble, nd * (nd - 1.0)).map { corr =>
      n1.toDouble * n2.toDouble / 12.0 * ((nd + 1.0) - corr)
    }
    val z = varU.flatMap(v =>
      safeDivD((u1x2 - BigInt(n1) * n2).toDouble, 2.0 * math.sqrt(v)))
      .map(hup(_, 6))
    (n1, n2, hup(u1x2.toDouble / 2, 1), z)
  }

  // ---- the differential assertions ---------------------------------------

  test("spearman == midrank brute force on adversarial seeds (ties, zero variance, n=1)") {
    warehouses.foreach { case (dir, li, _, _) =>
      val got = AQ.spearman(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), optD(r, 2))).toSeq
      val want = bruteSpearman(li)
      assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)), s"seed dir $dir")
      got.zip(want).foreach { case (g, w) =>
        assert(optEq(g._3, w._3), s"rho mismatch in ${g._1}: got ${g._3} want ${w._3}")
      }
      // degenerate groups yield NULL (safeDiv contract), never a crash/NaN
      assert(got.find(_._1 == "E").exists(_._3.isEmpty), "zero-variance rho must be NULL")
      assert(got.find(_._1 == "Z").exists(_._3.isEmpty), "singleton rho must be NULL")
      assert(got.count(_._3.nonEmpty) >= 3, "bulk groups must still produce a rho")
    }
  }

  test("gTrimmedMean == sorted-slice brute force (trim boundary inside tie runs)") {
    warehouses.foreach { case (dir, li, _, _) =>
      val got = AQ.gTrimmedMean(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      val want = bruteTrimmed(li)
      assert(got.size == want.size && got.zip(want).forall { case (g, w) =>
        g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && dEq(g._4, w._4)
      }, s"got $got\nwant $want")
      // n<10 groups keep ALL ranks (floor(n/10) = 0 on both sides)
      val z = got.find(_._1 == "Z").get
      assert(z._2 == 1L && z._3 == 1L && dEq(z._4, -125.0))
    }
  }

  test("gWinsorMean == clamp brute force (p5/p95 collapse on singleton)") {
    warehouses.foreach { case (dir, _, or, _) =>
      val got = AQ.gWinsorMean(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSeq
      val want = bruteWinsor(or)
      assert(got.size == want.size && got.zip(want).forall { case (g, w) =>
        g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4 && dEq(g._5, w._5)
      }, s"got $got\nwant $want")
      val s = got.find(_._1 == "S").get // singleton: p5 = p95 = mean = the value
      assert(s._3 == s._4 && dEq(s._5, s._3.toDouble))
    }
  }

  test("theilSen == pairwise-slope brute force (odd and even pair counts)") {
    val parities = warehouses.map { case (dir, _, or, _) =>
      val got = AQ.theilSen(spark, dir).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).head
      val want = bruteTheilSen(or)
      assert(got._1 == want._1 && got._2 == want._2 && got._3 == want._3 &&
        dEq(got._4, want._4), s"got $got want $want")
      want._2 % 2
    }
    assert(parities.distinct.size == 2, "seeds must cover both median parities")
  }

  test("ksTest == pooled-CDF brute force (click rows filtered, tied grid)") {
    warehouses.foreach { case (dir, _, _, ev) =>
      val got = AQ.ksTest(spark, dir).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).head
      val want = bruteKs(ev)
      assert(got._1 == want._1 && got._2 == want._2 && dEq(got._3, want._3) &&
        dEq(got._4, want._4) && got._5 == want._5, s"got $got want $want")
    }
  }

  test("mannWhitney == tie-corrected rank-sum brute force") {
    warehouses.foreach { case (dir, _, _, ev) =>
      val got = AQ.mannWhitney(spark, dir).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), optD(r, 3))).head
      val want = bruteMw(ev)
      assert(got._1 == want._1 && got._2 == want._2 && dEq(got._3, want._3) &&
        optEq(got._4, want._4), s"got $got want $want")
      assert(got._4.nonEmpty, "non-degenerate pools must produce a z")
    }
  }

  test("mannWhitney all-tied pool: sigma_U = 0 makes z NULL, U exact; KS = 0") {
    val dir = tmpDir("rdiffTied")
    val ev = Seq.fill(9)(ERow("purchase", 1.0)) ++ Seq.fill(13)(ERow("view", 1.0))
    ev.map(r => (utcTs(LocalDate.of(2024, 1, 2)), r.kind, r.value))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AQ.mannWhitney(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), optD(r, 3), r.isNullAt(4))).head
    val want = bruteMw(ev)
    assert(got._1 == 9L && got._2 == 13L)
    assert(dEq(got._3, want._3) && want._3 == 9.0 * 13.0 / 2) // U = n1 n2 / 2 under total ties
    assert(got._4.isEmpty && want._4.isEmpty, "all-tied z must be NULL (safeDiv contract)")
    assert(got._5, "reject_05 on a NULL z must be NULL, not a verdict")
    // and KS on the same degenerate pool is exactly 0, not rejected
    val ks = AQ.ksTest(spark, dir).collect().head
    assert(ks.getDouble(2) == 0.0 && !ks.getBoolean(4))
  }

  test("degenerate corpora: every safeDiv-guarded statistic returns NULL, never an ANSI failure") {
    // ONE warehouse built to trip every degenerate denominator at once:
    // constant quantities AND prices (zero variance / collinear design),
    // a single order date with a constant daily count, every doc the same
    // language (one-class labels, min(r,c) = 1), single-category events,
    // and a zero-norm embedding among normal ones.
    val dir = tmpDir("rdiffDegen")
    val day = utcTs(LocalDate.of(1995, 6, 1))
    Seq.tabulate(24)(i => (i.toLong + 1, "N", 7.0, 3.25))
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq.tabulate(10)(i => (i.toLong, "F", 5.0, day))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq.tabulate(12)(i => (utcTs(LocalDate.of(2024, 1, 2)), i.toLong, i.toLong % 4, "view", 2.0, """{"k":"3"}"""))
      .toDF("ts", "event_id", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    import graft.queries.{PipelineQueries => PQ}
    // Pearson rho over constant columns -> NULL, moments still real
    val cs = PQ.corrStats(spark, dir).collect().head
    assert(cs.getLong(0) == 24L && cs.isNullAt(3), "corr of constants must be NULL")
    assert(cs.getDouble(2) == 0.0, "variance of a constant is exactly 0")
    // 2-feature OLS on a collinear design -> NULL coefficients and R^2
    val lr = AQ.linreg2f(spark, dir).collect().head
    assert(lr.isNullAt(1) && lr.isNullAt(2) && lr.isNullAt(3) && lr.isNullAt(4))
    // Theil-Sen / Mann-Kendall on a single day: no pairs, z NULL
    val mk = AQ.mannKendall(spark, dir).collect().head
    assert(mk.getLong(0) == 1L && mk.isNullAt(3), "single-day MK z must be NULL")
    // single-arm-degenerate A/B: all users produce no clicks -> z NULL
    val ab = AQ.abTest(spark, dir).collect().head
    assert(ab.isNullAt(4), "zero-click A/B z must be NULL")
    // Welch t on a one-class pool: purchase side empty -> NO row (both
    // engines' cross join of an empty side), not a crash
    assert(AQ.welchTTest(spark, dir).collect().isEmpty)
    // ANOVA over a single event_type: k = 1 -> F and eta^2 NULL
    val af = AQ.anovaF(spark, dir).collect().head
    assert(af.getLong(1) == 1L && af.isNullAt(2) && af.isNullAt(3))
    // constant daily counts -> seasonal strength NULL
    val dw = graft.operators.TimeSeriesOps.dowStrength(spark, dir).collect().head
    assert(dw.isNullAt(1), "constant series seasonal strength must be NULL")
    // zero-norm embedding: cosine near-dup drops the pair, never throws
    val edir = tmpDir("rdiffZeroNorm")
    Seq((0L, 0, Array(1.0f, 0.0f, 1.0f)), (1L, 0, Array(0.0f, 0.0f, 0.0f)),
        (2L, 0, Array(1.0f, 0.1f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$edir/embeddings.parquet")
    val nd = graft.operators.SimilarityOps.cosineNearDup(spark, edir, 0.1).collect()
    assert(nd.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 2L)),
      "zero-norm vector must drop out of cosine pairs, not crash the search")
    // and the degenerate lineitem still flows through spearman as NULL rho
    val sp = AQ.spearman(spark, dir).collect()
    assert(sp.length == 1 && sp.head.isNullAt(2))
  }

  test("ksTest one-class pool: n1*n2 = 0 makes ks/crit/reject NULL, not a crash") {
    val dir = tmpDir("rdiffOneClass")
    Seq.fill(11)(ERow("view", 2.0)).zipWithIndex
      .map { case (r, i) => (utcTs(LocalDate.of(2024, 1, 2)), r.kind, r.value + i % 3) }
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ks = AQ.ksTest(spark, dir).collect().head
    assert(ks.getLong(0) == 0L && ks.getLong(1) == 11L)
    assert(ks.isNullAt(2) && ks.isNullAt(3) && ks.isNullAt(4))
    val mw = AQ.mannWhitney(spark, dir).collect().head
    assert(mw.getLong(0) == 0L && mw.getLong(1) == 11L && mw.isNullAt(3))
  }
}
