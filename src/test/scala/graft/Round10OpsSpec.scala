package graft

import org.apache.spark.sql.functions._
import graft.operators.EvalOps

/** Round-10 operator pins: the model-eval family (AUC / calibration /
  * kappa) — closed-form identities a rank-sum or confusion-matrix bug
  * would break.
  */
class Round10OpsSpec extends SparkSpec {

  test("roc auc: rank-sum identities hold and the score beats chance") {
    val r = EvalOps.rocAuc(spark, sf0001).first()
    val (nPos, nNeg, u2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val auc = r.getDouble(3)
    assert(nPos > 0 && nNeg > 0)
    // 2U is bounded by [0, 2·P·N] and AUC is exactly its normalization
    assert(u2 >= 0 && u2 <= 2 * nPos * nNeg)
    assert(auc == u2.toDouble / (2.0 * nPos * nNeg))
    assert(r.getDouble(4) == 2.0 * auc - 1.0) // gini
    // sane open-interval value (not a degenerate all-concordant artifact);
    // the >0.5 "beats chance" property holds at sf0.01+ but not on the
    // 50-doc sf0.001 sample, so the spec pins only the identity
    assert(auc > 0.0 && auc < 1.0, s"auc=$auc")
  }

  test("roc auc: reversing labels reflects AUC around 1/2 (rank-sum symmetry)") {
    // AUC(pos) + AUC(neg-as-pos) = 1 exactly in the tie-corrected form:
    // 2U⁺ + 2U⁻ = 2PN. Verified against a driver-side brute-force count of
    // concordant/tied pairs on sf0.001 — the definitional O(P·N) replay.
    val sl = graft.operators.QualityClassifier
      .frozenScores(Tables.documents(spark, sf0001))
      .withColumn("zc", round(col("zr") * lit(1e6)).cast("long"))
      .join(Tables.documents(spark, sf0001)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L).as("y")),
        "doc_id")
      .select("zc", "y").collect().map(r => (r.getLong(0), r.getLong(1)))
    val pos = sl.filter(_._2 == 1L).map(_._1)
    val neg = sl.filter(_._2 == 0L).map(_._1)
    var u2 = 0L // 2·(concordant + ties/2)
    for (p <- pos; n <- neg)
      u2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val r = EvalOps.rocAuc(spark, sf0001).first()
    assert(r.getLong(0) == pos.length && r.getLong(1) == neg.length)
    assert(r.getLong(2) == u2, s"engine 2U=${r.getLong(2)} brute=$u2")
  }

  test("calibration: bins partition the corpus and brier terms are bounded") {
    val rows = EvalOps.calibration(spark, sf0001).collect()
    val n = Tables.documents(spark, sf0001)
      .filter(col("text").isNotNull).count()
    assert(rows.map(_.getLong(1)).sum == n) // bins cover every scored doc
    rows.foreach { r =>
      val bin = r.getLong(0)
      assert(bin >= 0 && bin <= 9)
      val (avgPred, posRate) = (r.getDouble(2), r.getDouble(3))
      assert(avgPred >= 0.0 && avgPred <= 1.0)
      assert(posRate >= 0.0 && posRate <= 1.0)
      // mean prediction lies inside its own bin (or at the clamp edge)
      assert(avgPred >= bin / 10.0 - 1e-6 && avgPred <= (bin + 1) / 10.0 + 1e-6)
      // per-row brier terms are in [0,1], so the bin sum is ≤ its count
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= r.getLong(1) + 1e-6)
      assert(math.abs(r.getDouble(5) - math.abs(avgPred - posRate)) < 1e-12)
    }
  }

  test("cohen kappa: confusion counts tile the corpus; kappa matches po/pe") {
    val r = EvalOps.cohenKappa(spark, sf0001).first()
    val n = r.getLong(0)
    val (n11, n10, n01, n00) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n11 + n10 + n01 + n00 == n)
    val po = r.getDouble(5); val pe = r.getDouble(6); val k = r.getDouble(7)
    assert(po == (n11 + n00).toDouble / n)
    // kappa == (po - pe) / (1 - pe) up to float re-association
    assert(math.abs(k - (po - pe) / (1.0 - pe)) < 1e-12, s"k=$k po=$po pe=$pe")
    // the two gates genuinely disagree sometimes (non-degenerate matrix)
    assert(n10 + n01 > 0)
    assert(k > 0.0 && k < 1.0, s"kappa=$k")
  }

  test("kaplan-meier: curve is monotone and matches the sequential recurrence") {
    val rows = graft.queries.SurvivalQueries.kaplanMeier(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // survival non-increasing from 1; cumulative hazard non-decreasing
    var prevS = 1.0 + 1e-9; var prevH = -1e-9
    rows.foreach { r =>
      val s0 = r.getDouble(3); val h0 = r.getDouble(4)
      assert(s0 <= prevS + 1e-9 && s0 >= 0.0, r)
      assert(h0 >= prevH - 1e-9, r)
      prevS = s0; prevH = h0
    }
    // sequential product-limit replay (the textbook recurrence) from the
    // same (t, n_risk, d) steps: engine result must match to round-6
    var surv = 1.0
    rows.foreach { r =>
      val nRisk = r.getLong(1).toDouble; val dEv = r.getLong(2).toDouble
      surv *= (1.0 - dEv / nRisk)
      assert(math.abs(r.getDouble(3) - surv) < 5e-6,
        s"t=${r.getLong(0)} engine=${r.getDouble(3)} replay=$surv")
    }
    // at-risk counts strictly decrease over death times (deaths + time flow)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b.getLong(1) < a.getLong(1))
      case _ =>
    }
  }

  test("kaplan-meier: at-risk accounting ties to the duration histogram") {
    import spark.implicits._
    val rows = graft.queries.SurvivalQueries.kaplanMeier(spark, sf0001).collect()
    // first death time's at-risk must equal the number of users with
    // duration >= that time; with t_min = 0 that is ALL users
    val ev = Tables.events(spark, sf0001)
    val nUsers = ev.select("user_id").distinct().count()
    val tMin = rows.map(_.getLong(0)).min
    if (tMin == 0) assert(rows.head.getLong(1) == nUsers)
    // total deaths <= users; censored = users - deaths
    val totalDeaths = rows.map(_.getLong(2)).sum
    assert(totalDeaths <= nUsers)
  }

  test("pps sample: exactly k selections, bounded multiplicity, certainty units") {
    import graft.queries.PipelineQueries
    val k = PipelineQueries.PpsSampleK
    val sel = PipelineQueries.ppsSample(spark, sf0001).collect()
    // telescoping grid: total multiplicity is EXACTLY k, always
    assert(sel.map(_.getLong(2)).sum == k)
    val w = Tables.documents(spark, sf0001)
      .select(col("doc_id"), greatest(coalesce(col("n_chars"), lit(1L)), lit(1L)).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val totW = w.values.sum
    sel.foreach { r =>
      val wi = w(r.getLong(0))
      assert(r.getLong(1) == wi)
      // a weight spanning m grid cells is drawn at most ceil(w k / W)+...
      // tight bound: floor(w*k/W) <= copies <= floor(w*k/W) + 1
      val base = wi * k / totW
      assert(r.getLong(2) >= base && r.getLong(2) <= base + 1,
        s"doc=${r.getLong(0)} w=$wi copies=${r.getLong(2)} base=$base")
    }
    // certainty units: any doc with w*k >= W MUST be selected
    val certain = w.filter { case (_, wi) => wi * k >= totW }.keySet
    val selected = sel.map(_.getLong(0)).toSet
    assert(certain.subsetOf(selected))
    // deterministic: a second construction returns the identical sample
    val again = PipelineQueries.ppsSample(spark, sf0001).collect()
    assert(again.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      sel.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }

  test("sharpe/sortino: engine matches a driver-side sequential replay") {
    import graft.operators.TimeSeriesOps
    val rows = TimeSeriesOps.sharpeRatios(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // driver replay: same cents sequence, same round-6 returns, same moments
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"),
        col("ts"), col("event_id"))
      .filter(col("c") > 0)
      .orderBy("user_id", "ts", "event_id").collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byUser = ev.groupBy(_.getLong(0)).view.mapValues { rs =>
      val cents = rs.map(_.getLong(1)).toList
      cents.sliding(2).collect { case List(a, b) =>
        r6(math.log(b.toDouble / a.toDouble)) }.toSeq
    }.toMap
    rows.foreach { row =>
      val rets = byUser(row.getLong(0))
      assert(row.getLong(1) == rets.length)
      val n = rets.length.toDouble
      val sr = rets.map(BigDecimal(_)).sum
      val sr2 = rets.map(r => BigDecimal(r6(r * r))).sum
      val mean = sr.toDouble / n
      assert(math.abs(row.getDouble(2) - r6(mean)) < 1e-12)
      val varr = math.max((sr2.toDouble - n * mean * mean) / (n - 1), 0.0)
      val sharpe = if (math.sqrt(varr) > 0) mean / math.sqrt(varr) * math.sqrt(252.0) else Double.NaN
      if (!row.isNullAt(4))
        assert(math.abs(row.getDouble(4) - sharpe) < 1e-3,
          s"user=${row.getLong(0)} engine=${row.getDouble(4)} replay=$sharpe")
      assert(row.getDouble(3) >= 0.0) // ann_vol
    }
  }

  test("audio features: frame accounting and an independent frame replay") {
    import graft.operators.MultimodalOps
    val frames = MultimodalOps.audioFeaturesDf(spark, sf0001).collect()
    assert(frames.nonEmpty)
    // frame count = sum over docs of floor(utf8_len / 64)
    val expected = Tables.documents(spark, sf0001)
      .filter(col("text").isNotNull)
      .select((length(encode(col("text"), "UTF-8")) / 64).cast("long").as("nf"))
      .collect().map(_.getLong(0)).sum
    assert(frames.length.toLong == expected)
    // independent replay of every feature of the first doc's first frame
    val r = frames.head
    val id = r.getLong(0)
    assert(r.getInt(1) == 0)
    val samples = (0 until MultimodalOps.FrameLen)
      .map(i => ((((id % 65536L) * 1103L + i * 12345L) % 256L) - 128L).toInt)
    assert(r.getLong(2) == samples.map(s => s.toLong * s).sum)
    assert(r.getLong(3) == samples.sliding(2).count { case Seq(a, b) => a * b < 0 })
    assert(r.getInt(4) == samples.map(math.abs).max)
  }

  test("cuped: closed form ties to a driver-side moment replay; rho2 in [0,1]") {
    import graft.queries.AnalyticsQueries
    val r = AnalyticsQueries.cuped(spark, sf0001).first()
    val (na, nb) = (r.getLong(0), r.getLong(1))
    assert(na > 0 && nb > 0)
    val rho2 = r.getDouble(5)
    assert(rho2 >= 0.0 && rho2 <= 1.0)
    // replay: per-user pre/post cents, pooled theta, arm diffs
    val per = Tables.events(spark, sf0001)
      .select(col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"),
        (col("ts") < lit("2024-01-16")).as("pre"))
      .collect().groupBy(_.getLong(0)).map { case (u, rows) =>
        val x = rows.filter(_.getBoolean(2)).map(_.getLong(1)).sum
        val y = rows.filterNot(_.getBoolean(2)).map(_.getLong(1)).sum
        (u, x, y)
      }.toSeq
    val n = per.size.toDouble
    val (sx, sy) = (per.map(_._2).sum.toDouble, per.map(_._3).sum.toDouble)
    val sxy = per.map(t => BigInt(t._2) * BigInt(t._3)).sum
    val sxx = per.map(t => BigInt(t._2) * BigInt(t._2)).sum
    val theta = (n * sxy.toDouble - sx * sy) / (n * sxx.toDouble - sx * sx)
    assert(math.abs(r.getDouble(2) - theta) < 1e-4, s"theta=${r.getDouble(2)} vs $theta")
    val a = per.filter(_._1 % 2 == 0); val b = per.filterNot(_._1 % 2 == 0)
    val diffRaw = a.map(_._3).sum.toDouble / a.size - b.map(_._3).sum.toDouble / b.size
    val diffX = a.map(_._2).sum.toDouble / a.size - b.map(_._2).sum.toDouble / b.size
    assert(math.abs(r.getDouble(3) - diffRaw) < 1e-2)
    assert(math.abs(r.getDouble(4) - (diffRaw - theta * diffX)) < 1e-2)
  }

  test("theil-sen: engine median slope equals the brute-force pairwise median") {
    import graft.queries.AnalyticsQueries
    val r = AnalyticsQueries.theilSen(spark, sf0001).first()
    val dly = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderdate").cast("date").as("dt"))
      .agg(count(lit(1)).as("n"))
      .select(datediff(col("dt"), lit("1992-01-01")).cast("long").as("di"), col("n"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val slopes = (for {
      (di, ni) <- dly; (dj, nj) <- dly if dj > di
    } yield math.round((nj - ni).toDouble / (dj - di) * 1e6)).sorted
    assert(r.getLong(0) == dly.length)
    assert(r.getLong(1) == slopes.length)
    val k1 = (slopes.length + 1) / 2; val k2 = (slopes.length + 2) / 2
    assert(r.getLong(2) == slopes(k1 - 1) + slopes(k2 - 1),
      s"sen2=${r.getLong(2)} brute=${slopes(k1 - 1) + slopes(k2 - 1)}")
  }

  test("bootstrap ci: brackets are ordered, reproducible, and near the mean") {
    import graft.queries.AnalyticsQueries
    val r = AnalyticsQueries.bootstrapCi(spark, sf0001).first()
    val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo < hi)
    // the full-sample mean should fall inside (or extremely near) its own CI
    assert(mean > lo - (hi - lo) && mean < hi + (hi - lo), s"$lo $mean $hi")
    val again = AnalyticsQueries.bootstrapCi(spark, sf0001).first()
    assert(again.getDouble(3) == lo && again.getDouble(4) == hi)
  }

  test("quantile norm: cells tile each source and the mapping is monotone") {
    import graft.queries.AnalyticsQueries
    val rows = AnalyticsQueries.quantileNorm(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001).select("source", "n_chars").collect()
    val bySrc = docs.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    val globalVals = docs.map(_.getLong(1)).toSet
    rows.groupBy(_.getString(0)).foreach { case (src, cells) =>
      assert(cells.map(_.getLong(2)).sum == bySrc(src)) // tiles the source
      // monotone: higher source value never maps to a lower pooled value
      val sorted = cells.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(3) >= a.getLong(3))
        case _ =>
      }
    }
    // mapped values come from the pooled corpus's own value set
    rows.foreach(r => assert(globalVals.contains(r.getLong(3))))
  }

  test("conformal: k is the finite-sample order statistic; coverage is sane") {
    import graft.queries.AnalyticsQueries
    val r = AnalyticsQueries.conformalThreshold(spark, sf0001).first()
    val (nCal, k) = (r.getLong(0), r.getLong(1))
    assert(k == (9 * (nCal + 1) + 9) / 10)
    val cov = r.getDouble(4)
    // guarantee is E[coverage] >= 0.9; a 10-doc test split can dip, but
    // anything below 0.6 would mean the split/threshold wiring is broken
    assert(cov >= 0.6 && cov <= 1.0, s"coverage=$cov")
    assert(r.getLong(3) > 0)
  }

  test("mann-kendall: S and tie-corrected variance match a brute-force replay") {
    import graft.queries.AnalyticsQueries
    val r = AnalyticsQueries.mannKendall(spark, sf0001).first()
    val dly = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderdate").cast("date").as("dt"))
      .agg(count(lit(1)).as("n"))
      .orderBy("dt").collect().map(_.getLong(1))
    var sStat = 0L
    for (i <- dly.indices; j <- (i + 1) until dly.length)
      sStat += java.lang.Long.signum(dly(j) - dly(i))
    assert(r.getLong(1) == sStat)
    val n = dly.length.toLong
    val tieTerm = dly.groupBy(identity).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    assert(r.getLong(0) == n)
    assert(r.getLong(2) == n * (n - 1) * (2 * n + 5) - tieTerm)
    // z consistent with the continuity-corrected closed form
    val zNum = if (sStat > 0) sStat - 1 else if (sStat < 0) sStat + 1 else 0L
    val z = zNum.toDouble / math.sqrt(r.getLong(2).toDouble / 18.0)
    assert(math.abs(r.getDouble(3) - z) < 1e-3)
  }

  test("rolling anomaly: window accounting and the integer 3-sigma rule") {
    import graft.queries.AnalyticsQueries
    val rows = AnalyticsQueries.rollingAnomaly(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byDate = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderdate").cast("date").as("dt"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    rows.take(200).foreach { r =>
      val day = r.getDate(0).toLocalDate
      val win = (0 to 6).flatMap(k => byDate.get(day.minusDays(k)))
      assert(r.getLong(2) == win.length, s"$day w=${r.getLong(2)} vs ${win.length}")
      val (w, sw, qw) = (win.length.toLong, win.sum, win.map(x => x * x).sum)
      val x = byDate(day)
      val expectFlag = (w * x - sw) * (w * x - sw) > (w * qw - sw * sw) * 9
      assert(r.getBoolean(4) == expectFlag, s"$day")
      assert(math.abs(r.getDouble(3) - sw.toDouble / w) < 1e-3)
    }
  }

  test("isotonic calibration: monotone fit that matches a sequential PAVA replay") {
    import graft.queries.AnalyticsQueries
    val rows = AnalyticsQueries.isotonicCalibration(spark, sf0001).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    // monotone non-decreasing
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b.getDouble(3) >= a.getDouble(3) - 1e-9)
      case _ =>
    }
    // sequential pool-adjacent-violators on the same (w, sy) bins
    var pools = rows.map(r => (r.getLong(1).toDouble, r.getLong(1) * r.getDouble(2)))
      .map { case (w, sy) => (w, sy) }.toBuffer
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < pools.length - 1) {
        if (pools(i)._2 / pools(i)._1 > pools(i + 1)._2 / pools(i + 1)._1 + 1e-12) {
          pools(i) = (pools(i)._1 + pools(i + 1)._1, pools(i)._2 + pools(i + 1)._2)
          pools.remove(i + 1); changed = true
        } else i += 1
      }
    }
    val fit = pools.flatMap { case (w, sy) =>
      Seq.fill(math.round(w).toInt)(sy / w) } // per-doc level fit
    // expand engine bins to per-doc levels and compare
    val engineFit = rows.flatMap(r => Seq.fill(r.getLong(1).toInt)(r.getDouble(3)))
    assert(engineFit.length == fit.length)
    engineFit.zip(fit).foreach { case (e, p) =>
      assert(math.abs(e - p) < 1e-6, s"engine=$e pava=$p") }
  }

  test("winsorized mean: clamps tie to the discrete p5/p95 order statistics") {
    import graft.queries.AnalyticsQueries
    val rows = AnalyticsQueries.gWinsorMean(spark, sf0001).collect()
    val data = Tables.orders(spark, sf0001)
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val vs = data(r.getString(0))
      val n = vs.length
      val v5 = vs(((n + 19) / 20 - 1).max(0))
      val v95 = vs(((19 * n + 19) / 20 - 1).max(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == v5 && r.getLong(3) == v95, r)
      val wm = vs.map(v => math.min(math.max(v, v5), v95)).sum.toDouble / n
      assert(math.abs(r.getDouble(4) - wm) < 0.01, s"${r.getDouble(4)} vs $wm")
    }
  }

  test("heaps fit: flat on the templated corpus, steep on a growing-vocab one") {
    import spark.implicits._
    import graft.queries.PipelineQueries
    // the harness corpus has a small fixed vocabulary -> beta ~ 0 (that IS
    // the diagnostic: templated/duplicated corpora bend beta down)
    val flat = PipelineQueries.heapsFit(spark, sf0001).first()
    assert(flat.getDouble(1) >= 0.0 && flat.getDouble(1) < 0.3, flat)
    // crafted corpus where every doc introduces fresh types: V(N) = N -> a
    // perfect ln-ln line with slope exactly 1
    val fresh = (0L until 64L)
      .map(i => (i, (0 until 5).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val r = PipelineQueries.heapsFitOver(fresh, nKeysBound = 1L)
    assert(math.abs(r.first().getDouble(1) - 1.0) < 1e-3)
    // mixed corpus: a shared preamble plus one fresh type per doc ->
    // strictly between the two regimes
    val mixed = (0L until 64L)
      .map(i => (i, s"the quick brown fox u$i"))
      .toDF("doc_id", "text")
    val m = PipelineQueries.heapsFitOver(mixed, nKeysBound = 1L).first().getDouble(1)
    assert(m > 0.05 && m < 0.95, s"beta=$m")
  }

  test("k-fold cross-validation: held-out AUC beats chance on a learnable label") {
    import graft.operators.QualityClassifier
    // deterministic md5 fold assignment (the trainSplit convention), label
    // learnable from the feature space (stopword ratio above corpus mean —
    // the same construction QualityClassifierSpec trains to 95% accuracy),
    // so every fold's HELD-OUT ranking must beat chance by a wide margin
    val base = Tables.documents(spark, sf0001).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), QualityClassifier.featureExprs(2).as("sr"))
      .withColumn("m", md5(col("doc_id").cast("string")))
      .withColumn("fold",
        expr("(instr('0123456789abcdef', substring(m, 32, 1)) - 1) % 3"))
    val cut = base.agg(avg("sr")).first().getDouble(0)
    val withY = base.withColumn("y", (col("sr") > cut).cast("int"))
    val aucs = (0 until 3).map { k =>
      val train = withY.filter(col("fold") =!= k)
      val test = withY.filter(col("fold") === k)
      val m = QualityClassifier.train(train, col("y"), iters = 40)
      val scored = QualityClassifier.score(test, m)
        .select(col("y"), col("quality_z")).collect()
      val pos = scored.filter(_.getInt(0) == 1).map(_.getDouble(1))
      val neg = scored.filter(_.getInt(0) == 0).map(_.getDouble(1))
      assume(pos.nonEmpty && neg.nonEmpty)
      var u = 0.0
      for (p <- pos; n <- neg)
        u += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      u / (pos.length.toDouble * neg.length)
    }
    aucs.foreach(a => assert(a > 0.8, s"fold AUC $a (all: $aucs)"))
    // fold assignment is deterministic: re-running fold 0 gives identical weights
    val t0 = withY.filter(col("fold") =!= 0)
    val m1 = QualityClassifier.train(t0, col("y"), iters = 10)
    val m2 = QualityClassifier.train(t0, col("y"), iters = 10)
    assert(m1.weights.sameElements(m2.weights) && m1.bias == m2.bias)
  }

  test("merkle anti-entropy: identical replicas are clean; known drift counted exactly") {
    import spark.implicits._
    import graft.operators.ReconcileOps
    val a = (1L to 500L).map(k => (k, k * 7)).toDF("k", "c")
    // clean: zero dirty buckets, zero row diffs
    val clean = ReconcileOps.merkleDiffOver(a, a).first()
    assert(clean.getLong(1) == 0 && clean.getLong(2) == 0 &&
      clean.getLong(3) == 0 && clean.getLong(4) == 0)
    // drift: drop 3 keys, corrupt 2, add 1 extra
    val b = a.filter(!col("k").isin(10L, 20L, 30L))
      .withColumn("c", when(col("k").isin(40L, 50L), col("c") + 1).otherwise(col("c")))
      .unionByName(Seq((999L, 1L)).toDF("k", "c"))
    val r = ReconcileOps.merkleDiffOver(a, b).first()
    assert(r.getLong(0) <= 256)
    assert(r.getLong(1) >= 1 && r.getLong(1) <= 6) // ≤ one bucket per touched key
    assert(r.getLong(2) == 3, r)  // missing
    assert(r.getLong(3) == 1, r)  // extra
    assert(r.getLong(4) == 2, r)  // corrupt
  }

  test("time-weighted average: spans tile each day and TWA lies within [low, high]") {
    import graft.operators.TimeSeriesOps
    val rows = TimeSeriesOps.twaPrice(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // per (user, day): micros covered < 24 h, twa within that day's tick range
    val ticks = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts").cast("date").as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .filter(col("c") > 0)
      .collect().groupBy(r => (r.getLong(0), r.getDate(1).toString))
    rows.take(300).foreach { r =>
      val key = (r.getLong(0), r.getDate(1).toString)
      val cs = ticks(key).map(_.getLong(2))
      assert(r.getLong(2) == cs.length - 1) // n_spans = ticks that day - 1
      assert(r.getLong(3) > 0 && r.getLong(3) < 24L * 3600 * 1000000)
      val twa = r.getDouble(4)
      assert(twa >= cs.min - 1e-6 && twa <= cs.max + 1e-6,
        s"$key twa=$twa range=[${cs.min},${cs.max}]")
    }
  }

  test("market beta: the equal-weight market's own beta is exactly 1") {
    import graft.operators.TimeSeriesOps
    val betas = TimeSeriesOps.marketBeta(spark, sf0001).collect()
    assert(betas.nonEmpty)
    // instrument-count-weighted mean beta == 1 within rounding: each day's
    // market return is the mean of members, so covariances sum to the
    // market variance. (Exact only when every instrument trades every day;
    // allow a small tolerance for ragged first days.)
    val meanBeta = betas.map(_.getDouble(2)).sum / betas.length
    assert(math.abs(meanBeta - 1.0) < 0.15, s"mean beta $meanBeta")
    betas.foreach(r => assert(!r.getDouble(2).isNaN && r.getLong(1) >= 2))
  }

  test("pair correlation: bounded in [-1,1], ordered desc, honors min overlap") {
    import graft.operators.TimeSeriesOps
    val rows = TimeSeriesOps.pairCorrelation(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= TimeSeriesOps.PairCorrK)
    var prev = 2.0
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(c <= prev + 1e-12) // ordered
      prev = c
      assert(r.getLong(2) >= TimeSeriesOps.PairCorrMinDays)
      assert(r.getLong(0) < r.getLong(1)) // canonical pair orientation
    }
  }

  test("amihud: strictly positive, day accounting bounded by return days") {
    import graft.operators.TimeSeriesOps
    val rows = TimeSeriesOps.amihud(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 31) // within the window
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("readability: the flesch formula replays from the engine's own counts") {
    import graft.functions.TextOps
    val rows = TextOps.readabilityDf(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.take(100).foreach { r =>
      val (w, s0, sy) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w >= 1 && s0 >= 1 && sy >= 0)
      val f = 206.835 - 1.015 * (w.toDouble / s0) - 84.6 * (sy.toDouble / math.max(w, 1L))
      assert(math.abs(r.getDouble(4) -
        BigDecimal(f).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, r)
    }
  }

  test("rfm: scores in 1..5, quintiles balanced, recency inversion holds") {
    import graft.operators.FunnelOps
    val rows = FunnelOps.rfmSegments(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    rows.foreach { r =>
      Seq(4, 5, 6).foreach(i => assert(r.getLong(i) >= 1 && r.getLong(i) <= 5))
      assert(r.getString(7) ==
        s"${r.getLong(4)}${r.getLong(5)}${r.getLong(6)}")
    }
    // monetary is near-unique -> its quintiles are balanced within ties
    val mBuckets = rows.groupBy(_.getLong(6)).view.mapValues(_.size)
    mBuckets.values.foreach(c => assert(c <= 2 * n / 5 + 1, mBuckets))
    // recency inversion: r_score is non-increasing in recency (ties share
    // a quintile — with ONE distinct recency everyone lands mid-quintile,
    // which is the tie-stable midrank semantics, so assert monotonicity
    // over distinct values rather than a fixed top score)
    val byRec = rows.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getLong(4)).distinct).toSeq.sortBy(_._1)
    byRec.foreach { case (_, scores) => assert(scores.size == 1) } // tie-stable
    byRec.map(_._2.head).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a)
      case _ =>
    }
  }

  test("path top-k: well-formed trigrams that match a driver-side replay") {
    import graft.operators.FunnelOps
    val rows = FunnelOps.pathTopK(spark, sf0001).collect()
    assert(rows.nonEmpty)
    var prev = Long.MaxValue
    rows.foreach { r =>
      assert(r.getString(0).split(">").length == 3)
      assert(r.getLong(1) <= prev); prev = r.getLong(1)
    }
    // sequential replay: sessions by the 30-min gap rule, trigram counts
    // order by full-resolution ts (micros) + event_id — the engine's sort —
    // while the GAP rule compares floor-second values (ts.cast("long"))
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("um"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    var curUser = -1L; var lastSec = Long.MinValue
    var session = List.empty[String]
    def flush(): Unit = {
      val s0 = session.reverse
      if (s0.length >= 3) s0.sliding(3).foreach { g =>
        val p = g.mkString(">")
        counts(p) = counts.getOrElse(p, 0L) + 1
      }
      session = Nil
    }
    ev.foreach { case (u, um, _, tp) =>
      val sec = Math.floorDiv(um, 1000000L)
      if (u != curUser || sec - lastSec > 1800) { flush(); curUser = u }
      session ::= tp; lastSec = sec
    }
    flush()
    val expected = counts.toSeq.sortBy(t => (-t._2, t._1)).take(15)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == expected)
  }

  test("ndcg: bounded by 1, idcg dominates dcg, positive gains present") {
    import graft.operators.RetrievalOps
    val r = RetrievalOps.ndcgEval(spark, sf0001).first()
    val (dcg, idcg, ndcg) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(dcg > 0 && idcg > 0)
    assert(idcg >= dcg - 1e-9)
    assert(ndcg > 0 && ndcg <= 1.0 + 1e-9)
  }

  test("kappa: perfect agreement pins kappa to exactly 1 shape (synthetic)") {
    // identity check of the closed form on a crafted 2x2: n11=40, n00=60
    // -> po=1, kappa=1 regardless of marginals
    val n11 = 40L; val n00 = 60L; val n = n11 + n00
    val peNum = n11 * n11 + n00 * n00
    val kappa = (n * (n11 + n00) - peNum).toDouble / (n * n - peNum).toDouble
    assert(kappa == 1.0)
  }
}
