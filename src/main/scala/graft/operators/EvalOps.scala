package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.AnalyticsQueries
import graft.functions.TextOps

/** Model-evaluation operators — the queries a pipeline runs to decide
  * whether a filter/classifier is good enough to gate 100 TB of data:
  * ROC-AUC of a score against labels, a calibration (reliability) report,
  * and chance-corrected annotator agreement (Cohen's kappa). The reference
  * ships heuristics without eval queries (its quality gates are hard-coded
  * thresholds, e.g. `service/TickerDataService.java`'s validation cutoffs);
  * a curation engine must measure its gates on the data they will filter.
  *
  * All three are exact-integer until the final division:
  *  - AUC is the tie-corrected Mann–Whitney rank-sum, with ranks read off
  *    the scale-safe cumulated score histogram ([[AnalyticsQueries
  *    .globalCumHistogram]]) — no data-scale global sort, no per-row rank
  *    window. The numerator `2U = Σ_v pos_v·(lo_v+hi_v) − P(P+1)` stays a
  *    long (midrank×2 = lo+hi is integral even for even tie runs).
  *  - Calibration bins and Brier terms use the [[graft.queries
  *    .PipelineQueries.bigramLm]] determinism discipline: per-row round-6
  *    doubles summed as DECIMAL (order-independent), one double finish.
  *  - Kappa is four confusion counts and two exact-integer polynomials.
  *
  * 100 TB shape: score projection (codegen'd) → one shuffle on doc_id to
  * attach labels → NDV-sized histogram aggregation. The histogram is keyed
  * by the round-6 score (≤ a few million distinct values regardless of row
  * count), so everything after the first groupBy is bounded by score NDV,
  * not data size.
  */
object EvalOps {

  private val D6 = "decimal(18,6)"

  /** Rater B's stopword list — the same 10 function words the quality
    * heuristics across the engine vote with (see [[TextOps.qualityDf]]).
    */
  private val RuleStops =
    Seq("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")

  /** Scored + labeled corpus: the frozen LR quality score (micro-units,
    * exact long) joined to the binary `lang = 'en'` gold label. The score
    * includes an English-stopword-ratio feature, so "does it discriminate
    * English" is a meaningful (and deliberately imperfect) eval target.
    */
  private def scoredLabeled(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
    val sc = QualityClassifier.frozenScores(docs)
      .withColumn("zc", round(col("zr") * lit(1e6)).cast("long"))
    val lab = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    sc.join(lab, "doc_id")
  }

  /** Exact ROC-AUC (tie-corrected Mann–Whitney / rank-sum form) of the
    * frozen quality score against the `lang='en'` label. Midranks come
    * from the cumulated histogram's [lo, hi] rank intervals: a value's
    * midrank×2 is `lo+hi`, so `2U = Σ pos_v·(lo_v+hi_v) − P(P+1)` is an
    * exact long and `AUC = 2U / (2·P·N)` is one double division both
    * engines perform on identical integers. Gini = 2·AUC − 1 rides along.
    *
    * Scale: the only data-sized steps are the score projection and one
    * doc_id join; the histogram and everything above it is score-NDV-sized
    * (bounded by the round-6 score domain, not by rows).
    */
  def rocAuc(s: SparkSession, d: String): DataFrame = {
    val sl = scoredLabeled(s, d)
    // one pass: the (count, positives)-carrying cumulated histogram — the
    // [[AnalyticsQueries.globalCumHistogram]] construction with the label
    // sum folded into the same groupBy, so the scored frame is evaluated
    // ONCE (the two-frame join form re-ran the whole scoring pipeline and
    // benched 3.3 s vs ~1 s for this)
    // checkpoint: h feeds the in-bucket window AND the bucket totals (and
    // bt is itself read three times via off/tot) — unmaterialized, the
    // whole scoring pipeline above re-ran once per consumer (16 parquet
    // scans in the before-plan; see AnalyticsQueries.cumulatedHistogramOf)
    val h = sl.groupBy("zc")
      .agg(count(lit(1)).as("cnt"), sum("y").as("p"))
      .withColumn("_b", expr("zc div 65536"))
      .localCheckpoint(true)
    val inBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("_b").orderBy("zc")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val hh = h.withColumn("_hi_in", sum("cnt").over(inBucket))
    val bt = h.groupBy("_b").agg(sum("cnt").as("_bcnt"))
    val off = bt
      .join(bt.select(col("_b").as("_b2"), col("_bcnt").as("_c2")),
        col("_b2") < col("_b"), "left")
      .groupBy("_b").agg(coalesce(sum("_c2"), lit(0L)).as("_off"))
    val tot = bt.agg(sum("_bcnt").cast("long").as("n"))
    val cum = hh.join(broadcast(off), Seq("_b")).crossJoin(broadcast(tot))
      .withColumn("hi", col("_off") + col("_hi_in"))
      .withColumn("lo", col("hi") - col("cnt") + 1)
    val t = cum.agg(
      sum(col("p") * (col("lo") + col("hi"))).cast("long").as("rs2"),
      sum("p").cast("long").as("pp"),
      max("n").cast("long").as("n"))
    // a ONE-CLASS corpus (every doc English, or none) zeroes P·N: AUC and
    // Gini are NULL (NumOps.safeDiv contract, = DuckDB's native x/0 →
    // NULL), never an ANSI DIVIDE_BY_ZERO job failure
    import graft.functions.NumOps.safeDiv
    val aucC = safeDiv(
      (col("rs2") - col("pp") * (col("pp") + 1)).cast("double"),
      lit(2.0) * col("pp") * (col("n") - col("pp")))
    t.select(
      col("pp").as("n_pos"),
      (col("n") - col("pp")).as("n_neg"),
      (col("rs2") - col("pp") * (col("pp") + 1)).as("u2"),
      aucC.as("auc"),
      (lit(2.0) * aucC - lit(1.0)).as("gini"))
  }

  val rocAucSql: String = {
    val zr = QualityClassifier.zrSql("doc_id")
    s"""WITH z AS (
       |$zr),
       |s AS (SELECT z.doc_id, CAST(round(zr * 1000000) AS BIGINT) AS zc,
       |             CASE WHEN dd.lang = 'en' THEN 1 ELSE 0 END AS y
       |      FROM z JOIN documents dd ON z.doc_id = dd.doc_id),
       |h AS (SELECT zc, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS p
       |      FROM s GROUP BY zc),
       |c AS (SELECT zc, cnt, p,
       |        sum(cnt) OVER (ORDER BY zc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
       |      FROM h),
       |t AS (SELECT CAST(sum(p * (hi - cnt + 1 + hi)) AS BIGINT) AS rs2,
       |             CAST(sum(p) AS BIGINT) AS pp, CAST(sum(cnt) AS BIGINT) AS n
       |      FROM c)
       |SELECT pp AS n_pos, n - pp AS n_neg,
       |       rs2 - pp * (pp + 1) AS u2,
       |       CAST(rs2 - pp * (pp + 1) AS DOUBLE) / (2.0 * pp * (n - pp)) AS auc,
       |       2.0 * (CAST(rs2 - pp * (pp + 1) AS DOUBLE) / (2.0 * pp * (n - pp))) - 1.0 AS gini
       |FROM t""".stripMargin
  }

  /** Calibration / reliability report of the frozen score's sigmoid
    * probability vs the `lang='en'` label: 10 fixed-width probability bins,
    * each with its count, mean predicted probability, empirical positive
    * rate, calibration gap, and Brier-score contribution. The per-row
    * sigmoid is round-6 (the [[graft.queries.PipelineQueries.bigramLm]]
    * ln/exp convention) and all bin sums are DECIMAL — order-independent,
    * so partitioning never changes the result. One codegen'd projection +
    * one 10-group partial-aggregable groupBy: the 100 TB shape is a single
    * shuffle of 10 rows per map task.
    */
  def calibration(s: SparkSession, d: String): DataFrame = {
    val sl = scoredLabeled(s, d)
      .withColumn("p6", round(lit(1.0) / (lit(1.0) + exp(-col("zr"))), 6))
      .withColumn("bin", least(floor(col("p6") * 10).cast("long"), lit(9L)))
    sl.groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("p6").cast(D6)).cast("double") / count(lit(1))).as("avg_pred"),
        (sum(col("y")).cast("double") / count(lit(1))).as("pos_rate"),
        sum(round((col("p6") - col("y")) * (col("p6") - col("y")), 6).cast(D6))
          .cast("double").as("brier_sum"))
      .withColumn("gap", abs(col("avg_pred") - col("pos_rate")))
      .orderBy("bin")
  }

  val calibrationSql: String = {
    val zr = QualityClassifier.zrSql("doc_id")
    s"""WITH z AS (
       |$zr),
       |s AS (SELECT z.doc_id, round(1.0 / (1.0 + exp(-zr)), 6) AS p6,
       |             CASE WHEN dd.lang = 'en' THEN 1 ELSE 0 END AS y
       |      FROM z JOIN documents dd ON z.doc_id = dd.doc_id),
       |b AS (SELECT least(CAST(floor(p6 * 10) AS BIGINT), 9) AS bin, p6, y FROM s),
       |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
       |        CAST(sum(CAST(p6 AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_pred,
       |        CAST(sum(y) AS DOUBLE) / count(*) AS pos_rate,
       |        CAST(sum(CAST(round((p6 - y) * (p6 - y), 6) AS DECIMAL(18,6))) AS DOUBLE) AS brier_sum
       |      FROM b GROUP BY bin)
       |SELECT bin, n_docs, avg_pred, pos_rate, brier_sum,
       |       abs(avg_pred - pos_rate) AS gap
       |FROM g ORDER BY bin""".stripMargin
  }

  /** Cohen's kappa between two quality gates over the same corpus: rater A
    * is the frozen-LR keep decision (`zr > KeepTau`), rater B a cheap
    * rule-based gate (`stop_ratio ≥ 5% AND n_tokens ≥ 30`) — the
    * "would the cheap rule make the same call as the model?" question every
    * labeler-vs-labeler audit asks, chance-corrected. Rater B's ratio test
    * is kept RATIONAL (`20·n_stop ≥ n_tokens`), so no float boundary can
    * flip a cell cross-engine; agreement po and chance pe stay
    * exact-integer polynomials of the four confusion counts, and
    * kappa = (n·(n11+n00) − pe_num) / (n² − pe_num) is one double division
    * of exact longs. One partial-aggregable pass over two codegen'd
    * projections joined on doc_id.
    */
  def cohenKappa(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
    val pred = QualityClassifier.frozenScores(docs)
      .select(col("doc_id"),
        when(col("zr") > QualityClassifier.KeepTau, 1L).otherwise(0L).as("a"))
    val toks = TextOps.tokens(col("text"))
    val rule = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), size(toks).as("n_tokens"),
        size(filter(toks, x => x.isInCollection(RuleStops))).as("n_stop"))
      .select(col("doc_id"),
        when(col("n_stop") * 20 >= col("n_tokens") && col("n_tokens") >= 30, 1L)
          .otherwise(0L).as("b"))
    val m = pred.join(rule, "doc_id").agg(
      count(lit(1)).as("n"),
      sum(col("a") * col("b")).as("n11"),
      sum(col("a") * (lit(1L) - col("b"))).as("n10"),
      sum((lit(1L) - col("a")) * col("b")).as("n01"),
      sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
    m.select(
      col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      ((col("n11") + col("n00")).cast("double") / col("n")).as("po"),
      (((col("n11") + col("n10")) * (col("n11") + col("n01")) +
        (col("n01") + col("n00")) * (col("n10") + col("n00"))).cast("double") /
        (col("n") * col("n"))).as("pe"),
      // two CONSTANT raters (pe = 1 — e.g. both always vote keep) zero
      // κ's 1−pe denominator: NULL via the NumOps.safeDiv contract
      // (DuckDB's x/0 is NULL), never an ANSI DIVIDE_BY_ZERO
      graft.functions.NumOps.safeDiv(
        (col("n") * (col("n11") + col("n00")) -
          ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
           (col("n01") + col("n00")) * (col("n10") + col("n00")))).cast("double"),
        (col("n") * col("n") -
          ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
           (col("n01") + col("n00")) * (col("n10") + col("n00")))).cast("double"))
        .as("kappa"))
  }

  val cohenKappaSql: String = {
    val zr = QualityClassifier.zrSql("doc_id")
    val stops = RuleStops.map("'" + _ + "'").mkString(",")
    s"""WITH z AS (
       |$zr),
       |r AS (SELECT doc_id,
       |        len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       |        len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                        x -> x IN ($stops))) AS n_stop
       |      FROM documents WHERE text IS NOT NULL),
       |j AS (SELECT CASE WHEN z.zr > ${QualityClassifier.KeepTau} THEN 1 ELSE 0 END AS a,
       |             CASE WHEN r.n_stop * 20 >= r.n_tokens AND r.n_tokens >= 30
       |                  THEN 1 ELSE 0 END AS b
       |      FROM z JOIN r USING (doc_id)),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |             CAST(sum(a * b) AS BIGINT) AS n11,
       |             CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
       |             CAST(sum((1 - a) * b) AS BIGINT) AS n01,
       |             CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
       |      FROM j)
       |SELECT n, n11, n10, n01, n00,
       |  CAST(n11 + n00 AS DOUBLE) / n AS po,
       |  CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
       |    / (n * n) AS pe,
       |  CAST(n * (n11 + n00) - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS DOUBLE)
       |    / CAST(n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS DOUBLE) AS kappa
       |FROM m""".stripMargin
  }
}
