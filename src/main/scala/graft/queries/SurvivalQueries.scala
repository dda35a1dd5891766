package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Survival analysis over the event stream — time-to-conversion with
  * right-censoring, the product-limit machinery behind churn/retention
  * curves (Kaplan & Meier 1958; Nelson–Aalen for the cumulative hazard —
  * both public-domain statistics). The reference has no analytics of this
  * class; it belongs to the engine's experiment/behavioral family next to
  * `w_funnel_latency` (which reports conversion percentiles but silently
  * conditions on conversion — the survival curve is the version that
  * handles users who never convert).
  *
  * Subject: hours from a user's FIRST activity to their FIRST `purchase`,
  * administratively right-censored at [[HorizonHours]]. Durations are
  * exact integer hours from `unix_micros` differences (NOT engine
  * date_diff, whose hour semantics differ between boundary-counting and
  * elapsed-time across engines).
  *
  * Scale shape: two partial-aggregable per-user min aggregations (one
  * shuffle on user_id), then everything downstream is DURATION-NDV-sized —
  * bounded by the horizon (49 values here), never by users. At-risk counts
  * come from the scale-safe cumulated duration histogram
  * ([[AnalyticsQueries.globalCumHistogram]]: `n_risk(t) = n − lo(t) + 1`),
  * and the product-limit accumulation is a bounded self-join over death
  * times (≤ horizon rows, broadcast) — the same bounded-frame discipline
  * as [[AnalyticsQueries.skyline]].
  *
  * Cross-engine float determinism (the [[PipelineQueries.bigramLm]]
  * discipline): each step's `ln(1 − d/n)` and hazard `d/n` are round-6
  * DECIMAL terms, summed exactly; the survival probability is one final
  * `round(exp(·), 6)`. The ln argument is clamped at 1e-12 so a step where
  * everyone at risk dies yields S≈0 instead of a non-finite DECIMAL cast.
  */
object SurvivalQueries {

  val HorizonHours = 48
  private val D6 = "decimal(18,6)"
  private val MicrosPerHour = 3600L * 1000000L

  /** Per-user (duration, censored) pairs: `dur` = whole hours from first
    * activity to first purchase, clamped to the horizon; `c` = 1 when the
    * user had not purchased by the horizon (or never purchased).
    */
  private def durations(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("um"))
    val first = ev.groupBy("user_id").agg(min("um").as("fu"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("um").as("pu"))
    first.join(firstPurchase, Seq("user_id"), "left")
      .withColumn("h", expr(s"(pu - fu) div $MicrosPerHour"))
      .select(
        when(col("h").isNull || col("h") >= HorizonHours, lit(HorizonHours.toLong))
          .otherwise(col("h")).as("dur"),
        when(col("h").isNull || col("h") >= HorizonHours, 1L).otherwise(0L).as("c"))
  }

  /** Kaplan–Meier survival curve + Nelson–Aalen cumulative hazard of
    * time-to-first-purchase. One row per death time: the at-risk count,
    * deaths, `km_surv` = Π(1 − d/n) so far, `na_cumhaz` = Σ d/n so far.
    */
  def kaplanMeier(s: SparkSession, d: String): DataFrame = {
    val u = durations(s, d)
    val cum = AnalyticsQueries.globalCumHistogram(u.select("dur"), "dur")
    val deaths = u.filter(col("c") === 0)
      .groupBy("dur").agg(count(lit(1)).as("d_events"))
    val steps = cum.join(deaths, "dur")
      .select(col("dur").as("t"),
        (col("n") - col("lo") + 1).as("n_risk"), col("d_events"))
      .withColumn("term",
        round(log(greatest(
          lit(1.0) - col("d_events").cast("double") / col("n_risk"),
          lit(1e-12))), 6).cast(D6))
      .withColumn("haz",
        round(col("d_events").cast("double") / col("n_risk"), 6).cast(D6))
    val other = steps.select(col("t").as("t2"),
      col("term").as("term2"), col("haz").as("haz2"))
    steps.join(broadcast(other), col("t2") <= col("t"))
      .groupBy("t", "n_risk", "d_events")
      .agg(sum("term2").as("ls"), sum("haz2").as("ch"))
      .select(col("t"), col("n_risk"), col("d_events"),
        round(exp(col("ls").cast("double")), 6).as("km_surv"),
        col("ch").cast("double").as("na_cumhaz"))
      .orderBy("t")
  }

  val kaplanMeierSql: String =
    s"""WITH e AS (SELECT user_id, event_type,
       |             epoch_us(CAST(ts AS TIMESTAMP)) AS um FROM events),
       |f AS (SELECT user_id, min(um) AS fu FROM e GROUP BY 1),
       |p AS (SELECT user_id, min(um) AS pu FROM e WHERE event_type = 'purchase' GROUP BY 1),
       |u AS (SELECT CASE WHEN h IS NULL OR h >= $HorizonHours
       |               THEN $HorizonHours ELSE h END AS dur,
       |             CASE WHEN h IS NULL OR h >= $HorizonHours THEN 1 ELSE 0 END AS c
       |      FROM (SELECT (p.pu - f.fu) // $MicrosPerHour AS h
       |            FROM f LEFT JOIN p USING (user_id))),
       |h AS (SELECT dur, CAST(count(*) AS BIGINT) AS cnt FROM u GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
       |ch AS (SELECT dur, cnt,
       |         sum(cnt) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
       |       FROM h),
       |death AS (SELECT dur, CAST(count(*) AS BIGINT) AS d_events FROM u WHERE c = 0 GROUP BY 1),
       |step AS (SELECT c.dur AS t, CAST(tot.n - (c.hi - c.cnt + 1) + 1 AS BIGINT) AS n_risk,
       |           death.d_events,
       |           CAST(round(ln(greatest(
       |             1.0 - CAST(death.d_events AS DOUBLE) / (tot.n - (c.hi - c.cnt + 1) + 1),
       |             1e-12)), 6) AS DECIMAL(18,6)) AS term,
       |           CAST(round(CAST(death.d_events AS DOUBLE) / (tot.n - (c.hi - c.cnt + 1) + 1), 6)
       |                AS DECIMAL(18,6)) AS haz
       |         FROM ch c JOIN death USING (dur) CROSS JOIN tot)
       |SELECT a.t, a.n_risk, a.d_events,
       |  round(exp(CAST(sum(b.term) AS DOUBLE)), 6) AS km_surv,
       |  CAST(sum(b.haz) AS DOUBLE) AS na_cumhaz
       |FROM step a JOIN step b ON b.t <= a.t
       |GROUP BY a.t, a.n_risk, a.d_events
       |ORDER BY a.t""".stripMargin
}
