package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral-analytics operators over the event stream — the two signature
  * ClickHouse parametric aggregates (`windowFunnel`, `retention`) that users
  * of the reference's ClickHouse warehouse
  * (`dao/ClickHouseDAO.java:146-158` is where its rows land) would reach for
  * first, re-expressed as declarative Spark plans.
  *
  * Funnel semantics (matching ClickHouse `windowFunnel(window)(ts, c1..ck)`
  * in its default mode): per user, the maximum `k` such that events
  * `e_1 .. e_k` exist with `type(e_j) = stage_j`, non-decreasing
  * timestamps, and `ts_k - ts_1 <= window`. Chains may skip unrelated
  * events; each chain is anchored at its own stage-1 event.
  *
  * Plan shape: filter to stage events (pushed to the scan), ONE shuffle on
  * `user_id`, per-user sort via `sort_array`, then a single left-to-right
  * fold (`aggregate` HOF — codegen'd, no UDF) carrying `k` longs of state:
  * `best[i]` = the latest stage-1 anchor among chains reaching stage `i`.
  * Keeping the LATEST anchor dominates: extending a chain at time `t`
  * requires `anchor >= t - window`, so the maximal anchor admits every
  * extension any other chain would. The per-user array is session-scale
  * (bounded by one user's activity, same contract as `ts_sessionize`); at
  * extreme per-user cardinality the identical DP runs as `k` stacked
  * running-max window functions over one (user, ts) sort — same shuffle,
  * no collect — documented here as the escape hatch.
  */
object FunnelOps {

  val Stages: Seq[String] = Seq("view", "click", "purchase")
  val WindowSec: Long     = 4 * 3600L

  def windowFunnel(s: SparkSession, d: String,
      stages: Seq[String] = Stages, windowSec: Long = WindowSec): DataFrame = {
    val k        = stages.length
    val winUs    = windowSec * 1000000L
    val sentinel = Long.MinValue
    // stage index as a CASE chain: codegen'd, no array allocation per row
    val idxExpr = stages.zipWithIndex.foldLeft(lit(-1)) { case (acc, (st, i)) =>
      when(col("event_type") === st, lit(i)).otherwise(acc)
    }
    Tables.events(s, d)
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("ts"), idxExpr.as("idx")).as("e"))
      .groupBy("user_id")
      // lexicographic struct sort = (ts, stage_idx): at equal ts the earlier
      // stage folds first, so same-timestamp chains resolve exactly like the
      // oracle's non-strict `>=` chain condition
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(col("user_id"),
        aggregate(
          col("evs"),
          array_repeat(lit(sentinel), k),
          (acc, e) => transform(acc, (best, i) =>
            when(i === e.getField("idx"),
              when(e.getField("idx") === lit(0),
                greatest(best, e.getField("ts")))
                .otherwise(
                  // element_at is 1-based, so index i reads best[i-1];
                  // only reached when idx >= 1 (CASE branches are lazy)
                  when(element_at(acc, i) >= e.getField("ts") - winUs,
                    greatest(best, element_at(acc, i)))
                    .otherwise(best)))
              .otherwise(best)),
          acc => size(filter(acc, best => best =!= sentinel))
        ).as("funnel_level"))
      .orderBy("user_id")
  }

  /** Oracle replays the DP as greedy chains: for a FIXED stage-1 anchor the
    * earliest qualifying next-stage event is optimal (it maximizes room for
    * later stages), so per-anchor `min` subqueries + a max over anchors
    * reproduce the exists-a-chain semantics exactly.
    */
  val windowFunnelSql: String = {
    val w = WindowSec * 1000000L
    s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts, event_type
       |           FROM events WHERE event_type IN ('view', 'click', 'purchase')),
       |u AS (SELECT DISTINCT user_id FROM e),
       |anchors AS (SELECT user_id, ts AS t1 FROM e WHERE event_type = 'view'),
       |c2 AS (SELECT a.user_id, a.t1,
       |         (SELECT min(b.ts) FROM e b WHERE b.user_id = a.user_id
       |            AND b.event_type = 'click' AND b.ts >= a.t1) AS t2
       |       FROM anchors a),
       |c3 AS (SELECT user_id, t1, t2,
       |         (SELECT min(cc.ts) FROM e cc WHERE cc.user_id = c2.user_id
       |            AND cc.event_type = 'purchase' AND cc.ts >= c2.t2) AS t3
       |       FROM c2),
       |lvl AS (SELECT user_id,
       |         max(CASE WHEN t3 IS NOT NULL AND t3 - t1 <= $w THEN 3
       |                  WHEN t2 IS NOT NULL AND t2 - t1 <= $w THEN 2
       |                  ELSE 1 END) AS funnel_level
       |        FROM c3 GROUP BY user_id)
       |SELECT u.user_id, CAST(COALESCE(lvl.funnel_level, 0) AS INTEGER) AS funnel_level
       |FROM u LEFT JOIN lvl USING (user_id)
       |ORDER BY user_id""".stripMargin
  }

  /** ClickHouse-`retention` cohort analysis: the cohort is users who signed
    * up in week 1; each later flag counts only within the cohort
    * (`r_i = cond_1 AND cond_i`, exactly the ClickHouse contract). Two
    * partial-aggregable shuffles (per-user flags, then the global fold) —
    * the whole query is map-side-combinable at any scale. All-integer
    * output, hash-stable.
    */
  def retention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
      to_date(col("ts")).as("day"))
    val flag = (c: org.apache.spark.sql.Column) => max(when(c, 1).otherwise(0))
    ev.groupBy("user_id")
      .agg(
        flag(col("event_type") === "signup" &&
          col("day") < lit("2024-01-08")).as("in_cohort"),
        flag(col("event_type") === "view" &&
          col("day") >= lit("2024-01-08") && col("day") < lit("2024-01-15")).as("viewed_w2"),
        flag(col("event_type") === "purchase" &&
          col("day") >= lit("2024-01-08") && col("day") < lit("2024-01-15")).as("purchased_w2"))
      .agg(
        sum(col("in_cohort")).as("cohort_users"),
        sum(col("in_cohort") * col("viewed_w2")).as("retained_users"),
        sum(col("in_cohort") * col("purchased_w2")).as("converted_users"))
  }

  val retentionSql: String =
    """WITH f AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'signup'
      |             AND CAST(ts AS DATE) < DATE '2024-01-08' THEN 1 ELSE 0 END) AS in_cohort,
      |    max(CASE WHEN event_type = 'view'
      |             AND CAST(ts AS DATE) >= DATE '2024-01-08'
      |             AND CAST(ts AS DATE) < DATE '2024-01-15' THEN 1 ELSE 0 END) AS viewed_w2,
      |    max(CASE WHEN event_type = 'purchase'
      |             AND CAST(ts AS DATE) >= DATE '2024-01-08'
      |             AND CAST(ts AS DATE) < DATE '2024-01-15' THEN 1 ELSE 0 END) AS purchased_w2
      |  FROM events GROUP BY user_id)
      |SELECT CAST(sum(in_cohort) AS BIGINT) AS cohort_users,
      |       CAST(sum(in_cohort * viewed_w2) AS BIGINT) AS retained_users,
      |       CAST(sum(in_cohort * purchased_w2) AS BIGINT) AS converted_users
      |FROM f""".stripMargin

  /** ClickHouse-`sequenceMatch` pattern search: per user, encode the
    * time-ordered event stream as one character per event and run the
    * pattern as a plain regex over that string — `(?1).*(?2).*(?3)` becomes
    * `v.*c.*p`. Ties are broken (ts, char) in BOTH engines, so equal-ts
    * orderings are deterministic, not luck. One shuffle on user_id; the
    * per-user string is session-scale (same contract as `windowFunnel`).
    * Regex evaluation is per-row codegen'd string work — no UDF.
    */
  def seqMatch(s: SparkSession, d: String): DataFrame = {
    val chExpr = when(col("event_type") === "view", "v")
      .when(col("event_type") === "click", "c")
      .when(col("event_type") === "purchase", "p")
      .when(col("event_type") === "error", "e")
      .when(col("event_type") === "signup", "s")
      .otherwise("x")
    Tables.events(s, d)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("ts"), chExpr.as("ch")).as("e"))
      .groupBy("user_id")
      .agg(array_join(
        transform(sort_array(collect_list(col("e"))), x => x.getField("ch")), "")
        .as("seq"))
      .select(col("user_id"), col("seq"),
        col("seq").rlike("v.*c.*p").cast("int").as("m_funnel"),
        col("seq").rlike("e.*p").cast("int").as("m_error_then_purchase"))
      .orderBy("user_id")
  }

  val seqMatchSql: String =
    """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts,
      |  CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      |       WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
      |       WHEN 'signup' THEN 's' ELSE 'x' END AS ch FROM events),
      |s AS (SELECT user_id, string_agg(ch, '' ORDER BY ts, ch) AS seq
      |      FROM e GROUP BY user_id)
      |SELECT user_id, seq,
      |  CAST(regexp_matches(seq, 'v.*c.*p') AS INTEGER) AS m_funnel,
      |  CAST(regexp_matches(seq, 'e.*p') AS INTEGER) AS m_error_then_purchase
      |FROM s ORDER BY user_id""".stripMargin

  /** Gaps-and-islands: longest consecutive-active-day streak per user via
    * the classic `epoch_day − row_number()` island key — all-integer, two
    * partial-aggregable aggregations after one per-user window whose
    * partition is the user's distinct active days (bounded by calendar
    * span, never by event volume).
    */
  def streaks(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("ed"))
      .distinct()
    days
      .withColumn("grp",
        col("ed") - row_number().over(Window.partitionBy("user_id").orderBy("ed")))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("best_streak"), sum("len").as("active_days"))
      .orderBy("user_id")
  }

  val streaksSql: String =
    """WITH days AS (SELECT DISTINCT user_id,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
      |g AS (SELECT user_id,
      |    datediff('day', DATE '1970-01-01', day)
      |      - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
      |  FROM days),
      |i AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
      |SELECT user_id, CAST(max(len) AS BIGINT) AS best_streak,
      |       CAST(sum(len) AS BIGINT) AS active_days
      |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Full cohort-retention matrix — the generalization of [[retention]]'s
    * single-cohort row: users grouped by FIRST-ACTIVITY week (the cohort),
    * counted in every subsequent week they were active, reported as
    * (cohort_week, week_offset, n_active, cohort_size). Two partial-
    * aggregable passes (per-user first week; distinct user-week activity)
    * joined on the user key, with cohort sizes broadcast back onto
    * week-count-sized output. The product-analytics staple.
    */
  def cohortMatrix(s: SparkSession, d: String): DataFrame = {
    val weekly = Tables.events(s, d)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week")).distinct()
    val cohort = weekly.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    weekly.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        // both dates are week-truncated, so the day diff is an exact
        // multiple of 7 and the double division truncates losslessly
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .orderBy("cohort_week", "week_offset")
  }

  val cohortMatrixSql: String =
    """WITH weekly AS (SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
      |  FROM events),
      |cohort AS (SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY 1),
      |sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
      |          FROM cohort GROUP BY 1),
      |m AS (SELECT c.cohort_week,
      |        CAST(date_diff('day', c.cohort_week, w.week) / 7 AS BIGINT) AS week_offset,
      |        CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_active
      |      FROM weekly w JOIN cohort c USING (user_id) GROUP BY 1, 2)
      |SELECT cohort_week, week_offset, n_active, cohort_size
      |FROM m JOIN sizes USING (cohort_week)
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** First-order behavioral Markov matrix: per-user event streams ordered
    * by (ts, event_id), counted over consecutive (from → to) type pairs,
    * with the row-normalized transition probability as one exact-integer
    * division. The lag window partitions by user (session-scale); the
    * count and its row total are two partial-aggregable group-bys with the
    * type-sized totals broadcast back.
    */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag("event_type", 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("row_total"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .withColumn("p", col("n").cast("double") / col("row_total").cast("double"))
      .orderBy("from_type", "to_type")
  }

  val transitionsSql: String =
    """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts,
      |    event_id, event_type FROM events),
      |p AS (SELECT user_id, event_type AS to_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |  FROM e),
      |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |      FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n, t.row_total,
      |       CAST(c.n AS DOUBLE) / CAST(t.row_total AS DOUBLE) AS p
      |FROM c JOIN t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  /** RFM segmentation (Hughes 1994's recency/frequency/monetary scoring —
    * the classic CRM cut, public): per user, days since last activity,
    * event count, and total spend in cents, each scored into quintiles
    * 1–5 by EXACT midrank arithmetic over the scale-safe cumulated value
    * histograms ([[graft.queries.AnalyticsQueries.globalCumHistogram]]):
    * `q = ((lo+hi−2)·5) div (2n) + 1` is integral and tie-stable, so no
    * percentile interpolation can drift cross-engine. Recency inverts
    * (recent = 5). One user-level groupBy (localCheckpointed: three
    * histogram joins consume it), then value-NDV-sized joins.
    */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      col("ts").cast("date").as("day"),
      (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    val mx = ev.agg(max("day").as("mxd"))
    val per = ev.groupBy("user_id")
      .agg(max("day").as("last_day"), count(lit(1)).as("f"),
        sum("cents").as("m"))
      .crossJoin(broadcast(mx))
      .withColumn("rec", datediff(col("mxd"), col("last_day")).cast("long"))
      .select("user_id", "rec", "f", "m")
      .localCheckpoint(true)
    def quint(valCol: String, out: String): DataFrame =
      graft.queries.AnalyticsQueries
        .globalCumHistogram(per.select(col(valCol).as("v")), "v")
        .select(col("v").as(valCol),
          (expr("((lo + hi - 2) * 5) div (2 * n)") + 1).as(out))
    per
      .join(quint("rec", "rq"), "rec")
      .join(quint("f", "fq"), "f")
      .join(quint("m", "mq"), "m")
      .select(col("user_id"), col("rec"), col("f"), col("m"),
        (lit(6L) - col("rq")).as("r_score"), col("fq").as("f_score"),
        col("mq").as("m_score"),
        concat(lit(6L) - col("rq"), col("fq"), col("mq")).as("segment"))
      .orderBy("user_id")
  }
  val rfmSegmentsSql: String =
    """WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events),
      |mx AS (SELECT max(day) AS mxd FROM ev),
      |per AS (SELECT user_id,
      |    CAST(date_diff('day', max(day), (SELECT mxd FROM mx)) AS BIGINT) AS rec,
      |    CAST(count(*) AS BIGINT) AS f, CAST(sum(cents) AS BIGINT) AS m
      |  FROM ev GROUP BY user_id),
      |hr AS (SELECT v, ((lo + hi - 2) * 5) // (2 * n) + 1 AS q FROM (
      |    SELECT v, hi - cnt + 1 AS lo, hi, sum(cnt) OVER () AS n FROM (
      |      SELECT rec AS v, CAST(count(*) AS BIGINT) AS cnt,
      |             sum(count(*)) OVER (ORDER BY rec
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      |      FROM per GROUP BY rec))),
      |hf AS (SELECT v, ((lo + hi - 2) * 5) // (2 * n) + 1 AS q FROM (
      |    SELECT v, hi - cnt + 1 AS lo, hi, sum(cnt) OVER () AS n FROM (
      |      SELECT f AS v, CAST(count(*) AS BIGINT) AS cnt,
      |             sum(count(*)) OVER (ORDER BY f
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      |      FROM per GROUP BY f))),
      |hm AS (SELECT v, ((lo + hi - 2) * 5) // (2 * n) + 1 AS q FROM (
      |    SELECT v, hi - cnt + 1 AS lo, hi, sum(cnt) OVER () AS n FROM (
      |      SELECT m AS v, CAST(count(*) AS BIGINT) AS cnt,
      |             sum(count(*)) OVER (ORDER BY m
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      |      FROM per GROUP BY m)))
      |SELECT per.user_id, per.rec, per.f, per.m,
      |  CAST(6 - hr.q AS BIGINT) AS r_score,
      |  CAST(hf.q AS BIGINT) AS f_score,
      |  CAST(hm.q AS BIGINT) AS m_score,
      |  CAST(6 - hr.q AS VARCHAR) || CAST(hf.q AS VARCHAR) || CAST(hm.q AS VARCHAR) AS segment
      |FROM per
      |JOIN hr ON per.rec = hr.v
      |JOIN hf ON per.f = hf.v
      |JOIN hm ON per.m = hm.v
      |ORDER BY per.user_id""".stripMargin

  /** Top-k most common 3-step behavioral paths within sessions — the
    * "what do users actually do" report next to [[transitions]]' 1-step
    * matrix. Sessions use [[graft.operators.TimeSeriesOps.sessionize]]'s
    * exact gap rule; each session's type sequence is ordered canonically
    * by sort_array over (ts, event_id, type) structs (collect_list alone
    * is partition-order-dependent), and the trigram explode fans out per
    * event — data-scale but map-side, followed by one partial-aggregable
    * count and a bounded-heap top-k.
    */
  def pathTopK(s: SparkSession, d: String, gapMinutes: Int = 30,
      k: Int = 15): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val sess = Tables.events(s, d)
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      .withColumn("_new",
        when(col("_prev").isNull ||
          col("ts").cast("long") - col("_prev").cast("long") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("_new").over(run))
    val seqs = sess.groupBy("user_id", "sid")
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(transform(col("evs"), e => e.getField("event_type")).as("types"))
    seqs.filter(size(col("types")) >= 3)
      .select(explode(transform(sequence(lit(1), size(col("types")) - 2),
        i => concat_ws(">", slice(col("types"), i, lit(3))))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }
  def pathTopKSql(gapMinutes: Int = 30, k: Int = 15): String =
    s"""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
       |l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM ev),
       |s AS (SELECT *, CAST(sum(CASE WHEN pts IS NULL OR
       |          date_diff('second', pts, ts) > ${gapMinutes * 60} THEN 1 ELSE 0 END)
       |        OVER (PARTITION BY user_id ORDER BY ts, event_id
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
       |      FROM l),
       |q AS (SELECT user_id, sid, list(event_type ORDER BY ts, event_id) AS types
       |      FROM s GROUP BY 1, 2),
       |g AS (SELECT array_to_string(types[i:i+2], '>') AS path
       |      FROM q CROSS JOIN UNNEST(generate_series(1, len(types) - 2)) AS u(i)
       |      WHERE len(types) >= 3)
       |SELECT path, CAST(count(*) AS BIGINT) AS n FROM g
       |GROUP BY path ORDER BY n DESC, path LIMIT $k""".stripMargin

  /** Multi-touch attribution — the marketing-analytics staple: every
    * purchase (conversion) distributes credit over the click/view touches
    * that preceded it within the lookback window, under the three
    * canonical models at once: first-touch (the touch that opened the
    * journey), last-touch (the one that closed it), and linear (every
    * touch shares equally). Conversions with no in-window touch are
    * unattributed and excluded (reported by the count delta vs
    * `a11`-style totals).
    *
    * Exactness discipline: linear shares are 1/k — not finite decimals —
    * so credit is carried as FLOOR-scaled integer micro-credits
    * (`m * 10^6 div k` per conversion × channel), summed exactly; both
    * engines produce the identical integers. First/last picks are
    * min/max over (ts, event_id) structs — event_id breaks ties totally.
    *
    * Scale shape: one user-keyed join of conversions × touches with the
    * window predicate (both sides pre-filtered at the scan; per-user
    * event counts bound the pair fan-out, the `ts_sessionize` contract),
    * then everything is conversion-count-sized: two partial-aggregable
    * group-bys and a channel-count-sized stitch. No windows, no collect.
    */
  def attribution(s: SparkSession, d: String, lookbackDays: Int = 7): DataFrame =
    attributionOver(Tables.events(s, d), lookbackDays)

  /** [[attribution]] over any `(user_id, event_id, ts, event_type)` frame —
    * public so specs replay the credit rules on crafted journeys.
    */
  def attributionOver(events: DataFrame, lookbackDays: Int = 7): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"), col("ts").as("cts"))
    val touch = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("tid"), col("ts").as("tts"),
        col("event_type").as("channel"))
    val paired = conv.join(touch, Seq("user_id"))
      .filter(col("tts") <= col("cts") &&
        col("tts") >= col("cts") - expr(s"INTERVAL $lookbackDays DAYS"))
      .localCheckpoint(true) // feeds per-conversion AND per-channel rollups
    val perConv = paired.groupBy("conv_id").agg(
      count(lit(1)).as("k"),
      min(struct(col("tts"), col("tid"), col("channel"))).as("first"),
      max(struct(col("tts"), col("tid"), col("channel"))).as("last"))
    val linear = paired.groupBy("conv_id", "channel")
      .agg(count(lit(1)).as("m"))
      .join(perConv.select("conv_id", "k"), Seq("conv_id"))
      .select(col("channel"), expr("(m * 1000000) div k").as("cr"))
      .groupBy("channel").agg(sum("cr").as("linear_micro"))
    val firsts = perConv.groupBy(col("first.channel").as("channel"))
      .agg(count(lit(1)).as("first_touch"))
    val lasts = perConv.groupBy(col("last.channel").as("channel"))
      .agg(count(lit(1)).as("last_touch"))
    val touches = paired.groupBy("channel").agg(count(lit(1)).as("n_touches"))
    touches
      .join(firsts, Seq("channel"), "left")
      .join(lasts, Seq("channel"), "left")
      .join(linear, Seq("channel"), "left")
      .select(col("channel"), col("n_touches"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        coalesce(col("linear_micro"), lit(0L)).as("linear_micro"))
      .orderBy("channel")
  }
  def attributionSql(lookbackDays: Int = 7): String =
    s"""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
       |            FROM events),
       |conv AS (SELECT user_id, event_id AS conv_id, ts AS cts
       |         FROM ev WHERE event_type = 'purchase'),
       |touch AS (SELECT user_id, event_id AS tid, ts AS tts, event_type AS channel
       |          FROM ev WHERE event_type IN ('click', 'view')),
       |paired AS MATERIALIZED (
       |  SELECT c.conv_id, t.tid, t.tts, t.channel
       |  FROM conv c JOIN touch t USING (user_id)
       |  WHERE t.tts <= c.cts AND t.tts >= c.cts - INTERVAL $lookbackDays DAY),
       |pc AS MATERIALIZED (
       |  SELECT conv_id, CAST(count(*) AS BIGINT) AS k,
       |         min(ROW(tts, tid, channel)) AS fst,
       |         max(ROW(tts, tid, channel)) AS lst
       |  FROM paired GROUP BY conv_id),
       |lin AS (SELECT channel, CAST(sum((m * 1000000) // k) AS BIGINT) AS linear_micro
       |        FROM (SELECT p.conv_id, p.channel, CAST(count(*) AS BIGINT) AS m
       |              FROM paired p GROUP BY p.conv_id, p.channel) x
       |        JOIN pc USING (conv_id) GROUP BY channel),
       |fst AS (SELECT fst[3] AS channel, CAST(count(*) AS BIGINT) AS first_touch
       |        FROM pc GROUP BY 1),
       |lst AS (SELECT lst[3] AS channel, CAST(count(*) AS BIGINT) AS last_touch
       |        FROM pc GROUP BY 1),
       |tch AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_touches
       |        FROM paired GROUP BY channel)
       |SELECT tch.channel, tch.n_touches,
       |  COALESCE(fst.first_touch, 0) AS first_touch,
       |  COALESCE(lst.last_touch, 0) AS last_touch,
       |  COALESCE(lin.linear_micro, 0) AS linear_micro
       |FROM tch
       |LEFT JOIN fst ON tch.channel = fst.channel
       |LEFT JOIN lst ON tch.channel = lst.channel
       |LEFT JOIN lin ON tch.channel = lin.channel
       |ORDER BY tch.channel""".stripMargin
}
