package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval analytics over the order stream — the two window primitives a
  * warehouse user reaches for when the data is spans rather than points:
  * coalescing overlapping intervals (the classic "merge bookings" shape)
  * and an exact distinct count over a sliding date window (ClickHouse
  * `uniqExact` over a trailing week). The reference's warehouse
  * (`dao/ClickHouseDAO.java:146-158` lands rows that its users query this
  * way) has no engine-side form of either; both are declarative plans here.
  *
  * Scale contract shared by both operators: every window is PARTITIONED BY
  * a data-scale key (customer / calendar day) — no global window, no
  * driver-side state, and the sliding-distinct expansion is a constant ×7,
  * never O(days × users).
  */
object IntervalOps {

  /** Deterministic per-order service interval: starts at the order date and
    * spans `o_orderkey mod 30` extra days — key-derived, so both engines
    * rebuild the identical spans from the raw table.
    */
  private def intervals(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      to_date(col("o_orderdate")).as("s"),
      date_add(to_date(col("o_orderdate")), (col("o_orderkey") % 30).cast("int")).as("e"))

  /** Coalesce overlapping-or-touching service intervals per customer
    * (gaps-and-islands over spans, the complement of [[FunnelOps.streaks]]'
    * point-row islands): an interval starts a new island iff its start lies
    * strictly past the running max end of everything before it in
    * (start, end, key) order. Touching spans ([1,5],[5,9]) merge; adjacent
    * ones ([1,5],[6,9]) do not — the strict `>` is the contract.
    *
    * Plan: ONE shuffle on `o_custkey`, two stacked frames over the same
    * sort (running max-end, then running island-sum — Spark reuses the
    * single Window sort for both), then two partial-aggregable group-bys.
    * The window partition is per-customer (session-scale); nothing global.
    */
  def mergeIntervals(s: SparkSession, d: String): DataFrame =
    mergeIntervalsOver(intervals(s, d))

  /** Same operator over any `(o_custkey, o_orderkey, s, e)` span table —
    * the spec entry point (crafted island shapes).
    */
  def mergeIntervalsOver(iv: DataFrame): DataFrame = {
    val byStart = Window.partitionBy("o_custkey").orderBy("s", "e", "o_orderkey")
    val prevMaxEnd = max("e").over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(prevMaxEnd.isNull || col("s") > prevMaxEnd, 1L).otherwise(0L)
    val islandId = sum(newIsland).over(byStart.rowsBetween(Window.unboundedPreceding, 0))
    iv
      .withColumn("island", islandId)
      .groupBy("o_custkey", "island")
      .agg(count(lit(1)).as("n_iv"), min("s").as("i_s"), max("e").as("i_e"))
      .groupBy("o_custkey")
      .agg(
        sum("n_iv").as("n_intervals"),
        count(lit(1)).as("n_merged"),
        sum(datediff(col("i_e"), col("i_s")).cast("long") + 1L).as("covered_days"),
        max(datediff(col("i_e"), col("i_s")).cast("long") + 1L).as("max_span_days"))
      .orderBy("o_custkey")
  }

  /** Oracle replays the identical running-max island construction — the
    * algorithm is engine-neutral SQL, which is the point: a user can verify
    * the coalescing on any warehouse.
    */
  val mergeIntervalsSql: String =
    """WITH iv AS (
      |  SELECT o_custkey, o_orderkey,
      |         CAST(o_orderdate AS DATE) AS s,
      |         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 AS INTEGER) AS e
      |  FROM orders),
      |flagged AS (
      |  SELECT o_custkey, o_orderkey, s, e,
      |         CASE WHEN max(e) OVER (PARTITION BY o_custkey ORDER BY s, e, o_orderkey
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |                   IS NULL
      |                OR s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, e, o_orderkey
      |                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |              THEN 1 ELSE 0 END AS new_island
      |  FROM iv),
      |islands AS (
      |  -- the running sum MUST keep the full (s, e, o_orderkey) tie-break of
      |  -- the flag window: duplicate (s, e) spans ordered differently here
      |  -- would sum a flag-0 duplicate into the wrong island
      |  SELECT o_custkey, s, e,
      |         sum(new_island) OVER (PARTITION BY o_custkey ORDER BY s, e, o_orderkey
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM flagged),
      |merged AS (
      |  SELECT o_custkey, island, count(*) AS n_iv, min(s) AS i_s, max(e) AS i_e
      |  FROM islands GROUP BY o_custkey, island)
      |SELECT o_custkey,
      |       CAST(sum(n_iv) AS BIGINT) AS n_intervals,
      |       CAST(count(*) AS BIGINT) AS n_merged,
      |       CAST(sum(date_diff('day', i_s, i_e) + 1) AS BIGINT) AS covered_days,
      |       CAST(max(date_diff('day', i_s, i_e) + 1) AS BIGINT) AS max_span_days
      |FROM merged GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Exact distinct users over a trailing 7-day window, per active day —
    * the DAU/WAU board query, exact (no sketch). The scale-safe shape is
    * NOT a RANGE window (count-distinct isn't a window aggregate) and NOT
    * a day×pairs range join (O(days·|pairs|)): dedup to (day, user) FIRST
    * — the only data-scale shuffle — then each pair contributes to exactly
    * the 7 window-ends it can affect via a constant-width `sequence`
    * explode, and a two-phase hash agg counts distinct per end day.
    * Expansion is a fixed ×7 of the DEDUPED pairs, independent of raw
    * event volume; windows that end on days with no events are dropped by
    * the semi-join against observed days (broadcast — the day dimension is
    * calendar-bounded).
    */
  def slidingDistinct(s: SparkSession, d: String): DataFrame =
    slidingDistinctOver(Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")))

  /** Same operator over any `(day, user_id)` activity table (need not be
    * deduplicated — the first thing the plan does is the distinct).
    */
  def slidingDistinctOver(activity: DataFrame): DataFrame = {
    val pairs = activity.distinct()
    val days = pairs.select(col("day").as("wend")).distinct()
    val contrib = pairs.select(
      explode(sequence(col("day"), date_add(col("day"), 6))).as("wend"),
      col("user_id"))
    val weekly = contrib
      .join(broadcast(days), Seq("wend"), "left_semi")
      .groupBy("wend").agg(countDistinct("user_id").as("active_7d"))
    val daily = pairs.groupBy(col("day").as("wend"))
      .agg(count(lit(1)).as("active_1d"))
    daily.join(weekly, Seq("wend")).orderBy("wend")
  }

  /** Cumulative distinct users per day and event type (the adoption-curve
    * complement of the sliding window): a user counts toward a type once,
    * on the FIRST day they performed it, so the cumulative count is a
    * running sum over per-(type, day) first-seen counts. The data-scale
    * work is the per-(user, type) min-day aggregation (partial-
    * aggregable); the running sum's window partitions by event type and
    * covers one row per calendar day — bounded by time, not data volume.
    */
  def cumeNewUsers(s: SparkSession, d: String): DataFrame = {
    val firstSeen = Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(min(to_date(col("ts"))).as("day"))
    firstSeen.groupBy("event_type", "day").agg(count(lit(1)).as("n_new"))
      .withColumn("cume_users",
        sum("n_new").over(Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("event_type", "day")
  }

  val cumeNewUsersSql: String =
    """WITH fs AS (SELECT user_id, event_type,
      |              min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day
      |            FROM events GROUP BY user_id, event_type),
      |pd AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_new
      |       FROM fs GROUP BY event_type, day)
      |SELECT event_type, day, n_new,
      |  CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cume_users
      |FROM pd ORDER BY event_type, day""".stripMargin

  /** Exponentially time-decayed customer value (half-life = 7 days) —
    * the recency-weighted score behind "active customer" rankings,
    * computed EXACTLY: with dyadic weights `2^(-age/7)` quantized to
    * whole half-life steps, every term `cents · 2^(kmax−k)` is an exact
    * long, the per-customer sum is exact, and the presented score divides
    * once by `2^kmax` — a power-of-two scaling that only shifts the
    * float exponent, so the double is bit-identical on any engine. At a
    * 100 TB order history the integer sum needs DECIMAL(38,0) headroom;
    * the shape (one partial-aggregable group-by) is unchanged.
    */
  def decayScore(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      to_date(col("o_orderdate")).as("day"))
    val ref = o.agg(max("day").as("ref_day"))
    val kmax = 8 // ages cap at 8 half-lives: older orders keep the 2^-8 floor weight
    o.crossJoin(broadcast(ref))
      .withColumn("k",
        least(floor(datediff(col("ref_day"), col("day")) / 7).cast("long"), lit(kmax.toLong)))
      .withColumn("wcents",
        col("cents") * expr(s"shiftleft(cast(1 as bigint), cast($kmax - k as int))"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum("wcents").as("decay_num"))
      .withColumn("decay_cents", col("decay_num").cast("double") / lit((1L << kmax).toDouble))
      .orderBy("o_custkey")
  }

  val decayScoreSql: String =
    """WITH o AS (SELECT o_custkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(o_orderdate AS DATE) AS day
      |  FROM orders),
      |r AS (SELECT max(day) AS ref_day FROM o),
      |w AS (SELECT o_custkey, cents,
      |    least(CAST(floor(date_diff('day', day, ref_day) / 7) AS BIGINT), 8) AS k
      |  FROM o CROSS JOIN r)
      |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(8 - k AS INTEGER))) AS BIGINT) AS decay_num,
      |  CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(8 - k AS INTEGER))) AS DOUBLE) / 256.0
      |    AS decay_cents
      |FROM w GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  val slidingDistinctSql: String =
    """WITH p AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
      |           FROM events),
      |w AS (SELECT d.wend, count(DISTINCT p.user_id) AS active_7d
      |      FROM (SELECT DISTINCT day AS wend FROM p) d
      |      JOIN p ON p.day BETWEEN d.wend - 6 AND d.wend
      |      GROUP BY d.wend),
      |o AS (SELECT day AS wend, CAST(count(*) AS BIGINT) AS active_1d FROM p GROUP BY day)
      |SELECT o.wend, active_1d, CAST(active_7d AS BIGINT) AS active_7d
      |FROM o JOIN w USING (wend) ORDER BY wend""".stripMargin

  /** DAU/MAU stickiness per calendar month — the product-analytics pulse
    * metric: how much of the monthly audience shows up on an average day.
    * `stickiness = Σ_day DAU / (n_days · MAU)` — exact integer counts up
    * to one final double divide + round(6).
    *
    * Scale shape: two partial-aggregable distinct passes ((month, day,
    * user) and (month, user) — both shuffle once on their keys, outputs
    * are day- and user-NDV sized), then month-count-sized arithmetic.
    */
  def stickiness(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d).select(
      date_format(col("ts").cast("date"), "yyyy-MM").as("month"),
      col("ts").cast("date").as("day"), col("user_id"))
    val byMonth = ev.select("month", "day", "user_id").distinct()
      .groupBy("month", "day").agg(count(lit(1)).as("dau"))
      .groupBy("month").agg(count(lit(1)).as("n_days"), sum("dau").as("sum_dau"))
    val mau = ev.select("month", "user_id").distinct()
      .groupBy("month").agg(count(lit(1)).as("mau"))
    byMonth.join(mau, Seq("month"))
      .select(col("month"), col("n_days"), col("mau"), col("sum_dau"),
        graft.functions.NumOps.roundz(
          col("sum_dau").cast("double") / (col("n_days") * col("mau")), 6)
          .as("stickiness"))
      .orderBy("month")
  }
  val stickinessSql: String =
    """WITH ev AS (SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m') AS month,
      |              CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
      |            FROM events),
      |dau AS (SELECT month, day, CAST(count(*) AS BIGINT) AS dau
      |        FROM (SELECT DISTINCT month, day, user_id FROM ev) GROUP BY month, day),
      |bm AS (SELECT month, CAST(count(*) AS BIGINT) AS n_days,
      |         CAST(sum(dau) AS BIGINT) AS sum_dau FROM dau GROUP BY month),
      |mau AS (SELECT month, CAST(count(*) AS BIGINT) AS mau
      |        FROM (SELECT DISTINCT month, user_id FROM ev) GROUP BY month)
      |SELECT bm.month, bm.n_days, mau.mau, bm.sum_dau,
      |  round(CAST(bm.sum_dau AS DOUBLE) / (bm.n_days * mau.mau), 6) + 0.0 AS stickiness
      |FROM bm JOIN mau USING (month) ORDER BY bm.month""".stripMargin
}
