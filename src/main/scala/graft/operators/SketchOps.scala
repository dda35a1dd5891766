package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Mergeable-sketch state tables — the incremental-materialization pattern
  * for COUNT DISTINCT at warehouse scale: per-period Datasketches HLL
  * partials (`hll_sketch_agg`, a few KB each) are stored once per ingest
  * period, and any rollup window (cumulative, trailing-N, all-time) is
  * answered by `hll_union_agg` over the RELEVANT PARTIALS ONLY — no rescan
  * of the fact table, which is the entire point at 100 TB: the nightly
  * "distinct users to date" query reads N sketch rows, not N months of raw
  * events. HLL union is register-wise max, so merging partials is lossless
  * versus sketching the concatenated input (pinned exactly by the spec).
  *
  * Oracle strategy (sketch estimates are engine-specific, same contract as
  * `x_approx_sketches`): the query emits the EXACT cumulative distinct —
  * computed independently via first-appearance running sums — plus an
  * in-query boolean that the merged-sketch estimate sits inside the
  * documented ±5% envelope (default lgK=12 ⇒ rsd ≈ 1.6%, 3σ < 5%). DuckDB
  * replays the exact column and expects TRUE: an estimate drifting out of
  * envelope hash-mismatches the gate.
  */
object SketchOps {

  /** Months-since-epoch granularity partials over `orders.o_custkey`. */
  def monthlySketches(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("m"),
        col("o_custkey"))
      .groupBy("m").agg(hll_sketch_agg(col("o_custkey")).as("sk"))

  /** Cumulative distinct customers by month: merged-sketch estimate beside
    * the exact first-appearance running sum. The triangular sketch join and
    * the running-sum window both run over one row per MONTH — bounded by
    * calendar span, never by fact-table size (documented single-partition
    * window over ≤ a few hundred rows).
    */
  def hllIncremental(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("m"),
        col("o_custkey"))
    val parts = monthlySketches(s, d)
    val cum = parts.as("a").join(parts.as("b"), col("b.m") <= col("a.m"))
      .groupBy(col("a.m").as("m"))
      .agg(hll_sketch_estimate(hll_union_agg(col("b.sk"))).as("est"))
    val firstM = o.groupBy("o_custkey").agg(min("m").as("fm"))
      .groupBy("fm").agg(count(lit(1)).as("new_cust"))
    val w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.select("m")
      .join(firstM, col("m") === col("fm"), "left")
      .select(col("m"), coalesce(col("new_cust"), lit(0L)).as("nc"))
      .withColumn("cum_exact", sum("nc").over(w))
      .join(cum, "m")
      .select(col("m").as("month"), col("cum_exact"),
        (abs(col("est") - col("cum_exact")).cast("double") / col("cum_exact") <= 0.05)
          .as("est_ok"))
      .orderBy("month")
  }

  val hllIncrementalSql: String =
    """WITH o AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
      |                  o_custkey FROM orders),
      |fm AS (SELECT o_custkey, min(m) AS fm FROM o GROUP BY 1),
      |nc AS (SELECT fm, count(*) AS nc FROM fm GROUP BY 1),
      |ms AS (SELECT DISTINCT m FROM o)
      |SELECT m AS month,
      |  CAST(sum(COALESCE(nc.nc, 0)) OVER (ORDER BY m
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_exact,
      |  TRUE AS est_ok
      |FROM ms LEFT JOIN nc ON ms.m = nc.fm ORDER BY month""".stripMargin

  // ---------------------------------------------------------------------
  // KMV (k-minimum-values) sketches — distinct-count SET ALGEBRA
  // ---------------------------------------------------------------------

  /** Sketch size. 64 keeps the demo readable; production dials k up for
    * ~1/√k relative error (Beyer et al., SIGMOD 2007 — public).
    */
  val KmvK = 64

  /** Hash domain size 16¹⁵ = 2⁶⁰ as an EXACT double (6-bit mantissa). */
  private val KmvDomain = 1.152921504606846976e18

  /** The cross-engine hash: the FIRST 15 hex chars of md5 (the digest's
    * high 60 bits), which both Spark (`conv(hex, 16, 10)`) and DuckDB
    * (`('0x' || hex)::BIGINT`) parse into the same bigint. 60 bits keeps
    * the value positive in a long; any KMV-compatible operator must take
    * the SAME substring or its sketches won't merge with these.
    */
  private def kmvHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** The KMV estimator: exact count when the sketch holds the whole set
    * (n < k), else `(k−1)·D / h_k` — one IEEE division of exactly-
    * representable doubles, replayed verbatim by the oracle.
    */
  private def kmvEstimate(n: Column, hk: Column): Column =
    when(n < KmvK, n.cast("double"))
      .otherwise(lit((KmvK - 1).toDouble) * lit(KmvDomain) / hk.cast("double"))

  /** Distinct-count set algebra from KMV sketches, beside exact truth —
    * what HLL (`hllIncremental`) cannot do: HLL unions losslessly but has
    * no direct INTERSECTION; a KMV sketch supports both, because the k
    * smallest hashes of A ∪ B are computable from K(A) ∪ K(B), and the
    * fraction ρ of that union sketch present in BOTH input sketches is an
    * unbiased Jaccard estimate (Beyer et al., SIGMOD 2007), giving
    * `|A ∩ B| ≈ ρ · D̂(A ∪ B)`.
    *
    * Sets: customers with 'F'-status orders vs customers with 'O'-status
    * orders. The full estimator pipeline is deterministic — md5 hashes,
    * integer rank cuts, and two IEEE divisions in a fixed order — so the
    * DuckDB oracle replays the ESTIMATES bit-for-bit, not just the exact
    * columns beside them.
    *
    * 100 TB shape: the distinct (set, hash) projection is a partial-
    * aggregable dedup; the k smallest per set run through the native
    * bounded-heap grouped top-k ([[graft.plans.TopKPerGroupExec]] — O(k)
    * state per task, merged at the exchange), so no NDV-sized sort or
    * single-partition window exists anywhere. Everything after the top-k
    * touches ≤ 2k rows. Like the HLL partials, KMV sketches are mergeable
    * state: store one per ingest period and answer union/intersection
    * questions across any period span without rescanning facts (pinned by
    * the merge-associativity spec).
    */
  def kmvSetOps(s: SparkSession, d: String): DataFrame = {
    graft.catalyst.GraftExtensions.register(s)
    val base = Tables.orders(s, d).filter(col("o_orderstatus").isin("F", "O"))
      .select(col("o_orderstatus").as("st"), col("o_custkey"))
    val hashed = base.select(col("st"), kmvHash(col("o_custkey")).as("h")).distinct()
    // ≤ 2k rows from here on; checkpointed because it feeds 4 consumers
    val sk = graft.plans.NativeTopK.perGroup(hashed, Seq("st"), Seq("h" -> true), KmvK)
      .localCheckpoint(true)
    val stats = sk.groupBy("st").agg(count(lit(1)).as("n"), max("h").as("hk"))
      .withColumn("est", kmvEstimate(col("n"), col("hk")))
    val u = sk.select("h").distinct().orderBy("h").limit(KmvK).localCheckpoint(true)
    val uStats = u.agg(count(lit(1)).as("nu"), max("h").as("hku"))
      .withColumn("est_union", kmvEstimate(col("nu"), col("hku")))
      .select("nu", "est_union")
    val rho = u
      .join(sk.filter(col("st") === "F").select(col("h").as("ha")),
        col("h") === col("ha"), "left_semi")
      .join(sk.filter(col("st") === "O").select(col("h").as("hb")),
        col("h") === col("hb"), "left_semi")
      .agg(count(lit(1)).as("rho"))
    val flags = base.groupBy("o_custkey").agg(
      max(when(col("st") === "F", 1L).otherwise(0L)).as("fa"),
      max(when(col("st") === "O", 1L).otherwise(0L)).as("fb"))
    val exact = flags.agg(
      sum("fa").as("exact_a"), sum("fb").as("exact_b"),
      count(lit(1)).as("exact_union"), sum(col("fa") * col("fb")).as("exact_int"))
    stats.filter(col("st") === "F").select(col("n").as("n_a"), col("est").as("est_a"))
      .crossJoin(stats.filter(col("st") === "O")
        .select(col("n").as("n_b"), col("est").as("est_b")))
      .crossJoin(uStats).crossJoin(rho).crossJoin(exact)
      .withColumn("est_int",
        col("rho").cast("double") / col("nu").cast("double") * col("est_union"))
      .select("n_a", "n_b", "nu", "rho",
        "est_a", "est_b", "est_union", "est_int",
        "exact_a", "exact_b", "exact_union", "exact_int")
  }

  val kmvSetOpsSql: String = {
    val k = KmvK
    val dom = "1152921504606846976.0" // 16^15 as an exact double literal
    val est = (n: String, hk: String) =>
      s"CASE WHEN $n < $k THEN CAST($n AS DOUBLE) ELSE ${k - 1}.0 * $dom / CAST($hk AS DOUBLE) END"
    s"""WITH hashed AS (
       |  SELECT DISTINCT o_orderstatus AS st,
       |    ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
       |ranked AS (SELECT st, h, row_number() OVER (PARTITION BY st ORDER BY h) AS rn
       |           FROM hashed),
       |sk AS (SELECT st, h FROM ranked WHERE rn <= $k),
       |stats AS (SELECT st, CAST(count(*) AS BIGINT) AS n, max(h) AS hk
       |          FROM sk GROUP BY 1),
       |u AS (SELECT h FROM (SELECT DISTINCT h FROM sk) ORDER BY h LIMIT $k),
       |ustats AS (SELECT CAST(count(*) AS BIGINT) AS nu, max(h) AS hku FROM u),
       |rho AS (SELECT CAST(count(*) AS BIGINT) AS rho FROM u
       |        WHERE h IN (SELECT h FROM sk WHERE st = 'F')
       |          AND h IN (SELECT h FROM sk WHERE st = 'O')),
       |flags AS (SELECT o_custkey,
       |    max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS fa,
       |    max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS fb
       |  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1),
       |exact AS (SELECT CAST(sum(fa) AS BIGINT) AS exact_a,
       |    CAST(sum(fb) AS BIGINT) AS exact_b,
       |    CAST(count(*) AS BIGINT) AS exact_union,
       |    CAST(sum(fa * fb) AS BIGINT) AS exact_int FROM flags)
       |SELECT a.n AS n_a, b.n AS n_b, nu, rho,
       |  ${est("a.n", "a.hk")} AS est_a,
       |  ${est("b.n", "b.hk")} AS est_b,
       |  ${est("nu", "hku")} AS est_union,
       |  CAST(rho AS DOUBLE) / CAST(nu AS DOUBLE) * ${est("nu", "hku")} AS est_int,
       |  exact_a, exact_b, exact_union, exact_int
       |FROM stats a, stats b, ustats, rho, exact
       |WHERE a.st = 'F' AND b.st = 'O'""".stripMargin
  }

  /** Week-over-week returning users from STORED per-week KMV sketches —
    * the sketch-reuse payoff [[kmvSetOps]] sets up: once each ingest
    * period persists its 64-value sketch (like the HLL partials of
    * [[monthlySketches]]), any period-pair overlap question — "how many
    * of week N's users came back in week N+1?" — is answered from 128
    * stored values per pair, no fact rescan, and crucially KMV supports
    * the INTERSECTION estimate HLL partials cannot. Estimates ride
    * beside exact truth computed independently; both are deterministic,
    * so the oracle replays both.
    *
    * Scale: the per-week sketches come off one partial-aggregable dedup +
    * native bounded-heap top-k; everything after is sketch-count-sized
    * (the ranking window partitions by week pair over ≤ 2k rows each).
    */
  def kmvRetention(s: SparkSession, d: String): DataFrame = {
    graft.catalyst.GraftExtensions.register(s)
    val ev = Tables.events(s, d)
      .select(date_trunc("week", col("ts")).cast("date").as("w"), col("user_id"))
    val hashed = ev.select(col("w"), kmvHash(col("user_id")).as("h")).distinct()
    val sk = graft.plans.NativeTopK.perGroup(hashed, Seq("w"), Seq("h" -> true), KmvK)
      .localCheckpoint(true)
    val stats = sk.groupBy("w").agg(count(lit(1)).as("n"), max("h").as("hk"))
      .withColumn("est", kmvEstimate(col("n"), col("hk")))
    val pairs = stats.select(col("w"), col("n").as("n_prev"), col("est").as("est_prev"))
      .join(stats.select(date_sub(col("w"), 7).as("w"), col("n").as("n_next"),
        col("est").as("est_next")), Seq("w"))
    // per-pair union sketch: both weeks' values, ranked, cut at k — the
    // window runs over ≤ 2k sketch rows per pair, never data rows
    val cand = sk.select(col("w"), col("h"))
      .join(pairs.select("w"), Seq("w"), "left_semi")
      .unionByName(sk.select(date_sub(col("w"), 7).as("w"), col("h"))
        .join(pairs.select("w"), Seq("w"), "left_semi"))
      .distinct()
    val byPair = org.apache.spark.sql.expressions.Window.partitionBy("w").orderBy("h")
    val u = cand.withColumn("rn", row_number().over(byPair)).filter(col("rn") <= KmvK)
    val uStats = u.groupBy("w").agg(count(lit(1)).as("nu"), max("h").as("hku"))
      .withColumn("est_union", kmvEstimate(col("nu"), col("hku")))
    val inBoth = u
      .join(sk.select(col("w"), col("h")), Seq("w", "h"), "left_semi")
      .join(sk.select(date_sub(col("w"), 7).as("w"), col("h")), Seq("w", "h"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("rho"))
    val exact = ev.distinct()
      .join(ev.distinct().select(date_sub(col("w"), 7).as("w"), col("user_id")),
        Seq("w", "user_id"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("exact_returning"))
    pairs.join(uStats, Seq("w")).join(inBoth, Seq("w"), "left")
      .join(exact, Seq("w"), "left")
      .select(col("w").as("week"),
        col("n_prev"), col("n_next"), col("nu"),
        coalesce(col("rho"), lit(0L)).as("rho"),
        col("est_prev"), col("est_next"), col("est_union"),
        (coalesce(col("rho"), lit(0L)).cast("double") / col("nu").cast("double") *
          col("est_union")).as("est_returning"),
        coalesce(col("exact_returning"), lit(0L)).as("exact_returning"))
      .orderBy("week")
  }

  val kmvRetentionSql: String = {
    val k = KmvK
    val dom = "1152921504606846976.0"
    val est = (n: String, hk: String) =>
      s"CASE WHEN $n < $k THEN CAST($n AS DOUBLE) ELSE ${k - 1}.0 * $dom / CAST($hk AS DOUBLE) END"
    s"""WITH ev AS (SELECT DISTINCT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS w,
       |    user_id FROM events),
       |hashed AS (SELECT DISTINCT w,
       |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM ev),
       |ranked AS (SELECT w, h, row_number() OVER (PARTITION BY w ORDER BY h) AS rn
       |           FROM hashed),
       |sk AS (SELECT w, h FROM ranked WHERE rn <= $k),
       |stats AS (SELECT w, CAST(count(*) AS BIGINT) AS n, max(h) AS hk FROM sk GROUP BY 1),
       |pairs AS (SELECT p.w, p.n AS n_prev, p.hk AS hk_prev, q.n AS n_next, q.hk AS hk_next
       |          FROM stats p JOIN stats q ON q.w = p.w + 7),
       |cand AS (SELECT DISTINCT p.w, s.h
       |         FROM pairs p JOIN sk s ON s.w = p.w OR s.w = p.w + 7),
       |ur AS (SELECT w, h, row_number() OVER (PARTITION BY w ORDER BY h) AS rn FROM cand),
       |u AS (SELECT w, h FROM ur WHERE rn <= $k),
       |ustats AS (SELECT w, CAST(count(*) AS BIGINT) AS nu, max(h) AS hku FROM u GROUP BY 1),
       |rho AS (SELECT u.w, CAST(count(*) AS BIGINT) AS rho FROM u
       |        WHERE EXISTS (SELECT 1 FROM sk WHERE sk.w = u.w AND sk.h = u.h)
       |          AND EXISTS (SELECT 1 FROM sk
       |                      WHERE sk.w = u.w + 7 AND sk.h = u.h)
       |        GROUP BY 1),
       |exact AS (SELECT a.w, CAST(count(*) AS BIGINT) AS exact_returning
       |          FROM ev a JOIN ev b ON b.user_id = a.user_id
       |            AND b.w = a.w + 7
       |          GROUP BY 1)
       |SELECT p.w AS week, n_prev, n_next, nu, COALESCE(rho.rho, 0) AS rho,
       |  ${est("n_prev", "hk_prev")} AS est_prev,
       |  ${est("n_next", "hk_next")} AS est_next,
       |  ${est("nu", "hku")} AS est_union,
       |  CAST(COALESCE(rho.rho, 0) AS DOUBLE) / CAST(nu AS DOUBLE) *
       |    ${est("nu", "hku")} AS est_returning,
       |  COALESCE(exact.exact_returning, 0) AS exact_returning
       |FROM pairs p JOIN ustats ON ustats.w = p.w
       |LEFT JOIN rho ON rho.w = p.w
       |LEFT JOIN exact ON exact.w = p.w
       |ORDER BY week""".stripMargin
  }
}
