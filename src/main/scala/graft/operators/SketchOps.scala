package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
