package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew mitigation primitives (SURVEY "Optimize for scale": skewed keys →
  * salting or AQE skew-join). AQE's skew-join split handles sort-merge joins
  * automatically; these helpers cover the cases AQE cannot — a skewed
  * shuffle key feeding a non-splittable operator (collect_list/window) or a
  * hash join against a side too big to broadcast but small enough to
  * replicate `saltBuckets` times.
  */
object SkewOps {

  /** Key-distribution skew audit: exact Gini coefficient of rows-per-key,
    * the diagnostic that decides whether a join/agg needs the salted
    * operators below or AQE skew splitting. Computed WITHOUT a global
    * ranking window: keys sharing a row count occupy a contiguous rank run
    * in the sorted-by-count order, so `S = Σ i·x_i` folds per distinct
    * COUNT VALUE — `S_run = c · (m·R_prev + m(m+1)/2)` for a run of `m`
    * keys at count `c` — and the only window runs over the count-of-counts
    * table (size = number of DISTINCT frequencies, ≤ a few hundred at any
    * scale; the key table itself never leaves hash-agg land). Then
    * `G = (2S − (n+1)T) / (nT)` from exact longs, one deterministic IEEE
    * division at the end.
    */
  def giniSkew(s: SparkSession, d: String): DataFrame =
    giniOf(Tables.lineitem(s, d).select(col("l_partkey").as("k")), "l_partkey")
      .unionByName(
        giniOf(Tables.orders(s, d).select(col("o_custkey").as("k")), "o_custkey"))
      .orderBy("key_col")

  /** Gini of rows-per-key for any single-column key frame `k` — the
    * crafted-distribution spec entry point. */
  def giniOf(keyed: DataFrame, label: String): DataFrame = {
      val counts = keyed.groupBy("k").agg(count(lit(1)).as("x"))
      val cc = counts.groupBy("x").agg(count(lit(1)).as("m"))
      val byC = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
      cc
        .withColumn("r_prev", coalesce(sum(col("m")).over(byC), lit(0L)))
        .select(
          // integer div: Column./ on longs widens to DOUBLE and would turn
          // S into a rounded, partial-order-dependent float sum past 2^53
          (col("x") * (col("m") * col("r_prev") +
            expr("m * (m + 1) div 2"))).as("s_run"),
          col("m"), (col("x") * col("m")).as("t_run"))
        .agg(sum("s_run").as("s"), sum("m").as("n_keys"), sum("t_run").as("t"))
        .select(
          lit(label).as("key_col"), col("n_keys"), col("t").as("n_rows"),
          ((col("s") * 2 - (col("n_keys") + 1) * col("t")).cast("double") /
            (col("n_keys") * col("t")).cast("double")).as("gini"))
  }

  /** Oracle ranks keys directly (`row_number` — fine at oracle scale);
    * Σ i·x_i is tie-order independent, so the run-fold equals it exactly.
    */
  val giniSkewSql: String = {
    def one(table: String, key: String) =
      s"""SELECT '$key' AS key_col, CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(sum(x) AS BIGINT) AS n_rows,
         |  CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE) /
         |    CAST(count(*) * sum(x) AS DOUBLE) AS gini
         |FROM (SELECT x, row_number() OVER (ORDER BY x, k) AS i
         |      FROM (SELECT $key AS k, count(*) AS x FROM $table GROUP BY 1))""".stripMargin
    one("lineitem", "l_partkey") + "\nUNION ALL\n" +
      one("orders", "o_custkey") + "\nORDER BY key_col"
  }

  /** Two-phase salted aggregation for agg functions WITHOUT partial
    * (map-side) combine — e.g. collect_list under one hot key. Phase 1
    * spreads the hot key over `saltBuckets` reducers; phase 2 merges the
    * per-salt partials. For sums/counts Catalyst's partial agg already does
    * this — use this only for holistic aggregates.
    */
  def saltedCollectList(df: DataFrame, key: String, value: String,
      saltBuckets: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + hash(col(value)), lit(saltBuckets)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_list(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("_partial"))).as(s"${value}_list"))

  /** Salted two-phase DISTINCT collect: like [[saltedCollectList]] but the
    * result is the distinct value set, returned sorted so the output is
    * deterministic (and oracle-comparable) regardless of salt layout.
    */
  def saltedCollectSet(df: DataFrame, key: String, value: String,
      saltBuckets: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + hash(col(value)), lit(saltBuckets)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(array_sort(array_distinct(flatten(collect_list(col("_partial")))))
        .as(s"${value}_set"))

  /** Salted equi-join: the big (skewed) side gets a uniform salt in
    * [0, saltBuckets); the small side is replicated once per salt value;
    * the join key becomes (key, salt). Turns one hot reducer into
    * `saltBuckets` evenly-loaded ones at the cost of replicating the small
    * side — the classic remedy when the small side exceeds the broadcast
    * threshold but a single key dominates the big side.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(pmod(hash(col(key)) + spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets.toLong)) + saltBuckets, lit(saltBuckets.toLong)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
