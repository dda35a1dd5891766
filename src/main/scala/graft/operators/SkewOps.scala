package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives (SURVEY "Optimize for scale": skewed keys →
  * salting or AQE skew-join). AQE's skew-join split handles sort-merge joins
  * automatically; these helpers cover the cases AQE cannot — a skewed
  * shuffle key feeding a non-splittable operator (collect_list/window) or a
  * hash join against a side too big to broadcast but small enough to
  * replicate `saltBuckets` times.
  */
object SkewOps {

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
