package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Prefix-filtered similarity join: exactness vs the unfiltered posting-list
  * ground truth, the measured candidate reduction, and the integer
  * prefix-length arithmetic.
  */
class PrefixFilterSpec extends SparkSpec {

  test("prefix-filtered join == unfiltered ground truth at sf0.001") {
    val got = DedupOps.prefixFilterPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // ground truth: full posting-list join, no prefix, no stop cap
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), graft.catalyst.HashFunctions.shingle_hashes3(col("t")).as("sh"))
      .withColumn("n", size(col("sh")).cast("long"))
    val ex = docs.select(col("doc_id"), col("n"), explode(col("sh")).as("sk"))
    val want = ex.as("a").join(ex.as("b"),
        col("a.sk") === col("b.sk") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("common"), first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .filter(col("common") * DedupOps.PfDen >=
        (col("na") + col("nb") - col("common")) * DedupOps.PfNum)
      .select(col("a_id"), col("b_id"),
        round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 4))
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(want.nonEmpty, "threshold must produce pairs at test scale")
    assert(got == want)
  }

  test("prefix index prunes candidates strictly vs plain posting lists") {
    val (plain, pruned) = DedupOps.prefixCandidateCounts(spark, sf0001)
    assert(pruned < plain, s"expected pruning, got plain=$plain pruned=$pruned")
    // and the final answer (verified above) is built from the pruned set
  }

  test("integer prefix length matches exact rational ceiling for n in 1..200") {
    for (n <- 1 to 200) {
      val exactCeil = BigInt(DedupOps.PfNum * n + DedupOps.PfDen - 1) / BigInt(DedupOps.PfDen)
      val viaSql = (DedupOps.PfNum * n + (DedupOps.PfDen - 1)) / DedupOps.PfDen
      assert(BigInt(viaSql) == exactCeil)
      val p = n - viaSql + 1
      assert(p >= 1 && p <= n)
    }
  }
}
