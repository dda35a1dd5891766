package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchOps

/** HLL sketch-state mergeability: unioning stored monthly partials must be
  * LOSSLESS versus sketching the raw prefix directly (register-wise max),
  * the estimates must sit in the documented envelope against exact counts,
  * and the stored state must stay KB-sized.
  */
class SketchOpsSpec extends SparkSpec {

  test("union of monthly partials == direct sketch of the prefix, exactly") {
    val o = Tables.orders(spark, sf0001)
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("m"),
        col("o_custkey"))
      .localCheckpoint(true)
    val parts = SketchOps.monthlySketches(spark, sf0001).localCheckpoint(true)
    val months = parts.select("m").orderBy("m").collect().map(_.getDate(0))
    assert(months.length >= 12, "need a real month spread")
    // probe a handful of prefixes across the span
    for (cut <- Seq(months(2), months(months.length / 2), months.last)) {
      val merged = parts.filter(col("m") <= lit(cut))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).collect()(0).getLong(0)
      val direct = o.filter(col("m") <= lit(cut))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey")))).collect()(0).getLong(0)
      assert(merged == direct, s"merge lost information at cut=$cut")
    }
  }

  test("estimates inside the 5% envelope against exact counts (all months)") {
    val rows = SketchOps.hllIncremental(spark, sf0001).collect()
    assert(rows.length >= 12)
    assert(rows.forall(_.getBoolean(2)), "an estimate left the envelope")
    // cumulative exact counts must be non-decreasing and end at the global
    // distinct count
    val cums = rows.map(_.getLong(1))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    val globalDistinct = Tables.orders(spark, sf0001)
      .agg(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(cums.last == globalDistinct)
  }

  test("stored sketch state is KB-sized, not data-sized") {
    val sizes = SketchOps.monthlySketches(spark, sf0001)
      .select(length(col("sk")).as("b")).collect().map(_.getInt(0))
    assert(sizes.forall(_ <= 64 * 1024), s"sketch too big: ${sizes.max} bytes")
  }
}
