package graft

import org.apache.spark.sql.functions._
import graft.operators.FrequencyOps

/** Exact heavy hitters (FrequencyOps): the Misra-Gries superset guarantee on
  * a skewed stream where eviction actually fires, the distributed union
  * guarantee across partitions, and end-to-end equality with a plain
  * full-vocabulary GROUP BY on the real corpus.
  */
class FrequencyOpsSpec extends SparkSpec {

  /** Zipf-ish stream: item i (1..2000) appears ceil(4000/i) times. Distinct
    * count (2000) is far above the counter budget, so eviction rounds run.
    */
  private def zipfStream: Seq[String] =
    (1 to 2000).flatMap(i => Seq.fill((4000 + i - 1) / i)(s"item$i"))

  test("single-pass MG: bounded counters, superset of items above n/(k+1)") {
    val k = 31
    val data = zipfStream
    val n = data.size
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cands = FrequencyOps.misraGries(k)(data.iterator).toSet
    assert(cands.size <= k)
    assert(cands.size < exact.size, "eviction must actually fire")
    val mustCatch = exact.collect { case (it, c) if c * (k + 1) > n => it }
    assert(mustCatch.nonEmpty)
    mustCatch.foreach(it => assert(cands.contains(it), s"MG lost heavy item $it"))
  }

  test("distributed MG union: per-partition candidates cover global heavy items") {
    import spark.implicits._
    val k = 31
    // adversarial placement: shuffle deterministically so heavy items spread
    // across partitions instead of clustering
    val data = new scala.util.Random(7).shuffle(zipfStream)
    val n = data.size
    val ds = spark.createDataset(data).repartition(8)
    val cands = ds.mapPartitions(FrequencyOps.misraGries(k)).distinct().collect().toSet
    assert(cands.size <= k * 8)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.collect { case (it, c) if c * (k + 1) > n => it }
      .foreach(it => assert(cands.contains(it), s"union lost global heavy item $it"))
  }

  test("heavyHitters == exact full-vocab GROUP BY at sf0.001") {
    val got = FrequencyOps.heavyHitters(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val bg = FrequencyOps.bigrams(spark, sf0001).localCheckpoint(true)
    val n = bg.count()
    val want = bg.groupBy("b").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * FrequencyOps.ThresholdDen >= n)
      .orderBy("b")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(want.nonEmpty, "threshold must bite at test scale")
    assert(got == want)
  }
}
