package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewOps
import graft.pipeline.Instrumentation

/** Skew-mitigation and instrumentation operators (B17 + the salting scale
  * path).
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed dataset") {
    // 10k rows, 90% on one hot key
    val big = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = SkewOps.saltedJoin(big, small, "k", saltBuckets = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedCollectList preserves the multiset under a hot key") {
    val df = spark.range(5000)
      .select(lit("hot").as("k"), col("id").cast("string").as("v"))
      .union(spark.range(10).select(lit("cold").as("k"), col("id").cast("string").as("v")))
    val got = SkewOps.saltedCollectList(df, "k", "v", saltBuckets = 8)
      .select(col("k"), size(col("v_list")).as("n"))
      .as[(String, Int)].collect().toMap
    assert(got("hot") == 5000 && got("cold") == 10)
  }

  test("observe() metrics ride the job (B17)") {
    val ticks = Seq(
      ("AVA-USDT", 10.0), ("AVA-USDT", 20.0), ("BTC-USDT", 5.0)
    ).toDF("ticker", "size")
    val (instrumented, obs) = Instrumentation.observed(ticks)
    instrumented.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows") == 3L)
    assert(m("total_size") == 35.0)
  }

  test("timing listener captures action wall time") {
    val l = Instrumentation.withTimingListener(spark)
    try {
      Seq(1, 2, 3).toDF("x").write.format("noop").mode("overwrite").save()
      // listener callbacks are async; spin briefly
      val deadline = System.nanoTime() + 5e9.toLong
      while (l.snapshot.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(l.snapshot.nonEmpty)
      assert(l.snapshot.forall(_._2 > 0))
    } finally spark.listenerManager.unregister(l)
  }
}
