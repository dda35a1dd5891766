package graft

import org.apache.spark.sql.functions._
import graft.functions.CustomAggregators

/** The user-extensible function surface: scalar udf registration (DataFrame
  * + SQL), typed Aggregator on Datasets, and Aggregator-as-SQL-UDAF.
  */
class UdfSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("scalar udf: register once, use from DataFrame API and SQL text") {
    val parseTicker = udf((name: String) => name.split("_").head)
    spark.udf.register("parse_ticker", parseTicker)
    val df = Seq("AVA-USDT_PST_2024-03-14", "BTC-USDT_PST_2024-03-15").toDF("filename")
    df.createOrReplaceTempView("files")
    val viaDf = df.select(parseTicker(col("filename")).as("t")).as[String].collect().toSet
    val viaSql = spark.sql("SELECT parse_ticker(filename) AS t FROM files")
      .as[String].collect().toSet
    assert(viaDf == Set("AVA-USDT", "BTC-USDT"))
    assert(viaSql == viaDf)
  }

  test("typed Aggregator: VWAP on a Dataset matches the expression form") {
    val ticks = Seq((10.0, 2.0), (20.0, 1.0), (30.0, 1.0)).toDS()
    val got = ticks.select(CustomAggregators.Vwap.toColumn).head()
    assert(math.abs(got - 70.0 / 4.0) < 1e-12)
    // empty input → NaN, not a crash
    assert(Seq.empty[(Double, Double)].toDS()
      .select(CustomAggregators.Vwap.toColumn).head().isNaN)
  }

  test("Aggregator registered as SQL UDAF with grouping") {
    spark.udf.register("vwap", udaf(CustomAggregators.Vwap))
    Seq(("A", 10.0, 2.0), ("A", 20.0, 2.0), ("B", 5.0, 1.0))
      .toDF("k", "px", "sz").createOrReplaceTempView("ticks")
    val got = spark.sql(
      "SELECT k, vwap(px, sz) AS v FROM ticks GROUP BY k ORDER BY k")
      .as[(String, Double)].collect().toMap
    assert(got("A") == 15.0 && got("B") == 5.0)
  }

  test("holistic Aggregator: max gap between observations") {
    val gaps = Seq(0L, 10L, 100L, 130L).toDS()
      .select(CustomAggregators.MaxGapSeconds.toColumn).head()
    assert(gaps == 90L)
  }
}
