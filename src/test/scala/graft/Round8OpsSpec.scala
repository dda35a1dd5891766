package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.operators.JoinOps

/** Round-8 quantitative assertions: the Bloom-pruned semi-join's win is
  * measured in SQL metrics (exchange row counts), not inferred from plan
  * shape.
  */
class Round8OpsSpec extends SparkSpec {

  /** Run with AQE off (so executed plans are directly traversable — AQE
    * wraps materialized stages in leaf QueryStageExec nodes) and broadcast
    * joins off (so the semi-join actually shuffles its probe side, as it
    * would at 100 TB where neither side broadcasts).
    */
  private def withShuffledJoins[T](body: => T): T = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  private def probeShuffleRecords(df: DataFrame): (Long, Long) = {
    val rows = df.collect().length.toLong
    // the probe-side exchange is the one whose subtree scans lineitem
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec if e.toString.contains("lineitem") =>
        e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
    }
    assert(exchanges.nonEmpty, df.queryExecution.executedPlan.toString)
    (rows, exchanges.max)
  }

  test("bloom prune is quantitative: probe-side shuffle records collapse to ~matching") {
    withShuffledJoins {
      val li = Tables.load(spark, sf0001, "lineitem")
      val urgent = Tables.load(spark, sf0001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val fpp = 0.01
      val big = li.count()

      val pruned = JoinOps.bloomPrunedSemiJoin(li, "l_orderkey", urgent, "o_orderkey",
        fpp = fpp)
      val (matching, prunedShuffled) = probeShuffleRecords(pruned)
      val plain = li.join(urgent.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_semi")
      val (plainRows, plainShuffled) = probeShuffleRecords(plain)

      // identical results; the plain probe shuffles the WHOLE big side
      assert(matching == plainRows)
      assert(plainShuffled == big)
      // the pruned probe shuffles only matching rows + the Bloom filter's
      // false positives — bounded by 3x the configured fpp over |big|
      assert(prunedShuffled >= matching)
      assert(prunedShuffled <= matching + (3 * fpp * big).toLong + 1,
        s"pruned=$prunedShuffled matching=$matching big=$big")
      // and the headline: materially less shuffle volume than the plain join
      assert(prunedShuffled < big / 2,
        s"pruned=$prunedShuffled should be well under big=$big")

      // the pre-shuffle Filter carrying might_contain reports the same count
      // (the prune happens map-side, BEFORE the exchange)
      val filterOut = pruned.queryExecution.executedPlan.collect {
        case f: FilterExec if f.condition.toString.contains("might_contain") =>
          f.metrics("numOutputRows").value
      }
      assert(filterOut.nonEmpty)
      assert(filterOut.head == prunedShuffled,
        s"filter=${filterOut.head} shuffled=$prunedShuffled")
    }
  }

  test("bloom-pruned semi-join on a STRING key matches the plain semi-join") {
    // round 8's cast("long") silently emptied non-numeric keys; the
    // xxhash64 build must instead prune correctly for any key type
    withShuffledJoins {
      val li = Tables.load(spark, sf0001, "lineitem")
      // deterministic pick: limit without orderBy re-executes per consumer
      // and may select a DIFFERENT flag pair for the bloom build vs the
      // joins, making the comparison incoherent (and flaky)
      val flags = li.select(col("l_returnflag")).distinct()
        .orderBy("l_returnflag").limit(2).localCheckpoint(true)
      val pruned = JoinOps.bloomPrunedSemiJoin(li, "l_returnflag", flags, "l_returnflag")
      val plain = li.join(flags, Seq("l_returnflag"), "left_semi")
      val n = pruned.count()
      assert(n > 0, "string-key bloom semi-join must not be silently empty")
      assert(n == plain.count())
    }
  }

  test("bloom-pruned semi-join widens mixed integral keys; rejects other cross-type pairs") {
    withShuffledJoins {
      val li = Tables.load(spark, sf0001, "lineitem")
      // INT build side against the BIGINT probe side: xxhash64 would hash
      // the same value differently per type (a silent prune-everything false
      // negative); the operator must widen both to long
      val keysInt = li.select(col("l_orderkey").cast("int").as("l_orderkey"))
        .distinct().orderBy("l_orderkey").limit(50).localCheckpoint(true)
      val pruned = JoinOps.bloomPrunedSemiJoin(li, "l_orderkey", keysInt, "l_orderkey")
      val plain = li.join(keysInt.select(col("l_orderkey").cast("bigint")),
        Seq("l_orderkey"), "left_semi")
      val n = pruned.count()
      assert(n > 0, "mixed integral keys must not be silently empty")
      assert(n == plain.count())
      // string vs long has no lossless common hash domain -> loud failure
      val err = intercept[IllegalArgumentException] {
        JoinOps.bloomPrunedSemiJoin(li, "l_orderkey",
          li.select(col("l_returnflag")), "l_returnflag")
      }
      assert(err.getMessage.contains("key types must match"))
    }
  }

  test("count_between: closed interval, null element/array handling, SQL path, type check") {
    import spark.implicits._
    graft.catalyst.GraftExtensions.register(spark)
    import graft.catalyst.HashFunctions.count_between
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0), Some(3.0), None, Some(2.0))),
      (2L, Seq.empty[Option[Double]])
    ).toDF("id", "vals")
    val got = df.select(col("id"),
      count_between(col("vals"), lit(2.0), lit(3.0)).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 0L)) // inclusive bounds, nulls skipped
    // inverted bounds: empty interval, not an error
    assert(df.filter(col("id") === 1)
      .select(count_between(col("vals"), lit(3.0), lit(2.0))).head().getLong(0) == 0L)
    // null array/bounds propagate
    val row = Seq((Option.empty[Seq[Double]], Option.empty[Double]))
      .toDF("vals", "lo")
      .select(count_between(col("vals"), lit(0.0), lit(1.0)),
        count_between(array(lit(1.0)), col("lo"), lit(1.0))).head()
    assert(row.isNullAt(0) && row.isNullAt(1))
    // SQL-reachable
    df.createOrReplaceTempView("cb_t")
    assert(spark.sql("SELECT count_between(vals, 2.0D, 3.0D) FROM cb_t WHERE id = 1")
      .head().getLong(0) == 3L)
    // wrong input type is an analysis error naming the function
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("x").select(count_between(col("x"), lit(0.0), lit(1.0))).collect()
    }
    assert(e.getMessage.contains("count_between"), e.getMessage)
  }
}
