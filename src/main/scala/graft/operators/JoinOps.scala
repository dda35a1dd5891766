package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Join-side runtime pruning: the 100 TB join pattern where the probe side
  * is orders of magnitude larger than the build side. A Bloom filter built
  * from the build side's keys is broadcast as a literal and applied as a
  * map-side PRE-SHUFFLE filter on the probe side, so the exchange carries
  * only rows that can possibly match (plus the filter's false-positive
  * fraction). The exact join on top removes false positives — the result
  * is bit-identical to the plain join, only the shuffle volume changes.
  *
  * This is the manual, engine-level form of Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injection: explicit, usable
  * when the optimizer's heuristics decline (non-equi pre-filters, reused
  * filters across queries), and evaluated through the codegen'd
  * `BloomFilterMightContain` — not a UDF.
  */
object JoinOps {

  /** `might_contain(serializedBloom, value)` over the codegen'd Catalyst
    * predicate. `value` must be a LONG column; the filter bytes come from
    * [[org.apache.spark.util.sketch.BloomFilter#writeTo]].
    */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      GraftColumnBridge.expression(lit(bloomBytes)),
      GraftColumnBridge.expression(value)))

  /** Semi-join `big ⋉ small` on a key of ANY type, with the probe side
    * pre-pruned by a Bloom filter of the build side's keys. One extra pass
    * over the (small) build side to construct the filter; the probe side's
    * shuffle then carries ~selectivity·|big| rows instead of |big|.
    *
    * Both sides meet the filter through `xxhash64` (codegen'd, 64-bit), so
    * string/decimal/struct keys work identically to longs — round 8's
    * `cast("long")` turned a string key into null → zero insertions → a
    * silently EMPTY result, the worst failure mode a filter can have. Hash
    * collisions (~2⁻⁶⁴) are removed by the exact join on top along with
    * Bloom false positives, so the result stays bit-identical to the plain
    * semi-join for every key type.
    *
    * `xxhash64` is TYPE-sensitive (an INT 5 and a BIGINT 5 hash
    * differently), and a hash mismatch here is a false NEGATIVE the exact
    * join cannot repair — so integral keys are widened to long on both
    * sides before hashing (lossless), and any other cross-type pairing is
    * rejected loudly up front instead of silently pruning every row.
    */
  def bloomPrunedSemiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val (bigT, smallT) =
      (big.schema(bigKey).dataType, small.schema(smallKey).dataType)
    val (bigHashKey, smallHashKey) =
      if (integral(bigT) && integral(smallT))
        (col(bigKey).cast("long"), col(smallKey).cast("long"))
      else {
        require(bigT == smallT,
          s"bloomPrunedSemiJoin: key types must match exactly (got $bigT vs " +
            s"$smallT) — xxhash64 is type-sensitive, so mixed types would " +
            "hash-miss every matching row and silently return an empty result")
        (col(bigKey), col(smallKey))
      }
    // Build the filter with ONE pass over the build side via treeAggregate
    // (Spark's stat.bloomFilter NPEs on an empty input, and probing
    // emptiness first would add a whole extra scan to an operator whose
    // point is cutting I/O). An empty side yields a zero-insertion filter
    // whose mightContain is false for every key — the degenerate pre-filter
    // falls out with no special case, and genuine failures propagate.
    // Build-side nulls are excluded (they can never match a semi-join);
    // a probe-side null hashes to the xxhash64 seed and, if that value is
    // in the filter, is dropped by the exact join like any false positive.
    val bloomPre = {
      val bf = small.filter(col(smallKey).isNotNull)
        .select(xxhash64(smallHashKey))
        .rdd.treeAggregate(
          org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp))(
          (f, row) => { f.putLong(row.getLong(0)); f },
          (a, b) => { a.mergeInPlace(b); a })
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      mightContain(bos.toByteArray, xxhash64(bigHashKey))
    }
    big.filter(bloomPre)
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }

  /** Oracle-checked query: lineitems of early urgent orders, Bloom-pruned
    * before the semi-join shuffle, aggregated per return flag. The result
    * equals the plain semi-join (the oracle below) — the Bloom pass only
    * changes where rows are dropped.
    */
  def bloomSemiQuery(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.load(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_orderkey")
    bloomPrunedSemiJoin(Tables.load(s, d, "lineitem"), "l_orderkey",
        urgent, "o_orderkey")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      .orderBy("l_returnflag")
  }
  val bloomSemiSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey IN (
      |  SELECT o_orderkey FROM orders
      |  WHERE o_orderpriority = '1-URGENT'
      |    AND o_orderdate < TIMESTAMP '1996-01-01')
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
}
