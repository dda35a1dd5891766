package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Data-layout operators: z-order (Morton) interleaving of two bounded
  * dimensions into one sort key. Writing 100 TB clustered by z-key gives
  * every file a small HYPER-RECTANGLE of the (x, y) space, so parquet
  * min/max footer stats prune scans on EITHER dimension — the multi-column
  * generalization of partition-by-date, without exploding directory counts.
  * The interleave is the closed-form bit-spread (shift/mask magic; public
  * Morton-code folklore, same constants as every Delta/Hudi/graphics
  * implementation) — pure codegen'd integer ops, no UDF.
  */
object LayoutOps {

  /** Spread the low 16 bits of `v` so bit i lands at position 2i:
    * 0b1111 → 0b01010101. Input must be non-negative and < 2^16.
    */
  def spreadBits16(v: Column): Column = {
    val s1 = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key of two 16-bit dimensions: x on even bits, y on odd. */
  def zkey(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Layout demonstration over `events`: dimensions x = user_id mod 1024,
    * y = value in cents mod 1024 (exact via the DECIMAL(18,2) rounding both
    * engines share); rows are tiled into "files" of 1024 consecutive
    * z-cells (a 32×32 tile each). The per-file min/max of BOTH dimensions —
    * exactly what parquet footers would store — stay within the 32-wide
    * tile, which is the pruning guarantee the oracle pins.
    */
  def zorderLayout(s: SparkSession, d: String): DataFrame = {
    val x = col("user_id") % 1024
    val y = (col("value").cast(DecimalType(18, 2)) * 100).cast("long") % 1024
    Tables.events(s, d)
      .select(x.as("x"), y.as("y"))
      .withColumn("zkey", zkey(col("x"), col("y")))
      .withColumn("file_bucket", shiftrightunsigned(col("zkey"), 10))
      .groupBy("file_bucket")
      .agg(
        count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("file_bucket")
  }
  /** Dynamic partition pruning: the fact side is written
    * `partitionBy(bucket)` (16 hash buckets of `user_id` — standing in for
    * the date/tenant/region partitioning of a 100 TB table), the dim side
    * carries a selective filter, and the fact SCAN is pruned at RUNTIME by
    * the subquery broadcast of the dim's join keys — the plan shows
    * `dynamicpruningexpression` in the scan's partition filters, and only
    * 3 of 16 partition directories are ever read. This is the mechanism
    * that makes star-schema joins over partitioned warehouses scan-bounded
    * when the partition predicate is only known through a join
    * ([[graft.Round9OpsSpec]] pins the plan shape and the parity with the
    * statically-filtered query).
    */
  /** One layout path per JVM — repeats overwrite in place rather than
    * leaking a partitioned events copy per call; the spec reuses it too.
    */
  lazy val dppLayoutDir: String =
    java.nio.file.Files.createTempDirectory("graft_dpp").toFile.getAbsolutePath

  def dppPrune(s: SparkSession, d: String): DataFrame = {
    val dir = dppLayoutDir
    Tables.events(s, d)
      .select(col("user_id"), col("value"))
      .withColumn("bucket", (col("user_id") % 16).cast("int"))
      // hash-repartition by the partition column before the layout write:
      // locally the source is ONE input split, so without this a single
      // task wrote all 16 partition directories serially; 16-way tasks
      // each own whole buckets, so the directory count and file-per-
      // partition count are unchanged (16 files total)
      .repartition(16, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$dir/events_part")
    import s.implicits._
    Seq(1, 5, 11).toDF("bucket").write.mode("overwrite").parquet(s"$dir/dim")
    joinOverPartitions(s, dir)
  }

  /** The pruned join over already-written layouts (split out so the spec
    * can assert the plan without re-paying the write).
    */
  def joinOverPartitions(s: SparkSession, dir: String): DataFrame = {
    val fact = s.read.parquet(s"$dir/events_part")
    val dim = s.read.parquet(s"$dir/dim").filter(col("bucket") < 12)
    fact.join(dim, "bucket")
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(col("bucket").cast("long").as("bucket"), col("n"), col("total"))
      .orderBy("bucket")
  }
  val dppPruneSql: String =
    """SELECT user_id % 16 AS bucket,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events
      |WHERE user_id % 16 IN (1, 5, 11)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Hilbert index of two 10-bit dimensions (grid 1024×1024, d ∈ [0, 2^20)).
    * The classic xy2d walk (public folklore: quadrant digit + reflection/
    * swap rotation per level), unrolled to 10 pure-integer CASE/bit steps —
    * codegen'd end to end, no UDF, exactly like [[zkey]].
    *
    * Why offer BOTH curves: aligned `4^k`-cell buckets of either curve tile
    * the plane as identical squares (footer min/max prune the same), but
    * consecutive Hilbert cells are always EDGE-ADJACENT (Manhattan step 1,
    * spec-pinned) where Morton takes long diagonal jumps at block
    * boundaries — so range scans that STRADDLE bucket boundaries touch
    * fewer extra tiles under Hilbert. The cost is ~3 ops per bit vs
    * Morton's closed-form spread; write-time only, never on the read path.
    */
  def withHilbertKey10(in: DataFrame, xCol: String, yCol: String,
      out: String): DataFrame = withHilbertKey(in, xCol, yCol, out, bits = 10)

  /** The general walk: `bits`-bit dimensions, `d ∈ [0, 4^bits)`. */
  def withHilbertKey(in: DataFrame, xCol: String, yCol: String,
      out: String, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    // one PROJECTION per level with named intermediates, never a single
    // nested Column: inlining x/y into every consumer at every level grows
    // the expression tree ~5^bits nodes (measured: analysis OOM at 10). The
    // stepped form mirrors the oracle's CTE chain; CollapseProject leaves it
    // alone because each step's attributes feed multiple non-cheap expressions.
    var cur = in.withColumns(Map(
      "_hx" -> col(xCol), "_hy" -> col(yCol), out -> lit(0L)))
    var s = 1 << (bits - 1)
    while (s > 0) {
      val rx = when(col("_hx").bitwiseAND(lit(s.toLong)) > 0, 1L).otherwise(0L)
      val ry = when(col("_hy").bitwiseAND(lit(s.toLong)) > 0, 1L).otherwise(0L)
      // rotate the subsquare: reflect when rx=1 ∧ ry=0, then swap when ry=0
      val refl = ry === 0 && rx === 1
      cur = cur.withColumns(Map(
        out -> (col(out) + lit(s.toLong * s) * (lit(3L) * rx).bitwiseXOR(ry)),
        "_hx" -> when(ry === 0,
          when(refl, lit((s - 1).toLong) - col("_hy")).otherwise(col("_hy")))
          .otherwise(col("_hx")),
        "_hy" -> when(ry === 0,
          when(refl, lit((s - 1).toLong) - col("_hx")).otherwise(col("_hx")))
          .otherwise(col("_hy"))))
      s >>= 1
    }
    cur.drop("_hx", "_hy")
  }

  /** Same tiling demonstration as [[zorderLayout]], clustered by the
    * Hilbert index: aligned 1024-cell buckets are 32×32 subsquares, so the
    * per-file min/max of both dimensions stays within one 32-wide tile —
    * the identical pruning guarantee, plus curve-adjacency for straddling
    * range scans (see [[hilbertKey10]]).
    */
  def hilbertLayout(s: SparkSession, d: String): DataFrame = {
    val x = col("user_id") % 1024
    val y = (col("value").cast(DecimalType(18, 2)) * 100).cast("long") % 1024
    withHilbertKey10(
      Tables.events(s, d).select(x.as("x"), y.as("y")), "x", "y", "hkey")
      .withColumn("file_bucket", shiftrightunsigned(col("hkey"), 10))
      .groupBy("file_bucket")
      .agg(
        count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("file_bucket")
  }

  /** Oracle: the SAME 10-level walk, generated as chained CTEs so both
    * engines execute literally the same integer arithmetic.
    */
  val hilbertLayoutSql: String = {
    val steps = (0 until 10).map { i =>
      val s = 512 >> i
      val sm1 = s - 1
      s"""h${i + 1} AS (SELECT
         |  CASE WHEN (y & $s) = 0
         |       THEN (CASE WHEN (x & $s) > 0 THEN $sm1 - y ELSE y END)
         |       ELSE x END AS x,
         |  CASE WHEN (y & $s) = 0
         |       THEN (CASE WHEN (x & $s) > 0 THEN $sm1 - x ELSE x END)
         |       ELSE y END AS y,
         |  d + ${s.toLong * s} * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
         |                            (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)) AS d,
         |  x0, y0
         |FROM h$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH h0 AS (
       |  SELECT user_id % 1024 AS x,
       |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 1024 AS y,
       |         CAST(0 AS BIGINT) AS d,
       |         user_id % 1024 AS x0,
       |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 1024 AS y0
       |  FROM events),
       |$steps
       |SELECT d >> 10 AS file_bucket, CAST(count(*) AS BIGINT) AS n,
       |       min(x0) AS min_x, max(x0) AS max_x, min(y0) AS min_y, max(y0) AS max_y
       |FROM h10 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val zorderLayoutSql: String =
    """WITH b AS (
      |  SELECT user_id % 1024 AS x,
      |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 1024 AS y
      |  FROM events),
      |s1 AS (SELECT x, y,
      |         (x | (x << 8)) & 16711935 AS xs1, (y | (y << 8)) & 16711935 AS ys1 FROM b),
      |s2 AS (SELECT x, y,
      |         (xs1 | (xs1 << 4)) & 252645135 AS xs2, (ys1 | (ys1 << 4)) & 252645135 AS ys2 FROM s1),
      |s3 AS (SELECT x, y,
      |         (xs2 | (xs2 << 2)) & 858993459 AS xs3, (ys2 | (ys2 << 2)) & 858993459 AS ys3 FROM s2),
      |s4 AS (SELECT x, y,
      |         (xs3 | (xs3 << 1)) & 1431655765 AS xs4, (ys3 | (ys3 << 1)) & 1431655765 AS ys4 FROM s3),
      |z AS (SELECT x, y, (xs4 | (ys4 << 1)) AS zkey FROM s4)
      |SELECT zkey >> 10 AS file_bucket, CAST(count(*) AS BIGINT) AS n,
      |       min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
      |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
}
