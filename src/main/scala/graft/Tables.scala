package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * only through here, so the scan always goes through one code path — making
  * it trivial to swap the physical source (parquet dir now; a real lakehouse
  * catalog at scale) without touching operator code.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize `events.ts` to a micros TimestampType whatever the parquet
    * writer produced — the generator has shipped both encodings across
    * rounds:
    *  - TIMESTAMP(NANOS): Spark reads it only as a nanos-since-epoch Long
    *    (`spark.sql.legacy.parquet.nanosAsLong=true` — set in every session
    *    builder here); truncate to micros. The DuckDB oracle applies the
    *    identical `CAST(ts AS TIMESTAMP)` truncation so both engines agree.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TimestampNTZType; cast to TimestampType — value-preserving under
    *    the UTC session timezone every entry point pins, and it keeps the
    *    column type downstream operators (unix_micros, bigint casts,
    *    Row.getTimestamp) were built against.
    */
  private def withTsMicros(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Spread a small single-file scan across all cores before a CPU-heavy
    * per-row projection (hashing, shingling, vector math). Locally a small
    * table arrives as ONE input split, so without this the projection runs
    * single-threaded; at scale the source has many splits and this exchange
    * is a metadata-sized no-op relative to the work it parallelizes.
    */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = withTsMicros(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
