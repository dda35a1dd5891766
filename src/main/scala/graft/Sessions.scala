package graft

import org.apache.spark.sql.SparkSession

/** One place for the local-session base config shared by the driver entry
  * points (Bench, Verify) and the dev tools: previously four hand-copied
  * builder blocks that could — and did — drift (one lacked the
  * parquet-nanos flag). Callers append their point-specific settings.
  */
object Sessions {
  def localBuilder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) — unreadable without this
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
