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
      // AQE coalescing floor DELIBERATELY LEFT AT THE 1 MB DEFAULT (r19,
      // measured): tools/StageCost showed the NDV-sized intermediates
      // (graph edge/degree frames, histograms) running 4-10 partitions
      // wide on a 32-core box, so a 64k floor was A/B'd to force full
      // width — and lost BADLY (quiet box, repeat=5: x_hits 5.93 vs 2.47
      // s, x_kcore 4.85 vs 2.34, x_lpa 4.37 vs 2.44, x_pagerank 3.94 vs
      // 2.20; 14-query set total 41.2 vs 30.0 s). The iterative loop
      // family is bounded by PER-TASK/PER-STAGE overhead, not by idle
      // cores: byte-based coalescing to a handful of partitions is the
      // right call for small frames, and the fix for the anti-scaling
      // band is fewer jobs per round (the kcore/hits r18 trims), never
      // more tasks per tiny exchange.
}
