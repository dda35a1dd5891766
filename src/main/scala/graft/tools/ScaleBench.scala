package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}

/** Two-point scaling measurement for the heaviest board queries: replicate
  * the sf tables K× locally (disjoint key spaces — weak scaling, the way a
  * corpus actually grows), time each query at 1× and K×, and report the
  * measured exponent `ln(tK/t1) / ln(K)`. An exponent ≈ 1 is the evidence
  * behind SCALE.md's "would survive 100×" arguments: a plan with a hidden
  * quadratic term (all-pairs frame, value-domain window that grew with
  * data) shows up here as exponent ≫ 1 long before a cluster run would.
  *
  * Replication semantics:
  *  - documents: doc_id shifted per replica; text gets a per-replica
  *    suffix token so content-keyed stages (exact dedup) see K× distinct
  *    docs instead of collapsing the replicas to 1× survivors (which
  *    would measure the suffix of the pipeline at 1× and fake a sublinear
  *    exponent).
  *  - lineitem/orders: order/cust/supp/part keys shifted per replica —
  *    the graph queries then grow as K disjoint copies (weak scaling)
  *    rather than densifying a fixed node set (which is a DIFFERENT
  *    asymptotic regime: triangle counts superlinear in edge multiplicity).
  *  - events: event_id/user_id shifted, timestamps unchanged — the
  *    time-series queries keep their bounded day domain (their documented
  *    scale argument) while the user population grows K×.
  *
  * Usage: runMain graft.tools.ScaleBench [sfDir] [factor] [outRoot] [q1,q2,...]
  */
object ScaleBench {

  /** The heaviest board queries per BENCH_FULL (r11) — the ones whose
    * scaling claims are worth two data points.
    */
  val DefaultQueries: Seq[String] = Seq(
    "g_spearman", "p_quality_lr", "x_bfs_hops", "ts_theil_sen",
    "ts_pair_corr", "p_pps_sample", "p_curation_funnel", "t_greedy_cover",
    "x_triangles", "x_kcore")

  /** One measured two-point row. `exp` is the WALL-CLOCK exponent
    * (load-sensitive; the classic figure); `recExp` is the TOTAL SHUFFLE
    * RECORD exponent (counted by a task-metrics listener on the warm runs
    * — a data-determined figure external load cannot move, so it is the
    * gate signal of record for quadratic detection: an all-pairs frame
    * that feeds any shuffle reads ≈ 2 there, deterministically).
    */
  case class Row(name: String, t1: Double, tk: Double, ratio: Double,
      exp: Double, rec1: Long = 0L, recK: Long = 0L, recExp: Double = 0.0)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 5
    val outRoot = if (args.length > 2) args(2) else "/tmp/graft_scale"
    val queries = if (args.length > 3) args(3).split(",").toSeq else DefaultQueries
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt.max(1)
    val spark = session()
    val rows = measure(spark, sfDir, factor, outRoot, queries, reps)
    // one machine-readable line for the round artifacts
    println("{" + rows.map { r =>
      f""""${r.name}":{"t1":${r.t1}%.3f,"tk":${r.tk}%.3f,"ratio":${r.ratio}%.3f,"exp":${r.exp}%.3f,"rec1":${r.rec1},"recK":${r.recK},"rec_exp":${r.recExp}%.3f}"""
    }.mkString(",") + s""","factor":$factor}""")
    spark.stop()
  }

  def session(): SparkSession = {
    val spark = graft.Sessions.localBuilder(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftExtensions.register(spark)
    spark
  }

  /** The two-point measurement, reusable by [[ScaleGate]]: builds (or
    * reuses) BOTH points — a factor-1 rebuild AND the K× replica — through
    * the same writer, times each named query warm at 1× and K× (min over
    * `reps`), returns measured rows. Unknown query names are skipped.
    *
    * The 1× point is a REBUILD of the source dir, not the source dir
    * itself, so the two points differ ONLY in data volume: the raw
    * testdata arrives as one file per table (one input split) while the
    * replica is written 32-way, and partial-aggregation output scales
    * with splits×NDV — measured against the raw dir, `x_col_stats` read a
    * phantom record exponent of 1.57 (79k→700k) purely because its
    * bounded-NDV columns emitted one partial row per (split, value) on
    * the replica side only; against the symmetric rebuild the same plan
    * reads its true data-scale exponent. This kills the false-positive
    * class at the measurement, not with a wider cap.
    */
  /** Continue warm runs until the run-to-run improvement drops under
    * `tol` (the curve has plateaued) or `maxExtra` runs exhaust — the
    * [[BoxCanary.warmUntil]] principle applied to query measurement,
    * where no absolute bound exists so the stop criterion is the decay
    * slope itself. `tol` 0.15: steady-state rep noise on this box is
    * ≤ ~10%, while the JIT decay slope runs 20–80% per rep (measured
    * series in [[ScaleBench.measure]]'s bench scaladoc). Returns the
    * number of extra warm runs taken. Injectable runner = pure-testable
    * core (Round18OpsSpec feeds the measured g_mad_outliers decay).
    */
  def warmStable(firstWarm: Double, maxExtra: Int = 5, tol: Double = 0.15)(
      run: () => Double): Int = {
    var prev = firstWarm
    var extra = 0
    var stable = false
    while (!stable && extra < maxExtra) {
      val t = run()
      extra += 1
      stable = prev <= 0 || t >= prev * (1 - tol)
      prev = t
    }
    extra
  }

  def measure(spark: SparkSession, sfDir: String, factor: Int,
      outRoot: String, queries: Seq[String], reps: Int): Seq[Row] = {
    val base = s"$outRoot/x1"
    val scaled = s"$outRoot/x$factor"
    buildScaled(spark, sfDir, base, 1)
    buildScaled(spark, sfDir, scaled, factor)

    // shuffle records are counted on the WARM run (free: it executes
    // anyway) with a task-metrics listener — the ExprBench discipline,
    // which also sees exchanges hidden inside localCheckpoints.
    // The warm phase then CONTINUES until run-to-run improvement drops
    // under warmTol (see warmStable) before anything is measured: a
    // single warm run left the min-of-reps on the JIT decay slope for
    // codegen-heavy plans — g_mad_outliers (two cumulated-histogram
    // medians, ~25 codegen stages) measured per-rep 40.8 → 8.2 → 6.6 →
    // 4.9 → 4.7 → … → 2.5 s across a fresh JVM, so its two-point
    // exponent read −0.41 and +1.06 on consecutive clean runs with
    // IDENTICAL shuffle-record counts; its steady-state exponent is ≈ 0.
    // Like BoxCanary.warmUntil this cannot loosen the gate: bounds are
    // untouched, only the cold-JVM artifact is excluded from the sample.
    def bench(fn: (SparkSession, String) => DataFrame, dir: String): (Double, Long) = {
      val acc = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) { acc.addAndGet(m.shuffleWriteMetrics.recordsWritten); () }
        }
      }
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.addSparkListener(listener)
      val firstWarm = try {
        val t = run() // warm + record count
        // drain DETERMINISTICALLY, not with a fixed sleep: stragglers
        // missed on a loaded box undercount rec1/recK, which can fake a
        // floor exemption or mask a super-linear shuffle in ScaleGate
        org.apache.spark.graft.SparkInternals.drainListenerBus(spark.sparkContext)
        t
      } finally spark.sparkContext.removeSparkListener(listener)
      warmStable(firstWarm)(run _)
      val t = (1 to reps).map(_ => run()).min
      (t, acc.get())
    }

    println(f"${"query"}%-20s ${"t_1x_s"}%8s ${s"t_${factor}x_s"}%8s ${"ratio"}%7s ${"exponent"}%8s ${"rec_1x"}%10s ${s"rec_${factor}x"}%10s ${"rec_exp"}%8s")
    queries.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val (t1, r1) = bench(fn, base)
        val (tk, rk) = bench(fn, scaled)
        val ratio = tk / t1
        val exp = math.log(ratio) / math.log(factor.toDouble)
        // both zero: a shuffle-free (map-only) plan stays exponent 0; a
        // plan that GREW a shuffle from nothing is flagged at infinity
        val recExp =
          if (r1 == 0L && rk == 0L) 0.0
          else if (r1 == 0L) Double.PositiveInfinity
          else math.log(rk.toDouble / r1) / math.log(factor.toDouble)
        println(f"$name%-20s $t1%8.2f $tk%8.2f $ratio%7.2f $exp%8.2f $r1%10d $rk%10d $recExp%8.2f")
        // storage hygiene between queries (the Bench discipline): blocks
        // pinned by a finished query must not tax the next measurement
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        Row(name, t1, tk, ratio, exp, r1, rk, recExp)
      }
    }
  }

  /** Build the K× replicated dir once; reused across runs (delete to force
    * a rebuild). Tables outside the replication set are copied as-is so
    * every board query still resolves.
    */
  def buildScaled(spark: SparkSession, sfDir: String, outDir: String,
      factor: Int): Unit = {
    if (new java.io.File(s"$outDir/_SCALED_OK").isFile) return
    new java.io.File(outDir).mkdirs()
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).first().getLong(0) + 1L

    def replicate(df: DataFrame, keys: Seq[String],
        text: Boolean = false): DataFrame = {
      val strides = keys.map(k => k -> stride(df, k)).toMap
      (0 until factor).map { r =>
        val shifted = keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(r * strides(k))))
        if (text && r > 0)
          shifted
            .withColumn("text", concat(col("text"), lit(s" zq$r")))
            .withColumn("n_chars", col("n_chars") + lit(s" zq$r".length.toLong))
        else shifted
      }.reduce(_ unionByName _)
    }

    def write(df: DataFrame, name: String): Unit =
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")

    write(replicate(Tables.documents(spark, sfDir), Seq("doc_id"),
      text = true), "documents")
    write(replicate(Tables.lineitem(spark, sfDir),
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    write(replicate(Tables.orders(spark, sfDir),
      Seq("o_orderkey", "o_custkey")), "orders")
    write(replicate(Tables.load(spark, sfDir, "events"),
      Seq("event_id", "user_id")), "events")
    Seq("region", "nation", "customer", "supplier", "part", "embeddings")
      .foreach(t => write(Tables.load(spark, sfDir, t), t))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/_SCALED_OK"), s"factor=$factor\n")
    ()
  }
}
