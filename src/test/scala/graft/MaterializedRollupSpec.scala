package graft

import org.apache.spark.sql.functions._
import graft.plans.{MaterializedRollup, RollupRewrite}

/** The aggregate-navigator rewrite: registered rollups transparently answer
  * matching COUNT/SUM/MIN/MAX group-bys; anything not provably subsumed —
  * or any base write since the build — leaves the plan on the base scan.
  */
class MaterializedRollupSpec extends SparkSpec {

  // the executed plan prints scan Locations; the optimized plan's
  // `Relation ... parquet` line does not carry the path
  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("matching group-by rewrites onto the rollup and answers exactly") {
    graft.catalyst.GraftExtensions.register(spark)
    val base = tmpDir("mr-base")
    val roll = tmpDir("mr-roll") + "/r"
    Tables.lineitem(spark, sf0001)
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey")
      .write.mode("overwrite").parquet(base)

    // ground truth BEFORE registration (plans against the base scan)
    val q = () => spark.read.parquet(base)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sq"),
        min("l_quantity").as("mn"), max("l_quantity").as("mx"))
      .orderBy("l_returnflag", "l_linestatus")
    val expected = q().collect().map(_.toSeq).toSeq

    MaterializedRollup.build(spark, base, roll,
      Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
    try {
      val plan = optimized(q())
      assert(plan.contains(roll), s"plan must scan the rollup:\n$plan")
      assert(!plan.contains(base), s"plan must NOT scan the base:\n$plan")
      assert(q().collect().map(_.toSeq).toSeq == expected)

      // a COARSER grouping re-aggregates the rollup soundly
      val coarse = spark.read.parquet(base).groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sq"), max("l_quantity").as("mx"))
      assert(optimized(coarse).contains(roll))
      val direct = Tables.lineitem(spark, sf0001).groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sq"), max("l_quantity").as("mx"))
        .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
      assert(coarse.orderBy("l_returnflag").collect().map(_.toSeq).toSeq == direct)
    } finally MaterializedRollup.deregister(spark, base)
  }

  test("unsupported shapes and unregistered measures stay on the base scan") {
    graft.catalyst.GraftExtensions.register(spark)
    val base = tmpDir("mr-base2")
    val roll = tmpDir("mr-roll2") + "/r"
    Tables.lineitem(spark, sf0001)
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(base)
    MaterializedRollup.build(spark, base, roll, Seq("l_returnflag"), Seq("l_quantity"))
    try {
      // DISTINCT is never derivable from a rollup
      val dis = spark.read.parquet(base).groupBy("l_returnflag")
        .agg(count_distinct(col("l_quantity")).as("nd"))
      assert(!optimized(dis).contains(roll))
      // a measure the rollup does not carry
      val other = spark.read.parquet(base).groupBy("l_returnflag")
        .agg(sum("l_extendedprice").as("s"))
      assert(!optimized(other).contains(roll))
      // grouping outside the rollup's columns
      val finer = spark.read.parquet(base).groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("n"))
      assert(!optimized(finer).contains(roll))
      // decimal AVG (scale-adjustment semantics) declines even over a
      // registered measure
      val dec = spark.read.parquet(base)
        .select(col("l_returnflag"), col("l_quantity").cast("decimal(12,2)").as("q"))
      dec.write.mode("overwrite").parquet(base + "_dec")
      MaterializedRollup.build(spark, base + "_dec", tmpDir("mr-rolldec") + "/r",
        Seq("l_returnflag"), Seq("q"))
      try {
        val davg = spark.read.parquet(base + "_dec").groupBy("l_returnflag")
          .agg(avg("q").as("a"))
        assert(!optimized(davg).contains("mr-rolldec"))
      } finally MaterializedRollup.deregister(spark, base + "_dec")
    } finally MaterializedRollup.deregister(spark, base)
  }

  test("AVG and COUNT(col) rewrite onto the rollup and answer exactly") {
    graft.catalyst.GraftExtensions.register(spark)
    val base = tmpDir("mr-base5")
    val roll = tmpDir("mr-roll5") + "/r"
    import spark.implicits._
    // nulls in the measure: COUNT(v) must count non-nulls only, AVG(v)
    // must divide by the non-null count, and an all-null group must read
    // NULL avg / 0 count (the LEGACY-divide path)
    Seq(("A", Some(1L)), ("A", Some(3L)), ("A", None),
      ("B", Some(10L)), ("C", None)).toDF("g", "v")
      .write.mode("overwrite").parquet(base)
    val q = () => spark.read.parquet(base).groupBy("g")
      .agg(avg("v").as("a"), count(col("v")).as("nv"), count(lit(1)).as("n"))
      .orderBy("g")
    val expected = q().collect().map(_.toSeq).toSeq
    MaterializedRollup.build(spark, base, roll, Seq("g"), Seq("v"))
    try {
      val plan = optimized(q())
      assert(plan.contains(roll), s"plan must scan the rollup:\n$plan")
      assert(!plan.contains(base), s"plan must NOT scan the base:\n$plan")
      assert(q().collect().map(_.toSeq).toSeq == expected)
      // and the coarse global form
      val g = spark.read.parquet(base).agg(avg("v").as("a"), count(col("v")).as("nv"))
      assert(optimized(g).contains(roll))
      assert(g.collect()(0).toSeq == Seq(14.0 / 3, 3L))
    } finally MaterializedRollup.deregister(spark, base)
  }

  test("group-column filters re-anchor onto the rollup; measure filters decline") {
    graft.catalyst.GraftExtensions.register(spark)
    val base = tmpDir("mr-base8")
    val roll = tmpDir("mr-roll8") + "/r"
    import spark.implicits._
    Seq(("A", "x", 1L), ("A", "y", 3L), ("B", "x", 10L), ("C", "y", 7L))
      .toDF("g", "h", "v").write.mode("overwrite").parquet(base)
    MaterializedRollup.build(spark, base, roll, Seq("g", "h"), Seq("v"))
    try {
      // WHERE on grouping columns + GROUP BY — the dashboard shape
      val q = () => spark.read.parquet(base)
        .filter(col("g") =!= "B" && col("h") === "y")
        .groupBy("g")
        .agg(sum("v").as("s"), count(lit(1)).as("n"), avg("v").as("a"))
        .orderBy("g")
      assert(optimized(q()).contains(roll), s"must serve:\n${optimized(q())}")
      assert(!optimized(q()).contains(base))
      val got = q().collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == Seq(("A", 3L, 1L, 3.0), ("C", 7L, 1L, 7.0)))
      // a coarser grouping under the same filter still serves
      val coarse = spark.read.parquet(base).filter(col("h") === "x")
        .groupBy().agg(sum("v").as("s"))
      assert(optimized(coarse).contains(roll))
      assert(coarse.collect()(0).getLong(0) == 11L)
      // filter on a MEASURE is a pre-aggregation row predicate — declines
      val onMeasure = spark.read.parquet(base).filter(col("v") > 2)
        .groupBy("g").agg(sum("v").as("s"))
      assert(!optimized(onMeasure).contains(roll))
      // non-deterministic filter declines (a non-trivial predicate — the
      // optimizer eliminates always-true ones like rand < 2 before us,
      // leaving a bare scan that legitimately rewrites)
      val nonDet = spark.read.parquet(base).filter(rand(7) < 0.5)
        .groupBy("g").agg(sum("v").as("s"))
      assert(!optimized(nonDet).contains(roll))
    } finally MaterializedRollup.deregister(spark, base)
  }

  test("persisted spec recovers after a registry restart; rewrite fires again") {
    graft.catalyst.GraftExtensions.register(spark)
    val base = tmpDir("mr-base6")
    val rollRoot = tmpDir("mr-roll6")
    val roll = rollRoot + "/r"
    import spark.implicits._
    Seq(("A", 1L), ("B", 5L)).toDF("g", "v").write.mode("overwrite").parquet(base)
    val built = MaterializedRollup.build(spark, base, roll, Seq("g"), Seq("v"))
    val q = () => spark.read.parquet(base).groupBy("g")
      .agg(sum("v").as("s"), avg("v").as("a"))
    try {
      // simulate the restart: the in-memory registry loses the spec
      MaterializedRollup.deregister(spark, base)
      assert(!optimized(q()).contains(roll))
      // the PipelineApp recover slot re-registers from _spec.json
      val rec = MaterializedRollup.recover(spark, roll)
      assert(rec.contains(built), "recovered spec must round-trip exactly")
      assert(optimized(q()).contains(roll))
      val got = q().orderBy("g").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq == Seq(("A", 1L, 1.0), ("B", 5L, 5.0)))
      // recoverAll over a rollups root finds it too
      MaterializedRollup.deregister(spark, base)
      assert(MaterializedRollup.recoverAll(spark, rollRoot) == 1)
      assert(optimized(q()).contains(roll))
    } finally MaterializedRollup.deregister(spark, base)
  }

  test("freshness probe lists the base once per optimizer pass, not per aggregate") {
    val base = tmpDir("mr-base7")
    val roll = tmpDir("mr-roll7") + "/r"
    import spark.implicits._
    Seq(("A", 1L), ("B", 5L)).toDF("g", "v").write.mode("overwrite").parquet(base)
    MaterializedRollup.build(spark, base, roll, Seq("g"), Seq("v"))
    try {
      // two candidate aggregates over the same base in ONE plan
      val two = spark.read.parquet(base).groupBy("g").agg(sum("v").as("x"))
        .union(spark.read.parquet(base).groupBy("g").agg(min("v").as("x")))
        .queryExecution.analyzed
      val before = MaterializedRollup.listings.get()
      val rewritten = RollupRewrite(two)
      val after = MaterializedRollup.listings.get()
      assert(after - before == 1,
        s"one listing per pass expected, saw ${after - before}")
      // and both aggregates did rewrite
      val leafPaths = rewritten.collectLeaves().collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.mkString(",")
            case _ => ""
          }
      }
      assert(leafPaths.nonEmpty && leafPaths.forall(_.contains("mr-roll7")),
        s"both branches must scan the rollup: $leafPaths")
    } finally MaterializedRollup.deregister(spark, base)
  }

  test("refresh: append-only deltas merge incrementally; rewrites serve again") {
    graft.catalyst.GraftExtensions.register(spark)
    val base = tmpDir("mr-base4")
    val roll = tmpDir("mr-roll4") + "/r"
    import spark.implicits._
    Seq(("A", 1L), ("B", 5L)).toDF("g", "v").write.mode("overwrite").parquet(base)
    MaterializedRollup.build(spark, base, roll, Seq("g"), Seq("v"))
    try {
      val q = () => spark.read.parquet(base).groupBy("g")
        .agg(count(lit(1)).as("n"), sum("v").as("s"),
          min("v").as("mn"), max("v").as("mx"))
      // append lands -> stale -> base scan
      Seq(("A", 9L), ("C", 2L)).toDF("g", "v").write.mode("append").parquet(base)
      assert(!optimized(q()).contains(roll))
      // incremental refresh merges ONLY the delta and re-enables serving
      MaterializedRollup.refresh(spark, base)
      assert(optimized(q()).contains(roll))
      val got = q().orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(got.toSeq == Seq(("A", 2L, 10L, 1L, 9L), ("B", 1L, 5L, 5L, 5L),
        ("C", 1L, 2L, 2L, 2L)))
      // refresh on an already-fresh rollup is a no-op
      val spec = MaterializedRollup.refresh(spark, base)
      assert(optimized(q()).contains(roll))
      // a rewrite of existing files (compaction shape) falls back to a
      // full rebuild and still serves correctly
      spark.read.parquet(base).repartition(1)
        .write.mode("overwrite").parquet(base + "2")
      // simulate in-place compaction: replace base contents
      val fs = new java.io.File(base)
      fs.listFiles().foreach(_.delete())
      new java.io.File(base + "2").listFiles()
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .foreach(f => java.nio.file.Files.copy(f.toPath,
          new java.io.File(base, f.getName).toPath))
      MaterializedRollup.refresh(spark, base)
      assert(optimized(q()).contains(roll))
      assert(q().orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("A", 2L, 10L), ("B", 1L, 5L), ("C", 1L, 2L)))
    } finally MaterializedRollup.deregister(spark, base)
  }

  test("ingest commit auto-refreshes a registered warehouse rollup") {
    graft.catalyst.GraftExtensions.register(spark)
    val root = tmpDir("mr-ing")
    val wh = tmpDir("mr-ingwh")
    val roll = tmpDir("mr-ingroll") + "/r"
    def line(seq: Long, price: Double) =
      s"AVA-USDT,$seq,$price,15.2,${price + 0.001},100.0,${price - 0.001},80.5,2024-03-14T10:00:00.000"
    def put(name: String, lines: Seq[String]): String = {
      new java.io.File(s"$root/2024-03-14").mkdirs()
      val p = s"$root/2024-03-14/$name"
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        lines.mkString("\n").getBytes)
      p
    }
    graft.ingest.TickerIngest.ingest(spark,
      Seq(put("AVA_1_2024-03-14", Seq(line(1, 0.50), line(2, 0.60)))), wh)
    graft.plans.MaterializedRollup.build(spark, wh, roll,
      Seq("ticker"), Seq("sequence"))
    try {
      val q = () => spark.read.parquet(wh).groupBy("ticker")
        .agg(count(lit(1)).as("n"), max("sequence").as("mx"))
      assert(optimized(q()).contains(roll))
      // a second ingest cycle lands new rows; commit refreshes the rollup
      // under the same maintenance pass as the stats store
      graft.ingest.TickerIngest.ingest(spark,
        Seq(put("AVA_2_2024-03-14", Seq(line(9, 0.70)))), wh)
      assert(optimized(q()).contains(roll),
        "the rollup must keep serving across ingest cycles")
      val r = q().collect()(0)
      assert(r.getLong(1) == 3L && r.getLong(2) == 9L)
    } finally graft.plans.MaterializedRollup.deregister(spark, wh)
  }

  test("a base write after build() disables the rewrite (staleness guard)") {
    graft.catalyst.GraftExtensions.register(spark)
    val base = tmpDir("mr-base3")
    val roll = tmpDir("mr-roll3") + "/r"
    import spark.implicits._
    Seq(("A", 1L), ("B", 2L)).toDF("g", "v").write.mode("overwrite").parquet(base)
    MaterializedRollup.build(spark, base, roll, Seq("g"), Seq("v"))
    try {
      val q = () => spark.read.parquet(base).groupBy("g")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
      assert(optimized(q()).contains(roll))
      // the new data must be visible the moment it lands
      Seq(("A", 10L)).toDF("g", "v").write.mode("append").parquet(base)
      assert(!optimized(q()).contains(roll), "stale rollup must not serve")
      val got = q().orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == Seq(("A", 11L, 2L), ("B", 2L, 1L)))
      // rebuilding re-stamps freshness and re-enables the rewrite
      MaterializedRollup.build(spark, base, roll, Seq("g"), Seq("v"))
      assert(optimized(q()).contains(roll))
      assert(q().orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq == Seq(("A", 11L, 2L), ("B", 2L, 1L)))
    } finally MaterializedRollup.deregister(spark, base)
  }
}
