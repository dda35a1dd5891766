package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Round-9 operator pins: boilerplate fixed point. */
class Round9OpsSpec extends SparkSpec {

  /** Crafted 100-doc corpus (threshold = ceil(0.07·100) = 7) where one
    * pass is NOT a fixed point: "x y" is frequent (df 15) and its excision
    * makes "u v" adjacent in group A, pushing df("u v") from 4 (group C
    * only — below threshold) to 9 — frequent ONLY in round 2.
    */
  private def craftedDocs = {
    import spark.implicits._
    val a = (0 until 5).map(i => (100L + i, "u x y v"))
    val b = (0 until 10).map(i => (200L + i, s"w$i x y z$i"))
    val c = (0 until 4).map(i => (300L + i, s"s$i u v t$i"))
    val filler = (0 until 81).map(i => (400L + i, s"f$i"))
    (a ++ b ++ c ++ filler).toDF("doc_id", "text")
  }

  test("boilerplate fixpoint: round 2 excises a window created by round 1") {
    val fp = TextOps.boilerplateScrubFixpointOver(craftedDocs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // group A: "u x y v" -> r1 removes "x y" -> "u v" -> r2 removes it -> ""
    for (i <- 0 until 5) {
      val r = fp(100L + i)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((1, 1, 0)), r)
      assert(r.getString(4) == "" && r.getInt(5) == 0, r)
    }
    // group B: loses "x y" in round 1, then stable (unique pairs)
    for (i <- 0 until 10) {
      val r = fp(200L + i)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((1, 0, 0)), r)
      assert(r.getString(4) == s"w$i z$i" && r.getInt(5) == 2, r)
    }
    // group C: untouched in round 1 (df("u v")=4 < 7), loses "u v" in round 2
    for (i <- 0 until 4) {
      val r = fp(300L + i)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((0, 1, 0)), r)
      assert(r.getString(4) == s"s$i t$i" && r.getInt(5) == 2, r)
    }
    // filler: never touched
    val f0 = fp(400L)
    assert((f0.getInt(1), f0.getInt(2), f0.getInt(3)) == ((0, 0, 0)))
    assert(f0.getString(4) == "f0" && f0.getInt(5) == 1)
  }

  test("boilerplate fixpoint: converged output is a true fixed point") {
    // a wider unroll changes nothing: round 4 is a structural no-op and
    // every clean_text is identical — which is also the property that makes
    // the fixed-3-round oracle SQL exact for an early-exiting loop
    val r3 = TextOps.boilerplateScrubFixpointOver(craftedDocs)
      .select("doc_id", "clean_text", "n_tokens_kept").collect().toSeq
    val r4df = TextOps.boilerplateScrubFixpointOver(craftedDocs, maxRounds = 4)
    assert(r4df.columns.toSeq ==
      Seq("doc_id", "n_spans_r1", "n_spans_r2", "n_spans_r3", "n_spans_r4",
        "clean_text", "n_tokens_kept"))
    assert(r4df.agg(sum("n_spans_r4")).first().getLong(0) == 0L)
    val r4 = r4df.select("doc_id", "clean_text", "n_tokens_kept").collect().toSeq
    assert(r3 == r4)
  }

  test("vocab/OOV: counts consistent, OOV boundary exercised, full vocab = zero OOV") {
    import spark.implicits._
    import graft.queries.PipelineQueries
    val r = PipelineQueries.vocabOov(spark, sf0001).collect()
    assert(r.length == 500)
    r.foreach(row => assert(row.getLong(2) >= 0 && row.getLong(2) <= row.getLong(1), row))
    // the 16-token vocab over a 31-token corpus must leave SOME occurrences
    // out-of-vocabulary, or the query tests nothing at this SF
    assert(r.map(_.getLong(2)).sum > 0)
    // n_tokens sums to the corpus occurrence count regardless of vocab
    val totalTokens = Tables.documents(spark, sf0001)
      .select(explode(graft.functions.TextOps.tokens(col("text"))))
      .count()
    assert(r.map(_.getLong(1)).sum == totalTokens)
    // a vocabulary covering every distinct token admits everything
    val full = PipelineQueries.vocabOov(spark, sf0001, vocabSize = 100000).collect()
    assert(full.map(_.getLong(2)).sum == 0)
    assert(full.map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap ==
      r.map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap)
  }

  test("bigram LM: xent bounds, rare-count consistency, short docs score NULL") {
    import spark.implicits._
    val df = graft.queries.PipelineQueries.bigramLm(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == 500)
    val t = rows.map(_.getLong(1)).sum // total bigram occurrences
    rows.foreach { r =>
      val (nBg, nRare) = (r.getLong(1), r.getLong(2))
      assert(nRare >= 0 && nRare <= nBg, r)
      if (nBg == 0) assert(r.isNullAt(3), s"doc without bigrams must score NULL: $r")
      else {
        val xent = r.getDouble(3)
        // add-1 smoothed probability is in (0, 1): ln is negative, so the
        // negated mean is strictly positive; and p >= 1/(T+V) bounds xent
        // above by ln(T+V) for any document
        assert(xent > 0.0, r)
        assert(xent <= math.log(t.toDouble + t) + 1e-6, r) // V <= T always
      }
    }
    // every doc's bigram count equals max(tokens - 1, 0)
    val tokCounts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(graft.functions.TextOps.tokens(col("text"))).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == math.max(tokCounts(r.getLong(0)) - 1, 0), r))
  }

  test("exclusivePrefix: exact on sparse/negative/shuffled keys at every recursion depth") {
    import spark.implicits._
    import graft.queries.PipelineQueries
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // a hostile key domain: negative, sparse (gaps ~10^6), huge-magnitude,
      // shuffled arrival order — everything the floor-div + range-bound
      // reasoning claims to handle
      val base = List.fill(120)(rnd.nextLong() % 50000000L).distinct
      val keys = (base ++ Seq(Long.MinValue / 4096, Long.MaxValue / 4096, -1L, 0L, 1L)).distinct
      val rows = rnd.shuffle(keys).map(k => (k, (rnd.nextInt(1000) + 1).toLong))
      val df = rows.toDF("k", "v").repartition(4)
      val expected = rows.sortBy(_._1)
        .scanLeft((0L, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }
        .sliding(2).map { case Seq((_, acc), (k, _)) => k -> acc }.toMap
      // depth sweep over the ±2^51 domain: terminal-only (1 level), forced
      // 2 levels, and forced 6 levels — deep enough to exercise the
      // recursion chain, shallow enough that Catalyst can optimize the
      // nested window+join plan (depth beyond MaxPrefixLevels is rejected
      // at construction; see the guard test below)
      for ((bs, mwr) <- Seq((1024, 1L << 50), (64, 1L << 41), (64, 1L << 20))) {
        val bound = Math.floorDiv(keys.max, bs) - Math.floorDiv(keys.min, bs) + 1
        val got = PipelineQueries.exclusivePrefix(df, "k", "v", bs, mwr, bound)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected,
          s"trial $trial bs=$bs mwr=$mwr: prefix sums diverge from the reference")
      }
    }
  }

  test("exclusivePrefix: un-optimizable depth is rejected at construction, not OOM") {
    import spark.implicits._
    import graft.queries.PipelineQueries
    // blockSize=4 over the ±2^51 domain needs ~26 window+join levels — a
    // plan Catalyst cannot fold within driver memory. The operator must
    // fail fast with the fix in the message, before any plan is built.
    val df = Seq((Long.MinValue / 4096, 1L), (Long.MaxValue / 4096, 1L)).toDF("k", "v")
    val bound = Math.floorDiv(Long.MaxValue / 4096, 4) -
      Math.floorDiv(Long.MinValue / 4096, 4) + 1
    val e = intercept[IllegalArgumentException] {
      PipelineQueries.exclusivePrefix(df, "k", "v", 4, 2L, bound)
    }
    assert(e.getMessage.contains("raise blockSize"), e.getMessage)
  }

  test("exclusivePrefix: sparse keys still recurse (a row-count bound would go terminal)") {
    import spark.implicits._
    import graft.queries.PipelineQueries
    // 100 rows, ids 10^6 apart: every block holds ONE row, so distinct
    // blocks == rows == 100 at every level until the id RANGE collapses.
    // A row-count bound (100/64 < mwr) would plan the terminal global
    // window over what is, structurally, a data-scale frame; the range
    // bound keeps blocking until the domain actually shrinks below mwr.
    val df = (0 until 100).map(i => (i * 1000000L, 1L)).toDF("k", "v")
    val bound = Math.floorDiv(99000000L, 64) - 0 + 1
    val plan = PipelineQueries.exclusivePrefix(df, "k", "v", 64, 50L, bound)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_blk1"), plan)
    assert(plan.contains("hashpartitioning(_blk2"), plan) // 99M/64^2 ≈ 24k > 50
    assert("Exchange SinglePartition".r.findAllIn(plan).size == 1, plan)
    // and the values are still exact through the deep plan
    val got = PipelineQueries.exclusivePrefix(df, "k", "v", 64, 50L, bound)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0 until 100).map(i => i * 1000000L -> i.toLong).toMap)
  }

  test("boilerplate fixpoint on the documents table matches the one-pass scrub's round 1") {
    // on the real corpus, round-1 excisions equal the one-pass operator's
    // n_spans doc for doc (same threshold, same windows)
    val onePass = TextOps.boilerplateScrub(spark, sf0001)
      .select("doc_id", "n_spans").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fp = TextOps.boilerplateScrubFixpoint(spark, sf0001)
      .select("doc_id", "n_spans_r1").collect()
    assert(fp.nonEmpty)
    fp.foreach(r => assert(r.getInt(1) == onePass(r.getLong(0)), r))
  }

  test("jaro_winkler: textbook values and the DuckDB empty-string convention") {
    import spark.implicits._
    graft.catalyst.GraftExtensions.register(spark)
    // expected values pinned from DuckDB jaro_winkler_similarity (bit-exact)
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("duane", "dwayne", 0.8400000000000001),
      ("abc", "abc", 1.0),
      ("crzy", "crzyx", 0.96), // m=4: jaro = 14/15; jw = 14/15 + 4·0.1·(1/15)
      ("", "", 0.0),           // DuckDB: both empty → 0, NOT 1
      ("a", "", 0.0),
      ("abc", "xyz", 0.0))
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .selectExpr("jaro_winkler(a, b) AS jw").as[Double].collect()
    cases.zip(got).foreach { case ((a, b, want), jw) =>
      assert(jw == want, s"jw($a, $b) = $jw, want $want")
    }
  }

  test("jaro_winkler: codegen path agrees with the interpreted helper; symmetric") {
    import graft.catalyst.HashUtil
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    // deterministic LCG corpus (no Random: reproducible across runs)
    var state = 12345L
    def nxt(): Int = { state = state * 6364136223846793005L + 1442695040888963407L; (state >>> 33).toInt }
    val alpha = "abcdef "
    val pairs = (0 until 400).map { _ =>
      def str() = {
        val n = math.abs(nxt()) % 20
        (0 until n).map(_ => alpha(math.abs(nxt()) % alpha.length)).mkString
      }
      (str(), str())
    }
    val viaCodegen = pairs.toDF("a", "b")
      .select(graft.catalyst.HashFunctions.jaro_winkler(col("a"), col("b")))
      .as[Double].collect()
    pairs.zip(viaCodegen).foreach { case ((a, b), jw) =>
      val ref = HashUtil.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))
      val sym = HashUtil.jaroWinkler(UTF8String.fromString(b), UTF8String.fromString(a))
      assert(jw == ref, s"codegen vs interpreted on ($a, $b)")
      assert(ref == sym, s"asymmetric on ($a, $b): $ref vs $sym")
    }
  }

  test("pagerank matches a driver-side reference on sf0.001; mass is conserved") {
    import graft.operators.GraphOps
    // packed long ids → public labels, mirroring GraphOps.label
    def lbl(x: Long): String = if (x % 2 == 0) s"c${x / 2}" else s"s${(x - 1) / 2}"
    val e = GraphOps.edges(spark, sf0001).collect()
      .map(r => lbl(r.getLong(0)) -> lbl(r.getLong(1)))
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.length }
    val nodes = outdeg.keySet
    val n = nodes.size
    // scale-0 HALF_UP, exactly Spark's round(double) → cast long
    def r0(d: Double): Long =
      java.math.BigDecimal.valueOf(d).setScale(0, java.math.RoundingMode.HALF_UP).longValue
    var rank = nodes.map(_ -> r0(GraphOps.Nano.toDouble / n)).toMap
    for (_ <- 1 to GraphOps.Iterations) {
      val inSum = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r0(rank(src).toDouble / outdeg(src)) }.sum
      }
      rank = inSum.map { case (node, s) =>
        node -> r0(0.15 * GraphOps.Nano.toDouble / n + 0.85 * s.toDouble)
      }
    }
    val want = rank.toSeq.sortBy { case (node, r) => (-r, node) }.take(GraphOps.TopN)
    val got = GraphOps.pagerank(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // total nano-mass stays ~1e9 (rounding drift only)
    assert(math.abs(rank.values.sum - GraphOps.Nano) < 10000L, rank.values.sum)
  }

  test("merge upsert: three-way action resolution covers target exactly once") {
    import graft.queries.RelationalQueries
    val rows = RelationalQueries.a9MergeUpsert(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val nCust = graft.Tables.customer(spark, sf0001).count()
    val byAction = rows.groupBy(_._2).map { case (a, rs) => a -> rs.length }
    // every target row survives exactly once (update or keep), inserts add
    assert(byAction.getOrElse("update", 0) + byAction.getOrElse("keep", 0) == nCust)
    assert(byAction.getOrElse("insert", 0) > 0)
    rows.foreach { case (k, a) =>
      if (a == "insert") assert(k > 1000000L, s"insert key $k")
      if (a == "update") assert(k % 3 == 0, s"update key $k")
    }
    assert(rows.map(_._1).distinct.length == rows.length) // key is unique
  }

  test("unpivot: long shape carries exactly the wide aggregation's cells") {
    import graft.queries.AnalyticsQueries
    val long = AnalyticsQueries.gUnpivot(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val flags = long.keySet.map(_._1)
    assert(long.size == flags.size * 3) // qty/price/tax per flag
    // spot-check one measure against an independent aggregation
    val wantQty = graft.Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("q")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    flags.foreach(f => assert(long((f, "qty")) == wantQty(f), f))
  }

  test("count-min sketch: disjoint-half merge is exact, estimates bounded") {
    val df = graft.Tables.lineitem(spark, sf0001).select(col("l_suppkey"))
    val (eps, conf, seed) = (0.01, 0.9, 42)
    val whole = df.stat.countMinSketch("l_suppkey", eps, conf, seed)
    val h1 = df.filter(col("l_suppkey") % 2 === 0)
      .stat.countMinSketch("l_suppkey", eps, conf, seed)
    val h2 = df.filter(col("l_suppkey") % 2 =!= 0)
      .stat.countMinSketch("l_suppkey", eps, conf, seed)
    h1.mergeInPlace(h2) // the distributed combine: counters add
    val exact = df.groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val total = exact.map(_._2).sum
    exact.foreach { case (k, n) =>
      // same seed/width → merging disjoint halves reproduces the whole
      // sketch bit-for-bit, which is what makes treeAggregate-style
      // distributed sketching exact w.r.t. a single-pass build
      assert(h1.estimateCount(k) == whole.estimateCount(k), s"key $k")
      // CMS guarantee: never under, over by at most eps·N (w.h.p.)
      assert(whole.estimateCount(k) >= n, s"key $k under-estimated")
      assert(whole.estimateCount(k) <= n + (eps * total).toLong + 1, s"key $k")
    }
  }

  test("merge_pair: greedy left-to-right non-overlapping (the BPE order)") {
    import spark.implicits._
    val got = Seq(
      (Seq("a", "a", "a", "a"), "a", "a"),
      (Seq("a", "a", "a"), "a", "a"),
      (Seq("k", "e", "y"), "e", "y"),
      (Seq("x"), "a", "a"))
      .toDF("syms", "l", "r")
      .select(graft.catalyst.HashFunctions.merge_pair(col("syms"), col("l"), col("r")))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("aa", "aa")) // NOT ("aa","a","a"): non-overlap greedy
    assert(got(1) == Seq("aa", "a"))
    assert(got(2) == Seq("k", "ey"))
    assert(got(3) == Seq("x"))
  }

  test("bpe training matches an independent reference on sf0.001") {
    import graft.operators.TokenizerOps
    // reference: plain-Scala BPE over the collected word counts
    val wc = graft.Tables.documents(spark, sf0001)
      .filter(col("text").isNotNull)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    var words: Seq[(Vector[String], Long)] =
      wc.map { case (w, c) => w.toVector.map(_.toString) -> c }.toSeq
    val want = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to TokenizerOps.Merges) {
      val freqs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          freqs((p(0), p(1))) = freqs.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      if (freqs.nonEmpty) {
        val ((l, r), f) = freqs.toSeq.minBy { case ((l, r), f) => (-f, l, r) }
        want += ((rank, l, r, f))
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> c
        }
      }
    }
    val got = TokenizerOps.bpeTrain(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == want.toSeq, s"got=$got\nwant=$want")
    assert(got.size == TokenizerOps.Merges) // corpus is rich enough for all rounds

    // encode consistency: per-doc subword counts match segmenting every
    // word through the reference merges in rank order
    def segLen(w: String): Int = {
      var syms = w.toVector.map(_.toString)
      want.foreach { case (_, l, r, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length
    }
    val wantSeg = graft.Tables.documents(spark, sf0001)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).map { case (id, ws) =>
        id -> (ws.length.toLong, ws.map(_._2.length.toLong).sum,
          ws.map(w => segLen(w._2).toLong).sum)
      }
    val gotSeg = TokenizerOps.bpeSegment(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(gotSeg == wantSeg, "per-doc segmentation mismatch")
    // merges actually compress: strictly fewer subwords than chars overall
    assert(gotSeg.values.map(_._3).sum < gotSeg.values.map(_._2).sum)
  }

  test("AQE skew join splits the hot partition at runtime (no manual salt)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (50k rows) + a uniform tail: the classic skew. The pad
      // is a per-row hash so the hot shuffle partition stays large AFTER
      // compression (a constant pad compresses below the skew threshold),
      // and it is kept in the output so pruning can't drop it pre-shuffle.
      val left = spark.range(50000)
        .select(lit(0L).as("k"), md5(col("id").cast("string")).as("pad"))
        .union(spark.range(1, 1001)
          .select(col("id").as("k"), md5(col("id").cast("string")).as("pad")))
      val right = spark.range(0, 1001).select(col("id").as("k"), lit(1).as("v"))
      val j = left.join(right, "k").select("k", "pad")
      // execute THIS QueryExecution (count() would plan its own) so the
      // in-place adaptive replan is observable
      assert(j.collect().length == 51000)
      val finalPlan = j.queryExecution.executedPlan.toString
      // the runtime-replanned join carries the skew marker — AQE split the
      // hot partition into advisory-sized slices instead of one straggler
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("incremental OHLC merge equals full recompute, slice-choice invariant") {
    import graft.queries.AnalyticsQueries
    val full = AnalyticsQueries.wTimeBucketOhlc(spark, sf0001).collect().map(_.toSeq)
    val merged = AnalyticsQueries.wOhlcMerge(spark, sf0001).collect().map(_.toSeq)
    assert(merged.toSeq == full.toSeq)
  }

  test("dynamic partition pruning: runtime subquery prunes the fact scan") {
    import graft.operators.LayoutOps
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      LayoutOps.dppPrune(spark, sf0001).collect() // writes both layouts
      val q = LayoutOps.joinOverPartitions(spark, LayoutOps.dppLayoutDir)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruningexpression"), plan)

      // parity with the statically-pruned formulation
      val got = q.collect().map(_.toSeq)
      val want = graft.Tables.events(spark, sf0001)
        .select(col("user_id"), col("value"))
        .withColumn("bucket", (col("user_id") % 16))
        .filter(col("bucket").isin(1, 5, 11))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("total"))
        .orderBy("bucket").collect().map(_.toSeq)
      assert(got.toSeq == want.toSeq)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("bucketed join: no shuffle on either join side, both scans bucketed") {
    import graft.operators.BucketingOps
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BucketingOps.bucketedJoin(spark, sf0001).collect() // writes the tables
      val q = BucketingOps.joinOverBuckets(spark)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // both file scans read the bucketing spec
      assert("Bucketed: true".r.findAllIn(plan).size == 2, plan)
      // the ONLY hash exchange is the 5-group partial-agg one above the
      // join; neither join input re-shuffles (that is the point of bucketing)
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)

      // and the co-located result equals the plain shuffle join's
      val got = q.collect().map(_.toSeq)
      val o = graft.Tables.orders(spark, sf0001).select("o_orderkey", "o_orderpriority")
      val l = graft.Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val D = org.apache.spark.sql.types.DecimalType(18, 2)
      val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(D) *
              (lit(BigDecimal(1)).cast(D) - col("l_discount").cast(D)))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority").collect().map(_.toSeq)
      assert(got.toSeq == plain.toSeq)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("jaro_winkler: non-string input is an analysis error, not a runtime cast") {
    graft.catalyst.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((1, "x")).toDF("n", "s")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("jaro_winkler(n, s)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("jaro_winkler"), e.getMessage)
  }

  test("bfsHopsOver: min-hop semantics on a crafted graph") {
    import spark.implicits._
    import graft.operators.GraphOps
    // chain 1-2-3-4-5, a shortcut 1-4, an unreachable island 9-10, and a
    // cycle edge 3-1 (revisits must keep the FIRST hop, not relabel)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (9L, 10L), (3L, 1L))
    val edges = und.toDF("src", "dst")
      .union(und.map(_.swap).toDF("src", "dst"))
    val seeds = Seq(1L).toDF("node")
    val got = GraphOps.bfsHopsOver(edges, seeds, maxHop = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // shortest: 1→0; 2,4,3(via cycle edge)→1; 5(via 4),…→2
    assert(got == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 1, 5L -> 2), got)
  }

  test("lpaOver: barbell graph settles into its two triangles, hand-simulated") {
    import spark.implicits._
    import graft.operators.GraphOps
    // two triangles {1,2,3} and {10,11,12} joined by the 3–10 bridge
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (3L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.lpaOver(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 synchronous min-tie-break rounds, simulated by hand: the left
    // triangle converges to label 1; the right (10 included, pulled over
    // the bridge then reclaimed) to label 3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L), got)
  }

  test("bfsHopsOver: hop bound truncates, multi-seed takes the nearer seed") {
    import spark.implicits._
    import graft.operators.GraphOps
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = chain.toDF("src", "dst")
      .union(chain.map(_.swap).toDF("src", "dst"))
    val got = GraphOps.bfsHopsOver(edges, Seq(1L, 6L).toDF("node"), maxHop = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 6L -> 0, 2L -> 1, 5L -> 1, 3L -> 2, 4L -> 2), got)
  }

  test("ppl bucket: terciles partition the scored docs, xent ranges are ordered") {
    import graft.queries.PipelineQueries
    val docs = Tables.documents(spark, sf0001)
    val nDocs = docs.count()
    val nShort = docs
      .filter(size(split(trim(col("text")), "\\s+")) < 2).count()
    val rows = PipelineQueries.pplBucket(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.values.map(_.getLong(1)).sum == nDocs)
    assert((nShort == 0) == !rows.contains("unscored"))
    val scored = nDocs - nShort
    // tercile sizes: head = ceil(n/3); head+middle = ceil(2n/3) — exact
    // unless ties straddle a cutoff (all ties fall to the lower bucket)
    val h = rows("head").getLong(1)
    val m = rows("middle").getLong(1)
    assert(h + m + rows("tail").getLong(1) == scored)
    assert(h >= (scored + 2) / 3, s"head=$h scored=$scored")
    // xent ranges must be disjoint and ordered: max(head) < min(middle) < …
    assert(rows("head").getLong(4) < rows("middle").getLong(3))
    assert(rows("middle").getLong(4) < rows("tail").getLong(3))
  }

  test("dsir: top-quartile selection is a value cut; target-domain docs score higher") {
    import graft.queries.PipelineQueries
    val rows = PipelineQueries.dsirSelect(spark, sf0001).collect()
    val n = rows.length
    assert(n == Tables.documents(spark, sf0001).count())
    val (sel, unsel) = rows.partition(_.getBoolean(3))
    // cutoff-inclusive top quartile: at least n - ⌈3n/4⌉ + 1 docs selected
    val k75 = (3 * n + 3) / 4
    assert(sel.length >= n - k75 + 1, s"selected=${sel.length} n=$n")
    // the defining property of a value cut: no unselected doc outscores a selected one
    if (sel.nonEmpty && unsel.nonEmpty)
      assert(sel.map(_.getDouble(2)).min >= unsel.map(_.getDouble(2)).max)
    // direction: English docs (the target domain) average higher llr
    val langOf = Tables.documents(spark, sf0001).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, rest) = rows.partition(r => langOf(r.getLong(0)) == "en")
    val avg = (a: Array[org.apache.spark.sql.Row]) =>
      a.map(_.getDouble(2)).sum / a.length
    assert(avg(en) > avg(rest), s"en=${avg(en)} rest=${avg(rest)}")
  }

  test("zipf fit: full top-K frame, negative slope, positive rank-1 intercept") {
    import graft.queries.PipelineQueries
    val r = PipelineQueries.zipfFit(spark, sf0001).collect()
    assert(r.length == 1)
    // the synthetic corpus vocabulary is smaller than K — the fit runs over
    // min(K, vocab) points
    assert(r(0).getLong(0) >= 2 && r(0).getLong(0) <= PipelineQueries.ZipfK)
    // a frequency-ranked curve can only fall: slope strictly negative, and
    // the fitted ln-frequency at rank 1 (the intercept) strictly positive
    assert(r(0).getDouble(1) < 0.0, s"slope=${r(0).getDouble(1)}")
    assert(r(0).getDouble(2) > 0.0, s"intercept=${r(0).getDouble(2)}")
  }

  test("ngram novelty: first doc is all-new, ratios bounded, counts match dup-span") {
    import graft.operators.DedupOps
    val rows = DedupOps.ngramNovelty(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    // the lowest doc_id holds the corpus's first shingles: novelty exactly 1
    assert(rows.minBy(_.getLong(0)).getDouble(2) == 1.0)
    // same shingle universe as dupSpanFrac: identical doc set and per-doc counts
    val spans = DedupOps.dupSpanFrac(spark, sf0001).collect()
      .map(r => r.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == spans)
  }

  test("psi drift: contributions are non-negative and the board stays tracked-feature-sized") {
    import graft.queries.PipelineQueries
    val rows = PipelineQueries.psiDrift(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= PipelineQueries.PsiK)
    // (p−q)·ln(p/q) has matching signs — every PSI contribution is ≥ 0
    assert(rows.forall(_.getDouble(3) >= 0.0), rows.filter(_.getDouble(3) < 0).mkString(";"))
    assert(rows.forall(r => r.getLong(1) + r.getLong(2) > 0))
  }

  test("epoch plan: caps at MaxEpochs, deficit only at the cap, budget never exceeded") {
    import graft.queries.PipelineQueries
    val rows = PipelineQueries.epochPlan(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val budget = rows.map(_.getLong(2)).sum * PipelineQueries.BudgetFactor
    for (r <- rows) {
      val (tokens, epochs, planned, deficit) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(epochs >= 1 && epochs <= PipelineQueries.MaxEpochs, r)
      assert(planned <= epochs * tokens, r)
      assert(deficit >= 0, r)
      // a source below the epoch cap reached its share — no deficit by construction
      if (epochs < PipelineQueries.MaxEpochs) assert(deficit == 0, r)
    }
    assert(rows.map(_.getLong(4)).sum <= budget)
  }

  test("prf expansion: engages beyond the literal query and keeps score ordering sane") {
    import graft.operators.RetrievalOps
    val base = RetrievalOps.bm25TopK(spark, sf0001).collect()
    val exp = RetrievalOps.prfExpand(spark, sf0001).collect()
    assert(exp.nonEmpty)
    // scores strictly ordered by the (bm25 desc, doc_id) contract
    val scores = exp.map(r => (r.getDouble(1), r.getLong(0)))
    assert(scores.zip(scores.tail).forall { case ((a, ai), (b, bi)) =>
      a > b || (a == b && ai < bi) })
    // expansion engaged: some result matches more terms than the raw query
    // has, or the ranking moved vs the first pass
    val engaged =
      exp.exists(_.getLong(2) > RetrievalOps.QueryTerms.size) ||
        exp.map(_.getLong(0)).toSeq != base.map(_.getLong(0)).toSeq
    assert(engaged, "expanded pass is indistinguishable from the base query")
  }

  test("skyline: equals brute-force dominance on the driver; frontier is an antichain") {
    import graft.queries.AnalyticsQueries
    val pts = Tables.part(spark, sf0001)
      .selectExpr("p_partkey", "CAST(round(p_retailprice * 100) AS LONG) AS pc",
        "CAST(p_size AS LONG) AS sz")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    val brute = pts.filter(p => !pts.exists(q => dominates(q, p))).map(_._1).toSet
    val got = AnalyticsQueries.skyline(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet == brute)
    for (a <- got; b <- got if a._1 != b._1) assert(!dominates(a, b), s"$a dominates $b")
  }

  test("cusum: leading above-mean run registers from day one (empty prefix in the min)") {
    import spark.implicits._
    import graft.queries.AnalyticsQueries
    // counts (10, 1, 1): x = (18, -9, -9); Page gives s = (18, 9, 0) — a
    // prefix-min WITHOUT P₀ = 0 would report s₁ = 0 and miss the shift
    val daily = Seq((dt("2024-01-01"), 10L), (dt("2024-01-02"), 1L),
      (dt("2024-01-03"), 1L)).toDF("dt", "n")
    val got = AnalyticsQueries.cusumOver(daily).collect()
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    assert(got == Map("2024-01-01" -> 18L, "2024-01-02" -> 9L, "2024-01-03" -> 0L), got)
  }

  test("cusum: closed form equals the sequential recurrence; non-negative everywhere") {
    import graft.queries.AnalyticsQueries
    val rows = AnalyticsQueries.wCusum(spark, sf0001).collect()
      .sortBy(_.getDate(0).toString)
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 0L))
    // replay Page's recurrence s_i = max(0, s_{i-1} + x_i) sequentially on
    // the driver — the distributed P − prefixMin(P) form must match exactly
    val t = rows.map(_.getLong(1)).sum
    val nd = rows.length.toLong
    var s = 0L
    for (r <- rows) {
      s = math.max(0L, s + (r.getLong(1) * nd - t))
      assert(r.getLong(2) == s, s"${r.getDate(0)}: closed=${r.getLong(2)} seq=$s")
      assert(r.getBoolean(3) == (s > t))
    }
  }

  test("curation funnel: monotone survivors, drops conserve, stages in order") {
    import graft.queries.PipelineQueries
    val rows = PipelineQueries.curationFunnel(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("0_corpus", "1_exact_dedup", "2_quality", "3_decontaminate", "4_dsir_select"))
    val ns = rows.map(_.getLong(1))
    assert(ns.head == Tables.documents(spark, sf0001).count())
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a }, ns.toSeq)
    // conservation: survivors at the end + every stage's drops = the corpus
    assert(ns.last + rows.map(_.getLong(2)).sum == ns.head)
    assert(rows.head.getLong(2) == 0L)
    // the funnel must actually cut something on this corpus
    assert(ns.last < ns.head)
  }

  test("vwap and candles: vwap sits inside the candle range, OHLC invariants hold") {
    import graft.operators.TimeSeriesOps
    val candleRows = TimeSeriesOps.candles(spark, sf0001).collect()
    assert(candleRows.nonEmpty)
    for (r <- candleRows) {
      val (o, c, h, l) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(l <= o && o <= h && l <= c && c <= h, r)
      // flags replay from the row's own cents
      assert(r.getBoolean(6) == (math.abs(c - o) * 10 <= h - l), r)
    }
    val candleMap = candleRows
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> (r.getLong(4), r.getLong(5))).toMap
    val vwapRows = TimeSeriesOps.vwap(spark, sf0001).collect()
    assert(vwapRows.map(r => (r.getLong(0), r.getTimestamp(1))).toSet == candleMap.keySet)
    for (r <- vwapRows if !r.isNullAt(4)) {
      val (h, l) = candleMap((r.getLong(0), r.getTimestamp(1)))
      val v = r.getDouble(4)
      // a volume-weighted mean of prices in [low, high] stays in [low, high]
      assert(v >= l / 100.0 - 1e-9 && v <= h / 100.0 + 1e-9, s"$r vs [$l,$h]")
    }
  }

  test("token_entropy: closed forms, SQL path agrees, non-array input rejected") {
    import spark.implicits._
    import graft.catalyst.HashFunctions
    graft.catalyst.GraftExtensions.register(spark)
    val df = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "a a b b"))
      .toDF("id", "text")
      .select(col("id"), split(trim(col("text")), "\\s+").as("toks"))
    val got = df.select(col("id"), HashFunctions.token_entropy(col("toks")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // micro-nat quantization leaves ≤ ~5e-7 per term — closed forms to 1e-6
    assert(math.abs(got(1L)) < 1e-6)                    // one symbol: 0 nats
    assert(math.abs(got(2L) - math.log(4)) < 1e-6)      // uniform over 4
    assert(math.abs(got(3L) - math.log(2)) < 1e-6)      // ln4 − (2·2ln2)/4
    df.createOrReplaceTempView("te_probe")
    val viaSql = spark.sql(
      "SELECT token_entropy(toks) FROM te_probe WHERE id = 3").head().getDouble(0)
    assert(viaSql == got(3L))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq(1, 2)).toDF("a")
        .select(HashFunctions.token_entropy(col("a"))).collect()
    }
    assert(e.getMessage.contains("token_entropy"), e.getMessage)
  }

  test("triplet mining: positive shares the query's label, negative never does") {
    import graft.operators.SimilarityOps
    val labelOf = Tables.embeddings(spark, sf0001).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SimilarityOps.tripletMine(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (qid, lbl, posId, negId) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(4))
      assert(labelOf(qid) == lbl)
      assert(labelOf(posId) == lbl, s"positive $posId label mismatch for $qid")
      assert(labelOf(negId) != lbl, s"negative $negId shares label of $qid")
      assert(posId != qid && negId != qid)
      // margin is exactly the round-4 difference of the two legs
      assert(r.getDouble(6) ==
        BigDecimal(r.getDouble(3) - r.getDouble(5))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("shuffle shard: manifest is deterministic, covers the corpus; written shards are key-sorted") {
    import graft.queries.PipelineQueries
    val m1 = PipelineQueries.shuffleShard(spark, sf0001).collect()
    val m2 = PipelineQueries.shuffleShard(spark, sf0001).collect()
    assert(m1.toSeq == m2.toSeq) // same seed ⇒ identical permutation
    // a different seed is a genuinely different epoch permutation
    val m3 = PipelineQueries.shuffleShard(spark, sf0001, seed = "epoch2").collect()
    assert(m3.map(_.getString(3)).toSeq != m1.map(_.getString(3)).toSeq)
    assert(m3.map(_.getLong(1)).sum == m1.map(_.getLong(1)).sum) // same corpus
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(m1.map(_.getLong(1)).sum == nDocs)
    assert(m1.forall(r => { val s = r.getInt(0); s >= 0 && s < 16 }))

    val out = tmpDir("shufshard")
    PipelineQueries.writeShuffleShards(spark, sf0001, out)
    val back = spark.read.parquet(out)
    assert(back.count() == nDocs)
    // every shard's doc count matches its manifest row, and within each
    // shard the file order IS the shuffle-key order (the training read order)
    val byShard = back.select("shard", "skey", "doc_id").collect()
      .groupBy(_.getInt(0))
    val manifest = m1.map(r => r.getInt(0) -> r).toMap
    assert(byShard.keySet == manifest.keySet)
    for ((sh, rows) <- byShard) {
      assert(rows.length == manifest(sh).getLong(1), s"shard $sh size")
      val keys = rows.map(_.getString(1)).toSeq
      assert(keys == keys.sorted, s"shard $sh not in key order")
      val first = rows.minBy(r => (r.getString(1), r.getLong(2).toString))
      assert(manifest(sh).getString(3) ==
        s"${first.getString(1)}|${first.getLong(2)}", s"shard $sh first_doc")
    }
  }
}
