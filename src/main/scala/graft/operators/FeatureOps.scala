package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Corpus-level feature/compliance audits for the training-data pipeline:
  * chi-square term selection (which vocabulary discriminates a document
  * class — the classic feature-selection step ahead of a classifier like
  * [[QualityClassifier]]) and a k-anonymity generalization ladder (which
  * quasi-identifier resolution each row can be released at — the privacy
  * audit a corpus passes before rows with user-derived attributes ship).
  *
  * Both are pure partial-aggregable group-by pyramids — no windows, no
  * driver state, nothing all-pairs.
  */
object FeatureOps {

  /** χ² term–class association over the document corpus, positive class =
    * English documents. Per term with document frequency `df` and positive
    * document frequency `a`, the 2×2 contingency table against the class
    * totals (P positives, N−P negatives) gives
    * `χ² = n·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))` — computed from exact
    * integer counts, with the float ops confined to one fixed-shape
    * product/division chain (IEEE ops are deterministic; only libm
    * functions are engine-dependent, and there are none here).
    *
    * Plan: one data-scale shuffle (per-term partial counts), a broadcast
    * of the 1-row class totals, then top-k by (χ², term) through
    * `TakeOrderedAndProject` — no global sort. At 100 TB the term table is
    * vocabulary-sized, orders below the corpus.
    */
  def chi2Terms(s: SparkSession, d: String, k: Int = 100): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("text"), (col("lang") === "en").cast("long").as("y"))
    val totals = docs.agg(count(lit(1)).as("n"), sum("y").as("pos"))
    val perTerm = docs
      .select(col("y"), explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("y").as("pos_df"))
    perTerm.crossJoin(broadcast(totals))
      // b = negatives with term, cc = positives without, dd = negatives without
      .withColumn("b", col("df") - col("pos_df"))
      .withColumn("cc", col("pos") - col("pos_df"))
      .withColumn("dd", col("n") - col("pos") - col("b"))
      // a term in EVERY document carries no signal and divides by zero;
      // same for a single-class corpus (pos = 0 or n ⇒ chi2 = 0/0 = NaN)
      .filter(col("df") < col("n") && col("pos") > 0 && col("pos") < col("n"))
      // exact integer cross-product difference, ONE cast to double after
      .withColumn("delta",
        (col("pos_df") * col("dd") - col("b") * col("cc")).cast("double"))
      .withColumn("chi2",
        col("n").cast("double") * col("delta") * col("delta") /
          (col("df").cast("double") * (col("n") - col("df")).cast("double") *
            col("pos").cast("double") * (col("n") - col("pos")).cast("double")))
      .select("term", "df", "pos_df", "chi2")
      .orderBy(col("chi2").desc, col("term"))
      .limit(k)
  }

  /** Oracle mirrors the exact integer contingency arithmetic and the SAME
    * left-associative float chain, so the doubles are bit-identical.
    * Parameterized by the same `k` as [[chi2Terms]] — the pair must move
    * together.
    */
  def chi2TermsSql(k: Int = 100): String =
    s"""WITH docs AS (SELECT text, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |              FROM documents),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      |        FROM docs),
      |t AS (SELECT y, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS term
      |      FROM docs),
      |pt AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
      |              CAST(sum(y) AS BIGINT) AS pos_df
      |       FROM t GROUP BY term),
      |x AS (SELECT term, df, pos_df, n, pos,
      |         CAST(pos_df * (n - pos - (df - pos_df))
      |              - (df - pos_df) * (pos - pos_df) AS DOUBLE) AS delta
      |      FROM pt, tot WHERE df < n AND pos > 0 AND pos < n)
      |SELECT term, df, pos_df,
      |       CAST(n AS DOUBLE) * delta * delta /
      |         (CAST(df AS DOUBLE) * CAST(n - df AS DOUBLE) *
      |          CAST(pos AS DOUBLE) * CAST(n - pos AS DOUBLE)) AS chi2
      |FROM x ORDER BY chi2 DESC, term LIMIT $k""".stripMargin

  val CoverK = 5

  /** Greedy maximum-coverage corpus selection: pick [[CoverK]] documents
    * maximizing the union of covered 3-word shingles — the
    * facility-location subset-selection shape (data-mixing / eval-set
    * curation) with the classic (1 − 1/e) greedy guarantee. The coverage
    * unit is the SHINGLE, not the unigram: this corpus's unigram
    * vocabulary is 31 tokens (one document covers it all — a degenerate
    * trace), while its shingle space is ~16k at sf0.01. Marginal gains
    * are exact integer counts, ties resolve to the lowest doc id, so the
    * greedy trace replays bit-identically in the oracle's unrolled CTE
    * steps — same contract as [[SimilarityOps.mmrDiversify]].
    *
    * Scale shape: the doc→shingle explode (native codegen'd
    * [[TextOps.shingles3]]) is the only data-scale pass; each greedy step
    * is an anti-join of that table against the covered-shingle set
    * (selected-docs-sized, broadcast) plus one partial-aggregable
    * group-by. Driver state is ≤ k picked ids.
    */
  def greedyCover(s: SparkSession, d: String, k: Int = CoverK): DataFrame = {
    val toks = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"),
        explode(array_distinct(
          TextOps.shingles3(TextOps.tokens(col("text"))))).as("token"))
      .localCheckpoint(true) // reused k+1 times across the greedy steps
    var picks = Vector.empty[(Int, Long, Long, Long)]
    var selIds = Vector.empty[Long]
    var covered = 0L
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      // no .distinct() on the covered set (r19): left_anti semantics are
      // unchanged by duplicate build-side keys, so the per-step dedup
      // exchange + aggregate was pure overhead; and step 1's covered set
      // is EMPTY by construction — skip its scan + anti-join outright
      // (one fewer broadcast build against the full token table)
      val uncovered =
        if (selIds.isEmpty) toks
        else toks.filter(!col("doc_id").isin(selIds: _*))
          .join(broadcast(toks.filter(col("doc_id").isin(selIds: _*))
            .select("token")), Seq("token"), "left_anti")
      val gains = uncovered
        // count, not countDistinct: toks is explode(array_distinct(...)),
        // so (doc_id, token) rows are unique by construction and the
        // distinct-aggregate's extra dedup pass per greedy step is pure
        // overhead (same count, cheaper plan)
        .groupBy("doc_id").agg(count(lit(1)).as("gain"))
      val hit = gains.orderBy(col("gain").desc, col("doc_id")).limit(1).take(1)
      hit.headOption match {
        case Some(p) if p.getLong(1) > 0 =>
          covered += p.getLong(1)
          picks :+= ((step, p.getLong(0), p.getLong(1), covered))
          selIds :+= p.getLong(0)
          step += 1
        case _ => exhausted = true // nothing adds coverage — stop early
      }
    }
    import s.implicits._
    picks.toDF("rnk", "doc_id", "gain", "covered_tokens").orderBy("rnk")
  }

  /** Oracle replays the greedy trace as unrolled steps — each one an
    * anti-join of the token table against the covered set so far (plain
    * SQL, no lambdas). Generated from the same `k` as [[greedyCover]] so
    * the pair cannot drift. */
  def greedyCoverSql(k: Int = CoverK): String = {
    val steps = (2 to k).map { j =>
      s"""sel${j - 1} AS (${(1 until j).map(i => s"SELECT doc_id FROM p$i")
        .mkString(" UNION ALL ")}),
         |cov${j - 1} AS (SELECT DISTINCT token FROM toks
         |  WHERE doc_id IN (SELECT doc_id FROM sel${j - 1})),
         |g$j AS (SELECT t.doc_id, count(DISTINCT t.token) AS gain
         |  FROM toks t
         |  WHERE t.doc_id NOT IN (SELECT doc_id FROM sel${j - 1})
         |    AND t.token NOT IN (SELECT token FROM cov${j - 1})
         |  GROUP BY t.doc_id),
         |p$j AS (SELECT doc_id, gain FROM g$j WHERE gain > 0
         |        ORDER BY gain DESC, doc_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map(j =>
      s"SELECT $j AS rnk, doc_id, gain FROM p$j").mkString("\nUNION ALL\n")
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
       |           FROM documents),
       |toks AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(CASE WHEN len(tk) >= 3 THEN
       |      list_transform(generate_series(1, len(tk) - 2),
       |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
       |      ELSE [] END) AS token
       |  FROM t),
       |g1 AS (SELECT doc_id, count(DISTINCT token) AS gain FROM toks GROUP BY doc_id),
       |p1 AS (SELECT doc_id, gain FROM g1 WHERE gain > 0
       |       ORDER BY gain DESC, doc_id LIMIT 1),
       |$steps,
       |traced AS ($out)
       |SELECT rnk, doc_id, gain,
       |  CAST(sum(gain) OVER (ORDER BY rnk
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS covered_tokens
       |FROM traced ORDER BY rnk""".stripMargin
  }

  /** k-anonymity generalization ladder over the customer table's
    * quasi-identifiers. Level 0 releases the full QI tuple
    * (nation, segment, account-balance band); a row whose level-0 group
    * holds fewer than `k` members generalizes to level 1
    * (nation, segment), then level 2 (nation), then suppression (3).
    * Output: rows per (nation, required level) — the shape of a release
    * audit report.
    *
    * Plan: three partial-aggregable group-bys over progressively coarser
    * keys, joined back by those same keys (the level-0 join reuses its
    * aggregation partitioning; the coarser ones broadcast — group tables
    * shrink with the key). Nothing here exceeds group-count scale.
    */
  def kAnonymity(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
    // a row's level is a pure function of (n0, n1, n2), so the report
    // derives ENTIRELY from the group-sized g0 partials: g1/g2 roll up
    // from g0, join back on the coarser key prefixes (broadcast — they
    // only shrink), and n0 weights the level counts. The checkpoint pins
    // the "customer scanned once" contract — without it each of g0's four
    // consumers recomputes the subtree (measured: 5 scans, 1 reused
    // exchange) — and g0 is group-sized, so materializing it is free.
    val g0 = cust.groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("n0"))
      .localCheckpoint(true)
    val g1 = g0.groupBy("c_nationkey", "c_mktsegment").agg(sum("n0").as("n1"))
    val g2 = g1.groupBy("c_nationkey").agg(sum("n1").as("n2"))
    g0
      .join(broadcast(g1), Seq("c_nationkey", "c_mktsegment"))
      .join(broadcast(g2), Seq("c_nationkey"))
      .withColumn("level",
        when(col("n0") >= k, 0).when(col("n1") >= k, 1)
          .when(col("n2") >= k, 2).otherwise(3))
      .groupBy("c_nationkey", "level")
      .agg(sum("n0").as("n_rows"))
      .orderBy("c_nationkey", "level")
  }

  def kAnonymitySql(k: Int = 10): String =
    s"""WITH cust AS (SELECT c_custkey, c_nationkey, c_mktsegment,
       |                CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
       |              FROM customer),
       |g0 AS (SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS n0
       |       FROM cust GROUP BY 1, 2, 3),
       |g1 AS (SELECT c_nationkey, c_mktsegment, count(*) AS n1 FROM cust GROUP BY 1, 2),
       |g2 AS (SELECT c_nationkey, count(*) AS n2 FROM cust GROUP BY 1)
       |SELECT c_nationkey,
       |       CASE WHEN n0 >= $k THEN 0 WHEN n1 >= $k THEN 1
       |            WHEN n2 >= $k THEN 2 ELSE 3 END AS level,
       |       CAST(count(*) AS BIGINT) AS n_rows
       |FROM cust
       |JOIN g0 USING (c_nationkey, c_mktsegment, bal_band)
       |JOIN g1 USING (c_nationkey, c_mktsegment)
       |JOIN g2 USING (c_nationkey)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
