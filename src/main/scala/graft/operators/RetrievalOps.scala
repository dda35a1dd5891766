package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Sparse-retrieval operators over the document corpus: BM25 ranking
  * through the posting-list (inverted-index) shape — the standard lexical
  * leg of corpus search, RAG retrieval, and benchmark-decontamination
  * lookup.
  *
  * 100 TB design: nothing here is query-side quadratic. Corpus statistics
  * (N, avgdl) are one partial-aggregable pass; per-(doc, term) postings are
  * built by explode→filter→groupBy restricted to the QUERY terms (documents
  * without any query term are skipped before exploding via an `exists`
  * pushdown); document frequencies and corpus stats join back by BROADCAST
  * (|query terms| rows and 1 row respectively); the final top-k is
  * `TakeOrderedAndProject` — per-partition bounded heaps merged on the
  * driver, never a global sort. A production deployment materializes the
  * posting lists once ([[postings]]) and serves many queries from them;
  * [[bm25TopK]] composes the same plan end-to-end for a single query.
  *
  * Cross-engine determinism (DuckDB oracle): tf/df/dl/N are exact
  * integers; the only transcendental (`ln` in idf) is rounded to 6
  * decimals; per-term partial scores are summed as DECIMAL(18,6) — exact
  * and order-independent — and every double expression is written with
  * identical literals and association order in both engines (constants are
  * pre-folded: 2.2, 0.25, not k1+1, 1−b).
  */
object RetrievalOps {

  /** BM25 parameters (the universal defaults) and the demo query. */
  val K1 = 1.2
  val B  = 0.75
  val QueryTerms: Seq[String] = Seq("vector", "window", "fast", "key")

  /** Per-(doc_id, term, dl) posting rows restricted to `terms`. The
    * `exists` prefilter skips non-matching documents before the explode —
    * at corpus scale most documents match no query term, so the explode
    * fan-out only pays for candidates.
    */
  def postings(s: SparkSession, d: String, terms: Seq[String]): DataFrame = {
    val base = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
      .filter(exists(col("toks"), t => t.isInCollection(terms)))
    base.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(terms))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
  }

  /** Top-`k` documents by BM25 for [[QueryTerms]]:
    * `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`,
    * `score = Σ_t idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
    */
  def bm25TopK(s: SparkSession, d: String, k: Int = 15): DataFrame =
    bm25For(s, d, QueryTerms, k)

  /** The scorer for ANY term set — [[bm25TopK]] binds the demo query;
    * [[prfExpand]] re-enters with the expanded one. */
  def bm25For(s: SparkSession, d: String, terms: Seq[String], k: Int): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("dl"))
    val stats = docs.agg(
      count(lit(1)).as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = postings(s, d, terms)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val partial = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        round(
          log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            ((col("tf") * lit(2.2)) /
              (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))),
          6).cast("decimal(18,6)"))
    partial.groupBy("doc_id")
      .agg(sum("s").cast("double").as("bm25"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Pseudo-relevance feedback (RM1-lite query expansion): run the query,
    * mine the top-[[PrfExpansionTerms]] non-query terms from the
    * top-[[PrfFeedbackDocs]] feedback documents (count desc, term asc — a
    * total order), and re-score with the expanded term set — the classic
    * recall lever when the literal query under-describes the need.
    *
    * The expansion term set is a BOUNDED driver collect
    * ([[PrfExpansionTerms]] rows — the kmeans-centroid contract); both
    * BM25 passes are the same [[bm25For]] plan (posting prefilter,
    * partial-aggregable tf/df, decimal-summed partials). The oracle
    * replays the whole two-pass loop in one SQL chain, so the expanded
    * scores hash-match end to end.
    */
  val PrfFeedbackDocs = 5
  val PrfExpansionTerms = 3
  def prfExpand(s: SparkSession, d: String, k: Int = 15): DataFrame = {
    val fb = bm25TopK(s, d, PrfFeedbackDocs).select("doc_id")
    val expansion = Tables.documents(s, d)
      .join(broadcast(fb), Seq("doc_id"))
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .filter(!col("term").isInCollection(QueryTerms))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(PrfExpansionTerms)
      .collect().map(_.getString(0)).toSeq
    bm25For(s, d, QueryTerms ++ expansion, k)
  }
  /** `lazy`: quotes [[bm25Cte]], declared later in this object. */
  lazy val prfExpandSql: String = {
    val termList = QueryTerms.map("'" + _ + "'").mkString(",")
    s"""WITH $bm25Cte,
       |fb AS (SELECT doc_id FROM (
       |  SELECT doc_id, CAST(sum(s) AS DOUBLE) AS bm25 FROM sc GROUP BY doc_id
       |  ORDER BY bm25 DESC, doc_id LIMIT $PrfFeedbackDocs)),
       |fbt AS (SELECT term FROM (
       |  SELECT term, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |        FROM documents JOIN fb USING (doc_id) WHERE text IS NOT NULL)
       |  WHERE term NOT IN ($termList)
       |  GROUP BY term ORDER BY c DESC, term LIMIT $PrfExpansionTerms)),
       |qt AS (SELECT term FROM fbt UNION SELECT unnest([$termList]) AS term),
       |tf2 AS (
       |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM docs)
       |  WHERE term IN (SELECT term FROM qt)
       |  GROUP BY 1, 2, 3),
       |df2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY 1),
       |sc2 AS (
       |  SELECT doc_id,
       |    CAST(round(
       |      ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
       |        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))),
       |      6) AS DECIMAL(18,6)) AS s
       |  FROM tf2 JOIN df2 USING (term) CROSS JOIN stats)
       |SELECT doc_id, CAST(sum(s) AS DOUBLE) AS bm25, CAST(count(*) AS BIGINT) AS n_terms
       |FROM sc2 GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin
  }

  /** Reciprocal-rank fusion of the lexical (BM25) and dense (cosine) legs —
    * the standard hybrid-retrieval combiner (`score = Σ_legs 1/(k0+rank)`,
    * k0 = 60): rank-based, so the two legs' incomparable score scales never
    * need calibration. Each leg is truncated to its top-[[LegK]] BEFORE
    * ranking — `TakeOrderedAndProject` (per-partition heaps, no global
    * sort), so the only windows in the plan run over ≤ [[LegK]] rows. The
    * dense leg is one broadcast query row against a map-only scan; the
    * fusion join holds ≤ 2·[[LegK]] rows. At 100 TB both legs are served
    * from materialized indexes ([[postings]]; an IVF/SQ8 route from
    * [[SimilarityOps]]) — the fusion stage is unchanged.
    *
    * Ranks carried in the output use 0 for "not retrieved by this leg"
    * (never NULL — cross-engine NULL hashing is undefined in the gate).
    */
  val LegK = 20
  val RrfK0 = 60
  def rrfFusion(s: SparkSession, d: String, k: Int = 15): DataFrame = {
    import graft.catalyst.HashFunctions.dot_product
    val wLex = Window.orderBy(col("bm25").desc, col("doc_id"))
    val lex = bm25TopK(s, d, LegK)
      .withColumn("r_lex", row_number().over(wLex))
      .select(col("doc_id"), col("r_lex"))

    val e = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(dot_product(col("embedding"), col("embedding"))))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("eq"), col("nrm").as("nq"))
    val wDense = Window.orderBy(col("cos").desc, col("doc_id"))
    val dense = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos",
        // a zero-norm embedding (failed encoder output) zeroes the
        // denominator: NULL cosine (NumOps.safeDiv contract), never an
        // ANSI DIVIDE_BY_ZERO. The explicit isNotNull filter (mirrored in
        // the oracle CTE) excludes such docs from fusion even when the
        // corpus has fewer than LegK finite-cosine candidates — without
        // it a NULL cosine is only pushed last by DESC ordering and could
        // still earn an r_dense rank on a small corpus
        round(graft.functions.NumOps.safeDiv(
          dot_product(col("embedding"), col("eq")),
          col("nrm") * col("nq")), 4))
      .filter(col("cos").isNotNull)
      .select(col("vec_id").as("doc_id"), col("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(LegK)
      .withColumn("r_dense", row_number().over(wDense))
      .select(col("doc_id"), col("r_dense"))

    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK0) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK0) + col("r_dense")), lit(0.0)), 6))
      .select(col("doc_id"), col("rrf"),
        coalesce(col("r_lex"), lit(0)).as("r_lex"),
        coalesce(col("r_dense"), lit(0)).as("r_dense"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** The BM25 scoring CTE chain (through `sc`), shared VERBATIM by
    * [[bm25TopKSql]] and [[rrfFusionSql]] so the two oracles can never
    * desynchronize from each other (the Spark side already shares
    * [[bm25TopK]]).
    */
  private val bm25Cte: String = {
    val termList = QueryTerms.map("'" + _ + "'").mkString(",")
    s"""p AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |docs AS (SELECT doc_id, len(toks) AS dl, toks FROM p),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
       |  FROM docs),
       |tf AS (
       |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM docs)
       |  WHERE term IN ($termList)
       |  GROUP BY 1, 2, 3),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |sc AS (
       |  SELECT doc_id,
       |    CAST(round(
       |      ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
       |        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))),
       |      6) AS DECIMAL(18,6)) AS s
       |  FROM tf JOIN df USING (term) CROSS JOIN stats)""".stripMargin
  }

  val rrfFusionSql: String = {
    s"""WITH $bm25Cte,
       |bt AS (
       |  SELECT doc_id, CAST(sum(s) AS DOUBLE) AS bm25
       |  FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT $LegK),
       |lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
       |  FROM bt),
       |e AS (SELECT vec_id, embedding,
       |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT embedding AS eq, nrm AS nq FROM e WHERE vec_id = 0),
       |dscored AS (
       |  SELECT doc_id, cos FROM (
       |    SELECT c.vec_id AS doc_id,
       |      round(list_sum(list_transform(generate_series(1, 64),
       |            i -> c.embedding[i]::DOUBLE * q.eq[i]::DOUBLE)) / (c.nrm * q.nq), 4) AS cos
       |    FROM e c CROSS JOIN q WHERE c.vec_id <> 0)
       |  WHERE cos IS NOT NULL
       |  ORDER BY cos DESC, doc_id LIMIT $LegK),
       |dense AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r_dense
       |  FROM dscored)
       |SELECT COALESCE(l.doc_id, de.doc_id) AS doc_id,
       |  round(COALESCE(1.0::DOUBLE / ($RrfK0 + l.r_lex), 0.0) +
       |        COALESCE(1.0::DOUBLE / ($RrfK0 + de.r_dense), 0.0), 6) AS rrf,
       |  CAST(COALESCE(l.r_lex, 0) AS INT) AS r_lex,
       |  CAST(COALESCE(de.r_dense, 0) AS INT) AS r_dense
       |FROM lex l FULL OUTER JOIN dense de ON l.doc_id = de.doc_id
       |ORDER BY rrf DESC, doc_id LIMIT 15""".stripMargin
  }

  val bm25TopKSql: String =
    s"""WITH $bm25Cte
       |SELECT doc_id, CAST(sum(s) AS DOUBLE) AS bm25,
       |  CAST(count(*) AS BIGINT) AS n_terms
       |FROM sc GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin

  /** nDCG@k of the BM25 ranking against a term-coverage gold standard
    * (graded relevance = distinct query terms matched — the standard
    * surrogate when no engagement labels exist; Järvelin & Kekäläinen
    * 2002's measure, public). DCG terms use the exponential-gain form
    * `(2^g − 1)/log₂(rank+1)`, each round-6 and DECIMAL-summed; IDCG
    * re-ranks the same result list by gain (gain-desc, doc_id tiebreak).
    * Ranks come from bounded self-joins over the k-row result — the
    * [[graft.queries.AnalyticsQueries.skyline]] discipline, no
    * partition-less window; 2^g is exact in doubles for small integer
    * gains. One output row: the retrieval stack's quality number.
    */
  def ndcgEval(s: SparkSession, d: String, k: Int = 15): DataFrame = {
    val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val top = bm25TopK(s, d, k).localCheckpoint(true) // k rows, 3 consumers
    val o = top.select(col("doc_id").as("d2"), col("bm25").as("b2"),
      col("n_terms").as("g2"))
    val ranked = top.join(broadcast(o),
        col("b2") > col("bm25") ||
          (col("b2") === col("bm25") && col("d2") < col("doc_id")), "left")
      .groupBy("doc_id", "bm25", "n_terms")
      .agg((count(col("d2")) + 1).as("rnk"))
    val ideal = top.join(broadcast(o),
        col("g2") > col("n_terms") ||
          (col("g2") === col("n_terms") && col("d2") < col("doc_id")), "left")
      .groupBy("doc_id", "n_terms")
      .agg((count(col("d2")) + 1).as("irnk"))
    def term(g: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
      round((pow(lit(2.0), g.cast("double")) - 1) / log2(r.cast("double") + 1), 6)
        .cast(D6)
    val dcg = ranked.agg(sum(term(col("n_terms"), col("rnk")))
      .cast("double").as("dcg"))
    val idcg = ideal.agg(sum(term(col("n_terms"), col("irnk")))
      .cast("double").as("idcg"))
    // a query with NO relevant documents has IDCG = 0: nDCG is undefined
    // → NULL (NumOps.safeDiv contract), never an ANSI DIVIDE_BY_ZERO
    dcg.crossJoin(broadcast(idcg))
      .select(lit(k.toLong).as("k"), col("dcg"), col("idcg"),
        round(graft.functions.NumOps.safeDiv(col("dcg"), col("idcg")), 6)
          .as("ndcg"))
  }
  lazy val ndcgEvalSql: String =
    s"""WITH $bm25Cte,
       |topk AS (SELECT doc_id, CAST(sum(s) AS DOUBLE) AS bm25,
       |           CAST(count(*) AS BIGINT) AS g
       |         FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 15),
       |r AS (SELECT g, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk,
       |             row_number() OVER (ORDER BY g DESC, doc_id) AS irnk FROM topk),
       |dd AS (SELECT
       |    CAST(sum(CAST(round((power(2, g) - 1) / log2(rnk + 1), 6) AS DECIMAL(18,6))) AS DOUBLE) AS dcg,
       |    CAST(sum(CAST(round((power(2, g) - 1) / log2(irnk + 1), 6) AS DECIMAL(18,6))) AS DOUBLE) AS idcg
       |  FROM r)
       |SELECT CAST(15 AS BIGINT) AS k, dcg, idcg, round(dcg / idcg, 6) AS ndcg
       |FROM dd""".stripMargin
}
