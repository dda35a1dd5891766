package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Model-based quality filtering — the "does this document look like the
  * curated distribution" classifier every large pretraining pipeline runs
  * (the GPT-3 / CCNet recipe: fit a cheap linear classifier on
  * curated-vs-crawl labels, score the crawl, keep by score).
  *
  * Two halves, split by what each engine is good at:
  *
  *  - [[train]]: distributed batch gradient descent for logistic
  *    regression, the canonical iterative-ML-on-Spark shape — features are
  *    standardized in ONE aggregate pass, the standardized design matrix is
  *    cached once, and every GD step is a single `treeAggregate` whose
  *    partial state is `D+2` doubles (gradient + bias + loss). No shuffle
  *    anywhere: map-side partials combine up a depth-2 tree, the driver
  *    holds O(D) state, and weights ship back task-side as closure
  *    literals. At 100 TB the per-step cost is one pass over the cached
  *    (spillable) feature RDD; D is a small constant, so driver memory and
  *    network are independent of corpus size.
  *  - [[score]] / [[lrFunnel]]: scoring is a pure per-row projection
  *    (codegen'd arithmetic, zero shuffles); the funnel aggregates the
  *    keep-decision per source through a partial-aggregable groupBy.
  *
  * Cross-engine determinism (the funnel is oracled in DuckDB): every
  * feature is pure IEEE-754 arithmetic over integer counts — `sqrt`
  * (correctly rounded by IEEE), division, multiply, add in a fixed
  * left-associated order — no libm-dependent transcendentals (`exp` stays
  * out of the oracled path; the linear score `z` is monotone in the
  * sigmoid, so thresholding z IS thresholding probability). Per-source
  * means sum `round(z, 6)` as DECIMAL(18,6), exact and order-independent.
  *
  * The trainer itself is spec-verified (accuracy, monotone loss descent,
  * bounded driver state) rather than oracled: float gradient sums across
  * partitions are not bit-reproducible cross-engine, and no SQL engine
  * expresses the iteration loop.
  */
object QualityClassifier {

  /** Feature surface: six per-document text statistics, each exact integer
    * counts combined with IEEE-exact arithmetic. On the synthetic corpus
    * only length / stopword ratio / token length carry signal, but the
    * surface is the generic one a real crawl-filter uses.
    */
  val featureNames: Seq[String] =
    Seq("f_len", "f_punct", "f_stop", "f_toklen", "f_digit", "f_caps")

  private val stopwords =
    Seq("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")

  /** Raw feature expressions over a `text` column. Kept in lock-step with
    * the DuckDB mirror in [[lrFunnelSql]] — same counts, same `greatest`
    * guards, same division order.
    */
  def featureExprs: Seq[Column] = {
    val n    = length(trim(col("text")))
    val toks = split(trim(col("text")), "\\s+")
    val ntok = size(toks)
    Seq(
      sqrt(n).as("f_len"),
      (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
        greatest(n, lit(1))).as("f_punct"),
      (size(filter(toks, x => x.isInCollection(stopwords))).cast("double") /
        greatest(ntok, lit(1))).as("f_stop"),
      ((n - (ntok - 1)).cast("double") / greatest(ntok, lit(1))).as("f_toklen"),
      (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
        greatest(n, lit(1))).as("f_digit"),
      (length(regexp_replace(col("text"), "[^A-Z]", "")).cast("double") /
        greatest(n, lit(1))).as("f_caps"))
  }

  /** A trained model: weights over STANDARDIZED features, plus the
    * standardization constants so scoring is self-contained. `losses` is
    * the mean log-loss after each step (length = iters) — monotone
    * decreasing for any `lr` below the logistic Lipschitz bound.
    */
  final case class LRModel(
      weights: Array[Double], bias: Double,
      featMeans: Array[Double], featScales: Array[Double],
      losses: Array[Double]) {
    require(weights.length == featureNames.length)
  }

  /** Batch-GD logistic regression on `docs` (must have a `text` column);
    * `label` is any boolean/numeric column evaluating to 0/1. Null-text
    * rows are excluded (they have no features). Default `lr = 1.0` is below
    * the descent bound for standardized features (λ_max ≤ (D+1)/4), so the
    * loss curve is guaranteed monotone.
    */
  def train(docs: DataFrame, label: Column, iters: Int = 50,
      lr: Double = 1.0): LRModel = {
    val d = featureNames.length
    val base = docs.filter(col("text").isNotNull)
      .select(label.cast("double").as("y") +: featureExprs: _*)

    // one pass for standardization moments (map-side partial aggregate)
    val momentAggs = featureNames.flatMap(f =>
      Seq(avg(col(f)).as(s"m_$f"), stddev_pop(col(f)).as(s"s_$f")))
    val mRow   = base.agg(momentAggs.head, momentAggs.tail: _*).first()
    val means  = Array.tabulate(d)(i => mRow.getDouble(2 * i))
    val scales = Array.tabulate(d)(i => math.max(mRow.getDouble(2 * i + 1), 1e-9))

    val data = base.rdd.map { r =>
      val y = r.getDouble(0)
      val x = Array.tabulate(d)(i => (r.getDouble(i + 1) - means(i)) / scales(i))
      (y, x)
    }.persist(StorageLevel.MEMORY_AND_DISK_SER)
    val n = data.count().toDouble
    require(n > 0, "train: no non-null-text rows")

    val w = new Array[Double](d)
    var b = 0.0
    val losses = new Array[Double](iters)
    var t = 0
    while (t < iters) {
      val cw = w.clone(); val cb = b // snapshot: tasks see this step's weights
      // partial state: d gradient components + bias gradient + loss sum
      val (grad, lossSum) = data.treeAggregate((new Array[Double](d + 1), 0.0))(
        seqOp = { case ((g, l), (y, x)) =>
          var z = cb; var i = 0
          while (i < d) { z += cw(i) * x(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val e = p - y
          i = 0
          while (i < d) { g(i) += e * x(i); i += 1 }
          g(d) += e
          val pc = math.min(math.max(p, 1e-12), 1.0 - 1e-12)
          (g, l - (y * math.log(pc) + (1.0 - y) * math.log(1.0 - pc)))
        },
        combOp = { case ((g1, l1), (g2, l2)) =>
          var i = 0
          while (i < g1.length) { g1(i) += g2(i); i += 1 }
          (g1, l1 + l2)
        },
        depth = 2)
      var i = 0
      while (i < d) { w(i) -= lr * grad(i) / n; i += 1 }
      b -= lr * grad(d) / n
      losses(t) = lossSum / n
      t += 1
    }
    data.unpersist(blocking = false)
    LRModel(w.clone(), b, means, scales, losses)
  }

  /** Adds `quality_z` (linear score) and `quality_p` (sigmoid) to `docs`.
    * Pure per-row projection; null text yields null scores (no fabricated
    * features). Standardization folds into the plan as literals, so the
    * whole thing codegens into one stage.
    */
  def score(docs: DataFrame, m: LRModel): DataFrame = {
    val withF = docs.select((col("*") +: featureExprs): _*)
    val z = featureNames.zipWithIndex.foldLeft(lit(m.bias)) { case (acc, (f, i)) =>
      acc + lit(m.weights(i)) * ((col(f) - lit(m.featMeans(i))) / lit(m.featScales(i)))
    }
    withF.withColumn("quality_z", z)
      .withColumn("quality_p", lit(1.0) / (lit(1.0) + exp(-col("quality_z"))))
      .drop(featureNames: _*)
  }

  // ---- oracled fixed-weight funnel ------------------------------------

  /** Published weights for the oracled funnel — stand-ins for a model
    * trained offline (exactly how a production pipeline ships a frozen
    * quality classifier). Raw-feature weights, bias first.
    */
  private val W = Array(0.04, 2.0, 8.0, 0.05, 1.0, 1.0)
  private val Bias = -1.0
  private val Tau  = 0.45

  /** Frozen-model score per document (`doc_id`, `zr`) — the reusable
    * keep-decision building block ([[graft.queries.PipelineQueries]]'s
    * curation funnel filters on `zr > KeepTau`). Null-text docs have no
    * features and no row — they fail the quality stage by absence.
    */
  def frozenScores(docs: DataFrame): DataFrame = {
    val f = docs.filter(col("text").isNotNull)
      .select(col("doc_id") +: featureExprs: _*)
    val z = featureNames.zipWithIndex.foldLeft(lit(Bias)) { case (acc, (fn, i)) =>
      acc + lit(W(i)) * col(fn)
    }
    f.withColumn("zr", round(z, 6)).select("doc_id", "zr")
  }
  def KeepTau: Double = Tau

  /** The frozen-model per-row score as oracle SQL, keyed by `key`
    * (`source` for [[lrFunnelSql]], `doc_id` for the curation funnel) —
    * one text, two consumers, so the engines can never drift apart.
    */
  private[graft] def zrSql(key: String): String = {
    val stopList = stopwords.map("'" + _ + "'").mkString(",")
    s"""SELECT $key,
       |    round(-1.0
       |      + 0.04 * sqrt(length(trim(text)))
       |      + 2.0 * (CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
       |               / greatest(length(trim(text)), 1))
       |      + 8.0 * (CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                                    x -> x IN ($stopList))) AS DOUBLE)
       |               / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1))
       |      + 0.05 * (CAST(length(trim(text)) - (len(regexp_split_to_array(trim(text), '\\s+')) - 1) AS DOUBLE)
       |               / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1))
       |      + 1.0 * (CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
       |               / greatest(length(trim(text)), 1))
       |      + 1.0 * (CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
       |               / greatest(length(trim(text)), 1)), 6) AS zr
       |  FROM documents WHERE text IS NOT NULL""".stripMargin
  }

  /** Per-source quality funnel under the frozen model: how many documents
    * each source contributes and how many survive the score threshold —
    * the report a data-mixing decision reads. One partial-aggregable
    * groupBy over a codegen'd projection; the scan reads only
    * (text, source).
    */
  def lrFunnel(s: SparkSession, d: String): DataFrame = {
    val f = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("source") +: featureExprs: _*)
    val z = featureNames.zipWithIndex.foldLeft(lit(Bias)) { case (acc, (fn, i)) =>
      acc + lit(W(i)) * col(fn)
    }
    f.withColumn("zr", round(z, 6))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("zr") > Tau, 1L).otherwise(0L)).as("n_keep"),
        (sum(col("zr").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("avg_z"))
      .orderBy("source")
  }

  val lrFunnelSql: String =
    s"""WITH z AS (
       |${zrSql("source")})
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN zr > 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  CAST(sum(CAST(zr AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_z
       |FROM z GROUP BY source ORDER BY source""".stripMargin
}
