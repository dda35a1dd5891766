package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import graft.Tables
import graft.functions.TextOps

case class PipelineReport(input: Long, afterExact: Long, afterNearDup: Long,
                          afterQuality: Long, clusters: Long)

/** The end of the dedup story: near-dup PAIRS → duplicate CLUSTERS →
  * a deduplicated corpus, composed with quality filtering into the full
  * training-data preparation pipeline.
  *
  * Clustering is min-label propagation to a fixpoint (connected components):
  * each doc repeatedly adopts the smallest id among itself and its
  * neighbors. Iterations are driver-bounded (component diameter, log-ish
  * with doubling via self-join of the mapping); near-dup components are
  * tiny (pairs/triples), so 2–3 iterations close at any corpus size. Each
  * iteration is one shuffle join — the standard Spark connected-components
  * loop without bringing in a graph library.
  */
object DedupPipeline {

  /** Connected components over an undirected pair list
    * `(a_id, b_id)` → `(doc_id, cluster_id)` with cluster_id = min member id.
    * Only docs that appear in some pair are returned.
    *
    * Hybrid execution, same reasoning as broadcast joins: near-dup edge
    * sets are usually tiny relative to the corpus (pairs of near-identical
    * docs), so up to [[clusters]]' `localThreshold` edges the components
    * are solved with a driver-side union-find — one collect, zero iterative
    * jobs. Above it, the distributed pointer-jumping loop runs (each
    * iteration one shuffle join, lineage truncated per step). The local
    * fast path decodes ids as longs, so it is taken only for integral id
    * columns — any other id type routes to the distributed loop, which is
    * type-generic (min/least over the natural ordering).
    */
  def clusters(pairs: DataFrame, maxIters: Int = 10,
      localThreshold: Long = 100000): DataFrame = {
    val spark = pairs.sparkSession
    val sel = pairs.select(col("a_id"), col("b_id"))
    val integralIds = sel.schema.fields.forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    })
    if (integralIds) {
      // Probe with ONE job: pull at most cap+1 edges. Near-dup edge sets
      // are tiny relative to the corpus, so the common path executes the
      // (often expensive — shingling, LSH) pair plan exactly once, with no
      // checkpoint materialization and nothing left cached. Only an
      // over-cap edge set pays a second execution below. The cap clamps
      // Long thresholds to what a driver collect can hold — a threshold
      // beyond Int range routes to the distributed loop instead of
      // silently clustering a truncated edge sample.
      import spark.implicits._
      val cap = math.min(localThreshold, (Int.MaxValue - 1).toLong).toInt
      val probe = sel.select(col("a_id").cast("long"), col("b_id").cast("long"))
        .limit(cap + 1).as[(Long, Long)].collect()
      if (probe.length <= cap) return localClusters(spark, probe)
    }
    // materialize the pair source ONCE for the iterative path: the
    // undirected-edge union embeds the pair plan twice, and the cache
    // below would execute both branches
    val p = sel.localCheckpoint(true)
    val edges = p
      .union(p.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .distinct()
      .cache()
    // label(x) = min neighbor (or self) — then propagate
    var labels = edges.groupBy(col("a_id").as("doc_id"))
      .agg(least(min(col("b_id")), first(col("a_id"))).as("cluster_id"))
      .cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // adopt the least of: own label, neighbors' labels, and the label OF
      // the label (pointer jumping — doubles propagation distance per
      // iteration, so convergence is log(diameter), not diameter)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "b_id")
          .withColumnRenamed("cluster_id", "nb_label"), Seq("b_id"))
        .groupBy(col("a_id").as("doc_id"))
        .agg(min(col("nb_label")).as("nb_min"))
      val viaJump = labels
        .join(labels.select(col("doc_id").as("cluster_id"), col("cluster_id").as("jump")),
          Seq("cluster_id"))
        .select(col("doc_id"), col("jump"))
      // localCheckpoint truncates lineage: without it each iteration's plan
      // embeds all previous ones and the query plan grows exponentially
      // (the canonical iterative-Spark failure mode). The change flag rides
      // the same pass, so convergence detection is one tiny aggregation
      // over the checkpoint, not a second join over the inputs.
      val newLabel = least(col("cluster_id"),
        coalesce(col("nb_min"), col("cluster_id")),
        coalesce(col("jump"), col("cluster_id")))
      val next = labels
        .join(viaNeighbors, Seq("doc_id"), "left")
        .join(viaJump, Seq("doc_id"), "left")
        .select(col("doc_id"), newLabel.as("cluster_id"),
          (newLabel =!= col("cluster_id")).cast("long").as("chg"))
        .localCheckpoint(eager = true)
      val changed = next.agg(sum(col("chg"))).head().getLong(0)
      labels.unpersist()
      labels = next.select("doc_id", "cluster_id")
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** Driver-side union-find for edge sets under the local threshold:
    * path-halving find + union by min, then one pass to resolve every
    * member to its component minimum.
    */
  private def localClusters(spark: SparkSession, edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) {
        val p = parent(r)
        parent(r) = parent.getOrElse(p, p) // path halving
        r = parent(r)
      }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val byRoot = parent.keys.toSeq.groupBy(find)
    val out = byRoot.iterator.flatMap { case (_, members) =>
      val m = members.min
      members.map(x => (x, m))
    }.toSeq
    out.toDF("doc_id", "cluster_id").repartition(1)
  }

  /** Remove near-duplicates: keep the minimum doc_id of each cluster, keep
    * every unpaired doc. `pairs` is any near-dup pair source (Jaccard,
    * MinHash-LSH, SimHash, cosine).
    */
  def removeNearDups(docs: DataFrame, pairs: DataFrame): DataFrame =
    removeByClusters(docs, clusters(pairs))

  /** [[removeNearDups]] over an already-computed `(doc_id, cluster_id)`
    * mapping — lets a caller that also needs the clusters themselves (e.g.
    * [[prepare]]'s report) run the expensive pair plan exactly once.
    */
  def removeByClusters(docs: DataFrame, cl: DataFrame): DataFrame =
    docs.join(cl, Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .drop("cluster_id")

  /** The composed training-data pipeline over `documents`:
    * exact dedup → n-gram near-dup removal → quality filter → report.
    * Returns (cleaned corpus, report). Each stage is the already-verified
    * operator; this wires them in the order a 100 TB run uses (cheapest
    * filter first).
    */
  def prepare(s: SparkSession, d: String,
      jaccardThreshold: Double = 0.8,
      minTokens: Int = 5, maxStopRatio: Double = 0.9): (DataFrame, PipelineReport) = {
    val docs = Tables.documents(s, d)
    val input = docs.count()

    // 1. exact dedup (hash groupBy — cheapest, run first)
    val keepExact = DedupOps.exactDedup(s, d).select(col("keep_id").as("doc_id"))
    val exactDeduped = docs.join(keepExact, Seq("doc_id"), "left_semi")
    val afterExact = exactDeduped.count()

    // 2. near-dup removal via Jaccard pairs → clusters → canonical keeper
    // (clusters computed ONCE — the pair plan is the expensive part)
    val pairs = DedupOps.ngramJaccardPairs(s, d, jaccardThreshold)
    val cl = clusters(pairs)
    val nClusters = cl.select("cluster_id").distinct().count()
    val nearDeduped = removeByClusters(exactDeduped, cl)
    val afterNearDup = nearDeduped.count()

    // 3. quality filter (per-row projections, no shuffle)
    val toks = TextOps.tokens(col("text"))
    val quality = nearDeduped
      .withColumn("_n_tokens", size(toks))
      .withColumn("_n_stop", size(filter(toks,
        t => t.isInCollection(Seq("the", "a", "of", "and", "in", "to", "is")))))
      .filter(col("_n_tokens") >= minTokens &&
        col("_n_stop").cast("double") / greatest(col("_n_tokens"), lit(1)) <= maxStopRatio)
      .drop("_n_tokens", "_n_stop")
    val afterQuality = quality.count()

    (quality, PipelineReport(input, afterExact, afterNearDup, afterQuality, nClusters))
  }

  /** Keep-longest canonicalization over the near-dup clusters: per cluster
    * keep the document with the most characters (doc_id breaks ties) — the
    * removal POLICY real dedup passes apply (preserve the most complete
    * copy; ExactSubstr/C4 practice), where [[clusters]]' min-id output is
    * only the canonical LABEL. The argmax is one `max(struct(...))`
    * partial-aggregable fold — no per-cluster window, no second shuffle
    * beyond the groupBy(cluster).
    */
  def canonLongest(s: SparkSession, d: String): DataFrame = {
    val cl = clusters(DedupOps.ngramJaccardPairs(s, d))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("nc"))
    cl.join(docs, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("nc"), (-col("doc_id")).as("nd"))).as("m"))
      .select(col("cluster_id"), (-col("m.nd")).as("keep_doc"),
        col("m.nc").as("keep_chars"), col("n_members"),
        (col("n_members") - 1).as("n_dropped"))
      .orderBy("cluster_id")
  }
}
