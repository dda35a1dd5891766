package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k as the exact baseline, plus two sub-quadratic
  * scale paths — label-blocked near-dup and random-hyperplane LSH bucketing.
  *
  * Determinism: all dot products fold the 64-dim lists left-to-right after
  * widening each element to double (identical op order in the DuckDB oracle
  * SQL), and every reported similarity is rounded before it is used for
  * ordering, so cross-engine ranking ties break identically on vec_id.
  *
  * 100 TB design: brute force is O(n·q) and only the baseline; the LSH path
  * buckets both sides (one shuffle on bucket id, candidate set ≪ n), which is
  * the shape that survives a billion-vector corpus. The per-vector norm is
  * computed once and joined, not recomputed per pair.
  */
object SimilarityOps {

  val Dim = 64

  /** Left-to-right Σ a[i]·b[i] with double widening — matches the oracle.
    * Native codegen'd expression ([[graft.catalyst.DotProduct]]): the
    * interpreted `aggregate(zip_with(...))` lambda fold costs ~10× on the
    * pair-scoring inner loops.
    */
  private def dot(a: Column, b: Column): Column =
    graft.catalyst.HashFunctions.dot_product(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Round-4 cosine from a dot product and a norm product, with the
    * ZERO-NORM degenerate guarded: an all-zero embedding (a failed encoder
    * emits exactly that at corpus scale) zeroes the denominator, and the
    * raw division would ANSI-throw and kill the whole search. NULL instead
    * (the NumOps.safeDiv contract, = DuckDB's native x/0 → NULL), which
    * every downstream threshold filter / top-k ranking then drops — the
    * zero vector has no direction, so no cosine, in both engines.
    */
  private def cos4(dp: Column, nrmProduct: Column): Column =
    round(graft.functions.NumOps.safeDiv(dp, nrmProduct), 4)

  /** Exact cosine near-duplicates within label blocks (embedding-cosine
    * near-dup; label is the blocking key, standing in for any cheap
    * pre-cluster at scale).
    */
  def cosineNearDup(s: SparkSession, d: String, threshold: Double = 0.35): DataFrame = {
    // materialized once: both self-join sides read the checkpoint instead
    // of re-scanning + re-norming (persist(MEMORY_AND_DISK) at multi-node)
    val e = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      .localCheckpoint(true)
    val a = e.select(col("vec_id").as("a_id"), col("label"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("label"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("label")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", cos4(dot(col("ea"), col("eb")), col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "label", "cos")
      .orderBy("a_id", "b_id")
  }
  val cosineNearDupSql: String =
    """WITH e AS (SELECT vec_id, label, embedding,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label,
      |  round(list_sum(list_transform(generate_series(1, 64),
      |        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm), 4) + 0.0 AS cos
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_sum(list_transform(generate_series(1, 64),
      |        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm), 4) >= 0.35
      |ORDER BY a_id, b_id""".stripMargin

  val NumQueries = 8
  val TopK = 10

  /** Per-query top-k of scored candidates through the native bounded-heap
    * operator ([[graft.plans.TopKPerGroupExec]]), then rank the ≤ q·k
    * survivors with a window — the reduce-before-rank shape: the heap pass
    * keeps k rows per query with no per-group sort of the candidate set.
    */
  private def rankTopK(s: SparkSession, scored: DataFrame): DataFrame = {
    graft.catalyst.GraftExtensions.register(s)
    val top = graft.plans.NativeTopK.perGroup(
      scored.select("q_id", "c_id", "cos"),
      Seq("q_id"), Seq("cos" -> false, "c_id" -> true), TopK)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    top.withColumn("rnk", row_number().over(w))
      .select("q_id", "rnk", "c_id", "cos")
      .orderBy("q_id", "rnk")
  }

  /** Brute-force cosine top-k: query set = vec_id < [[NumQueries]], ranked by
    * (rounded cosine desc, candidate id asc). Exact baseline for recall
    * evaluation of the LSH variant.
    */
  def annBruteForce(s: SparkSession, d: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      .localCheckpoint(true)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("eq"), col("nrm").as("nq"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("ec"), col("nrm").as("nc"))
    val scored = q.crossJoin(c).filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", cos4(dot(col("eq"), col("ec")), col("nq") * col("nc")))
    rankTopK(s, scored)
  }
  val annBruteForceSql: String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    round(list_sum(list_transform(generate_series(1, 64),
       |          i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) / (q.nrm * c.nrm), 4) + 0.0 AS cos
       |  FROM e q JOIN e c ON q.vec_id < $NumQueries AND q.vec_id <> c.vec_id),
       |ranked AS (SELECT q_id, c_id, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk FROM scored)
       |SELECT q_id, rnk, c_id, cos FROM ranked WHERE rnk <= $TopK ORDER BY q_id, rnk""".stripMargin

  val NumPlanes = 6

  /** Fixed ±1 hyperplanes shared verbatim with the oracle SQL (no RNG — the
    * sign comes from an integer mix of (plane, dim, seed); at scale these
    * would be seeded Gaussian planes shipped as a broadcast literal the same
    * way). `seed` selects a different deterministic family (seed 0 = the
    * oracle's); for a fixed seed the families are NESTED — plane p is the
    * same regardless of how many planes are in use — which is what makes
    * recall monotone in the plane count (NativePlanPropertySpec pins that).
    *
    * The mix must make planes pairwise distinct: an earlier variant reduced
    * mod 3, which made plane p depend only on p mod 3 — planes 0/3, 1/4,
    * 2/5 were identical, so bits p and p+3 always agreed and every
    * Hamming-1 neighbor bucket was structurally EMPTY (multi-probe could
    * never add a candidate). Standard avalanche mixing (fibonacci-hash
    * constants + xor-shift) removes that degeneracy.
    */
  def planeWeight(p: Int, j: Int): Int = planeWeight(p, j, 0)
  def planeWeight(p: Int, j: Int, seed: Int): Int = {
    var h = j * 0x9E3779B9 + p * 0x85EBCA6B + seed * 0xC2B2AE35
    h ^= h >>> 16; h *= 0x45D9F3B; h ^= h >>> 13
    if ((h & 1) == 0) 1 else -1
  }

  private def planeDot(emb: Column, p: Int, seed: Int): Column =
    dot(emb, array((0 until Dim).map(j => lit(planeWeight(p, j, seed).toDouble)): _*))

  /** LSH-bucketed ANN: `numPlanes`-bit sign bucket per vector; candidates
    * share the query's bucket; exact cosine re-ranking within the bucket.
    * Defaults reproduce the oracled `s_ann_lsh` query exactly (single
    * probe, `probeBits = 0`).
    *
    * `probeBits` is the recall/cost dial: each query additionally probes
    * that many Hamming-1 neighbor buckets — the buckets reached by
    * flipping its LEAST-confident sign bits (smallest |plane·q|) first,
    * the multi-probe heuristic of Lv et al., VLDB 2007 (public). A vector
    * near a hyperplane is the one whose true neighbors fall on the other
    * side, so those flips recover the most recall per probed bucket.
    * Candidate sets are NESTED in `probeBits` (the per-query flip order is
    * fixed), which makes recall monotone non-decreasing and lets the
    * property spec pin it; cost is `probeBits + 1` bucket joins' worth of
    * candidates per query. At `probeBits = numPlanes` the whole Hamming-1
    * ball is probed regardless of confidence order.
    */
  def annLsh(s: SparkSession, d: String,
      numPlanes: Int = NumPlanes, seed: Int = 0, probeBits: Int = 0): DataFrame = {
    require(numPlanes >= 1, s"numPlanes must be >= 1, got $numPlanes")
    require(probeBits >= 0 && probeBits <= numPlanes,
      s"probeBits must be in [0, $numPlanes], got $probeBits")
    val bucketBits = (0 until numPlanes).map(p =>
      when(planeDot(col("embedding"), p, seed) > 0, lit(1 << p)).otherwise(lit(0)))
    val e = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"),
        bucketBits.reduce(_ + _).as("bucket"))
      .localCheckpoint(true)
    // (|plane·q|, bit) per plane, ascending — array_sort on the struct is
    // lexicographic, so ties break on the bit, deterministically
    val planeConf = array((0 until numPlanes).map(p =>
      struct(abs(planeDot(col("embedding"), p, seed)).as("conf"),
        lit(1 << p).as("bit"))): _*)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("eq"),
        col("nrm").as("nq"),
        explode(concat(
          array(col("bucket")),
          transform(slice(array_sort(planeConf), 1, probeBits),
            st => col("bucket").bitwiseXOR(st("bit"))))).as("bucket"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("ec"),
      col("nrm").as("nc"), col("bucket"))
    // no (q_id, c_id) pair appears twice: probed buckets are pairwise
    // distinct and every candidate lives in exactly one bucket
    val scored = q.join(c, Seq("bucket")).filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", cos4(dot(col("eq"), col("ec")), col("nq") * col("nc")))
    rankTopK(s, scored)
  }
  def annLshSql: String = {
    val planes = (0 until NumPlanes).map { p =>
      val ws = (0 until Dim).map(j => planeWeight(p, j)).mkString("[", ",", "]")
      s"CASE WHEN list_sum(list_transform(generate_series(1, $Dim), i -> embedding[i]::DOUBLE * ($ws)[i])) > 0 THEN ${1 << p} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding,
       |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm,
       |  $planes AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    round(list_sum(list_transform(generate_series(1, 64),
       |          i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) / (q.nrm * c.nrm), 4) + 0.0 AS cos
       |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id < $NumQueries AND q.vec_id <> c.vec_id),
       |ranked AS (SELECT q_id, c_id, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk FROM scored)
       |SELECT q_id, rnk, c_id, cos FROM ranked WHERE rnk <= $TopK ORDER BY q_id, rnk""".stripMargin
  }

  /** k-NN label propagation — the embedding-space classifier every corpus
    * pipeline runs to spread a small labeled set over unlabeled data
    * (quality labels, domain labels, dedup-cluster labels): each query
    * takes the majority label of its [[TopK]] nearest labeled neighbors,
    * ties broken deterministically (votes desc, label asc). Neighbor
    * search here is the exact form; at 100 TB swap the scored CTE for the
    * IVF/LSH/SQ8 candidate generation above — the vote is unchanged.
    * The top-k pass runs through the native bounded-heap operator.
    */
  def knnLabel(s: SparkSession, d: String): DataFrame = {
    graft.catalyst.GraftExtensions.register(s)
    val e = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      .localCheckpoint(true)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("eq"), col("nrm").as("nq"))
    // the labeled pool excludes the queries themselves (no self-votes)
    val c = e.filter(col("vec_id") >= NumQueries)
      .select(col("vec_id").as("c_id"), col("label"),
        col("embedding").as("ec"), col("nrm").as("nc"))
    val scored = q.crossJoin(c)
      .withColumn("cos", cos4(dot(col("eq"), col("ec")), col("nq") * col("nc")))
      .select("q_id", "c_id", "label", "cos")
    val top = graft.plans.NativeTopK.perGroup(
      scored, Seq("q_id"), Seq("cos" -> false, "c_id" -> true), TopK)
    val votes = top.groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("q_id").orderBy(col("votes").desc, col("label"))
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
      .orderBy("q_id")
  }
  val knnLabelSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding,
       |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS eq, nrm AS nq FROM e WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS c_id, label, embedding AS ec, nrm AS nc FROM e WHERE vec_id >= $NumQueries),
       |scored AS (
       |  SELECT q_id, c_id, label,
       |    round(list_sum(list_transform(generate_series(1, $Dim),
       |          i -> eq[i]::DOUBLE * ec[i]::DOUBLE)) / (nq * nc), 4) + 0.0 AS cos
       |  FROM q CROSS JOIN c),
       |top AS (SELECT q_id, label FROM (
       |  SELECT q_id, label, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk
       |  FROM scored) WHERE rnk <= $TopK),
       |v AS (SELECT q_id, label, CAST(count(*) AS BIGINT) AS votes FROM top GROUP BY q_id, label)
       |SELECT q_id, label AS pred_label, votes FROM (
       |  SELECT q_id, label, votes,
       |    row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS rn FROM v)
       |WHERE rn = 1 ORDER BY q_id""".stripMargin

  /** Contrastive TRIPLET MINING — the training-pair generator behind every
    * embedding fine-tune (sentence encoders, retrieval models): for each
    * query vector, its nearest SAME-label neighbor is the positive and its
    * nearest OTHER-label neighbor the hard negative; `margin` (positive
    * minus negative cosine) is the example's difficulty — small or
    * negative margins are exactly the triplets a contrastive loss learns
    * most from. Exact scorer over the bounded query set (the [[knnLabel]]
    * contract: the crossJoin is query-side-bounded; at corpus scale swap
    * in the IVF/LSH/SQ8 candidate generators — the mining logic on top is
    * unchanged). Queries whose label has no other member mine no positive
    * and are dropped (inner join) — same set in the oracle.
    */
  def tripletMine(s: SparkSession, d: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      .localCheckpoint(true)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("label").as("ql"),
        col("embedding").as("eq"), col("nrm").as("nq"))
    val c = e.select(col("vec_id").as("c_id"), col("label").as("cl"),
      col("embedding").as("ec"), col("nrm").as("nc"))
    val scored = q.crossJoin(c).filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", cos4(dot(col("eq"), col("ec")), col("nq") * col("nc")))
      .select("q_id", "ql", "c_id", "cl", "cos")
      .localCheckpoint(true) // both the positive and negative legs read it
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val pos = scored.filter(col("cl") === col("ql"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("ql").as("label"),
        col("c_id").as("pos_id"), col("cos").as("pos_cos"))
    val neg = scored.filter(col("cl") =!= col("ql"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("c_id").as("neg_id"), col("cos").as("neg_cos"))
    pos.join(neg, Seq("q_id"))
      .withColumn("margin", round(col("pos_cos") - col("neg_cos"), 4))
      .orderBy("q_id")
  }
  val tripletMineSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding,
       |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.label AS ql, c.vec_id AS c_id, c.label AS cl,
       |    round(list_sum(list_transform(generate_series(1, $Dim),
       |          i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) / (q.nrm * c.nrm), 4) + 0.0 AS cos
       |  FROM e q JOIN e c ON q.vec_id < $NumQueries AND q.vec_id <> c.vec_id),
       |pos AS (SELECT q_id, ql AS label, c_id AS pos_id, cos AS pos_cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
       |  FROM scored WHERE cl = ql) WHERE rn = 1),
       |neg AS (SELECT q_id, c_id AS neg_id, cos AS neg_cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
       |  FROM scored WHERE cl <> ql) WHERE rn = 1)
       |SELECT p.q_id, p.label, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos,
       |  round(p.pos_cos - n.neg_cos, 4) + 0.0 AS margin
       |FROM pos p JOIN neg n ON p.q_id = n.q_id ORDER BY p.q_id""".stripMargin

  val IvfProbes = 2

  /** Per-cell centroids with exact cross-engine arithmetic: each component is
    * CAST(sum(decimal(20,8)) AS DOUBLE)/count — order-insensitive, so Spark's
    * partial aggregation and DuckDB's single-threaded sum agree bitwise.
    * `label` is the coarse-quantizer cell assignment (at scale: k-means run
    * offline, assignments stored exactly like this column).
    */
  private def centroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy("label", "j")
      .agg((sum(col("x").cast("decimal(20,8)")).cast("double") / count(lit(1))).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("c")))),
        e => e.getField("c")).as("centroid"))

  /** IVF ANN: rank the `probes` nearest cells by query→centroid cosine,
    * then exact-search only those cells' members. The classic two-level
    * index: centroid table is tiny (broadcast), per-query work is
    * O(cells + probed members) instead of O(n). Probing EVERY cell
    * degenerates to the brute-force search (recall exactly 1) — the anchor
    * NativePlanPropertySpec uses. Defaults reproduce the oracled
    * `s_ann_ivf` query exactly.
    */
  def annIvf(s: SparkSession, d: String, probes: Int = IvfProbes): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      .localCheckpoint(true)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("eq"), col("nrm").as("nq"))
    val cent = centroids(s, d)
      .select(col("label"), col("centroid"),
        sqrt(dot(col("centroid"), col("centroid"))).as("cnorm"))
    // probe selection: top cells per query by rounded centroid cosine
    val qc = q.crossJoin(broadcast(cent))
      .withColumn("ccos", cos4(
        dot(col("eq"), col("centroid")), col("nq") * col("cnorm")))
    val wCell = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("label"))
    val probed = qc.withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= probes)
      .select(col("q_id"), col("eq"), col("nq"), col("label"))
    // exact search within probed cells only
    val c = e.select(col("vec_id").as("c_id"), col("label"),
      col("embedding").as("ec"), col("nrm").as("nc"))
    val scored = probed.join(c, Seq("label")).filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", cos4(dot(col("eq"), col("ec")), col("nq") * col("nc")))
    rankTopK(s, scored)
  }
  def annIvfSql: String =
    s"""WITH cent AS (
       |  SELECT label, list(c ORDER BY j) AS centroid FROM (
       |    SELECT label, j, CAST(sum(CAST(embedding[j] AS DECIMAL(20,8))) AS DOUBLE) / count(*) AS c
       |    FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS j)
       |    GROUP BY label, j)
       |  GROUP BY label),
       |cn AS (SELECT label, centroid,
       |  sqrt(list_sum(list_transform(centroid, x -> x * x))) AS cnorm FROM cent),
       |e AS (SELECT vec_id, label, embedding,
       |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS eq, nrm AS nq FROM e WHERE vec_id < $NumQueries),
       |qc AS (SELECT q_id, eq, nq, cn.label,
       |  round(list_sum(list_transform(generate_series(1, $Dim),
       |        i -> eq[i]::DOUBLE * centroid[i])) / (nq * cnorm), 4) AS ccos
       |  FROM q CROSS JOIN cn),
       |probes AS (SELECT q_id, eq, nq, label FROM (
       |  SELECT q_id, eq, nq, label,
       |    row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, label) AS cell_rank
       |  FROM qc) WHERE cell_rank <= $IvfProbes),
       |scored AS (
       |  SELECT p.q_id, e.vec_id AS c_id,
       |    round(list_sum(list_transform(generate_series(1, $Dim),
       |          i -> p.eq[i]::DOUBLE * e.embedding[i]::DOUBLE)) / (p.nq * e.nrm), 4) + 0.0 AS cos
       |  FROM probes p JOIN e ON p.label = e.label AND p.q_id <> e.vec_id),
       |ranked AS (SELECT q_id, c_id, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk FROM scored)
       |SELECT q_id, rnk, c_id, cos FROM ranked WHERE rnk <= $TopK ORDER BY q_id, rnk""".stripMargin

  val KmeansK = 4

  /** Semantic clustering: k-means (two Lloyd iterations) over int-quantized
    * embeddings — the cluster-then-sample/cluster-then-dedup primitive of a
    * curation pipeline.
    *
    * Quantization (`floor(x·1000 + 0.5)` per element, the int16-style vector
    * quantization ANN stores use) makes iteration 1 pure integer arithmetic
    * and iteration 2 a deterministic function of exact integers, so the
    * DuckDB oracle matches bit-for-bit with no float-order caveats.
    *
    * 100 TB shape: ASSIGNMENT IS MAP-ONLY — centroids ride into the plan as
    * literals (k·dim values), each vector computes its k distances and
    * argmin in one projection, no join, no shuffle. Only the centroid
    * update aggregates, and that shuffle carries k·dim cells after partial
    * aggregation, independent of corpus size. Ties go to the lowest
    * centroid id in both engines.
    */
  /** Final (iteration-2) cluster assignment with the original embedding
    * riding along: (vec_id, cid, embedding). The blocking key source for
    * [[clusterNearDup]] and the row source for [[kmeans]]'s summary.
    */
  def kmeansAssignments(s: SparkSession, d: String, k: Int = KmeansK): DataFrame =
    kmeansInternal(s, d, k)._1

  def kmeans(s: SparkSession, d: String, k: Int = KmeansK): DataFrame = {
    val (a2, cents2) = kmeansInternal(s, d, k)
    val sums = s.createDataFrame(
      cents2.map { case (cid, mu) => (cid, mu.foldLeft(0.0)(_ + _)) })
      .toDF("cid", "c_sum")
    a2.groupBy("cid").agg(count(lit(1)).as("n"))
      .join(broadcast(sums), Seq("cid"))
      .select("cid", "n", "c_sum")
      .orderBy("cid")
  }

  private def kmeansInternal(s: SparkSession, d: String,
      k: Int): (DataFrame, Seq[(Int, Array[Double])]) = {
    val quant = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + 0.5).cast("long")).as("qe"))
      .localCheckpoint(true) // three passes (init + 2 assignments) read this

    // deterministic seeding: the k lowest vec_ids
    val init: Array[Array[Long]] = quant.select("vec_id", "qe")
      .orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray)

    // map-only argmin assignment; `cents` must be ordered by ascending cid
    // so the first-minimum position IS the lowest-cid tie-break
    def assign(dists: Column, cids: Seq[Int]): Column =
      element_at(array(cids.map(lit): _*),
        array_position(dists, array_min(dists)).cast("int"))

    val a1 = quant.withColumn("cid", assign(
      transform(
        array(init.map(c => array(c.map(lit): _*)): _*),
        cvec => aggregate(zip_with(col("qe"), cvec, (x, y) => (x - y) * (x - y)),
          lit(0L), _ + _)),
      0 until k))

    // centroid update: k·dim cells, map-side partial agg, tiny collect
    val meanRows = a1
      .select(col("cid"), posexplode(col("qe")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(sum("v").as("sv"), count(lit(1)).as("c"))
      .collect()
    val cents2: Seq[(Int, Array[Double])] = meanRows
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (cid, rows) =>
        val mu = new Array[Double](Dim)
        rows.foreach(r => mu(r.getInt(1)) = r.getLong(2).toDouble / r.getLong(3))
        cid -> mu
      }

    val a2 = quant.withColumn("cid", assign(
      transform(
        array(cents2.map { case (_, mu) => array(mu.map(lit): _*) }: _*),
        cvec => aggregate(
          zip_with(col("qe"), cvec, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), _ + _)),
      cents2.map(_._1)))

    (a2.select("vec_id", "cid", "embedding"), cents2)
  }

  /** Cluster-blocked cosine near-dup: [[cosineNearDup]] with the LEARNED
    * k-means cell as the blocking key instead of the label column — the
    * full semantic-dedup composition (cluster, then pair only within
    * cells). All-pairs is O(n²); this is O(Σ n_c²) with cells shrinking as
    * k grows — the shape that survives a billion-vector corpus.
    */
  def clusterNearDup(s: SparkSession, d: String, threshold: Double = 0.35): DataFrame = {
    val e = kmeansAssignments(s, d)
      .select(col("vec_id"), col("cid"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      .localCheckpoint(true) // both self-join sides read this
    val a = e.select(col("vec_id").as("a_id"), col("cid"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("cid"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("cid")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", cos4(dot(col("ea"), col("eb")), col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cid", "cos")
      .orderBy("a_id", "b_id")
  }
  val clusterNearDupSql: String =
    s"""WITH q AS (SELECT vec_id, embedding,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe
       |  FROM embeddings),
       |init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, qe AS c
       |         FROM (SELECT * FROM q ORDER BY vec_id LIMIT $KmeansK)),
       |a1 AS (SELECT vec_id, qe, cid FROM (
       |         SELECT q.vec_id, q.qe, init.cid,
       |           list_sum(list_transform(generate_series(1, len(q.qe)),
       |             i -> (q.qe[i] - init.c[i]) * (q.qe[i] - init.c[i]))) AS dist
       |         FROM q CROSS JOIN init)
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
       |m AS (SELECT cid, i, CAST(sum(v) AS DOUBLE) / count(*) AS mu
       |      FROM (SELECT cid, unnest(generate_series(1, len(qe))) AS i, unnest(qe) AS v FROM a1)
       |      GROUP BY 1, 2),
       |c2 AS (SELECT cid, list(mu ORDER BY i) AS c FROM m GROUP BY 1),
       |a2 AS (SELECT vec_id, cid FROM (
       |         SELECT q.vec_id, c2.cid,
       |           list_sum(list_transform(generate_series(1, len(q.qe)),
       |             i -> (CAST(q.qe[i] AS DOUBLE) - c2.c[i]) * (CAST(q.qe[i] AS DOUBLE) - c2.c[i]))) AS dist
       |         FROM q CROSS JOIN c2)
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
       |e AS (SELECT q.vec_id, a2.cid, q.embedding,
       |        sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
       |      FROM q JOIN a2 USING (vec_id)),
       |pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.cid,
       |    round(list_sum(list_transform(generate_series(1, $Dim),
       |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm), 4) + 0.0 AS cos
       |  FROM e a JOIN e b ON a.cid = b.cid AND a.vec_id < b.vec_id)
       |SELECT a_id, b_id, cid, cos FROM pairs WHERE cos >= 0.35
       |ORDER BY a_id, b_id""".stripMargin
  val kmeansSql: String =
    s"""WITH q AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe
       |  FROM embeddings),
       |init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, qe AS c
       |         FROM (SELECT * FROM q ORDER BY vec_id LIMIT $KmeansK)),
       |a1 AS (SELECT vec_id, qe, cid FROM (
       |         SELECT q.vec_id, q.qe, init.cid,
       |           list_sum(list_transform(generate_series(1, len(q.qe)),
       |             i -> (q.qe[i] - init.c[i]) * (q.qe[i] - init.c[i]))) AS dist
       |         FROM q CROSS JOIN init)
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
       |m AS (SELECT cid, i, CAST(sum(v) AS DOUBLE) / count(*) AS mu
       |      FROM (SELECT cid, unnest(generate_series(1, len(qe))) AS i, unnest(qe) AS v FROM a1)
       |      GROUP BY 1, 2),
       |c2 AS (SELECT cid, list(mu ORDER BY i) AS c FROM m GROUP BY 1),
       |a2 AS (SELECT vec_id, cid FROM (
       |         SELECT q.vec_id, c2.cid,
       |           list_sum(list_transform(generate_series(1, len(q.qe)),
       |             i -> (CAST(q.qe[i] AS DOUBLE) - c2.c[i]) * (CAST(q.qe[i] AS DOUBLE) - c2.c[i]))) AS dist
       |         FROM q CROSS JOIN c2)
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
       |cs AS (SELECT cid, list_sum(c) AS c_sum FROM c2)
       |SELECT f.cid, f.n, cs.c_sum
       |FROM (SELECT cid, CAST(count(*) AS BIGINT) AS n FROM a2 GROUP BY 1) f
       |JOIN cs USING (cid) ORDER BY cid""".stripMargin

  /** Simplified (centroid-based) silhouette per k-means cluster — the
    * clustering-quality gate a curation pipeline runs before trusting a
    * cluster-blocked dedup or a cluster-stratified sample. The CLASSIC
    * silhouette needs all pairwise distances (O(n²), dead at scale); the
    * simplified form (Hruschka et al. 2004) replaces mean-distance-to-
    * cluster with distance-to-centroid: a(i) = d(x, own centroid),
    * b(i) = min over other centroids, s(i) = (b−a)/max(a,b) — O(n·k),
    * MAP-ONLY once the k centroids ride in as literals.
    *
    * Determinism: centroids are re-derived from the FINAL assignment as
    * exact integer rationals and rounded half-up to the integer grid via
    * floor-division ((2·sv + c) ÷ 2c — `Math.floorDiv` on the driver, the
    * pmod form in the oracle, since DuckDB's `//` truncates toward zero on
    * negatives), so every distance is an exact integer; per-point scores
    * go to integer micro-units (one round per point), sums are exact, and
    * the single mean division rounds at 4 with the signed-zero
    * normalization on both dump and oracle.
    */
  def silhouette(s: SparkSession, d: String): DataFrame = {
    val a2 = kmeansAssignments(s, d)
      .select(col("vec_id"), col("cid"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + 0.5).cast("long")).as("qe"))
      .localCheckpoint(true) // centroid-stats pass + scoring pass
    val stats = a2.select(col("cid"), posexplode(col("qe")).as(Seq("pos", "v")))
      .groupBy("cid", "pos").agg(sum("v").as("sv"), count(lit(1)).as("c"))
      .collect() // k·dim cells
    val cents: Seq[(Int, Array[Long])] = stats
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (cid, rows) =>
        val mu = new Array[Long](Dim)
        rows.foreach(r => mu(r.getInt(1)) =
          Math.floorDiv(2 * r.getLong(2) + r.getLong(3), 2 * r.getLong(3)))
        cid -> mu
      }
    // distances to ALL present centroids in one map-only projection; own
    // centroid located positionally via the sorted present-cid list (an
    // empty cluster after iteration 2 must not shift the array index)
    val ds = transform(
      array(cents.map { case (_, mu) => array(mu.map(lit): _*) }: _*),
      cvec => aggregate(zip_with(col("qe"), cvec, (x, y) => (x - y) * (x - y)),
        lit(0L), _ + _))
    a2.withColumn("ds", ds)
      .withColumn("ix",
        array_position(array(cents.map(c => lit(c._1)): _*), col("cid")).cast("int"))
      .withColumn("a", element_at(col("ds"), col("ix")))
      .withColumn("b", array_min(expr(
        "filter(transform(ds, (x, i) -> IF(i = ix - 1, CAST(NULL AS BIGINT), x)), x -> x IS NOT NULL)")))
      .withColumn("s_u", when(greatest(col("a"), col("b")) === 0, lit(0L))
        .otherwise(round(lit(1e6) * (col("b") - col("a")).cast("double")
          / greatest(col("a"), col("b")).cast("double")).cast("long")))
      .groupBy("cid")
      .agg(count(lit(1)).as("n"),
        round(sum("s_u").cast("double") / count(lit(1)) / lit(1e6), 4).as("mean_sil"))
      .orderBy("cid")
  }

  val silhouetteSql: String =
    s"""WITH q AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe
       |  FROM embeddings),
       |init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, qe AS c
       |         FROM (SELECT * FROM q ORDER BY vec_id LIMIT $KmeansK)),
       |a1 AS (SELECT vec_id, qe, cid FROM (
       |         SELECT q.vec_id, q.qe, init.cid,
       |           list_sum(list_transform(generate_series(1, len(q.qe)),
       |             i -> (q.qe[i] - init.c[i]) * (q.qe[i] - init.c[i]))) AS dist
       |         FROM q CROSS JOIN init)
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
       |m AS (SELECT cid, i, CAST(sum(v) AS DOUBLE) / count(*) AS mu
       |      FROM (SELECT cid, unnest(generate_series(1, len(qe))) AS i, unnest(qe) AS v FROM a1)
       |      GROUP BY 1, 2),
       |c2 AS (SELECT cid, list(mu ORDER BY i) AS c FROM m GROUP BY 1),
       |a2 AS (SELECT vec_id, qe, cid FROM (
       |         SELECT q.vec_id, q.qe, c2.cid,
       |           list_sum(list_transform(generate_series(1, len(q.qe)),
       |             i -> (CAST(q.qe[i] AS DOUBLE) - c2.c[i]) * (CAST(q.qe[i] AS DOUBLE) - c2.c[i]))) AS dist
       |         FROM q CROSS JOIN c2)
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
       |st AS (SELECT cid, i, CAST(sum(v) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS c
       |       FROM (SELECT cid, unnest(generate_series(1, len(qe))) AS i, unnest(qe) AS v FROM a2)
       |       GROUP BY 1, 2),
       |muq AS (SELECT cid, i,
       |          (2*sv + c - ((((2*sv + c) % (2*c)) + 2*c) % (2*c))) // (2*c) AS mq
       |        FROM st),
       |mc AS (SELECT cid, list(mq ORDER BY i) AS mu FROM muq GROUP BY cid),
       |dd AS (SELECT a2.vec_id, a2.cid AS own, mc.cid AS cand,
       |         list_sum(list_transform(generate_series(1, len(a2.qe)),
       |           i -> (a2.qe[i] - mc.mu[i]) * (a2.qe[i] - mc.mu[i]))) AS dist
       |       FROM a2 CROSS JOIN mc),
       |ab AS (SELECT vec_id, own,
       |         max(CASE WHEN cand = own THEN dist END) AS a,
       |         min(CASE WHEN cand <> own THEN dist END) AS b
       |       FROM dd GROUP BY 1, 2),
       |su AS (SELECT own AS cid,
       |         CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
       |              ELSE CAST(round(1000000.0 * (b - a) / greatest(a, b)) AS BIGINT) END AS s_u
       |       FROM ab)
       |SELECT cid, CAST(count(*) AS BIGINT) AS n,
       |       round(CAST(sum(s_u) AS DOUBLE) / count(*) / 1000000.0, 4) + 0.0 AS mean_sil
       |FROM su GROUP BY cid ORDER BY cid""".stripMargin

  /** Nearest-centroid (Rocchio) classification eval over the labeled
    * embeddings: one integer-grid centroid per LABEL (exact floor-division
    * rounding, the [[silhouette]] discipline), every vector assigned to its
    * nearest label centroid, confusion matrix out — the cheapest linear
    * probe of embedding quality, and the scale counterpoint to
    * [[knnLabel]]: kNN pays a candidate join per query; this is MAP-ONLY
    * scoring against |labels| literal centroids (O(n·k·dim), no join, no
    * shuffle before the ≤ labels² confusion aggregate). Distances are exact
    * integers; ties go to the lowest label in both engines.
    */
  def nearestCentroid(s: SparkSession, d: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + 0.5).cast("long")).as("qe"))
      .localCheckpoint(true) // centroid pass + scoring pass
    val stats = e.select(col("label"), posexplode(col("qe")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(sum("v").as("sv"), count(lit(1)).as("c"))
      .collect() // |labels|·dim cells
    val cents: Seq[(Int, Array[Long])] = stats
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (lbl, rows) =>
        val mu = new Array[Long](Dim)
        rows.foreach(r => mu(r.getInt(1)) =
          Math.floorDiv(2 * r.getLong(2) + r.getLong(3), 2 * r.getLong(3)))
        lbl -> mu
      }
    val ds = transform(
      array(cents.map { case (_, mu) => array(mu.map(lit): _*) }: _*),
      cvec => aggregate(zip_with(col("qe"), cvec, (x, y) => (x - y) * (x - y)),
        lit(0L), _ + _))
    e.withColumn("ds", ds)
      .withColumn("pred", element_at(array(cents.map(c => lit(c._1)): _*),
        array_position(col("ds"), array_min(col("ds"))).cast("int")))
      .groupBy("label", "pred").agg(count(lit(1)).as("n"))
      .orderBy("label", "pred")
  }

  val nearestCentroidSql: String =
    """WITH q AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe
      |  FROM embeddings),
      |st AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS c
      |       FROM (SELECT label, unnest(generate_series(1, len(qe))) AS i, unnest(qe) AS v FROM q)
      |       GROUP BY 1, 2),
      |muq AS (SELECT label, i,
      |          (2*sv + c - ((((2*sv + c) % (2*c)) + 2*c) % (2*c))) // (2*c) AS mq
      |        FROM st),
      |mc AS (SELECT label, list(mq ORDER BY i) AS mu FROM muq GROUP BY label),
      |pr AS (SELECT vec_id, label, pred FROM (
      |         SELECT q.vec_id, q.label, mc.label AS pred,
      |           list_sum(list_transform(generate_series(1, len(q.qe)),
      |             i -> (q.qe[i] - mc.mu[i]) * (q.qe[i] - mc.mu[i]))) AS dist
      |         FROM q CROSS JOIN mc)
      |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, pred) = 1)
      |SELECT label, pred, CAST(count(*) AS BIGINT) AS n
      |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Confident-mislabeling candidates (the Confident Learning / cleanlab
    * triage): embeddings whose OWN-label centroid sits farther away than
    * some other label's centroid, ranked by the exact integer margin
    * `d(own) − min d(other)` — the top of this list is what a labeling
    * team reviews first. Same map-only scoring as [[nearestCentroid]];
    * the margin needs NO division at all (distances are exact longs), so
    * the ranking is bit-deterministic by construction.
    */
  def labelOutliers(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + 0.5).cast("long")).as("qe"))
      .localCheckpoint(true)
    val stats = e.select(col("label"), posexplode(col("qe")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(sum("v").as("sv"), count(lit(1)).as("c"))
      .collect()
    val cents: Seq[(Int, Array[Long])] = stats
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (lbl, rows) =>
        val mu = new Array[Long](Dim)
        rows.foreach(r => mu(r.getInt(1)) =
          Math.floorDiv(2 * r.getLong(2) + r.getLong(3), 2 * r.getLong(3)))
        lbl -> mu
      }
    val ds = transform(
      array(cents.map { case (_, mu) => array(mu.map(lit): _*) }: _*),
      cvec => aggregate(zip_with(col("qe"), cvec, (x, y) => (x - y) * (x - y)),
        lit(0L), _ + _))
    e.withColumn("ds", ds)
      .withColumn("ix",
        array_position(array(cents.map(c => lit(c._1)): _*), col("label")).cast("int"))
      .withColumn("pred", element_at(array(cents.map(c => lit(c._1)): _*),
        array_position(col("ds"), array_min(col("ds"))).cast("int")))
      .withColumn("margin", element_at(col("ds"), col("ix")) - array_min(expr(
        "filter(transform(ds, (x, i) -> IF(i = ix - 1, CAST(NULL AS BIGINT), x)), x -> x IS NOT NULL)")))
      .select("vec_id", "label", "pred", "margin")
      .orderBy(col("margin").desc, col("vec_id"))
      .limit(k)
  }

  val labelOutliersSql: String =
    """WITH q AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe
      |  FROM embeddings),
      |st AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS c
      |       FROM (SELECT label, unnest(generate_series(1, len(qe))) AS i, unnest(qe) AS v FROM q)
      |       GROUP BY 1, 2),
      |muq AS (SELECT label, i,
      |          (2*sv + c - ((((2*sv + c) % (2*c)) + 2*c) % (2*c))) // (2*c) AS mq
      |        FROM st),
      |mc AS (SELECT label, list(mq ORDER BY i) AS mu FROM muq GROUP BY label),
      |dd AS (SELECT q.vec_id, q.label, mc.label AS cand,
      |         list_sum(list_transform(generate_series(1, len(q.qe)),
      |           i -> (q.qe[i] - mc.mu[i]) * (q.qe[i] - mc.mu[i]))) AS dist
      |       FROM q CROSS JOIN mc),
      |ab AS (SELECT vec_id, label,
      |         max(CASE WHEN cand = label THEN dist END) AS a,
      |         min(CASE WHEN cand <> label THEN dist END) AS b
      |       FROM dd GROUP BY 1, 2),
      |pr AS (SELECT vec_id, pred FROM (
      |         SELECT vec_id, cand AS pred,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cand) AS rn
      |         FROM dd) WHERE rn = 1)
      |SELECT ab.vec_id, ab.label, pr.pred, CAST(ab.a - ab.b AS BIGINT) AS margin
      |FROM ab JOIN pr USING (vec_id)
      |ORDER BY margin DESC, ab.vec_id LIMIT 20""".stripMargin

  /** Symmetric int8 scalar quantization of the embedding column — the
    * standard 4× compression before ANN index build (FAISS SQ8 shape).
    * Per-vector scale = max|x| / 127; each component is rounded HALF-UP
    * (toward +∞: −2.5 → −2) via the explicit `floor(x/scale + 0.5)` form,
    * so both engines run the identical IEEE op sequence (float→double
    * widening is exact, division and floor are correctly rounded — no
    * rounding-mode ambiguity). Note this differs from half-away-from-zero
    * references on exactly-half NEGATIVE components, by design: the
    * explicit form is what both engines reproduce bit-identically. A zero vector quantizes to zeros with scale 0.
    *
    * 100 TB design: pure per-row projection (no shuffle); emits the int8
    * codes plus an exact integer L1 checksum so the oracle gate pins every
    * component without comparing float-formatted arrays. The codes column is
    * canonicalized to a comma-joined STRING (`q_csv`) — the gate's comparator
    * sorts result frames, and raw array cells are unsortable there; the
    * string form pins every component exactly (integers format identically
    * in both engines), mirroring `b8_group_collect_set` / `f_array_ops`.
    */
  /** (vec_id, scale, q: array<int>) — the raw quantized index, shared by
    * the gate query below and the SQ8 search ([[annSq8]]).
    */
  private def quantized(s: SparkSession, d: String): DataFrame = {
    val dv = transform(col("embedding"), x => x.cast("double"))
    Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), dv.as("dv"))
      .withColumn("scale", array_max(transform(col("dv"), x => abs(x))) / lit(127.0))
      .select(
        col("vec_id"), col("scale"),
        when(col("scale") === 0.0, transform(col("dv"), _ => lit(0)))
          .otherwise(transform(col("dv"),
            x => floor(x / col("scale") + lit(0.5)).cast("int"))).as("q"))
  }

  def quantizeInt8(s: SparkSession, d: String): DataFrame =
    quantized(s, d)
      .select(
        col("vec_id"), col("scale"),
        concat_ws(",", transform(col("q"), x => x.cast("string"))).as("q_csv"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + abs(x).cast("long")).as("q_l1"))
      .orderBy("vec_id")
  val quantizeInt8Sql: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
      |           FROM embeddings),
      |m AS (SELECT vec_id, dv,
      |        list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale FROM e),
      |qq AS (SELECT vec_id, scale,
      |         CASE WHEN scale = 0 THEN list_transform(dv, x -> 0)
      |              ELSE list_transform(dv, x -> CAST(floor(x / scale + 0.5) AS INTEGER))
      |         END AS q
      |       FROM m)
      |SELECT vec_id, scale,
      |  array_to_string(q, ',') AS q_csv,
      |  CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1
      |FROM qq ORDER BY vec_id""".stripMargin

  /** ANN over the SQ8 index — the search half of [[quantizeInt8]]: scores
    * are computed ENTIRELY in the quantized domain,
    * `score ≈ ⟨a,b⟩ = sa·sb·Σ qa[i]·qb[i]`, so at 100 TB the index the
    * executors scan is 4× smaller than the float corpus (int8 codes + one
    * scale per vector) and the inner loop is integer multiply-adds. The
    * integer dot is exact in both engines (≤64·127² fits a long); the
    * single double multiply by `sa·sb` is the same IEEE op sequence in the
    * oracle, and scores are rounded before ranking so ties break
    * identically on candidate id. Same query set / top-k contract as the
    * other ANN variants — recall vs [[annBruteForce]] is the quantization
    * error, not a bucketing artifact.
    */
  def annSq8(s: SparkSession, d: String): DataFrame = {
    graft.catalyst.GraftExtensions.register(s)
    val e = quantized(s, d)
      .select(col("vec_id"), col("scale"),
        transform(col("q"), x => x.cast("double")).as("qd"))
      .localCheckpoint(true)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("scale").as("sa"), col("qd").as("qa"))
    val c = e.select(col("vec_id").as("c_id"), col("scale").as("sb"), col("qd").as("qb"))
    val scored = q.crossJoin(c).filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", round(col("sa") * col("sb") *
        graft.catalyst.HashFunctions.dot_product(col("qa"), col("qb")), 4))
    // honest naming: the ranking key is the approximate INNER PRODUCT
    // (scales x integer dot), not a normalized cosine
    rankTopK(s, scored).withColumnRenamed("cos", "score")
  }
  val annSq8Sql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
       |           FROM embeddings),
       |m AS (SELECT vec_id, dv, list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale FROM e),
       |qq AS (SELECT vec_id, scale,
       |         CASE WHEN scale = 0 THEN list_transform(dv, x -> CAST(0 AS DOUBLE))
       |              ELSE list_transform(dv, x -> CAST(CAST(floor(x / scale + 0.5) AS INTEGER) AS DOUBLE))
       |         END AS qd
       |       FROM m),
       |scored AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
       |    round(a.scale * b.scale * list_sum(list_transform(generate_series(1, $Dim),
       |          i -> a.qd[i] * b.qd[i])), 4) AS score
       |  FROM qq a JOIN qq b ON a.vec_id < $NumQueries AND a.vec_id <> b.vec_id),
       |ranked AS (SELECT q_id, c_id, score,
       |  row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk FROM scored)
       |SELECT q_id, rnk, c_id, score FROM ranked WHERE rnk <= $TopK ORDER BY q_id, rnk""".stripMargin

  // ---- product quantization (PQ) + asymmetric distance (ADC) ----------

  val PqM      = 4                // subspaces
  val PqSubDim = Dim / PqM        // 16 dims per subspace
  val PqK      = 16               // centroids per subspace codebook (4-bit codes)

  /** Product quantization with ADC search — the billion-vector ANN
    * workhorse (FAISS IVFPQ's fine quantizer): each vector compresses to
    * `PqM` codebook ids (here 4×4 bits); a query scores candidates by
    * summing `PqM` table lookups instead of touching the raw vectors.
    *
    * Codebook training reuses the deterministic quantized-Lloyd recipe of
    * [[kmeans]] per subspace (init = subvectors of the `PqK` lowest
    * vec_ids, iteration 1 in exact integer arithmetic, iteration 2 against
    * exact-ratio double centroids, ties to the lowest cid) — so the whole
    * chain train→encode→search is bit-for-bit reproducible in the DuckDB
    * oracle.
    *
    * 100 TB design: encoding is MAP-ONLY (codebooks ride into the plan as
    * `PqM·PqK·PqSubDim` literals — one projection, no join, no shuffle);
    * the Lloyd update shuffles only `PqM·PqK·PqSubDim` cells after partial
    * aggregation; ADC search is the query-side table (`|queries|·PqM·PqK`
    * rows) chained through `PqM` BROADCAST joins against the packed codes —
    * zero shuffles end-to-end, then the native bounded-heap top-k. The
    * per-subspace distances are rounded to 4 decimals and added in fixed
    * left-associated order, so the final score needs no decimal escort.
    */
  private def pqInternal(s: SparkSession, d: String)
      : (DataFrame, Seq[((Int, Int), Array[Double])]) = {
    val quant = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + 0.5).cast("long")).as("qe"))
      .localCheckpoint(true) // init collect + 2 assignment passes read this

    def subCol(sub: Int): Column = slice(col("qe"), sub * PqSubDim + 1, PqSubDim)

    // deterministic seeding: subvectors of the PqK lowest vec_ids
    val initRows = quant.orderBy("vec_id").limit(PqK).collect()
    val init: Map[(Int, Int), Array[Long]] = (for {
      (r, cid) <- initRows.zipWithIndex
      sub <- 0 until PqM
    } yield (sub, cid) ->
      r.getSeq[Long](1).slice(sub * PqSubDim, (sub + 1) * PqSubDim).toArray).toMap

    // iteration 1: pure integer distances, first-minimum = lowest-cid ties
    def assignInt(sub: Int): Column = {
      val dists = transform(
        array((0 until PqK).map(c => array(init((sub, c)).map(lit): _*)): _*),
        cvec => aggregate(zip_with(subCol(sub), cvec, (x, y) => (x - y) * (x - y)),
          lit(0L), _ + _))
      element_at(array((0 until PqK).map(lit): _*),
        array_position(dists, array_min(dists)).cast("int"))
    }
    val a1 = quant.select(col("vec_id") +: col("qe") +:
      (0 until PqM).map(sub => assignInt(sub).as(s"c$sub")): _*)

    // Lloyd update: PqM·PqK·PqSubDim cells, partial-aggregated, tiny collect
    val upd = a1.select(explode(array((0 until PqM).map(sub =>
        struct(lit(sub).as("sub"), col(s"c$sub").as("cid"),
          subCol(sub).as("sq"))): _*)).as("e"))
      .select(col("e.sub").as("sub"), col("e.cid").as("cid"),
        posexplode(col("e.sq")).as(Seq("pos", "v")))
      .groupBy("sub", "cid", "pos")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .collect()
    val cents2: Seq[((Int, Int), Array[Double])] = upd
      .groupBy(r => (r.getInt(0), r.getInt(1))).toSeq.sortBy(_._1)
      .map { case (key, rows) =>
        val mu = new Array[Double](PqSubDim)
        rows.foreach(r => mu(r.getInt(2)) = r.getLong(3).toDouble / r.getLong(4))
        key -> mu
      }

    // iteration 2: exact-ratio double centroids (identical in the oracle)
    def assignDbl(sub: Int): Column = {
      val cs = cents2.filter(_._1._1 == sub)
      val dists = transform(
        array(cs.map { case (_, mu) => array(mu.map(lit): _*) }: _*),
        cvec => aggregate(zip_with(subCol(sub), cvec,
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), _ + _))
      element_at(array(cs.map(c => lit(c._1._2)): _*),
        array_position(dists, array_min(dists)).cast("int"))
    }
    val codes = quant.select(col("vec_id") +: col("qe") +:
      (0 until PqM).map(sub => assignDbl(sub).as(s"c$sub")): _*)
    (codes, cents2)
  }

  /** (vec_id, c0..c3) PQ codes — 4 bytes per vector vs 256 raw floats. */
  def pqCodes(s: SparkSession, d: String): DataFrame =
    pqInternal(s, d)._1.drop("qe")

  /** ADC top-k: queries = vec_id < [[NumQueries]]; ranking key is the
    * approximate squared L2 distance in the quantized domain (sum of
    * per-subspace query→centroid distances under each candidate's codes).
    */
  def annPq(s: SparkSession, d: String): DataFrame = {
    val (codes, cents2) = pqInternal(s, d)
    val centsDf = s.createDataFrame(
      cents2.map { case ((sub, cid), mu) => (sub, cid, mu.toSeq) })
      .toDF("sub", "cid", "mu")
    val q = codes.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("qe"))
    // ADC table: per (query, subspace, centroid) distance — in-plan, so the
    // float fold is the same engine-neutral left-to-right sequence as the
    // oracle's list_sum(list_transform(...))
    val tbl = q.crossJoin(broadcast(centsDf))
      .select(col("q_id"), col("sub"), col("cid"),
        round(aggregate(zip_with(
          transform(sequence(lit(1), lit(PqSubDim)),
            i => element_at(col("qe"),
              (col("sub") * PqSubDim + i).cast("int")).cast("double")),
          col("mu"), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _), 4).as("t"))
    // PqM chained broadcast joins against the packed codes: zero shuffles
    var cur = codes.select(col("vec_id").as("c_id") +:
      (0 until PqM).map(i => col(s"c$i")): _*)
    for (sub <- 0 until PqM) {
      val tsub = broadcast(tbl.filter(col("sub") === sub)
        .select(col("q_id"), col("cid").as(s"c$sub"), col("t").as(s"t$sub")))
      cur = cur.join(tsub, if (sub == 0) Seq(s"c$sub") else Seq("q_id", s"c$sub"))
    }
    val adist = (0 until PqM).map(i => col(s"t$i")).reduceLeft(_ + _)
    val scored = cur.filter(col("q_id") =!= col("c_id"))
      .withColumn("adist", adist)
    graft.catalyst.GraftExtensions.register(s)
    val top = graft.plans.NativeTopK.perGroup(
      scored.select("q_id", "c_id", "adist"),
      Seq("q_id"), Seq("adist" -> true, "c_id" -> true), TopK)
    val w = Window.partitionBy("q_id").orderBy(col("adist").asc, col("c_id"))
    top.withColumn("rnk", row_number().over(w))
      .select("q_id", "rnk", "c_id", "adist")
      .orderBy("q_id", "rnk")
  }
  val annPqSql: String =
    s"""WITH q0 AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe
       |  FROM embeddings),
       |subs AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS sub),
       |init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, qe
       |         FROM (SELECT * FROM q0 ORDER BY vec_id LIMIT $PqK)),
       |icent AS (SELECT sub, cid,
       |    list_transform(generate_series(1, $PqSubDim), i -> qe[sub * $PqSubDim + i]) AS c
       |  FROM init CROSS JOIN subs),
       |sv AS (SELECT vec_id, sub,
       |    list_transform(generate_series(1, $PqSubDim), i -> qe[sub * $PqSubDim + i]) AS sq
       |  FROM q0 CROSS JOIN subs),
       |a1 AS (SELECT vec_id, sub, cid, sq FROM (
       |    SELECT sv.vec_id, sv.sub, icent.cid, sv.sq,
       |      list_sum(list_transform(generate_series(1, $PqSubDim),
       |        i -> (sv.sq[i] - icent.c[i]) * (sv.sq[i] - icent.c[i]))) AS dist
       |    FROM sv JOIN icent USING (sub))
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) = 1),
       |m AS (SELECT sub, cid, i, CAST(sum(v) AS DOUBLE) / count(*) AS mu
       |  FROM (SELECT sub, cid, unnest(generate_series(1, $PqSubDim)) AS i, unnest(sq) AS v
       |        FROM a1)
       |  GROUP BY 1, 2, 3),
       |c2 AS (SELECT sub, cid, list(mu ORDER BY i) AS c FROM m GROUP BY 1, 2),
       |a2 AS (SELECT vec_id, sub, cid FROM (
       |    SELECT sv.vec_id, sv.sub, c2.cid,
       |      list_sum(list_transform(generate_series(1, $PqSubDim),
       |        i -> (CAST(sv.sq[i] AS DOUBLE) - c2.c[i]) * (CAST(sv.sq[i] AS DOUBLE) - c2.c[i]))) AS dist
       |    FROM sv JOIN c2 USING (sub))
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) = 1),
       |codes AS (SELECT vec_id,
       |    max(CASE WHEN sub = 0 THEN cid END) AS c0,
       |    max(CASE WHEN sub = 1 THEN cid END) AS c1,
       |    max(CASE WHEN sub = 2 THEN cid END) AS c2_,
       |    max(CASE WHEN sub = 3 THEN cid END) AS c3
       |  FROM a2 GROUP BY vec_id),
       |tbl AS (SELECT qv.vec_id AS q_id, c2.sub, c2.cid,
       |    round(list_sum(list_transform(generate_series(1, $PqSubDim),
       |      i -> (CAST(qv.qe[sub * $PqSubDim + i] AS DOUBLE) - c2.c[i])
       |         * (CAST(qv.qe[sub * $PqSubDim + i] AS DOUBLE) - c2.c[i]))), 4) AS t
       |  FROM (SELECT vec_id, qe FROM q0 WHERE vec_id < $NumQueries) qv CROSS JOIN c2),
       |sc AS (SELECT t0.q_id, c.vec_id AS c_id,
       |    t0.t + t1.t + t2.t + t3.t AS adist
       |  FROM codes c
       |  JOIN (SELECT q_id, cid, t FROM tbl WHERE sub = 0) t0 ON c.c0 = t0.cid
       |  JOIN (SELECT q_id, cid, t FROM tbl WHERE sub = 1) t1
       |    ON t1.q_id = t0.q_id AND c.c1 = t1.cid
       |  JOIN (SELECT q_id, cid, t FROM tbl WHERE sub = 2) t2
       |    ON t2.q_id = t0.q_id AND c.c2_ = t2.cid
       |  JOIN (SELECT q_id, cid, t FROM tbl WHERE sub = 3) t3
       |    ON t3.q_id = t0.q_id AND c.c3 = t3.cid)
       |SELECT q_id, rnk, c_id, adist FROM (
       |  SELECT q_id, c_id, adist,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rnk
       |  FROM sc WHERE q_id <> c_id)
       |WHERE rnk <= $TopK ORDER BY q_id, rnk""".stripMargin

  // ---- MMR diversified re-ranking (integer domain) --------------------

  val MmrQueryId = 0L
  val MmrCand    = 32
  val MmrK       = 5

  private def intdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")), lit(0L), _ + _)

  /** Maximal Marginal Relevance re-ranking over SQ8 codes — retrieval
    * diversification: greedily pick the candidate maximizing
    * `relevance − max-similarity-to-already-picked` (λ = ½, scaled ×2 so
    * the score stays integral). Run ENTIRELY in the quantized integer
    * domain: relevance and pairwise similarity are integer dots of int8
    * codes, so every comparison is exact and the greedy trace is
    * bit-reproducible — which is what lets a sequential re-ranker be
    * oracled at all (the DuckDB replay runs the same [[MmrK]] unrolled
    * steps).
    *
    * Scale shape: candidate generation is the data-scale part and reuses
    * the ANN machinery (broadcast 1-row query, TakeOrderedAndProject
    * top-[[MmrCand]]); the greedy loop then touches only the k·candidates
    * frontier — [[MmrK]] driver-bounded picks, the same bounded-driver
    * contract as [[kmeans]] centroids. Each step's max-sim join broadcasts
    * the ≤ k selected codes.
    */
  def mmrDiversify(s: SparkSession, d: String): DataFrame = {
    val q = quantized(s, d).select(col("vec_id"), col("q")).localCheckpoint(true)
    val qv = q.filter(col("vec_id") === MmrQueryId).select(col("q").as("qq"))
    val cands = q.filter(col("vec_id") =!= MmrQueryId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("c_id"), col("q"),
        intdot(col("q"), col("qq")).as("rel"))
      .orderBy(col("rel").desc, col("c_id")).limit(MmrCand)
      .localCheckpoint(true)
    var picks = Vector.empty[(Int, Long, Long, Long, Long)]
    var selIds = Vector.empty[Long]
    var k = 1
    var exhausted = false
    while (k <= MmrK && !exhausted) {
      val remaining = cands.filter(!col("c_id").isin(selIds: _*))
      val scored =
        if (selIds.isEmpty) remaining.select(col("c_id"), col("rel"), lit(0L).as("max_sim"))
        else {
          val selCodes = cands.filter(col("c_id").isin(selIds: _*))
            .select(col("q").as("sq"))
          remaining.crossJoin(broadcast(selCodes))
            .withColumn("sim", intdot(col("q"), col("sq")))
            .groupBy("c_id", "rel").agg(max("sim").as("max_sim"))
        }
      val hit = scored.withColumn("score", col("rel") - col("max_sim"))
        .orderBy(col("score").desc, col("c_id")).limit(1)
        .select("c_id", "rel", "max_sim", "score").take(1)
      hit.headOption match {
        case Some(p) =>
          picks :+= ((k, p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)))
          selIds :+= p.getLong(0)
          k += 1
        case None => exhausted = true // fewer candidates than MmrK
      }
    }
    import s.implicits._
    picks.toDF("rnk", "c_id", "rel", "max_sim", "score").orderBy("rnk")
  }

  /** Oracle: the same greedy trace as [[MmrK]] unrolled CTE steps —
    * integer dots make each argmax exact, so the replay is bit-identical.
    */
  val mmrDiversifySql: String = {
    def dot(a: String, b: String) =
      s"CAST(list_sum(list_transform(generate_series(1, $Dim), " +
        s"i -> CAST($a.q[i] * $b.q[i] AS BIGINT))) AS BIGINT)"
    // pairwise sims precomputed flat (lambda exprs cannot see correlated
    // outer columns in DuckDB); the greedy steps correlate on plain cols
    val steps = (2 to MmrK).map { k =>
      s"""sel${k - 1} AS (${(1 until k).map(j => s"SELECT c_id FROM p$j")
        .mkString(" UNION ALL ")}),
         |scored$k AS (
         |  SELECT c.c_id, c.rel,
         |    (SELECT max(sim) FROM sims
         |     WHERE sims.x = c.c_id AND sims.y IN (SELECT c_id FROM sel${k - 1})) AS max_sim
         |  FROM cand c WHERE c.c_id NOT IN (SELECT c_id FROM sel${k - 1})),
         |p$k AS (SELECT c_id, rel, max_sim, rel - max_sim AS score
         |        FROM scored$k ORDER BY score DESC, c_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to MmrK).map(k =>
      s"SELECT $k AS rnk, c_id, rel, max_sim, score FROM p$k")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
       |           FROM embeddings),
       |m AS (SELECT vec_id, dv,
       |        list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale FROM e),
       |qq AS (SELECT vec_id,
       |         CASE WHEN scale = 0 THEN list_transform(dv, x -> 0)
       |              ELSE list_transform(dv, x -> CAST(floor(x / scale + 0.5) AS INTEGER))
       |         END AS q
       |       FROM m),
       |cand AS (
       |  SELECT b.vec_id AS c_id, b.q, ${dot("a", "b")} AS rel
       |  FROM qq a, qq b
       |  WHERE a.vec_id = $MmrQueryId AND b.vec_id <> $MmrQueryId
       |  ORDER BY rel DESC, c_id LIMIT $MmrCand),
       |sims AS (SELECT a.c_id AS x, b.c_id AS y, ${dot("a", "b")} AS sim
       |         FROM cand a, cand b WHERE a.c_id <> b.c_id),
       |p1 AS (SELECT c_id, rel, CAST(0 AS BIGINT) AS max_sim, rel AS score
       |       FROM cand ORDER BY rel DESC, c_id LIMIT 1),
       |$steps
       |$out
       |ORDER BY rnk""".stripMargin
  }
}
