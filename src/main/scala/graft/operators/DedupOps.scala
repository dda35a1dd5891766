package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash. All are expressed as
  * declarative DataFrame plans (explode → hash-agg → join) so Catalyst keeps
  * map-side partial aggregation and AQE handles skewed shingles.
  *
  * Cross-engine determinism: every hash is md5 (identical hex in Spark and
  * DuckDB); MinHash uses min-over-md5(seed||shingle) which is a lexicographic
  * min on identical strings in both engines; similarity scores are exact
  * integer ratios.
  *
  * 100 TB design notes: the O(n²) step only ever runs on LSH/band candidates,
  * never the full corpus; the shingle→doc lists are bounded by dropping
  * ultra-frequent shingles (stop-shingle cap) in [[ngramJaccardPairs]], which
  * is what keeps the shingle join from exploding on boilerplate text.
  */
object DedupOps {

  /** Exact dedup: group by content hash of normalized text, keep the minimum
    * doc_id as canonical. One map-side-combinable hash aggregation; at scale
    * this is the cheapest dedup and runs first to shrink the corpus.
    */
  def exactDedup(s: SparkSession, d: String): DataFrame = {
    val norm = regexp_replace(trim(col("text")), "\\s+", " ")
    Tables.documents(s, d)
      .groupBy(md5(norm).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_count"))
      .orderBy("keep_id")
  }
  val exactDedupSql: String =
    """SELECT md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS content_hash,
      |  min(doc_id) AS keep_id, count(*) AS dup_count
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Exploded distinct (doc_id, shingle) pairs. */
  private def shingleDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(TextOps.shingles3(TextOps.tokens(col("text")))).as("s"))
      .distinct()

  /** Max docs a shingle may appear in before it is dropped as a stop-shingle.
    * Bounds the per-shingle join fan-out (a shingle in k docs contributes
    * k² candidate pairs) — at 100 TB this cap is what makes the self-join
    * survivable; near-dup pairs share many shingles so dropping the global
    * boilerplate ones loses ~nothing.
    */
  val StopShingleCap = 1000

  /** N-gram Jaccard near-dup: 3-word shingles, self-join on shingle, exact
    * Jaccard = |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold.
    */
  def ngramJaccardPairs(s: SparkSession, d: String, threshold: Double = 0.8): DataFrame = {
    val sh = shingleDf(s, d).cache()
    val freq = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= StopShingleCap)
    val shF = sh.join(freq.select("s"), Seq("s"))
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = shF.select(col("doc_id").as("a_id"), col("s"))
    val b = shF.select(col("doc_id").as("b_id"), col("s"))
    val common = a.join(b, Seq("s")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("common"))
    common
      .join(counts.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), Seq("a_id"))
      .join(counts.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), Seq("b_id"))
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 4))
      .filter(col("common").cast("double") / (col("na") + col("nb") - col("common")) >= threshold)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }
  val ngramJaccardSql: String =
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
       |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks WHERE len(t) >= 3)),
       |freq AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $StopShingleCap),
       |shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN freq USING (s)),
       |c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common
       |      FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT a_id, b_id, round(common * 1.0 / (ca.n + cb.n - common), 4) AS jaccard
       |FROM p JOIN c ca ON ca.doc_id = a_id JOIN c cb ON cb.doc_id = b_id
       |WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8
       |ORDER BY a_id, b_id""".stripMargin

  val MinHashK = 8      // signature length (seeds 0..7)
  val BandRows = 2      // rows per band → 4 bands; P(cand | j=0.99) ≈ 1-(1-0.98)⁴

  /** MinHash signatures + banded LSH candidates + signature-estimated
    * similarity. Per seed i, the component is min(md5(i||'|'||shingle)) —
    * a deterministic min-wise independent permutation family shared with the
    * oracle. Bands of [[BandRows]] components are concatenated into bucket
    * keys; only same-bucket pairs are compared. At scale: the bucket join is
    * the only pairwise step and bucket sizes are bounded by real similarity.
    */
  def minhashLshPairs(s: SparkSession, d: String): DataFrame = {
    val sh = shingleDf(s, d)
    val seeds = explode(sequence(lit(0), lit(MinHashK - 1))).as("seed")
    val mh = sh.select(col("doc_id"), col("s"), seeds)
      .groupBy("doc_id", "seed")
      .agg(min(md5(concat(col("seed").cast("string"), lit("|"), col("s")))).as("mh"))
    val bands = mh
      .withColumn("band", (col("seed") / BandRows).cast("int"))
      .groupBy("doc_id", "band")
      .agg(array_join(transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
        x => x.getField("mh")), ",").as("key"))
    val aB = bands.select(col("doc_id").as("a_id"), col("band"), col("key"))
    val bB = bands.select(col("doc_id").as("b_id"), col("band"), col("key"))
    val cand = aB.join(bB, Seq("band", "key")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val aM = mh.select(col("doc_id").as("a_id"), col("seed"), col("mh").as("ma"))
    val bM = mh.select(col("doc_id").as("b_id"), col("seed"), col("mh").as("mb"))
    cand.join(aM, Seq("a_id")).join(bM, Seq("b_id", "seed"))
      .groupBy("a_id", "b_id")
      .agg(round(sum(when(col("ma") === col("mb"), 1).otherwise(0)).cast("double") / MinHashK, 4)
        .as("est_sim"))
      .orderBy("a_id", "b_id")
  }
  val minhashLshSql: String =
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
       |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks WHERE len(t) >= 3)),
       |mh AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || '|' || s)) AS mh
       |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0, ${MinHashK - 1})) AS seed) GROUP BY 1, 2),
       |bands AS (SELECT doc_id, seed // $BandRows AS band, string_agg(mh, ',' ORDER BY seed) AS key
       |          FROM mh GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id,
       |  round(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) * 1.0 / $MinHashK, 4) AS est_sim
       |FROM cand JOIN mh ma ON ma.doc_id = a_id JOIN mh mb ON mb.doc_id = b_id AND mb.seed = ma.seed
       |GROUP BY a_id, b_id ORDER BY a_id, b_id""".stripMargin

  val SimHashBits = 32  // from the first 8 hex chars of md5(token)

  /** Per-doc 32-bit SimHash: each token votes ±1 on each bit of
    * md5(token)[0:8]; bit set where the vote sum is positive. Term frequency
    * weighting comes from keeping token multiplicity.
    */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("h8", substring(md5(col("tok")), 1, 8))
    val bits = toks
      .select(col("doc_id"), col("h8"), explode(sequence(lit(0), lit(SimHashBits - 1))).as("p"))
      .withColumn("v", conv(col("h8").substr((col("p") / 4).cast("int") + 1, lit(1)), 16, 10).cast("int"))
      .withColumn("bit",
        when(pmod(col("p"), lit(4)) === 0, pmod(col("v"), lit(2)))
          .when(pmod(col("p"), lit(4)) === 1, pmod(expr("v div 2"), lit(2)))
          .when(pmod(col("p"), lit(4)) === 2, pmod(expr("v div 4"), lit(2)))
          .otherwise(pmod(expr("v div 8"), lit(2))))
    bits.groupBy("doc_id", "p")
      .agg(sum(col("bit") * 2 - 1).as("vote"))
      .groupBy("doc_id")
      .agg(sum(when(col("vote") > 0, pow(lit(2.0), col("p")).cast("long")).otherwise(0L))
        .as("simhash"))
      .orderBy("doc_id")
  }
  val simhashSql: String =
    s"""WITH toks AS (SELECT doc_id, substr(md5(unnest(regexp_split_to_array(trim(text), '\\s+'))), 1, 8) AS h8
       |             FROM documents),
       |bits AS (
       |  SELECT doc_id, p,
       |    strpos('0123456789abcdef', substr(h8, (p // 4) + 1, 1)) - 1 AS v,
       |    CASE p % 4 WHEN 0 THEN (strpos('0123456789abcdef', substr(h8, (p // 4) + 1, 1)) - 1) % 2
       |               WHEN 1 THEN ((strpos('0123456789abcdef', substr(h8, (p // 4) + 1, 1)) - 1) // 2) % 2
       |               WHEN 2 THEN ((strpos('0123456789abcdef', substr(h8, (p // 4) + 1, 1)) - 1) // 4) % 2
       |               ELSE ((strpos('0123456789abcdef', substr(h8, (p // 4) + 1, 1)) - 1) // 8) % 2 END AS bit
       |  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, ${SimHashBits - 1})) AS p)),
       |votes AS (SELECT doc_id, p, sum(bit * 2 - 1) AS vote FROM bits GROUP BY 1, 2)
       |SELECT doc_id, sum(CASE WHEN vote > 0 THEN CAST(2 ** p AS BIGINT) ELSE 0 END) AS simhash
       |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** SimHash near-dup pairs: band on the 4 bytes of the signature (a pair
    * within Hamming distance 7 of a 32-bit hash must agree on ≥1 byte), then
    * verify `bit_count(xor) <= maxHamming` on candidates only.
    */
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 6): DataFrame = {
    val sh = simhash(s, d)
    val chunks = sh.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk", pmod(expr("simhash div cast(pow(2, c * 8) as bigint)"), lit(256)))
    val a = chunks.select(col("doc_id").as("a_id"), col("simhash").as("ha"), col("c"), col("chunk"))
    val b = chunks.select(col("doc_id").as("b_id"), col("simhash").as("hb"), col("c"), col("chunk"))
    a.join(b, Seq("c", "chunk")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("a_id", "b_id")
  }
}
