package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact distributed heavy hitters — the two-pass candidates-then-recount
  * shape that replaces a full-vocabulary `GROUP BY` when the vocabulary is
  * too large to shuffle:
  *
  *   pass 1: each partition runs a Misra-Gries summary with `k` counters —
  *           bounded memory, zero shuffle. MG guarantees every item with
  *           partition frequency > n_p/(k+1) survives; by pigeonhole, any
  *           item with GLOBAL frequency > n/(k+1) exceeds that bound in at
  *           least one partition, so the union of per-partition candidates
  *           is a guaranteed superset of the global heavy hitters.
  *   pass 2: a broadcast semi-join keeps only candidate rows (≤ k·P
  *           candidates — driver-bounded by construction) and recounts them
  *           exactly; the threshold test runs on exact integers.
  *
  * The final answer is therefore EXACT — the sketch only bounds what must be
  * recounted — so unlike estimate-emitting sketches this query sits under
  * the full DuckDB oracle gate (integer counts, integer threshold compare).
  *
  * At 100 TB: pass 1 is map-only; pass 2 shuffles only occurrences of
  * candidate items (share ≥ ~1/ThresholdDen each, so ≤ k·P distinct keys),
  * versus a full-vocab aggregation whose distinct-key count is unbounded.
  * The guarantee requires ThresholdDen < Counters + 1.
  *
  * Reference scope: the reference's warehouse exposes ClickHouse `topK`
  * (Filtered Space-Saving) for this question and returns an *approximate*
  * list; the recount pass here upgrades the same sketch idea to an exact
  * answer for one extra scan of the candidate rows.
  */
object FrequencyOps {

  /** Misra-Gries counter budget per partition. */
  val Counters = 1023

  /** Heavy hitter = items with share ≥ 1/ThresholdDen of all bigrams.
    * Must stay < Counters + 1 or the superset guarantee breaks.
    */
  val ThresholdDen = 800L
  require(ThresholdDen < Counters + 1, "MG guarantee needs threshold > n/(k+1)")

  /** One Misra-Gries pass: at most `k` live counters; on overflow every
    * counter decrements by one (the arriving item's implicit counter hits
    * zero and is never stored). Amortized O(1) per item — each decrement
    * round is paid for by the k+1 increments that preceded it. Survivors
    * are exactly the items whose frequency could exceed n/(k+1).
    */
  def misraGries(k: Int)(it: Iterator[String]): Iterator[String] = {
    val m = new scala.collection.mutable.HashMap[String, Long]()
    while (it.hasNext) {
      val x = it.next()
      m.get(x) match {
        case Some(c) => m.update(x, c + 1L)
        case None if m.size < k => m.update(x, 1L)
        case None =>
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          m.foreach { case (key, c) =>
            if (c == 1L) dead += key else m.update(key, c - 1L)
          }
          dead.foreach(m.remove)
      }
    }
    m.keysIterator
  }

  /** Token bigrams of the corpus, one row per occurrence (not distinct —
    * frequency semantics). Built positionally off the token array; matches
    * the oracle's `t[i] || ' ' || t[i+1]` exactly.
    */
  def bigrams(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.documents(s, d))
      .select(graft.functions.TextOps.tokens(col("text")).as("t"))
      // guard BEFORE sequence(): Spark's sequence(1, 0) counts DOWN ([1,0]),
      // it is not empty like DuckDB's generate_series(1, 0)
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("b"))

  /** Exact heavy-hitter bigrams: share ≥ 1/[[ThresholdDen]] of the corpus. */
  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // feeds two consumers (candidate scan, recount); materialized once —
    // at multi-node scale: persist(MEMORY_AND_DISK)
    val bg = bigrams(s, d).localCheckpoint(true)
    val cands = bg.as[String].mapPartitions(misraGries(Counters)).toDF("b").distinct()
    // the corpus bigram COUNT needs no bigram strings at all: each doc
    // with n >= 2 tokens contributes exactly n - 1 occurrences, so one
    // doc-level pass sums it without the explode (r19; same number by
    // construction — bigrams() filters size >= 2 then emits size - 1 rows)
    val total = Tables.fanOut(Tables.documents(s, d))
      .select(size(graft.functions.TextOps.tokens(col("text"))).as("nt"))
      .agg(coalesce(sum(when(col("nt") >= 2, col("nt").cast("long") - 1L)
        .otherwise(0L)), lit(0L)).as("n"))
    bg.join(broadcast(cands), Seq("b"), "left_semi")
      .groupBy("b").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * ThresholdDen >= col("n"))
      .select(col("b").as("bigram"), col("cnt"))
      .orderBy("bigram")
  }

  val heavyHittersSql: String =
    s"""WITH toks AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
       |bg AS (SELECT t[i] || ' ' || t[i+1] AS b
       |       FROM (SELECT t, unnest(generate_series(1, len(t)-1)) AS i
       |             FROM toks WHERE len(t) >= 2)),
       |tot AS (SELECT count(*) AS n FROM bg)
       |SELECT b AS bigram, CAST(count(*) AS BIGINT) AS cnt
       |FROM bg, tot GROUP BY b, n HAVING count(*) * $ThresholdDen >= n
       |ORDER BY bigram""".stripMargin
}
