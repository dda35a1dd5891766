package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Distributed BPE tokenizer training — the vocabulary-learning step of
  * every modern LLM data pipeline, run as DataFrame ops end-to-end.
  *
  * Scale shape: the ONLY data-scale pass is the word count (explode →
  * partial-aggregated groupBy). Every merge iteration then operates on the
  * DISTINCT-WORD table (vocabulary-sized — millions of rows at web scale,
  * never corpus-sized): adjacent-pair frequencies are a projection +
  * one partial-aggregated groupBy, the winning pair is a 1-row
  * `TakeOrderedAndProject` collect (driver traffic is exactly `merges`
  * rows total), and the merge applies via the codegen'd
  * [[graft.catalyst.MergePair]] expression — greedy left-to-right
  * non-overlapping, the order BPE training and inference both require.
  * The symbol table is localCheckpointed per round so iteration N+1's
  * lineage does not replay rounds 1..N.
  *
  * Determinism: pair ties break lexicographically on (l, r), so the merge
  * table is a pure function of the corpus. Oracle SQL: string `replace`
  * gets greedy non-overlapping merges wrong on overlap runs ("a a a a"
  * must become "aa aa", not "aa a a"), but the greedy pass itself IS
  * SQL-expressible over an exploded symbol table — two matches of (l, r)
  * can only overlap at consecutive positions (which forces r = l), so
  * within each maximal chain of consecutive match positions the greedy
  * scan takes exactly the even offsets. [[bpeTrainSql]]/[[bpeSegmentSql]]
  * replay the full k-round loop that way, unrolled round by round the
  * same way `x_pagerank` unrolls its iterations; [[graft.Round9OpsSpec]]
  * additionally pins the merge table against an independent reference
  * implementation.
  */
object TokenizerOps {

  val Merges = 8

  /** Pair-frequency rows returned by [[bpePairFreqs]] and its oracle — one
    * constant so the Spark LIMIT and the SQL LIMIT cannot desynchronize. */
  val PairTopK = 20

  /** The shared data-scale prelude: distinct-word counts over the corpus
    * (explode → partial-aggregated groupBy). [[bpeTrain]] and
    * [[bpePairFreqs]] must iterate the SAME word table for the
    * kernel-oracle argument to hold, so both call this. */
  private def wordCounts(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.documents(s, d))
      .filter(col("text").isNotNull)
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn `k` BPE merges from the corpus; returns (rank, left, right,
    * freq) — freq is the pair's corpus frequency when it won its round.
    */
  def bpeTrain(s: SparkSession, d: String, k: Int = Merges): DataFrame = {
    import graft.catalyst.HashFunctions.merge_pair
    var words = wordCounts(s, d)
      .select(split(col("word"), "").as("syms"), col("cnt"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(0), size(col("syms")) - 2),
            j => struct(
              element_at(col("syms"), j + 1).as("l"),
              element_at(col("syms"), j + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, f))
        words = words
          .withColumn("syms", merge_pair(col("syms"), lit(l), lit(r)))
          .localCheckpoint(true)
        rank += 1
      }
    }
    import s.implicits._
    merges.toSeq.toDF("rank", "left", "right", "freq").orderBy("rank")
  }

  /** The data-scale kernel of BPE training, exposed alone so the oracle can
    * check it: round-1 adjacent character-pair frequencies over the
    * word-count table, top 20 by (freq desc, l, r). [[bpeTrain]]'s later
    * rounds iterate exactly this shape over merged symbols (covered by the
    * reference-pinned spec — greedy merge application is what SQL cannot
    * express, not the counting).
    */
  def bpePairFreqs(s: SparkSession, d: String, k: Int = PairTopK): DataFrame =
    wordCounts(s, d)
      .filter(length(col("word")) >= 2)
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(
        col("word").substr(col("i"), lit(1)).as("l"),
        col("word").substr(col("i") + 1, lit(1)).as("r"),
        col("cnt"))
      .groupBy("l", "r").agg(sum("cnt").as("freq"))
      .orderBy(col("freq").desc, col("l"), col("r"))
      .limit(k)

  val bpePairFreqsSql: String =
    """WITH wc AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      |        FROM documents WHERE text IS NOT NULL)
      |  GROUP BY word),
      |pairs AS (
      |  SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r, cnt
      |  FROM (SELECT word, cnt, unnest(generate_series(1, length(word) - 1)) AS i
      |        FROM wc WHERE length(word) >= 2))
      |SELECT l, r, CAST(sum(cnt) AS BIGINT) AS freq
      |FROM pairs GROUP BY l, r
      |ORDER BY freq DESC, l, r LIMIT """.stripMargin + PairTopK

  /** Segment the corpus with the learned merges: every word passes through
    * the `k` merges IN RANK ORDER (one greedy pass each — the same
    * application order training used, so encode is consistent with train),
    * all `k` [[graft.catalyst.MergePair]] calls fused into ONE codegen'd
    * projection over the exploded words. Output is per-document subword
    * statistics (all integers — deterministic under any partitioning).
    * At scale this is a map-only pass plus one partial-aggregated groupBy
    * on doc_id; the merge table rides along as `k` literals exactly like a
    * broadcast vocabulary would.
    */
  def bpeSegment(s: SparkSession, d: String, k: Int = Merges): DataFrame = {
    import graft.catalyst.HashFunctions.merge_pair
    val merges = bpeTrain(s, d, k).collect()
      .map(r => (r.getString(1), r.getString(2))) // bounded: ≤ k rows
    val words = Tables.fanOut(Tables.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
    val segmented = merges.foldLeft(split(col("word"), "")) {
      case (syms, (l, r)) => merge_pair(syms, lit(l), lit(r))
    }
    words
      .select(col("doc_id"), length(col("word")).as("n_chars"),
        size(segmented).as("n_subwords"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum("n_chars").as("n_chars"),
        sum("n_subwords").as("n_subwords"))
      .orderBy("doc_id")
  }

  /** The shared oracle prelude: the word-count table, the exploded symbol
    * table `syms_1` (word, cnt, pos, sym), and `k` unrolled merge rounds.
    * Round `i` computes the winning pair `win_i` (top-1 adjacent-pair
    * frequency, ties on (l, r) — the exact [[bpeTrain]] rule), the greedy
    * taken-position set `tk_i` (consecutive match chains via
    * gaps-and-islands, even offsets kept), and the merged table
    * `syms_{i+1}` (taken position concatenates, the position after a taken
    * one drops, positions renumber).
    */
  private def bpeRoundsSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH wc AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      |        FROM documents WHERE text IS NOT NULL)
      |  GROUP BY word),
      |syms_1 AS MATERIALIZED (
      |  SELECT word, cnt, pos, substr(word, pos, 1) AS sym
      |  FROM (SELECT word, cnt, unnest(generate_series(1, length(word))) AS pos
      |        FROM wc))""".stripMargin
    for (i <- 1 to k) {
      sb ++= s""",
        |win_$i AS MATERIALIZED (
        |  SELECT a.sym AS l, b.sym AS r, CAST(sum(a.cnt) AS BIGINT) AS freq
        |  FROM syms_$i a JOIN syms_$i b ON a.word = b.word AND b.pos = a.pos + 1
        |  GROUP BY a.sym, b.sym
        |  ORDER BY freq DESC, l, r LIMIT 1),
        |wins_$i AS MATERIALIZED (
        |  SELECT l, r FROM win_$i
        |  UNION ALL
        |  SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |  WHERE (SELECT count(*) FROM win_$i) = 0),
        |tk_$i AS MATERIALIZED (
        |  SELECT word, pos FROM (
        |    SELECT word, pos, pos - min(pos) OVER (PARTITION BY word, chain) AS off
        |    FROM (SELECT m.word, m.pos,
        |                 m.pos - row_number() OVER (PARTITION BY m.word ORDER BY m.pos) AS chain
        |          FROM (SELECT a.word, a.pos
        |                FROM syms_$i a
        |                JOIN syms_$i b ON a.word = b.word AND b.pos = a.pos + 1
        |                CROSS JOIN wins_$i w
        |                WHERE a.sym = w.l AND b.sym = w.r) m))
        |  WHERE off % 2 = 0),
        |syms_${i + 1} AS MATERIALIZED (
        |  SELECT s.word, s.cnt,
        |         row_number() OVER (PARTITION BY s.word ORDER BY s.pos) AS pos,
        |         CASE WHEN t.pos IS NOT NULL THEN s.sym || w.r ELSE s.sym END AS sym
        |  FROM syms_$i s
        |  CROSS JOIN wins_$i w
        |  LEFT JOIN tk_$i t  ON t.word = s.word AND t.pos = s.pos
        |  LEFT JOIN tk_$i tp ON tp.word = s.word AND tp.pos = s.pos - 1
        |  WHERE tp.pos IS NULL)""".stripMargin
    }
    sb.toString
  }

  // Degenerate-corpus guard (ADVICE r12): `wins_$i` is the CROSS JOIN side
  // — exactly one row always, the winner or a NULL sentinel when the corpus
  // exhausts adjacent pairs before k merges. With the sentinel, the NULL
  // equality in tk_$i takes nothing and syms_{i+1} = syms_$i (identity past
  // the fixpoint), instead of the empty win_$i zeroing every later table
  // while the Spark side still emits per-doc counts. `win_$i` (possibly
  // empty) still feeds bpeTrainSql's rank rows, matching bpeTrain's
  // early-stop.

  /** Oracle for [[bpeTrain]]: the k winners with their ranks. */
  def bpeTrainSql(k: Int = Merges): String = {
    val rows = (1 to k)
      .map(i => s"""SELECT $i AS rank, l AS "left", r AS "right", freq FROM win_$i""")
      .mkString("\n  UNION ALL ")
    bpeRoundsSql(k) + s"\nSELECT * FROM (\n  $rows\n) ORDER BY rank"
  }

  /** Oracle for [[bpeSegment]]: per-distinct-word subword counts off the
    * final symbol table, joined back to the (doc_id, word) occurrence
    * stream — value-identical to applying the merges per occurrence.
    */
  def bpeSegmentSql(k: Int = Merges): String =
    bpeRoundsSql(k) + s""",
      |sw AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS n_sub
      |       FROM syms_${k + 1} GROUP BY word),
      |occ AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      |        FROM documents WHERE text IS NOT NULL)
      |SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(length(occ.word)) AS BIGINT) AS n_chars,
      |       CAST(sum(sw.n_sub) AS BIGINT) AS n_subwords
      |FROM occ JOIN sw USING (word)
      |GROUP BY occ.doc_id ORDER BY occ.doc_id""".stripMargin
}
