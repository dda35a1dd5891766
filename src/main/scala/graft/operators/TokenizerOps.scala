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

  // ------------------------------------------------------------------
  // Unigram-LM (SentencePiece) subword tokenizer — Kudo 2018's inference
  // step, with the seed-vocabulary construction Kudo uses to initialize
  // EM (frequent substrings scored by corpus frequency).
  // ------------------------------------------------------------------

  /** Word-length cap (code points) for the unigram board. Structural
    * requirement of the packed-long Viterbi DP ([[graft.catalyst.UnigramSeg]]):
    * piece count must stay < 100, so any cap ≤ 99 is sound; 16 also bounds
    * the oracle's unrolled DP at 16 rounds. */
  val UniMaxWordLen = 16

  /** Longest vocabulary piece (code points). */
  val UniMaxPiece = 4

  /** Multi-character vocabulary budget on top of full single-character
    * coverage. */
  val UniVocabK = 48

  /** Word-count table restricted to the unigram board's length cap —
    * the shared data-scale prelude of [[unigramVocab]] and
    * [[unigramSegment]] (same discipline as [[wordCounts]] for BPE).
    * The ≥ 1 bound matters: Spark's `sequence(1, 0)` is DESCENDING
    * (`[1, 0]`), not empty like DuckDB's `generate_series(1, 0)`, so a
    * zero-length word must never reach the position expansion; the oracle
    * side drops it structurally (empty series / length-≥1 `seg`). */
  private def uniWords(s: SparkSession, d: String): DataFrame =
    wordCounts(s, d).filter(length(col("word")).between(1, UniMaxWordLen))

  /** Train the unigram-LM seed vocabulary: every single character (full
    * coverage — makes every corpus word segmentable by construction) plus
    * the [[UniVocabK]] most frequent substrings of length 2..[[UniMaxPiece]]
    * (ties lexicographic), each costed at `round(1e6·ln(total/freq))`
    * micro-nats — the exact-integer form of the unigram negative
    * log-likelihood, chosen so the Viterbi DP on BOTH engines sums and
    * compares only integers (the single `ln` per vocab entry is the whole
    * float surface, and a cross-engine flip needs `1e6·ln` within ~1e-10
    * of a half-integer).
    *
    * Scale shape: substring extraction runs over the DISTINCT-WORD table
    * (vocabulary-sized, never corpus-sized), one partial-aggregated
    * groupBy; the top-K is a bounded `TakeOrderedAndProject`; the total is
    * a 1-row broadcast stitch.
    */
  def unigramVocab(s: SparkSession, d: String): DataFrame = {
    val subs = uniWords(s, d)
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("cnt"), col("pos"),
        explode(sequence(lit(1), lit(UniMaxPiece))).as("len"))
      .filter(col("pos") + col("len") - 1 <= length(col("word")))
      .select(col("word").substr(col("pos"), col("len")).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("freq"))
      .localCheckpoint(true)
    val vocab = subs.filter(length(col("piece")) === 1)
      .unionAll(subs.filter(length(col("piece")) >= 2)
        .orderBy(col("freq").desc, col("piece")).limit(UniVocabK))
    val tot = vocab.agg(sum("freq").as("total"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), col("freq"),
        round(lit(1e6) * log(col("total").cast("double") / col("freq")))
          .cast("long").as("cost_u"))
      .orderBy("piece")
  }

  /** Segment the corpus with the trained unigram LM: the vocabulary
    * ([[unigramVocab]], collected — bounded at ≤ distinct-chars +
    * [[UniVocabK]] rows) rides into the codegen'd
    * [[graft.catalyst.UnigramSeg]] Viterbi expression as one broadcast-style
    * reference object, so segmentation is a MAP-ONLY projection over the
    * occurrence stream (O(len·maxPiece) hash probes per word, no join, no
    * extra shuffle beyond the final doc_id partial aggregate). Output is
    * per-document word/piece counts plus the exact-integer total cost
    * re-expressed in nats.
    */
  def unigramSegment(s: SparkSession, d: String): DataFrame = {
    import graft.catalyst.HashFunctions.unigram_seg
    val v = unigramVocab(s, d).collect() // bounded: ≤ |chars| + UniVocabK rows
    val pieces = v.map(_.getString(0))
    val costs = v.map(_.getLong(2))
    Tables.fanOut(Tables.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")).between(1, UniMaxWordLen))
      .select(col("doc_id"),
        unigram_seg(col("word"), pieces, costs, UniMaxPiece).as("sg"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("sg.np")).as("n_pieces"),
        // 4-dp half-up in EXACT integers, then one exact-input division:
        // round(Σu/1e6, 4) on a double hits half-way cases (Σu ending in
        // ...50 → x.xxxx5) where Spark's HALF_UP and DuckDB's
        // binary-double rounding disagree by one ulp-of-the-4th-decimal
        // (sf0.001 surfaced 808.97485 → 808.9749 vs 808.9748). Both
        // engines floor-divide the SAME integer, so the final doubles are
        // bit-identical. Σ cost_u ≥ 0 always (ln(total/freq) ≥ 0), so
        // floor division IS half-up here.
        (floor((sum(col("sg.cost_u")) + lit(50)) / lit(100)).cast("long") /
          lit(10000.0)).as("cost_nats"))
      .orderBy("doc_id")
  }

  /** Shared oracle prelude: the capped word table `fw`, the substring
    * frequency table, the selected vocabulary and its integer micro-nat
    * costs `vc` — a line-for-line SQL replay of [[unigramVocab]]. */
  private def uniVocabCte: String = s"""WITH wc AS MATERIALIZED (
    |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
    |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    |        FROM documents WHERE text IS NOT NULL)
    |  GROUP BY word),
    |fw AS MATERIALIZED (SELECT word, cnt FROM wc WHERE length(word) <= $UniMaxWordLen),
    |subs AS MATERIALIZED (
    |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq FROM (
    |    SELECT substr(word, pos, len) AS piece, cnt
    |    FROM (SELECT word, cnt, pos, unnest(generate_series(1, $UniMaxPiece)) AS len
    |          FROM (SELECT word, cnt, unnest(generate_series(1, length(word))) AS pos
    |                FROM fw))
    |    WHERE pos + len - 1 <= length(word))
    |  GROUP BY piece),
    |vocab AS MATERIALIZED (
    |  SELECT piece, freq FROM subs WHERE length(piece) = 1
    |  UNION ALL
    |  SELECT piece, freq FROM (
    |    SELECT piece, freq FROM subs WHERE length(piece) >= 2
    |    ORDER BY freq DESC, piece LIMIT $UniVocabK)),
    |vc AS MATERIALIZED (
    |  SELECT piece, freq,
    |         CAST(round(1000000.0 * ln(CAST(t.total AS DOUBLE) / freq)) AS BIGINT) AS cost_u
    |  FROM vocab CROSS JOIN (SELECT CAST(sum(freq) AS BIGINT) AS total FROM vocab) t)""".stripMargin

  /** Oracle for [[unigramVocab]]. */
  def unigramVocabSql: String =
    uniVocabCte + "\nSELECT piece, freq, cost_u FROM vc ORDER BY piece"

  /** Oracle for [[unigramSegment]]: the Viterbi DP unrolled position by
    * position over the capped word table. `dp_j` holds, per word of length
    * ≥ j, the packed `(min cost)·100 + pieces` of the best segmentation of
    * the first j code points — min over the ≤ [[UniMaxPiece]] pieces that
    * could end at j, exactly [[graft.catalyst.HashUtil.unigramSeg]]'s
    * recurrence, in exact integers (the packed long keeps the
    * (cost asc, pieces asc) lexicographic order both engines replay).
    * Full single-character coverage makes every position reachable, so the
    * LEFT-JOIN-free replay is total on `fw`.
    */
  def unigramSegSql: String = {
    val sb = new StringBuilder(uniVocabCte)
    sb ++= """,
      |dp_0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS val FROM fw)""".stripMargin
    for (j <- 1 to UniMaxWordLen) {
      val branches = (1 to math.min(UniMaxPiece, j)).map { i =>
        s"""SELECT d.word, d.val + v.cost_u * 100 + 1 AS val
           |    FROM dp_${j - i} d JOIN vc v ON v.piece = substr(d.word, ${j - i + 1}, $i)
           |    WHERE length(d.word) >= $j""".stripMargin
      }.mkString("\n    UNION ALL\n    ")
      sb ++= s""",
        |dp_$j AS MATERIALIZED (
        |  SELECT word, min(val) AS val FROM (
        |    $branches
        |  ) GROUP BY word)""".stripMargin
    }
    val seg = (1 to UniMaxWordLen)
      .map(j => s"SELECT word, val FROM dp_$j WHERE length(word) = $j")
      .mkString("\n  UNION ALL ")
    sb ++= s""",
      |seg AS MATERIALIZED (
      |  $seg),
      |occ AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      |        FROM documents WHERE text IS NOT NULL)
      |SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(sg.val % 100) AS BIGINT) AS n_pieces,
      |       CAST((CAST(sum(sg.val // 100) AS BIGINT) + 50) // 100 AS DOUBLE) / 10000.0 AS cost_nats
      |FROM occ JOIN seg sg USING (word)
      |GROUP BY occ.doc_id ORDER BY occ.doc_id""".stripMargin
    sb.toString
  }

  // ------------------------------------------------------------------
  // WordPiece (Schuster & Nakajima 2012; BERT) — greedy longest-match
  // inference over a role-split (word-initial vs "##"-continuation)
  // vocabulary. Completes the subword trilogy next to BPE (merge-rank
  // greedy) and unigram LM (Viterbi min-cost).
  // ------------------------------------------------------------------

  /** Multi-character WordPiece vocabulary budget on top of full per-role
    * single-character coverage. */
  val WpVocabK = 48

  /** Train the WordPiece seed vocabulary: substrings of length
    * 1..[[UniMaxPiece]] are counted PER ROLE — word-initial (pos = 1) vs
    * continuation (pos > 1), BERT's `##` distinction — every single
    * character is kept in each role where it occurs (full coverage makes
    * greedy matching total), plus the [[WpVocabK]] most frequent
    * multi-character pieces across both roles (ties: role, then
    * lexicographic).
    *
    * Scale shape: identical to [[unigramVocab]] — substring extraction over
    * the DISTINCT-WORD table, one partial-aggregated groupBy, a bounded
    * top-K. Nothing here is corpus-sized.
    */
  def wordpieceVocab(s: SparkSession, d: String): DataFrame = {
    val subs = uniWords(s, d)
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("cnt"), col("pos"),
        explode(sequence(lit(1), lit(UniMaxPiece))).as("len"))
      .filter(col("pos") + col("len") - 1 <= length(col("word")))
      .select(col("word").substr(col("pos"), col("len")).as("piece"),
        (col("pos") > 1).as("is_cont"), col("cnt"))
      .groupBy("piece", "is_cont").agg(sum("cnt").as("freq"))
      .localCheckpoint(true)
    subs.filter(length(col("piece")) === 1)
      .unionAll(subs.filter(length(col("piece")) >= 2)
        .orderBy(col("freq").desc, col("is_cont"), col("piece")).limit(WpVocabK))
      .orderBy("piece", "is_cont")
  }

  /** Segment the corpus with the trained WordPiece vocabulary: the two
    * role vocabularies (bounded, collected) ride into the codegen'd
    * [[graft.catalyst.WordPieceSeg]] greedy matcher as reference sets, so
    * segmentation is MAP-ONLY over the occurrence stream — no join, no
    * shuffle beyond the final doc_id partial aggregate. `n_whole` counts
    * words the vocabulary covers in one piece (the tokenizer-fit signal
    * teams track as vocabulary hit rate); piece counts are exact integers,
    * so there is no float surface at all.
    */
  def wordpieceSegment(s: SparkSession, d: String): DataFrame = {
    import graft.catalyst.HashFunctions.wordpiece_seg
    val v = wordpieceVocab(s, d).collect() // bounded: ≤ 2·|chars| + WpVocabK
    val init = v.filter(!_.getBoolean(1)).map(_.getString(0))
    val cont = v.filter(_.getBoolean(1)).map(_.getString(0))
    Tables.fanOut(Tables.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")).between(1, UniMaxWordLen))
      .select(col("doc_id"),
        wordpiece_seg(col("word"), init, cont, UniMaxPiece).as("np"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("np")).as("n_pieces"),
        sum(when(col("np") === 1, 1L).otherwise(0L)).as("n_whole"))
      .orderBy("doc_id")
  }

  /** Tokenizer fertility per language: pieces-per-word and the
    * single-piece (whole-word) hit rate of the trained WordPiece
    * vocabulary, split by the `lang` column — the multilingual-coverage
    * report every shared-vocabulary tokenizer gets judged on (a language
    * whose fertility runs high is under-served by the vocab and its
    * documents tokenize into more, less meaningful pieces).
    *
    * Same map-only inference as [[wordpieceSegment]] (vocab as a reference
    * object), grouped by language instead of document — |langs| output
    * rows, exact integer counts, two guarded divisions at the end.
    */
  def wordpieceFertility(s: SparkSession, d: String): DataFrame = {
    import graft.catalyst.HashFunctions.wordpiece_seg
    val v = wordpieceVocab(s, d).collect()
    val init = v.filter(!_.getBoolean(1)).map(_.getString(0))
    val cont = v.filter(_.getBoolean(1)).map(_.getString(0))
    Tables.fanOut(Tables.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")).between(1, UniMaxWordLen))
      .select(col("lang"),
        wordpiece_seg(col("word"), init, cont, UniMaxPiece).as("np"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("np")).as("n_pieces"),
        sum(when(col("np") === 1, 1L).otherwise(0L)).as("n_whole"))
      .select(col("lang"), col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast("double") / col("n_words"), 4).as("fertility"),
        round(col("n_whole").cast("double") / col("n_words"), 4).as("whole_rate"))
      .orderBy("lang")
  }

  /** Oracle for [[wordpieceFertility]]: the [[wordpieceSegSql]] greedy
    * replay re-aggregated by language. */
  def wordpieceFertilitySql: String = {
    val base = wordpieceSegSql
    val cut = base.lastIndexOf("occ AS")
    base.substring(0, cut) +
      s"""occ AS (SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
         |        FROM documents WHERE text IS NOT NULL)
         |SELECT occ.lang, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(sg.np) AS BIGINT) AS n_pieces,
         |       round(CAST(sum(sg.np) AS DOUBLE) / count(*), 4) AS fertility,
         |       round(CAST(sum(CASE WHEN sg.np = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |             / count(*), 4) AS whole_rate
         |FROM occ JOIN seg sg USING (word)
         |GROUP BY occ.lang ORDER BY occ.lang""".stripMargin
  }

  /** Shared oracle prelude: capped words `fw` and the role-split WordPiece
    * vocabulary `wpv` — a line-for-line SQL replay of [[wordpieceVocab]]. */
  private def wpVocabCte: String = s"""WITH wc AS MATERIALIZED (
    |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
    |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    |        FROM documents WHERE text IS NOT NULL)
    |  GROUP BY word),
    |fw AS MATERIALIZED (SELECT word, cnt FROM wc WHERE length(word) <= $UniMaxWordLen),
    |subs AS MATERIALIZED (
    |  SELECT piece, is_cont, CAST(sum(cnt) AS BIGINT) AS freq FROM (
    |    SELECT substr(word, pos, len) AS piece, pos > 1 AS is_cont, cnt
    |    FROM (SELECT word, cnt, pos, unnest(generate_series(1, $UniMaxPiece)) AS len
    |          FROM (SELECT word, cnt, unnest(generate_series(1, length(word))) AS pos
    |                FROM fw))
    |    WHERE pos + len - 1 <= length(word))
    |  GROUP BY piece, is_cont),
    |wpv AS MATERIALIZED (
    |  SELECT piece, is_cont, freq FROM subs WHERE length(piece) = 1
    |  UNION ALL
    |  SELECT piece, is_cont, freq FROM (
    |    SELECT piece, is_cont, freq FROM subs WHERE length(piece) >= 2
    |    ORDER BY freq DESC, is_cont, piece LIMIT $WpVocabK))""".stripMargin

  /** Oracle for [[wordpieceVocab]]. */
  def wordpieceVocabSql: String =
    wpVocabCte + "\nSELECT piece, is_cont, freq FROM wpv ORDER BY piece, is_cont"

  /** Oracle for [[wordpieceSegment]]: the greedy longest-match scan
    * unrolled step by step over the capped word table — step `i` advances
    * every unfinished word by its LONGEST matching piece (max over an
    * equi-join of the candidate substring against the role's vocabulary,
    * exactly [[graft.catalyst.HashUtil.wordpieceSeg]]'s rule). Each step
    * consumes ≥ 1 code point, so [[UniMaxWordLen]] steps finish every word;
    * full per-role single-character coverage makes the scan total (no UNK
    * branch needed in the replay).
    */
  def wordpieceSegSql: String = {
    val sb = new StringBuilder(wpVocabCte)
    sb ++= """,
      |st_0 AS MATERIALIZED (SELECT word, 0 AS pos, 0 AS np FROM fw)""".stripMargin
    for (i <- 1 to UniMaxWordLen) {
      sb ++= s""",
        |st_$i AS MATERIALIZED (
        |  SELECT word, pos, np FROM st_${i - 1} WHERE pos >= length(word)
        |  UNION ALL
        |  SELECT m.word, m.pos + m.len AS pos, m.np + 1 AS np
        |  FROM (SELECT s.word, s.pos, s.np, max(length(v.piece)) AS len
        |        FROM st_${i - 1} s JOIN wpv v
        |          ON v.is_cont = (s.pos > 0)
        |         AND v.piece = substr(s.word, s.pos + 1, length(v.piece))
        |        WHERE s.pos < length(s.word)
        |        GROUP BY s.word, s.pos, s.np) m)""".stripMargin
    }
    sb ++= s""",
      |seg AS MATERIALIZED (
      |  SELECT word, np FROM st_$UniMaxWordLen WHERE length(word) >= 1),
      |occ AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      |        FROM documents WHERE text IS NOT NULL)
      |SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(sg.np) AS BIGINT) AS n_pieces,
      |       CAST(sum(CASE WHEN sg.np = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_whole
      |FROM occ JOIN seg sg USING (word)
      |GROUP BY occ.doc_id ORDER BY occ.doc_id""".stripMargin
    sb.toString
  }
}
