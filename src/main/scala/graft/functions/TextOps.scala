package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for the training-data pipeline surface: language
  * ID (n-gram/marker heuristic), quality scoring, token counting, document
  * fingerprinting. All pure `functions._` column expressions — fully
  * codegen'd, no UDFs, no shuffle (per-row projections), so they scale
  * linearly to 100 TB of documents.
  */
object TextOps {

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** 3-word shingles — the native compiled expression
    * ([[graft.catalyst.Shingles3]]); the equivalent
    * `transform(sequence…element_at…)` formulation pays interpreted-lambda
    * cost per element and gets re-inlined wholesale by filter pushdown.
    */
  def shingles3(toks: Column): Column =
    graft.catalyst.HashFunctions.shingles3(toks)

  private val enMarkers = Seq("the", "a", "of", "and", "in", "to", "is")
  private val esMarkers = Seq("el", "la", "de", "y", "en", "que", "los")
  private val deMarkers = Seq("der", "die", "das", "und", "in", "von", "zu")

  private def hits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Fanned-out doc scan already sorted by doc_id, BEFORE the per-doc
    * projections: the range partitioner's reservoir sampler consumes the
    * sort child's full iterator, so any regex/md5 projection placed below
    * the sort is evaluated twice. Sorting the raw (doc_id, text) rows
    * first runs each heavy projection exactly once, post-shuffle.
    */
  private def docsSorted(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.documents(s, d).select("doc_id", "text"))
      .orderBy("doc_id")

  /** Language ID by marker-token voting (a compact stand-in for char-n-gram
    * profiles; same plan shape — per-row array ops, no shuffle).
    */
  def langIdDf(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    docsSorted(s, d)
      .select(
        col("doc_id"),
        hits(t, enMarkers).as("en_hits"),
        hits(t, esMarkers).as("es_hits"),
        hits(t, deMarkers).as("de_hits"))
      .withColumn("lang_pred",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits"), "en")
          .when(col("es_hits") >= col("de_hits"), "es")
          .otherwise("de"))
  }
  val langIdSql: String =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
       |h AS (SELECT doc_id,
       |  len(list_filter(toks, x -> x IN (${enMarkers.map("'" + _ + "'").mkString(",")}))) AS en_hits,
       |  len(list_filter(toks, x -> x IN (${esMarkers.map("'" + _ + "'").mkString(",")}))) AS es_hits,
       |  len(list_filter(toks, x -> x IN (${deMarkers.map("'" + _ + "'").mkString(",")}))) AS de_hits
       |FROM t)
       |SELECT doc_id, en_hits, es_hits, de_hits,
       |  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
       |       WHEN es_hits >= de_hits THEN 'es' ELSE 'de' END AS lang_pred
       |FROM h ORDER BY doc_id""".stripMargin

  /** Language-ID quality evaluation — the confusion matrix of
    * [[langIdDf]]'s n-gram-marker predictions against the corpus's `lang`
    * labels (same QA flavor as [[graft.operators.DedupOps.lshEval]]: every
    * heuristic in the pipeline ships with the query that measures it).
    * One row per (label, prediction) cell with the cell count and the
    * label's row total; per-cell rate is one exact-integer division.
    * Group-count-sized output, fully partial-aggregable.
    */
  def langIdEval(s: SparkSession, d: String): DataFrame = {
    val pred = langIdDf(s, d).select(col("doc_id"), col("lang_pred"))
    val cells = graft.Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("lang").agg(sum("n").as("n_label"))
    cells.join(broadcast(totals), Seq("lang"))
      .withColumn("rate", col("n").cast("double") / col("n_label").cast("double"))
      .orderBy("lang", "lang_pred")
  }

  lazy val langIdEvalSql: String =
    s"""WITH pred AS (SELECT doc_id, lang_pred FROM ($langIdSql)),
       |cells AS (SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
       |          FROM documents d JOIN pred p USING (doc_id) GROUP BY 1, 2),
       |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_label FROM cells GROUP BY 1)
       |SELECT lang, lang_pred, n, n_label,
       |       CAST(n AS DOUBLE) / CAST(n_label AS DOUBLE) AS rate
       |FROM cells JOIN t USING (lang) ORDER BY lang, lang_pred""".stripMargin

  private val stopwords =
    Seq("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")

  /** Flesch-style readability score per document (Flesch 1948 — the
    * public-domain reading-ease formula), with the classic syllable proxy
    * of counting VOWEL GROUPS per word (a regex count — deterministic on
    * Java regex and RE2 alike for this character-class pattern):
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`.
    * Sentences = runs of terminal punctuation, floored at 1. All three
    * counts are exact integers from codegen'd regexp_count projections;
    * the score is one fixed double chain + round. Pure per-row projection,
    * no shuffle — the cheapest member of the quality family, and the
    * second most-quoted after stopword ratio.
    */
  def readabilityDf(s: SparkSession, d: String): DataFrame =
    docsSorted(s, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_words"),
        greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1)).cast("long")
          .as("n_sentences"),
        regexp_count(col("text"), lit("[aeiouyAEIOUY]+")).cast("long")
          .as("n_syllables"))
      // integer-domain rounding (x*100 → round → /100), NOT round(x, 2):
      // Spark's round(double, n) goes through BigDecimal on the EXACT
      // binary value while DuckDB multiplies by 10^n first — a score
      // sitting on the .005 boundary flips between engines (sf0.001 hit
      // one: 85.165→85.16 vs 85.17). Rounding x*100 to an integer is the
      // same IEEE multiply and the same away-from-zero tie rule in both.
      .withColumn("flesch",
        round((lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") / col("n_sentences")) -
          lit(84.6) * (col("n_syllables").cast("double") /
            greatest(col("n_words"), lit(1L)))) * 100).cast("long") / 100.0)
      .orderBy("doc_id")
  val readabilitySql: String =
    """WITH c AS (SELECT doc_id,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
      |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
      |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  CAST(round((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
      |        - 84.6 * (CAST(n_syllables AS DOUBLE) / greatest(n_words, 1))) * 100) AS BIGINT)
      |    / 100.0 + 0.0 AS flesch
      |FROM c ORDER BY doc_id""".stripMargin

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean token
    * length. Ratios are exact integer divisions cast to double + rounded, so
    * the DuckDB oracle hashes identically.
    */
  def qualityDf(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    docsSorted(s, d)
      .select(col("doc_id"), col("text"), length(trim(col("text"))).as("n_chars_t"), t.as("toks"))
      .select(
        col("doc_id"),
        col("n_chars_t"),
        size(col("toks")).as("n_tokens"),
        length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).as("n_punct"),
        size(filter(col("toks"), x => x.isInCollection(stopwords))).as("n_stop"))
      .withColumn("punct_ratio",
        round(col("n_punct").cast("double") / greatest(col("n_chars_t"), lit(1)), 4))
      .withColumn("stop_ratio",
        round(col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1)), 4))
      .withColumn("mean_tok_len",
        round((col("n_chars_t") - (col("n_tokens") - 1)).cast("double") /
          greatest(col("n_tokens"), lit(1)), 4))
  }
  val qualitySql: String =
    s"""WITH b AS (
       |  SELECT doc_id, length(trim(text)) AS n_chars_t,
       |    regexp_split_to_array(trim(text), '\\s+') AS toks,
       |    length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_punct
       |  FROM documents)
       |SELECT doc_id, n_chars_t, len(toks) AS n_tokens, n_punct,
       |  len(list_filter(toks, x -> x IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS n_stop,
       |  round(n_punct * 1.0 / greatest(n_chars_t, 1), 4) AS punct_ratio,
       |  round(len(list_filter(toks, x -> x IN (${stopwords.map("'" + _ + "'").mkString(",")}))) * 1.0 / greatest(len(toks), 1), 4) AS stop_ratio,
       |  round((n_chars_t - (len(toks) - 1)) * 1.0 / greatest(len(toks), 1), 4) AS mean_tok_len
       |FROM b ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation count
    * (letter runs / digit runs / single other non-space = one token each —
    * the usual pre-tokenizer upper bound on BPE piece count).
    */
  def tokenCountDf(s: SparkSession, d: String): DataFrame =
    docsSorted(s, d)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).as("bpeish_tokens"))
  val tokenCountSql: String =
    """SELECT doc_id,
      |  len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-doc Shannon token entropy via the native codegen'd
    * [[graft.catalyst.TokenEntropy]] expression — a single compiled
    * projection where the explode→groupBy formulation would shuffle every
    * token occurrence. Low entropy = boilerplate/repetition, high =
    * diverse text; the filterable complement of [[repetitionDf]]'s
    * top-fractions. Determinism: the expression accumulates `c·ln c` in
    * rounded integer micro-nats (see its Scaladoc), and the oracle replays
    * the identical integer sum.
    */
  def tokenEntropyDf(s: SparkSession, d: String): DataFrame =
    docsSorted(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        round(graft.catalyst.HashFunctions.token_entropy(col("toks")), 4).as("entropy"))
  val tokenEntropySql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |w AS (SELECT doc_id, unnest(toks) AS w FROM t),
      |c AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
      |e AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |        CAST(sum(CAST(round(c * ln(c) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS clnc
      |      FROM c GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
      |  round(ln(e.n) - e.clnc / e.n, 4) AS entropy
      |FROM t JOIN e ON t.doc_id = e.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Gopher-style repetition filter signals, via the native
    * [[graft.catalyst.RepetitionStats]] expression: most-frequent-word
    * fraction, most-frequent-bigram fraction, type-token ratio — one
    * compiled per-row pass (two local hash maps), zero shuffles, vs. the
    * two explode→groupBy pyramids the declarative formulation needs (the
    * oracle SQL below is exactly that pyramid).
    */
  def repetitionDf(s: SparkSession, d: String): DataFrame =
    docsSorted(s, d)
      .select(col("doc_id"),
        graft.catalyst.HashFunctions.repetition_stats(tokens(col("text"))).as("r"))
      .select(col("doc_id"), col("r.top_word_frac"), col("r.top_bigram_frac"), col("r.ttr"))
  val repetitionSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |w AS (SELECT doc_id, unnest(toks) AS w FROM t),
      |wagg AS (SELECT doc_id, CAST(max(c) AS DOUBLE) AS topw, CAST(count(*) AS DOUBLE) AS dw,
      |                CAST(sum(c) AS DOUBLE) AS n
      |         FROM (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2) GROUP BY 1),
      |b AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
      |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i
      |            FROM t WHERE len(toks) >= 2)),
      |bagg AS (SELECT doc_id, CAST(max(c) AS DOUBLE) AS topb, CAST(sum(c) AS DOUBLE) AS nb
      |         FROM (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2) GROUP BY 1)
      |SELECT d.doc_id,
      |  coalesce(topw / n, 0.0) AS top_word_frac,
      |  coalesce(topb / nb, 0.0) AS top_bigram_frac,
      |  coalesce(dw / n, 0.0) AS ttr
      |FROM documents d LEFT JOIN wagg USING (doc_id) LEFT JOIN bagg USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Document chunking for embedding pipelines: fixed token windows
    * (`chunkTokens` wide) advancing by `stride` (< chunkTokens ⇒ overlap),
    * one row per (doc, chunk) with a stable content hash. This is the shape
    * every RAG / embedding-training prep runs before the encoder; at 100 TB
    * it is a pure per-row explode — no shuffle, chunk count bounded by
    * ceil(n_tokens / stride), and the source text column is dropped before
    * anything wide happens downstream.
    */
  def chunkDf(s: SparkSession, d: String,
      chunkTokens: Int = 64, stride: Int = 48): DataFrame =
    docsSorted(s, d)
      // a NULL text chunks to NOTHING (matches the oracle, where the
      // generate_series over a NULL length unnests to zero rows — Spark's
      // size(null) = -1 would otherwise fabricate one junk chunk)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("int").as("chunk_idx"),
        least(col("n") - col("start"), lit(chunkTokens)).as("chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkTokens))))
          .as("chunk_hash"))
      // NO trailing orderBy: docsSorted already emits doc order and the
      // explode preserves it — a re-sort here would double-evaluate the
      // md5/explode projection through the range partitioner's sampling
      // pass (see the docsSorted scaladoc) for an ordering the rows
      // already have
  def chunkSql(chunkTokens: Int = 64, stride: Int = 48): String =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
       |c AS (SELECT doc_id, toks, len(toks) AS n,
       |        unnest(generate_series(0, len(toks) - 1, $stride)) AS start
       |      FROM t)
       |SELECT doc_id, CAST(start // $stride AS INTEGER) AS chunk_idx,
       |  CAST(least(n - start, $chunkTokens) AS INTEGER) AS chunk_tokens,
       |  md5(array_to_string(toks[start + 1 : start + $chunkTokens], ' ')) AS chunk_hash
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** Text normalization — the first stage of every web-corpus pipeline:
    * Unicode NFC (native [[graft.catalyst.NfcNormalize]] expression with an
    * ASCII fast path; Spark has no built-in, DuckDB's `nfc_normalize` is
    * the oracle twin), control characters to spaces, whitespace collapsed,
    * trimmed. Pure per-row projection, fully codegen'd — linear to 100 TB.
    * The control-char class is spelled as explicit hex ranges because Java
    * regex and RE2 disagree on the \\p{Cntrl} shorthand.
    */
  def normalizeDf(s: SparkSession, d: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(graft.catalyst.HashFunctions.nfc_normalize(col("text")),
        "[\\x00-\\x1F\\x7F]", " "),
      "\\s+", " "))
    docsSorted(s, d)
      .select(col("doc_id"), norm.as("norm_text"))
      .withColumn("n_chars_norm", length(col("norm_text")))
  }
  val normalizeSql: String =
    """WITH n AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
      |      '[\x00-\x1F\x7F]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
      |  FROM documents)
      |SELECT doc_id, norm_text, length(norm_text) AS n_chars_norm
      |FROM n ORDER BY doc_id""".stripMargin

  /** Funnel thresholds (C4/Gopher-style): minimum document length,
    * minimum stopword ratio ("is this natural language"), maximum
    * top-word fraction ("is this degenerate repetition").
    */
  val FunnelMinTokens = 15
  val FunnelMinStopRatio = 0.02
  val FunnelMaxTopFrac = 0.12

  /** Quality-filter funnel — the per-rule drop report every corpus
    * curation run publishes: each document gets a FIRST-FAILING-rule
    * verdict (cascade order: too short → too few stopwords → repetitive →
    * pass), then one row per verdict with its document count. The cascade
    * attribution means the stage counts sum to the corpus and each drop is
    * charged to exactly one rule — the number a pipeline operator actually
    * tunes against.
    *
    * Plan: one projection per doc (the repetition signal is the native
    * codegen'd [[graft.catalyst.RepetitionStats]], not an explode pyramid)
    * + one partial-aggregable groupBy over four verdict values. Scales
    * trivially.
    */
  def filterFunnel(s: SparkSession, d: String): DataFrame = {
    val perDoc = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        (size(filter(col("toks"), x => x.isInCollection(stopwords))).cast("double") /
          greatest(size(col("toks")), lit(1))).as("stop_ratio"),
        graft.catalyst.HashFunctions.repetition_stats(col("toks"))
          .getField("top_word_frac").as("top_frac"))
    perDoc
      .withColumn("verdict",
        when(col("n_tokens") < FunnelMinTokens, "drop_too_short")
          .when(col("stop_ratio") < FunnelMinStopRatio, "drop_low_stopword")
          .when(col("top_frac") > FunnelMaxTopFrac, "drop_repetitive")
          .otherwise("pass"))
      .groupBy("verdict").agg(count(lit(1)).as("n_docs"))
      .withColumn("stage",
        when(col("verdict") === "drop_too_short", 1)
          .when(col("verdict") === "drop_low_stopword", 2)
          .when(col("verdict") === "drop_repetitive", 3)
          .otherwise(4))
      .select("stage", "verdict", "n_docs")
      .orderBy("stage")
  }
  val filterFunnelSql: String =
    s"""WITH b AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
       |m AS (SELECT doc_id, len(toks) AS n_tokens,
       |  len(list_filter(toks, x -> x IN (${stopwords.map("'" + _ + "'").mkString(",")}))) * 1.0
       |    / greatest(len(toks), 1) AS stop_ratio,
       |  (SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM UNNEST(toks) AS z(w) GROUP BY w)) * 1.0
       |    / greatest(len(toks), 1) AS top_frac
       |  FROM b),
       |v AS (SELECT CASE WHEN n_tokens < $FunnelMinTokens THEN 'drop_too_short'
       |                  WHEN stop_ratio < $FunnelMinStopRatio THEN 'drop_low_stopword'
       |                  WHEN top_frac > $FunnelMaxTopFrac THEN 'drop_repetitive'
       |                  ELSE 'pass' END AS verdict FROM m)
       |SELECT CAST(CASE verdict WHEN 'drop_too_short' THEN 1 WHEN 'drop_low_stopword' THEN 2
       |            WHEN 'drop_repetitive' THEN 3 ELSE 4 END AS INT) AS stage,
       |  verdict, CAST(count(*) AS BIGINT) AS n_docs
       |FROM v GROUP BY verdict ORDER BY stage""".stripMargin

  /** Boilerplate window width (tokens) and the corpus-fraction document
    * frequency above which a window counts as boilerplate. Fraction-based,
    * not absolute, so the operator means the same thing at every corpus
    * size ("appears in more than 7% of documents").
    */
  val BoilerplateWindow = 2
  val BoilerplateDfFrac = 0.07

  /** C4-style boilerplate span removal — the REMOVAL counterpart of the
    * duplicated-span FRACTION ([[graft.operators.DedupOps]] d_dup_span_frac):
    * token windows whose document frequency exceeds
    * [[BoilerplateDfFrac]]·|corpus| ("terms of service" text, navigation
    * chrome, license headers) are excised from every document, and the
    * text is rebuilt from the surviving tokens.
    *
    * Plan shape at 100 TB: one posexplode over windows (row count ≈ token
    * count), a partial-aggregable doc-frequency count, a semi-join of
    * spans against the (small — boilerplate is by definition few distinct
    * strings) frequent set, and one per-doc rebuild from a collected
    * start-position set bounded by tokens/doc. No all-pairs anywhere; the
    * only driver scalar is the corpus count.
    *
    * One-pass by design (like C4's): excision can make previously
    * non-adjacent tokens adjacent, so the OUTPUT may contain windows that
    * were frequent in the input — rerun the scrub for a fixed point if the
    * downstream consumer needs one.
    */
  /** One excision round over (`doc_id`, `text`): find the windows whose
    * document frequency crosses the `totals`-relative threshold, excise
    * them, rebuild — returns (`doc_id`, `n_spans`, `clean_text`). The
    * token frame is checkpointed so the rebuild's self-join reads one
    * materialization (and, in the fixpoint, so round lineage stays flat).
    */
  private def scrubRound(docs: DataFrame, totals: DataFrame): DataFrame = {
    val w = BoilerplateWindow
    val t = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .localCheckpoint(true)
    // 1-based window starts (matches the oracle's generate_series)
    val spans = t.select(col("doc_id"),
        posexplode(when(size(col("toks")) >= w,
          transform(sequence(lit(1), size(col("toks")) - (w - 1)),
            i => md5(concat_ws(" ", slice(col("toks"), i, lit(w))))))
          .otherwise(array().cast("array<string>"))).as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("start"), col("h"))
    val frequent = spans.groupBy("h")
      .agg(countDistinct("doc_id").as("df"))
      .crossJoin(broadcast(totals))
      .filter(col("df") >= ceil(lit(BoilerplateDfFrac) * col("_corpus_n")))
      .select("h")
    val covered = spans.join(frequent, "h")
      .groupBy("doc_id").agg(collect_set("start").as("starts"))
    t.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(size(col("starts")), lit(0)).as("n_spans"),
        concat_ws(" ", filter(col("toks"), (x, i) =>
          !exists(coalesce(col("starts"), array().cast("array<int>")),
            st => (i + 1) >= st && (i + 1) <= st + (w - 1)))).as("clean_text"))
  }

  def boilerplateScrub(s: SparkSession, d: String): DataFrame = {
    // corpus count folded into the plan (tiny cross join with a 1-row
    // aggregate) — an eager driver-side count() here would run a job at
    // DataFrame-CONSTRUCTION time, once per bench repeat, and make the
    // query unexplainable without executing work
    val totals = Tables.documents(s, d).agg(count(lit(1)).as("_corpus_n"))
    scrubRound(Tables.fanOut(Tables.documents(s, d)), totals)
      .withColumn("n_tokens_kept",
        when(col("clean_text") === "", lit(0))
          .otherwise(size(tokens(col("clean_text")))))
      .orderBy("doc_id")
  }
  val boilerplateScrubSql: String =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
       |sp AS (SELECT doc_id, i AS start, md5(array_to_string(toks[i:i+${BoilerplateWindow - 1}], ' ')) AS h
       |       FROM t CROSS JOIN UNNEST(generate_series(1, len(toks) - ${BoilerplateWindow - 1})) AS u(i)),
       |f AS (SELECT h FROM sp GROUP BY h
       |      HAVING count(DISTINCT doc_id) >= ceil($BoilerplateDfFrac * (SELECT count(*) FROM documents))),
       |cov AS (SELECT doc_id, list(DISTINCT start) AS starts FROM sp JOIN f USING (h) GROUP BY doc_id),
       |r AS (SELECT t.doc_id, t.toks, COALESCE(cov.starts, []) AS starts
       |      FROM t LEFT JOIN cov USING (doc_id)),
       |o AS (SELECT doc_id, CAST(len(starts) AS INT) AS n_spans,
       |        array_to_string(list_transform(
       |          list_filter(generate_series(1, len(toks)),
       |            i -> len(list_filter(starts, st -> i >= st AND i <= st + ${BoilerplateWindow - 1})) = 0),
       |          i -> toks[i]), ' ') AS clean_text
       |      FROM r)
       |SELECT doc_id, n_spans, clean_text,
       |  CASE WHEN clean_text = '' THEN 0
       |       ELSE CAST(len(regexp_split_to_array(clean_text, '\\s+')) AS INT) END AS n_tokens_kept
       |FROM o ORDER BY doc_id""".stripMargin

  /** Fixed-point boilerplate removal: rerun [[scrubRound]] until no window
    * crosses the df threshold, bounded by `maxRounds`. Excision can make
    * previously non-adjacent tokens adjacent, so a single pass may leave
    * (or CREATE) frequent windows — this is the rerun-to-fixed-point loop
    * the one-pass scaladoc above leaves to the caller, made an operator.
    *
    * Per-round excision counts are reported as `n_spans_r1..r{maxRounds}`
    * columns (the funnel-attribution shape of [[filterFunnel]]). A
    * converged corpus makes every later round a structural no-op (no
    * frequent window → nothing excised), so early exit after a zero-span
    * round returns EXACTLY the fixed-`maxRounds` unroll — which is what
    * lets the DuckDB oracle be a plain `maxRounds`-deep CTE chain rather
    * than a recursive query.
    *
    * The frequency threshold stays relative to the ORIGINAL corpus size:
    * documents are shortened, never dropped, so |corpus| is constant
    * across rounds. Driver-side work per round is one scalar sum over the
    * checkpointed round output (the convergence test); rounds are bounded,
    * each is the one-pass plan — posting-list shape, no all-pairs — so the
    * fixpoint inherits the one-pass 100 TB story times a small constant.
    */
  def boilerplateScrubFixpointOver(docs: DataFrame, maxRounds: Int = 3): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val totals = docs.agg(count(lit(1)).as("_corpus_n"))
    var acc = docs.select(col("doc_id"), col("text").as("clean_text"))
    var live = true
    for (r <- 1 to maxRounds) {
      val cn = s"n_spans_r$r"
      if (live) {
        val out = scrubRound(
            acc.select(col("doc_id"), col("clean_text").as("text")), totals)
          .withColumnRenamed("n_spans", cn)
          .localCheckpoint(true)
        live = out.agg(coalesce(sum(col(cn)), lit(0L))).first().getLong(0) > 0L
        acc = acc.drop("clean_text").join(out, "doc_id")
      } else {
        acc = acc.withColumn(cn, lit(0)) // converged: no-op round, no job
      }
    }
    acc
      .withColumn("n_tokens_kept",
        when(col("clean_text") === "", lit(0))
          .otherwise(size(tokens(col("clean_text")))))
      .select(col("doc_id") +: (1 to maxRounds).map(r => col(s"n_spans_r$r")) :+
        col("clean_text") :+ col("n_tokens_kept"): _*)
      .orderBy("doc_id")
  }

  def boilerplateScrubFixpoint(s: SparkSession, d: String,
      maxRounds: Int = 3): DataFrame =
    boilerplateScrubFixpointOver(
      Tables.fanOut(Tables.documents(s, d)).select("doc_id", "text"), maxRounds)

  /** One DuckDB CTE block per round — the SQL twin of [[scrubRound]],
    * reading `text` from `$inCte` and emitting `r$rn_o(doc_id,
    * n_spans_r$rn, text)`. */
  private def scrubRoundSql(inCte: String, rn: Int): String = {
    val w1 = BoilerplateWindow - 1
    s"""r${rn}_t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM $inCte),
       |r${rn}_sp AS (SELECT doc_id, i AS start, md5(array_to_string(toks[i:i+$w1], ' ')) AS h
       |       FROM r${rn}_t CROSS JOIN UNNEST(generate_series(1, len(toks) - $w1)) AS u(i)),
       |r${rn}_f AS (SELECT h FROM r${rn}_sp GROUP BY h
       |      HAVING count(DISTINCT doc_id) >= ceil($BoilerplateDfFrac * (SELECT count(*) FROM documents))),
       |r${rn}_cov AS (SELECT doc_id, list(DISTINCT start) AS starts FROM r${rn}_sp JOIN r${rn}_f USING (h) GROUP BY doc_id),
       |r${rn}_o AS (SELECT t.doc_id, CAST(len(COALESCE(cov.starts, [])) AS INT) AS n_spans_r$rn,
       |        array_to_string(list_transform(
       |          list_filter(generate_series(1, len(t.toks)),
       |            i -> len(list_filter(COALESCE(cov.starts, []), st -> i >= st AND i <= st + $w1)) = 0),
       |          i -> t.toks[i]), ' ') AS text
       |      FROM r${rn}_t t LEFT JOIN r${rn}_cov cov USING (doc_id))""".stripMargin
  }

  val boilerplateScrubFixpointSql: String =
    s"""WITH docs0 AS (SELECT doc_id, text FROM documents),
       |${scrubRoundSql("docs0", 1)},
       |${scrubRoundSql("r1_o", 2)},
       |${scrubRoundSql("r2_o", 3)}
       |SELECT r3.doc_id, r1.n_spans_r1, r2.n_spans_r2, r3.n_spans_r3,
       |  r3.text AS clean_text,
       |  CASE WHEN r3.text = '' THEN 0
       |       ELSE CAST(len(regexp_split_to_array(r3.text, '\\s+')) AS INT) END AS n_tokens_kept
       |FROM r3_o r3 JOIN r2_o r2 USING (doc_id) JOIN r1_o r1 USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: md5 of whitespace-normalized text (exact-dup
    * key) + min-shingle hash (a 1-perm MinHash, the winnowing-style content
    * fingerprint — stable under local edits).
    */
  def fingerprintDf(s: SparkSession, d: String): DataFrame = {
    val norm = regexp_replace(trim(col("text")), "\\s+", " ")
    val sh = shingles3(tokens(col("text")))
    docsSorted(s, d)
      .select(
        col("doc_id"),
        md5(norm).as("fp_exact"),
        array_min(transform(sh, x => md5(x))).as("fp_min_shingle"))
  }
  val fingerprintSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
      |  md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp_exact FROM documents)
      |SELECT doc_id, fp_exact,
      |  list_min(list_transform(
      |    CASE WHEN len(toks) >= 3 THEN
      |      list_transform(generate_series(1, len(toks)-2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |    ELSE [] END, x -> md5(x))) AS fp_min_shingle
      |FROM t ORDER BY doc_id""".stripMargin

  /** zlib compression ratio per document — the Gopher/RefinedWeb quality
    * signal (highly repetitive or templated text compresses far below
    * natural prose; `ratio < threshold` flags it). Not SQL-expressible, so
    * the driver records a rows-only check; determinism and monotonicity
    * are spec-pinned instead (TextAnalysisSpec).
    *
    * Shape: one `mapPartitions` pass, Deflater allocated once per
    * partition and reset per row (the per-partition codec-reuse pattern
    * [[graft.operators.MultimodalOps]] established); no shuffle until the
    * final presentation sort. The blob never re-materializes — only the
    * two integer lengths leave the partition.
    */
  def compressRatio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Tables.fanOut(graft.Tables.documents(s, d))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6, false)
        val buf = new Array[Byte](1 << 16)
        val out = it.map { case (id, text) =>
          val bytes = Option(text).getOrElse("").getBytes("UTF-8")
          deflater.reset(); deflater.setInput(bytes); deflater.finish()
          var total = 0L
          while (!deflater.finished()) total += deflater.deflate(buf)
          (id, bytes.length.toLong, total)
        }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        out
      }
      .toDF("doc_id", "raw_bytes", "zlib_bytes")
      .withColumn("ratio",
        when(col("raw_bytes") === 0, 1.0)
          .otherwise(col("zlib_bytes").cast("double") / col("raw_bytes").cast("double")))
      .withColumn("repetitive", col("ratio") < 0.4)
      .orderBy("doc_id")
  }
}
