package graft.catalyst

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the native expressions as SQL functions, making the text
  * surface (`spark.sql("SELECT simhash32(...)")`) first-class.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.catalyst.GraftExtensions` at session build
  *    (the SparkSessionExtensions path, for clusters);
  *  - [[GraftExtensions.register]] on a live session (for libraries/tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => HoistExpensiveProjectAboveSort)
    e.injectOptimizerRule(_ => graft.plans.RollupRewrite)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.catalyst.HashExpressions", null, name, usage,
      "", "", "", "misc_funcs", "", "", "built-in")

  // Wrong-arg-count calls must surface as an analysis error naming the
  // function, not an IndexOutOfBoundsException from `es(1)`.
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression = {
    es =>
      if (es.length != n) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name,
            "expectedNum" -> n.toString,
            "actualNum" -> es.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      build(es)
  }

  // A parameter that must be a non-null foldable integer (e.g. the `k` of
  // minhash_signature). `eval()` on a non-foldable expression throws an
  // unhelpful internal error and a NULL literal NPEs — both must instead be
  // an analysis error naming the function and position.
  private def foldableInt(name: String, pos: Int, e: Expression): Int = {
    if (!e.foldable) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> name,
          "paramName" -> s"argument ${pos + 1}",
          "paramType" -> "an integer literal"))
    }
    e.eval() match {
      case n: Number => n.intValue()
      case _ =>
        // foldable but NULL (or a non-numeric literal): a different diagnosis
        // than non-foldable — NON_FOLDABLE_ARGUMENT's template would tell the
        // user to pass the literal they already passed
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "INVALID_PARAMETER_VALUE.NULL",
          messageParameters = Map(
            "parameter" -> s"argument ${pos + 1}",
            "functionName" -> name))
    }
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash32",
      info("simhash32", "simhash32(tokens) - 32-bit SimHash of an array<string>"),
      arity("simhash32", 1)(es => SimHash32(es.head))),
    ("minhash_signature",
      info("minhash_signature", "minhash_signature(shingles, k) - k-wide md5 MinHash signature"),
      arity("minhash_signature", 2)(es => MinHashSignature(es.head,
        foldableInt("minhash_signature", 1, es(1))))),
    ("shingles3",
      info("shingles3", "shingles3(tokens) - distinct 3-word shingles"),
      arity("shingles3", 1)(es => Shingles3(es.head, distinct = true))),
    ("repetition_stats",
      info("repetition_stats",
        "repetition_stats(tokens) - struct(top_word_frac, top_bigram_frac, ttr)"),
      arity("repetition_stats", 1)(es => RepetitionStats(es.head))),
    ("token_entropy",
      info("token_entropy",
        "token_entropy(tokens) - Shannon entropy (nats) of the token distribution"),
      arity("token_entropy", 1)(es => TokenEntropy(es.head))),
    ("shingle_hashes3",
      info("shingle_hashes3",
        "shingle_hashes3(tokens) - distinct 3-word shingle keys as 64-bit hashes"),
      arity("shingle_hashes3", 1)(es => ShingleHashes3(es.head))),
    ("dot",
      info("dot", "dot(a, b) - double dot product of two float arrays"),
      arity("dot", 2)(es => DotProduct(es.head, es(1)))),
    ("nfc_normalize",
      info("nfc_normalize", "nfc_normalize(str) - Unicode NFC normalization"),
      arity("nfc_normalize", 1)(es => NfcNormalize(es.head))),
    ("count_between",
      info("count_between",
        "count_between(arr, lo, hi) - elements of a double array in [lo, hi]"),
      arity("count_between", 3)(es => CountInRange(es.head, es(1), es(2)))),
    ("jaro_winkler",
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity (DuckDB-compatible)"),
      arity("jaro_winkler", 2)(es => JaroWinkler(es.head, es(1)))),
    ("merge_pair",
      info("merge_pair",
        "merge_pair(syms, l, r) - one greedy non-overlapping BPE merge pass"),
      arity("merge_pair", 3)(es => MergePair(es.head, es(1), es(2)))),
  )

  /** Runtime registration on an existing session. */
  // once per session: register() is called from library entry points that
  // run per-query (e.g. the rollup board queries), and re-replacing every
  // temp function each time costs a registry write + a WARN line per call
  private val registeredSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = {
    if (!registeredSessions.add(spark)) return
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations.contains(HoistExpensiveProjectAboveSort))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ HoistExpensiveProjectAboveSort
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RollupRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RollupRewrite
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerGroupStrategy
  }
}
