package graft.catalyst

import org.apache.spark.sql.catalyst.expressions.{
  Expression, HigherOrderFunction, Levenshtein, Md5, RegExpExtractAll,
  RegExpReplace, ScalaUDF, Sha1, Sha2}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Moves CPU-expensive deterministic projections ABOVE a global sort.
  *
  * A global `Sort` range-partitions its input, and the range partitioner's
  * reservoir sampler drains the child iterator — so every expression in a
  * projection placed below the sort is evaluated twice (once for sampling,
  * once for the real exchange), and the exchange itself moves the projected
  * values. For hash/regex/lambda-heavy projections the rewrite
  *
  *   Sort(order, Project(heavy, child))  →  Project(heavy, Sort(order, child))
  *
  * halves the CPU cost and shuffles the raw columns instead.
  *
  * Guards: only fires when (a) the projection is deterministic, (b) at least
  * one projected expression is on the expensive-CPU allowlist (moving a
  * *narrowing* cheap projection up would just inflate shuffle bytes), and
  * (c) every sort-order reference resolves below the projection (an ORDER BY
  * on a computed alias must stay put).
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule` (and
  * `spark.experimental.extraOptimizations` for live sessions). This encodes
  * the manual restructure applied across the text/dedup query surface as an
  * engine-level guarantee for user-written queries.
  */
object HoistExpensiveProjectAboveSort extends Rule[LogicalPlan] {

  private def isExpensive(e: Expression): Boolean = e.exists {
    case _: RegExpReplace | _: RegExpExtractAll | _: Levenshtein => true
    case _: Md5 | _: Sha1 | _: Sha2                              => true
    case _: HigherOrderFunction                                  => true
    case _: ScalaUDF                                             => true
    case _: SimHash32 | _: MinHashSignature | _: Shingles3       => true
    case _: PairCombos | _: DotProduct | _: EqCount              => true
    case _: RepetitionStats | _: ShingleHashes3 | _: NfcNormalize => true
    // regexp_count / get_json_object live in version-shuffled packages;
    // match by name so the allowlist survives Spark refactors
    case other =>
      val n = other.getClass.getSimpleName
      n == "RegExpCount" || n == "GetJsonObject" || n == "JsonToStructs"
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case sort: Sort if sort.global =>
      sort.child match {
        case Project(projectList, grandchild)
            if projectList.forall(_.deterministic) &&
              projectList.exists(isExpensive) &&
              sort.order.forall(_.references.subsetOf(grandchild.outputSet)) =>
          Project(projectList, sort.copy(child = grandchild))
        case _ => sort
      }
  }
}
