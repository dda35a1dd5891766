package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Transparent materialized-rollup rewrite — the query-level twin of
  * [[graft.ingest.PartitionStats]]: a registered pre-aggregated rollup
  * table answers matching COUNT/SUM/MIN/MAX group-bys over its base table
  * without touching base data, and a file-listing fingerprint guard makes
  * staleness degrade to the base scan, never to a wrong answer. This is
  * the classic warehouse "aggregate navigator" (Gray et al. 1997, "Data
  * Cube"; materialized-view rewrite in every serious OLAP engine),
  * expressed as one Catalyst optimizer rule.
  *
  * Subsumption rules (v1, deliberately strict):
  *  - the query scans exactly the registered base path (bare scan or a
  *    column-pruning Project over it — the shape the main optimizer
  *    leaves for [[RollupRewrite]], which runs in the user batch after it);
  *  - every grouping expression is a plain column ⊆ the rollup's grouping
  *    columns (coarser rollups of a finer rollup re-aggregate soundly —
  *    SUM of sums, MIN of mins, MAX of maxes, COUNT(*) as SUM of counts);
  *  - every aggregate is COUNT(*) / COUNT(lit) / SUM / MIN / MAX over a
  *    registered measure, non-distinct, unfiltered. Anything else (AVG,
  *    DISTINCT, expressions over measures, filters) leaves the plan alone
  *    — a missed rewrite is a performance event, a wrong rewrite is a
  *    correctness bug, so every doubt resolves to "don't".
  *
  * Output attributes keep the ORIGINAL exprIds (re-aliased), so parent
  * operators resolve untouched. 100 TB: the rollup is group-NDV-sized —
  * the rewrite turns a full base scan + shuffle into a metadata-priced
  * scan; the freshness probe is one recursive listing of the base path
  * per planning, the same listing the scan itself would perform.
  */
object MaterializedRollup {

  case class Spec(basePath: String, rollupPath: String,
      groupCols: Seq[String], measureCols: Seq[String], baseFp: Long,
      files: Map[String, Long])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  private def qualified(spark: SparkSession, dir: String): String = {
    val (_, p) = graft.ingest.HadoopFs.forPath(spark, dir)
    p.toString
  }

  /** The base table's data files as (full path → length) — the source of
    * both the freshness fingerprint and the incremental-refresh delta.
    */
  private[plans] def listDataFiles(spark: SparkSession, dir: String): Map[String, Long] = {
    val (fs, p) = graft.ingest.HadoopFs.forPath(spark, dir)
    if (!fs.exists(p)) return Map.empty
    val it = fs.listFiles(p, true)
    val b = Map.newBuilder[String, Long]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        b += (f.getPath.toString -> f.getLen)
    }
    b.result()
  }

  /** Order-independent fingerprint of the base table's data files
    * (recursive name+length, xor-folded) — changes exactly when a commit
    * or compaction changes what a scan would read.
    */
  private[plans] def fingerprint(spark: SparkSession, dir: String): Long =
    fingerprintOf(listDataFiles(spark, dir))

  private def fingerprintOf(files: Map[String, Long]): Long =
    files.foldLeft(0L) { case (acc, (f, len)) =>
      acc ^ scala.util.hashing.MurmurHash3.stringHash(s"$f:$len").toLong
    }

  /** Build the rollup parquet (one pass over base: COUNT(*) plus
    * SUM/MIN/MAX per measure, grouped by `groupCols`), stamp the base
    * fingerprint, and register it for [[RollupRewrite]].
    */
  def build(spark: SparkSession, basePath: String, rollupPath: String,
      groupCols: Seq[String], measureCols: Seq[String]): Spec = {
    val base = spark.read.parquet(basePath)
    val aggs = count(lit(1)).as("_cnt") +: measureCols.flatMap(m => Seq(
      sum(col(m)).as(s"_sum_$m"),
      min(col(m)).as(s"_min_$m"),
      max(col(m)).as(s"_max_$m")))
    base.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(rollupPath)
    val files = listDataFiles(spark, basePath)
    val spec = Spec(qualified(spark, basePath), rollupPath, groupCols,
      measureCols, fingerprintOf(files), files)
    registry.put(spec.basePath, spec)
    spec
  }

  /** Bring a registered rollup back to freshness after base writes — the
    * maintenance a production aggregate table runs per ingest cycle.
    * Append-only deltas (new files, nothing removed or resized) merge
    * incrementally: aggregate ONLY the new files and re-combine with the
    * existing rollup (SUM of sums, MIN of mins, MAX of maxes, count
    * addition — delta cost is delta-sized, not base-sized). Anything else
    * (compaction, overwrite, deletes) falls back to a full [[build]] —
    * MIN/MAX are not self-maintainable under deletes (the same boundary
    * `x_ivm_agg` documents). Returns the re-registered spec; a no-op when
    * already fresh.
    */
  def refresh(spark: SparkSession, basePath: String): Spec = {
    val key = qualified(spark, basePath)
    val spec = Option(registry.get(key)).getOrElse(
      throw new IllegalArgumentException(s"no rollup registered for $basePath"))
    val now = listDataFiles(spark, basePath)
    if (now == spec.files) return spec
    val appendOnly = spec.files.forall { case (f, len) => now.get(f).contains(len) }
    if (!appendOnly)
      return build(spark, basePath, spec.rollupPath, spec.groupCols, spec.measureCols)
    val newFiles = (now.keySet -- spec.files.keySet).toSeq.sorted
    val delta = spark.read.parquet(newFiles: _*)
    val aggs = count(lit(1)).as("_cnt") +: spec.measureCols.flatMap(m => Seq(
      sum(col(m)).as(s"_sum_$m"),
      min(col(m)).as(s"_min_$m"),
      max(col(m)).as(s"_max_$m")))
    val deltaRoll = delta.groupBy(spec.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val existing = spark.read.parquet(spec.rollupPath)
    // re-combine, then cast back to the stored schema (decimal SUM widens
    // per re-aggregation; the rollup's column types must stay fixed)
    val mergeAggs = sum("_cnt").cast("long").as("_cnt") +:
      spec.measureCols.flatMap(m => Seq(
        sum(s"_sum_$m").cast(existing.schema(s"_sum_$m").dataType).as(s"_sum_$m"),
        min(s"_min_$m").as(s"_min_$m"),
        max(s"_max_$m").as(s"_max_$m")))
    val merged = existing.unionByName(deltaRoll.select(existing.columns.map(col): _*))
      .groupBy(spec.groupCols.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .localCheckpoint(true) // reads the live rollup dir the write replaces
    merged.write.mode("overwrite").parquet(spec.rollupPath)
    val fresh = spec.copy(baseFp = fingerprintOf(now), files = now)
    registry.put(key, fresh)
    fresh
  }

  def deregister(spark: SparkSession, basePath: String): Unit = {
    registry.remove(qualified(spark, basePath)); ()
  }

  /** Whether a rollup is registered for this base — lets maintenance hooks
    * (ingest commit) refresh opportunistically without knowing specs.
    */
  def registered(spark: SparkSession, basePath: String): Boolean =
    registry.containsKey(qualified(spark, basePath))

  private[plans] def specFor(path: String): Option[Spec] =
    Option(registry.get(path))
}

object RollupRewrite extends Rule[LogicalPlan] {
  import MaterializedRollup._

  /** The base-table scan under an aggregate: the relation itself, or a
    * pure column-pruning Project over it. Returns the scan's root path.
    */
  private def scanPath(plan: LogicalPlan): Option[String] = plan match {
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths match {
          case Seq(one) => Some(one.toString)
          case _ => None
        }
      case _ => None
    }
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      scanPath(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(ge, ae, child, _) =>
      // a failure anywhere (rollup dir mid-refresh, FS hiccup) must decline
      // the rewrite, never fail the query — the base plan is always valid
      (try {
        for {
          path <- scanPath(child)
          spec <- specFor(path)
          rewritten <- tryRewrite(agg, ge, ae, spec)
        } yield rewritten
      } catch { case scala.util.control.NonFatal(_) => None }).getOrElse(agg)
  }

  private def tryRewrite(agg: Aggregate, ge: Seq[Expression],
      ae: Seq[NamedExpression], spec: Spec): Option[LogicalPlan] = {
    val spark = SparkSession.active
    val groupOk = ge.forall {
      case a: AttributeReference => spec.groupCols.contains(a.name)
      case _ => false
    }
    if (!groupOk) return None
    // staleness guard: a base write since build() means the rollup may
    // under-report — fall back to the scan (PartitionStats discipline)
    if (fingerprint(spark, spec.basePath) != spec.baseFp) return None

    val rollupPlan = spark.read.parquet(spec.rollupPath).queryExecution.analyzed
    val byName = rollupPlan.output.map(a => a.name -> a).toMap

    def aggExpr(f: AggregateFunction): Expression =
      AggregateExpression(f, Complete, isDistinct = false)

    // translate one expression; None = not subsumed -> abandon the rewrite
    def tr(e: Expression): Option[Expression] = e match {
      case a: AttributeReference if spec.groupCols.contains(a.name) =>
        byName.get(a.name)
      case ag: AggregateExpression if !ag.isDistinct && ag.filter.isEmpty =>
        ag.aggregateFunction match {
          case Count(Seq(Literal(_, _))) | Count(Seq()) =>
            // COUNT(*) = SUM(_cnt); coalesce keeps Count's non-nullable type
            byName.get("_cnt").map(c =>
              Coalesce(Seq(aggExpr(Sum(c)), Literal(0L, LongType))))
          case Sum(a: AttributeReference, _) if spec.measureCols.contains(a.name) =>
            byName.get(s"_sum_${a.name}").map { c =>
              val s = aggExpr(Sum(c))
              if (s.dataType == ag.dataType) s else Cast(s, ag.dataType)
            }
          case Min(a: AttributeReference) if spec.measureCols.contains(a.name) =>
            byName.get(s"_min_${a.name}").map(c => aggExpr(Min(c)))
          case Max(a: AttributeReference) if spec.measureCols.contains(a.name) =>
            byName.get(s"_max_${a.name}").map(c => aggExpr(Max(c)))
          case _ => None
        }
      case _ => None
    }

    val newGroups = ge.map(g => tr(g))
    val newAggs = ae.map {
      case a: AttributeReference =>
        tr(a).map(na => Alias(na, a.name)(exprId = a.exprId))
      case al @ Alias(inner, name) =>
        tr(inner).map(ni => Alias(ni, name)(exprId = al.exprId))
      case _ => None
    }
    if (newGroups.exists(_.isEmpty) || newAggs.exists(_.isEmpty)) None
    else Some(Aggregate(newGroups.flatten, newAggs.flatten
      .map(_.asInstanceOf[NamedExpression]), rollupPlan, None))
  }
}
