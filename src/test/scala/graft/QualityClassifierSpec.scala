package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Distributed logistic-regression quality classifier: trainer convergence,
  * scoring behavior, and the plan shape of the oracled funnel.
  */
class QualityClassifierSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf0001)

  test("train learns a feature-derived label to high accuracy, loss monotone") {
    // label = stopword ratio above its corpus-wide mean — linearly separable
    // in the feature space by construction, so GD MUST find it; this
    // validates the gradient machinery, not the corpus.
    val labeled = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), QualityClassifier.featureExprs(2).as("sr"))
    val cut = labeled.agg(avg("sr")).first().getDouble(0)
    val withY = labeled.withColumn("y", (col("sr") > cut).cast("int"))

    val m = QualityClassifier.train(withY, col("y"), iters = 60, lr = 1.0)

    assert(m.weights.length == QualityClassifier.featureNames.length)
    assert(m.losses.length == 60)
    assert(m.losses.forall(l => java.lang.Double.isFinite(l)))
    // lr=1.0 is below the logistic descent bound for standardized features:
    // the loss curve must be strictly monotone decreasing, start near
    // ln 2 (w=0), and end well below it
    m.losses.sliding(2).foreach { p => assert(p(1) < p(0), s"${p(0)} -> ${p(1)}") }
    assert(math.abs(m.losses.head - math.log(2.0)) < 0.2)
    assert(m.losses.last < 0.3, s"final loss ${m.losses.last}")

    val scored = QualityClassifier.score(withY, m)
      .select(col("y"), (col("quality_p") > 0.5).cast("int").as("pred"))
    val acc = scored.agg(avg((col("y") === col("pred")).cast("double")))
      .first().getDouble(0)
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("score: null text yields null scores, not fabricated features") {
    import spark.implicits._
    val m = QualityClassifier.LRModel(
      Array(1.0, 0, 0, 0, 0, 0), 0.0,
      Array.fill(6)(0.0), Array.fill(6)(1.0), Array(0.0))
    val df = Seq((1L, "the quick fox"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = QualityClassifier.score(df, m).orderBy("doc_id").collect()
    assert(rows.length == 2) // scoring keeps every row
    assert(!rows(0).isNullAt(rows(0).fieldIndex("quality_z")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("quality_z")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("quality_p")))
  }

  test("score round-trips training separation: positives score above negatives") {
    val labeled = docs.filter(col("text").isNotNull)
      .withColumn("y", (length(trim(col("text"))) > 250).cast("int"))
    val m = QualityClassifier.train(labeled, col("y"), iters = 60)
    val mp = QualityClassifier.score(labeled, m)
      .groupBy("y").agg(avg("quality_p").as("p")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(mp(1) > mp(0) + 0.3, s"separation $mp")
  }

  test("funnel plan: partial aggregation, no window/cartesian, pruned scan") {
    val plan = QualityClassifier.lrFunnel(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    // partial + final pair around one exchange (plus the sort for orderBy)
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"), plan)
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("text") && read.contains("source"), read)
    assert(!read.contains("doc_id") && !read.contains("lang"), read)
  }

  test("funnel totals: every non-null doc lands in exactly one bucket") {
    val f = QualityClassifier.lrFunnel(spark, sf0001)
      .agg(sum("n_docs").as("n"), sum("n_keep").as("k")).first()
    val expected = docs.filter(col("text").isNotNull).count()
    assert(f.getLong(0) == expected)
    assert(f.getLong(1) > 0 && f.getLong(1) < expected, f)
  }
}
