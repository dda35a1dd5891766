package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, DedupPipeline}

class DedupPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("clusters: connected components with min-id labels") {
    // components: {1,2,3} (chain), {10,11}, singleton pairs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val got = DedupPipeline.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters converge on a long chain (propagation depth)") {
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = DedupPipeline.clusters(chain).as[(Long, Long)].collect()
    assert(got.forall(_._2 == 0L), got.mkString(","))
  }

  test("distributed pointer-jumping path agrees with the driver union-find fast path") {
    // chain + star + two singleton pairs: exercises propagation depth and
    // merge-by-min on both paths
    val pairs = ((0L until 15L).map(i => (i, i + 1)) ++
      Seq((100L, 103L), (100L, 101L), (102L, 100L), (200L, 201L)))
      .toDF("a_id", "b_id")
    val local = DedupPipeline.clusters(pairs).as[(Long, Long)].collect().toMap
    val dist = DedupPipeline.clusters(pairs, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist, s"local=$local dist=$dist")
    assert(local(103L) == 100L && local(201L) == 200L && local(15L) == 0L)
  }

  test("clusters with non-integral (string) ids routes to the distributed path") {
    // the long-decoding driver fast path must not claim these — string ids
    // go through the type-generic pointer-jumping loop even under threshold
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("a_id", "b_id")
    val got = DedupPipeline.clusters(pairs).as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("removeNearDups keeps one canonical doc per planted near-dup cluster") {
    val docs = Tables.documents(spark, sf0001)
    val pairs = DedupOps.ngramJaccardPairs(spark, sf0001, 0.8)
    val cleaned = DedupPipeline.removeNearDups(docs, pairs)
    val pairedDocs = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id").as("doc_id"))).distinct()
    val clusters = DedupPipeline.clusters(pairs)
    val nClusters = clusters.select("cluster_id").distinct().count()
    // removed = paired docs that are not cluster minima
    assert(cleaned.count() == docs.count() - (pairedDocs.count() - nClusters))
    // every removed doc has a surviving representative in its cluster
    val survivors = cleaned.select("doc_id").as[Long].collect().toSet
    clusters.as[(Long, Long)].collect().foreach { case (_, cid) =>
      assert(survivors.contains(cid))
    }
  }

  test("prepare composes the full pipeline with a consistent report") {
    val (cleaned, r) = DedupPipeline.prepare(spark, sf0001)
    assert(r.input == 500)
    assert(r.afterExact == 500)               // no exact dups planted
    assert(r.afterNearDup < r.afterExact)     // near-dups removed
    assert(r.afterQuality <= r.afterNearDup)
    assert(cleaned.count() == r.afterQuality)
    // idempotence: a second pass over the cleaned corpus removes ~nothing
    val pairs2 = DedupOps.ngramJaccardPairs(spark, sf0001, 0.8)
    val again = DedupPipeline.removeNearDups(cleaned, pairs2)
    assert(again.count() == cleaned.count())
  }
}
