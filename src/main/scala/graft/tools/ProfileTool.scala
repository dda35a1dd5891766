package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for stage-level timing of a composed query (dev tool:
  * run with SPARK_GRAFT_SF_DIR; prints per-stage wall times).
  */
object ProfileTool {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.localBuilder("32")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftExtensions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    spark.read.parquet(s"$sfDir/documents.parquet").write.format("noop").mode("overwrite").save()
    val pairs = graft.operators.DedupOps.ngramJaccardPairs(spark, sfDir)
    time("pairs noop")(pairs.write.format("noop").mode("overwrite").save())
    time("pairs noop again")(pairs.write.format("noop").mode("overwrite").save())
    val sel = pairs.select("a_id", "b_id")
    val cp = time("localCheckpoint")(sel.localCheckpoint(true))
    time("count")(cp.count())
    time("full clusters")(graft.operators.DedupPipeline.clusters(pairs).orderBy("doc_id")
      .write.format("noop").mode("overwrite").save())
    time("full clusters again")(graft.operators.DedupPipeline.clusters(pairs).orderBy("doc_id")
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
