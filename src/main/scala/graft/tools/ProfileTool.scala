package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    spark.read.parquet(s"$sfDir/lineitem.parquet").write.format("noop").mode("overwrite").save()
    val e = graft.operators.GraphOps.edges(spark, sfDir)
    time("edges noop")(e.write.format("noop").mode("overwrite").save())
    time("edges noop again")(e.write.format("noop").mode("overwrite").save())
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = time("eDeg checkpoint")(e.join(broadcast(deg), "src").localCheckpoint(true))
    println(s"[profile] eDeg rows: ${eDeg.count()}")
    time("full pagerank")(graft.operators.GraphOps.pagerank(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    time("full pagerank again")(graft.operators.GraphOps.pagerank(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
