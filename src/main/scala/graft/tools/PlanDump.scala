package graft.tools

/** Dev tool: dump `.explain("formatted")` for a list of board queries to
  * one file each — the optimization-round evidence trail (plans/rN/
  * `<query>_before.txt` / `_after.txt`). One JVM for the whole list
  * instead of one sbt invocation per query.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]")
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    new java.io.File(outDir).mkdirs()
    val spark = ScaleBench.session()
    try names.foreach { name =>
      SparkEntry_queries(name) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt", "UTF-8")
          try w.println(plan) finally w.close()
          println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
        case None => println(s"[plandump] UNKNOWN query: $name")
      }
    } finally spark.stop()
  }

  private def SparkEntry_queries(name: String) =
    graft.SparkEntry.queries.get(name)
}
