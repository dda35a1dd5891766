package graft.tools

/** Dev micro-benchmark: the fixed driver-side cost of `spark.read.parquet`
  * (file listing + footer schema inference + relation resolution) that
  * every `graft.Tables` call pays, per call — measured against (a) a
  * user-supplied schema (skips inference) and (b) a cached, already
  * resolved DataFrame (skips resolution entirely — the catalog-table
  * analog). Informs whether a Tables-level relation cache is worth it
  * across the 277-query board (~4 runs × ~1.5 tables each).
  *
  * Usage: runMain graft.tools.ReadCost [sfDir] [iters]
  */
object ReadCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 30
    val spark = ScaleBench.session()
    try {
      val tables = Seq("lineitem", "orders", "events", "documents", "customer")
      def time(label: String)(f: => Unit): Unit = {
        f // warm once
        val t0 = System.nanoTime()
        (1 to iters).foreach(_ => f)
        val per = (System.nanoTime() - t0) / 1e6 / iters
        println(f"[readcost] $label%-28s ${per}%8.2f ms/call")
      }
      tables.foreach { t =>
        val path = s"$sfDir/$t.parquet"
        time(s"$t: read.parquet") { spark.read.parquet(path) }
        val sch = spark.read.parquet(path).schema
        time(s"$t: read.schema().parquet") { spark.read.schema(sch).parquet(path) }
        val df = spark.read.parquet(path)
        time(s"$t: cached df reuse") { df.select("*") }
      }
      // end-to-end: a trivial count through a fresh read vs a cached relation
      def timedCount(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
        mk.count()
        val t0 = System.nanoTime()
        (1 to iters).foreach(_ => mk.count())
        val per = (System.nanoTime() - t0) / 1e6 / iters
        println(f"[readcost] $label%-28s ${per}%8.2f ms/count")
      }
      val p = s"$sfDir/orders.parquet"
      timedCount("count via fresh read") { spark.read.parquet(p) }
      val cached = spark.read.parquet(p)
      timedCount("count via cached relation") { cached }
    } finally spark.stop()
  }
}
