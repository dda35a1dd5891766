package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom-aggregation surface (SURVEY §2.3 "UDF/UDAF/UDTF"):
  * `Aggregator[IN, BUF, OUT]` is the engine's user-defined aggregate API —
  * partial-merge structured (map-side combine works), usable on typed
  * Datasets and registerable for SQL via `spark.udf.register`.
  */
object CustomAggregators {

  /** Volume-weighted average price over (price, size) pairs — the canonical
    * ticker aggregate the reference's Grafana layer would compute.
    */
  object Vwap extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Longest gap (seconds) between consecutive epoch-second observations —
    * a holistic aggregate (needs all values), buffered as a sorted set.
    * Demonstrates a non-trivial BUF type with a real merge.
    */
  object MaxGapSeconds extends Aggregator[Long, List[Long], Long] {
    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], a: Long): List[Long] = a :: b
    override def merge(x: List[Long], y: List[Long]): List[Long] = x ++ y
    override def finish(ts: List[Long]): Long = {
      val sorted = ts.sorted
      if (sorted.size < 2) 0L
      else sorted.zip(sorted.tail).map { case (a, b) => b - a }.max
    }
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
