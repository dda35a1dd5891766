package graft

import java.math.RoundingMode

import org.apache.spark.sql.DataFrame

import graft.operators.GraphOps

/** Randomized differential tests for the graph family — the round-16
  * extension of the method that found the live ANSI DIVIDE_BY_ZERO class
  * in the stats family: seeded adversarial graphs (self-loops, duplicate
  * edges, sink-only nodes, isolated seed vertices, star/chain extremes,
  * disconnected components straddling the iteration caps) run through the
  * engine's public operators, compared against independent driver-side
  * brute forces of each operator's DOCUMENTED integer-domain conventions
  * (nano-space PageRank rounding, HUGEINT HITS with final floor-div ppm,
  * smallest-label LPA tie resolution, row-count k-core degrees, the
  * p75-degree order statistic).
  *
  * The DuckDB oracle gates these operators on the FIXED driver warehouse
  * (CORRECTNESS_r*.json) — one data shape, no self-loops, no duplicate
  * edges, every component reachable. These seeds cover the shapes that
  * data never produces. First live find: [[GraphOps.assortativity]]'s
  * Pearson finisher divided by a raw `/`, so a star corpus (every
  * customer exactly one supplier — zero degree variance) ANSI-killed the
  * job; fixed via the NumOps.safeDiv NULL contract, mirrored by the
  * oracle's natural x/0 → NULL.
  */
class RandomizedGraphDifferentialSpec extends SparkSpec {
  import spark.implicits._

  // ---- shared conventions --------------------------------------------------

  /** Spark's `round(double)` at scale 0: HALF_UP (half away from zero). */
  private def hup0(d: Double): Long =
    java.math.BigDecimal.valueOf(d).setScale(0, RoundingMode.HALF_UP).longValue()

  /** Public node label for a packed id — [[GraphOps.label]]'s convention. */
  private def labelOf(n: Long): String =
    if (n % 2 == 0) "c" + (n / 2) else "s" + (n / 2)

  /** NaN-equal double equality for the assortativity chain. */
  private def dEq(a: Double, b: Double): Boolean =
    java.lang.Double.compare(a, b) == 0

  private def edgesDf(e: Seq[(Long, Long)]): DataFrame =
    e.toDF("src", "dst")

  // ---- Part A: the public loop helpers on crafted + seeded graphs ---------

  /** lpaOver's synchronous update, driver-side: labels start as the SRC
    * node set; each round every dst with an in-edge from a labeled src
    * adopts the incoming label with the highest ROW-count vote, ties to
    * the smallest label; nodes receiving no votes DROP OUT (the frame is
    * replaced, not merged) — so duplicate edges vote multiply and a
    * sink-only node never carries a label.
    */
  private def lpaBrute(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    var lbl: Map[Long, Long] = edges.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = edges.filter(e => lbl.contains(e._1))
        .groupBy(_._2)
        .map { case (dst, es) =>
          val votes = es.groupBy(e => lbl(e._1)).view.mapValues(_.size.toLong)
          dst -> votes.maxBy { case (l, c) => (c, -l) }._1
        }
    }
    lbl
  }

  /** bfsHopsOver driver-side: min-hop from the seed set over DIRECTED
    * edges, capped at maxHop, early exit on an exhausted frontier.
    * Isolated seeds stay at hop 0; duplicate edges are irrelevant.
    */
  private def bfsBrute(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHop: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    var visited = seeds.distinct.map(_ -> 0L).toMap
    var frontier = seeds.distinct.toSet
    var i = 1
    var done = false
    while (i <= maxHop && !done) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil)) -- visited.keySet
      if (next.isEmpty) done = true
      else { visited ++= next.map(_ -> i.toLong); frontier = next }
      i += 1
    }
    visited
  }

  /** kCoreOver driver-side: degree = ROW count per src (duplicate edges
    * and self-loops each count once per row — the documented convention;
    * the board feeds it distinct symmetric edges so nothing leaks), keep
    * nodes with degree >= k, fixpoint when nothing is peeled, the rounds
    * cap stops a still-shrinking peel exactly where the engine stops.
    */
  private def kcoreBrute(edges: Seq[(Long, Long)], k: Long,
      rounds: Int): Map[Long, Long] = {
    var cur = edges
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val deg = cur.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      if (keep.size == deg.size) done = true
      else { cur = cur.filter(e => keep(e._1) && keep(e._2)); r += 1 }
    }
    cur.groupBy(_._1).view.mapValues(_.size.toLong).toMap
  }

  private def lpaOf(e: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphOps.lpaOver(edgesDf(e), iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def bfsOf(e: Seq[(Long, Long)], seeds: Seq[Long], maxHop: Int): Map[Long, Long] =
    GraphOps.bfsHopsOver(edgesDf(e), seeds.toDF("node"), maxHop).collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("hop").longValue()).toMap

  private def kcoreOf(e: Seq[(Long, Long)], k: Long, rounds: Int): Map[Long, Long] =
    GraphOps.kCoreOver(edgesDf(e), k, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Seeded random multigraph: node ids with gaps, duplicate edges,
    * self-loops, and a guaranteed sink-only node (in-edges, no out-edges).
    */
  private def randomGraph(seed: Int): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed * 104729 + 7)
    val ids = r.shuffle((0L to 19L).toList).take(8 + r.nextInt(6))
    val m = 12 + r.nextInt(15)
    val bulk = Seq.fill(m) {
      val s = ids(r.nextInt(ids.size))
      val d = if (r.nextInt(10) == 0) s else ids(r.nextInt(ids.size)) // ~10% self-loops
      (s, d)
    }
    val dups = Seq.fill(3)(bulk(r.nextInt(bulk.size)))  // exact duplicate rows
    val sink = 777L                                     // never a src (dst-only)
    val sinkIn = Seq((ids.head, sink), (ids.last, sink))
    val sourceOnly = Seq((555L, ids.head))              // never a dst (no in-edges)
    r.shuffle(bulk ++ dups ++ sinkIn ++ sourceOnly)
  }

  private val loopSeeds = Seq(3, 19, 41, 57, 73, 88, 101, 123)

  test("lpaOver == synchronous smallest-label brute force (self-loops, dup edges, sinks)") {
    // crafted: self-loop voting for itself, duplicate edges double-voting,
    // a sink that holds a label for exactly zero rounds
    val crafted = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (4L, 4L))
    assert(lpaOf(crafted, 3) == lpaBrute(crafted, 3))
    // iteration-count sensitivity: 1 and 2 rounds too, not just the default
    assert(lpaOf(crafted, 1) == lpaBrute(crafted, 1))
    val sinkLabeled = loopSeeds.map { s =>
      val g = randomGraph(s)
      val got = lpaOf(g, 3)
      val want = lpaBrute(g, 3)
      assert(got == want, s"lpa seed $s: got $got want $want")
      // a node with no in-edges NEVER receives votes: the synchronous
      // replace-not-merge update must drop it after round 1, every seed
      assert(!got.contains(555L), "a node with no in-edges must drop out")
      got.contains(777L)
    }
    // the dst-only sink is labeled exactly when its in-neighbors still
    // hold labels at the last round — seed-dependent; the seed set must
    // exercise the labeled case (the unlabeled one is 555's invariant)
    assert(sinkLabeled.contains(true), "no seed labeled the dst-only sink")
  }

  test("bfsHopsOver == min-hop brute force (isolated seeds, chain past the cap)") {
    // directed chain 1->2->...->6 with maxHop 3: nodes 5,6 are REACHABLE
    // but beyond the cap — they must be absent, not at a clamped hop
    val chain = (1L to 5L).map(i => (i, i + 1))
    val gotChain = bfsOf(chain, Seq(1L), 3)
    assert(gotChain == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    assert(gotChain == bfsBrute(chain, Seq(1L), 3))
    // an isolated seed (no edges touch it) stays at hop 0; duplicate seeds dedup
    val gotIso = bfsOf(chain, Seq(1L, 999L, 999L), 3)
    assert(gotIso(999L) == 0L && gotIso == bfsBrute(chain, Seq(1L, 999L), 3))
    loopSeeds.foreach { s =>
      val g = randomGraph(s)
      val seeds = Seq(g.head._1, 888L) // one real seed + one isolated
      val got = bfsOf(g, seeds, 3)
      val want = bfsBrute(g, seeds, 3)
      assert(got == want, s"bfs seed $s: got $got want $want")
      assert(got(888L) == 0L)
    }
  }

  test("kCoreOver == capped peeling brute force (dup-edge degrees, cap binding)") {
    // symmetric star, k=2: leaves have degree 1, so round 1 keeps only the
    // center — and BOTH semi-joins then empty the edge set (the center's
    // edges all point at peeled leaves), so the 2-core empties in ONE
    // round, not the "leaves then center" two-round intuition
    val star = (1L to 6L).flatMap(i => Seq((0L, i), (i, 0L)))
    assert(kcoreOf(star, 2, 8) == kcoreBrute(star, 2, 8))
    assert(kcoreOf(star, 2, 8).isEmpty, "star 2-core must be empty")
    // the ROUNDS CAP binding: a symmetric path peels ONE endpoint layer
    // per round, so rounds=1 must stop mid-shrink exactly where the brute
    // force stops (inner path 2..6, new endpoints still degree 1)
    val path = (1L to 6L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val gotCapped = kcoreOf(path, 2, 1)
    assert(gotCapped == kcoreBrute(path, 2, 1))
    assert(gotCapped.nonEmpty, "a capped peel must stop mid-shrink, not run to fixpoint")
    assert(kcoreOf(path, 2, 8) == kcoreBrute(path, 2, 8))
    assert(kcoreOf(path, 2, 8).isEmpty, "the full path peel must reach the empty fixpoint")
    // k=0 is an immediate fixpoint: everything kept, degrees = row counts
    // (duplicate edges and self-loops each count per row)
    val multi = Seq((1L, 2L), (1L, 2L), (2L, 1L), (3L, 3L), (3L, 1L))
    assert(kcoreOf(multi, 0, 8) == kcoreBrute(multi, 0, 8))
    assert(kcoreOf(multi, 0, 8)(1L) == 2L, "duplicate rows must both count toward degree")
    loopSeeds.take(5).foreach { s =>
      val g = randomGraph(s)
      val got = kcoreOf(g, 2, 8)
      val want = kcoreBrute(g, 2, 8)
      assert(got == want, s"kcore seed $s: got $got want $want")
    }
  }

  // ---- Part B: board queries on randomized mini warehouses ----------------

  private case class Li(ok: Long, sk: Long, pk: Long)
  private case class Or(ok: Long, ck: Long)

  /** Seeded mini warehouse with every adversarial shape the fixed driver
    * data lacks: duplicate lineitem rows (parallel edges must collapse
    * through the DISTINCT incidence), degree-1 star customers on a hub
    * supplier, an orphan lineitem (order key absent from orders — dropped
    * by the join in both engines, but PRESENT in the part co-purchase
    * graph which never joins orders), a disconnected part pool, and an
    * isolated size-50 part that seeds BFS but touches no edge.
    */
  private def genWarehouse(seed: Int): (Seq[Li], Seq[Or], Seq[(Long, Int)]) = {
    val r = new scala.util.Random(seed * 7919 + 13)
    val nCust = 5 + r.nextInt(5)
    val nSupp = 4 + r.nextInt(4)
    val nOrd = 25 + r.nextInt(20)
    val poolA = (101L to 112L).toIndexedSeq
    val poolB = (201L to 206L).toIndexedSeq
    val orders = (1 to nOrd).map(i => Or(i.toLong, 1L + r.nextInt(nCust)))
    val starOrders = (1 to 3).map(i => Or((nOrd + i).toLong, (nCust + i).toLong))
    val li = scala.collection.mutable.Buffer.empty[Li]
    orders.foreach { o =>
      val inB = o.ok % 9 == 0
      val pool = if (inB) poolB else poolA
      val nl = if (inB) 2 + r.nextInt(3) else 1 + r.nextInt(4)
      (1 to nl).foreach { _ =>
        val row = Li(o.ok, 1L + r.nextInt(nSupp), pool(r.nextInt(pool.size)))
        li += row
        if (r.nextInt(4) == 0) li += row
      }
    }
    starOrders.foreach { o => li += Li(o.ok, (nSupp + 1).toLong, poolA(r.nextInt(poolA.size))) }
    li += Li(99999L, 1L, poolA.head) // orphan: no matching order row
    val parts = (poolA ++ poolB :+ 999L).map { pk =>
      val size = if (pk == 999L || pk == poolA.head || pk == poolB.head) 50
        else 1 + r.nextInt(49)
      (pk, size)
    }
    (li.toSeq, orders ++ starOrders, parts)
  }

  private def writeWarehouse(seed: Int): (String, Seq[Li], Seq[Or], Seq[(Long, Int)]) = {
    val dir = tmpDir(s"gdiff$seed")
    val (li, or, pa) = genWarehouse(seed)
    li.map(l => (l.ok, l.sk, l.pk)).toDF("l_orderkey", "l_suppkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    or.map(o => (o.ok, o.ck)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    pa.toDF("p_partkey", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    (dir, li, or, pa)
  }

  private val whSeeds = Seq(7, 29, 63)
  private lazy val minis = whSeeds.map(writeWarehouse)

  /** The distinct packed customer↔supplier incidence (cust = 2c, supp =
    * 2s+1), orphan lineitems dropped by the orders join.
    */
  private def pairsOf(li: Seq[Li], or: Seq[Or]): Set[(Long, Long)] = {
    val ck = or.map(o => o.ok -> o.ck).toMap
    li.flatMap(l => ck.get(l.ok).map(c => (2 * c, 2 * l.sk + 1))).toSet
  }

  private def symEdges(pairs: Set[(Long, Long)]): Seq[(Long, Long)] =
    pairs.toSeq.flatMap { case (c, s) => Seq((c, s), (s, c)) }

  /** Distinct u<v co-purchase edges over per-order DISTINCT part sets. */
  private def coEdgesOf(li: Seq[Li]): Set[(Long, Long)] =
    li.groupBy(_.ok).values.flatMap { rows =>
      val ps = rows.map(_.pk).distinct.sorted
      for { i <- ps.indices; j <- (i + 1) until ps.size } yield (ps(i), ps(j))
    }.toSet

  test("pagerank == integer nano-space brute force (star component, parallel-edge collapse)") {
    minis.foreach { case (dir, li, or, _) =>
      val pairs = pairsOf(li, or)
      val e = symEdges(pairs)
      val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nodes = e.map(_._1).distinct
      val n = nodes.size.toLong
      var rank: Map[Long, Long] = nodes.map(nd => nd -> hup0(1.0e9 / n)).toMap
      for (_ <- 1 to GraphOps.Iterations) {
        val inSum = e.map { case (s, d) => d -> hup0(rank(s).toDouble / outdeg(s)) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum)
        rank = inSum.map { case (d, is) =>
          d -> hup0(0.15 * 1.0e9 / n + 0.85 * is.toDouble)
        }.toMap
      }
      val want = rank.toSeq.map { case (nd, v) => (labelOf(nd), v) }
        .sortBy { case (l, v) => (-v, l) }.take(GraphOps.TopN)
      val got = GraphOps.pagerank(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == want, s"pagerank $dir:\ngot  $got\nwant $want")
      // the star customers exist, are degree-1, and received rank mass
      assert(got.exists(_._1.startsWith("c")) && got.exists(_._1.startsWith("s")))
    }
  }

  test("hits == exact-HUGEINT brute force with floor-div ppm") {
    minis.foreach { case (dir, li, or, _) =>
      val pairs = pairsOf(li, or)
      var h: Map[Long, BigInt] = pairs.map(_._1).map(_ -> BigInt(1)).toMap
      var a: Map[Long, BigInt] = Map.empty
      for (_ <- 1 to GraphOps.Iterations) {
        a = pairs.toSeq.groupBy(_._2).view
          .mapValues(_.map(p => h(p._1)).sum).toMap
        h = pairs.toSeq.groupBy(_._1).view
          .mapValues(_.map(p => a(p._2)).sum).toMap
      }
      def top(m: Map[Long, BigInt], kind: String): Seq[(String, String, Long)] = {
        val mx = m.values.max
        m.toSeq.map { case (nd, v) => (kind, labelOf(nd), ((v * 1000000) / mx).toLong) }
          .sortBy { case (_, l, p) => (-p, l) }.take(10)
      }
      val want = (top(a, "auth") ++ top(h, "hub"))
        .sortBy { case (k, l, p) => (k, -p, l) }
      val got = GraphOps.hits(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == want, s"hits $dir:\ngot  $got\nwant $want")
      assert(got.exists(_._3 == 1000000L), "each side's max must land at exactly 1e6 ppm")
    }
  }

  test("lpaCommunities == brute force over the packed symmetric incidence") {
    minis.foreach { case (dir, li, or, _) =>
      val e = symEdges(pairsOf(li, or))
      val want = lpaBrute(e, GraphOps.LpaIterations).toSeq
        .map { case (n, l) => (labelOf(n), labelOf(l)) }.sortBy(_._1)
      val got = GraphOps.lpaCommunities(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(got == want, s"lpa $dir:\ngot  $got\nwant $want")
    }
  }

  test("kCore == p75-order-statistic k + capped peeling brute force") {
    minis.foreach { case (dir, li, or, _) =>
      val e = symEdges(pairsOf(li, or))
      val degs = e.groupBy(_._1).values.map(_.size.toLong).toSeq.sorted
      val n = degs.size.toLong
      val k75 = (3 * n + 3) / 4
      val k = degs((k75 - 1).toInt)
      val want = kcoreBrute(e, k, GraphOps.KCoreRounds).toSeq
        .map { case (nd, d) => (labelOf(nd), d) }
        .sortBy { case (l, d) => (-d, l) }
      val got = GraphOps.kCore(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == want, s"kcore $dir (k=$k):\ngot  $got\nwant $want")
    }
  }

  test("triangles == naive u<v<w brute force (orphan lineitem INCLUDED, dup lines collapse)") {
    minis.foreach { case (dir, li, _, _) =>
      val coE = coEdgesOf(li)
      // naive exact count, orientation-independent: for each edge (u,v)
      // with u<v, the third vertex w > v with both (u,w) and (v,w)
      // present — each triangle counted exactly once
      val want = coE.toSeq.map { case (u, v) =>
        coE.count { case (a, w) => a == v && coE((u, w)) }
      }.sum.toLong
      val got = GraphOps.triangles(spark, dir).collect().head
      assert(got.getLong(0) == coE.size.toLong, s"n_edges $dir")
      assert(got.getLong(1) == want, s"n_triangles $dir: got ${got.getLong(1)} want $want")
      // the disconnected pool-B component must be present in the edge set
      assert(coE.exists(_._1 >= 200L), "pool-B co-edges must exist (disconnected component)")
    }
  }

  test("bfsHops == brute force (isolated size-50 seed at hop 0, components beyond the cap)") {
    minis.foreach { case (dir, li, _, pa) =>
      val coE = coEdgesOf(li)
      val sym = coE.toSeq.flatMap { case (u, v) => Seq((u, v), (v, u)) }
      val seeds = pa.filter(_._2 == 50).map(_._1)
      val visited = bfsBrute(sym, seeds, GraphOps.BfsMaxHop)
      val want = visited.groupBy(_._2).toSeq
        .map { case (hop, m) => (hop, m.size.toLong, m.keys.sum) }
        .sortBy(_._1)
      val got = GraphOps.bfsHops(spark, dir).collect()
        .map(r => (r.getAs[Number]("hop").longValue(), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"bfs $dir:\ngot  $got\nwant $want")
      // the isolated part 999 seeds the walk but reaches nothing: it must
      // sit inside hop 0's checksum and nowhere else
      assert(visited(999L) == 0L)
    }
  }

  test("adamicAdar == micro-nat brute force (degree-1 star customers excluded)") {
    minis.foreach { case (dir, li, or, _) =>
      val pairs = pairsOf(li, or)
      val byCust = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
      val w = byCust.collect { case (c, ss)
          if ss.size >= 2 && ss.size <= GraphOps.AaMaxDeg =>
        c -> hup0(1e6 / math.log(ss.size.toDouble))
      }
      val scored = w.toSeq.flatMap { case (c, wu) =>
        val ss = byCust(c)
        for { i <- ss.indices; j <- (i + 1) until ss.size } yield ((ss(i), ss(j)), wu)
      }.groupBy(_._1).view.mapValues(ws => (ws.size.toLong, ws.map(_._2).sum)).toSeq
      val want = scored
        .sortBy { case ((b, c), (_, sc)) => (-sc, b, c) }.take(GraphOps.AaTopK)
        .map { case ((b, c), (nc, sc)) => (labelOf(b), labelOf(c), nc, sc) }
      val got = GraphOps.adamicAdar(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == want, s"aa $dir:\ngot  $got\nwant $want")
    }
  }

  test("assortativity == exact-moment Pearson brute force; star corpus yields NULL, not a job kill") {
    minis.foreach { case (dir, li, or, _) =>
      val pairs = pairsOf(li, or)
      val dc = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val ds = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      var sx, sy, sxx, syy, sxy = BigInt(0)
      pairs.foreach { case (c, s) =>
        val dx = BigInt(dc(c)); val dy = BigInt(ds(s))
        sx += dx; sy += dy; sxx += dx * dx; syy += dy * dy; sxy += dx * dy
      }
      val n = pairs.size.toDouble
      val den = math.sqrt(n * sxx.toDouble - sx.toDouble * sx.toDouble) *
        math.sqrt(n * syy.toDouble - sy.toDouble * sy.toDouble)
      val want: Option[Double] =
        if (den == 0.0) None
        else Some((n * sxy.toDouble - sx.toDouble * sy.toDouble) / den)
      val row = GraphOps.assortativity(spark, dir).collect().head
      assert(row.getLong(0) == pairs.size.toLong)
      val got = if (row.isNullAt(1)) None else Some(row.getDouble(1))
      assert((got, want) match {
        case (Some(a), Some(b)) => dEq(a, b)
        case (None, None)       => true
        case _                  => false
      }, s"assortativity $dir: got $got want $want")
    }
    // the degenerate shape that was a live ANSI DIVIDE_BY_ZERO job kill:
    // every customer buys from exactly one supplier (dx = 1 on every
    // edge — zero variance on the customer side)
    val dir = tmpDir("gdiffStar")
    (1L to 6L).map(i => (i, i)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (1L to 6L).flatMap(i => Seq.fill(2)((i, i % 3 + 1, 101L)))
      .toDF("l_orderkey", "l_suppkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val row = GraphOps.assortativity(spark, dir).collect().head
    assert(row.getLong(0) == 6L, "six distinct degree-1 relationships")
    assert(row.isNullAt(1), "zero-variance assortativity must be NULL (safeDiv contract)")
  }
}
