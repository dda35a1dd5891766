package graft

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.Row

import graft.queries.{AnalyticsQueries => AQ}

/** Randomized differential tests for the windowed / gaps-and-islands
  * family and the exact order statistics — the operators whose classic
  * failure modes are off-by-one boundaries (touching vs adjacent
  * intervals, a session gap of EXACTLY the threshold, a percentile rank
  * landing on the first row of a tie run) rather than arithmetic. Same
  * method as [[RandomizedDifferentialSpec]]: seeded adversarial inputs,
  * the public query, an independent driver-side brute force of the
  * documented contract.
  */
class RandomizedWindowDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def utcDay(d: LocalDate): java.sql.Date = java.sql.Date.valueOf(d)
  private def utcTs(dt: LocalDateTime): java.sql.Timestamp =
    java.sql.Timestamp.from(dt.toInstant(ZoneOffset.UTC))

  // ---- interval merge ------------------------------------------------------

  private case class Iv(c: Long, k: Long, s: Long, e: Long) // day offsets

  private val epoch = LocalDate.of(1995, 1, 1)

  /** Random spans plus every boundary shape the contract names: touching
    * merges, adjacent does not, duplicates share an island, containment
    * collapses, zero-length spans are islands of 1 day.
    */
  private def genIntervals(seed: Int): Seq[Iv] = {
    val r = new scala.util.Random(seed * 7 + 3)
    var k = 1000L
    def nk() = { k += 1; k }
    val bulk = for {
      c <- 1L to 6L; _ <- 1 to (5 + r.nextInt(20))
    } yield { val s = r.nextInt(60).toLong; Iv(c, nk(), s, s + r.nextInt(10)) }
    val crafted = Seq(
      Iv(100, 1, 1, 5), Iv(100, 2, 5, 9),   // touching -> ONE island
      Iv(101, 1, 1, 5), Iv(101, 2, 6, 9),   // adjacent -> TWO islands
      Iv(102, 1, 2, 4), Iv(102, 2, 2, 4),   // duplicate spans, one island
      Iv(102, 3, 1, 10), Iv(102, 4, 3, 5),  // containment collapses
      Iv(103, 1, 7, 7))                     // zero-length: 1 covered day
    bulk ++ crafted
  }

  private def bruteMerge(iv: Seq[Iv]): Seq[(Long, Long, Long, Long, Long)] =
    iv.groupBy(_.c).toSeq.sortBy(_._1).map { case (c, rs) =>
      val sorted = rs.sortBy(r => (r.s, r.e, r.k))
      var maxEnd = Long.MinValue
      val islands = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (iS, iE)
      sorted.foreach { r =>
        if (islands.isEmpty || r.s > maxEnd) islands += ((r.s, r.e))
        else { val (is0, ie0) = islands.last; islands(islands.size - 1) = (is0, math.max(ie0, r.e)) }
        maxEnd = math.max(maxEnd, r.e)
      }
      (c, rs.size.toLong, islands.size.toLong,
        islands.map { case (a, b) => b - a + 1 }.sum,
        islands.map { case (a, b) => b - a + 1 }.max)
    }

  test("mergeIntervals == sweep-line brute force (touching/adjacent/dup/contained/zero-length)") {
    Seq(5, 23).foreach { seed =>
      val iv = genIntervals(seed)
      val df = iv.map(r => (r.c, r.k, utcDay(epoch.plusDays(r.s)), utcDay(epoch.plusDays(r.e))))
        .toDF("o_custkey", "o_orderkey", "s", "e")
      val got = graft.operators.IntervalOps.mergeIntervalsOver(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      assert(got == bruteMerge(iv), s"seed $seed")
    }
    // pin the two named contract rows explicitly
    val byC = bruteMerge(genIntervals(5)).map(t => t._1 -> t).toMap
    assert(byC(100L)._3 == 1L, "touching spans must merge")
    assert(byC(101L)._3 == 2L, "adjacent spans must NOT merge")
    assert(byC(103L)._4 == 1L, "zero-length span covers exactly 1 day")
  }

  // ---- streaks (point-row islands) ----------------------------------------

  private case class Ev(user: Long, ts: LocalDateTime)

  /** Users with deliberately clustered activity days: consecutive runs,
    * singletons, duplicate events within a day (must count once).
    */
  private def genStreakEvents(seed: Int): Seq[Ev] = {
    val r = new scala.util.Random(seed * 13 + 1)
    val base = LocalDate.of(2024, 2, 1)
    val evs = for {
      u <- 1L to 5L
      d <- (0 until 40).filter(_ => r.nextInt(3) == 0)
      rep <- 1 to (1 + r.nextInt(2)) // intra-day duplicates
    } yield Ev(u, base.plusDays(d.toLong).atTime(8 + rep, 15))
    // a guaranteed 4-day run for one user (run-length arithmetic pinned)
    evs ++ (10 to 13).map(d => Ev(9L, base.plusDays(d.toLong).atTime(12, 0)))
  }

  private def bruteStreaks(evs: Seq[Ev]): Seq[(Long, Long, Long)] =
    evs.groupBy(_.user).toSeq.sortBy(_._1).map { case (u, rs) =>
      val days = rs.map(_.ts.toLocalDate.toEpochDay).distinct.sorted
      var best = 0L; var cur = 0L; var prev = Long.MinValue
      days.foreach { d =>
        cur = if (d == prev + 1) cur + 1 else 1
        best = math.max(best, cur); prev = d
      }
      (u, best, days.size.toLong)
    }

  test("streaks == consecutive-run brute force (intra-day duplicates count once)") {
    Seq(3, 17).foreach { seed =>
      val evs = genStreakEvents(seed)
      val dir = tmpDir(s"rwdiffStreak$seed")
      evs.zipWithIndex.map { case (e, i) => (utcTs(e.ts), i.toLong, e.user) }
        .toDF("ts", "event_id", "user_id")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = graft.operators.FunnelOps.streaks(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == bruteStreaks(evs), s"seed $seed")
      assert(got.find(_._1 == 9L).exists(_._2 >= 4L), "the pinned 4-day run must register")
    }
  }

  // ---- sessionize (inactivity-gap splitting) -------------------------------

  private def genSessionEvents(seed: Int): Seq[(Long, Long, LocalDateTime)] = {
    val r = new scala.util.Random(seed * 29 + 11)
    val base = LocalDateTime.of(2024, 3, 1, 9, 0, 0)
    var eid = 0L
    val bulk = (1L to 4L).flatMap { u =>
      var t = base.plusMinutes(r.nextInt(120).toLong)
      (1 to (8 + r.nextInt(10))).map { _ =>
        t = t.plusSeconds((30 + r.nextInt(4000)).toLong) // gaps straddle 1800 s
        eid += 1; (u, eid, t)
      }
    }
    // the boundary pair: EXACTLY the 30-minute gap must NOT split (strict >)
    val b = Seq((8L, { eid += 1; eid }, base), (8L, { eid += 1; eid }, base.plusSeconds(1800)),
      // and one second past the gap MUST split
      (8L, { eid += 1; eid }, base.plusSeconds(1800 + 1801)))
    bulk ++ b
  }

  private def bruteSessions(evs: Seq[(Long, Long, LocalDateTime)])
      : Seq[(Long, Long, Long, Long, Long)] =
    evs.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, rs) =>
      val sorted = rs.sortBy(e => (e._3.toEpochSecond(ZoneOffset.UTC), e._2))
      var seq = 0L; var prev = Long.MinValue
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      sorted.foreach { case (_, _, t) =>
        val sec = t.toEpochSecond(ZoneOffset.UTC)
        if (prev == Long.MinValue || sec - prev > 1800) {
          seq += 1; out += ((u, seq, sec, sec, 1L))
        } else {
          val last = out.last
          out(out.size - 1) = (last._1, last._2, last._3, math.max(last._4, sec), last._5 + 1)
        }
        prev = sec
      }
      out.toSeq
    }

  test("sessionize == gap-split brute force (a gap of exactly 30 min does NOT split)") {
    Seq(7, 31).foreach { seed =>
      val evs = genSessionEvents(seed)
      val dir = tmpDir(s"rwdiffSess$seed")
      evs.map { case (u, eid, t) => (utcTs(t), eid, u) }
        .toDF("ts", "event_id", "user_id")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = graft.operators.TimeSeriesOps.sessionize(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2).getTime / 1000, r.getTimestamp(3).getTime / 1000,
          r.getLong(4))).toSeq
      assert(got == bruteSessions(evs), s"seed $seed")
      // user 8 pins the boundary: events at +0 s and +1800 s share a
      // session; the third event (gap 1801 s) opens session 2
      val u8 = got.filter(_._1 == 8L)
      assert(u8.map(_._5) == Seq(2L, 1L), s"boundary sessions wrong: $u8")
    }
  }

  // ---- exact order statistics on tie-heavy random values -------------------

  private def genCents(seed: Int): Seq[(String, Long)] = {
    val r = new scala.util.Random(seed * 41 + 17)
    val bulk = for (g <- Seq("A", "B"); _ <- 1 to (40 + r.nextInt(60)))
      yield (g, (r.nextInt(12) - 2) * 25L) // 14-value grid, heavy ties, negatives
    bulk ++ Seq(("Z", -75L)) // singleton group: every percentile = the value
  }

  test("gExactPcts == sorted-array order statistics on tie-heavy random cents") {
    Seq(2, 19).foreach { seed =>
      val cents = genCents(seed)
      val dir = tmpDir(s"rwdiffPcts$seed")
      cents.map { case (g, c) => (g, 1.0, c / 100.0) }
        .toDF("l_returnflag", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val got = AQ.gExactPcts(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      def kth(s: Seq[Long], k: Long): Long = s((k - 1).toInt)
      val want = cents.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
        val s = rows.map(_._2).sorted
        val n = s.size.toLong
        (g, n, kth(s, (n + 1) / 2), kth(s, (19 * n + 19) / 20), kth(s, (99 * n + 99) / 100))
      }
      assert(got == want, s"seed $seed")
      val z = got.find(_._1 == "Z").get
      assert(z._3 == -75L && z._4 == -75L && z._5 == -75L)
    }
  }

  test("gMode == smallest-value tie break on a forced frequency tie") {
    val dir = tmpDir("rwdiffMode")
    // group T: values 3 and 7 both appear 5x -> mode must be 3 (smallest)
    val rows = Seq.fill(5)(("T", 7.0)) ++ Seq.fill(5)(("T", 3.0)) ++
      Seq.fill(3)(("U", 2.0)) ++ Seq.fill(4)(("U", 9.0))
    rows.map { case (g, q) => (g, q, 1.0) }
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = AQ.gMode(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("T" -> 3L, "U" -> 9L))
  }
}
