package graft.operators

import graft.SparkSpec

/** Preference-pair win rates: hand-computed Wilson bounds under the
 * quantized-isqrt contract, pair normalization, interval properties, and a
 * fuzz pass against an independent in-driver replica. */
class PreferencesSpec extends SparkSpec {

  private def duels(rows: (Long, Int, Int, Int)*) = {
    import spark.implicits._
    rows.toDF("item", "model_a", "model_b", "winner")
  }

  private def collectPairs(rows: (Long, Int, Int, Int)*) =
    Preferences.pairwiseWinRates(duels(rows: _*))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

  test("pairwiseWinRates: hand-computed Wilson bounds, z=2 quantized contract") {
    // pair (1,2): 3 duels, lo wins 2 → win 666‰; y = (2·1) div 3 + 1 = 1,
    // isqrt(1e6) = 1000 → lb = (4000−2000) div 7 = 285, ub = 6000 div 7 = 857
    val got = collectPairs(
      (1L, 1, 2, 1), (2L, 1, 2, 1), (3L, 1, 2, 2))
    assert(got((1, 2)) == ((3L, 2L, 666L, 285L, 857L)), s"got $got")
  }

  test("pairwiseWinRates: unanimous lo-side wins pin ub at exactly 1000") {
    // w = n → y = 1: ub = (1000n + 4000) div (n+4) = 1000, lb = 1000n div (n+4)
    val got = collectPairs((1L, 0, 3, 0), (2L, 0, 3, 0), (3L, 0, 3, 0),
      (4L, 0, 3, 0), (5L, 0, 3, 0), (6L, 0, 3, 0))
    assert(got((0, 3)) == ((6L, 6L, 1000L, 600L, 1000L)), s"got $got")
    // and a lo-side shutout floors lb at exactly 0
    val lose = collectPairs((1L, 2, 4, 4), (2L, 2, 4, 4))
    assert(lose((2, 4)) == ((2L, 0L, 0L, 0L, 666L)), s"got $lose")
  }

  test("pairwiseWinRates: pair order is normalized — reversed rows merge") {
    // same pair observed as (5,3) and (3,5): both count toward (3,5);
    // winner 5 is a loss for lo regardless of the input order
    val got = collectPairs((1L, 5, 3, 5), (2L, 3, 5, 3), (3L, 3, 5, 5))
    assert(got.keySet == Set((3, 5)), s"got $got")
    assert(got((3, 5))._1 == 3L && got((3, 5))._2 == 1L, s"got $got")
  }

  test("winrate fuzz: operator matches an independent replica; bounds bracket the rate") {
    val rnd = new scala.util.Random(11_55)
    val rows = for {
      i <- 0L until 400L
      a = rnd.nextInt(5); bRaw = rnd.nextInt(5)
      if a != bRaw
    } yield {
      val b = bRaw
      (i, a, b, if (rnd.nextBoolean()) a else b)
    }
    def isqrt(x: Long): Long = math.floor(math.sqrt(x.toDouble)).toLong
    val brute = rows
      .map { case (_, a, b, w) =>
        (math.min(a, b), math.max(a, b)) -> (if (w == math.min(a, b)) 1L else 0L)
      }
      .groupBy(_._1)
      .map { case (pair, v) =>
        val n = v.size.toLong
        val wl = v.map(_._2).sum
        val y = wl * (n - wl) / n + 1
        val s = isqrt(1000000L * y)
        pair -> ((n, wl, 1000L * wl / n,
          (1000L * (wl + 2) - 2 * s) / (n + 4),
          (1000L * (wl + 2) + 2 * s) / (n + 4)))
      }
    val got = collectPairs(rows: _*)
    assert(got == brute, s"operator vs replica:\n$got\n$brute")
    got.values.foreach { case (_, _, win, lb, ub) =>
      assert(lb >= 0L && lb <= win && win <= ub && ub <= 1000L,
        s"interval violation: $win in [$lb, $ub]")
    }
  }

  private def btOf(rounds: Int, rows: (Long, Int, Int, Int)*)
      : Map[Int, (Long, Long, Long)] =
    Preferences.bradleyTerry(duels(rows: _*), rounds)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  /** Independent in-driver replica of the integer MM trajectory. */
  private def bruteBt(rows: Seq[(Long, Int, Int, Int)], rounds: Int)
      : Map[Int, Long] = {
    val census = rows.groupBy { case (_, a, b, _) => (math.min(a, b), math.max(a, b)) }
      .map { case ((lo, hi), v) =>
        (lo, hi, v.size.toLong, v.count { case (_, a, b, w) => w == math.min(a, b) }.toLong)
      }.toSeq
    val dir = census.flatMap { case (lo, hi, n, wl) =>
      Seq((lo, hi, n, wl), (hi, lo, n, n - wl)) }
    val models = dir.map(_._1).distinct.sorted
    val m = models.size.toLong
    var s = models.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val raw = models.map { i =>
        val mine = dir.filter(_._1 == i)
        val d = mine.map { case (_, o, n, _) => n * 1000000000000L / (s(i) + s(o)) }.sum +
          2000000000000L / (s(i) + 1000000L)
        i -> ((mine.map(_._4).sum + 1L) * 1000000000000L / d)
      }
      val t = raw.map(_._2).sum
      s = raw.map { case (i, r) => i -> math.max(m * (r * 1000000L / t), 1L) }.toMap
    }
    s
  }

  test("bradleyTerry: a symmetric cycle fits equal strengths (hand-computed 999999)") {
    // A>B, B>C, C>A once each: perfectly symmetric, so every round keeps
    // strengths equal; normalization lands them at 3·(1e6·1e6 div 3e6) =
    // 999999 exactly (the div remainder), identically for every model
    val got = btOf(2, (1L, 0, 1, 0), (2L, 1, 2, 1), (3L, 2, 0, 2))
    assert(got.keySet == Set(0, 1, 2))
    got.foreach { case (mdl, (games, wins, s)) =>
      assert(games == 2L && wins == 1L && s == 999999L, s"model $mdl: $got")
    }
  }

  test("bradleyTerry: the dominant side fits strictly stronger; shutouts stay positive") {
    // 0 beats 1 in 3 of 4 → s_0 > s_1 at every round count
    for (r <- Seq(1, 2, 3)) {
      val got = btOf(r, (1L, 0, 1, 0), (2L, 0, 1, 0), (3L, 0, 1, 0), (4L, 0, 1, 1))
      assert(got(0)._3 > got(1)._3, s"rounds $r: $got")
      assert(got(0) == ((4L, 3L, got(0)._3)) && got(1) == ((4L, 1L, got(1)._3)))
    }
    // a total shutout: the regularizer keeps the loser's strength >= 1 and
    // the fit finite (no division by zero at the degenerate corner)
    val shut = btOf(3, (1L, 4, 7, 4), (2L, 4, 7, 4), (3L, 4, 7, 4))
    assert(shut(7)._3 >= 1L && shut(4)._3 > shut(7)._3, s"got $shut")
  }

  test("bradleyTerry: self-duels and out-of-range winners raise the domain contract") {
    // both guards live IN THE PLAN (construction runs no job), so the
    // failure surfaces at the first action with the domain message — never
    // a silently-poisoned census (a self-duel would inflate games; a bad
    // winner would count as a model_hi win)
    val self = intercept[Exception] {
      Preferences.bradleyTerry(duels((1L, 2, 2, 2))).collect()
    }
    assert(self.getMessage.contains("self-duel"), self.getMessage)
    val bad = intercept[Exception] {
      Preferences.bradleyTerry(duels((1L, 0, 1, 0), (2L, 0, 1, 7))).collect()
    }
    assert(bad.getMessage.contains("neither model_a"), bad.getMessage)
    // (no construction-laziness assertion here: over a LocalRelation the
    // optimizer's ConvertToLocalRelation evaluates projections eagerly at
    // persist() time, so the raise fires during construction — the
    // zero-job construction property is pinned on the real parquet-backed
    // queries in ConstructionJobsSpec)
  }

  test("bradleyTerry fuzz: operator matches the independent integer-MM replica") {
    val rnd = new scala.util.Random(11_58)
    for (trial <- 0 until 3) {
      val rows = for {
        i <- 0L until 300L
        a = rnd.nextInt(5); b = rnd.nextInt(5)
        if a != b
      } yield (i, a, b, if (rnd.nextInt(10) < 5 + (b - a)) b else a)
      for (rounds <- Seq(1, 2)) {
        val got = btOf(rounds, rows: _*)
        val exp = bruteBt(rows, rounds)
        assert(got.view.mapValues(_._3).toMap == exp,
          s"trial $trial rounds $rounds:\n${got.view.mapValues(_._3).toMap}\n$exp")
      }
    }
  }
}
