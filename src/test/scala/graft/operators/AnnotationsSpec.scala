package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Label-QA operators: Cohen's kappa fixed-point algebra on hand-computed
 * fixtures (independence 0, perfect 1000, the floor-division negative
 * regime), partial-overlap pairing, and majority-vote tie-breaks. */
class AnnotationsSpec extends SparkSpec {

  private def ann(rows: (Long, Int, Int)*) = {
    import spark.implicits._
    rows.toDF("item", "annotator", "label")
  }

  private def kappaOf(rows: (Long, Int, Int)*): Option[Long] = {
    val r = Annotations.annotatorAgreement(ann(rows: _*), nClasses = 3).collect()
    assert(r.length == 1, s"expected one pair row, got ${r.toSeq}")
    Option(r(0).getAs[Any]("kappa_pm")).map(_.asInstanceOf[Long])
  }

  test("kappa: independence is 0, perfect agreement is 1000, degenerate is NULL") {
    // a0=(1,1,0,0), a1=(1,0,0,1): po=1/2 and both marginals 50/50 → pe=1/2
    assert(kappaOf((1L, 0, 1), (2L, 0, 1), (3L, 0, 0), (4L, 0, 0),
      (1L, 1, 1), (2L, 1, 0), (3L, 1, 0), (4L, 1, 1)) == Some(0L))
    // identical 3-class labels: po=1e6, pe=3·333² → exactly 1000
    assert(kappaOf((1L, 0, 0), (2L, 0, 1), (3L, 0, 2),
      (1L, 1, 0), (2L, 1, 1), (3L, 1, 2)) == Some(1000L))
    // both annotators constant SAME class: pe_ppm=1e6 → kappa undefined
    assert(kappaOf((1L, 0, 0), (2L, 0, 0), (1L, 1, 0), (2L, 1, 0)) == None)
  }

  test("kappa: negative values use FLOOR division (the DuckDB // twin), not truncation") {
    // a0=(0,0,1), a1=(1,1,0): po=0; marginals (666,333) vs (333,666) →
    // pe=443556; kappa = -443556000 // 556444 = floor(-797.126) = -798
    // (truncation toward zero would give -797 and split from the oracle)
    assert(kappaOf((1L, 0, 0), (2L, 0, 0), (3L, 0, 1),
      (1L, 1, 1), (2L, 1, 1), (3L, 1, 0)) == Some(-798L))
    // total disagreement with 50/50 marginals: exactly -1000
    assert(kappaOf((1L, 0, 0), (2L, 0, 1), (1L, 1, 1), (2L, 1, 0)) == Some(-1000L))
  }

  test("kappa pairs only shared items; all C(A,2) pairs emit") {
    // a0 labels {1,2}, a1 labels {2,3}: the pair sees ONLY item 2
    val partial = Annotations.annotatorAgreement(
      ann((1L, 0, 1), (2L, 0, 1), (2L, 1, 1), (3L, 1, 0)), nClasses = 3)
      .collect()
    assert(partial.length == 1 && partial(0).getAs[Long]("n_items") == 1L &&
      partial(0).getAs[Long]("agree") == 1L, s"got ${partial.toSeq}")
    // three annotators → exactly the 3 ordered pairs
    val three = Annotations.annotatorAgreement(
      ann((1L, 0, 1), (1L, 1, 1), (1L, 2, 0)), nClasses = 3).collect()
    assert(three.map(r => (r.getAs[Int]("a1"), r.getAs[Int]("a2"))).toSet ==
      Set((0, 1), (0, 2), (1, 2)))
  }

  test("fleissKappa: hand-computed algebra, floor division, non-conforming items dropped") {
    // 2 items × 2 raters, binary: item1 both 0; item2 split.
    // S2 = 4 + 2 = 6 → pbar = (6 − 4)/(2·2·1) = 0.5. Class masses 3:1 of
    // 4 → p = (750‰, 250‰) → pe = 625000. κ = (0.5 − 0.625)/0.375 = −1/3
    // → FLOOR(−333.33) = −334 (truncation would give −333)
    val r = Annotations.fleissKappa(ann(
      (1L, 0, 0), (1L, 1, 0), (2L, 0, 0), (2L, 1, 1),
      (9L, 0, 2)), ratersPerItem = 2).collect() // item 9 has 1 rating → dropped
    assert(r.length == 1)
    val row = r(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getAs[Any]("kappa_pm")) == ((2L, 1L, 500000L, 625000L, -334L)),
      s"got ${row.toSeq}")
    // perfect agreement on 2 classes: pbar = 1e6, kappa exactly 1000
    val p = Annotations.fleissKappa(ann(
      (1L, 0, 0), (1L, 1, 0), (2L, 0, 1), (2L, 1, 1)), ratersPerItem = 2)
      .collect()(0)
    assert(p.getLong(2) == 1000000L && p.getAs[Long]("kappa_pm") == 1000L,
      s"got ${p.toSeq}")
    // degenerate: every rating one class → pe = 1e6 → kappa NULL
    val dg = Annotations.fleissKappa(ann(
      (1L, 0, 0), (1L, 1, 0), (2L, 0, 0), (2L, 1, 0)), ratersPerItem = 2)
      .collect()(0)
    assert(dg.isNullAt(dg.fieldIndex("kappa_pm")), s"got ${dg.toSeq}")
    // empty campaign: (0 items, 0 dropped, NULL, NULL, NULL) — no throw,
    // n_dropped 0 not NULL (the oracle's coalesce contract)
    val e = Annotations.fleissKappa(ann(), ratersPerItem = 2).collect()(0)
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L &&
      e.isNullAt(2) && e.isNullAt(3) && e.isNullAt(4), s"got ${e.toSeq}")
  }

  test("annotatorConfusion: cells against the majority consensus with exact shares") {
    // consensus: item1 → 0 (2-1), item2 → 1 (unanimous, annotator 2 absent)
    val got = Annotations.annotatorConfusion(ann(
      (1L, 0, 0), (1L, 1, 0), (1L, 2, 1),
      (2L, 0, 1), (2L, 1, 1)))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      (0, 0, 0) -> ((1L, 500000L)), (0, 1, 1) -> ((1L, 500000L)),
      (1, 0, 0) -> ((1L, 500000L)), (1, 1, 1) -> ((1L, 500000L)),
      (2, 1, 0) -> ((1L, 1000000L))), s"got $got")
  }

  test("krippendorffAlpha: hand-computed coincidence algebra, dropped items, edge cases") {
    // u1 agrees (0,0), u2 splits (0,1), u3 has ONE rating (no pair →
    // dropped). W = lcm(1..1) = 1: n = 4, diag = 2 → A_o = 500000;
    // margins 3:1 → p = (750, 250), corrected p' = (666, 0) →
    // A_e = 499500; alpha = floor(1000·500/500500) = 0
    val r = Annotations.krippendorffAlpha(ann(
      (1L, 0, 0), (1L, 1, 0), (2L, 0, 0), (2L, 1, 1), (3L, 0, 2)),
      maxRaters = 2).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getAs[Any]("alpha_pm")) == ((2L, 1L, 500000L, 499500L, 0L)),
      s"got ${r.toSeq}")
    // perfect agreement across 2 classes: A_o = 1e6, alpha exactly 1000
    val p = Annotations.krippendorffAlpha(ann(
      (1L, 0, 0), (1L, 1, 0), (2L, 0, 1), (2L, 1, 1)), maxRaters = 2)
      .collect()(0)
    assert(p.getLong(2) == 1000000L && p.getAs[Long]("alpha_pm") == 1000L,
      s"got ${p.toSeq}")
    // an item with MORE raters than maxRaters is dropped (exact weighting
    // would break), not silently mis-weighted
    val over = Annotations.krippendorffAlpha(ann(
      (1L, 0, 0), (1L, 1, 0),
      (2L, 0, 0), (2L, 1, 0), (2L, 2, 0)), maxRaters = 2).collect()(0)
    assert(over.getLong(0) == 1L && over.getLong(1) == 1L, s"got ${over.toSeq}")
    // empty campaign: counts 0, stats NULL, no throw
    val e = Annotations.krippendorffAlpha(ann(), maxRaters = 5).collect()(0)
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L &&
      e.isNullAt(2) && e.isNullAt(4), s"got ${e.toSeq}")
    // varying m with W = 12: values are scale-invariant — the 2-rater
    // fixture recomputed at maxRaters = 5 gives the identical statistics
    val w12 = Annotations.krippendorffAlpha(ann(
      (1L, 0, 0), (1L, 1, 0), (2L, 0, 0), (2L, 1, 1), (3L, 0, 2)),
      maxRaters = 5).collect()(0)
    assert((w12.getLong(2), w12.getLong(3), w12.getAs[Any]("alpha_pm")) ==
      ((500000L, 499500L, 0L)), s"got ${w12.toSeq}")
  }

  test("agreement fuzz: operator matches an independent brute force on random campaigns") {
    val rnd = new scala.util.Random(11_49)
    // 150 items, 4 annotators, PARTIAL coverage (each annotator skips ~1/3
    // of items) — the shared-items semantics must hold pair by pair
    val rows = for {
      item <- (0L until 150L)
      a <- 0 until 4
      if rnd.nextInt(3) != 0
    } yield (item, a, rnd.nextInt(3))
    val byAnn = rows.groupBy(_._2)
      .map { case (a, rs) => a -> rs.map(r => r._1 -> r._3).toMap }
    def brute(a1: Int, a2: Int): (Long, Long, Long, Long, Option[Long]) = {
      val m1 = byAnn(a1); val m2 = byAnn(a2)
      val shared = (m1.keySet & m2.keySet).toSeq
      val n = shared.size.toLong
      val agree = shared.count(i => m1(i) == m2(i)).toLong
      val po = 1000000L * agree / n
      val pe = (0 until 3).map { c =>
        (1000L * shared.count(i => m1(i) == c) / n) *
          (1000L * shared.count(i => m2(i) == c) / n)
      }.sum
      val kappa = if (1000000L - pe == 0) None
        else Some(Math.floorDiv(1000L * (po - pe), 1000000L - pe))
      (n, agree, po, pe, kappa)
    }
    val got = Annotations.annotatorAgreement(ann(rows: _*), nClasses = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          Option(r.getAs[Any]("kappa_pm")).map(_.asInstanceOf[Long])))).toMap
    assert(got.size == 6, s"expected C(4,2)=6 pairs, got ${got.keySet}")
    for (a1 <- 0 until 4; a2 <- a1 + 1 until 4)
      assert(got((a1, a2)) == brute(a1, a2),
        s"pair ($a1,$a2): got ${got((a1, a2))} expected ${brute(a1, a2)}")
  }

  /** Independent in-driver Dawid–Skene replica: same majority init, same
   * ‰-quantized smoothed θ/π, same exact integer-product E-step, same
   * (score desc, class asc) argmax — the gold pin for the operator. */
  private def bruteDs(rows: Seq[(Long, Int, Int)], nClasses: Int,
                      rounds: Int): Map[Long, (Int, Int)] = {
    val items = rows.groupBy(_._1)
    val mv = items.map { case (item, rs) =>
      val votes = rs.groupBy(_._3).map { case (l, v) => l -> v.size }
      item -> votes.minBy { case (l, v) => (-v, l) }._1
    }
    var labels = mv
    for (_ <- 1 to rounds) {
      val cells = rows.groupBy(r => (r._2, labels(r._1), r._3))
        .map { case (k, v) => k -> v.size.toLong }
      val nac = rows.groupBy(r => (r._2, labels(r._1)))
        .map { case (k, v) => k -> v.size.toLong }
      def theta(a: Int, c: Int, g: Int): Long =
        (1000L * (cells.getOrElse((a, c, g), 0L) + 1)) /
          (nac.getOrElse((a, c), 0L) + nClasses)
      val n = labels.size.toLong
      val classCnt = labels.values.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
      def prior(c: Int): Long =
        (1000L * (classCnt.getOrElse(c, 0L) + 1)) / (n + nClasses)
      labels = items.map { case (item, rs) =>
        val best = (0 until nClasses).map { c =>
          val prod = rs.map(r => theta(r._2, c, r._3)).product
          (prior(c) * prod, c)
        }.minBy { case (s, c) => (-s, c) }
        item -> best._2
      }
    }
    mv.map { case (item, m) => item -> ((m, labels(item))) }
  }

  private def dsOf(rows: Seq[(Long, Int, Int)], rounds: Int = 2): Map[Long, (Int, Int, Boolean)] =
    Annotations.dawidSkene(ann(rows: _*), nClasses = 3, rounds = rounds)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap

  test("dawidSkene: perfect annotators — EM confirms the unanimous vote, nothing changes") {
    val rows = for (item <- 0L until 9L; a <- 0 until 3)
      yield (item, a, (item % 3).toInt)
    val got = dsOf(rows)
    assert(got.size == 9)
    assert(got.forall { case (item, (mv, ds, ch)) =>
      mv == (item % 3).toInt && ds == mv && !ch }, s"got $got")
  }

  test("dawidSkene: a noisy-annotator majority is overturned by the reliable pair") {
    // A0, A1: always truth. A2–A4: mutually-disagreeing scatter on items
    // 0..11 (consensus stays with truth), but they COINCIDE on a wrong
    // label on item 12 — majority vote flips to it; EM, having learned
    // A2–A4's weak diagonals and A0/A1's strong ones, restores the truth.
    def truth(i: Long) = (i % 3).toInt
    val scatter = for (item <- 0L until 12L; a <- 2 until 5)
      yield (item, a, (truth(item) + 1 + (a + item).toInt % 2) % 3)
    val reliable = for (item <- 0L to 12L; a <- 0 until 2)
      yield (item, a, truth(item))
    val coincide = for (a <- 2 until 5)
      yield (12L, a, (truth(12L) + 1) % 3)
    val rows = reliable ++ scatter ++ coincide
    val got = dsOf(rows)
    val exp = bruteDs(rows, nClasses = 3, rounds = 2)
    assert(got.view.mapValues(v => (v._1, v._2)).toMap == exp,
      s"operator disagrees with the in-driver replica")
    val (mv12, ds12, ch12) = got(12L)
    assert(mv12 == (truth(12L) + 1) % 3 && ds12 == truth(12L) && ch12,
      s"item 12 not overturned: $mv12 -> $ds12")
  }

  test("dawidSkene fuzz: operator matches the independent replica on noisy campaigns") {
    val rnd = new scala.util.Random(11_56)
    for (trial <- 0 until 3) {
      val rows = for {
        item <- 0L until 120L
        a <- 0 until 5
        if rnd.nextInt(8) != 0 // sparse: some items lose raters
      } yield {
        val truth = (item % 3).toInt
        val flip = rnd.nextInt(10) < a * 2 // noise grows with annotator id
        (item, a, if (flip) rnd.nextInt(3) else truth)
      }
      for (rounds <- Seq(1, 2, 3)) {
        val got = dsOf(rows, rounds)
        val exp = bruteDs(rows, nClasses = 3, rounds = rounds)
        assert(got.size == exp.size, s"trial $trial rounds $rounds sizes differ")
        got.foreach { case (item, (mv, ds, ch)) =>
          assert(exp(item) == ((mv, ds)) && ch == (mv != ds),
            s"trial $trial rounds $rounds item $item: got ($mv,$ds) exp ${exp(item)}")
        }
      }
    }
  }

  test("consolidateLabels: majority, tie to smallest label, unanimity flag") {
    val got = Annotations.consolidateLabels(ann(
      (1L, 0, 2), (1L, 1, 2), (1L, 2, 0),             // majority 2
      (2L, 0, 1), (2L, 1, 1), (2L, 2, 0), (2L, 3, 0), // 2-2 tie → label 0
      (3L, 0, 1), (3L, 1, 1)                          // unanimous
    )).collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((3L, 2, 2L, false)), s"got ${got(1L)}")
    assert(got(2L) == ((4L, 0, 2L, false)), s"got ${got(2L)}")
    assert(got(3L) == ((2L, 1, 2L, true)), s"got ${got(3L)}")
  }

  test("dawidSkene: a >5-rater item raises the domain contract, not an opaque overflow") {
    // the guard moved IN THE PLAN (r12 #4): construction runs no census
    // job, and the first action raises the domain message — `when`
    // short-circuits the product branch, so the raw ANSI overflow can
    // never fire first
    val rows = (0 until 6).map(a => (1L, a, 0))
    val df = Annotations.dawidSkene(ann(rows: _*), nClasses = 3, rounds = 1)
    df.queryExecution.analyzed // plan construction alone must not throw
    val e = intercept[Exception] { df.collect() }
    assert(e.getMessage.contains("6 annotations"), e.getMessage)
  }

  private def alphaMetric(metric: String, rows: (Long, Int, Int)*)
      : (Long, Long, Option[Long], Long, Option[Long]) = {
    val r = Annotations.krippendorffAlphaMetric(ann(rows: _*),
      maxRaters = 5, metric = metric).collect()
    assert(r.length == 1 && r(0).getString(0) == metric, s"got ${r.toSeq}")
    (r(0).getLong(1), r(0).getLong(2),
      Option(r(0).getAs[Any]("d_o_ppm")).map(_.asInstanceOf[Long]),
      r(0).getLong(4),
      Option(r(0).getAs[Any]("alpha_pm")).map(_.asInstanceOf[Long]))
  }

  test("krippendorffAlphaMetric: interval/ordinal reject non-integral label columns at call time") {
    // string labels would make cast('long') distances NULL (terms silently
    // dropped from D_o/D_e) and ordinal BETWEEN compare lexicographically
    // ('10' < '2') — the schema check fails fast instead (ADVICE r12)
    import spark.implicits._
    val strAnn = Seq((1L, 0, "2"), (1L, 1, "10")).toDF("item", "annotator", "label")
    for (m <- Seq("interval", "ordinal")) {
      val e = intercept[IllegalArgumentException] {
        Annotations.krippendorffAlphaMetric(strAnn, maxRaters = 5, metric = m)
      }
      assert(e.getMessage.contains("integral"), e.getMessage)
    }
    // nominal treats labels as opaque equality classes — strings are fine
    val nom = Annotations.krippendorffAlphaMetric(strAnn, maxRaters = 5,
      metric = "nominal").collect()
    assert(nom.length == 1 && nom(0).getString(0) == "nominal")
  }

  test("krippendorffAlphaMetric: hand-computed nominal/interval/ordinal on the same campaign") {
    // 3 items, 2 raters each, labels 0<1<2: one near miss (0 vs 1), one far
    // miss (0 vs 2), one agreement — margins n0=2, n1=3, n2=1, n=6.
    // Distances separate the metrics where nominal cannot:
    //  nominal  — δ = 1e6 everywhere: D_o = 48e6/72 = 666666, D_e = 732400
    //             (‰ margins p=(333,500,166), p'=(400,600,200)), alpha 89
    //  interval — e_max = 2, δ(0,1) = δ(1,2) = 500² , δ(0,2) = 1e6:
    //             D_o = 30e6/72 = 416666, D_e = 282850, alpha floor(−473.1)
    //             = −474 (the near miss counts LESS, the far miss full)
    //  ordinal  — e = (5, 9, 4), e_max = 9 → eq = (555, 1000, 444):
    //             D_o = 31392600/72 = 436008, D_e = 295496, alpha −476
    val campaign = Seq(
      (1L, 0, 0), (1L, 1, 1),  // near miss
      (2L, 0, 0), (2L, 1, 2),  // far miss
      (3L, 0, 1), (3L, 1, 1))  // agreement
    assert(alphaMetric("nominal", campaign: _*) ==
      ((3L, 0L, Some(666666L), 732400L, Some(89L))))
    assert(alphaMetric("interval", campaign: _*) ==
      ((3L, 0L, Some(416666L), 282850L, Some(-474L))))
    assert(alphaMetric("ordinal", campaign: _*) ==
      ((3L, 0L, Some(436008L), 295496L, Some(-476L))))
  }

  test("krippendorffAlphaMetric: perfect agreement is 1000, drops and empties handled") {
    // two perfectly-agreed items over two classes: D_o = 0, D_e > 0 → 1000
    val perfect = Seq((1L, 0, 0), (1L, 1, 0), (2L, 0, 1), (2L, 1, 1))
    for (m <- Seq("nominal", "interval", "ordinal"))
      assert(alphaMetric(m, perfect: _*) ==
        ((2L, 0L, Some(0L), 666000L, Some(1000L))), s"metric $m")
    // a 1-rating item drops and is counted; a 6-rating item likewise
    val withDrops = perfect ++ Seq((3L, 0, 2)) ++
      (0 until 5).map(a => (4L, a, 1)) ++ (0 until 5).map(a => (5L, a, 1)) ++
      Seq((5L, 5, 1)) // hypothetical 6th rater — but annotator ids only go 0..4
    val (nItems, nDropped, _, _, _) = alphaMetric("interval", withDrops: _*)
    assert(nItems == 3L && nDropped == 2L, s"got $nItems/$nDropped")
    // empty campaign: zero items, D_e = 0 → alpha NULL
    assert(alphaMetric("ordinal") == ((0L, 0L, None, 0L, None)))
    // single observed class: no class pairs, D_e = 0 → alpha NULL (not 1000)
    assert(alphaMetric("interval", (1L, 0, 1), (1L, 1, 1))._5.isEmpty)
  }
}
