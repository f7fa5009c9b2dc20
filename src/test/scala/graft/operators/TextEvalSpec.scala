package graft.operators

import graft.SparkSpec

/** ROUGE-N: hand-computed clipped-multiset fixtures (the official Lin 2004
 * counting, not set intersection), the per-side gramless NULL contract, and
 * a fuzz pass against an independent in-driver sliding-window replica. */
class TextEvalSpec extends SparkSpec {

  private def pairs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "reference", "candidate")
  }

  private def rougeOf(n: Int, rows: (Long, String, String)*)
      : Map[Long, (Long, Option[Long], Option[Long], Option[Long], Option[Long], Option[Long])] =
    TextEval.rougeN(pairs(rows: _*), n).collect().map { r =>
      def opt(i: Int) = Option(r.getAs[Any](i)).map(_.asInstanceOf[Long])
      r.getLong(0) -> ((r.getLong(2), opt(3), opt(4), opt(5), opt(6), opt(7)))
    }.toMap

  test("rougeN: multiset clipping — a repeated candidate gram scores once per reference occurrence") {
    // ref "a a b" (grams a:2, b:1), cand "a a a b" (a:3, b:1):
    // overlap = min(2,3) + min(1,1) = 3 — the SET approximation would say 2.
    // recall = 3000 div 3 = 1000, precision = 3000 div 4 = 750,
    // f1 = (2·750·1000) div 1750 = 857
    val got = rougeOf(1, (1L, "a a b", "a a a b"))
    assert(got(1L) == ((3L, Some(3L), Some(4L), Some(1000L), Some(750L), Some(857L))),
      s"got $got")
  }

  test("rougeN: bigrams — dropout-created grams cost precision, not just recall") {
    // ref "a b c" (ab, bc), cand "a b d c" (ab, bd, dc): overlap = 1
    // recall = 1000 div 2 = 500, precision = 1000 div 3 = 333,
    // f1 = (2·333·500) div 833 = 399
    val got = rougeOf(2, (1L, "a b c", "a b d c"))
    assert(got(1L) == ((1L, Some(2L), Some(3L), Some(500L), Some(333L), Some(399L))),
      s"got $got")
  }

  test("rougeN: zero overlap gives 0/0/0, not NULL; gramless sides give NULL per side") {
    // disjoint vocab: everything defined, everything 0 (incl. F1 at P=R=0)
    val zero = rougeOf(1, (1L, "x y", "z"))
    assert(zero(1L) == ((0L, Some(2L), Some(1L), Some(0L), Some(0L), Some(0L))),
      s"got $zero")
    // at n=2 a single-token REFERENCE has no grams: recall and f1 NULL,
    // precision still defined (0 of the candidate's grams are in it)
    val noRef = rougeOf(2, (1L, "a", "b c"))
    assert(noRef(1L) == ((0L, None, Some(1L), None, Some(0L), None)), s"got $noRef")
    // and symmetrically for a single-token CANDIDATE
    val noCand = rougeOf(2, (1L, "a b", "c"))
    assert(noCand(1L) == ((0L, Some(1L), None, Some(0L), None, None)), s"got $noCand")
  }

  test("rougeN: an empty or whitespace-only side has ZERO tokens — the gramless-NULL path, no phantom '' gram") {
    // `split("", " ")` alone would yield one empty token (cand_grams = 1,
    // precision 0, and an '' gram that could clip against another phantom);
    // the token contract filters empties, so an empty CANDIDATE is gramless:
    // precision/f1 NULL, recall still 0 (defined — ADVICE r12)
    val empty = rougeOf(1, (1L, "a b", ""))
    assert(empty(1L) == ((0L, Some(2L), None, Some(0L), None, None)), s"got $empty")
    // both sides empty: everything NULL except the 0 overlap
    val both = rougeOf(1, (1L, "", ""))
    assert(both(1L) == ((0L, None, None, None, None, None)), s"got $both")
    // double spaces produce no phantom tokens either: "a  b" ≡ "a b"
    val dbl = rougeOf(2, (1L, "a  b", "a b"))
    assert(dbl(1L) == ((1L, Some(1L), Some(1L), Some(1000L), Some(1000L), Some(1000L))),
      s"got $dbl")
    // and bleuPrecisions shares the contract: empty candidate → cand_len 0,
    // every order gramless-NULL
    val b = TextEval.bleuPrecisions(pairs((1L, "a b", "")), maxN = 2)
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), Option(r.getAs[Any]("cand_grams")), r.getLong(4), r.getLong(5),
          Option(r.getAs[Any]("precision_pm"))))).toMap
    assert(b(1) == ((0L, None, 2L, 0L, None)) && b(2) == ((0L, None, 2L, 0L, None)),
      s"got $b")
  }

  test("bleuPrecisions: the classic clipped-repetition example, NULL above the token count") {
    // ref "a b a", cand "a a a" — Papineni's degenerate-repetition case:
    // n=1 clipped overlap = min(3, 2) = 2 of 3 candidate grams → 666‰
    // (unclipped would be a perfect 1000); n=2 overlap 0 ("a a" is not a
    // reference bigram); n=4 has no candidate grams at 3 tokens → NULL;
    // brevity = (1000·3) div 3 = 1000 at every order
    val got = TextEval.bleuPrecisions(pairs((1L, "a b a", "a a a")), maxN = 4)
      .collect().map { r =>
        def opt(i: Int) = Option(r.getAs[Any](i)).map(_.asInstanceOf[Long])
        r.getInt(1) -> ((r.getLong(2), opt(3), opt(6), opt(7)))
      }.toMap
    assert(got(1) == ((2L, Some(3L), Some(666L), Some(1000L))), s"got $got")
    assert(got(2) == ((0L, Some(2L), Some(0L), Some(1000L))), s"got $got")
    assert(got(3) == ((0L, Some(1L), Some(0L), Some(1000L))), s"got $got")
    assert(got(4) == ((0L, None, None, Some(1000L))), s"got $got")
  }

  test("rougeNOrders: row-identical to unioning per-order rougeN passes") {
    val rows = Seq((1L, "a a b c", "a b b"), (2L, "x y", "x y z w"),
      (3L, "q", "q q"), (4L, "", "a b"), (5L, "m n o p", ""))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2),
        Option(r.getAs[Any](3)), Option(r.getAs[Any](4)),
        Option(r.getAs[Any](5)), Option(r.getAs[Any](6)), Option(r.getAs[Any](7)))
    val tagged = TextEval.rougeNOrders(pairs(rows: _*), maxN = 2)
      .collect().map(key).toSet
    val unioned = (1 to 2).flatMap(n =>
      TextEval.rougeN(pairs(rows: _*), n).collect().map(key)).toSet
    assert(tagged == unioned,
      s"tagged-census divergence:\nonly tagged: ${tagged -- unioned}\n" +
        s"only unioned: ${unioned -- tagged}")
  }

  test("bleuPrecisions: order-1 precision equals rougeN's on the same pairs (shared clip)") {
    val rows = Seq((1L, "a a b c", "a b b"), (2L, "x y", "x y z w"),
      (3L, "q", "q q"))
    val bleu = TextEval.bleuPrecisions(pairs(rows: _*), maxN = 1)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("precision_pm"))).toMap
    val rouge = TextEval.rougeN(pairs(rows: _*), 1)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("precision_pm"))).toMap
    assert(bleu == rouge, s"clip divergence between the two operators:\n$bleu\n$rouge")
  }

  private def corpusRow(rows: (Long, String, String)*) =
    TextEval.corpusGenerationEval(pairs(rows: _*)).collect().head

  test("corpusGenerationEval: counts pool BEFORE ratios — corpus BLEU is NOT the mean of sentence BLEUs") {
    // pair 1 is perfect, pair 2 has zero bigram overlap (sentence BLEU 0).
    // Mean of sentence BLEUs = (1000 + 0)/2 = 500‰. The corpus pools:
    //   ov1 = 5+2 = 7, ct1 = 5+4 = 9 → p1 = 777   rt1 = 9 → R1 = 777
    //   ov2 = 4+0 = 4, ct2 = 4+3 = 7 → p2 = 571   rt2 = 7 → R2 = 571
    //   ov3 = 3+0 = 3, ct3 = 3+2 = 5 → p3 = 600
    //   ov4 = 2+0 = 2, ct4 = 2+1 = 3 → p4 = 666
    //   gm = ⌊⁴√(777·571·600·666)⌋ = ⌊⁴√177_289_333_200⌋ = 648
    //   lens 9 vs 9 → bp = 1000 → bleu = 648 ≠ 500 — the classic trap.
    val r = corpusRow(
      (1L, "a b c d e", "a b c d e"),
      (2L, "x y z w", "x q z v"))
    assert(r.getLong(r.fieldIndex("n_pairs")) == 2L)
    assert(r.getLong(r.fieldIndex("p1_pm")) == 777L, s"p1: $r")
    assert(r.getLong(r.fieldIndex("p2_pm")) == 571L, s"p2: $r")
    assert(r.getLong(r.fieldIndex("p3_pm")) == 600L, s"p3: $r")
    assert(r.getLong(r.fieldIndex("p4_pm")) == 666L, s"p4: $r")
    assert(r.getLong(r.fieldIndex("gm_pm")) == 648L, s"gm: $r")
    assert(r.getLong(r.fieldIndex("bp_pm")) == 1000L, s"bp: $r")
    assert(r.getLong(r.fieldIndex("bleu_pm")) == 648L, s"bleu: $r")
    // micro ROUGE pools the same way: P = R = 7000 div 9 = 777 at n=1
    assert(r.getLong(r.fieldIndex("rouge1_precision_pm")) == 777L &&
      r.getLong(r.fieldIndex("rouge1_recall_pm")) == 777L &&
      r.getLong(r.fieldIndex("rouge1_f1_pm")) == 777L, s"rouge1: $r")
    assert(r.getLong(r.fieldIndex("rouge2_f1_pm")) == 571L, s"rouge2: $r")
  }

  test("corpusGenerationEval: the brevity penalty reads the driver-evaluated literal grid") {
    // a perfect-prefix candidate at half the reference length: every
    // precision 1000 → gm 1000; q = (100·8) div 4 = 200 → bp = ⌊1000·e⁻¹⌋
    // = 367 → bleu 367
    val r = corpusRow((1L, "a b c d e f g h", "a b c d"))
    assert(r.getLong(r.fieldIndex("gm_pm")) == 1000L, s"gm: $r")
    assert(r.getLong(r.fieldIndex("bp_pm")) == 367L, s"bp: $r")
    assert(r.getLong(r.fieldIndex("bleu_pm")) == 367L, s"bleu: $r")
    assert(TextEval.brevityPenaltyGrid.toMap.apply(200L) == 367L)
    // the grid is exactly the documented ⌊1000·exp(1 − q/100)⌋ over 100..300
    assert(TextEval.brevityPenaltyGrid.size == 201 &&
      TextEval.brevityPenaltyGrid.head == ((100L, 1000L)) &&
      TextEval.brevityPenaltyGrid.last == ((300L, 135L)))
  }

  test("corpusGenerationEval: NULL composite when an order is corpus-wide gramless; zero-precision stays 0, not NULL") {
    // no candidate reaches 4 tokens → ct4 NULL → p4/gm/bleu NULL (the
    // un-smoothed definition), while ROUGE-1/2 remain defined
    val r = corpusRow((1L, "a b c d", "a b c"), (2L, "x y z", "x y"))
    assert(r.isNullAt(r.fieldIndex("p4_pm")) && r.isNullAt(r.fieldIndex("gm_pm")) &&
      r.isNullAt(r.fieldIndex("bleu_pm")), s"expected NULL composite: $r")
    assert(!r.isNullAt(r.fieldIndex("rouge1_f1_pm")) &&
      !r.isNullAt(r.fieldIndex("rouge2_f1_pm")), s"rouge must stay defined: $r")
    // DEFINED-but-zero precision zeroes the geometric mean instead:
    // 4-token candidate with zero order-2+ overlap → p2 = 0 → gm = 0, bleu 0
    val z = corpusRow((1L, "a b c d", "a c b d"))
    assert(z.getLong(z.fieldIndex("p2_pm")) == 0L &&
      z.getLong(z.fieldIndex("gm_pm")) == 0L &&
      z.getLong(z.fieldIndex("bleu_pm")) == 0L, s"got $z")
  }

  test("rougeN fuzz: operator matches an independent sliding-window replica") {
    val rnd = new scala.util.Random(11_60)
    def doc() = Seq.fill(rnd.nextInt(12))("abcde".charAt(rnd.nextInt(5)).toString)
      .mkString(" ")
    def gramCounts(s: String, n: Int): Map[Seq[String], Long] = {
      // the engine-shared token contract: split, then drop empty tokens —
      // an empty doc() has ZERO tokens, not one phantom ''
      val w = s.split(" ", -1).toSeq.filter(_.nonEmpty)
      if (w.size < n) Map.empty
      else w.sliding(n).toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    for (trial <- 0 until 3; n <- Seq(1, 2, 3)) {
      val rows = (0L until 60L).map(i => (i, doc(), doc()))
      val got = rougeOf(n, rows: _*)
      rows.foreach { case (id, ref, cand) =>
        val cr = gramCounts(ref, n); val cc = gramCounts(cand, n)
        val ov = cr.keySet.intersect(cc.keySet).toSeq
          .map(g => math.min(cr(g), cc(g))).sum
        val rg = if (cr.isEmpty) None else Some(cr.values.sum)
        val cg = if (cc.isEmpty) None else Some(cc.values.sum)
        val rec = rg.map(1000L * ov / _)
        val prec = cg.map(1000L * ov / _)
        val f1 = for (r <- rec; p <- prec)
          yield if (r + p > 0) 2 * p * r / (p + r) else 0L
        assert(got(id) == ((ov, rg, cg, rec, prec, f1)),
          s"trial $trial n=$n id=$id ref='$ref' cand='$cand': " +
            s"got ${got(id)} expected ${(ov, rg, cg, rec, prec, f1)}")
      }
    }
  }
}
