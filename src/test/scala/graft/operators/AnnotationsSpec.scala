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
}
