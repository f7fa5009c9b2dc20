package graft.operators

import graft.SparkSpec

/** Retrieval-evaluation metrics: driver-embedded DCG weights, hand-computed
 * per-query algebra (hit/miss/singleton-class regimes), and a fuzz pass
 * against an independent in-driver scorer. */
class RetrievalSpec extends SparkSpec {

  private def labelsDf(rows: (Long, Int)*) = {
    import spark.implicits._
    rows.toDF("id", "label")
  }

  private def runDf(rows: (Long, Int, Long)*) = {
    import spark.implicits._
    rows.toDF("query_id", "rank", "neighbor_id")
  }

  test("dcgWeightFp: the driver-computed rank discounts are the documented constants") {
    assert(Retrieval.dcgWeightFp(1) == 1000000L) // log2(2) = 1
    assert(Retrieval.dcgWeightFp(3) == 500000L)  // log2(4) = 2
    assert(Retrieval.dcgWeightFp(7) == 333333L)  // log2(8) = 3
    assert(Retrieval.idcgWeightsFp(3) == Seq(1000000L, 1630929L, 2130929L))
    // strictly decreasing gains, strictly increasing ideal sums
    val w = (1 to 10).map(Retrieval.dcgWeightFp)
    assert(w == w.sorted.reverse && w.distinct == w)
  }

  test("labelRetrievalMetrics: hand-computed hits, misses, and the singleton class") {
    val labels = labelsDf(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 2)
    // query 1 (class 0, n_rel = 2): hits at ranks 2 and 4
    // query 6 (class 2, singleton): nothing is ever relevant
    val run = runDf(
      (1L, 1, 4L), (1L, 2, 2L), (1L, 3, 5L), (1L, 4, 3L),
      (6L, 1, 1L))
    val got = Retrieval.labelRetrievalMetrics(run, labels, k = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = got(1L)
    assert(q1.getLong(1) == 2L && q1.getLong(2) == 2L, s"got ${q1.toSeq}")
    assert(q1.getInt(3) == 2 && q1.getLong(4) == 500000L, s"got ${q1.toSeq}")
    // dcg = W(2) + W(4) = 630929 + 430676; idcg = cum(2) = 1630929
    assert(q1.getLong(5) == 1061605L && q1.getLong(6) == 1630929L,
      s"got ${q1.toSeq}")
    assert(q1.getLong(7) == 1000L * 1061605L / 1630929L, s"got ${q1.toSeq}")
    assert(q1.getLong(8) == 1000L, s"got ${q1.toSeq}") // both relevants found
    val q6 = got(6L)
    assert(q6.getLong(1) == 0L && q6.getLong(2) == 0L && q6.isNullAt(3) &&
      q6.isNullAt(4) && q6.getLong(5) == 0L && q6.isNullAt(6) &&
      q6.isNullAt(7) && q6.isNullAt(8), s"got ${q6.toSeq}")
  }

  test("labelRetrievalMetrics: recall saturates through least(n_rel, k) in the ideal") {
    // class 0 has 15 members; query sees 10 of them at ranks 1..10 —
    // perfect-within-k: ndcg exactly 1000, recall 10/14
    val labels = labelsDf((1L to 15L).map(_ -> 0) :+ (99L -> 1): _*)
    val run = runDf((1 to 10).map(r => (1L, r, r + 1L)): _*)
    val r = Retrieval.labelRetrievalMetrics(run, labels, k = 10).collect()(0)
    assert(r.getLong(1) == 14L && r.getLong(2) == 10L, s"got ${r.toSeq}")
    assert(r.getLong(7) == 1000L, s"got ${r.toSeq}")
    assert(r.getLong(8) == 1000L * 10L / 14L, s"got ${r.toSeq}")
  }

  test("retrieval fuzz: operator matches an independent scorer on random runs") {
    val rnd = new scala.util.Random(11_54)
    val ids = (0L until 60L)
    val labels = ids.map(i => i -> rnd.nextInt(4))
    val labMap = labels.toMap
    val classN = labels.groupBy(_._2).map { case (c, v) => c -> v.size.toLong }
    val k = 10
    val queries = ids.filter(_ % 7 == 0)
    val run = queries.flatMap { q =>
      val neigh = rnd.shuffle(ids.filter(_ != q).toList).take(k)
      neigh.zipWithIndex.map { case (n, i) => (q, i + 1, n) }
    }
    val got = Retrieval.labelRetrievalMetrics(runDf(run: _*), labelsDf(labels: _*), k)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == queries.toSet)
    queries.foreach { q =>
      val r = got(q)
      val nRel = classN(labMap(q)) - 1
      val hits = run.filter(x => x._1 == q && labMap(x._3) == labMap(q))
      val dcg = hits.map(h => Retrieval.dcgWeightFp(h._2)).sum
      assert(r.getLong(1) == nRel && r.getLong(2) == hits.size.toLong,
        s"query $q: got ${r.toSeq}")
      assert(r.getLong(5) == dcg, s"query $q dcg: got ${r.toSeq}")
      if (hits.nonEmpty) {
        val first = hits.map(_._2).min
        assert(r.getInt(3) == first && r.getLong(4) == 1000000L / first,
          s"query $q mrr: got ${r.toSeq}")
      } else assert(r.isNullAt(3) && r.isNullAt(4), s"query $q: got ${r.toSeq}")
      if (nRel > 0) {
        val idcg = Retrieval.idcgWeightsFp(k)(math.min(nRel, k).toInt - 1)
        assert(r.getLong(6) == idcg && r.getLong(7) == 1000L * dcg / idcg &&
          r.getLong(8) == 1000L * hits.size / nRel, s"query $q: got ${r.toSeq}")
      } else assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8),
        s"query $q: got ${r.toSeq}")
    }
  }
}
