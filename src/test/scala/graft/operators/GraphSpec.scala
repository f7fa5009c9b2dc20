package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point PageRank: bit-exact agreement with a driver-side recompute,
 * and the structural properties integer damping must preserve. */
class GraphSpec extends SparkSpec {

  /** The operator's contract, recomputed in plain Scala collections. */
  private def referencePr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contribs = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (u, _) => (pr(u) * 85L) / (100L * outdeg(u)) }.sum
      }.toMap
      pr = nodes.map(n => n -> (150000L + contribs.getOrElse(n, 0L))).toMap
    }
    pr
  }

  test("pageRankInt is bit-identical to the driver-side fixed-point recompute") {
    import spark.implicits._
    // a lopsided graph: hub 1 pointed at by everyone, a chain, a dangler
    val pairs = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (2L, 3L),
      (3L, 4L), (6L, 2L), (7L, 6L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRankInt(edges, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == referencePr(pairs ++ pairs.map(_.swap), 4))
    // the hub outranks every leaf
    assert(got(1L) > got(7L) && got(1L) > got(5L))
  }

  test("a symmetric 2-cycle is a fixpoint: ranks stay at scale forever") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    Seq(1, 3).foreach { iters =>
      val got = Graph.pageRankInt(edges, iterations = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // base 150000 + (1000000*85) div 100 = exactly 1000000 again
      assert(got == Map(1L -> 1000000L, 2L -> 1000000L))
    }
  }

  test("triangles: clique, star, and orientation-count-once invariants") {
    import spark.implicits._
    def tri(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
      Graph.triangles(edges.toDF("u", "v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // K4 → exactly its 4 triangles, each listed once
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(tri(k4) == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    // a star has no triangles; input orientation/dups/self-loops are ignored
    assert(tri(Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (4L, 4L))) == Set())
    // hub stress: a 20-leaf hub plus one closing rim edge → exactly the one
    // triangle through the rim, found despite the hub's high degree
    val hub = (2L to 21L).map(x => (1L, x)) :+ (2L, 3L)
    assert(tri(hub) == Set((1L, 2L, 3L)))
  }

  test("triangles match the brute-force closure on a pseudo-random graph") {
    import spark.implicits._
    // deterministic ~80-edge graph on 24 vertices (md5-derived endpoints)
    def h(i: Int, salt: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(8), 16)
    val edges = (0 until 80).map(i => (h(i, "a") % 24, h(i, "b") % 24))
      .filter { case (a, b) => a != b }
    val got = Graph.triangles(edges.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val vs = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expected = (for {
      a <- vs; b <- vs if a < b; c <- vs if b < c
      if und((a, b)) && und((a, c)) && und((b, c))
    } yield (a, b, c)).toSet
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
    assert(expected.nonEmpty, "the random graph must contain triangles")
  }
}
