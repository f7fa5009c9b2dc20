package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/**
 * Differential + property tests for the round-9 text-prep operators:
 * winnowing fingerprint selection (TextFunctions.winnow), the overlapping
 * RAG chunker (CorpusOps.chunkOverlap), and corpus-common-line removal with
 * reconstruction (CorpusOps.lineDedup). Each is checked against a
 * brute-force Scala reference on random tiny-vocab corpora (collision-heavy
 * by construction), plus the paper-level guarantee winnowing exists for.
 */
class TextPrepSpec extends SparkSpec {

  import spark.implicits._

  /** Scala twin of TextFunctions.hash60. */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Brute-force winnowing: k-gram (hash, pos) pairs, min per w-window
   * (lexicographic tuple min = leftmost minimal hash), distinct. */
  private def refWinnow(w: Vector[String], k: Int, ww: Int): Set[(Long, Int)] = {
    val grams = (0 to w.length - k)
      .map(i => (h60(w.slice(i, i + k).mkString(" ")), i))
    (0 to math.max(grams.length - ww, 0))
      .map(j => grams.slice(j, j + math.min(ww, grams.length)).min)
      .toSet
  }

  test("winnow equals the brute-force reference on random tiny-vocab docs") {
    val rnd = new Random(20260814L)
    val k = 3
    val ww = 4
    val docs = (1L to 40L).flatMap { id =>
      val vocab = (1 to (2 + rnd.nextInt(3))).map(i => s"t$i")
      val w = Vector.fill(k + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      if (w.length >= k) Some(id -> w) else None
    }
    val got = docs.toDF("id", "ws")
      .select(col("id"), explode(TextFunctions.winnow(col("ws"), k, ww)).as("f"))
      .select(col("id"), col("f.h"), col("f.p"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((id, w) <- docs)
      assert(got.getOrElse(id, Set.empty) == refWinnow(w, k, ww),
        s"doc $id tokens=$w")
  }

  test("native winnow_select equals the HOF winnow element-for-element") {
    // the fused deque kernel must reproduce the HOF output EXACTLY —
    // including selection ORDER (first-occurrence distinct) and leftmost
    // tie-breaks, which the tiny vocab makes collision-heavy
    val rnd = new Random(90210L)
    val k = 3
    val ww = 4
    val docs = (1L to 60L).map { id =>
      val vocab = (1 to (2 + rnd.nextInt(3))).map(i => s"t$i")
      id -> Vector.fill(k + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
    }
    val df = docs.toDF("id", "ws")
    def arrOf(c: org.apache.spark.sql.Column): Map[Long, Seq[(Long, Int)]] =
      df.select(col("id"), c.as("sel")).collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(f => (f.getLong(0), f.getInt(1)))
      }.toMap
    val hof = arrOf(TextFunctions.winnow(col("ws"), k, ww))
    val native = arrOf(call_function("winnow_select", col("ws"), lit(k), lit(ww)))
    docs.foreach { case (id, w) =>
      assert(native(id) == hof(id), s"doc $id tokens=$w")
    }
    // degenerate shapes: ng < w (one window), ng == 1, and all-equal tokens
    Seq(Vector("a", "a", "a"), Vector("a", "b", "c", "a", "b", "c"),
      Vector.fill(9)("z")).zipWithIndex.foreach { case (w, i) =>
      val d2 = Seq((i.toLong, w)).toDF("id", "ws")
      def one(c: org.apache.spark.sql.Column) =
        d2.select(c).first().getSeq[org.apache.spark.sql.Row](0)
          .map(f => (f.getLong(0), f.getInt(1)))
      assert(one(call_function("winnow_select", col("ws"), lit(k), lit(ww))) ==
        one(TextFunctions.winnow(col("ws"), k, ww)), s"case $i: $w")
    }
  }

  test("winnowing guarantee: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    val rnd = new Random(7L)
    val k = 3
    val ww = 4
    for (trial <- 1 to 15) {
      // a shared run of exactly w+k-1 tokens planted inside two random docs
      val run = Vector.fill(ww + k - 1)(s"r${trial}_${rnd.nextInt(4)}")
      def doc() = Vector.fill(rnd.nextInt(8))(s"x${rnd.nextInt(20)}") ++ run ++
        Vector.fill(rnd.nextInt(8))(s"y${rnd.nextInt(20)}")
      val (a, b) = (doc(), doc())
      val fa = refWinnow(a, k, ww).map(_._1)
      val fb = refWinnow(b, k, ww).map(_._1)
      assert((fa intersect fb).nonEmpty, s"trial $trial: a=$a b=$b")
      // and the Spark side selects the same sets (sanity via one doc)
      val gotA = Seq((1L, a)).toDF("id", "ws")
        .select(explode(TextFunctions.winnow(col("ws"), k, ww)).as("f"))
        .select(col("f.h")).collect().map(_.getLong(0)).toSet
      assert(gotA == fa)
    }
  }

  test("chunkOverlap covers every token, strides correctly, keeps the tail") {
    val rnd = new Random(11L)
    val docs = (1L to 30L).map { id =>
      id -> Vector.fill(1 + rnd.nextInt(90))(s"w${rnd.nextInt(7)}")
    }
    val cs = 32
    val st = 24
    val rows = CorpusOps.chunkOverlap(
      docs.map { case (id, w) => (id, w.mkString(" ")) }.toDF("doc_id", "text"),
      col("doc_id"), col("text"), cs, st)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))
      .groupBy(_._1)
    for ((id, w) <- docs) {
      val n = w.length
      val expectedStarts = (0 until n by st).toVector
      val ch = rows(id).sortBy(_._3)
      assert(ch.map(_._3).toVector == expectedStarts, s"doc $id starts")
      for ((_, idx, start, end, ntok, text) <- ch) {
        assert(idx == start / st)
        assert(end == math.min(start + cs, n))
        assert(ntok == end - start)
        assert(text == w.slice(start, end).mkString(" "), s"doc $id chunk $idx")
      }
      // union of [start, end) covers 0..n exactly (tail kept, no gaps)
      val covered = ch.flatMap(c => c._3 until c._4).toSet
      assert(covered == (0 until n).toSet, s"doc $id coverage")
    }
  }

  /** Brute-force lineDedup on token vectors. */
  private def refLineDedup(docs: Seq[(Long, Vector[String])], u: Int,
                           minOcc: Int): Map[Long, (Long, Long, String)] = {
    def segs(w: Vector[String]) =
      (0 until w.length by u).map(s => w.slice(s, math.min(s + u, w.length)))
    val census = docs.flatMap(d => segs(d._2)).groupBy(_.mkString(" "))
      .view.mapValues(_.size).toMap
    docs.map { case (id, w) =>
      val kept = segs(w).filter(s => census(s.mkString(" ")) < minOcc)
      (id, (w.length.toLong, kept.map(_.length).sum.toLong,
        kept.map(_.mkString(" ")).mkString(" ")))
    }.toMap
  }

  test("lineDedup equals the brute-force census-and-rebuild on random corpora") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 10) {
      val vocab = (1 to (2 + rnd.nextInt(3))).map(i => s"v$i")
      val u = 2 + rnd.nextInt(3)
      val docs = (1L to (3 + rnd.nextInt(6)).toLong).map { id =>
        id -> Vector.fill(1 + rnd.nextInt(13))(vocab(rnd.nextInt(vocab.size)))
      }
      val expected = refLineDedup(docs, u, minOcc = 2)
      val got = CorpusOps.lineDedup(
        docs.map { case (id, w) => (id, w.mkString(" ")) }.toDF("doc_id", "text"),
        col("doc_id"), col("text"), u, minOcc = 2)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == expected, s"trial $trial (u=$u) docs=$docs")
    }
  }

  test("lineDedup: a fully-duplicated document reconstructs to empty text") {
    val w = Vector("a", "b", "c", "d", "e", "f")
    val docs = Seq((1L, w.mkString(" ")), (2L, w.mkString(" ")),
      (3L, "q r s t u v"))
    val got = CorpusOps.lineDedup(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), unitTokens = 3, minOcc = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((0L, "")) && got(2L) == ((0L, "")))
    assert(got(3L) == ((6L, "q r s t u v")))
  }
}
