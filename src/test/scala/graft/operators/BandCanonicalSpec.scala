package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Dedup.bandCanonicalPairs — the fused canonical-band enumeration — must be
 * pair-SET-identical to the composite path (`bucketedPairs(block<o>Bands)`
 * annotated with brute-force Hamming) at every order, both block widths,
 * and under a BINDING hot-bucket cap, including the rescue case: a pair
 * whose lexicographically-first clean band lands in a HOT bucket must still
 * be emitted from its first small clean band.
 */
class BandCanonicalSpec extends SparkSpec {

  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Random corpus with planted near-groups: base hashes plus variants at
   * a few flipped bits, so buckets of every size appear. */
  private def fixture(n: Int, words: Int): Seq[(Long, Seq[Long])] =
    (0 until n).map { i =>
      val base = (0 until words).map(w => mix(i / 8 * 31 + w))
      val flips = i % 8 // 0..7 bit flips off the group base
      val h = (0 until words).map { w =>
        var v = base(w)
        for (f <- 0 until flips if f % words == w)
          v ^= 1L << ((mix(i * 131 + f) & 63).toInt)
        v
      }
      (i.toLong, h)
    }

  private def composite(df: DataFrame, blocks: Int, order: Int,
                        maxBucket: Int): Set[(Long, Long, Long)] = {
    val bands = order match {
      case 2 => Dedup.blockPairBands(df, blocks)
      case 3 => Dedup.blockTripleBands(df, blocks)
      case 4 => Dedup.blockQuadBands(df, blocks)
    }
    val hashOf = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def ham(a: Long, b: Long): Long =
      hashOf(a).zip(hashOf(b))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    Dedup.bucketedPairs(bands, maxBucket).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (a, b, ham(a, b)) }.toSet
  }

  private def fused(df: DataFrame, blocks: Int, order: Int,
                    maxBucket: Int): Set[(Long, Long, Long)] =
    Dedup.bandCanonicalPairs(df, blocks, order, maxBucket).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("fused == composite at orders 2/3/4, blocks 8, no cap binding") {
    import spark.implicits._
    val df = fixture(240, 1).toDF("id", "hash")
    for (order <- 2 to 4) {
      val want = composite(df, 8, order, 10000)
      val got = fused(df, 8, order, 10000)
      assert(want.nonEmpty, s"fixture must collide at order=$order")
      assert(got == want,
        s"order=$order: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    }
  }

  test("fused == composite at blocks 16 (two-word hashes), order 3") {
    import spark.implicits._
    val df = fixture(160, 2).toDF("id", "hash")
    val want = composite(df, 16, 3, 10000)
    val got = fused(df, 16, 3, 10000)
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("fused == composite under a BINDING cap, hot-canonical rescue included") {
    import spark.implicits._
    // 12 ids identical in blocks (0,1) — band (0,1) is one hot bucket at
    // maxBucket=3; two of them (ids 100, 101) also share blocks (2,3)
    // uniquely, so their first clean band (0,1) is HOT and the rescue must
    // emit them from the small (2,3) bucket exactly as the composite does
    val shared01 = 0xabcdL // blocks 0,1
    val rows =
      (0 until 12).map { i =>
        val rest = mix(i + 50) & ~0xffffffffL | (mix(i + 90) & 0xffff0000L)
        (i.toLong, Seq(shared01 | (rest << 32) | ((mix(i) & 0xffffL) << 16)))
      } ++ Seq(
        (100L, Seq(shared01 | (0x11223344L << 32) | (0x5566L << 16))),
        (101L, Seq(shared01 | (0x99887766L << 32) | (0x5566L << 16))))
    val df = rows.toDF("id", "hash")
    for (cap <- Seq(3, 10000)) {
      val want = composite(df, 8, 2, cap)
      val got = fused(df, 8, 2, cap)
      assert(got == want,
        s"cap=$cap: extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
    }
    // the rescue case is actually exercised: at cap=3 the (100, 101) pair
    // must be present (via the small blocks-(2,3) bucket)
    assert(fused(df, 8, 2, 3).exists(p => p._1 == 100L && p._2 == 101L),
      "the hot-canonical pair must be rescued through its small band")
  }

  test("collapsedVerifiedPairs == collapsedBandCandidates + verify (the q169 semantics)") {
    import spark.implicits._
    // identical-hash classes + near variants (the q169 shape)
    val rows = (0 until 60).map { i =>
      val cls = i / 6
      val base = mix(cls * 17) | 1L
      val h = if (i % 6 < 3) base else base ^ (1L << ((i % 6) * 7))
      (i.toLong, Seq(h))
    }
    val df = rows.toDF("id", "hash")
    val fusedOut = Dedup.collapsedVerifiedPairs(df, 8, 2, budget = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashOf = rows.map { case (id, h) => id -> h.head }.toMap
    def ham(a: Long, b: Long) =
      java.lang.Long.bitCount(hashOf(a) ^ hashOf(b)).toLong
    val candidate = Dedup
      .collapsedBandCandidates(df, Dedup.blockPairBands(_, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (a, b, ham(a, b)) }
      .filter(_._3 <= 6).toSet
    assert(fusedOut.nonEmpty && fusedOut == candidate,
      s"extra=${(fusedOut -- candidate).take(3)} missing=${(candidate -- fusedOut).take(3)}")
  }
}
