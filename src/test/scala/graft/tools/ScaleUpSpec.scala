package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The scaling methodology's own evidence: every r12 exponent claim rides on
 * ScaleUp's replica discipline, so the transforms are property-tested here —
 * the cipher must be a bijection (shingle structure preserved within a
 * replica), pairwise distinct (no cross-replica exact twins), and the
 * embedding transform must be orthogonal (intra-replica cosines exact) and
 * pairwise distinct up to dim·2^dim replicas.
 */
class ScaleUpSpec extends SparkSpec {

  private val alphabet = "abcdefghijklmnopqrstuvwxyz"

  test("cipher: identity at r=0, a true bijection of the alphabet at every r") {
    assert(ScaleUp.perm(0) == ((alphabet, alphabet.toUpperCase)))
    for (r <- 1 until 200) {
      val (lo, up) = ScaleUp.perm(r)
      assert(lo.toCharArray.sorted.mkString == alphabet,
        s"r=$r lower cipher is not a permutation: $lo")
      assert(up == lo.toUpperCase, s"r=$r case mismatch")
    }
  }

  test("cipher: pairwise distinct across 200 replicas (no planted exact text twins)") {
    val perms = (0 until 200).map(ScaleUp.perm(_)._1)
    assert(perms.distinct.size == 200,
      "two replicas drew the same substitution cipher")
  }

  test("signed rotation: orthogonal — norms and intra-replica dot products exact") {
    import spark.implicits._
    // integer-valued floats: reordering and sign-flipping change neither the
    // multiset of squared terms nor the product terms' values, and integer
    // sums are exact in float regardless of order — so equality is EXACT
    val dim = 8
    val a = Seq(3f, -1f, 4f, 1f, -5f, 9f, 2f, -6f)
    val b = Seq(2f, 7f, -1f, 8f, 2f, -8f, 1f, 8f)
    def dot(x: Seq[Float], y: Seq[Float]): Double =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    val df = Seq((a, b)).toDF("a", "b")
    for (r <- Seq(0, 1, 7, 8, 9, 16, 23, 100)) {
      val row = df.select(
        ScaleUp.signedRotate(col("a"), r, dim).as("ta"),
        ScaleUp.signedRotate(col("b"), r, dim).as("tb")).head()
      val ta = row.getSeq[Float](0); val tb = row.getSeq[Float](1)
      assert(dot(ta, ta) == dot(a, a) && dot(tb, tb) == dot(b, b),
        s"r=$r norms not preserved")
      assert(dot(ta, tb) == dot(a, b),
        s"r=$r intra-replica dot product not preserved: ${dot(ta, tb)} vs ${dot(a, b)}")
      if (r == 0) assert(ta == a && tb == b, "r=0 must be the identity")
    }
  }

  test("embedding transforms: distinct to k=200 at dim 64; collision CAUGHT at tiny dim") {
    // dim 64 (the testdata width): distinct by construction (splitmix64 is
    // a 64-bit bijection), which the sf10 generation's require relies on
    val keys64 = (0 until 200).map(ScaleUp.embTransformKey(_, 64))
    assert(keys64.distinct.size == 200)
    // dim 1: rotation is always 0 and the sign word has ONE usable bit, so
    // at most 3 distinct transforms exist — the distinctness check the
    // generator runs must catch this class, not assume it away
    val keys1 = (0 until 5).map(ScaleUp.embTransformKey(_, 1))
    assert(keys1.distinct.size < 5,
      "dim-1 transforms cannot all be distinct; the generator guard depends on detecting this")
  }
}
