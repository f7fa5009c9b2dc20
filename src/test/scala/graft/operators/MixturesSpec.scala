package graft.operators

import graft.SparkSpec

/** Temperature-scaled domain mixture: grid endpoints and floor bits,
 * hand-computed mixture at τ=0.7, the τ=1/τ=0 identity regimes, and the
 * zero-share / degenerate-corpus NULL contracts. */
class MixturesSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("temperatureGrid: endpoints, monotonicity, known interior values") {
    val g = Mixtures.temperatureGrid(7).toMap
    assert(g(0L) == 0L && g(1000L) == 1000000L)
    // ⌊1e6·0.5^0.7⌋ = 615572 (driver-recomputed here, same expression)
    assert(g(500L) == math.floor(1e6 * math.pow(0.5, 0.7)).toLong)
    val vals = Mixtures.temperatureGrid(7).map(_._2)
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b }, "not monotone")
    // τ=10 is identity on the quantized share (×1000)
    assert(Mixtures.temperatureGrid(10).forall { case (s, v) => v == s * 1000 })
    // τ=0 is uniform: every non-zero share maps to exactly 1e6
    assert(Mixtures.temperatureGrid(0).forall { case (s, v) =>
      v == (if (s == 0) 0L else 1000000L) })
  }

  test("domainMixture: hand-computed τ=0.7 table, small domain up-sampled") {
    // a: 900 tokens (share 900‰), b: 100 tokens (share 100‰)
    val got = Mixtures.domainMixture(
        docs((1L, "a", words(900)), (2L, "b", words(100))), tauTenths = 7)
      .orderBy("source").collect()
    val g = Mixtures.temperatureGrid(7).toMap
    val (wa, wb) = (g(900L), g(100L))
    val a = got(0); val b = got(1)
    assert(a.getLong(a.fieldIndex("share_pm")) == 900L)
    assert(a.getLong(a.fieldIndex("temp_wt")) == wa)
    assert(a.getLong(a.fieldIndex("mix_pm")) == 1000L * wa / (wa + wb))
    assert(b.getLong(b.fieldIndex("share_pm")) == 100L)
    assert(b.getLong(b.fieldIndex("mix_pm")) == 1000L * wb / (wa + wb))
    // the τ<1 point: the small domain's mixture weight EXCEEDS its natural
    // share (upsample_fp > 1e6), the big domain's shrinks
    assert(b.getLong(b.fieldIndex("upsample_fp")) > 1000000L)
    assert(a.getLong(a.fieldIndex("upsample_fp")) < 1000000L)
  }

  test("domainMixture: τ=10 reproduces natural sampling up to quantization") {
    val got = Mixtures.domainMixture(
        docs((1L, "a", words(750)), (2L, "b", words(250))), tauTenths = 10)
      .orderBy("source").collect()
    assert(got(0).getLong(got(0).fieldIndex("mix_pm")) == 750L)
    assert(got(1).getLong(got(1).fieldIndex("mix_pm")) == 250L)
  }

  test("domainMixture: zero-share domain gets zero weight, NULL upsample") {
    val got = Mixtures.domainMixture(
        docs((1L, "a", words(10)), (2L, "z", "")), tauTenths = 7)
      .orderBy("source").collect()
    val z = got(1)
    assert(z.getLong(z.fieldIndex("share_pm")) == 0L)
    assert(z.getLong(z.fieldIndex("temp_wt")) == 0L)
    assert(z.getLong(z.fieldIndex("mix_pm")) == 0L)
    assert(z.isNullAt(z.fieldIndex("upsample_fp")))
  }

  test("domainMixture: all-empty corpus yields NULL mix_pm, never a crash") {
    val got = Mixtures.domainMixture(docs((1L, "a", ""), (2L, "b", " ")), 7)
      .orderBy("source").collect()
    assert(got.forall(r => r.isNullAt(r.fieldIndex("mix_pm"))))
  }
}
