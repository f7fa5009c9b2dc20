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

  test("temperatureGrid values are TRUE mathematical floors at every τ (no libm ulp)") {
    // v = ⌊1e6·(s/1000)^(τ/10)⌋ ⟺ v^10 ≤ 10^(60−3τ₁₀)·s^τ₁₀ < (v+1)^10 —
    // checked exactly in BigInt for every grid cell of every τ (ADVICE r13:
    // math.pow's ulp could flip the floor at exact powers, e.g. τ=0.5
    // s=250 where the true value is exactly 0.5)
    for (t <- 0 to 10; (s, v) <- Mixtures.temperatureGrid(t) if s > 0) {
      val n = BigInt(10).pow(60 - 3 * t) * BigInt(s).pow(t)
      assert(BigInt(v).pow(10) <= n && n < BigInt(v + 1).pow(10),
        s"tau=$t/10 s=$s: $v is not the exact floor")
    }
    // the τ=0.5 grid now agrees with the IEEE-exact-sqrt path everywhere:
    // ⌊1e6·sqrt(s/1000)⌋ = isqrt(1e9·s)
    def isqrt(n: BigInt): BigInt = {
      var x = BigInt(math.sqrt(n.toDouble).toLong + 2)
      while (x * x > n) x = (x + n / x) / 2
      x
    }
    for ((s, v) <- Mixtures.temperatureGrid(5))
      assert(BigInt(v) == isqrt(BigInt(1000000000L) * s), s"tau=0.5 s=$s")
  }

  test("domainMixtureFine: a sub-permille domain keeps a NONZERO weight at τ=0.7") {
    // 'tiny' = 1 token of 20001 (≈ 50 ppm = 0.005% — the permille variant
    // zeroes it; VERDICT r13 #5 names this exact cliff)
    val fine = Mixtures.domainMixtureFine(
        docs((1L, "big", words(20000)), (2L, "tiny", "x")), tauTenths = 7)
      .orderBy("source").collect()
    val coarse = Mixtures.domainMixture(
        docs((1L, "big", words(20000)), (2L, "tiny", "x")), tauTenths = 7)
      .orderBy("source").collect()
    val (tF, tC) = (fine(1), coarse(1))
    assert(tC.getLong(tC.fieldIndex("share_pm")) == 0L &&
      tC.getLong(tC.fieldIndex("mix_pm")) == 0L,
      "precondition: the permille variant drops this domain")
    // share: 1000·1 div (20001 div 1000) = 1000 div 20 = 50 ppm
    assert(tF.getLong(tF.fieldIndex("share_ppm")) == 50L)
    assert(tF.getLong(tF.fieldIndex("temp_wt")) > 0L)
    assert(tF.getLong(tF.fieldIndex("mix_ppm")) > 0L)
    // τ < 1 up-samples the small domain vs natural
    assert(tF.getLong(tF.fieldIndex("upsample_fp")) > 1000000L)
  }

  test("domainMixtureFine: ≥1-token domains always participate (share clamps to ≥ 1 ppm)") {
    // 1 token in ~2.1M: raw ppm division floors to 0; the clamp keeps it 1
    val got = Mixtures.domainMixtureFine(
        docs(((1L to 42L).map(i => (i, "big", words(50000))) :+
          (99L, "tiny", "x")): _*), tauTenths = 7)
      .orderBy("source").collect()
    val t = got(1)
    assert(t.getLong(t.fieldIndex("share_ppm")) == 1L)
    assert(t.getLong(t.fieldIndex("temp_wt")) > 0L)
    assert(t.getLong(t.fieldIndex("mix_ppm")) > 0L)
  }

  test("domainMixtureFine: 2-significant-digit share quantization, hand case") {
    // shares: a = 345/1000 tokens → ppm = 345·1000 div 1 = 345000? no:
    // total 1000 < 1000? total = 1000 → (1000·345) div (1000 div 1000) …
    // keep it simple: a 345-token + 655-token corpus (total 1000 ≥ 1000):
    // a: (1000·345) div 1 = 345000 ppm → quantizes to 340000 (2 sig digits)
    val g = Mixtures.temperatureGridPpm(7).toMap
    val got = Mixtures.domainMixtureFine(
        docs((1L, "a", words(345)), (2L, "b", words(655))), tauTenths = 7)
      .orderBy("source").collect()
    val a = got(0)
    assert(a.getLong(a.fieldIndex("share_ppm")) == 345000L)
    assert(a.getLong(a.fieldIndex("temp_wt")) == g(340000L),
      "345000 ppm must read the 340000 grid cell (floor to 2 significant digits)")
  }

  test("temperatureGridPpm: exact floors, bounded 461-value domain, τ=0/τ=1 regimes") {
    assert(Mixtures.quantizedPpmShares.size == 461)
    assert(Mixtures.quantizedPpmShares.last == 1000000L)
    for (t <- Seq(0, 5, 7, 10); (s, v) <- Mixtures.temperatureGridPpm(t) if s > 0) {
      val n = BigInt(10).pow(90 - 6 * t) * BigInt(s).pow(t)
      assert(BigInt(v).pow(10) <= n && n < BigInt(v + 1).pow(10),
        s"ppm grid tau=$t/10 s=$s: $v is not the exact floor")
    }
    assert(Mixtures.temperatureGridPpm(10).forall { case (s, v) => v == s * 1000 })
    assert(Mixtures.temperatureGridPpm(0).forall { case (s, v) =>
      v == (if (s == 0) 0L else 1000000000L) })
  }
}
