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

  /** ⌊1e6·(s/1000)^τ⌋ for s ∈ 0..1000 at τ = `tauTenths`/10 — the plan-
   * literal power table. math.pow is exact enough here by a wide margin:
   * the grid value is an integer ≤ 1e6 and pow's ≤1-ulp error is ~1e-10
   * relative, so the floor is unambiguous except at exact-integer powers,
   * which s^0.7 never hits for 0 < s < 1000. */
  def temperatureGrid(tauTenths: Int): Seq[(Long, Long)] = {
    require(tauTenths >= 0 && tauTenths <= 10,
      s"tau must be in [0, 1] in tenths (got $tauTenths/10)")
    (0L to 1000L).map { s =>
      val v =
        if (s == 0L) 0L
        else math.floor(1e6 * math.pow(s / 1000.0, tauTenths / 10.0)).toLong
      s -> v
    }
  }

  /**
   * Per-source mixture table over a `documents`-shaped frame (`source`,
   * `text`): natural token share (‰), temperature-scaled weight from the
   * [[temperatureGrid]], normalized mixture weight (‰), and the resulting
   * up/down-sampling ratio ×1e6 vs. natural sampling.
   *
   * Output: `source, n_docs, n_tokens, share_pm, temp_wt, mix_pm,
   * upsample_fp` — `upsample_fp` NULL for a zero-share domain (nothing to
   * up-sample) and `mix_pm` NULL on an all-empty corpus.
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
}
