package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Preference-data operators — the statistics layer an RLHF / evaluation
 * pipeline runs over pairwise model comparisons ("duels": item, two model
 * ids, a winner) before trusting a ranking: per-pair win rates with a
 * confidence-aware lower bound, so "A beats B 2/2" never outranks
 * "C beats D 180/200".
 *
 * Engine-exactness: the Wilson score interval needs one square root; the
 * contract QUANTIZES it — isqrt(x) := floor(sqrt(double(x))) — which is
 * engine-independent bits (int64→double rounding, IEEE-exact sqrt, floor:
 * every step is deterministic and identical in Spark and DuckDB), so the
 * whole statistic stays 64-bit integer arithmetic with no libm exposure.
 *
 * Scale posture: duels aggregate by UNORDERED pair in ONE map-side-
 * combinable exchange whose output is models² rows — driver-sized for any
 * corpus of comparisons. No windows, no joins.
 */
object Preferences {

  /**
   * Win-rate table over every observed unordered model pair. `duels`
   * carries one row per comparison: (item, model_a, model_b, winner) with
   * winner ∈ {model_a, model_b} (rows violating that are the caller's
   * contract to prevent — they would count as losses for the lo side).
   * Pairs are normalized lo = min, hi = max; output one row per pair:
   *
   *   - `n`, `wins_lo` — comparisons and lo-side wins
   *   - `win_pm`       — (1000·wins_lo) div n
   *   - `wilson_lb_pm` / `wilson_ub_pm` — the z=2 (~95.4%) Wilson interval
   *     for lo's true win rate, ×1e3, under the quantized contract:
   *       y  = (wins_lo·(n−wins_lo)) div n + 1        (radicand, exact)
   *       lb = (1000·(w+2) − 2·isqrt(1e6·y)) div (n+4)
   *       ub = (1000·(w+2) + 2·isqrt(1e6·y)) div (n+4)
   *     z=2 keeps every coefficient integral (z² = 4) — no float enters
   *     until the single contract-quantized isqrt. Exact int64 domain:
   *     w(n−w) ≤ n²/4 < 2^63 and 1e6·y ≤ 2.5e5·n < 2^63 → n ≤ 3.6e13
   *     comparisons per pair.
   *
   * A pair ranking should sort by `wilson_lb_pm` (the lower bound is the
   * "pessimistic" win rate — the classic Wilson-sort used for rating
   * aggregation), which this emits but does not impose.
   */
  def pairwiseWinRates(duels: DataFrame): DataFrame =
    duels
      .select(
        least(col("model_a"), col("model_b")).as("model_lo"),
        greatest(col("model_a"), col("model_b")).as("model_hi"),
        when(col("winner") === least(col("model_a"), col("model_b")), 1L)
          .otherwise(0L).as("lo_win"))
      .groupBy(col("model_lo"), col("model_hi"))
      .agg(count(lit(1)).as("n"), sum(col("lo_win")).as("wins_lo"))
      .select(col("model_lo"), col("model_hi"), col("n"), col("wins_lo"),
        expr("(1000 * wins_lo) div n").as("win_pm"),
        expr("(wins_lo * (n - wins_lo)) div n + 1").as("y"))
      .select(col("model_lo"), col("model_hi"), col("n"), col("wins_lo"),
        col("win_pm"),
        expr("(1000 * (wins_lo + 2) - 2 * cast(floor(sqrt(cast(1000000 * y as double))) as bigint)) div (n + 4)")
          .as("wilson_lb_pm"),
        expr("(1000 * (wins_lo + 2) + 2 * cast(floor(sqrt(cast(1000000 * y as double))) as bigint)) div (n + 4)")
          .as("wilson_ub_pm"))
}
