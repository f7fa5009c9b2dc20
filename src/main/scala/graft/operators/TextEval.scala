package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generation-evaluation operators — the text-overlap metrics a training
 * pipeline runs over (reference, candidate) pairs before trusting generated
 * or compressed data: summarization QA, distillation-output screening,
 * paraphrase-augmentation audits.
 *
 * ROUGE-N (Lin 2004, "ROUGE: A Package for Automatic Evaluation of
 * Summaries") with the official MULTISET clipping: the overlap credited for
 * an n-gram is min(count_ref, count_cand) — a candidate repeating one
 * reference gram ten times scores it once per reference occurrence, never
 * ten. The common set-intersection approximation is NOT what this computes.
 *
 * Engine-exactness: counts are integers and every ratio is ×1e3 integer
 * floor division, so the DuckDB oracle reproduces identical bits; no float
 * enters anywhere.
 */
object TextEval {

  /**
   * Per-pair ROUGE-N. `pairs` carries (id, reference, candidate) — both
   * whitespace-tokenized text columns (the engine-shared `tokens` contract).
   * One output row per input pair:
   *
   *   - `n`            — the gram order (echoed, so unions over n stack)
   *   - `overlap`      — Σ_g min(count_ref(g), count_cand(g)), clipped
   *   - `ref_grams` / `cand_grams` — total (non-distinct) n-gram counts;
   *     NULL when the side has fewer than n tokens (no grams exist)
   *   - `recall_pm`    — (1000·overlap) div ref_grams, NULL only when the
   *     REFERENCE is gramless (a gramless candidate still scores recall 0)
   *   - `precision_pm` — (1000·overlap) div cand_grams, NULL only when the
   *     CANDIDATE is gramless
   *   - `f1_pm`        — (2·P·R) div (P+R) in the same ×1e3 fixed point;
   *     0 when P = R = 0, NULL when either side is undefined
   *
   * Scale posture: two narrow explodes feed one (id, gram) census per side
   * (map-side combinable), the clip is an equi-join on (id, gram), and
   * everything re-collapses to one row per pair — all joins equi on id or
   * (id, gram), output bounded by the input pair count. No windows, no
   * driver state; cost is linear in total token volume.
   */
  def rougeN(pairs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    def grams(c: Column): Column = {
      val w = split(c, " ")
      when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => array_join(slice(w, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }
    val ref = pairs.select(col("id"), explode(grams(col("reference"))).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("cr"))
    val cand = pairs.select(col("id"), explode(grams(col("candidate"))).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("cc"))
    val overlap = ref.join(cand, Seq("id", "g"))
      .groupBy(col("id")).agg(sum(least(col("cr"), col("cc"))).as("overlap"))
    val rTot = ref.groupBy(col("id")).agg(sum(col("cr")).as("ref_grams"))
    val cTot = cand.groupBy(col("id")).agg(sum(col("cc")).as("cand_grams"))
    pairs.select(col("id"))
      .join(rTot, Seq("id"), "left")
      .join(cTot, Seq("id"), "left")
      .join(overlap, Seq("id"), "left")
      .select(col("id"), lit(n).as("n"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        col("ref_grams"), col("cand_grams"))
      .select(col("id"), col("n"), col("overlap"),
        col("ref_grams"), col("cand_grams"),
        // each side's total is NULL only when that side has no grams at
        // all; a gramless CANDIDATE still leaves recall defined (0 of the
        // reference grams were produced) and vice versa
        when(col("ref_grams").isNotNull,
          expr("(1000 * overlap) div ref_grams")).as("recall_pm"),
        when(col("cand_grams").isNotNull,
          expr("(1000 * overlap) div cand_grams")).as("precision_pm"))
      .select(col("id"), col("n"), col("overlap"),
        col("ref_grams"), col("cand_grams"),
        col("recall_pm"), col("precision_pm"),
        when(col("recall_pm").isNotNull && col("precision_pm").isNotNull,
          when(col("recall_pm") + col("precision_pm") > 0,
            expr("(2 * precision_pm * recall_pm) div (precision_pm + recall_pm)"))
            .otherwise(lit(0L))).as("f1_pm"))
  }

  /**
   * BLEU modified n-gram precisions (Papineni et al. 2002) for orders
   * 1..maxN in ONE pass — the candidate-side counterpart of [[rougeN]]:
   * per (id, n), clipped overlap (candidate counts clipped at the
   * reference's — the "modified" in modified precision), candidate gram
   * total, `precision_pm`, plus the per-pair length columns and
   * `brevity_pm` = (1000·cand_len) div ref_len that the brevity penalty is
   * computed from. One row per (pair, order), orders with a gramless
   * candidate carrying NULL precision.
   *
   * The composite BLEU score (geometric mean × exp brevity penalty) is
   * deliberately NOT computed here: exp/log are not engine-exact, and the
   * auditable parts — the per-order precisions and the length ratio — are;
   * consumers compose the scalar with whatever smoothing they use.
   *
   * Scale posture: unlike four [[rougeN]] calls, ALL orders explode into
   * one tagged (id, n, gram) census per side — one shuffle per side
   * regardless of maxN, then the same equi clip join and per-(id, n)
   * rollups. Linear in token volume × maxN.
   */
  def bleuPrecisions(pairs: DataFrame, maxN: Int = 4): DataFrame = {
    require(maxN >= 1, "maxN must be >= 1")
    val emptyGrams = s"cast(array() as array<struct<n:int,g:string>>)"
    def gramsAll(c: Column): Column = {
      val w = split(c, " ")
      flatten(transform(sequence(lit(1), lit(maxN)), nn =>
        when(size(w) >= nn,
          transform(sequence(lit(0), size(w) - nn),
            i => struct(nn.cast("int").as("n"),
              array_join(slice(w, i + 1, nn), " ").as("g"))))
          .otherwise(expr(emptyGrams))))
    }
    val ref = pairs.select(col("id"), explode(gramsAll(col("reference"))).as("t"))
      .groupBy(col("id"), col("t.n").as("n"), col("t.g").as("g"))
      .agg(count(lit(1)).as("cr"))
    val cand = pairs.select(col("id"), explode(gramsAll(col("candidate"))).as("t"))
      .groupBy(col("id"), col("t.n").as("n"), col("t.g").as("g"))
      .agg(count(lit(1)).as("cc"))
    val clip = ref.join(cand, Seq("id", "n", "g"))
      .groupBy(col("id"), col("n"))
      .agg(sum(least(col("cr"), col("cc"))).as("overlap"))
    val cTot = cand.groupBy(col("id"), col("n"))
      .agg(sum(col("cc")).as("cand_grams"))
    pairs.select(col("id"),
        size(split(col("reference"), " ")).cast("long").as("ref_len"),
        size(split(col("candidate"), " ")).cast("long").as("cand_len"),
        explode(sequence(lit(1), lit(maxN))).as("n"))
      .join(cTot, Seq("id", "n"), "left")
      .join(clip, Seq("id", "n"), "left")
      .select(col("id"), col("n"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        col("cand_grams"), col("ref_len"), col("cand_len"))
      .select(col("id"), col("n"), col("overlap"), col("cand_grams"),
        col("ref_len"), col("cand_len"),
        when(col("cand_grams").isNotNull,
          expr("(1000 * overlap) div cand_grams")).as("precision_pm"),
        when(col("ref_len") > 0,
          expr("(1000 * cand_len) div ref_len")).as("brevity_pm"))
  }
}
