package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Retrieval-evaluation operators — the metrics layer an embedding/ANN
 * pipeline runs before an index or encoder change ships: given a retrieval
 * run (per-query ranked candidates) and ground-truth labels, compute the
 * classic quality metrics (hit rank / MRR, DCG/nDCG, recall@k) per query.
 *
 * Relevance protocol: SAME-LABEL = relevant — the standard metric-learning
 * evaluation (a neighbor is a hit iff it carries the query's class), which
 * makes the ground truth a corpus census rather than a hand-built qrel
 * table.
 *
 * Engine-exactness: the only transcendental in nDCG is log2(rank+1); it is
 * evaluated ONCE on the driver when the plan is built and embedded as ×1e6
 * integer literals (`dcgWeightFp`), so every metric is 64-bit integer
 * arithmetic end to end (the q71/BM25 idiom) — the DuckDB oracle
 * interpolates the SAME driver-computed constants, never calling its own
 * libm. Fixed-point domain: dcg_fp ≤ k·1e6, idcg_fp ≤ k·1e6, all products
 * bounded by 1e3·k·1e6 — exact int64 to k ≈ 9e9.
 *
 * Scale posture: the run is Q×k rows (the evaluation query set is bounded
 * by construction), so it is BROADCAST against the corpus-sized label
 * table — the corpus is scanned, never shuffled; the per-label census and
 * the per-query aggregate are driver-sized. Zero corpus exchanges.
 */
object Retrieval {

  /** floor(1e6 / log2(rank+1)) — the ×1e6 fixed-point DCG gain of a
   * relevant hit at `rank` (1-based). Driver-evaluated, plan-embedded. */
  def dcgWeightFp(rank: Int): Long =
    math.floor(1e6 / (math.log(rank + 1.0) / math.log(2.0))).toLong

  /** Cumulative weights: idcg_fp for m relevant hits packed at ranks 1..m. */
  def idcgWeightsFp(k: Int): Seq[Long] =
    (1 to k).map(dcgWeightFp).scanLeft(0L)(_ + _).tail

  /**
   * Per-query retrieval metrics for a top-k run under same-label relevance.
   *
   * `run` carries (query_id, rank, neighbor_id) with rank 1-based (the
   * [[Similarity.knnBruteForce]] shape); `labels` carries (id, label) for
   * the WHOLE corpus (queries included — each query's own label is read
   * from it, and its ground-truth relevant count excludes self to match a
   * self-excluded run). One output row per query:
   *
   *   - `n_rel`       — relevant docs in the corpus (class size − 1)
   *   - `n_rel_topk`  — relevant among the returned top k
   *   - `first_rel_rank` — rank of the first hit (NULL = miss)
   *   - `mrr_ppm`     — 1e6 div first_rel_rank (NULL = miss)
   *   - `dcg_fp`      — Σ_hits dcgWeightFp(rank), ×1e6 fixed point
   *   - `idcg_fp`     — ideal DCG: min(n_rel, k) hits at ranks 1..m
   *                     (NULL when the class is a singleton)
   *   - `ndcg_pm`     — (1000·dcg) div idcg, NULL when idcg undefined
   *   - `recall_pm`   — (1000·n_rel_topk) div n_rel, NULL when n_rel = 0
   *
   * Queries whose run returned no rows do not emit (the run IS the input);
   * queries with an empty class emit with NULL mrr/ndcg/recall.
   */
  def labelRetrievalMetrics(run: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val wArr = array((1 to k).map(r => lit(dcgWeightFp(r))): _*)
    val cumArr = array(idcgWeightsFp(k).map(lit): _*)

    // corpus-side probes: broadcast the Q×k run into the label scan (and the
    // Q-row query-id set for the queries' own labels) — corpus never shuffles
    val nLab = labels.select(col("id").as("neighbor_id"), col("label").as("n_label"))
    val hits = nLab.join(broadcast(run), Seq("neighbor_id"))
    val qIds = run.select(col("query_id")).distinct()
    val qLab = labels.join(broadcast(qIds), col("id") === col("query_id"))
      .select(col("query_id"), col("label").as("q_label"))

    // ground truth census: class size per label — driver-sized
    val census = labels.groupBy(col("label")).agg(count(lit(1)).as("class_n"))
    val qMeta = qLab.join(broadcast(census), col("q_label") === col("label"))
      .select(col("query_id"), col("q_label"), (col("class_n") - 1L).as("n_rel"))

    val rel = hits.join(broadcast(qMeta), Seq("query_id"))
      .select(col("query_id"), col("n_rel"), col("rank"),
        (col("n_label") === col("q_label")).as("is_rel"))
    rel.groupBy(col("query_id"), col("n_rel"))
      .agg(
        sum(when(col("is_rel"), 1L).otherwise(0L)).as("n_rel_topk"),
        min(when(col("is_rel"), col("rank"))).as("first_rel_rank"),
        coalesce(sum(when(col("is_rel"),
          element_at(wArr, col("rank").cast("int")))), lit(0L)).as("dcg_fp"))
      .select(col("query_id"), col("n_rel"), col("n_rel_topk"),
        col("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          expr("1000000 div first_rel_rank")).as("mrr_ppm"),
        col("dcg_fp"),
        when(col("n_rel") > 0,
          element_at(cumArr, least(col("n_rel"), lit(k.toLong)).cast("int")))
          .as("idcg_fp"))
      .select(col("query_id"), col("n_rel"), col("n_rel_topk"),
        col("first_rel_rank"), col("mrr_ppm"), col("dcg_fp"), col("idcg_fp"),
        when(col("idcg_fp") > 0,
          expr("(1000 * dcg_fp) div idcg_fp")).as("ndcg_pm"),
        when(col("n_rel") > 0,
          expr("(1000 * n_rel_topk) div n_rel")).as("recall_pm"))
  }
}
