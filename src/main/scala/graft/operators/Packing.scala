package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Concat-and-chunk sequence packing — the document→training-sequence step a
 * pretraining pipeline runs after curation: token streams are concatenated in
 * ascending `doc_id` order and cut into fixed-size context windows
 * ("chunks"), so every training sequence is exactly `chunkTokens` long and
 * padding waste exists only in the final tail chunk (the GPT-2/T5 packing
 * convention; the complement of `CorpusOps.packNextFit` (q94), which never
 * splits a document and instead wastes each bin's tail — the two ends of the
 * fragmentation-vs-padding trade a loader picks between).
 *
 * The whole computation is one exact global prefix sum over per-document
 * token counts — and the scale story is HOW that prefix sum is built. A
 * naive `sum over (order by doc_id rows unbounded preceding)` is a
 * single-partition window over the corpus: correct at sf0.01, dead at 100 TB.
 * This operator uses the classic TWO-LEVEL prefix sum instead:
 *
 *   1. docs bucket by `doc_id div bucketSpan` — range-contiguous, so bucket
 *      order IS document order and no global sort is needed;
 *   2. per-bucket token totals aggregate map-side to a corpus/bucketSpan-
 *      bounded summary table; the running sum over THAT table is a window
 *      over bucket summaries only (N/bucketSpan rows — choose the span so
 *      this stays ~1e5 at the target corpus; recurse the same trick if a
 *      third level is ever needed);
 *   3. intra-bucket offsets are a window partitioned BY bucket — parallel
 *      across the cluster, each partition bounded by bucketSpan ids.
 *
 * Global offset = bucket offset (broadcast-joined) + intra-bucket offset.
 * Exactness is trivially preserved (integer addition reassociates), so the
 * DuckDB oracle can use the naive single window and match bit-for-bit.
 *
 * Token contract: whitespace tokens with empties dropped (the TextEval
 * contract — an empty or all-space document contributes 0 tokens and
 * occupies no span: NULL first/last chunk, 0 chunks).
 *
 * Output, one row per document, ordered by doc_id downstream:
 *   `doc_id, n_tok, start_off, first_chunk, last_chunk, n_chunks`.
 */
object Packing {

  /** Empty-dropping whitespace token count (the TextEval token contract). */
  private def nTokens(text: Column): Column =
    size(filter(split(text, " "), w => w =!= lit("")))

  /**
   * Per-document placement table for concat-and-chunk packing at
   * `chunkTokens` tokens per training sequence. `docs` must have
   * `doc_id` (unique, orderable) and `text`.
   *
   * @param bucketSpan width of the doc_id ranges forming the outer prefix-sum
   *                   level; the bucket-summary window (the only
   *                   single-partition step) sees max(doc_id)/bucketSpan rows.
   * @param baseOffset token offset the stream starts at — what makes packing
   *                   INCREMENTAL under daily-crawl arrival: a new day's docs
   *                   (ids above every prior id) pack with `baseOffset` = the
   *                   accumulated token total, and the appended placements
   *                   equal the full-corpus recompute without touching a
   *                   prior day's rows (the prefix sum needs only the running
   *                   total, a 1-row state).
   */
  def packingPlan(docs: DataFrame, chunkTokens: Int, bucketSpan: Long,
                  baseOffset: Long = 0L): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive (got $chunkTokens)")
    require(bucketSpan > 0, s"bucketSpan must be positive (got $bucketSpan)")
    require(baseOffset >= 0L, s"baseOffset must be non-negative (got $baseOffset)")

    val tok = docs.select(
      col("doc_id"),
      // NULL text occupies no span, not a NULL-poisoned prefix sum
      coalesce(nTokens(col("text")).cast("long"), lit(0L)).as("n_tok"),
      (col("doc_id") / bucketSpan).cast("long").as("bucket"))

    // level 2: bounded bucket-summary table; its running sum is the ONLY
    // unpartitioned window and it never touches corpus rows
    val bucketOff = tok.groupBy(col("bucket"))
      .agg(sum(col("n_tok")).as("btok"))
      .select(col("bucket"),
        coalesce(
          sum(col("btok")).over(
            Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("boff"))

    // level 1: intra-bucket running sum, partitioned by bucket — parallel
    val intra = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)

    val placed = tok
      .join(broadcast(bucketOff), "bucket")
      .select(col("doc_id"), col("n_tok"),
        (lit(baseOffset) + col("boff") +
          coalesce(sum(col("n_tok")).over(intra), lit(0L)))
          .as("start_off"))

    val c = lit(chunkTokens.toLong)
    placed.select(
      col("doc_id"), col("n_tok"), col("start_off"),
      when(col("n_tok") > 0, expr(s"start_off div $chunkTokens"))
        .as("first_chunk"),
      when(col("n_tok") > 0, expr(s"(start_off + n_tok - 1) div $chunkTokens"))
        .as("last_chunk"),
      when(col("n_tok") > 0,
        expr(s"(start_off + n_tok - 1) div $chunkTokens - start_off div $chunkTokens + 1"))
        .otherwise(lit(0L)).as("n_chunks"))
  }

  /**
   * One-row packing-efficiency report over a [[packingPlan]] placement
   * table — the numbers a training-infra gate reads before a run:
   *
   *   - `total_tokens`, `n_chunks`, and `tail_pad` (the ONLY padding
   *     concat-and-chunk produces — its whole point);
   *   - `docs_crossing` / `crossing_pm`: documents split across a chunk
   *     boundary (attention-mask fragmentation — the packing trade-off);
   *   - `mean_docs_per_chunk_fp` (×1e6): Σ per-doc chunk incidences over
   *     n_chunks — how many documents a training sequence mixes on average.
   *
   * Chunk counts derive from the placement OFFSETS, not Σ n_tok: n_chunks
   * is the number of chunk indices the slice's token span touches
   * (⌈max_end/C⌉ − ⌊min_off/C⌋ over the nonzero-token rows) and tail_pad
   * the padding after the span's last token — so the report is correct for
   * an INCREMENTAL placement slice built with `baseOffset > 0` (a single
   * day's append), where a Σ n_tok-based count would pretend the stream
   * starts at chunk 0 (ADVICE r13). Over a full-stream placement from
   * offset 0 the two formulations agree exactly (min_off = 0,
   * max_end = Σ n_tok), so the DuckDB oracle twin is unchanged in value.
   *
   * All integer floor division; a corpus with zero tokens reports 0
   * chunks/pad and NULL fragmentation ratios rather than dividing by zero.
   */
  def packingReport(placement: DataFrame, chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive (got $chunkTokens)")
    val c = chunkTokens.toLong
    placement.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("n_tok")), lit(0L)).as("total_tokens"),
      sum(when(col("n_chunks") > 1, 1L).otherwise(0L)).as("docs_crossing"),
      sum(col("n_chunks")).as("chunk_incidences"),
      min(when(col("n_tok") > 0, col("start_off"))).as("min_off"),
      max(when(col("n_tok") > 0, col("start_off") + col("n_tok"))).as("max_end")
    ).select(
      col("n_docs"), col("total_tokens"), col("docs_crossing"),
      expr(
        s"""CASE WHEN total_tokens > 0
            THEN (max_end + ${c - 1}) div $c - min_off div $c
            ELSE CAST(0 AS BIGINT) END""").as("n_chunks"),
      expr(
        s"""CASE WHEN total_tokens > 0
            THEN ((max_end + ${c - 1}) div $c) * $c - max_end
            ELSE CAST(0 AS BIGINT) END""").as("tail_pad"),
      expr("CASE WHEN n_docs > 0 THEN (1000 * docs_crossing) div n_docs END")
        .as("crossing_pm"),
      expr(
        s"""CASE WHEN total_tokens > 0
            THEN (1000000 * chunk_incidences) div
                 ((max_end + ${c - 1}) div $c - min_off div $c)
            END""").as("mean_docs_per_chunk_fp"))
  }
}
