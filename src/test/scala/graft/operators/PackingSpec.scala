package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Concat-and-chunk sequence packing: hand-computed placements (offsets,
 * chunk spans, boundary crossings), the empty/NULL-doc no-span contract,
 * two-level-vs-naive prefix-sum equivalence at adversarial bucket spans,
 * and the one-row efficiency report's integer algebra. */
class PackingSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** text with exactly n single-letter tokens */
  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("packingPlan: hand-computed placement across chunk boundaries") {
    // C=10: doc 1 (7 tok) fills [0,7); doc 2 (5 tok) spans [7,12) — crosses
    // into chunk 1; doc 3 (13 tok) spans [12,25) — chunks 1..2; doc 4
    // (1 tok) at 25 sits inside chunk 2.
    val got = Packing.packingPlan(
        docs((1L, words(7)), (2L, words(5)), (3L, words(13)), (4L, words(1))),
        chunkTokens = 10, bucketSpan = 100L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 7L, 0L, 0L, 0L, 1L),
      (2L, 5L, 7L, 0L, 1L, 2L),
      (3L, 13L, 12L, 1L, 2L, 2L),
      (4L, 1L, 25L, 2L, 2L, 1L)), s"got ${got.toSeq}")
  }

  test("packingPlan: empty and NULL docs occupy no span") {
    import spark.implicits._
    val d = Seq((1L, Option(words(3))), (2L, Option("")), (3L, None),
      (4L, Option("  ")), (5L, Option(words(2))))
      .toDF("doc_id", "text")
    val got = Packing.packingPlan(d, chunkTokens = 4, bucketSpan = 10L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), r.getLong(5)))
    // empties sit AT offset 3 but consume nothing: doc 5 starts at 3 too
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, Some(0L), Some(0L), 1L),
      (2L, 0L, 3L, None, None, 0L),
      (3L, 0L, 3L, None, None, 0L),
      (4L, 0L, 3L, None, None, 0L),
      (5L, 2L, 3L, Some(0L), Some(1L), 2L)), s"got ${got.toSeq}")
  }

  test("packingPlan: two-level prefix sum is bucket-span invariant") {
    // offsets must not depend on the bucketing — including spans that put
    // every doc in its own bucket, all in one, and a ragged middle; ids are
    // non-contiguous so empty buckets are exercised too
    val d = docs((2L, words(5)), (7L, words(11)), (8L, words(2)),
      (23L, words(9)), (41L, words(1)))
    val expect = Packing.packingPlan(d, chunkTokens = 8, bucketSpan = 1000L)
      .orderBy("doc_id").collect().map(_.toSeq)
    for (span <- Seq(1L, 3L, 10L)) {
      val got = Packing.packingPlan(d, chunkTokens = 8, bucketSpan = span)
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(got.toSeq == expect.toSeq, s"span $span diverged")
    }
  }

  test("packingReport: hand-computed efficiency numbers") {
    // C=10, totals: 7+5+13+1 = 26 tokens → 3 chunks, tail_pad 4;
    // docs 2 and 3 cross → crossing_pm = 2000 div 4 = 500;
    // incidences 1+2+2+1 = 6 → mean_docs_per_chunk_fp = 6e6 div 3 = 2e6
    val rep = Packing.packingReport(
        Packing.packingPlan(
          docs((1L, words(7)), (2L, words(5)), (3L, words(13)), (4L, words(1))),
          chunkTokens = 10, bucketSpan = 100L),
        chunkTokens = 10)
      .collect()(0)
    assert(rep.getLong(rep.fieldIndex("n_docs")) == 4L)
    assert(rep.getLong(rep.fieldIndex("total_tokens")) == 26L)
    assert(rep.getLong(rep.fieldIndex("docs_crossing")) == 2L)
    assert(rep.getLong(rep.fieldIndex("n_chunks")) == 3L)
    assert(rep.getLong(rep.fieldIndex("tail_pad")) == 4L)
    assert(rep.getLong(rep.fieldIndex("crossing_pm")) == 500L)
    assert(rep.getLong(rep.fieldIndex("mean_docs_per_chunk_fp")) == 2000000L)
  }

  test("packingReport: zero-token corpus reports NULL ratios, zero counts") {
    val rep = Packing.packingReport(
        Packing.packingPlan(docs((1L, ""), (2L, " ")), 16, 10L), 16)
      .collect()(0)
    assert(rep.getLong(rep.fieldIndex("total_tokens")) == 0L)
    assert(rep.getLong(rep.fieldIndex("n_chunks")) == 0L)
    assert(rep.getLong(rep.fieldIndex("tail_pad")) == 0L)
    assert(rep.getLong(rep.fieldIndex("crossing_pm")) == 0L)
    assert(rep.isNullAt(rep.fieldIndex("mean_docs_per_chunk_fp")))
  }

  test("packingPlan: totals reconcile — max(start+n_tok) == sum(n_tok)") {
    val d = docs((1 to 40).map(i => (i.toLong * 3, words(i % 7))): _*)
    val p = Packing.packingPlan(d, chunkTokens = 5, bucketSpan = 13L)
    val row = p.agg(max(col("start_off") + col("n_tok")).as("hi"),
      sum(col("n_tok")).as("tot")).collect()(0)
    assert(row.getLong(0) == row.getLong(1))
  }

  test("packingReport: correct over an incremental baseOffset slice (ADVICE r13)") {
    // day-2 slice: starts at accumulated offset 26 with C=10 — tokens span
    // [26, 26+17=43): chunks 2..4 → n_chunks 3 (a Σ n_tok-based count would
    // claim ⌈17/10⌉ = 2 and tail_pad 3); tail_pad = 50−43 = 7
    val slice = Packing.packingPlan(
      docs((100L, words(9)), (101L, words(8))),
      chunkTokens = 10, bucketSpan = 100L, baseOffset = 26L)
    val rep = Packing.packingReport(slice, chunkTokens = 10).collect()(0)
    assert(rep.getLong(rep.fieldIndex("total_tokens")) == 17L)
    assert(rep.getLong(rep.fieldIndex("n_chunks")) == 3L,
      "the slice touches chunks 2,3,4 — counts derive from offsets, not Σ n_tok")
    assert(rep.getLong(rep.fieldIndex("tail_pad")) == 7L)
    // doc 100 spans [26,35) → chunks 2-3 (crosses); doc 101 [35,43) →
    // chunks 3-4 (crosses) → crossing_pm 1000, incidences 4 →
    // mean = 4e6 div 3
    assert(rep.getLong(rep.fieldIndex("crossing_pm")) == 1000L)
    assert(rep.getLong(rep.fieldIndex("mean_docs_per_chunk_fp")) == 4000000L / 3L)
  }

  test("packingReport: full-stream offset-derived counts equal the Σ n_tok formulation") {
    // the oracle-compat guarantee: from offset 0 the two formulations agree
    val d = docs((1 to 25).map(i => (i.toLong, words((i * 3) % 11))): _*)
    val plan = Packing.packingPlan(d, chunkTokens = 7, bucketSpan = 6L)
    val rep = Packing.packingReport(plan, chunkTokens = 7).collect()(0)
    val tot = rep.getLong(rep.fieldIndex("total_tokens"))
    assert(rep.getLong(rep.fieldIndex("n_chunks")) == (tot + 6) / 7)
    assert(rep.getLong(rep.fieldIndex("tail_pad")) == ((tot + 6) / 7) * 7 - tot)
  }
}
