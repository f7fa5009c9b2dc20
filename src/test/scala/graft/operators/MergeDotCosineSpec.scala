package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import graft.queries.Tables

/**
 * Value-identity pins for the r18 state-free tf-idf cosine path:
 * [[Similarity.mergeDotCosinePairs]] (hashed-key merge-dot over broadcast
 * sorted arrays — the third-decade plan behind the Σ df² dispatch) must
 * return EXACTLY what the counting core returns, including under a binding
 * df cap (cold candidates + star fallback) and at minCosPpm = 0 (every
 * co-occurring pair emitted). The dispatch census guarantees a
 * collision-free hashed vocabulary before this path runs; these corpora
 * satisfy it naturally (asserted, so a vacuous pin cannot hide).
 */
class MergeDotCosineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def toks = Tables.documents(spark, sf)
    .where(col("doc_id") % 4 === 0)
    .select(col("doc_id").as("id"), explode(T.tokens(col("text"))).as("term"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def both(maxDfDenom: Int, minCosPpm: Long, maxDf: Long) = {
    val post = Similarity.buildPostingsForTest(toks, maxDfDenom).localCheckpoint()
    val cen = post.groupBy(col("term")).agg(count(lit(1)).as("d"))
      .agg(count(lit(1)).as("t"),
        count_distinct(xxhash64(col("term"))).as("h")).head()
    assert(cen.getLong(0) == cen.getLong(1),
      "fixture vocabulary must be hash-collision-free or the pin is vacuous")
    val counting = rows(Similarity.cappedCosineForTest(post, minCosPpm, maxDf))
    val merged = rows(Similarity.mergeDotCosinePairs(post, minCosPpm, maxDf))
    (counting, merged)
  }

  test("merge-dot equals the counting core on the natural corpus") {
    for (minCos <- Seq(0L, 500000L)) {
      val (counting, merged) = both(maxDfDenom = 2, minCos, Long.MaxValue)
      assert(counting.nonEmpty, s"vacuous at minCos=$minCos")
      assert(merged == counting, s"minCosPpm $minCos")
    }
  }

  test("merge-dot equals the counting core under a binding df cap") {
    val (counting, merged) = both(maxDfDenom = 1, minCosPpm = 0L, maxDf = 20L)
    assert(counting.nonEmpty)
    assert(merged == counting)
  }

  test("exactly-once emission (hotFree) equals full-multiplicity emission") {
    // the r19 min_common_sorted filter: on a cap-free postings frame every
    // pair must survive exactly once through its minimal common hash — the
    // OUTPUT must be identical to both the unfiltered merge-dot and the
    // counting core, at a permissive threshold (multiplicity > 1 pairs) and
    // at q126's production threshold
    for (minCos <- Seq(0L, 500000L)) {
      val post = Similarity.buildPostingsForTest(toks, 2).localCheckpoint()
      val counting = rows(Similarity.cappedCosineForTest(post, minCos, Long.MaxValue))
      val oncePath = rows(Similarity.mergeDotCosinePairs(post, minCos,
        Long.MaxValue, hotFree = true))
      assert(counting.nonEmpty, s"vacuous at minCos=$minCos")
      assert(oncePath == counting, s"minCosPpm $minCos")
    }
  }
}
