package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/**
 * IVF-Flat approximate nearest-neighbor index over an embedding column — the
 * inverted-file counterpart of [[Similarity.annLsh]]'s hash-bucket index
 * (SURVEY.md names both: "an IVF or LSH-bucketed variant as the scale path").
 *
 * Structure:
 *  1. a small set of COARSE CENTROIDS is the model (like a fitted k-means):
 *     nlist entries of dim doubles, held driver-side and inlined into plans as
 *     literals — at nlist=4096, dim=1024 that is 32 MB, broadcast territory,
 *     never a shuffle;
 *  2. every corpus vector is assigned to its nearest centroid (`cell`) by a
 *     single narrow map over the scan — an nlist-term argmax expression, no
 *     join, no shuffle. At 100 TB the assigned corpus is written
 *     `partitionBy("cell")` once, making every later search a
 *     partition-pruned read;
 *  3. a query probes its `nprobe` nearest cells only: candidates come from an
 *     equi-join on `cell` against the broadcast probe list, then exact cosine
 *     re-ranks through the bounded-heap `topk_by` aggregate — the exchange
 *     carries ≈ tasks × queries × k rows.
 *
 * Recall/cost trade-off is the standard IVF one: the fraction of cells probed
 * (`nprobe / nlist`) bounds the fraction of the corpus scored. LSH
 * ([[Similarity.annLsh]]) needs no training and gives per-pair probabilistic
 * guarantees; IVF adapts to the data's cluster structure and gives direct
 * control of the scan fraction — both are kept, as in production ANN systems.
 *
 * Determinism: centroid selection is a pure predicate on ids (no RNG), ties in
 * the argmax break toward the lowest centroid id, so the whole index is
 * reproducible in SQL — q39's DuckDB oracle rebuilds the SAME index and
 * produces identical results (the q36 pattern).
 */
object Ivf {

  /** The driver-side coarse-quantizer model: (centroid id, vector). */
  final case class Centroid(cid: Long, vec: Array[Double])

  /**
   * Train-free centroid selection: the vectors whose id satisfies `pred`
   * (e.g. `id % 64 === 0` for an expected-nlist sampling). Collects only the
   * selected rows — the model, not the corpus. For data-adaptive centroids,
   * refine with [[lloydStep]].
   */
  def selectCentroids(corpus: DataFrame, pred: Column): Array[Centroid] =
    corpus.where(pred).select(col("id"), col("vec"))
      .collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_.cid)

  /**
   * One Lloyd (k-means) refinement step, fully distributed: assign every
   * vector to its nearest current centroid (narrow map), then average each
   * cell — one groupBy(cell) shuffle of (cell, vec) pairs, partial aggregation
   * map-side. Centroid ids are preserved; empty cells keep their old centroid.
   */
  def lloydStep(corpus: DataFrame, cents: Seq[Centroid]): Array[Centroid] = {
    val dim = cents.head.vec.length
    val assigned = assign(corpus, cents)
    val dimAvgs = (0 until dim).map(i => avg(element_at(col("vec"), i + 1)).as(s"c$i"))
    val means = assigned
      .groupBy(col("cell"))
      .agg(dimAvgs.head, dimAvgs.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (0 until dim).map(i => r.getDouble(i + 1)).toArray)
      .toMap
    cents.map(c => Centroid(c.cid, means.getOrElse(c.cid, c.vec))).toArray
  }

  /** Scored-cells array expression: `struct(cos, -cid)` per centroid, so
   * lexicographic struct max/sort gives (cos DESC, cid ASC) order. */
  private def scoredCells(vec: Column, cents: Seq[Centroid]): Column = {
    require(cents.nonEmpty,
      "IVF needs at least one centroid — the selection predicate matched no vectors")
    array(cents.map(c =>
      struct(
        cosineNative(vec, typedlit(c.vec.toSeq)).as("s"),
        lit(-c.cid).as("negid"))): _*)
  }

  /** Nearest-centroid id for a vector column — a pure per-row expression
   * (nlist fused cosine kernels + one array_max), no join, no shuffle. */
  def cellOf(vec: Column, cents: Seq[Centroid]): Column =
    -array_max(scoredCells(vec, cents)).getField("negid")

  /** Cosine similarity to the assigned (nearest) centroid — the score field
   * of the same argmax [[cellOf]] takes the id from; one narrow expression,
   * shared by SemDeDup-style survivor selection (q100). */
  def centroidCos(vec: Column, cents: Seq[Centroid]): Column =
    array_max(scoredCells(vec, cents)).getField("s")

  /** The `nprobe` nearest centroid ids, best first. */
  def probeCells(vec: Column, cents: Seq[Centroid], nprobe: Int): Column =
    transform(
      slice(reverse(array_sort(scoredCells(vec, cents))), 1, nprobe),
      e => -e.getField("negid"))

  /**
   * Index build: corpus (`id`, `vec`) → (`id`, `vec`, `cell`). At scale,
   * persist with `.write.partitionBy("cell")` so searches prune to the probed
   * cells at the parquet-listing level.
   */
  def assign(corpus: DataFrame, cents: Seq[Centroid]): DataFrame =
    corpus.withColumn("cell", cellOf(col("vec"), cents))

  /**
   * IVF search: probe each query's `nprobe` nearest cells, score candidates
   * with exact cosine, keep the per-query top-k (self-match excluded).
   * `queries` is expected small and is broadcast; the corpus side is one scan
   * of the probed cells with no distinct needed (each corpus vector lives in
   * exactly one cell, so a (query, neighbor) pair arises at most once).
   */
  def search(corpus: DataFrame, queries: DataFrame, cents: Seq[Centroid],
             nprobe: Int, k: Int): DataFrame = {
    val indexed = assign(corpus.select(col("id").as("neighbor_id"), col("vec")), cents)
    val probes = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
      explode(probeCells(col("vec"), cents, nprobe)).as("cell"))
    val scored = indexed.join(broadcast(probes), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineNative(col("vec"), col("qvec")).as("cos"))
    Similarity.topK(scored, k)
  }
}
