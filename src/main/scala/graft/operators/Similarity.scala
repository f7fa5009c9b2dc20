package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/**
 * Approximate / exact nearest-neighbor search over an embedding column.
 *
 * Input convention: a DataFrame with `id` (long) and `vec` (array<double>).
 *
 * Scale posture: the brute-force path broadcasts the (small) query set against
 * the (huge) corpus — a broadcast nested-loop with per-partition top-k via
 * window rank, no corpus shuffle. The LSH path buckets the corpus by a
 * deterministic random-hyperplane signature so the candidate join is an
 * equi-join on the signature; at 100 TB the bucketed corpus can also be
 * written partitioned by signature for index-style reads.
 */
object Similarity {

  /**
   * Exact top-k cosine neighbors of each query vector (self-match excluded).
   * `queries` is expected to be small — it is broadcast, so the corpus is
   * scanned once with no shuffle; the window's top-k runs per query id.
   */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    corpus.select(col("id").as("neighbor_id"), col("vec"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineNative(col("vec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(rankW))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }

  /**
   * LSH-bucketed approximate top-k: corpus and queries are signed with the same
   * deterministic hyperplane signature; candidates come from an equi-join on
   * the signature (plus optional multi-probe over 1-bit flips), then exact
   * cosine re-ranks within the candidate set.
   */
  def annLsh(corpus: DataFrame, queries: DataFrame, dim: Int, nBits: Int,
             k: Int, probeBitFlips: Boolean = true): DataFrame = {
    val signed = corpus.select(col("id").as("neighbor_id"), col("vec"),
      hyperplaneSignature(col("vec"), dim, nBits).as("sig"))
    val qSigned = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
      hyperplaneSignature(col("vec"), dim, nBits).as("qsig"))
    // multi-probe: the query probes its own bucket plus every 1-bit-flip bucket,
    // recovering most neighbors that straddle one hyperplane
    val probes =
      if (!probeBitFlips) qSigned.withColumn("sig", col("qsig"))
      else qSigned.select(col("query_id"), col("qvec"), col("qsig"),
        // SQL expr: shiftleft with a column shift amount is only reachable
        // through the SQL parser (the Scala API takes a static Int)
        expr(s"explode(concat(array(qsig), transform(sequence(0, ${nBits - 1}), b -> qsig ^ shiftleft(1L, b))))").as("sig"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    signed.join(broadcast(probes.drop("qsig")), Seq("sig"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineNative(col("vec"), col("qvec")).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(rankW))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }
}
