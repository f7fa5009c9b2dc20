package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
 * Language Models via Importance Resampling") as a PERSISTED-SCORER pair:
 * [[ratioTable]] learns the bounded per-bucket affinity artifact once, and
 * [[score]] applies it to any feature table — so a production pipeline
 * trains on one (target, raw) snapshot, persists the ≤`buckets` rows, and
 * every later selection job re-scores new pools against the same artifact
 * without touching the training corpora again (the Bpe.mergeArtifact /
 * Ivf-centroid precedent, as a table instead of driver memory).
 *
 * Arithmetic is the q71/q85 fixed-point idiom: the per-feature affinity is
 * the +1-smoothed count ratio ×1e6 under integer `div` — the DSIR
 * probability ratio times a constant factor that scales every document
 * equally, so rankings are preserved and every emitted bit is
 * engine-independent (overflow domain proven in FixedPointSpec).
 *
 * Scale shapes (100 TB): features hash into a BOUNDED space regardless of
 * corpus size, the artifact is one conditional aggregation with ≤`buckets`
 * output rows (broadcast territory), and scoring is one partial-aggregated
 * (doc, bucket) shuffle + a broadcast join + one per-doc aggregation.
 */
object Dsir {

  /**
   * Hashed word-bigram features from a table carrying `id` and `text`:
   * one output row per bigram OCCURRENCE (not distinct) with `text` replaced
   * by the bucket `b` in [0, buckets); every OTHER input column (labels,
   * language, source) rides along narrowly — no join needed to recover it.
   * `salt` namespaces the hash so two scorers trained on different feature
   * definitions can never collide.
   */
  def hashedBigrams(docs: DataFrame, buckets: Int, salt: String): DataFrame = {
    // the working columns would silently duplicate a carried column of the
    // same name and break every downstream groupBy — fail loudly instead
    Seq("b", "w", "g").foreach(c => require(!docs.columns.contains(c),
      s"hashedBigrams reserves column name '$c' — rename it on the input"))
    val carried = docs.columns.filterNot(_ == "text").map(col).toSeq
    docs.withColumn("w", TextFunctions.tokens(col("text")))
      .where(size(col("w")) >= 2)
      .select(carried :+ explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))")).as("g"): _*)
      .select(carried :+
        (TextFunctions.hash60(concat(lit(salt), col("g"))) % buckets).as("b"): _*)
  }

  /**
   * Learn the affinity artifact from a LABELED feature table (id, b,
   * is_target): per-bucket r_fp = (1e6·(c_tgt+1)) div (c_raw+1), buckets the
   * raw pool never touches dropped (they can't score any raw document).
   * ONE conditional aggregation — both corpus profiles in a single pass —
   * with ≤`buckets` output rows: persist this, it IS the scorer.
   */
  def ratioTable(labeledFeatures: DataFrame): DataFrame =
    labeledFeatures.groupBy(col("b"))
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("c_tgt"),
        sum(when(!col("is_target"), 1L).otherwise(0L)).as("c_raw"))
      .where(col("c_raw") > 0)
      .selectExpr("b", "(1000000 * (c_tgt + 1)) div (c_raw + 1) as r_fp")

  /**
   * Score a feature table (id, b) against a learned artifact: weight_fp =
   * Σ_b c(id,b)·r_fp(b). Returns (id, n_bigrams, weight_fp). The artifact is
   * broadcast (bounded by construction); re-scoring a new pool re-runs ONLY
   * this method.
   */
  def score(features: DataFrame, ratios: DataFrame): DataFrame =
    features.groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
      .join(broadcast(ratios), "b")
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * col("r_fp")).as("weight_fp"))
}
