package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Corpus deduplication operators for the training-data pipeline.
 *
 * Scale posture (the 100 TB path): every method here is expressed as
 * hash-partitioned aggregation / bucket joins — NO all-pairs cross join ever
 * touches the full corpus. Exact dedup is a single `groupBy(md5)`; MinHash-LSH
 * reduces near-dup detection to an equi-join on (band, band-signature) buckets,
 * so the only quadratic work is within a bucket (expected O(1) per bucket);
 * SimHash reduces it to a 62-bit signature comparison. The brute-force
 * all-pairs verifier exists only for *candidate* pairs and for small
 * oracle-checked subsets.
 */
object Dedup {

  /**
   * Exact deduplication by content hash: one row per distinct text, keeping the
   * smallest id — the canonical `groupBy(hash)` formulation: a single shuffle
   * on the 128-bit digest, map-side partial aggregation, no data skew (md5 is
   * uniform).
   */
  def exact(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("content_md5"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("group_size"))

  /**
   * MinHash-LSH candidate pairs: signature → `bands` bands of `k/bands` rows →
   * equi-join on (band index, band slice). Input must have columns `id` and
   * `shingles` (distinct feature array). Output: distinct (a, b) with a < b.
   *
   * The band bucket join is the scale path: corpus-size shuffle on the band
   * key, pair enumeration only inside buckets.
   */
  def minhashCandidates(docs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sigs = docs.select(col("id"), TextFunctions.minhashSignature(col("shingles"), k).as("sig"))
    val banded = sigs.select(
      col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        j => slice(col("sig"), j * r + 1, lit(r)))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    banded
      .groupBy(col("band"), col("band_key"))
      .agg(array_sort(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** All ordered pairs (a < b) from a sorted id array. */
  private def pairsOf(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, size(ids)), y => struct(x.as("a"), y.as("b")))))

  /**
   * Verify candidate pairs with exact shingle-set Jaccard: join each side back
   * to its feature array (two hash joins on id — broadcastable when the
   * candidate set is small, which LSH guarantees for sane thresholds) and keep
   * pairs at or above `threshold`.
   */
  def verifyJaccard(candidates: DataFrame, docs: DataFrame, threshold: Double): DataFrame = {
    val da = docs.select(col("id").as("a"), col("shingles").as("sh_a"))
    val db = docs.select(col("id").as("b"), col("shingles").as("sh_b"))
    candidates
      .join(da, "a")
      .join(db, "b")
      .select(col("a"), col("b"),
        round(TextFunctions.jaccard(col("sh_a"), col("sh_b")), 4).as("jac"))
      .where(col("jac") >= threshold)
  }

  /**
   * Brute-force exact Jaccard over all pairs of a (small, pre-filtered) corpus —
   * the oracle-shaped baseline the LSH path approximates. Only ever applied to
   * bounded subsets; the quadratic join is a deliberate non-goal at corpus scale.
   */
  def allPairsJaccard(docs: DataFrame, threshold: Double): DataFrame = {
    val da = docs.select(col("id").as("a"), col("shingles").as("sh_a"))
    val db = docs.select(col("id").as("b"), col("shingles").as("sh_b"))
    da.join(db, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(TextFunctions.jaccard(col("sh_a"), col("sh_b")), 4).as("jac"))
      .where(col("jac") >= threshold)
  }

  /**
   * SimHash near-dup pairs over a (pre-filtered) corpus: 62-bit signatures, then
   * pairs within `maxHamming` bit flips. The signature computation is the scale
   * path (one narrow pass); pair enumeration here is all-pairs for the
   * oracle-checked subset. (At corpus scale one would band the signature into
   * `maxHamming + 1` chunks — pigeonhole — and equi-join on chunks, same
   * pattern as [[minhashCandidates]].)
   */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = docs.select(col("id"), TextFunctions.simhash62("shingles").as("sig"))
    val a = sigs.select(col("id").as("a"), col("sig").as("sig_a"))
    val b = sigs.select(col("id").as("b"), col("sig").as("sig_b"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
