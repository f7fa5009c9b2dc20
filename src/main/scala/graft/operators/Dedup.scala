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
    // native codegen'd kernel when GraftExtensions is installed; value-identical
    // HOF fallback otherwise (two-step projection: the Kirsch-Mitzenmacher base
    // hashes — 2 md5/shingle — materialize once, then all k functions derive
    // arithmetically; CollapseProject keeps multiply-referenced aliases)
    val sigs =
      if (docs.sparkSession.catalog.functionExists("minhash_signature"))
        docs.select(col("id"), expr(s"minhash_signature(shingles, $k)").as("sig"))
      else {
        val (b1, b2) = TextFunctions.minhashBases(col("shingles"))
        docs.select(col("id"), b1.as("b1"), b2.as("b2"))
          .select(col("id"),
            TextFunctions.minhashSignatureFromBases(col("b1"), col("b2"), k).as("sig"))
      }
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
   * Exact all-pairs Jaccard via the sparse co-occurrence join — the scalable
   * formulation of the quadratic baseline: explode shingles into postings,
   * equi-join postings on the shingle (cost = sum over shingles of df^2, not
   * corpus^2), count co-occurrences per pair, then `jac = c / (|A|+|B|-c)`.
   * Values are identical to the array_intersect/array_union formulation
   * (shingle arrays are distinct); zero-overlap pairs never materialize —
   * they cannot pass any positive threshold.
   */
  def allPairsJaccard(docs: DataFrame, threshold: Double): DataFrame = {
    val posts = docs.select(col("id"), size(col("shingles")).as("sz"),
      explode(col("shingles")).as("sh"))
    val p1 = posts.select(col("id").as("a"), col("sz").as("sa"), col("sh"))
    val p2 = posts.select(col("id").as("b"), col("sz").as("sb"), col("sh"))
    p1.join(p2, "sh")
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("sa"), col("sb"))
      .agg(count(lit(1)).as("c"))
      .select(col("a"), col("b"),
        round(col("c").cast("double") /
          (col("sa") + col("sb") - col("c")).cast("double"), 4).as("jac"))
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
    // feature hashes materialize once; the 62-bit fold then reuses the array
    val sigs = docs
      .select(col("id"),
        transform(col("shingles"), s => TextFunctions.hash60(s)).as("hs"))
      .select(col("id"), TextFunctions.simhash62("hs").as("sig"))
    val a = sigs.select(col("id").as("a"), col("sig").as("sig_a"))
    val b = sigs.select(col("id").as("b"), col("sig").as("sig_b"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
