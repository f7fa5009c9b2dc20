package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column builders for the large-scale training-data pipeline:
 * tokenization, quality scoring, language-ID, shingling, and the md5-derived
 * 60-bit hash that underpins MinHash / SimHash / fingerprinting.
 *
 * Everything here is pure `org.apache.spark.sql.functions` composition — codegen'd
 * built-in expressions, no UDFs — so plans stay inside WholeStageCodegen and the
 * same computation is expressible verbatim in the DuckDB oracle SQL (md5 + integer
 * casts + list lambdas exist in both engines and produce identical values).
 */
object TextFunctions {

  /** Whitespace tokens (single-space split; the corpus is single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish lexer tokens: letter runs, digit runs, single non-alnum glyphs. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /**
   * Deterministic 60-bit hash of a string, seeded — the shared hash for MinHash
   * signatures and fingerprints: first 15 hex chars of md5, read as an integer.
   * DuckDB oracle twin: `cast(concat('0x', substr(md5(seed || ':' || s),1,15)) as bigint)`.
   */
  def seededHash(seed: Int, s: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 15), 16, 10).cast("long")

  /** Unseeded variant (SimHash feature hashing, fingerprinting). */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /**
   * Distinct word n-gram shingles of `text`. Documents shorter than `n` words
   * yield a single shingle (the whole text) so every document has a non-empty
   * feature set.
   */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    val grams = transform(
      sequence(lit(0), size(w) - n),
      i => array_join(slice(w, i + 1, lit(n)), " "))
    array_distinct(when(size(w) >= n, grams).otherwise(array(text)))
  }

  /**
   * MinHash signature: k independent min-hashes over the shingle set.
   * `sig[i] = min over shingles of seededHash(i, shingle)`.
   */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(shingleCol, s => seededHash(i, s)))): _*)

  /**
   * 62-bit SimHash over a feature (shingle) array column named by `shinglesField`:
   * bit b of the signature is set when the majority of feature hashes have bit b
   * set (+1/-1 vote). Built as one SQL expression because `shiftleft/shiftright`
   * with a *column* shift amount is only reachable through the SQL parser; integer
   * sums are order-insensitive so the DuckDB oracle can use `list_sum` verbatim.
   */
  def simhash62(shinglesField: String): Column = expr(
    s"""aggregate(
          sequence(0, 61),
          0L,
          (acc, b) -> acc + IF(
            aggregate(
              transform($shinglesField, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) AS bigint)),
              0,
              (v, h) -> v + IF((shiftright(h, b) & 1) = 1, 1, -1)) > 0,
            shiftleft(1L, b), 0L))""")

  /**
   * Exact set-Jaccard similarity between two (already-distinct) shingle arrays.
   */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /**
   * Winnowing-style document fingerprint: the minimum 60-bit hash over the
   * document's word-3-shingles — stable under small edits away from the minimum.
   */
  def fingerprint(text: Column): Column =
    array_min(transform(shingles(text, 3), s => hash60(s)))
}
