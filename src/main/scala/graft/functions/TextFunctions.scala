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
   * Rolling gram key from PER-WORD hashes — the cheap n-gram fingerprint
   * for census keys: given `hs` (array of word [[hash60]]s — the DOMAIN
   * contract: non-negative longs < 2^60) and a 0-based window start `i`,
   * the key of the n-gram at i is
   *
   *   XOR over j in [0, n) of rotl60(hs[i+j], 7·j)
   *
   * One md5 per WORD instead of one per GRAM (the q160-q163 censuses run
   * ~8 grams per token across orders 1..4 — this cuts the hash count 8×),
   * while the rotation keeps permutations distinct ("a b" ≠ "b a") and
   * repeated words alive ("a a" = h ^ rotl60(h, 7) ≠ 0 for h ∉ {0, 2^60−1},
   * because gcd(7, 60) = 1 makes the rotation a full cycle). Linear over
   * XOR, so adversarial collisions are constructible — fine for census
   * keys whose oracle twin runs the SAME arithmetic (a collision merges
   * gram classes identically in both engines), wrong for security.
   *
   * The rotation is 60-bit, NOT 64-bit, and masks BEFORE shifting:
   *
   *   rotl60(h, r) = ((h & (2^(60−r) − 1)) << r) | (h >> (60 − r))
   *
   * so every intermediate stays a non-negative BIGINT < 2^60 in BOTH
   * engines. The naive 64-bit form is NOT DuckDB-expressible: DuckDB
   * RAISES "Overflow in left shift" whenever `h << r` loses high bits
   * (measured), it does not wrap like the JVM — the mask-first 60-bit
   * form needs no wrap semantics at all. DuckDB twin, bit-exact:
   *   `xor-fold over j of (((h & ((1::BIGINT << (60−r)) − 1)) << r)
   *                        | (h >> (60 − r)))`,  r = 7·j mod 60
   * (`>>` on a non-negative BIGINT is the same logical shift in both).
   */
  def gramKeyAt(hs: Column, i: Column, n: Int): Column =
    (0 until n).map { j =>
      val r = (7 * j) % 60
      val h = element_at(hs, (i + lit(j + 1)).cast("int"))
      if (r == 0) h
      else shiftleft(h.bitwiseAND(lit((1L << (60 - r)) - 1)), r)
        .bitwiseOR(shiftright(h, 60 - r))
    }.reduce(_ bitwiseXOR _)

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

  /** Mersenne prime modulus for the double-hashing MinHash family — keeps all
   * intermediate products < 2^36, so the arithmetic can't overflow in either
   * engine (DuckDB raises on BIGINT overflow; Spark wraps — both are avoided). */
  final val MinhashP = 2147483647L

  /** The two base hashes of the Kirsch-Mitzenmacher family: 2 md5 calls per
   * shingle, from which all k MinHash functions derive as `(b1 + i*b2) mod P`. */
  def minhashBases(shingleCol: Column): (Column, Column) = (
    transform(shingleCol, s => hash60(s) % MinhashP),
    transform(shingleCol, s => hash60(concat(lit("#"), s)) % MinhashP))

  /**
   * MinHash signature from precomputed base-hash arrays (see [[minhashBases]]):
   * `sig[i] = min over shingles of (b1 + i*b2) mod P`. Callers must materialize
   * b1/b2 in their own projection — they are referenced k times here, and
   * Catalyst's CollapseProject keeps a non-cheap multiply-referenced alias in
   * its own project, so the 2-md5-per-shingle work runs once per row.
   */
  def minhashSignatureFromBases(b1: Column, b2: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(zip_with(b1, b2, (x, y) => (x + lit(i.toLong) * y) % MinhashP))): _*)

  /**
   * 62-bit SimHash over a *precomputed* feature-hash array column named by
   * `hashesField` (produce it once with `transform(shingles, hash60)` — hashing
   * inside the bit fold would recompute every md5 62 times): bit b of the
   * signature is set when the majority of feature hashes have bit b set
   * (+1/-1 vote). Built as one SQL expression because `shiftleft/shiftright`
   * with a *column* shift amount is only reachable through the SQL parser;
   * integer sums are order-insensitive so the DuckDB oracle can use `list_sum`
   * verbatim.
   */
  def simhash62(hashesField: String): Column = expr(
    s"""aggregate(
          $hashesField,
          array_repeat(0, 62),
          (acc, h) -> zip_with(acc, sequence(0, 61),
                        (v, b) -> v + IF((shiftright(h, b) & 1) = 1, 1, -1)),
          votes -> aggregate(
            zip_with(votes, sequence(0, 61),
              (v, b) -> IF(v > 0, shiftleft(1L, b), 0L)),
            0L,
            (s, x) -> s + x))""")

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

  /**
   * FULL winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
   * algorithm): hash every word `k`-gram of token array `ws`, then from
   * every window of `w` consecutive gram hashes keep the minimum (ties →
   * leftmost position; struct(h, p) ordering makes `array_min` pick it).
   * Returns the distinct selected array<struct<h: long, p: int>> — position
   * `p` is the gram's token offset. The guarantee: any two documents sharing
   * a token run of ≥ w+k-1 tokens share at least one selected fingerprint
   * (every such run fully contains one selection window on each side, and
   * both sides pick the same minimum inside it), at ~2/(w+1) the density of
   * the full gram-hash set. Everything is a scalar array fold — scan-speed,
   * no shuffle; [[fingerprint]] above is the 1-hash-per-doc degenerate case.
   * Documents with fewer than k tokens yield no grams: callers filter them.
   */
  def winnow(ws: Column, k: Int, w: Int): Column = {
    val grams = transform(sequence(lit(0), size(ws) - k),
      i => struct(hash60(array_join(slice(ws, i + 1, lit(k)), " ")).as("h"),
        i.as("p")))
    // LET-BIND the gram array once per row (transform over a 1-element
    // array): the window lambda below references the bound VARIABLE `gs`,
    // not the gram expression — naively inlining `grams` into the window
    // lambda re-hashes every k-gram once PER WINDOW (lambda bodies are
    // re-evaluated per element and subexpression elimination does not cross
    // lambda boundaries), which measured 70× slower at sf0.01.
    // ng >= w: windows 0..ng-w of length w; 1 <= ng < w: ONE window of all grams
    element_at(transform(array(grams), gs =>
      array_distinct(transform(
        sequence(lit(0), greatest(size(gs) - w, lit(0))),
        i => array_min(slice(gs, i + 1, least(lit(w), size(gs))))))), 1)
  }

  // ------------------------------------------------------------------ PII scrubbing

  /** PII patterns for the redaction pass — deliberately restricted to the
   * ASCII syntax subset on which Java regex (Spark) and RE2 (DuckDB) agree,
   * so the redacted text itself is oracle-comparable. Explicit [A-Za-z]
   * classes stand in for case-insensitivity ((?i) is NOT in the common
   * subset); the phone pattern takes 2-4 digit groups, covering both
   * +1-555-0423 and +1-555-123-4567 shapes. */
  final val EmailRe = "[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val PhoneRe = "\\+[0-9]{1,2}(-[0-9]{3,4}){2,3}"
  final val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /**
   * PII redaction for training-data scrubbing: replaces emails, then phone
   * numbers, then IPv4 addresses with typed placeholders. Pure codegen'd
   * `regexp_replace` chain — a narrow map over the corpus, no shuffle; at
   * 100 TB this runs at scan speed and composes with any downstream operator.
   * Ordering matters and is fixed: emails first (their local part may contain
   * digits/dots that the later patterns could clip).
   */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")
}
