package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}

/** The rotate-XOR rolling gram key (the round-15 named lever for the
 * generation-eval censuses, wired in round 16): one md5 per WORD, integer
 * combines per gram. The rotation is 60-BIT (the hash60 domain) with the
 * mask applied BEFORE the left shift — the 64-bit form is not
 * DuckDB-expressible (DuckDB raises on overflowing `<<`, it doesn't wrap),
 * so the replica here and the oracle twins share the 60-bit arithmetic. */
class GramKeySpec extends SparkSpec {

  private def rotl60(h: Long, r: Int): Long =
    if (r == 0) h else (((h & ((1L << (60 - r)) - 1)) << r) | (h >>> (60 - r)))

  private def replica(hs: Seq[Long], i: Int, n: Int): Long =
    (0 until n).map(j => rotl60(hs(i + j), (7 * j) % 60)).reduce(_ ^ _)

  test("gramKeyAt matches the in-driver replica over random word-hash windows") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // the domain contract: hash60 values, non-negative < 2^60
    val rows = Seq.fill(50)(Seq.fill(12)(rnd.nextLong() & ((1L << 60) - 1)))
    val df = rows.zipWithIndex.map { case (hs, id) => (id.toLong, hs) }
      .toDF("id", "hs")
    for (n <- 1 to 4) {
      val got = df.select(col("id"), posexplode(
          transform(sequence(lit(0), size(col("hs")) - n),
            i => T.gramKeyAt(col("hs"), i, n))))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      for ((hs, id) <- rows.zipWithIndex; i <- 0 to hs.length - n)
        assert(got((id.toLong, i)) == replica(hs, i, n),
          s"divergence at id=$id i=$i n=$n")
    }
  }

  test("gramKeyAt separates word order and keeps repeated words alive") {
    import spark.implicits._
    val h1 = 0x123456789abcdefL
    val h2 = 0x0edcba987654321fL
    val df = Seq(
      (1L, Seq(h1, h2)), (2L, Seq(h2, h1)), (3L, Seq(h1, h1))
    ).toDF("id", "hs")
    val keys = df.select(col("id"), T.gramKeyAt(col("hs"), lit(0), 2).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keys(1L) != keys(2L), "order must change the key")
    assert(keys(3L) != 0L, "a repeated word must not cancel to zero")
    assert(keys(1L) == replica(Seq(h1, h2), 0, 2))
  }

  test("hash60 — the only production feeder of gramKeyAt — stays in the " +
    "60-bit domain on arbitrary strings") {
    // the documented domain CONTRACT (ADVICE r16): gramKeyAt's rotation
    // discards bits 60-63, so a caller feeding full-width longs would get
    // silently degraded keys. hash60 (15 md5 hex chars) is < 16^15 = 2^60
    // by construction; this pins the producer side of the contract so any
    // new feeder copies a guarded pattern rather than a bare assumption.
    import spark.implicits._
    val strings = Seq("", "a", "word", "ümlaut", "多字节", "x" * 1000,
      "tab\tand\nnewline", "🙂emoji") ++
      (0 until 200).map(i => s"tok$i")
    val vals = strings.toDF("s")
      .select(T.hash60(col("s")).as("h"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .head()
    assert(vals.getLong(0) >= 0L, "hash60 must be non-negative")
    assert(vals.getLong(1) < (1L << 60), "hash60 must stay below 2^60")
  }
}
