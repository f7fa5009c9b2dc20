package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Properties of the round-4 fixed-point formulations: the exactness claims
 * in the scaladocs, executed. */
class FixedPointSpec extends SparkSpec {

  test("BM25 integer arithmetic never overflows in its documented domain") {
    // bm25Fixed documents the overflow-free domain N ≤ 1e9, tf ≤ 1e4,
    // dl ≤ 1e6, avgdl ≤ 1e4 — replay every arithmetic step in Long and in
    // BigInt over the domain corners; equality proves no wraparound. (The
    // first version of this test CAUGHT a real wrap: the original ×1e6 idf
    // scale made idf·sat exceed 2^63 beyond ~2e6 documents.)
    for {
      tf <- Seq(1L, 100L, 10000L)
      dl <- Seq(10L, 1000L, 1000000L)
      avgdl <- Seq(10L, 1000L, 10000L)
      nn <- Seq(2L, 500L, 1000000000L)
      df <- Seq(1L, nn / 2 + 1, nn)
    } {
      val tot = nn * avgdl
      val a = (1000L * tot) / nn
      def longSide: (Long, Long) = {
        val idf = (1000L * (2L * (nn - df) + 1L)) / (2L * df + 1L)
        val sat = (22000L * tf * a) /
          (10L * a * tf + 3L * a + 9000L * dl)
        (idf, idf * sat / 1000L)
      }
      def bigSide: (BigInt, BigInt) = {
        val A = BigInt(a)
        val idf = (BigInt(1000) * (2 * (BigInt(nn) - df) + 1)) / (2 * BigInt(df) + 1)
        val sat = (BigInt(22000) * tf * A) /
          (BigInt(10) * A * tf + BigInt(3) * A + BigInt(9000) * dl)
        (idf, idf * sat / 1000)
      }
      val (li, ls) = longSide
      val (bi, bs) = bigSide
      assert(BigInt(li) == bi && BigInt(ls) == bs,
        s"overflow at tf=$tf dl=$dl avgdl=$avgdl N=$nn df=$df: long=($li,$ls) big=($bi,$bs)")
    }
  }

  test("the q88 integer inequality decides exactly |z| > 3") {
    // (n·v−S)²·(n−1) > 9·n·(n·SS−S²)  ⟺  z² > 9 with z from sample stddev —
    // verified on the real window stats: recompute z in floating point and
    // assert agreement away from the exact boundary (the integer side IS the
    // boundary-exact truth)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("us"), col("event_id"))
      .rowsBetween(-100, -1)
    val rows = Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_type", "event_id", "unix_micros(ts) as us",
        "cast(round(value * 100) as long) as v_fp")
      .select(col("v_fp"),
        count(lit(1)).over(w).as("n"),
        sum(col("v_fp")).over(w).as("sv"),
        sum(col("v_fp") * col("v_fp")).over(w).as("svv"))
      .where(col("n") >= 30)
      .collect()
    assert(rows.length > 500)
    var anomalies = 0
    rows.foreach { r =>
      val v = r.getLong(0); val n = r.getLong(1)
      val s = r.getLong(2); val ss = r.getLong(3)
      val intHit = (n * v - s) * (n * v - s) * (n - 1) > 9 * n * (n * ss - s * s)
      val mean = s.toDouble / n
      val varS = (ss.toDouble - s.toDouble * s / n) / (n - 1)
      val z2 = if (varS > 0) (v - mean) * (v - mean) / varS else Double.PositiveInfinity
      if (math.abs(z2 - 9.0) > 1e-6) // away from the boundary, both agree
        assert(intHit == (z2 > 9.0), s"v=$v n=$n S=$s SS=$ss z2=$z2 int=$intHit")
      if (intHit) anomalies += 1
    }
    assert(anomalies > 0, "the corpus should contain at least one 3-sigma event")
  }

  test("imagePhash bits follow brightness: half-dark/half-light image") {
    import spark.implicits._
    import graft.multimodal.{Codecs, MediaMeta, MediaRecord, Multimodal}
    // 16×8 image, left half black, right half white → the 8×8 grid's right
    // four COLUMNS (gx ≥ 4) exceed the global mean in every row; with the
    // column-major bit layout (bit = gx·8 + gy) that is bits 32..63
    val w = 16; val h = 8
    val rgb = Array.tabulate(3 * w * h) { j =>
      val x = (j / 3) % w
      if (x < w / 2) 0.toByte else 255.toByte
    }
    val rec = MediaRecord(7L, "image",
      Codecs.ppmEncode(Codecs.PpmImage(w, h, rgb)), MediaMeta("ppm", w, h, 0))
    val out = Multimodal.imagePhash(Seq(rec).toDS()).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 7L)
    assert(out.head.getLong(1) == 0xFFFFFFFF00000000L,
      f"expected 0xFFFFFFFF00000000, got 0x${out.head.getLong(1)}%016X")
  }

  test("DSIR integer arithmetic never overflows in its documented domain") {
    // q105 documents: per-bucket target count ≤ 1e9, ≤ 1e4 bigrams per doc.
    // Every bucket a scored doc touches has c_raw ≥ c_doc ≥ 1 (the doc IS
    // part of the raw pool), so r_fp ≤ 1e6·(c_tgt+1)/2 ≤ ~5e14 and the doc
    // score Σ c·r_fp ≤ 1e4 · 5e14 = 5e18 < 2^63. Replay the corners in Long
    // and BigInt; equality proves no wraparound.
    for {
      cTgt <- Seq(0L, 1000L, 1000000000L)
      cRaw <- Seq(1L, 1000L, 1000000000L)
      cDoc <- Seq(1L, 100L, 10000L)
      if cRaw >= cDoc // doc features are part of the raw pool
    } {
      val rLong = (1000000L * (cTgt + 1L)) / (cRaw + 1L)
      val rBig = (BigInt(1000000) * (BigInt(cTgt) + 1)) / (BigInt(cRaw) + 1)
      assert(BigInt(rLong) == rBig, s"ratio wrap at c_tgt=$cTgt c_raw=$cRaw")
      // worst-case doc score: the WHOLE doc budget on this one bucket
      val wLong = cDoc * rLong
      val wBig = BigInt(cDoc) * rBig
      assert(BigInt(wLong) == wBig,
        s"weight wrap at c_tgt=$cTgt c_raw=$cRaw c_doc=$cDoc")
    }
  }

  test("perceptron integer arithmetic never overflows in its documented domain") {
    // q113: after T=8 batch rounds, |w(b)| ≤ T · Σ_docs c_doc(b) ≤ 8·C with
    // C the corpus-wide count of the hottest bucket; a doc's score is
    // Σ_b c·w with Σ_b c ≤ 1e4 tokens. Domain: C ≤ 1e12 bucket occurrences
    // (a trillion — far past 100 TB of text over 1024 buckets ÷ sharding),
    // doc length ≤ 1e4: |score| ≤ 1e4 · 8e12 = 8e16 < 2^63. Long-vs-BigInt
    // corner replay proves no wraparound.
    for {
      hot <- Seq(1L, 1000000L, 1000000000000L) // hottest-bucket corpus count
      cDoc <- Seq(1L, 100L, 10000L)
      sign <- Seq(-1L, 1L)
    } {
      val w = sign * 8L * hot
      val sLong = cDoc * w
      val sBig = BigInt(cDoc) * BigInt(w)
      assert(BigInt(sLong) == sBig, s"score wrap at hot=$hot c=$cDoc sign=$sign")
    }
  }
}
