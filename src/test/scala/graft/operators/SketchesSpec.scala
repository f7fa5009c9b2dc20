package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV sketch: losslessness below k, estimator accuracy above it, and the
 * bottom-k merge property that makes sketches composable. */
class SketchesSpec extends SparkSpec {

  test("below k the sketch reports the exact distinct count") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => ("small", s"item${i % 7}")).toDF("g", "item")
    val r = Sketches.kmvDistinct(df, col("g"), col("item"), k = 16).collect().head
    assert(r.getLong(1) == 7) // n_hashes
    assert(r.getDouble(3) == 7.0) // estimate == exact
  }

  test("above k the estimate lands within 20% of the truth (deterministic)") {
    import spark.implicits._
    val df = (0 until 10000).map(i => ("big", s"token-$i")).toDF("g", "item")
    val r = Sketches.kmvDistinct(df, col("g"), col("item"), k = 256).collect().head
    val est = r.getDouble(3)
    assert(math.abs(est - 10000) / 10000 < 0.2, s"estimate $est")
  }

  test("native bottomk_distinct aggregate equals a driver-side recomputation") {
    import spark.implicits._
    // duplicates across partitions exercise map-side dedup + partial merge
    val df = (0 until 5000).map(i => (s"g${i % 5}", s"tok-${i % 900}"))
      .toDF("g", "item").repartition(8)
    val got = Sketches.kmvDistinct(df, col("g"), col("item"), k = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // ground truth: per group, distinct 60-bit hashes sorted ascending, first 16
    val truth = df.select(col("g"),
        graft.functions.TextFunctions.hash60(col("item")).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, rows) =>
        val bottom = rows.map(_._2).sorted.take(16)
        g -> (bottom.length.toLong, bottom.last)
      }
    assert(got == truth)
  }

  test("Count-Min never underestimates, and counter tables merge cell-wise") {
    import spark.implicits._
    val items = (0 until 2000).map(i => s"t${i % 37}").toDF("term")
    val exact = items.groupBy(col("term")).agg(count(lit(1)).as("exact_cnt"))
    // narrow table (3×16): collisions certain with 37 distinct terms — the
    // one-sided error guarantee is what must hold
    val est = Sketches.countMinEstimate(
      Sketches.countMin(items, col("term"), d = 3, w = 16), exact, d = 3, w = 16)
    val rows = exact.join(est, "term").collect()
    assert(rows.length == 37)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"${r.getString(0)}: estimate ${r.getLong(2)} < exact ${r.getLong(1)}"))
    // merge = cell-wise addition of counter tables
    val a = (0 until 700).map(i => s"t${i % 37}").toDF("term")
    val b = (700 until 2000).map(i => s"t${i % 37}").toDF("term")
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMin(df, col("term"), d = 3, w = 16)
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val whole = cells(items)
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged == whole)
    // an unseen probe term can only pick up collision mass, never go negative
    val unseen = Sketches.countMinEstimate(
      Sketches.countMin(items, col("term"), d = 3, w = 16),
      Seq("never-seen-term").toDF("term"), d = 3, w = 16).collect().head
    assert(unseen.getLong(1) >= 0L)
  }

  test("kmv ignores null items: all-null groups vanish, mixed groups count non-nulls") {
    import spark.implicits._
    val df = Seq(("allnull", None), ("allnull", None),
      ("mixed", None), ("mixed", Some("a")), ("mixed", Some("b")))
      .toDF("g", "item")
    val got = Sketches.kmvDistinct(df, col("g"), col("item"), k = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("mixed" -> 2L)) // nulls are not distinct values
  }

  test("bloomProbe stays false-negative-free for duplicated probe rows") {
    import spark.implicits._
    val bits = Sketches.bloomBits(Seq("present").toDF("g"), col("g"), m = 256, k = 3)
    // the same (id, item) probe row twice: 2k position rows in one group —
    // a member must STILL probe true (the one-sided contract)
    val probes = Seq((1L, "present"), (1L, "present"), (2L, "absent-item-xyz"))
      .toDF("id", "g")
    val got = Sketches.bloomProbe(bits, probes, col("g"), m = 256, k = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got(1L), "duplicated member probe must not turn into a false negative")
  }

  test("histogram quantiles land within one bin width of the exact quantile; histograms merge") {
    import spark.implicits._
    val vals = (0 until 9973).map(i => ("g", (i * 37 % 1000) / 10.0)) // [0, 100)
    val df = vals.toDF("g", "v")
    val hist = Sketches.histogram(df, col("g"), col("v"), lo = 0.0, hi = 100.0, bins = 64)
    val est = Sketches.histogramQuantiles(hist, Seq(0.5, 0.9, 0.99), 0.0, 100.0, 64)
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    val sorted = vals.map(_._2).sorted
    val width = 100.0 / 64
    Seq(0.5, 0.9, 0.99).foreach { q =>
      val exact = sorted((q * sorted.length).toInt min (sorted.length - 1))
      assert(math.abs(est(q) - exact) <= width + 1e-9,
        s"q=$q est=${est(q)} exact=$exact")
    }
    // merge = bin-wise addition
    val (a, b) = vals.splitAt(4000)
    def cells(rows: Seq[(String, Double)]) =
      Sketches.histogram(rows.toDF("g", "v"), col("g"), col("v"), 0.0, 100.0, 64)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged == cells(vals))
    // out-of-range values clamp to the edge bins instead of vanishing
    val clamped = Sketches.histogram(Seq(("g", -5.0), ("g", 1e9)).toDF("g", "v"),
      col("g"), col("v"), 0.0, 100.0, 64)
      .collect().map(r => r.getLong(1)).toSet
    assert(clamped == Set(0L, 63L))
  }

  test("Bloom filter: no false negatives, bitsets merge by union, FPs are one-sided") {
    import spark.implicits._
    val members = (0 until 300).map(i => s"member-$i")
    val bits = Sketches.bloomBits(members.toDF("g"), col("g"), m = 1024, k = 3)
    // every member probes true — the no-false-negative guarantee
    val memberProbe = Sketches.bloomProbe(bits,
      members.zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("id", "g"),
      col("g"), m = 1024, k = 3).collect()
    assert(memberProbe.length == 300 && memberProbe.forall(_.getBoolean(2)))
    // disjoint probes: anything flagged is a (legal) false positive; with
    // n=300,k=3,m=1024 most probes must come back clean
    val outsider = Sketches.bloomProbe(bits,
      (0 until 300).map(i => (i.toLong, s"outsider-$i")).toDF("id", "g"),
      col("g"), m = 1024, k = 3).collect()
    val fp = outsider.count(_.getBoolean(2))
    assert(fp < 150, s"false-positive rate implausibly high: $fp/300")
    // merge = union of set-bit positions
    val a = members.take(150)
    val b = members.drop(150)
    def posSet(xs: Seq[String]) = Sketches.bloomBits(xs.toDF("g"), col("g"), 1024, 3)
      .collect().map(_.getLong(0)).toSet
    assert(posSet(a) ++ posSet(b) == posSet(members))
  }

  test("HLL estimate lands within 25% of truth on the raw-estimator branch") {
    import spark.implicits._
    val df = (0 until 20000).map(i => ("big", s"u-${i % 5000}")).toDF("g", "item")
      .repartition(8)
    val r = Sketches.hllDistinct(df, col("g"), col("item"), p = 8).collect().head
    val est = r.getDouble(2)
    assert(math.abs(est - 5000) / 5000 < 0.25, s"estimate $est")
  }

  test("HLL small-range branch is exact linear counting: m*ln(m/zeros)") {
    import spark.implicits._
    val df = Seq.tabulate(50)(i => ("tiny", s"v${i % 3}")).toDF("g", "item")
    val r = Sketches.hllDistinct(df, col("g"), col("item"), p = 5).collect().head
    val nBuckets = r.getLong(1)
    assert(nBuckets <= 3) // at most 3 distinct items -> at most 3 registers
    val zeros = 32.0 - nBuckets
    assert(r.getDouble(2) == 32.0 * math.log(32.0 / zeros))
  }

  test("HLL register vectors merge by element-wise max") {
    import spark.implicits._
    // sketch(A ∪ B) must equal the sketch of the union — the groupBy(bucket)
    // max IS the merge, so running it over the concatenation is the merged
    // sketch; split runs must agree with it on every register
    val a = (0 until 4000).map(i => ("g", s"a$i"))
    val b = (2000 until 6000).map(i => ("g", s"a$i"))
    def regs(rows: Seq[(String, String)]) = {
      val df = rows.toDF("g", "item")
      val h = graft.functions.TextFunctions.hash60(col("item"))
      val w = shiftright(h, 5)
      df.select(pmod(h, lit(32L)).as("bucket"),
          when(w === 0, lit(56)).otherwise(lit(56) - length(bin(w))).as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    val whole = regs(a ++ b)
    val merged = (regs(a).toSeq ++ regs(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(merged == whole)
    // and the operator's estimate over A ∪ B is a pure function of the registers
    val est = Sketches.hllDistinct((a ++ b).toDF("g", "item"),
      col("g"), col("item"), p = 5).collect().head
    assert(est.getLong(1) == whole.size)
  }

  test("bottom-k sets merge losslessly: sketch(A ∪ B) == merge(sketch A, sketch B)") {
    import spark.implicits._
    val a = (0 until 3000).map(i => ("g", s"x$i"))
    val b = (1500 until 5000).map(i => ("g", s"x$i")) // overlapping halves
    val whole = Sketches.kmvDistinct((a ++ b).toDF("g", "item"),
      col("g"), col("item"), k = 64).collect().head
    // merge = union the two bottom-k hash sets, re-take the k minima
    def bottomHashes(rows: Seq[(String, String)]): Seq[Long] =
      rows.toDF("g", "item")
        .select(graft.functions.TextFunctions.hash60(col("item")).as("h"))
        .distinct().collect().map(_.getLong(0)).sorted.take(64).toSeq
    val merged = (bottomHashes(a) ++ bottomHashes(b)).distinct.sorted.take(64)
    assert(whole.getLong(1) == 64)
    assert(whole.getLong(2) == merged.max) // same kth minimum → same estimate
  }
}
