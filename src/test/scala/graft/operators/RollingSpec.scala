package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Rolling.trailingStats — the chunked exact rewrite of the per-type
 * trailing-row window (the q88 scale fix): row-level equality with the
 * plain single-partition-per-type window on a fixture that exercises every
 * branch — a dense uniform type (chunks), a sparse type (falls back), a
 * type with a planted TIME GAP spanning whole buckets (empty range ⇒ must
 * fall back — the carry-block precondition fails), and duplicate
 * timestamps straddling bucket boundaries (the tiebreak column decides).
 */
class RollingSpec extends SparkSpec {

  private def plainWindow(df: org.apache.spark.sql.DataFrame, frame: Int) = {
    val w = Window.partitionBy(col("t")).orderBy(col("ts"), col("id"))
      .rowsBetween(-frame, -1)
    df.select(col("t"), col("ts"), col("id"),
      count(lit(1)).over(w).as("n"),
      sum(col("v")).over(w).as("sv"),
      sum(col("v") * col("v")).over(w).as("svv"))
  }

  test("chunked trailing stats equal the plain window row-for-row") {
    import spark.implicits._
    // deterministic pseudo-random values (splitmix-ish mix, driver-side)
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      (z ^ (z >>> 27)) & 0xffffL
    }
    val dense = (0L until 4000L).map(i => ("dense", 1000L + i * 3, i, mix(i)))
    // duplicate timestamps: every pair of consecutive ids shares a ts, so
    // some duplicates land exactly at bucket boundaries
    val dup = (0L until 3000L).map(i => ("dup", 5000L + (i / 2) * 7, i, mix(i + 9)))
    val sparse = (0L until 40L).map(i => ("sparse", i * 11, i, mix(i + 7)))
    // a whole-bucket gap: two dense runs with an empty middle third — the
    // density census must refuse to chunk this type
    val gap = (0L until 1500L).map(i =>
      ("gap", (if (i < 750) i else 200000L + i) * 2, i, mix(i + 3)))
    val df = (dense ++ dup ++ sparse ++ gap).toDF("t", "ts", "id", "v")

    for (frame <- Seq(7, 100)) {
      val got = Rolling.trailingStats(df, "t", "ts", "id", "v", frame = frame)
        .select(col("t"), col("ts"), col("id"), col("n"), col("sv"), col("svv"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
          ((r.getLong(3),
            if (r.isNullAt(4)) Long.MinValue else r.getLong(4),
            if (r.isNullAt(5)) Long.MinValue else r.getLong(5)))).toMap
      val want = plainWindow(df, frame)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
          ((r.getLong(3),
            if (r.isNullAt(4)) Long.MinValue else r.getLong(4),
            if (r.isNullAt(5)) Long.MinValue else r.getLong(5)))).toMap
      assert(got.size == want.size, s"row count at frame=$frame")
      val bad = want.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
      assert(bad.isEmpty,
        s"frame=$frame: ${bad.size} divergent rows, first: ${bad.take(3)}")
    }
  }

  test("the dense type actually chunks (anti-vacuousness) and output keeps input columns") {
    import spark.implicits._
    val df = (0L until 3200L).map(i => ("d", i * 5, i, i % 97)).toDF("t", "ts", "id", "v")
    val out = Rolling.trailingStats(df, "t", "ts", "id", "v", frame = 50)
    assert(out.columns.toSeq == Seq("t", "ts", "id", "v", "n", "sv", "svv"))
    // the window must be (type, bucket)-partitioned in the physical plan —
    // a silently un-chunked rewrite would pass the equality test trivially
    val p = out.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(t#[0-9L]*, _b".r.findFirstIn(p).nonEmpty,
      s"rolling window must partition by (t, _b):\n$p")
  }
}
