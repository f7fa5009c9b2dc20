package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact trailing-row-frame statistics with BOUNDED window partitions — the
 * q88 scale fix (VERDICT r16 #6): a `Window.partitionBy(type)` rolling
 * frame caps parallelism at the TYPE CARDINALITY (the events fixture has 5
 * types, so sf10's 10M rows sort as five 2M-row single-task sorts — 64.6 s,
 * dec2 9.3×, and each further decade grows the per-task sort, not the task
 * count). The exact-equivalence rewrite: split each type's timeline into
 * `buckets` TIME ranges, copy the last `frame` rows of every bucket into
 * the next bucket as CARRY rows, and run the same trailing frame inside
 * (type, bucket) — for any non-carry row the in-partition predecessors are
 * the carry block (the `frame` rows immediately before the bucket in
 * global order) followed by the bucket's own earlier rows, so every
 * trailing window of size ≤ `frame` is IDENTICAL to the single-partition
 * one (RollingSpec pins row-level equality, planted gaps included).
 *
 * The rewrite is only exact when every bucket it relies on can supply a
 * FULL carry block, so a per-type census gates it: a type is DENSE when
 * all `buckets` time ranges are populated with ≥ `frame` rows each —
 * sparse types (including any with an empty range: a planted time gap)
 * fall back to one partition, which is always exact and exactly the case
 * where one partition is cheap. The census and bound frames are bounded
 * aggregates (|types| and |types×buckets| rows) and join back by
 * broadcast; the corpus-sized data crosses exactly ONE exchange (the
 * window's (type, bucket) repartition) plus frame/buckets per-bucket
 * carry duplicates.
 *
 * Input: any frame with `typeC` (partition key), `tsC` (long order key),
 * `tieC` (unique tiebreak), `valC` (long value). Output: the input columns
 * plus `n`, `sv`, `svv` — the trailing-`frame` count, sum, and sum of
 * squares, rows before the frame fills included (n < frame), exactly as
 * `rowsBetween(-frame, -1)` over the unbucketed partition.
 */
private[graft] object Rolling {

  def trailingStats(df: DataFrame, typeC: String, tsC: String, tieC: String,
                    valC: String, frame: Int = 100,
                    buckets: Int = 32): DataFrame = {
    require(frame >= 1 && buckets >= 2, s"frame=$frame buckets=$buckets")
    val t = col(typeC); val ts = col(tsC); val tie = col(tieC)

    // per-type time bounds — |types| rows, broadcast back
    val bounds = df.groupBy(t.as("_bt"))
      .agg(min(ts).as("_mn"), max(ts).as("_mx"))
    // integer `div`, never float division: a double quotient at a bucket
    // boundary could round across the floor (monotone either way, but the
    // integer form is exact by construction). `tsC` must be a plain column
    // name — callers pass a projected frame.
    val bucketed = df.join(broadcast(bounds), t === col("_bt"))
      .withColumn("_rb", expr(
        s"cast((($tsC - _mn) * $buckets) div (_mx - _mn + 1) as int)"))
      .drop("_bt", "_mn", "_mx")

    // density census: a type chunks only when EVERY bucket holds a full
    // carry block — |types×buckets| rows, broadcast back
    val census = bucketed.groupBy(t.as("_ct"), col("_rb"))
      .agg(count(lit(1)).as("_bn"))
      .groupBy(col("_ct"))
      .agg((count(lit(1)) === buckets &&
        min(col("_bn")) >= frame).as("_dense"))
    val marked = bucketed.join(broadcast(census), t === col("_ct"))
      .withColumn("_b", when(col("_dense"), col("_rb")).otherwise(lit(0)))
      .drop("_ct", "_rb")

    // carry: the last `frame` rows of each bucket, re-tagged into the next
    // bucket — DENSE types only (ADVICE r17): a sparse fallback type sits
    // entirely in _b = 0, so without the `_dense` guard its every row would
    // match `_b < buckets - 1`, pay a full rank window, and emit `frame`
    // phantom (type, 1) carries that the final filter discards — wasted
    // sort work on exactly the types the census chose not to chunk.
    val rk = Window.partitionBy(t, col("_b")).orderBy(ts.desc, tie.desc)
    val carries = marked.where(col("_dense") && col("_b") < buckets - 1)
      .withColumn("_rk", row_number().over(rk))
      .where(col("_rk") <= frame)
      .withColumn("_b", col("_b") + 1)
      .drop("_rk")
      .withColumn("_carry", lit(true))
    val all = marked.withColumn("_carry", lit(false)).unionByName(carries)
      .drop("_dense")

    val w = Window.partitionBy(t, col("_b")).orderBy(ts, tie)
      .rowsBetween(-frame, -1)
    all.select(df.columns.map(col) ++ Seq(col("_carry"),
        count(lit(1)).over(w).as("n"),
        sum(col(valC)).over(w).as("sv"),
        sum(col(valC) * col(valC)).over(w).as("svv")): _*)
      .where(!col("_carry"))
      .drop("_carry")
  }
}
