package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series joins Spark has no built-in operator for — each composed from
 * shuffle-partitioned primitives instead of an inequality join (which Spark
 * plans as a nested-loop):
 *
 *  - AS-OF: attach to each left row the latest right row at-or-before its
 *    timestamp (per key) — the union + keyed-window formulation: one shuffle
 *    on the key, a per-key sort, zero row explosion, no range comparison in
 *    any join condition.
 *  - RANGE: match events to enclosing `[start, end)` intervals — the
 *    time-bucket formulation: intervals explode to the few buckets they
 *    overlap, events carry their own bucket, the join is an EQUI-join on the
 *    bucket and the exact range predicate filters inside. Cost scales with
 *    interval length / bucket width, never |events| × |intervals|.
 */
object TemporalJoins {

  /**
   * As-of join: for each `left` row, the `valueCol` of the latest `right` row
   * with `right.ts <= left.ts` and the same `key` (null when none precedes —
   * LEFT as-of semantics). Ties at identical (key, ts) must be resolved by
   * the caller (e.g. pre-aggregate the right side); at-or-before means a
   * right row AT the left row's timestamp matches.
   *
   * Mechanism: tag the streams, union, and take `last(value) ignoreNulls`
   * over (key ORDER BY ts, side) with rights sorting before lefts at equal
   * ts. One hash exchange on the key, one sort — the same cost as a window
   * aggregate, for any data size.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCol: String, as: String): DataFrame = {
    val lCols = left.columns
    val rvType = right.schema(valueCol).dataType
    val lSide = left.select(lCols.map(col) :+ lit(1).as("_side")
      :+ lit(null).cast(rvType).as("_rv"): _*)
    // right rows align to the left schema with typed nulls for the columns
    // they don't carry; only (key, ts, value) matter on this side
    val rSide = lCols.foldLeft(
      right.select(col(key), col(ts), lit(0).as("_side"), col(valueCol).as("_rv"))) {
      (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lCols.map(col) :+ col("_side") :+ col("_rv"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn(as, last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .drop("_side", "_rv")
  }

  /**
   * FORWARD as-of join with tolerance: for each `left` row, the `valueCol` of
   * the EARLIEST `right` row with `left.ts <= right.ts <= left.ts +
   * toleranceUs` and the same `key` (null when none follows in time, or the
   * nearest follower is beyond tolerance). The attribution-with-deadline
   * shape: "the next purchase within 30 minutes of the click". Ties at
   * identical (key, ts) must be resolved by the caller (pre-aggregate the
   * right side); `ts` must be an integral epoch column (micros).
   *
   * Mechanism mirrors [[asofJoin]] time-reversed: union the tagged streams,
   * take `first(struct(ts, value)) ignoreNulls` over (key ORDER BY ts, side)
   * with a current-row→unbounded-following frame — the ts rides in the
   * struct so the tolerance check reads the SAME row the value came from.
   * One hash exchange on the key, one sort; no inequality join anywhere.
   */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String, ts: String,
                      valueCol: String, as: String, toleranceUs: Long): DataFrame = {
    val lCols = left.columns
    val rStruct = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_rts", right.schema(ts).dataType),
      org.apache.spark.sql.types.StructField("_rv", right.schema(valueCol).dataType)))
    val lSide = left.select(lCols.map(col) :+ lit(0).as("_side")
      :+ lit(null).cast(rStruct).as("_r"): _*)
    val rSide = lCols.foldLeft(
      right.select(col(key), col(ts), lit(1).as("_side"),
        struct(col(ts).as("_rts"), col(valueCol).as("_rv")).as("_r"))) {
      (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lCols.map(col) :+ col("_side") :+ col("_r"): _*)
    // rights sort AFTER lefts at equal ts (side 1 > 0), so an at-ts right is
    // inside the left row's following frame — at-or-after semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lSide.unionByName(rSide)
      .withColumn("_r", first(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 0)
      .withColumn(as,
        when(col("_r._rts") - col(ts) <= toleranceUs, col("_r._rv")))
      .drop("_side", "_r")
  }

  /**
   * Range join: `(interval, event)` matches where `start <= event.ts < end`,
   * via time buckets of `bucket` microseconds: an interval replicates to
   * each bucket it overlaps (ceil(len/bucket)+1 rows — a small constant for
   * sane interval lengths), an event joins on its own single bucket, and the
   * exact predicate decides. Every match arises in exactly one bucket (the
   * event's), so no dedup is needed.
   *
   * `intervals` needs (`iv_id`, `start_us`, `end_us`); `events` needs a
   * `ts_us` column. Both in epoch micros.
   */
  def rangeJoin(intervals: DataFrame, events: DataFrame,
                bucketUs: Long): DataFrame = {
    val ivBuckets = intervals.withColumn("_bucket",
      explode(sequence(expr(s"start_us div $bucketUs"),
        expr(s"(end_us - 1) div $bucketUs"))))
    val evBuckets = events.withColumn("_bucket", expr(s"ts_us div $bucketUs"))
    ivBuckets.join(evBuckets, Seq("_bucket"))
      .where(col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
      .drop("_bucket")
  }
}
