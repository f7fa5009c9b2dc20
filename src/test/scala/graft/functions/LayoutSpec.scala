package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** The q70 layout claim, proven end-to-end: a table partitioned by z-range
 * serves a predicate on EITHER source dimension from a subset of partitions. */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def scannedPartitions(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.selectedPartitions.partitionCount
    }.sum

  test("z-range partitioning prunes scans for single-dimension predicates") {
    val dir = Files.createTempDirectory("graft-zorder").toFile.getAbsolutePath
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), (col("user_id") % 256).as("x"),
        hour(col("ts")).cast("long").as("y"))
      .withColumn("z", LayoutFunctions.zorder(col("x"), col("y"), bits = 8))
      .withColumn("z_range", (col("z") / 64).cast("long"))
    ev.write.partitionBy("z_range").mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)
    val allParts = scannedPartitions(table)
    assert(allParts > 4, s"need a multi-partition layout, got $allParts")

    // a predicate on x ALONE maps to a bounded set of z-ranges (computed the
    // way a reader would: interleave x's bits with every possible y) — the
    // scan must touch only those partitions and still return exact rows
    val x0 = 5L
    val candidateRanges = (0L until 24L)
      .map(y => interleave(x0, y) / 64).distinct
    val prunedScan = table.where(col("z_range").isin(candidateRanges: _*) &&
      col("x") === x0)
    assert(scannedPartitions(prunedScan) < allParts,
      "the z-range predicate must prune partitions")
    val viaPruned = prunedScan.select(col("event_id")).collect().map(_.getLong(0)).toSet
    val direct = ev.where(col("x") === x0)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(viaPruned == direct, "pruning must not change the result")

    // same game for the OTHER dimension — the point of z-order over a sort
    val y0 = 7L
    val yRanges = (0L until 256L).map(x => interleave(x, y0) / 64).distinct
    val prunedY = table.where(col("z_range").isin(yRanges: _*) && col("y") === y0)
    assert(scannedPartitions(prunedY) < allParts)
    assert(prunedY.select(col("event_id")).collect().map(_.getLong(0)).toSet ==
      ev.where(col("y") === y0).select(col("event_id")).collect().map(_.getLong(0)).toSet)
  }

  /** Driver-side twin of [[LayoutFunctions.zorder]] for 8 bits. */
  private def interleave(x: Long, y: Long): Long =
    (0 until 8).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
}
