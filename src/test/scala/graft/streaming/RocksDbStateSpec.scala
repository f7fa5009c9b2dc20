package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.queries.Tables

/**
 * The 100 TB state posture for the stateful streaming twins: the default
 * HDFS-backed state store holds every key's state on the JVM heap — a
 * churning key space (per-user totals over a large user base, a CDC snapshot
 * of a large table) eventually OOMs an executor. RocksDB spills state to
 * local disk with a bounded block cache, so state size is limited by disk,
 * not heap. This spec re-runs both `flatMapGroupsWithState` twins under
 * `RocksDBStateStoreProvider` and proves (a) results are identical to the
 * batch formulation — the provider is a drop-in config swap, no operator
 * change — and (b) RocksDB was REALLY the provider (rocksdb custom metrics
 * in the query progress; a silently-ignored conf would leave the default
 * provider's metrics instead).
 */
class RocksDbStateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the RocksDB provider set, restoring the prior value. */
  private def withRocksDb[A](body: => A): A = {
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  /** The provider actually in use, from the state operator's custom metrics. */
  private def assertRocksDbMetrics(q: StreamingQuery): Unit = {
    val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
    assert(ops.nonEmpty, "the query must report a state operator")
    val keys = ops.flatMap(_.customMetrics.keySet().toArray.map(_.toString))
    assert(keys.exists(_.toLowerCase.contains("rocksdb")),
      s"state operator must surface rocksdb metrics, got: ${keys.mkString(", ")}")
  }

  test("running totals under RocksDB state store equal the batch GROUP BY") {
    val inDir = Files.createTempDirectory("graft-rocks-in").toFile
    val ckDir = Files.createTempDirectory("graft-rocks-ck").toFile
    val raw = Tables.events(spark, sf)
    val ev = raw.select(col("ts"), col("user_id"), col("value"))
    // split by EVENT parity → both chunks hold every user, so batch 2 MUST
    // fold into batch 1's RocksDB-held state, not start fresh
    raw.where(col("event_id") % 2 === 0).select(col("ts"), col("user_id"), col("value"))
      .coalesce(1).write.parquet(s"$inDir/chunk=0")
    raw.where(col("event_id") % 2 === 1).select(col("ts"), col("user_id"), col("value"))
      .coalesce(1).write.parquet(s"$inDir/chunk=1")
    withRocksDb {
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
      val q = StreamingExtraction.runningUserTotals(stream)
        .writeStream.format("memory").queryName("rocks_totals")
        .option("checkpointLocation", ckDir.getAbsolutePath)
        .outputMode("update")
        .start()
      try { q.processAllAvailable(); assertRocksDbMetrics(q) }
      finally q.stop()
    }
    val finalPerUser = spark.table("rocks_totals")
      .groupBy(col("user_id")).agg(max(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = ev.groupBy(col("user_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(finalPerUser == batch)
  }

  test("latest-wins snapshot under RocksDB state store equals the batch compaction") {
    val inDir = Files.createTempDirectory("graft-rocks-snap-in").toFile
    val ckDir = Files.createTempDirectory("graft-rocks-snap-ck").toFile
    val log = Tables.events(spark, sf)
      .where(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), (col("event_type") === "click").as("is_del"),
        col("value"))
    log.where(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$inDir/chunk=0")
    log.where(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$inDir/chunk=1")
    withRocksDb {
      val stream = spark.readStream.schema(log.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
      val q = StreamingExtraction.latestSnapshot(stream)
        .writeStream.format("memory").queryName("rocks_snapshot")
        .option("checkpointLocation", ckDir.getAbsolutePath)
        .outputMode("update")
        .start()
      try { q.processAllAvailable(); assertRocksDbMetrics(q) }
      finally q.stop()
    }
    def snapshot(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = df
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("is_del"), col("value"))).as("w"))
      .where(!col("w.is_del"))
      .select(col("user_id"), col("w.ts_us"), col("w.value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(snapshot(spark.table("rocks_snapshot")) == snapshot(log))
    assert(snapshot(log).nonEmpty, "some keys must survive the tombstones (anti-vacuousness)")
  }
}
