package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/**
 * Sessionization proofs:
 *  - `session_window` (batch run) equals the gaps-and-islands formulation
 *    (lag + running sum of breaks) — the same SQL shape the DuckDB oracle
 *    uses, so q40's gate is additionally pinned engine-internally;
 *  - under a real file-source STREAM with a watermark, every emitted session
 *    matches its batch twin (append mode emits only watermark-closed
 *    sessions, so the stream result is a prefix-subset of batch).
 */
class SessionizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val gapUs = 30L * 60 * 1000 * 1000

  private def batchSessions = StreamingExtraction
    .sessionizedUserStats(Tables.events(spark, sf), gap = "30 minutes")
    .select(unix_micros(col("session_start")).as("sess_us"),
      col("user_id"), col("n_events"), round(col("sum_value"), 4).as("sum_value"))

  test("session_window equals the gaps-and-islands window formulation") {
    val viaSessionWindow = batchSessions
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val islands = ev
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(byUser) >= gapUs, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("sess_us"), count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("sess_us"), col("user_id"), col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    assert(viaSessionWindow.nonEmpty)
    assert(viaSessionWindow.size > 100, "1000 events / 50 users should form many sessions")
    assert(viaSessionWindow == islands)
  }

  test("streaming session_window emits watermark-closed sessions equal to batch") {
    val inDir = Files.createTempDirectory("graft-sess-in").toFile
    val ckDir = Files.createTempDirectory("graft-sess-ck").toFile
    // two time-ordered chunks → two micro-batches (maxFilesPerTrigger=1);
    // batch 1's max event time advances the watermark so its closed sessions
    // emit during batch 2
    val ev = Tables.events(spark, sf).select(col("ts"), col("user_id"), col("value"))
    val cut = ev.select(percentile_approx(col("ts").cast("double"), lit(0.5), lit(100)))
      .head().getDouble(0)
    ev.where(col("ts").cast("double") <= cut).coalesce(1)
      .write.parquet(s"$inDir/chunk=0")
    ev.where(col("ts").cast("double") > cut).coalesce(1)
      .write.parquet(s"$inDir/chunk=1")

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/chunk=*")
    val q = StreamingExtraction.sessionizedUserStats(stream, gap = "30 minutes")
      .select(unix_micros(col("session_start")).as("sess_us"),
        col("user_id"), col("n_events"), round(col("sum_value"), 4).as("sum_value"))
      .writeStream.format("memory").queryName("stream_sessions")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("stream_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = batchSessions
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty, "watermark passage should close and emit sessions")
    val diff = streamed -- batch
    assert(diff.isEmpty, s"streamed sessions must match their batch twins: $diff")
  }

  test("streaming hopping windows emit watermark-closed windows equal to batch") {
    val inDir = Files.createTempDirectory("graft-hop-in").toFile
    val ckDir = Files.createTempDirectory("graft-hop-ck").toFile
    val ev = Tables.events(spark, sf).select(col("ts"), col("event_type"), col("value"))
    val cut = ev.select(percentile_approx(col("ts").cast("double"), lit(0.5), lit(100)))
      .head().getDouble(0)
    ev.where(col("ts").cast("double") <= cut).coalesce(1)
      .write.parquet(s"$inDir/chunk=0")
    ev.where(col("ts").cast("double") > cut).coalesce(1)
      .write.parquet(s"$inDir/chunk=1")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = StreamingExtraction.hoppingEventStats(stream)
      .select(unix_micros(col("window_start")).as("win_us"), col("event_type"),
        col("n_events"), round(col("sum_value"), 4).as("sum_value"))
      .writeStream.format("memory").queryName("stream_hop")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_hop")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = StreamingExtraction.hoppingEventStats(ev)
      .select(unix_micros(col("window_start")).as("win_us"), col("event_type"),
        col("n_events"), round(col("sum_value"), 4).as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty, "watermark passage should close and emit windows")
    val diff = streamed -- batch
    assert(diff.isEmpty, s"streamed windows must match their batch twins: $diff")
  }

  test("stream-stream interval join emits rows that match the batch twin") {
    val inDir = Files.createTempDirectory("graft-ssj-in").toFile
    val ckDir = Files.createTempDirectory("graft-ssj-ck").toFile
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    // time-ordered chunks → watermark advances between micro-batches and
    // join state for old clicks is evicted along the way
    val cut = ev.select(percentile_approx(col("ts").cast("double"), lit(0.5), lit(100)))
      .head().getDouble(0)
    ev.where(col("ts").cast("double") <= cut).coalesce(1)
      .write.parquet(s"$inDir/chunk=0")
    ev.where(col("ts").cast("double") > cut).coalesce(1)
      .write.parquet(s"$inDir/chunk=1")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = StreamingExtraction.clickPurchaseJoin(stream)
      .select(col("click_id"), unix_micros(col("pts")).as("pts_us"),
        round(col("pvalue"), 4).as("pvalue"))
      .writeStream.format("memory").queryName("stream_ssj")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_ssj")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = StreamingExtraction.clickPurchaseJoin(ev)
      .select(col("click_id"), unix_micros(col("pts")).as("pts_us"),
        round(col("pvalue"), 4).as("pvalue"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty, "the interval join should emit matches")
    // every streamed match is a true batch match (watermark eviction may
    // legitimately drop boundary matches, never invent them)
    val invented = streamed -- batch
    assert(invented.isEmpty, s"streamed rows must be batch rows: $invented")
    // and the stream must catch the overwhelming majority
    assert(streamed.size >= batch.size * 9 / 10,
      s"streamed ${streamed.size} of ${batch.size} batch matches")
  }

  test("mapGroupsWithState totals accumulate across micro-batches to the batch result") {
    val inDir = Files.createTempDirectory("graft-state-in").toFile
    val ckDir = Files.createTempDirectory("graft-state-ck").toFile
    val raw = Tables.events(spark, sf)
    val ev = raw.select(col("ts"), col("user_id"), col("value"))
    // split by EVENT parity → both chunks hold every user, so batch 2 MUST
    // fold into batch 1's state, not start fresh
    raw.where(col("event_id") % 2 === 0).select(col("ts"), col("user_id"), col("value"))
      .coalesce(1).write.parquet(s"$inDir/chunk=0")
    raw.where(col("event_id") % 2 === 1).select(col("ts"), col("user_id"), col("value"))
      .coalesce(1).write.parquet(s"$inDir/chunk=1")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = StreamingExtraction.runningUserTotals(stream)
      .writeStream.format("memory").queryName("stream_totals")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("update")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // update mode emits a row per (user, batch) — the LAST emission per user
    // is the accumulated state and must equal the batch GROUP BY
    val finalPerUser = spark.table("stream_totals")
      .groupBy(col("user_id")).agg(max(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = ev.groupBy(col("user_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(finalPerUser == batch)
  }

  test("streaming latest-wins snapshot converges to the batch compaction") {
    val inDir = Files.createTempDirectory("graft-snap-in").toFile
    val ckDir = Files.createTempDirectory("graft-snap-ck").toFile
    val log = Tables.events(spark, sf)
      .where(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), (col("event_type") === "click").as("is_del"),
        col("value"))
    // split by EVENT parity → both chunks hold (nearly) every key, so the
    // second micro-batch must fold into existing state, not start fresh
    log.where(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$inDir/chunk=0")
    log.where(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$inDir/chunk=1")
    val stream = spark.readStream.schema(log.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = StreamingExtraction.latestSnapshot(stream)
      .writeStream.format("memory").queryName("stream_snapshot")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("update")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // per-key emissions are monotone in (ts_us, event_id): the argmax over
    // all emissions IS the final state, and must equal q99's batch argmax
    def snapshot(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = df
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("is_del"), col("value"))).as("w"))
      .where(!col("w.is_del"))
      .select(col("user_id"), col("w.ts_us"), col("w.value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = snapshot(spark.table("stream_snapshot"))
    val batch = snapshot(log)
    assert(streamed == batch)
    assert(batch.nonEmpty, "some keys must survive the tombstones (anti-vacuousness)")
    // tombstone semantics are exercised: at least one key's latest op is a
    // delete and is absent from the snapshot
    val allKeys = log.select(col("user_id")).distinct().count()
    assert(batch.size < allKeys, "at least one key must end on a tombstone")
  }

  test("streaming dedup keeps exactly one row per content digest") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-dedup-in").toFile
    val ckDir = Files.createTempDirectory("graft-dedup-ck").toFile
    // 40 docs over 20 distinct texts; duplicates arrive within minutes of the
    // original — inside the watermark, so every one must be dropped
    val rows = (0 until 40).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 2}%02d:00"),
        s"document body ${i % 20}")
    }
    val docs = rows.toDF("doc_id", "ts", "text")
    docs.where(col("doc_id") < 20).coalesce(1).write.parquet(s"$inDir/chunk=0")
    docs.where(col("doc_id") >= 20).coalesce(1).write.parquet(s"$inDir/chunk=1")

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = StreamingExtraction.streamingDedup(stream, watermark = "1 hour")
      .writeStream.format("memory").queryName("stream_dedup")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val kept = spark.table("stream_dedup").collect()
    assert(kept.length == 20, s"expected 20 survivors, got ${kept.length}")
    assert(kept.map(_.getAs[String]("content_md5")).distinct.length == 20)
    // first-arrival wins: chunk 0 (ids 0..19, one per text) processes first,
    // so its rows are exactly the survivors
    assert(kept.map(_.getAs[Long]("doc_id")).sorted.toSeq == (0L until 20L))
  }

  test("streaming LSH candidates accumulate across micro-batches to the batch set") {
    import graft.functions.{TextFunctions => T}
    val inDir = Files.createTempDirectory("graft-lsh-in").toFile
    val ckDir = Files.createTempDirectory("graft-lsh-ck").toFile
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text"))
    // split by id parity → near-dup pairs straddle the micro-batch boundary,
    // so batch 2's arrivals MUST pair against batch 1's bucket state
    docs.where(col("id") % 2 === 0).coalesce(1).write.parquet(s"$inDir/chunk=0")
    docs.where(col("id") % 2 === 1).coalesce(1).write.parquet(s"$inDir/chunk=1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
      .select(col("id"), T.shingles(col("text"), 2).as("shingles"))
    val q = StreamingExtraction.streamingNearDupCandidates(stream, k = 36, bands = 12)
      .writeStream.format("memory").queryName("stream_lsh")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // cumulative streamed candidates (set — multi-band collisions re-emit)
    // must equal the symmetric batch candidate set over the same corpus
    val streamed = spark.table("stream_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val shingled = docs.select(col("id"),
      T.shingles(col("text"), 2).as("shingles"))
    val batch = graft.operators.Dedup.minhashCandidates(shingled, 36, 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"streamed ${streamed.size} != batch ${batch.size}")
    assert(batch.nonEmpty, "the planted near-dups must collide (anti-vacuousness)")
    // cross-boundary accumulation is really exercised: some pair must span
    // the parity split (one even, one odd id)
    assert(streamed.exists { case (a, b) => (a + b) % 2 == 1 },
      "no candidate pair straddles the micro-batch split")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("streaming LSH hot buckets collapse to star pairs under the state cap") {
    import spark.implicits._
    // 4 identical docs all but guarantee every band collides; cap = 2 →
    // ids 1,2 fill the bucket and pair exactly; 3 and 4 overflow and pair
    // against the representative (min id 1) only — bounded state + output.
    // Batch mode exercises the same flatMapGroupsWithState fold (one group
    // call, arrivals sorted ascending), the q46 batch-twin discipline.
    val docs = Seq(1L, 2L, 3L, 4L).map(i => (i, "alpha beta gamma delta"))
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.TextFunctions.shingles(col("text"), 2).as("shingles"))
    val got = StreamingExtraction
      .streamingNearDupCandidates(docs, k = 36, bands = 12, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L)), s"got $got")
  }

  test("streaming LSH hot-bucket representative tracks the minimum across overflow arrivals") {
    import spark.implicits._
    // ids 10,11 fill the bucket (cap=2) in micro-batch 1; 1,2 arrive in
    // micro-batch 2 AFTER overflow. The representative must be the minimum
    // seen over ALL arrivals: 1 stars against the old rep 10 (chaining the
    // two reps into one component), takes over, and 2 stars against 1 —
    // never against the stale stored-member minimum.
    val inDir = Files.createTempDirectory("graft-lshrep-in").toFile
    val ckDir = Files.createTempDirectory("graft-lshrep-ck").toFile
    def chunk(ids: Seq[Long], n: Int): Unit =
      ids.map(i => (i, "alpha beta gamma delta")).toDF("id", "text")
        .coalesce(1).write.parquet(s"$inDir/chunk=$n")
    chunk(Seq(10L, 11L), 0)
    chunk(Seq(1L, 2L), 1)
    val stream = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("text", "string"))
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
      .select(col("id"),
        graft.functions.TextFunctions.shingles(col("text"), 2).as("shingles"))
    val q = StreamingExtraction
      .streamingNearDupCandidates(stream, k = 36, bands = 12, maxBucket = 2)
      .writeStream.format("memory").queryName("stream_lsh_rep")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("stream_lsh_rep").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 11L), (1L, 10L), (1L, 2L)), s"got $got")
  }

  test("streaming decontamination accumulates across micro-batches to the batch survivor set") {
    import graft.functions.{TextFunctions => T}
    val inDir = Files.createTempDirectory("graft-decon-in").toFile
    val ckDir = Files.createTempDirectory("graft-decon-ck").toFile
    val shingled = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), T.shingles(col("text"), 5).as("shingles"))
    val bench = shingled.where(col("id") % 97 === 0).persist()
    // contaminated docs must straddle the micro-batch split for the test to
    // exercise more than one batch's anti-joins
    shingled.where(col("id") % 2 === 0).coalesce(1).write.parquet(s"$inDir/chunk=0")
    shingled.where(col("id") % 2 === 1).coalesce(1).write.parquet(s"$inDir/chunk=1")
    val stream = spark.readStream.schema(shingled.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = StreamingExtraction.streamingDecontaminate(stream, bench)
      .select(col("id"))
      .writeStream.format("memory").queryName("stream_decon")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_decon").collect().map(_.getLong(0)).toSet
    val batch = graft.operators.CorpusOps.decontaminate(shingled, bench)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    bench.unpersist()
    assert(streamed == batch, s"streamed ${streamed.size} != batch ${batch.size}")
    assert(streamed.nonEmpty, "some docs must survive")
    val total = shingled.count()
    assert(streamed.size < total, "some docs must be dropped (anti-vacuousness)")
  }

  test("keyed streaming decontamination emits exactly the batch survivor ids") {
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    val inDir = Files.createTempDirectory("graft-deconk-in").toFile
    val ckDir = Files.createTempDirectory("graft-deconk-ck").toFile
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), T.shingles(col("text"), 5).as("shingles"),
        to_timestamp(lit("2026-01-01 00:00:00")).plus(
          expr("make_interval(0, 0, 0, 0, 0, 0, doc_id)")).as("ts"))
    val bench = docs.select(col("id"), col("shingles"))
      .where(col("id") % 97 === 0).persist()
    val third = docs.count() / 3
    docs.where(col("id") <= third).coalesce(1).write.parquet(s"$inDir/chunk=0")
    docs.where(col("id") > third && col("id") <= 2 * third)
      .coalesce(1).write.parquet(s"$inDir/chunk=1")
    // an empty-shingles doc is clean by definition: batch keeps it (the
    // explode only feeds the contaminated side) and the keyed stream's
    // explode_outer must keep it too — pinned by the set equality below
    // plus the explicit membership assert
    docs.where(col("id") > 2 * third)
      .unionByName(Seq((1000000007L, Seq.empty[String],
        java.sql.Timestamp.valueOf("2026-06-01 00:00:00")))
        .toDF("id", "shingles", "ts"))
      .coalesce(1).write.parquet(s"$inDir/chunk=2")
    Seq((-1L, Seq("zz flush"), java.sql.Timestamp.valueOf("2027-01-01 00:00:00")))
      .toDF("id", "shingles", "ts").coalesce(1).write.parquet(s"$inDir/chunk=3")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = StreamingExtraction
      .streamingDecontaminateKeyed(stream, bench, watermark = "10 minutes")
      .writeStream.format("memory").queryName("stream_deconk")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_deconk").collect()
      .map(_.getLong(0)).filter(_ >= 0L).toSet
    val batch = graft.operators.CorpusOps
      .decontaminate(
        docs.select(col("id"), col("shingles"))
          .unionByName(Seq((1000000007L, Seq.empty[String]))
            .toDF("id", "shingles")),
        bench)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    bench.unpersist()
    assert(streamed == batch, s"streamed ${streamed.size} != batch ${batch.size}")
    assert(streamed.contains(1000000007L),
      "empty-shingles doc must survive the keyed gate (explode_outer)")
    assert(streamed.nonEmpty && streamed.size < docs.count())
  }

  test("streaming line dedup against the batch census equals the batch rebuild") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-ldd-in").toFile
    val ckDir = Files.createTempDirectory("graft-ldd-ck").toFile
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text"),
        // synthetic ascending event time so the watermark closes earlier
        // chunks as later ones arrive
        to_timestamp(lit("2026-01-01 00:00:00")).plus(
          expr("make_interval(0, 0, 0, 0, 0, 0, doc_id)")).as("ts"))
    val census = graft.operators.CorpusOps
      .hotUnits(Tables.documents(spark, sf), col("doc_id"), col("text"),
        unitTokens = 5, minOcc = 2)
      .persist()
    assert(census.count() > 0, "census must be non-trivial (planted boilerplate)")
    val third = docs.count() / 3
    docs.where(col("id") <= third).coalesce(1).write.parquet(s"$inDir/chunk=0")
    docs.where(col("id") > third && col("id") <= 2 * third)
      .coalesce(1).write.parquet(s"$inDir/chunk=1")
    docs.where(col("id") > 2 * third).coalesce(1).write.parquet(s"$inDir/chunk=2")
    // flush chunk: one far-future dummy pushes the watermark past every real
    // document so append mode emits them all; the dummy itself never emits
    Seq((-1L, "zzz flush", java.sql.Timestamp.valueOf("2027-01-01 00:00:00")))
      .toDF("id", "text", "ts").coalesce(1).write.parquet(s"$inDir/chunk=3")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = StreamingExtraction
      .streamingLineDedup(stream, census, unitTokens = 5, watermark = "10 minutes")
      .writeStream.format("memory").queryName("stream_ldd")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_ldd").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .filter(_._1 >= 0L).toSet
    val batch = graft.operators.CorpusOps
      .lineDedup(Tables.documents(spark, sf), col("doc_id"), col("text"),
        unitTokens = 5, minOcc = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    census.unpersist()
    assert(streamed == batch,
      s"streamed ${streamed.size} rows != batch ${batch.size}")
    assert(streamed.exists(r => r._3 < r._2),
      "some doc must actually lose units (anti-vacuousness)")
  }

  test("streaming daily cycle maintains component labels equal to the batch recompute") {
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    import graft.operators.Dedup
    // the q139 contract under STREAMING arrival: candidates from the stateful
    // LSH stream, exact-Jaccard verify against the landing table, and
    // mergeComponents folding each micro-batch's verified delta into the
    // running labeling — after >= 3 micro-batches the maintained labels must
    // equal componentsStar over the batch-verified pair set. Chunking by
    // id % 3 interleaves ids across batches, so cluster BRIDGING (a later
    // pair joining two already-labeled clusters) and label TAKEOVER (a
    // smaller id arriving after its cluster is labeled) are routine.
    val inDir = Files.createTempDirectory("graft-cycle-in").toFile
    val ckDir = Files.createTempDirectory("graft-cycle-ck").toFile
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), T.shingles(col("text"), 2).as("shingles"))
      .localCheckpoint() // the landing table: verify joins read it per batch
    for (c <- 0 until 3)
      docs.where(col("id") % 3 === c).coalesce(1).write.parquet(s"$inDir/chunk=$c")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    var labels = Seq.empty[(Long, Long)].toDF("id", "component")
    var batches = 0
    val q = StreamingExtraction.streamingNearDupCandidates(stream, k = 36, bands = 12)
      .writeStream
      .foreachBatch { (cands: org.apache.spark.sql.DataFrame, _: Long) =>
        val verified = Dedup.verifyJaccard(
          cands.select(col("a"), col("b")).distinct(), docs, 0.8)
        // localCheckpoint per fold: the labeling is read by the NEXT batch's
        // merge — unbroken lineage would re-run every prior fold each day
        labels = Dedup.mergeComponents(labels,
          verified.select(col("a"), col("b"))).localCheckpoint()
        batches += 1
      }
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(batches >= 3, s"need >= 3 micro-batches, got $batches")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.componentsStar(
        Dedup.verifyJaccard(Dedup.minhashCandidates(docs, 36, 12), docs, 0.8)
          .select(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "planted near-dups must cluster (anti-vacuousness)")
    assert(got == batch,
      s"stream-maintained labels != batch recompute: extra=${(got -- batch).take(5)} " +
        s"missing=${(batch -- got).take(5)}")
    // bridging really happened: some component's members arrived in
    // different micro-batches (different id residues mod 3)
    assert(got.groupBy(_._2).exists { case (_, m) => m.map(_._1 % 3).size >= 2 },
      "no component spans micro-batches — the merge path was vacuous")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("micro-batch postings probes against the index equal the one-shot batch probe") {
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    import graft.operators.Similarity
    // the q145 daily cycle under STREAMING arrival: the postings artifact is
    // the static side; each micro-batch of the crawl probes it independently
    // (pairs are new×corpus only — per-doc independent, no cross-batch
    // state), so the accumulated pair set must equal the one-shot probe over
    // the full crawl. This is the operational pattern: land a crawl chunk,
    // probe the standing index, feed the verified pairs to mergeComponents.
    val inDir = Files.createTempDirectory("graft-probe-in").toFile
    val ckDir = Files.createTempDirectory("graft-probe-ck").toFile
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text"))
    val half = (docs.agg(max(col("id"))).head.getLong(0) + 1) / 2
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), explode(T.tokens(col("text"))).as("term"))
    Similarity.writeTfidfPostingsIndex(toks(docs.where(col("id") < half)),
      "cycle_pidx", maxDfDenom = 2, numBuckets = 4)
    try {
      val nw = docs.where(col("id") >= half)
      for (c <- 0 until 3)
        nw.where(col("id") % 3 === c).coalesce(1).write.parquet(s"$inDir/chunk=$c")
      val collected = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
      var batches = 0
      val stream = spark.readStream.schema(nw.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          collected ++= Similarity
            .incrementalTfidfPairsFromIndex(toks(batch), "cycle_pidx",
              minCosPpm = 100000L)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          batches += 1
        }
        .option("checkpointLocation", ckDir.getAbsolutePath)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      assert(batches >= 3, s"need >= 3 micro-batches, got $batches")
      val oneShot = Similarity
        .incrementalTfidfPairsFromIndex(toks(nw), "cycle_pidx",
          minCosPpm = 100000L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(oneShot.nonEmpty, "probe must produce pairs (anti-vacuousness)")
      assert(collected.toSet == oneShot,
        s"micro-batch union ${collected.size} != one-shot ${oneShot.size}")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    } finally {
      spark.sql("DROP TABLE IF EXISTS cycle_pidx")
      spark.sql("DROP TABLE IF EXISTS cycle_pidx_norms")
      spark.sql("DROP TABLE IF EXISTS cycle_pidx_meta")
    }
  }

  test("streaming label consolidation converges to the batch consensus per item") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-lbl-in").toFile
    val ckDir = Files.createTempDirectory("graft-lbl-ck").toFile
    // 120 items × 5 annotators, labels deterministically mixed so the set
    // includes unanimous items, clear majorities, AND 2-2-1 ties (the
    // smallest-label tie-break must match the batch argmax); each
    // annotator's votes land in their own micro-batch, so every item's
    // census accumulates ACROSS batches
    val ann = (0L until 120L).flatMap { item =>
      (0 until 5).map { a =>
        val label =
          if (item % 10 == 0) 1                       // unanimous
          else if (item % 10 == 5) Seq(0, 0, 2, 2, 1)(a) // 2-2-1 tie → 0
          else ((item * 7 + a * a + 3) % 3).toInt     // mixed
        (item, a, label)
      }
    }.toDF("item", "annotator", "label")
    (0 until 5).foreach(a => ann.where(col("annotator") === a)
      .coalesce(1).write.parquet(s"$inDir/chunk=$a"))
    val stream = spark.readStream.schema(ann.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = StreamingExtraction.streamingConsolidateLabels(stream)
      .writeStream.format("memory").queryName("stream_lblcons")
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("update")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // n_votes is monotone per item: the max-votes emission IS the final
    // consensus (update mode re-emits refreshed state each trigger)
    val finalRows = spark.table("stream_lblcons")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("item"))
          .orderBy(col("n_votes").desc, col("top_votes").desc)))
      .where(col("rn") === 1).drop("rn")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
    val batch = graft.operators.Annotations.consolidateLabels(ann)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(finalRows == batch,
      s"stream-final consensus != batch for items ${
        (finalRows.toSet diff batch.toSet).take(3)}")
    // sanity on the planted regimes
    assert(batch(0L)._4, "item 0 must be unanimous")
    assert(batch(5L)._2 == 0, "2-2-1 tie must break to the smallest label")
  }

  test("micro-batch Dawid-Skene refresh equals the batch EM on campaign close") {
    import spark.implicits._
    import graft.operators.Annotations
    // the labeling-operations front door: annotations land in per-annotator
    // micro-batches; each batch folds into the accumulated campaign and EM
    // re-runs over it (the operational daily refresh — EM is a whole-
    // campaign statistic, so the refresh recomputes rather than maintaining
    // incremental state). On campaign close the last refresh must equal the
    // one-shot batch dawidSkene. Campaign: A0/A1 always truth, A2-A4
    // scatter but COINCIDE wrong on items 12 and 25 — majority vote flips
    // there; EM restores the truth on item 12 (the q156 overturn
    // contract), so the equality is proven on a campaign where EM
    // genuinely acts. (Item 25's coincidence survives EM — the learned
    // class-1 confusion row is weaker there — which the equality check
    // covers either way: the refresh must match batch EM's behavior, not
    // an idealized one.)
    val inDir = Files.createTempDirectory("graft-dsem-in").toFile
    val ckDir = Files.createTempDirectory("graft-dsem-ck").toFile
    def truth(i: Long) = (i % 3).toInt
    val ann = ((for (item <- 0L until 30L; a <- 0 until 2)
        yield (item, a, truth(item))) ++
      (for (item <- 0L until 30L; a <- 2 until 5) yield {
        val lab =
          if (item == 12L || item == 25L) (truth(item) + 1) % 3
          else (truth(item) + 1 + (a + item).toInt % 2) % 3
        (item, a, lab)
      })).toDF("item", "annotator", "label")
    (0 until 5).foreach(a => ann.where(col("annotator") === a)
      .coalesce(1).write.parquet(s"$inDir/chunk=$a"))
    var campaign: org.apache.spark.sql.DataFrame = null
    var lastRefresh = Map.empty[Long, (Int, Int, Boolean)]
    var batches = 0
    val stream = spark.readStream.schema(ann.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // localCheckpoint per fold: the next refresh reads the accumulated
        // campaign, not a lineage replaying every prior micro-batch
        campaign = (if (campaign == null) b
                    else campaign.unionByName(b)).localCheckpoint()
        lastRefresh = Annotations.dawidSkene(campaign, nClasses = 3, rounds = 2)
          .collect().map(r => r.getLong(0) ->
            ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
        batches += 1
      }
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(batches >= 3, s"need >= 3 micro-batches, got $batches")
    val batch = Annotations.dawidSkene(ann, nClasses = 3, rounds = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(lastRefresh == batch,
      s"closed-campaign refresh != batch EM: ${
        (lastRefresh.toSet diff batch.toSet).take(3)}")
    // EM genuinely acted: the planted item-12 coincidence was overturned
    assert(batch(12L) == ((truth(12L) + 1) % 3, truth(12L), true),
      s"planted overturn missing: ${batch(12L)}")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("micro-batch preference refresh equals the batch win rates and BT fit on close") {
    import spark.implicits._
    import graft.operators.Preferences
    // the eval-operations twin of the EM-refresh case: duels land in
    // micro-batches (a live pairwise-eval campaign), each batch folds into
    // the accumulated duel log and the win-rate census + Bradley-Terry fit
    // re-run over it — both are whole-campaign statistics, so the refresh
    // recomputes from the models²-row census (cheap at any volume). On
    // campaign close the last refresh must equal the one-shot batch fit.
    val inDir = Files.createTempDirectory("graft-pref-in").toFile
    val ckDir = Files.createTempDirectory("graft-pref-ck").toFile
    val duels = (0L until 300L).map { i =>
      val a = (i % 4).toInt; val b = (a + 1 + (i % (4 - a)).toInt) % 5
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      // planted bias: lo wins ~2/3 of the time, deterministically
      (i, lo, hi, if (i % 3 != 0) lo else hi)
    }.toDF("item", "model_a", "model_b", "winner")
    (0 until 3).foreach(c => duels.where(col("item") % 3 === c)
      .coalesce(1).write.parquet(s"$inDir/chunk=$c"))
    var campaign: org.apache.spark.sql.DataFrame = null
    var lastWr = Set.empty[(Int, Int, Long, Long)]
    var lastBt = Map.empty[Int, Long]
    var batches = 0
    val stream = spark.readStream.schema(duels.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        campaign = (if (campaign == null) b
                    else campaign.unionByName(b)).localCheckpoint()
        lastWr = Preferences.pairwiseWinRates(campaign).collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
        lastBt = Preferences.bradleyTerry(campaign, rounds = 2).collect()
          .map(r => r.getInt(0) -> r.getLong(3)).toMap
        batches += 1
      }
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(batches >= 3, s"need >= 3 micro-batches, got $batches")
    val batchWr = Preferences.pairwiseWinRates(duels).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val batchBt = Preferences.bradleyTerry(duels, rounds = 2).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(lastWr == batchWr, "closed-campaign win rates != batch census")
    assert(lastBt == batchBt, s"closed-campaign BT fit != batch: $lastBt vs $batchBt")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("micro-batch generation-eval refresh equals the batch corpus scorecard on close") {
    import spark.implicits._
    import graft.operators.TextEval
    // the distillation front door (VERDICT r12 #6): (reference, candidate)
    // pairs arrive as a stream of generation outputs; each micro-batch
    // folds into the accumulated eval set and the CORPUS-level scorecard
    // (micro ROUGE + corpus BLEU) re-emits — corpus metrics pool counts,
    // so the refresh recomputes over the accumulated pairs rather than
    // averaging per-batch scores (which would be exactly the
    // mean-of-sentence-BLEUs trap at batch granularity). On close the last
    // refresh must equal the one-shot batch scorecard, proven on a corpus
    // where the batches have deliberately skewed quality (batch 0 perfect,
    // batch 2 heavily degraded) so pooling genuinely differs from
    // averaging.
    val inDir = Files.createTempDirectory("graft-geneval-in").toFile
    val ckDir = Files.createTempDirectory("graft-geneval-ck").toFile
    val docs = Seq(
      (0L, "a b c d e f", "a b c d e f"),   // batch 0: perfect
      (1L, "g h i j k", "g h i j k"),
      (2L, "l m n o p q", "l m n o q"),     // batch 1: one drop
      (3L, "r s t u v", "r s u v"),
      (4L, "w x y z a b", "w q y q b"),     // batch 2: degraded + shorter
      (5L, "c d e f g", "c g")
    ).toDF("id", "reference", "candidate")
    (0 until 3).foreach(c => docs.where(expr("id div 2") === c)
      .coalesce(1).write.parquet(s"$inDir/chunk=$c"))
    var corpus: org.apache.spark.sql.DataFrame = null
    var lastScore: Seq[Any] = null
    var batches = 0
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/chunk=*")
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        corpus = (if (corpus == null) b
                  else corpus.unionByName(b)).localCheckpoint()
        lastScore = TextEval.corpusGenerationEval(corpus)
          .collect().head.toSeq
        batches += 1
      }
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(batches >= 3, s"need >= 3 micro-batches, got $batches")
    val batchScore = TextEval.corpusGenerationEval(docs).collect().head.toSeq
    assert(lastScore == batchScore,
      s"closed-corpus refresh != batch scorecard:\n$lastScore\n$batchScore")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("streaming sequence packing appends placements equal to the batch pack") {
    import spark.implicits._
    import graft.operators.Packing
    // daily-crawl packing: each day's docs (ids above every prior id — the
    // crawl-arrival contract) pack against the RUNNING token total only (a
    // 1-row state), never re-reading prior days. The appended placements
    // must equal the one-shot batch packingPlan over the closed corpus —
    // packing is incremental because the prefix sum needs nothing but
    // baseOffset. Chunk size 8 with uneven day totals forces day boundaries
    // to land mid-chunk, so the baseOffset arithmetic is genuinely
    // exercised (day 2's first doc must continue day 1's half-open chunk).
    val inDir = Files.createTempDirectory("graft-pack-in").toFile
    val ckDir = Files.createTempDirectory("graft-pack-ck").toFile
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, words(5)), (2L, words(6)),          // day 0: 11 tokens
      (10L, words(3)), (11L, words(9)),        // day 1: 12 tokens (starts mid-chunk 1)
      (20L, words(1)), (21L, words(4))         // day 2: 5 tokens
    ).toDF("doc_id", "text")
    (0 until 3).foreach(c => docs.where(expr("doc_id div 10") === c)
      .coalesce(1).write.parquet(s"$inDir/day=$c"))
    var tokTotal = 0L
    var placements: org.apache.spark.sql.DataFrame = null
    var batches = 0
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/day=*")
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val placed = Packing
            .packingPlan(b, chunkTokens = 8, bucketSpan = 4L, baseOffset = tokTotal)
            .localCheckpoint()
          placements = if (placements == null) placed
                       else placements.unionByName(placed).localCheckpoint()
          tokTotal += placed.agg(sum(col("n_tok"))).collect()(0).getLong(0)
          batches += 1
        }
      }
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(batches >= 3, s"need >= 3 micro-batches, got $batches")
    val got = placements.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val want = Packing.packingPlan(docs, chunkTokens = 8, bucketSpan = 4L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want, s"streamed placements != batch pack:\n$got\n$want")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
