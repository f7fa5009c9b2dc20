package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.queries.Tables

/**
 * The persisted-index round-trips the operator docstrings promise: the LSH
 * band table and the IVF-PQ code table written as on-disk artifacts (bucketed
 * / cell-partitioned), reloaded, and SERVED — with the corpus side of every
 * probe plan exchange-free (bands) or partition-pruned (PQ), and results
 * identical to the in-session checkpoint paths. This is the daily-crawl
 * posture: pay banding/coding + one layout shuffle at index time, then every
 * later increment probes the artifact without touching the corpus again —
 * and unlike a localCheckpoint, the artifact survives the session and loses
 * nothing on executor failure.
 */
class PersistedIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** At sf0.001 every side fits the broadcast threshold and the planner
   * (correctly) prefers broadcast joins, which bypass bucketing — the
   * co-location property under test is the >10 MB regime, so force the
   * shuffle path (the BucketingSpec convention). */
  private def withoutAutoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def allDocs = Tables.documents(spark, sf)
    .select(col("doc_id").as("id"), T.shingles(col("text"), 2).as("shingles"))

  test("persisted band index serves incremental candidates exchange-free on the corpus side") {
    val all = allDocs
    val half = (all.agg(max(col("id"))).head.getLong(0) + 1) / 2
    val newDocs = all.where(col("id") >= half)
    val oldDocs = all.where(col("id") < half)
    Dedup.writeBandIndex(oldDocs, "pidx_bands", k = 36, bands = 12, numBuckets = 8)
    try {
      // value identity: the artifact path must equal the in-session path
      val served = Dedup
        .incrementalCandidatesFromIndex(newDocs, "pidx_bands", 36, 12)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val inSession = Dedup.incrementalCandidates(newDocs, oldDocs, 36, 12)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(served.nonEmpty, "split corpus should produce candidates")
      assert(served == inSession)

      // the hot-bucket census over the artifact is bucket-local: grouping
      // keys equal the bucket columns, so NO exchange anywhere in the plan
      val census = spark.table("pidx_bands")
        .groupBy(col("band"), col("band_key"))
        .agg(count(lit(1)).as("n"))
      val censusPlan = census.queryExecution.executedPlan.toString
      assert(!censusPlan.contains("Exchange"),
        s"band-index census must not shuffle:\n$censusPlan")

      // full serving plan: the small new side shuffles to the bucket layout
      // (twice — once per corpus slice join) and the final distinct adds one
      // more; the corpus side contributes ZERO (a shuffled census/size-join
      // would add at least two more)
      withoutAutoBroadcast {
        val plan = Dedup
          .incrementalCandidatesFromIndex(newDocs, "pidx_bands", 36, 12)
          .queryExecution.executedPlan.toString
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
        assert(exchanges <= 3,
          s"corpus side must stay exchange-free ($exchanges exchanges):\n$plan")
      }
    } finally spark.sql("DROP TABLE IF EXISTS pidx_bands")
  }

  test("persisted PQ index serves ADC search identically, reading only probed cells") {
    val corpus = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), V.asDouble(col("embedding")).as("vec"))
    val coarse = Ivf.selectCentroids(corpus, col("id") % 64 === 0)
    val cb = corpus.where(col("id") < 16).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val splits = Seq((1, 32), (33, 32))
    val index = Ivf.pqIndex(corpus, coarse, cb, splits)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-idx")
      .toFile.getAbsolutePath
    Ivf.writePqIndex(index, dir)

    val queries = corpus.where(col("id") % 100 === 0)
    val served = Ivf
      .adcSearchFromIndex(dir, queries, coarse, cb, splits, nprobe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val inSession = Ivf.adcSearch(index, queries, coarse, cb, splits, 3, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(served.nonEmpty)
    assert(served == inSession)

    // the artifact read must touch ONLY the probed cells' partition files,
    // and probing must be a strict subset of the cells (else vacuous)
    val probed = queries
      .select(explode(Ivf.probeCells(col("vec"), coarse, 3)).as("cell"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(probed.size < coarse.length,
      s"probed ${probed.size} of ${coarse.length} cells — pruning is vacuous")
    val files = spark.read.parquet(dir)
      .where(col("cell").isin(probed.toSeq: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty)
    // full path segment, not substring: "cell=6" must not match "cell=64/"
    assert(files.forall(f => probed.exists(c => f.contains(s"/cell=$c/"))),
      s"scan read unprobed partitions: ${files.mkString(", ")}")
  }
}
