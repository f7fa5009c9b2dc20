package graft.queries

import org.apache.spark.storage.StorageLevel

import graft.{SparkEntry, SparkSpec}

/**
 * The bench harness seeds the session cache with the shared shingle frames
 * (`PipelineQueries.benchCacheSeeds`) so per-query times measure the operator,
 * not repeated shingle extraction. That only works if Spark's CacheManager
 * actually substitutes the persisted frame into the queries' analyzed plans —
 * a silent plan mismatch (e.g. a drifted filter or projection in either copy)
 * would make the seed dead weight. This spec pins the substitution AND that a
 * seeded run returns byte-identical results.
 */
class BenchSeedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("cache seeds substitute into the hot dedup queries' plans; results identical") {
    // one probe per seed variant, each using its shingle frame WITHOUT an
    // intervening localCheckpoint (a checkpointed frame becomes a LogicalRDD,
    // so substitution — though it still serves the checkpoint's own
    // materialization — is invisible in the final plan): q32's verify side
    // reads shingles_n2, q33 reads shingles_n2_mod3, q44 reads shingles_n5.
    val probe = Seq("q32_dedup_minhash_lsh", "q33_dedup_simhash", "q44_decontaminate")
    // unseeded reference results (sorted rows as strings — full-value compare)
    val before = probe.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).sorted.toSeq
    }.toMap

    val seeds = PipelineQueries.benchCacheSeeds(spark, sf)
    seeds.foreach { case (_, df) => df.persist(StorageLevel.MEMORY_AND_DISK).count() }
    try {
      for (n <- probe) {
        val df = SparkEntry.queries(n)(spark, sf)
        val plan = df.queryExecution.withCachedData.toString
        assert(plan.contains("InMemoryRelation"),
          s"$n: seeded session did not substitute the cached shingle frame:\n$plan")
        assert(df.collect().map(_.toString).sorted.toSeq == before(n),
          s"$n: seeded results differ from unseeded")
      }
    } finally seeds.foreach { case (_, df) => df.unpersist(blocking = true) }
  }
}
