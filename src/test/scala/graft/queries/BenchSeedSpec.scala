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
    // one probe per seed variant whose final plan can still SHOW the
    // substitution — i.e. the query reads its shingle frame WITHOUT an
    // intervening localCheckpoint (a checkpointed frame becomes a
    // LogicalRDD, so substitution — though it still serves the
    // checkpoint's own materialization job — is invisible afterwards):
    // q32's verify side reads shingles_n2, q44 reads shingles_n5. Since
    // the r15 q33 rework EVERY shingles_n2_mod3 consumer (q31/q33/q92/
    // q112/q141) checkpoints at construction, so that seed's substitution
    // is construction-time only — same CacheManager mechanism, no final
    // plan to pin it in; the value-identity half still covers q33 below.
    val probe = Seq("q32_dedup_minhash_lsh", "q44_decontaminate")
    // value-identity additionally covers the mod3 seed's construction-time
    // consumer (q33's eager signature checkpoint builds FROM the seed)
    val valueProbe = probe :+ "q33_dedup_simhash"
    // unseeded reference results (sorted rows as strings — full-value compare)
    val before = valueProbe.map { n =>
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
      }
      for (n <- valueProbe)
        assert(SparkEntry.queries(n)(spark, sf)
            .collect().map(_.toString).sorted.toSeq == before(n),
          s"$n: seeded results differ from unseeded")
    } finally seeds.foreach { case (_, df) => df.unpersist(blocking = true) }
  }
}
