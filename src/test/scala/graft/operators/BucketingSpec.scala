package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The co-location claim behind CorpusOps.writeBucketed, proven on plans:
 * equi-joins and aggregations between tables bucketed on the join key read
 * co-located buckets and plan NO shuffle — the pay-once-at-write technique
 * that removes the dominant exchange from every pipeline rerun at 100 TB. */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Run `body` with auto-broadcast off: at sf0.001 every table fits the
   * broadcast threshold and the planner (correctly) prefers a broadcast
   * join, which bypasses bucketing entirely — the co-location property
   * under test is the >10 MB-per-side regime, so force the shuffle path. */
  private def withoutAutoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("join and aggregation on the bucket key plan no shuffle at all") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    CorpusOps.writeBucketed(
      docs.select(col("doc_id"), col("source"), col("n_chars")),
      "bspec_docs", "doc_id", 8)
    CorpusOps.writeBucketed(
      docs.select(col("doc_id"), length(col("text")).as("text_len")),
      "bspec_stats", "doc_id", 8)
    try withoutAutoBroadcast {
      val a = spark.table("bspec_docs")
      val b = spark.table("bspec_stats")
      val joined = a.join(b, "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must not shuffle:\n$plan")

      val agg = a.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"aggregation on the bucket key must not shuffle:\n$aggPlan")

      // and the no-shuffle plan is still the CORRECT join
      val bucketed = joined.orderBy(col("doc_id"))
        .collect().map(_.toSeq).toSeq
      val plain = docs.select(col("doc_id"), col("source"), col("n_chars"))
        .join(docs.select(col("doc_id"), length(col("text")).as("text_len")), "doc_id")
        .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      assert(bucketed == plain)
      assert(bucketed.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_docs")
      spark.sql("DROP TABLE IF EXISTS bspec_stats")
    }
  }

  test("a join against a NON-bucketed side shuffles only that side") {
    CorpusOps.writeBucketed(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("source")),
      "bspec_one_side", "doc_id", 8)
    try withoutAutoBroadcast {
      val stats = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("n_chars"))
      val plan = spark.table("bspec_one_side").join(stats, "doc_id")
        .queryExecution.executedPlan.toString
      // exactly one exchange: the unbucketed probe side repartitions to the
      // bucket layout; the bucketed side never moves
      assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
      assert(!plan.contains("BroadcastExchange"))
    } finally spark.sql("DROP TABLE IF EXISTS bspec_one_side")
  }

  test("staged swap: a crashed rebuild leaves the prior artifact intact and recoverable") {
    import spark.implicits._
    def vals = spark.table("bspec_swap").collect().map(_.getLong(1)).toSet
    CorpusOps.writeBucketed(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      "bspec_swap", "k", 4)
    try {
      assert(vals == Set(10L, 20L))
      // simulate a rebuild killed mid-write: a stale staging table (and its
      // directory) survive — the SERVED artifact must be untouched
      Seq((1L, -1L)).toDF("k", "v").write.format("parquet")
        .bucketBy(4, "k").sortBy("k").mode("overwrite")
        .saveAsTable("bspec_swap__staging")
      assert(vals == Set(10L, 20L), "crashed staging must not affect the table")
      // the next rebuild reclaims the stale staging and swaps in v2 whole
      CorpusOps.writeBucketed(Seq((1L, 11L), (2L, 21L)).toDF("k", "v"),
        "bspec_swap", "k", 4)
      assert(vals == Set(11L, 21L))
      assert(!spark.catalog.tableExists("bspec_swap__staging"),
        "staging must not survive a successful swap")
      // bucketing metadata survives the RENAME: the key-join still plans no
      // exchange on the artifact side
      withoutAutoBroadcast {
        val probe = Seq((1L, 0L)).toDF("k", "p")
        val plan = spark.table("bspec_swap").join(probe, "k")
          .queryExecution.executedPlan.toString
        assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_swap")
      spark.sql("DROP TABLE IF EXISTS bspec_swap__staging")
    }
  }
}
