package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import graft.queries.Tables

/**
 * The operators composed as ONE curation pipeline — the workflow a user of
 * this library actually runs: quality filter → inter-doc paragraph dedup →
 * MinHash near-dup dedup (survivor per cluster) → leakage-safe split →
 * context-window chunking → next-fit packing. Each stage consumes the
 * previous stage's output DataFrame directly (no materialization between
 * stages — the whole chain is one lazy plan until the final action), and the
 * spec asserts the row-accounting invariants that make the pipeline sound:
 * monotone doc-set shrinkage, exactly one survivor per duplicate cluster,
 * split-partition totality, window/token conservation, and bin-capacity
 * respect.
 */
class CurationPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def ids(df: DataFrame, c: String = "doc_id"): Set[Long] =
    df.select(col(c)).collect().map(_.getLong(0)).toSet

  test("quality → paragraph-dedup → near-dup survivors → split → chunk → pack") {
    val docs = Tables.documents(spark, sf)
    val all = ids(docs)

    // 1. quality floor (q27's score): keep docs with >= 10 tokens
    val scored = docs.select(col("doc_id"), col("text"), T.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 10)
    val afterQuality = ids(scored)
    assert(afterQuality.subsetOf(all) && afterQuality.nonEmpty)

    // 2. inter-doc paragraph dedup (q106's rule): drop docs whose duplicated
    //    8-word-chunk token mass reaches 90% (loose — this corpus's planted
    //    near-dups should survive to be caught by stage 3 instead)
    val ch = scored
      .select(col("doc_id"), size(col("w")).as("n"), col("w"),
        explode(expr("sequence(0, size(w) - 1, 8)")).as("st"))
      .select(col("doc_id"),
        least(lit(8), col("n") - col("st")).as("ntok"),
        md5(array_join(slice(col("w"), col("st") + 1, lit(8)), " ")).as("dg"))
    val census = ch.groupBy(col("dg")).agg(count(lit(1)).as("occ"))
    val parKeep = ch.join(census, "dg")
      .groupBy(col("doc_id"))
      .agg(sum(col("ntok")).as("tot"),
        sum(when(col("occ") >= 2, col("ntok")).otherwise(0L)).as("dup"))
      .where(expr("(1000000 * dup) div tot < 900000"))
    val kept = scored.join(parKeep.select(col("doc_id")), "doc_id")
    val afterPar = ids(kept)
    assert(afterPar.subsetOf(afterQuality))

    // 3. near-dup dedup: LSH candidates → exact-Jaccard verify → components
    //    → keep the minimum id per cluster; docs in no cluster all survive
    val shingled = kept.select(col("doc_id").as("id"),
      T.shingles(col("text"), 2).as("shingles"))
    val pairs = Dedup.verifyJaccard(
      Dedup.minhashCandidates(shingled, k = 24, bands = 12), shingled, 0.8)
    val clustered = Dedup.components(pairs.select(col("a"), col("b")))
    val clusterIds = ids(clustered, "id")
    val survivors = clustered.groupBy(col("component"))
      .agg(min(col("id")).as("doc_id")).select(col("doc_id"))
      .unionByName(kept.select(col("doc_id"))
        .where(!col("doc_id").isin(clusterIds.toSeq: _*)))
    val afterDedup = ids(survivors)
    assert(afterDedup.subsetOf(afterPar))
    // exactly one survivor per cluster, and clusters are non-trivial here
    val nClusters = clustered.select(col("component")).distinct().count()
    assert(nClusters > 0, "the corpus plants near-dups; stage 3 must find them")
    assert(afterDedup.size == (afterPar.size - clusterIds.size + nClusters).toInt)

    // 4. leakage-safe content-hash split (q101's rule) PARTITIONS the corpus
    val split = kept.join(survivors, "doc_id")
      .select(col("doc_id"), col("w"),
        (T.hash60(concat(lit("split:"), md5(col("text")))) % 100).as("bucket"))
      .select(col("doc_id"), col("w"),
        when(col("bucket") < 90, "train").when(col("bucket") < 95, "val")
          .otherwise("test").as("split"))
    assert(split.count() == afterDedup.size)
    assert(ids(split.where(col("split").isNotNull)) == afterDedup)

    // 5. context windows (q104's 64/48) on the train split: token accounting
    val train = split.where(col("split") === "train")
    val wins = train
      .select(col("doc_id"), size(col("w")).as("n"), col("w"),
        explode(expr("sequence(0, size(w) - 1, 48)")).as("start"))
      .select(col("doc_id"), least(lit(64), col("n") - col("start")).as("n_tok"))
    val nTrainDocs = train.count()
    assert(wins.groupBy(col("doc_id")).count().count() == nTrainDocs,
      "every train doc must produce at least one window")
    // stride 48 < size 64 ⇒ windows cover every token at least once
    val tokTotal = train.select(sum(size(col("w")))).collect()(0).getLong(0)
    val winTotal = wins.select(sum(col("n_tok"))).collect()(0).getLong(0)
    assert(winTotal >= tokTotal, "overlapping windows must cover all tokens")

    // 6. next-fit packing of the windows into 256-token bins
    val packed = CorpusOps.packNextFit(
      wins.select(monotonically_increasing_id().as("doc_id"), col("n_tok")),
      col("doc_id"), col("n_tok"), tokensPerBin = 256, nWorkers = 4)
    assert(packed.count() == wins.count(), "packing must assign every window")
    val overfull = packed.groupBy(col("worker"), col("bin"))
      .agg(sum(col("n_tokens")).as("t")).where(col("t") > 256).count()
    assert(overfull == 0, "no bin may exceed its token budget")
  }
}
