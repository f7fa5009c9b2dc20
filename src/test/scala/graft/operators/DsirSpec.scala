package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Persisted-scorer contract for DSIR: the ratio table is a bounded artifact
 * learned once; scoring is a pure function of (features, artifact) — so a
 * NEW pool scores against a saved table without the training corpora, and
 * the integer arithmetic replays exactly on the driver.
 */
class DsirSpec extends SparkSpec {

  test("ratio table and scores replay the fixed-point formula exactly") {
    import spark.implicits._
    // 4 docs, 2 target / 2 raw; tiny bucket space forces collisions so the
    // conditional aggregation is actually exercised across labels
    val docs = Seq(
      (1L, "en", "good text here"),
      (2L, "en", "good text again"),
      (3L, "xx", "good text here"),
      (4L, "xx", "bad words only")).toDF("id", "lang", "text")
    val fb = Dsir.hashedBigrams(docs, buckets = 8, salt = "t:")
    val feats = fb.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every doc has 3 tokens -> 2 bigram occurrences, all columns carried
    assert(feats.length == 8)
    assert(feats.forall { case (_, lang, b) => (lang == "en" || lang == "xx") && b >= 0 && b < 8 })
    val ratios = Dsir.ratioTable(fb.withColumn("is_target", col("lang") === "en"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // driver replay of the +1-smoothed fixed-point ratio, raw-only buckets kept
    val byBucket = feats.groupBy(_._3)
    byBucket.foreach { case (b, rows) =>
      val tgt = rows.count(_._2 == "en").toLong
      val raw = rows.count(_._2 == "xx").toLong
      if (raw > 0) assert(ratios(b) == (1000000L * (tgt + 1)) / (raw + 1), s"bucket $b")
      else assert(!ratios.contains(b), s"bucket $b should be dropped")
    }
    val scores = Dsir.score(fb.where(col("lang") === "xx"),
        Dsir.ratioTable(fb.withColumn("is_target", col("lang") === "en")))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val expected = feats.filter(_._2 == "xx").groupBy(_._1).map { case (id, rows) =>
      id -> (rows.length.toLong, rows.map(r => ratios.getOrElse(r._3, 0L)).sum)
    }
    assert(scores.keySet == expected.keySet)
    expected.foreach { case (id, (n, w)) =>
      assert(scores(id) == ((n, w)), s"doc $id")
    }
  }

  test("a saved ratio table re-scores a new pool without the training corpora") {
    import spark.implicits._
    val train = Seq(
      (1L, true, "alpha beta gamma"),
      (2L, false, "alpha beta delta")).toDF("id", "is_target", "text")
    val fb = Dsir.hashedBigrams(train, buckets = 16, salt = "t:")
    // "persist" the artifact: collect + rebuild, severing lineage to train
    val saved = Dsir.ratioTable(fb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("b", "r_fp")
    // a brand-new pool, including a doc whose bigrams the artifact never saw
    val pool = Seq((10L, "alpha beta gamma"), (11L, "omega psi chi"))
      .toDF("id", "text")
    val pf = Dsir.hashedBigrams(pool, buckets = 16, salt = "t:")
    val scores = Dsir.score(pf, saved)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // doc 10 shares the "alpha beta" bigram with training -> positive weight
    assert(scores.contains(10L) && scores(10L) > 0L)
    // a doc scores iff at least one of its buckets exists in the artifact
    // (unknown-feature docs drop at the broadcast join, the DSIR contract)
    val savedBuckets = saved.collect().map(_.getLong(0)).toSet
    val doc11Buckets = pf.where(col("id") === 11L)
      .collect().map(_.getLong(1)).toSet
    assert(scores.contains(11L) == doc11Buckets.exists(savedBuckets))
  }
}
