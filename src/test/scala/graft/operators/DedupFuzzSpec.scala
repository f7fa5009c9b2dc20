package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Randomized differential tests for the newest composite operators, against
 * brute-force Scala references. The planted-case specs (ScaleOpsSpec,
 * CorpusOpsSpec) pin known shapes; these sweeps hunt the shapes nobody
 * planted — tiny vocabularies force heavy window collisions, overlap, and
 * adjacent-span coalescing edge cases, and random pair graphs (including
 * chains past the min-label diameter cap) exercise the clustering choice
 * leakageSafeSplit depends on.
 */
class DedupFuzzSpec extends SparkSpec {

  /** Brute-force duplicateSpans: census every n-window as a plain string,
   * mark window starts whose text occurs >= minOcc corpus-wide (within-doc
   * repeats count), merge overlapping/adjacent [i, i+n) intervals. */
  private def referenceSpans(docs: Seq[(Long, Vector[String])], n: Int,
                             minOcc: Int): Set[(Long, Int, Int)] = {
    val census = new scala.collection.mutable.HashMap[String, Int]()
    for ((_, w) <- docs; i <- 0 to w.length - n)
      census.updateWith(w.slice(i, i + n).mkString(" ")) {
        c => Some(c.getOrElse(0) + 1)
      }
    docs.flatMap { case (id, w) =>
      val starts = (0 to w.length - n)
        .filter(i => census(w.slice(i, i + n).mkString(" ")) >= minOcc)
      // coalesce [i, i+n) runs: a new span opens when start > current end
      val spans = scala.collection.mutable.ListBuffer[(Long, Int, Int)]()
      for (i <- starts) {
        if (spans.nonEmpty && i <= spans.last._3)
          spans.update(spans.size - 1, (id, spans.last._2, i + n))
        else spans += ((id, i, i + n))
      }
      spans
    }.toSet
  }

  test("duplicateSpans equals the brute-force census on random tiny-vocab corpora") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 12) {
      val vocab = (1 to (2 + rnd.nextInt(4))).map(i => s"w$i") // 2-5 words
      val n = 2 + rnd.nextInt(3)                               // window 2-4
      val docs = (1L to (3 + rnd.nextInt(6)).toLong).map { id =>
        id -> Vector.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
      }
      val expected = referenceSpans(docs, n, minOcc = 2)
      import spark.implicits._
      val df = docs.toDF("id", "w")
      val got = Dedup.duplicateSpans(df, n, minOcc = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == expected,
        s"trial $trial (vocab=${vocab.size}, n=$n): got ${got.toSeq.sorted} " +
          s"expected ${expected.toSeq.sorted} docs=$docs")
    }
  }

  test("leakageSafeSplit holds cluster-atomicity on random graphs incl. a 80-chain") {
    val rnd = new Random(42L)
    import spark.implicits._
    for (trial <- 1 to 4) {
      val nIds = 120L
      // random sparse edges + one 80-vertex chain (past components' 50-round
      // diameter cap — the shape that must not abort the split)
      val randomEdges = Seq.fill(30)(
        (rnd.nextLong(nIds), rnd.nextLong(nIds))).filter(e => e._1 != e._2)
      val chain = (20L until 100L).sliding(2).map(s => (s(0), s(1))).toSeq
      val edges = (randomEdges ++ chain).map { case (a, b) =>
        (math.min(a, b), math.max(a, b))
      }.distinct
      val ids = spark.range(nIds).select(col("id").as("doc_id"))
      val pairs = edges.toDF("a", "b")
      val split = CorpusOps.leakageSafeSplit(ids, col("doc_id"), pairs,
        s"fuzz$trial", trainPct = 70, valPct = 15)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(split.size == nIds, "every id assigned exactly once")
      // invariant: both endpoints of every edge share a side (transitively,
      // the whole component does)
      edges.foreach { case (a, b) =>
        assert(split(a) == split(b), s"trial $trial: edge ($a,$b) straddles")
      }
    }
  }
}
