package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bpe.learnMerges and CorpusOps.packNextFit against hand-computed and
 * reference-fold truths. */
class BpeSpec extends SparkSpec {

  private def corpus(words: (String, Int)*) = {
    import spark.implicits._
    words.zipWithIndex.map { case ((w, n), i) =>
      (i.toLong, Seq.fill(n)(w).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("learnMerges reproduces the hand-computed Sennrich-style sequence") {
    // vocab low:5 lower:2 newest:6 widest:3. Round-by-round (count desc,
    // pair asc ties): (e,s) 9 — ties (s,t), lex wins; then (es,t) 9;
    // (l,o) 7 — ties (o,w); (lo,w) 7.
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val got = Bpe.learnMerges(docs, rounds = 4, vocabSize = 100)
      .orderBy(col("merge_round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L),
      (3L, "l", "o", 7L), (4L, "lo", "w", 7L)))
  }

  test("merges are greedy-leftmost non-overlapping and exhaust cleanly") {
    // "aaaa"×3: (a,a) occurs 3×/word → 9; the merge must pair up as
    // (aa)(aa) — NOT (aa)(a)(a) — so round 2 finds (aa,aa) 3; round 3 has
    // no pairs left and learning stops early.
    val got = Bpe.learnMerges(corpus("aaaa" -> 3), rounds = 5, vocabSize = 10)
      .orderBy(col("merge_round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "a", 9L), (2L, "aa", "aa", 3L)))
  }

  test("learnMerges equals a driver-side reference BPE on random corpora") {
    // independent in-memory implementation (explicit pair-count map, argmax
    // with the same tie-break, index-walking greedy-leftmost merge) — the
    // string-replace encoding trick must agree with it everywhere
    def reference(vocab: Seq[(Vector[String], Int)], rounds: Int): Seq[(String, String, Long)] = {
      var cur = vocab
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var r = 0
      var done = false
      while (r < rounds && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        cur.foreach { case (seq, cnt) =>
          (0 until seq.length - 1).foreach { i =>
            counts((seq(i), seq(i + 1))) = counts.getOrElse((seq(i), seq(i + 1)), 0L) + cnt
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, rr), c) = counts.toSeq.minBy { case ((l, rr), c) => (-c, l, rr) }
          out += ((l, rr, c))
          cur = cur.map { case (seq, cnt) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < seq.length) {
              if (i < seq.length - 1 && seq(i) == l && seq(i + 1) == rr) { b += (l + rr); i += 2 }
              else { b += seq(i); i += 1 }
            }
            (b.result(), cnt)
          }
          r += 1
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val words = Seq.fill(40)(
        Seq.fill(2 + rnd.nextInt(6))(('a' + rnd.nextInt(3)).toChar).mkString)
      import spark.implicits._
      val docs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
      val got = Bpe.learnMerges(docs, rounds = 6, vocabSize = 1000)
        .orderBy(col("merge_round")).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val vocab = words.groupBy(identity).toSeq
        .map { case (w, g) => (w.toVector.map(_.toString), g.size) }
      assert(got == reference(vocab, 6), s"corpus: ${words.mkString(" ")}")
    }
  }

  test("tokenize segments with the merge table in learning order") {
    import spark.implicits._
    // merges (e,s) then (es,t): newest → n|e|w|est (4), widest → w|i|d|est
    // (4), low → l|o|w (3), a → a (1, single-char words take no merges);
    // non-letters separate words
    val docs = Seq((1L, "newest widest"), (2L, "low a"), (3L, "42 ...")).toDF("doc_id", "text")
    val got = Bpe.tokenize(docs, Seq(("e", "s"), ("es", "t")))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 8L), (2L, 2L, 4L), (3L, 0L, 0L)))
  }

  test("mergeArtifact is content-addressed: a reused key cannot serve stale merges") {
    import spark.implicits._
    // same cache key, different corpus bytes behind it (the rewritten-path
    // scenario): the content fingerprint must force a re-learn
    val corpusA = Seq.fill(20)("aa ab aa ab aa").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val corpusB = Seq.fill(20)("zz zy zz zy zz").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val key = s"stale-check-${System.identityHashCode(this)}"
    val m1 = Bpe.mergeArtifact(corpusA, rounds = 1, vocabSize = 100, key)
    val m2 = Bpe.mergeArtifact(corpusB, rounds = 1, vocabSize = 100, key)
    assert(m1.nonEmpty && m2.nonEmpty)
    assert(m1 != m2, "rewritten corpus under the same key must re-learn")
    // identical content under the same key IS served from the cache (same
    // object back — computeIfAbsent hit, not a re-learn)
    val m3 = Bpe.mergeArtifact(corpusA.select(col("doc_id"), col("text")),
      rounds = 1, vocabSize = 100, key)
    assert(m3 eq m1)
  }

  test("packNextFit matches the sequential reference fold (waste semantics)") {
    import spark.implicits._
    // tokens span 1..700 so some docs alone exceed the 512 budget; 8 workers
    // over 4 shuffle partitions forces multiple workers per partition (the
    // state-reset path in the mapPartitions fold)
    val rows = (0L until 200L).map(id => (id, (id * 37 % 700 + 1).toInt))
    val df = rows.toDF("doc_id", "n")
    val got = CorpusOps.packNextFit(df, col("doc_id"), col("n").cast("long"),
        tokensPerBin = 512, nWorkers = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val expected = rows.groupBy(_._1 % 8).toSeq.flatMap { case (w, ds) =>
      var bin = 0L; var fill = Long.MaxValue
      ds.sortBy(_._1).zipWithIndex.map { case ((id, t), i) =>
        if (i == 0) { bin = 0L; fill = t.toLong }
        else if (fill + t <= 512) fill += t
        else { bin += 1; fill = t.toLong }
        (id, w, bin, t.toLong)
      }
    }.sortBy(_._1)
    assert(got.toSeq == expected)
    // a doc larger than the budget owns a bin and the next doc opens a new one
    assert(rows.exists(_._2 > 512))
  }
}
