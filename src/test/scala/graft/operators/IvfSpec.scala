package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{VectorFunctions => V}
import graft.queries.Tables

/**
 * IVF-Flat index proofs:
 *  - cell assignment is exactly the driver-side argmax (the index structure
 *    is correct, not just plausible);
 *  - probing ALL cells recovers the exact brute-force result (IVF with
 *    nprobe = nlist IS exhaustive search — the approximation comes only from
 *    probing fewer cells);
 *  - the default nprobe keeps high measured recall on the test corpus;
 *  - a Lloyd step moves centroids to their cell means without changing ids.
 */
class IvfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def corpus = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), V.asDouble(col("embedding")).as("vec"))

  private def queries = corpus.where(col("id") % 100 === 0)

  private lazy val cents = Ivf.selectCentroids(corpus, col("id") % 64 === 0)

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cell assignment equals the driver-side argmax over centroids") {
    val assigned = Ivf.assign(corpus, cents)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    assert(assigned.length == 500)
    assert(assigned.map(_._3).distinct.length > 1, "should use multiple cells")
    assigned.foreach { case (id, vec, cell) =>
      // best (cos DESC, cid ASC) — the expression's struct(cos, -cid) max order
      val expected = cents.map(c => (cosine(vec, c.vec), c.cid))
        .reduceLeft((a, b) => if (b._1 > a._1 || (b._1 == a._1 && b._2 < a._2)) b else a)._2
      assert(cell == expected, s"vector $id assigned to $cell, expected $expected")
    }
  }

  test("probing all cells equals exact brute-force kNN") {
    val exhaustive = Ivf.search(corpus, queries, cents, nprobe = cents.length, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val brute = Similarity.knnBruteForce(corpus, queries, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(brute.nonEmpty)
    assert(exhaustive == brute)
  }

  test("partial probing beats its scan-fraction and recall grows with nprobe") {
    def recallAt(nprobe: Int): Double = {
      val approx = Ivf.search(corpus, queries, cents, nprobe, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val brute = Similarity.knnBruteForce(corpus, queries, 10)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (approx & brute).size.toDouble / brute.size
    }
    val r3 = recallAt(3)
    val r6 = recallAt(6)
    // the synthetic embeddings are nearly unclustered, so the honest bound is
    // "better than proportional": probing 3/8 of the cells must recover well
    // over 3/8 of the true neighbors (measured 0.64 on this corpus — the
    // index adapts even to weak structure), and more probes → more recall
    assert(r3 >= 0.5, s"recall@nprobe=3 $r3")
    assert(r6 >= r3, s"recall must be monotone in nprobe: $r6 < $r3")
    assert(r6 >= 0.8, s"recall@nprobe=6 $r6")
  }

  test("partitionBy(cell) index layout prunes unprobed cells at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toFile.getAbsolutePath
    Ivf.assign(corpus, cents).write.mode("overwrite")
      .partitionBy("cell").parquet(dir)
    val index = spark.read.parquet(dir)
    val probed = Seq(cents.head.cid, cents.last.cid)
    val scan = index.where(col("cell").isin(probed: _*))
    // partition pruning: only the probed cells' directories are read
    val files = scan.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(f => probed.exists(c => f.contains(s"cell=$c"))),
      s"scan read unprobed partitions: ${files.mkString(", ")}")
    // and the pruned read returns exactly the probed cells' vectors
    val expected = Ivf.assign(corpus, cents)
      .where(col("cell").isin(probed: _*)).count()
    assert(scan.count() == expected)
  }

  test("assignTwoLevel matches a driver-side two-level replica at coarseN=2, " +
    "and equals flat assignment when degenerate") {
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // degenerate: coarseN >= nlist reproduces the flat argmax exactly
    val flat = Ivf.assign(corpus, cents).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val degen = Ivf.assignTwoLevel(corpus, cents, coarseN = cents.length)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(degen == flat, "coarseN >= nlist must equal the flat assignment")

    // hierarchical: coarseN = 2 against an independent driver replica
    val got = Ivf.assignTwoLevel(corpus, cents, coarseN = 2).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val coarse = cents.sortBy(_.cid).take(2)
    def best(vec: Array[Double], cs: Seq[Ivf.Centroid]): Ivf.Centroid =
      cs.reduceLeft { (a, b) =>
        val (ca, cb) = (cosine(vec, a.vec), cosine(vec, b.vec))
        if (cb > ca || (cb == ca && b.cid < a.cid)) b else a
      }
    // fine -> nearest coarse, plus coarse self-membership (a coarse key
    // exists even if no fine elects it — the engine guarantees non-empty
    // groups the same way)
    val group = coarse.map(c => c.cid ->
      (cents.filter(f => best(f.vec, coarse).cid == c.cid).toSeq :+ c)
        .distinct.sortBy(_.cid)).toMap
    assert(group.values.map(_.size).sum >= cents.length)
    got.foreach { case (id, cell, ccos) =>
      val vec = rows.find(_._1 == id).get._2
      val cc = best(vec, coarse)
      val fine = best(vec, group(cc.cid))
      assert(cell == fine.cid, s"vector $id -> $cell, expected ${fine.cid}")
      assert(math.abs(ccos - cosine(vec, fine.vec)) < 1e-12)
    }
    // the hierarchy must actually differ somewhere from flat at this corpus
    val twoLevel = got.map(t => (t._1, t._2)).toMap
    assert(cents.length > 2, "fixture precondition")
    assert(twoLevel.keys == flat.keys)
  }

  test("assignTwoLevelData (centroids as data) equals assignTwoLevel exactly, " +
    "broadcast-joined with no corpus shuffle") {
    // hierarchical regime at this fixture: coarseN=2 < nlist
    val expr = Ivf.assignTwoLevel(corpus, cents, coarseN = 2).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val data = Ivf.assignTwoLevelData(corpus, cents, coarseN = 2)
    val got = data.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    // bit-identical: same grouping model, same argmax structs, same cosine
    // kernel — (cell, ccos) must match the when-chain form exactly
    assert(got.toSeq == expr.toSeq)
    // schema/column order parity with assignTwoLevel
    assert(data.columns.toSeq ==
      Ivf.assignTwoLevel(corpus, cents, coarseN = 2).columns.toSeq)
    // plan shape: the model arrives via ONE broadcast join; the corpus never
    // shuffles (no sort-merge join, no corpus-side exchange before the join)
    val plan = data.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"fine stage must join the broadcast model:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle:\n$plan")
    // degenerate regime: identical to the flat argmax (same fast path)
    val degen = Ivf.assignTwoLevelData(corpus, cents, coarseN = cents.length)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val flat = Ivf.assign(corpus, cents).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(degen == flat)
  }

  test("the no-collect table path (centroidTable + *FromTable) equals the " +
    "collected path exactly, in both hierarchy regimes") {
    val centTable = Ivf.centroidTable(corpus, col("id") % 64 === 0)
    // assignment — hierarchical regime (coarseN=2 < nlist)
    for (cn <- Seq(2, cents.length)) {
      val collected = Ivf.assignTwoLevelData(corpus, cents, coarseN = cn)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1)
      val tabled = Ivf.assignTwoLevelDataFromTable(corpus, centTable, coarseN = cn)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1)
      assert(tabled.toSeq == collected.toSeq,
        s"assignment must be bit-identical at coarseN=$cn")
    }
    // schema/column parity
    assert(Ivf.assignTwoLevelDataFromTable(corpus, centTable).columns.toSeq ==
      Ivf.assignTwoLevelData(corpus, cents).columns.toSeq)
    // probes: same (query, cell) set as the literal probeCells explode
    val litProbes = queries.select(col("id"),
        explode(Ivf.probeCells(col("vec"), cents, 3)).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tblProbes = Ivf.probeCellsFromTable(queries, centTable, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tblProbes == litProbes)
    // end-to-end search equality
    val s1 = Ivf.search(corpus, queries, cents, nprobe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val s2 = Ivf.searchFromTable(corpus, queries, centTable, nprobe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(s2 == s1)
    // and the whole path runs without any nlist-sized driver collect: the
    // query plan carries the model through broadcast exchanges only — no
    // LocalRelation of centroid rows (the literal-model fingerprint)
    val plan = Ivf.assignTwoLevelDataFromTable(corpus, centTable, coarseN = 2)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("LocalRelation"),
      s"the table path must not embed a collected model:\n$plan")
    // the bounded broadcast crosses ride a constant-key EQUI join whose key
    // (`pmod(coalesce(size(x), 0), 1)` — Ivf.zeroKey) exists only to keep
    // the planner on BroadcastHashJoin; an optimizer release that learns to
    // fold mod-by-1 would silently degrade every *FromTable path to a
    // nested-loop join, so the physical shape fails LOUDLY here (ADVICE r16)
    for ((nm, df) <- Seq(
      ("assignTwoLevelDataFromTable",
        Ivf.assignTwoLevelDataFromTable(corpus, centTable, coarseN = 2)),
      ("probeCellsFromTable", Ivf.probeCellsFromTable(queries, centTable, 3)))) {
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin"),
        s"$nm: the model cross must plan as BroadcastHashJoin:\n$phys")
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"$nm: the zeroKey equi join folded to a nested loop:\n$phys")
    }
  }

  test("pqIndexFromTable and adcSearchFromCentTable equal the collected PQ path") {
    val centTable = Ivf.centroidTable(corpus, col("id") % 64 === 0)
    val cb = corpus.where(col("id") < 16).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val splits = Seq((1, 32), (33, 32))
    val i1 = Ivf.pqIndex(corpus, cents, cb, splits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val i2 = Ivf.pqIndexFromTable(corpus, centTable, cb, splits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(i2.toSeq == i1.toSeq)
    val a1 = Ivf.adcSearch(Ivf.pqIndex(corpus, cents, cb, splits),
        queries, cents, cb, splits, nprobe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val a2 = Ivf.adcSearchFromCentTable(Ivf.pqIndexFromTable(corpus, centTable, cb, splits),
        queries, centTable, cb, splits, nprobe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a2 == a1)
  }

  test("semanticDedup matches driver-side ground truth: cell-internal clusters, " +
    "least-centroid-affine survivors") {
    val tau = 0.3
    val got = Similarity.semanticDedup(corpus, cents, tau).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got.nonEmpty, "corpus must produce at least one semantic cluster")

    // ground truth recomputed driver-side: assignment argmax, within-cell
    // pairs, union-find closure, (ccos, id)-min survivor
    val assigned = Ivf.assign(corpus, cents).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    val centOf = cents.map(c => c.cid -> c.vec).toMap
    val ccos = assigned.map { case (id, vec, cell) => id -> cosine(vec, centOf(cell)) }.toMap
    val cellOf = assigned.map { case (id, _, cell) => id -> cell }.toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for {
      (_, members) <- assigned.groupBy(_._3)
      Seq((a, va, _), (b, vb, _)) <- members.toSeq.sortBy(_._1).combinations(2)
      if cosine(va, vb) >= tau
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clusters = parent.keys.++(parent.values).toSeq.distinct
      .map(id => find(id) -> id).groupBy(_._1)
      .map { case (root, ms) => root -> ms.map(_._2).sorted }
    assert(clusters.nonEmpty)
    assert(got.keySet == clusters.keySet.map(identity))
    clusters.foreach { case (root, members) =>
      val (cell, keepId, n, memberStr) = got(root)
      assert(members.map(cellOf).distinct == Seq(cell),
        s"cluster $root must live in exactly one cell")
      assert(n == members.length)
      assert(memberStr == members.mkString(","))
      val expectedKeep = members.minBy(id => (ccos(id), id))
      assert(keepId == expectedKeep,
        s"cluster $root survivor $keepId, expected least-affine $expectedKeep")
    }
  }

  test("a Lloyd step moves each centroid to its cell mean, preserving ids") {
    val stepped = Ivf.lloydStep(corpus, cents)
    assert(stepped.map(_.cid).toSeq == cents.map(_.cid).toSeq)
    // manual mean of one non-empty cell
    val assigned = Ivf.assign(corpus, cents)
      .collect().map(r => (r.getSeq[Double](1).toArray, r.getLong(2)))
    val byCell = assigned.groupBy(_._2)
    val (cell, members) = byCell.maxBy(_._2.length)
    val dim = members.head._1.length
    val mean = (0 until dim).map(i => members.map(_._1(i)).sum / members.length)
    val got = stepped.find(_.cid == cell).get.vec
    (0 until dim).foreach(i => assert(math.abs(got(i) - mean(i)) < 1e-9))
    // an empty cell (if any) keeps its previous centroid
    val emptyCells = cents.map(_.cid).filterNot(byCell.keySet)
    emptyCells.foreach { cid =>
      assert(stepped.find(_.cid == cid).get.vec.toSeq ==
        cents.find(_.cid == cid).get.vec.toSeq)
    }
  }

  test("fixed-point Lloyd update replays exactly, and its means track float within quantization") {
    // fpLloydUpdate is the L2/integer twin of lloydStep (which assigns by
    // cosine): verify (1) the distributed update equals a driver-side
    // integer replay BIT-FOR-BIT — the engine-independence claim — and
    // (2) each integer mean is within 2 fixed-point units of the float mean
    // of the same members (one floor per element + one div truncation)
    val fp = corpus.select(col("id"),
      expr("transform(vec, x -> cast(floor(x * 1000000.0d) as bigint))").as("vfp"))
    val seed = fp.where(col("id") < 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    val upd = Ivf.fpLloydUpdate(fp, seed).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getLong(3)))).toMap
    val vecs = corpus.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val fpv = vecs.map { case (id, v) => (id, v.map(x => math.floor(x * 1e6).toLong)) }
    def d2(a: Array[Long], b: Seq[Long]): Long =
      a.indices.map(j => (a(j) - b(j)) * (a(j) - b(j))).sum
    val byCluster = fpv
      .map { case (id, v) => (seed.minBy { case (cid, c) => (d2(v, c), cid) }._1, id, v) }
      .groupBy(_._1)
    assert(byCluster.keySet.size > 1, "seed should split the corpus")
    var checked = 0
    byCluster.foreach { case (cid, rows) =>
      val n = rows.length
      val dims = rows.head._3.length
      (0 until dims).foreach { j =>
        val sum = rows.map(_._3(j)).sum
        val (meanFp, nMembers) = upd((cid, j))
        assert(nMembers == n, s"cluster $cid size")
        assert(meanFp == sum / n, s"cluster $cid dim $j integer mean")
        val floatMean = {
          val ids = rows.map(_._2).toSet
          val mem = vecs.filter(v => ids(v._1))
          mem.map(_._2(j)).sum / mem.length
        }
        assert(math.abs(meanFp / 1e6 - floatMean) <= 2e-6,
          s"cluster $cid dim $j fp-vs-float drift")
        checked += 1
      }
    }
    assert(checked > 0)
  }
}
