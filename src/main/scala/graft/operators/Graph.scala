package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph compute beyond connected components ([[Dedup.components]] /
 * [[Dedup.componentsStar]]): PageRank in SCALED-INTEGER arithmetic.
 *
 * Floating-point PageRank sums contributions in partition order, which makes
 * the low bits run-dependent — unacceptable under this engine's oracle gate.
 * Fixed-point arithmetic fixes that: ranks are longs (1.0 ≡ `scale`), each
 * iteration's contribution is an integer floor division, and long sums are
 * exact and order-free, so the ranks after any number of iterations are
 * bit-identical in any engine (q71's DuckDB twin unrolls the same
 * iterations).
 *
 * Scale posture: one equi-join (pr ⋈ edges on src) + one aggregation
 * (sum by dst) per iteration — both shuffle on node id and both are
 * map-side combined; `localCheckpoint` truncates lineage each round (the
 * components idiom), so plans stay flat for any iteration count. Per-node
 * state is one long; no driver-side anything.
 */
object Graph {

  /**
   * PageRank over a DIRECTED edge list `(src, dst)` with damping
   * `dampNum/dampDen` (default 0.85) in fixed-point (`scale` ≡ 1.0).
   * Every node starts at `scale`; each iteration:
   * `pr'(v) = (scale*(dampDen-dampNum)) div dampDen
   *           + Σ_{u→v} (pr(u)*dampNum) div (dampDen*outdeg(u))`.
   * Nodes with no out-edges contribute nothing (the classic dangling drop —
   * callers wanting symmetric flow should emit both edge directions).
   * Returns `(id, pr)` after exactly `iterations` rounds.
   */
  def pageRankInt(edges: DataFrame, iterations: Int,
                  scale: Long = 1000000L,
                  dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && scale >= 1000 && dampNum < dampDen,
      "pageRankInt needs iterations >= 1, scale >= 1000, damping < 1")
    // Checkpoints.iterative: localCheckpoint by default; the opt-in reliable
    // mode (graft.iterative.reliableCheckpoint) writes rounds to the
    // checkpoint dir so a lost executor can't abort the fixpoint
    val e = Checkpoints.iterative(edges.select(col("src"), col("dst")))
    val nodes = Checkpoints.iterative(
      e.select(col("src").as("id"))
        .unionAll(e.select(col("dst").as("id")))
        .distinct())
    // the denominator (dampDen * outdeg) is static — pre-join it onto the
    // edge list ONCE so each iteration is a single pr ⋈ edges join + one
    // map-side-combined sum, not an extra degree join per round
    val eDen = Checkpoints.iterative(e.join(
      e.groupBy(col("src")).agg((count(lit(1)) * dampDen).as("den")), "src"))
    val base = (scale * (dampDen - dampNum)) / dampDen
    var pr = nodes.select(col("id"), lit(scale).as("pr"))
    for (_ <- 1 to iterations) {
      val contribs = pr.join(eDen, col("id") === col("src"))
        // integer floor division keeps every engine bit-identical
        .select(col("dst"), expr(s"(pr * $dampNum) div den").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      pr = Checkpoints.iterative(
        nodes.join(contribs, nodes("id") === contribs("dst"), "left")
          .select(col("id"), (lit(base) + coalesce(col("c"), lit(0L))).as("pr")))
    }
    pr
  }

  /**
   * Triangle listing over an UNDIRECTED edge list `(u, v)` (self-loop-free;
   * orientation of the input pair is irrelevant) by DEGREE-ORIENTED wedge
   * enumeration: every edge points from its lower-(degree, id) endpoint to
   * the higher, wedges form only between a vertex's out-neighbors, and a
   * closing oriented edge completes the triangle — each triangle is found
   * at exactly ONE vertex (its lowest-rank corner), so no post-dedup is
   * needed. Returns (a, b, c) with a < b < c.
   *
   * Scale posture: out-degree under this orientation is O(√E) on ANY graph
   * (arboricity bound), so the wedge join does Σ outdeg² = O(E^1.5) work —
   * the optimal-listing bound; a hub of degree 10⁶ emits wedges only toward
   * its HIGHER-rank neighbors, never d² pairs. Three hash equi-joins, all
   * map-side prunable; ties in the orientation order break by id.
   *
   * CALLER CONTRACT (the [[Dedup.minhashCandidates]] eager trade): the edge
   * set and its oriented form are each read by several join branches, so by
   * default both materialize via localCheckpoint at construction — an
   * expensive upstream pair pipeline (LSH + verify) runs ONCE, not once per
   * branch (measured 3.5× on q137), at the price of an eager job and pinned
   * blocks the caller frees (Bench/Verify sweep between queries). When the
   * edges come from a PERSISTED artifact ([[Dedup.writePairGraphIndex]]'s
   * pairs table), pass `materialize = false`: the lineage-free parquet scan
   * re-reads for free, so the checkpoint jobs and pinned blocks buy nothing
   * — and the plan stays scan-backed (survives unpersist sweeps and
   * executor loss).
   */
  def triangles(pairs: DataFrame, materialize: Boolean = true): DataFrame = {
    def mat(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val edges = mat(pairs.select(
      least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v")).distinct())
    val dg = edges.select(col("u").as("x"))
      .unionAll(edges.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    val w = edges
      .join(dg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(dg.select(col("x").as("v"), col("d").as("dv")), "v")
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = mat(w.select(
      when(fwd, col("u")).otherwise(col("v")).as("s"),
      when(fwd, col("v")).otherwise(col("u")).as("t"),
      when(fwd, col("dv")).otherwise(col("du")).as("dt")))
    val o1 = oriented.select(col("s"), col("t").as("t1"), col("dt").as("d1"))
    val o2 = oriented.select(col("s"), col("t").as("t2"), col("dt").as("d2"))
    o1.join(o2, Seq("s"))
      .where(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("t1") < col("t2")))
      .join(oriented.select(col("s").as("t1"), col("t").as("t2")), Seq("t1", "t2"))
      .select(array_sort(array(col("s"), col("t1"), col("t2"))).as("tri"))
      .select(element_at(col("tri"), 1).as("a"),
        element_at(col("tri"), 2).as("b"),
        element_at(col("tri"), 3).as("c"))
  }
}
