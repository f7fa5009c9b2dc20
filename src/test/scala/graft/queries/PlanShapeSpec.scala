package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

import graft.SparkSpec
import graft.SparkEntry

/** The scale claims PLANS.md records, as executable assertions: a regression
 * that reintroduces a nested-loop join or a window where a bounded-heap
 * aggregate belongs fails HERE, not in a 100 TB incident. Plans are built at
 * sf0.001 — plan SHAPE is what matters, not the data volume. */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def nodes(p: SparkPlan): Seq[String] = {
    val b = Seq.newBuilder[String]
    def walk(n: SparkPlan): Unit = {
      b += n.nodeName
      n.children.foreach(walk)
      n.subqueries.foreach(walk)
    }
    walk(p)
    b.result()
  }

  private def assertNever(name: String, banned: String*): Unit = {
    val ns = nodes(planOf(name))
    banned.foreach { bad =>
      assert(!ns.exists(_.contains(bad)),
        s"$name must not plan a $bad (got: ${ns.distinct.mkString(", ")})")
    }
  }

  test("LSH-candidate paths never plan a nested-loop join") {
    // each of these claims 'candidates come from equi-joins, never all-pairs'
    Seq("q32_dedup_minhash_lsh", "q34_embed_neardup", "q51_fuzzy_pairs",
      "q36_ann_lsh").foreach(assertNever(_, "BroadcastNestedLoopJoin", "CartesianProduct"))
  }

  test("bounded-heap aggregates keep windows out of top-k and sketch paths") {
    // topk_by/mink_by/bottomk_distinct replace Exchange+Sort+Window
    Seq("q35_knn_cosine", "q54_kmv_distinct", "q57_sample_bounded",
      "q63_inverted_index").foreach(assertNever(_, "Window"))
  }

  test("composed temporal joins never plan a join on the time inequality") {
    // the as-of formulations are union+window — no join operator at all
    Seq("q52_asof_join", "q69_asof_forward").foreach(
      assertNever(_, "BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin"))
  }

  test("scalar pipelines stay shuffle-free up to their final sort") {
    // q62/q64 are scan-speed claims: nothing but scan, project, and the
    // ORDER BY exchange may appear — in particular no aggregate, no join
    Seq("q62_repetition", "q64_quantize_embed").foreach(
      assertNever(_, "Join", "HashAggregate", "Window"))
  }
}
