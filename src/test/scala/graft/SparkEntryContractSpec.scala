package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract, asserted: every query is oracle-gated (a missing
 * oracle silently downgrades that query to a rows-only check), names follow
 * the qNN prefix convention the artifacts sort by, and the two maps can
 * never drift apart. */
class SparkEntryContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries missing an oracle: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"orphan oracles: ${o.diff(q).toSeq.sorted}")
  }

  test("query names are unique qNN_ identifiers with no number collisions") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.forall(_.matches("q\\d{2}_[a-z0-9_]+")),
      s"non-conforming names: ${names.filterNot(_.matches("q\\d{2}_[a-z0-9_]+"))}")
    val numbers = names.map(_.take(3))
    assert(numbers.distinct.size == numbers.size,
      s"duplicate query numbers: ${numbers.diff(numbers.distinct).distinct}")
  }

  test("every oracle is non-empty SQL touching at least one known table") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(tables.exists(t => sql.contains(t)),
        s"$name: oracle references no known table")
    }
  }
}
