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
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")),
      s"non-conforming names: ${names.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+"))}")
    val numbers = names.map(_.takeWhile(_ != '_'))
    assert(numbers.distinct.size == numbers.size,
      s"duplicate query numbers: ${numbers.diff(numbers.distinct).distinct}")
  }

  test("no oracle ships an uncast sum() — the DuckDB HUGEINT driver-hash trap") {
    // DuckDB widens an integer sum() to HUGEINT (Arrow decimal128); the
    // driver's value hash is type-sensitive, so a widened sum that reaches an
    // output column fails hash_match even when every value is equal (the r3
    // q63/q67/q72/q81 regression). Rule: every `sum(` in an oracle must sit
    // inside a CAST(...) or round(...) span. Queries where the widened value
    // is provably consumed internally (grouping key, ::DOUBLE division, or
    // re-cast before the final projection) are audited exceptions below;
    // tools/compare_oracle.py's Arrow-schema gate backstops the audit.
    val audited = Map(
      "q40_sessionize" -> "window sum(brk) is the session grouping key only",
      "q68_histogram_quantiles" -> "cum/n consumed via ::DOUBLE division; n re-CAST in final select",
      "q71_pagerank" -> "fixed-point pr re-CAST AS BIGINT in final select",
      "q61_hll_distinct" -> "s_present consumed via ::DOUBLE division",
      "q76_hll_merge" -> "s_present consumed via ::DOUBLE division",
      "q78_kmv_merge" -> "sum feeds the estimator's ::DOUBLE division"
    )

    // Balanced-paren spans of `fn(...)` calls, case-insensitive; whitespace
    // between the name and '(' is legal SQL and must not evade the gate.
    def callSpans(sql: String, fn: String): Seq[(Int, Int)] = {
      val lower = sql.toLowerCase
      val out = Seq.newBuilder[(Int, Int)]
      var i = lower.indexOf(fn)
      while (i >= 0) {
        val wordStart = i == 0 || !Character.isLetterOrDigit(lower(i - 1)) && lower(i - 1) != '_'
        var j = i + fn.length
        while (j < sql.length && sql(j).isWhitespace) j += 1
        if (wordStart && j < sql.length && sql(j) == '(') {
          var depth = 0
          var end = -1
          while (j < sql.length && end < 0) {
            sql(j) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) end = j
              case _ =>
            }
            j += 1
          }
          if (end > 0) out += ((i, end))
        }
        i = lower.indexOf(fn, i + 1)
      }
      out.result()
    }

    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val safe = callSpans(sql, "cast") ++ callSpans(sql, "round")
      val bare = callSpans(sql, "sum").filterNot { case (s, _) =>
        safe.exists { case (cs, ce) => cs < s && s < ce }
      }
      if (bare.nonEmpty && !audited.contains(name))
        Some(s"$name: uncast sum( at offsets ${bare.map(_._1).mkString(",")}")
      else None
    }
    assert(offenders.isEmpty,
      "oracles with a sum() outside any CAST/round span (add CAST(... AS BIGINT) " +
        "or an audited-exception entry):\n  " + offenders.mkString("\n  "))

    val staleAudits = audited.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(staleAudits.isEmpty, s"audited exceptions for unknown queries: $staleAudits")
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
