package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of and range joins: each composed formulation must equal the naive
 * inequality-join semantics it re-expresses. */
class TemporalJoinsSpec extends SparkSpec {

  test("asofJoin equals the naive latest-at-or-before computation") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 100L), (2L, "a", 250L), (3L, "b", 50L), (4L, "b", 400L),
      (5L, "c", 10L) // key with no right rows at all → null
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("a", 100L, 1.0), ("a", 200L, 2.0), // exact-ts tie with left id=1: at-or-before matches
      ("b", 60L, 3.0), ("b", 400L, 4.0) // exact ts for id=4
    ).toDF("k", "ts", "v")
    val got = TemporalJoins.asofJoin(left, right, "k", "ts", "v", "asof_v")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(
      1L -> Some(1.0), // right at identical ts matches
      2L -> Some(2.0),
      3L -> None, // earliest left row precedes every right row
      4L -> Some(4.0),
      5L -> None))
  }

  test("asofJoinForward equals the naive earliest-at-or-after-within-tolerance computation") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 100L), (2L, "a", 250L), (3L, "b", 50L), (4L, "b", 400L),
      (5L, "c", 10L), // key with no right rows → null
      (6L, "a", 190L) // follower exists (200) but outside tolerance from 190? 10 <= 60 → matches
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("a", 100L, 1.0), ("a", 200L, 2.0),
      ("b", 60L, 3.0), ("b", 400L, 4.0),
      ("a", 500L, 9.0) // far future: beyond tolerance for every 'a' left
    ).toDF("k", "ts", "v")
    val tol = 60L
    val got = TemporalJoins
      .asofJoinForward(left, right, "k", "ts", "v", "fwd_v", toleranceUs = tol)
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    // naive: earliest right with lts <= rts <= lts + tol
    val naive = left.collect().map { lr =>
      val (id, k, lts) = (lr.getLong(0), lr.getString(1), lr.getLong(2))
      val cand = right.collect()
        .filter(rr => rr.getString(0) == k && rr.getLong(1) >= lts && rr.getLong(1) <= lts + tol)
        .sortBy(_.getLong(1)).headOption.map(_.getDouble(2))
      id -> cand
    }.toMap
    assert(got == naive)
    assert(got(1L) == Some(1.0)) // right at identical ts matches (at-or-after)
    assert(got(4L) == Some(4.0))
    assert(got(2L) == None) // nearest follower (500) beyond tolerance
    assert(got(5L) == None)
  }

  test("rangeJoin equals the plain inequality join across bucket sizes") {
    import spark.implicits._
    val events = (0L until 2000L).map(i => (i, i * 977L % 100000L))
      .toDF("event_id", "ts_us")
    val intervals = Seq((1L, 500L, 15000L), (2L, 0L, 1L), (3L, 99000L, 200000L),
      (4L, 40000L, 40001L), (5L, 70000L, 90000L))
      .toDF("iv_id", "start_us", "end_us")
    val naive = intervals.join(events,
      col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
      .select(col("iv_id"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (bucket <- Seq(100L, 1000L, 7919L, 1000000L)) {
      val bucketed = TemporalJoins.rangeJoin(intervals, events, bucket)
        .select(col("iv_id"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketed == naive, s"bucket $bucket")
    }
  }
}
