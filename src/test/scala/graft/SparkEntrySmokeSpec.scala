package graft

/** The driver's flagship smoke, pinned locally: `SparkEntry.entry` must
 * return rows on the sf0.001 testdata — a broken entry fails the round
 * before any oracle runs, so catch it in `sbt test` first. */
class SparkEntrySmokeSpec extends SparkSpec {
  test("entry returns rows on sf0.001 (the driver's smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }
}
