package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted skew join: result identity with the plain join, and the salt must
 * actually spread a hot key across salt values. */
class SkewSpec extends SparkSpec {

  test("salted join is row-identical to the plain join on a skewed corpus") {
    import spark.implicits._
    // 10k probe rows, 95% on one hot key
    val probe = (0L until 10000L)
      .map(i => (i, if (i % 20 == 0) s"key${i % 7}" else "HOT", s"v$i"))
      .toDF("row_id", "k", "payload")
    val build = Seq(("HOT", 1), ("key0", 2), ("key3", 3), ("missing", 4))
      .toDF("k", "dim")

    val plain = probe.join(build, "k")
      .select(col("row_id"), col("dim"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val salted = Skew.saltedJoin(probe, build, "k", col("row_id"), factor = 8)
      .select(col("row_id"), col("dim"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(plain.nonEmpty)
    assert(salted == plain)
  }

  test("the hot key's rows actually spread over the salt space") {
    import spark.implicits._
    val probe = (0L until 1000L).map(i => (i, "HOT")).toDF("row_id", "k")
    val saltCounts = probe
      .withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .groupBy(col("_salt")).count()
      .collect().map(_.getLong(1))
    assert(saltCounts.length == 8, "every salt bucket should be hit")
    assert(saltCounts.max < 1000, "no single bucket holds the whole key")
  }
}
