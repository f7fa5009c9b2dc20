package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkSpec

/**
 * The round-7 regression, pinned forever: the driver regenerated testdata
 * with `events.ts` as parquet timestamp[us] where it had been
 * TIMESTAMP(NANOS), and the loader's nanos-only assumption broke every
 * event-table consumer (24 oracle queries, 16 specs). `Tables.events` must
 * load BOTH vintages — fixtures for each live in test resources — and
 * produce the SAME TimestampType column with the same microsecond values.
 */
class EventsVintageSpec extends SparkSpec {

  private val base = getClass.getResource("/events_vintages").getPath

  private def load(vintage: String) =
    Tables.events(spark, s"$base/$vintage")

  test("both parquet vintages load to identical TimestampType micros") {
    val byVintage = Seq("micros", "nanos").map { v =>
      val df = load(v)
      assert(df.schema("ts").dataType == TimestampType,
        s"$v vintage must surface ts as TIMESTAMP, got ${df.schema("ts").dataType}")
      v -> df.select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }.toMap
    assert(byVintage("micros").nonEmpty)
    assert(byVintage("micros") == byVintage("nanos"),
      "the two vintages carry the same instants and must load identically")
    // sub-second precision survives (12:00:00.123456 -> ...123456 µs)
    assert(byVintage("micros").forall(_._2 % 1000000L == 123456L))
  }
}
