package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Benchmark main: runs every `SparkEntry.queries` entry against
 * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line and writes the same JSON to
 * `SPARK_GRAFT_BENCH_OUT` (default `bench_out.json` in the cwd) so the result
 * survives sbt's `[info]`-prefixed, interleaved stdout.
 *
 * Noise control (this box shows up to 13x run-to-run swings from VM neighbor
 * contention): each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and
 * the MINIMUM is reported — the minimum is the least contended observation and
 * the best estimate of the plan's intrinsic cost.
 *
 * Fidelity: queries are executed with a `noop`-format write, not `count()` —
 * a count lets Catalyst prune every projected column (an XPath-extraction
 * query would time only the scan), while the noop sink materializes every
 * output column without paying filesystem writes.
 *
 * A query that throws is recorded in `errors` with value -1 in `queries` —
 * never a bogus wall time.
 */
object Bench {
  private def execute(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // events.parquet is TIMESTAMP(NANOS); set globally so the raw warm-up
      // read (and any query path that races Tables.events) never throws
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up (untimed): JVM/codegen init + parquet footer reads, so the first
    // timed query doesn't absorb one-time session costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")) {
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case e: Throwable => System.err.println(s"warmup $t: $e") }
    }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try { execute(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            errors(name) = e.toString.replaceAll("[\"\\n\\r]", " ").take(300)
            None
        }
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    Files.write(Paths.get(outPath), (json + "\n").getBytes(StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
