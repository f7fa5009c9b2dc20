package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic ×K scale-up of a driver-generated testdata directory
 * (TESTDATA.md star schema) — the sf1.0 evidence generator: the driver ships
 * sf0.001/0.01/0.1 only, and the 100×-scale argument needs at least one
 * measured order-of-magnitude datapoint (VERDICT r10 "Next round #1"). Writes
 * `<out>/<table>.parquet` for every table, K replicas each, seed-free and
 * fully deterministic (replica index is the only entropy).
 *
 * Replication discipline — each replica must be a NEW corpus, not a copy:
 * naive duplication would make every document an exact dup of its K−1
 * siblings and every embedding a cosine-1.0 match, turning the dedup/ANN
 * benchmarks into a degenerate quadratic workload that measures the planted
 * duplication, not the operator. Instead:
 *
 *  - keys (`doc_id`, `vec_id`, `event_id`, `user_id`, TPC-H PK/FKs) shift by
 *    `r · stride(table)` with stride = max(key)+1 of the SOURCE table, so
 *    replicas are id-disjoint and every intra-replica FK join still lands
 *    (fact FKs shift by their DIMENSION's stride);
 *  - `documents.text` passes through a per-replica letter-substitution
 *    cipher (`translate` over both alphabets, rotation r) — token count,
 *    token lengths, whitespace, punctuation, df SHAPE, and near-dup
 *    structure are preserved within the replica while replica vocabularies
 *    are disjoint (shingle/term join keys never collide across replicas);
 *  - `embeddings.embedding` rotates element positions by r — norm-preserving
 *    (cosine structure within a replica is exactly the original) while
 *    cross-replica dot products decorrelate;
 *  - `nation`/`region` copy unscaled (TPC-H dims are constant at every sf).
 *
 * Net: every per-document/per-pair statistic scales ×K linearly and the
 * candidate-pair population scales ×K (disjoint replicas cannot pair), which
 * is exactly the property a scaling-exponent measurement needs.
 *
 * Usage: `sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf1.0 10"`
 */
object ScaleUp {
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  /** translate() target alphabets for rotation r (r=0 → identity). */
  private def rot(r: Int): (String, String) = {
    val k = ((r % 26) + 26) % 26
    (Lower.drop(k) + Lower.take(k), Upper.drop(k) + Upper.take(k))
  }

  private def maxKey(df: DataFrame, key: String): Long =
    df.agg(max(col(key).cast("long"))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "localdata/sf1.0"
    val k = if (args.length > 2) args(2).toInt else 10
    // k > 26 would wrap rot() back to the identity cipher and (past the
    // embedding dim) repeat rotations: replicas r and r+26 become EXACT
    // text twins — precisely the degenerate duplication this tool exists to
    // avoid. Refuse loudly rather than corrupt a benchmark silently.
    require(k >= 1 && k <= 26,
      s"replication factor must be in [1, 26] (got $k): replica $k would " +
        "reuse replica 0's substitution cipher and plant exact duplicates")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"scaleup: wrote $t x$k")
    }

    // dims copy unscaled
    for (t <- Seq("nation", "region")) write(t, src(t))

    // key strides come from the SOURCE tables, computed once
    val docStride = maxKey(src("documents"), "doc_id")
    val vecStride = maxKey(src("embeddings"), "vec_id")
    val evStride = maxKey(src("events"), "event_id")
    val userStride = maxKey(src("events"), "user_id")
    val ordStride = maxKey(src("orders"), "o_orderkey")
    val custStride = maxKey(src("customer"), "c_custkey")
    val partStride = maxKey(src("part"), "p_partkey")
    val suppStride = maxKey(src("supplier"), "s_suppkey")

    /** K replicas of `table`, each transformed by `f(replica, df)`. */
    def replicate(table: String)(f: (Int, DataFrame) => DataFrame): Unit =
      write(table, (0 until k).map(r => f(r, src(table))).reduce(_ unionByName _))

    replicate("documents") { (r, d) =>
      val (lo, up) = rot(r)
      d.select(
        (col("doc_id") + lit(r * docStride)).as("doc_id"),
        translate(col("text"), Lower + Upper, lo + up).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }

    // constant across replicas — computed once, not one scan per replica
    val embDim = src("embeddings").select(size(col("embedding"))).head().getInt(0)
    replicate("embeddings") { (r, d) =>
      val dim = embDim
      val rr = r % dim
      val emb =
        if (rr == 0) col("embedding")
        else concat(slice(col("embedding"), rr + 1, dim - rr),
          slice(col("embedding"), 1, rr))
      d.select((col("vec_id") + lit(r * vecStride)).as("vec_id"),
        emb.as("embedding"), col("label"))
    }

    replicate("events") { (r, d) =>
      d.select((col("event_id") + lit(r * evStride)).as("event_id"), col("ts"),
        (col("user_id") + lit(r * userStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }

    replicate("orders") { (r, d) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * ordStride))
        .withColumn("o_custkey", col("o_custkey") + lit(r * custStride))
    }

    replicate("lineitem") { (r, d) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * ordStride))
        .withColumn("l_partkey", col("l_partkey") + lit(r * partStride))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * suppStride))
    }

    replicate("customer") { (r, d) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * custStride))
    }

    replicate("part") { (r, d) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * partStride))
    }

    replicate("supplier") { (r, d) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(r * suppStride))
    }

    spark.stop()
  }
}
