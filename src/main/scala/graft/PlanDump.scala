package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a named query and dump its formatted plan.
  * Usage: `runMain graft.PlanDump <queryName> [sfDir] [--explain]` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "debug_q32") {
      import org.apache.spark.sql.functions._
      val docs = graft.queries.Tables.documents(spark, sfDir)
        .select(col("doc_id").as("id"),
          graft.functions.TextFunctions.shingles(col("text"), 2).as("shingles"))
      var t = System.nanoTime()
      println(s"[plandump] docs=${docs.count()} in ${(System.nanoTime() - t) / 1e9}")
      t = System.nanoTime()
      val cands = graft.operators.Dedup.minhashCandidates(docs, 32, 16)
      println(s"[plandump] candidates=${cands.count()} in ${(System.nanoTime() - t) / 1e9}")
      t = System.nanoTime()
      val v = graft.operators.Dedup.verifyJaccard(cands, docs, 0.8)
      println(s"[plandump] verified=${v.count()} in ${(System.nanoTime() - t) / 1e9}")
      spark.stop(); return
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("--explain")) df.explain("formatted")
    var t0 = System.nanoTime()
    val n = df.count()
    println(f"[plandump] $name run1: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    t0 = System.nanoTime()
    df.count()
    println(f"[plandump] $name run2: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
