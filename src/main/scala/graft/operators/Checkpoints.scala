package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Opt-in RELIABLE checkpointing for the iterative operators
 * ([[Dedup.components]], [[Dedup.componentsStar]], [[Graph.pageRankInt]]).
 *
 * By default the iteration loops truncate lineage with `localCheckpoint()` —
 * blocks live in the executors' block managers, which is free of any
 * filesystem dependency and right for local mode, but on a real cluster a
 * lost executor loses blocks that CANNOT recompute (lineage is truncated) and
 * aborts the job. Setting the session conf
 * `graft.iterative.reliableCheckpoint=true` (with
 * `spark.sparkContext.setCheckpointDir(...)` pointing at shared storage)
 * switches every round's materialization to a reliable `checkpoint()`:
 * round state is written to the checkpoint directory, survives executor
 * loss, and is immune to block-manager eviction and blanket unpersist
 * sweeps. The trade is one filesystem write per round — the right price on
 * a 1000-executor job where a single preemption would otherwise restart the
 * whole fixpoint. Old round files are reclaimed by Spark's context cleaner
 * when `spark.cleaner.referenceTracking.cleanCheckpoints=true`, or by
 * deleting the checkpoint dir after the job. Both modes produce identical
 * results (IterativeCheckpointSpec; the 1M-chain equality runs in
 * TrainingScaleSmoke).
 */
private[operators] object Checkpoints {

  val ConfKey = "graft.iterative.reliableCheckpoint"

  def reliableEnabled(spark: SparkSession): Boolean =
    spark.conf.get(ConfKey, "false").toBoolean && {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ConfKey=true requires spark.sparkContext.setCheckpointDir(...) " +
          "to point at storage that survives executor loss")
      true
    }

  /** TEST-ONLY chaos hook: invoked on the driver thread right after each
   * round's materialization, so a spec can force block eviction BETWEEN
   * fixpoint iterations (the executor-loss simulation local mode allows).
   * ThreadLocal scopes WHEN the hook fires to the thread that set it — a
   * fixpoint running on another thread never triggers it. The hook BODY a
   * chaos test installs (a blanket block-manager sweep) still acts on the
   * shared session, which is safe because sbt runs the forked suite JVM's
   * test classes sequentially (`Test/testForkedParallel` is false — the
   * standing assumption of every blanket-unpersist spec in this repo).
   * Production never sets the hook. */
  private[operators] val afterMaterialize: ThreadLocal[DataFrame => Unit] =
    new ThreadLocal[DataFrame => Unit] {
      override def initialValue: DataFrame => Unit = _ => ()
    }

  /** Materialize one iteration round: reliable `checkpoint()` when opted in,
   * `localCheckpoint()` otherwise. Both are eager and truncate lineage. */
  def iterative(df: DataFrame): DataFrame = {
    val out =
      if (reliableEnabled(df.sparkSession)) df.checkpoint()
      else df.localCheckpoint()
    afterMaterialize.get()(out)
    out
  }
}
