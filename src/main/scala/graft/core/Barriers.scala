package graft.core

import org.apache.spark.sql.DataFrame

/** Materialization barriers for frames that feed self-joins or
  * lambda-bearing expressions (the CollapseProject re-inlining guard —
  * see the minhash/simhash notes in [[graft.operators.LlmOps]]).
  *
  * Strategy: reliable `checkpoint()` when the context has a checkpoint
  * directory, `localCheckpoint()` otherwise.
  *
  *  - `localCheckpoint` stores blocks on executors: cheap (no
  *    filesystem round-trip), and blocks are freed by the
  *    ContextCleaner when the frame is collected — right for
  *    local-mode tests and benchmarks. Its weakness at cluster scale:
  *    blocks die with their executor, and a lost block fails the job
  *    because the lineage was truncated.
  *  - Reliable `checkpoint` writes to the checkpoint dir (HDFS/object
  *    store): survives executor loss, the right barrier for a
  *    1000-executor run where losing one machine mid-candidate-build
  *    must not kill an hours-long dedup.
  *
  * A cluster deployment opts in with
  * `spark.sparkContext.setCheckpointDir(...)` once at session setup;
  * nothing else changes.
  */
object Barriers {
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
