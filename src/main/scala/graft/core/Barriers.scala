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
  *    must not kill an hours-long dedup. The frame is persisted for
  *    the duration of the checkpoint write — `checkpoint()` runs a
  *    second job to write the files, and without the persist that job
  *    would RE-EXECUTE the whole lineage (the exact recompute the
  *    barrier exists to prevent).
  *
  * A cluster deployment opts in with
  * `spark.sparkContext.setCheckpointDir(...)` once at session setup.
  * Checkpoint data outlives the frame: Spark deletes it only with
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (and then
  * only on GC), so point the checkpoint dir at job-scoped storage
  * that teardown removes, or enable that cleaner flag — unlike local
  * blocks, which the ContextCleaner reclaims automatically.
  */
object Barriers {
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint()
      finally df.unpersist(blocking = false)
    } else df.localCheckpoint()
}
