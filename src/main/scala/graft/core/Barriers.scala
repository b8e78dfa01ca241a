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

  /** [[materialize]] for the materialize-then-count pattern every
    * iterative kernel uses (labels/frontier/edge state per round,
    * convergence count right after): a LAZY local checkpoint defers
    * block persistence to the caller's own count() action, fusing the
    * two jobs eager materialization would run (one to pin the blocks,
    * one to count them) into one. The plan-truncation barrier is
    * unchanged — the returned frame is LogicalRDD-backed either way,
    * so downstream lineage stays flat and CollapseProject still cannot
    * re-inline through it. Callers MUST run an action promptly (the
    * loop's convergence count does); with a reliable checkpoint dir
    * configured the eager cluster-safe path is kept as-is. */
  def materializeLazy(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      materialize(df)
    else df.localCheckpoint(eager = false)

  /** Row cap under which [[broadcastIfSmall]] hints a broadcast.
    * Conf-tunable (`spark.graft.broadcast.maxRows`); the default — 4M
    * rows — keeps a 3-long-column build relation around ~100 MB, well
    * inside executor memory and far under Spark's 8 GB / 512M-row
    * broadcast hard cap, while any genuinely data-proportional frame
    * at 100 TB scale (|V|-sized rank/label/frontier state) exceeds it
    * and falls back to the unhinted shuffle plan. */
  def broadcastRowCap(df: DataFrame): Long =
    df.sparkSession.conf
      .get("spark.graft.broadcast.maxRows", "4000000").toLong

  /** Deliberate join-strategy selection for frames BEHIND a barrier.
    * Size ESTIMATES propagate multiplicatively through joins (basic
    * stats: |A ⋈ B| ~ |A|·|B|, and filters/aggregates don't shrink
    * them), and checkpoint/localCheckpoint carry the ORIGIN plan's
    * estimate through the barrier — so an actually-tiny frame derived
    * through a join (every iterative kernel's loop state: ranks,
    * labels, frontiers, per-round min frames) looks enormous to the
    * planner forever after, and every downstream join silently
    * degrades to sort-merge (measured on q29: each of the three
    * unrolled rank joins re-shuffled AND re-sorted the 2.4M-row
    * dst-partitioned edge frame that the barrier had pre-partitioned
    * precisely so it would never move again). Callers that KNOW the
    * frame's real cardinality — a count the surrounding loop already
    * paid for, or a structural bound — pass it here to gate an
    * explicit broadcast hint: accurate-cardinality join selection, the
    * decision the planner would make if its estimate were real
    * (BroadcastGateSpec pins both the degradation and the repair).
    * Above the cap the frame is returned unhinted and the join keeps
    * its shuffle plan, so the gate is scale-adaptive, never a
    * local[32]-only constant. */
  def broadcastIfSmall(df: DataFrame, rows: Long): DataFrame =
    broadcastIfSmall(df, rows, broadcastRowCap(df))

  /** [[broadcastIfSmall]] with an explicit cap — for frames whose rows
    * are NOT a few scalar columns (shingle/embedding arrays,
    * documents), where the caller supplies a measured quantity that
    * actually bounds bytes (e.g. Σ size(array) against
    * [[broadcastArrayElemCap]]). A ROW count cannot bound an array
    * frame's bytes — measured on l98 at sf1, where a row-gated
    * broadcast shipped the whole corpus's arrays and cost more than
    * the shuffles it replaced. */
  def broadcastIfSmall(df: DataFrame, rows: Long, cap: Long): DataFrame =
    if (rows >= 0 && rows <= cap)
      org.apache.spark.sql.functions.broadcast(df)
    else df

  /** Element-mass cap for broadcasting ARRAY-bearing frames: row
    * counts don't bound array bytes (a few thousand rows can carry the
    * whole corpus), so callers gate on a measured Σ size(array)
    * instead. Default 2M elements ≈ tens of MB for string shingles —
    * comfortably shippable; conf-tunable like the row cap. */
  def broadcastArrayElemCap(df: DataFrame): Long =
    df.sparkSession.conf
      .get("spark.graft.broadcast.maxArrayElems", "2000000").toLong
}
