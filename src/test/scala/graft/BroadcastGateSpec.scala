package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.core.Barriers

/** The round-18 optimization surface: count-gated broadcast hints for
  * frames behind materialize barriers, and the lazy materialize+count
  * fusion. The degradation the gate repairs: size ESTIMATES propagate
  * multiplicatively through joins (basic stats: |A ⋈ B| ~ |A|·|B|,
  * filters don't shrink it), and Spark 4's checkpoint/localCheckpoint
  * carries those origin estimates through the barrier — so an
  * actually-tiny frame DERIVED THROUGH A JOIN (every iterative
  * kernel's loop state: ranks, labels, frontiers, min frames) looks
  * enormous to the planner forever after and every downstream join
  * degrades to sort-merge. The gate substitutes a row count the
  * caller measured for the poisoned estimate; above the conf cap the
  * shuffle plan returns unchanged (the 100 TB fallback is the same
  * code path, selected by cardinality, not config). */
class BroadcastGateSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def hasBroadcastJoin(p: SparkPlan): Boolean =
    collectWithSubqueries(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty

  /** A frame that is ACTUALLY 10 rows but whose origin estimate went
    * through a 100k × 100k join (then a filter, which basic stats
    * ignore) — the loop-state shape of q29/q33/q41/l96/l98. Pinned to
    * the LOCAL checkpoint barrier explicitly: that is the path the
    * Bench/Verify harness runs (no checkpoint dir), and it is the path
    * that carries the poisoned origin estimate through the barrier.
    * The RELIABLE checkpoint path (a cluster deployment, or any suite
    * after LlmSpec sets the shared context's checkpoint dir) captures
    * accurate stats instead — there the gate's hint is simply the
    * choice the planner would make anyway, so the laws below are
    * stated where they are load-bearing. */
  private def tinyWithPoisonedStats() = {
    val a = spark.range(0, 100000).select(col("id").as("k"))
    val b = spark.range(0, 100000).select(col("id").as("j"))
    a.join(b, col("k") === col("j")).filter(col("k") < 10)
      .select(col("k"), (col("k") * 10).as("v"))
      .localCheckpoint()
  }

  /** Probe side big enough (~24 MB estimate) that the planner never
    * auto-broadcasts IT — the fact-side role. */
  private def joined(hinted: org.apache.spark.sql.DataFrame) =
    spark.range(0, 3000000).select(col("id").as("k"),
      (col("id") * 2).as("payload"))
      .join(hinted, "k")

  test("a tiny frame with join-poisoned origin stats is not auto-broadcast (the degradation the gate repairs)") {
    val small = tinyWithPoisonedStats()
    assert(small.count() === 10L)
    val plan = joined(small).queryExecution.executedPlan
    assert(!hasBroadcastJoin(plan),
      "a 10-row join-derived frame behind localCheckpoint was " +
        "auto-broadcast — barrier statistics are now accurate and " +
        "broadcastIfSmall can be retired")
  }

  test("broadcastIfSmall under the cap plans a broadcast hash join") {
    val small = tinyWithPoisonedStats()
    val plan = joined(Barriers.broadcastIfSmall(small, 10))
      .queryExecution.executedPlan
    assert(hasBroadcastJoin(plan))
  }

  test("broadcastIfSmall above the cap keeps the shuffle plan (scale fallback)") {
    val small = tinyWithPoisonedStats()
    val plan = joined(
        Barriers.broadcastIfSmall(small, Barriers.broadcastRowCap(small) + 1))
      .queryExecution.executedPlan
    assert(!hasBroadcastJoin(plan))
  }

  test("explicit-cap overload gates wide-row frames on its own cap") {
    val small = tinyWithPoisonedStats()
    assert(hasBroadcastJoin(joined(
      Barriers.broadcastIfSmall(small, 64, 64))
      .queryExecution.executedPlan))
    assert(!hasBroadcastJoin(joined(
      Barriers.broadcastIfSmall(small, 65, 64))
      .queryExecution.executedPlan))
  }

  test("materializeLazy truncates lineage and preserves contents exactly") {
    val src = spark.range(0, 100)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
    val lazyM = Barriers.materializeLazy(src)
    // count() is the fused pin+count action the loops rely on
    assert(lazyM.count() === 100L)
    // plan barrier: the materialized frame is LogicalRDD-backed, same
    // as the eager path — CollapseProject cannot see through it
    assert(lazyM.queryExecution.optimizedPlan.collectLeaves().forall(
      _.getClass.getSimpleName.contains("LogicalRDD")))
    // contents identical to the eager barrier and to the source
    val eager = Barriers.materialize(src)
    assert(lazyM.except(eager).isEmpty && eager.except(lazyM).isEmpty)
  }
}
