package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.plans.RangeJoinBinning

/** The automatic range-join binning rule: fires only under its flag,
  * only on the bounded-interval pattern, and never changes results. */
class RangeJoinBinningSpec extends SparkSpec {

  /** The plain (un-binned) attribution range join over events. */
  private def rangeJoin(s: SparkSession): DataFrame = {
    val ev = T.load(s, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts")).alias("c")
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("buy_ts"), col("value"))
      .alias("p")
    clicks.join(buys,
        col("c.user_id") === col("p.user_id") &&
        col("p.buy_ts") >= col("c.click_ts") &&
        col("p.buy_ts") < col("c.click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c.user_id"), col("click_ts"), col("buy_ts"),
        col("value"))
  }

  private def flaggedSession(): SparkSession = {
    val s2 = spark.newSession()
    graft.core.GraftExtensions.register(s2)
    s2.conf.set(RangeJoinBinning.confKey, "true")
    s2
  }

  test("flag off: the plain range join plans no Generate") {
    val opt = rangeJoin(spark).queryExecution.optimizedPlan.toString
    assert(!opt.contains("__graft_bin"), s"rule fired without flag:\n$opt")
  }

  test("flag on: the rule explodes bins and the join becomes equi-keyed") {
    val df = rangeJoin(flaggedSession())
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_bin"), s"rule did not fire:\n$opt")
    assert(opt.contains("Generate"), s"no bin explode in plan:\n$opt")
    val exec = df.queryExecution.executedPlan.toString
    // the bucket equi-key must reach the physical join: a hash/merge
    // join keyed on (user_id, bin), never a nested loop
    assert(!exec.contains("BroadcastNestedLoopJoin") &&
      !exec.contains("CartesianProduct"),
      s"binned join degenerated to a loop join:\n$exec")
    assert(exec.contains("__graft_bin"),
      s"bin key missing from physical join keys:\n$exec")
  }

  test("the rewrite is invisible in the result, row for row") {
    val plain = rangeJoin(spark)
      .orderBy("user_id", "click_ts", "buy_ts").collect().toSeq
    val binned = rangeJoin(flaggedSession())
      .orderBy("user_id", "click_ts", "buy_ts").collect().toSeq
    assert(plain.nonEmpty, "fixture produced an empty attribution join")
    assert(binned == plain)
  }

  test("guards: equi-only joins and half-bounded ranges are untouched") {
    val s2 = flaggedSession()
    val ev = T.load(s2, sfDir, "events")
    val a = ev.select(col("user_id"), col("ts").as("ta")).alias("a")
    val b = ev.select(col("user_id"), col("ts").as("tb")).alias("b")
    val equiOnly = a.join(b, col("a.user_id") === col("b.user_id"))
    assert(!equiOnly.queryExecution.optimizedPlan.toString
      .contains("__graft_bin"))
    // upper bound without the matching lower bound: not the pattern
    val halfOpen = a.join(b, col("a.user_id") === col("b.user_id") &&
      col("b.tb") < col("a.ta") + expr("INTERVAL 30 MINUTES"))
    assert(!halfOpen.queryExecution.optimizedPlan.toString
      .contains("__graft_bin"))
  }

  test("guard: sub-second windows are left to the plain join") {
    val s2 = flaggedSession()
    val ev = T.load(s2, sfDir, "events")
    val a = ev.select(col("user_id"), col("ts").as("ta")).alias("a")
    val b = ev.select(col("user_id"), col("ts").as("tb")).alias("b")
    val subSec = a.join(b, col("a.user_id") === col("b.user_id") &&
      col("b.tb") >= col("a.ta") &&
      col("b.tb") < col("a.ta") + expr("INTERVAL 500 MILLISECONDS"))
    assert(!subSec.queryExecution.optimizedPlan.toString
      .contains("__graft_bin"))
  }
}
