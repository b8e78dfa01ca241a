package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** Contracts for the native AS-OF join operator (plans/AsOfJoin.scala):
  * row-level semantics on crafted edges, a randomized cross-check
  * against the declarative max-filter emulation, and the plan-shape
  * guarantees that justify building it as a physical operator at all
  * (one exchange per side, partitioning reused downstream). The
  * value-level gate vs DuckDB's NATIVE `ASOF JOIN` is `q24` in the
  * correctness run. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  // the strategy arrives through the same registration the harness uses
  graft.core.GraftExtensions.register(spark)

  private def asof(l: DataFrame, r: DataFrame): DataFrame =
    AsOfJoin(l, "k", "t", r, "rk", "rt")

  test("asof semantics: tie-inclusive match, pre-first null, missing " +
      "key null, null keys never match") {
    val l = Seq(
      (Some(1L), Some(5L)), // tie with right (1,5) — inclusive
      (Some(1L), Some(2L)), // before first right row for key 1
      (Some(2L), Some(10L)), // key absent on the right
      (Some(3L), Some(0L)), // before (3,1)
      (Some(3L), Some(10L)), // after (3,1)
      (None, Some(9L)) // null key: emits with null extension
    ).toDF("k", "t")
    val r = Seq(
      (Some(1L), Some(3L)), (Some(1L), Some(5L)), (Some(1L), Some(7L)),
      (Some(3L), Some(1L)),
      (None, Some(4L)) // null right key: skipped, never matches
    ).toDF("rk", "rt")
    val out = asof(l, r).collect().map { row =>
      (Option(row.get(0)).map(_.asInstanceOf[Long]),
        row.getLong(1),
        if (row.isNullAt(3)) None else Some(row.getLong(3)))
    }.toSet
    assert(out == Set(
      (Some(1L), 5L, Some(5L)),
      (Some(1L), 2L, None),
      (Some(2L), 10L, None),
      (Some(3L), 0L, None),
      (Some(3L), 10L, Some(1L)),
      (None, 9L, None)))
  }

  test("asof matches the declarative max-filter emulation on 500 " +
      "random rows") {
    val rnd = new scala.util.Random(42)
    val l = Seq.fill(700)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .distinct.toDF("k", "t")
    val r = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .distinct.toDF("rk", "rt")
    val got = asof(l, r)
      .select(col("k"), col("t"), col("rt")).collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) -1L else row.getLong(2))).toSet
    // emulation: left join on key with rt <= t, take max rt per left row
    val expected = l.join(r, col("k") === col("rk") && col("rt") <= col("t"),
        "left")
      .groupBy(col("k"), col("t"))
      .agg(coalesce(max(col("rt")), lit(-1L)).as("rt"))
      .collect().map(row =>
        (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
    assert(got == expected)
  }

  test("asof metrics report output and matched row counts") {
    val l = Seq((1L, 5L), (1L, 2L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, 3L), (1L, 7L)).toDF("rk", "rt")
    val df = asof(l, r)
    df.collect()
    // descend through AQE wrappers: QueryStageExec is a LEAF node whose
    // subtree hangs off .plan, so TreeNode collect never enters it
    def find(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[graft.plans.AsOfJoinExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        find(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        find(q.plan)
      case e: graft.plans.AsOfJoinExec => Some(e)
      case other => other.children.view.flatMap(find).headOption
    }
    val exec = find(df.queryExecution.executedPlan)
      .getOrElse(fail("AsOfJoinExec not found in executed plan"))
    assert(exec.metrics("numOutputRows").value == 3)
    // (1,5) matches (1,3); (1,2) precedes all; key 2 absent
    assert(exec.metrics("numMatchedRows").value == 1)
  }

  test("asof plans one merge operator with one exchange per side, and " +
      "a downstream same-key agg reuses the left partitioning") {
    val l = spark.range(0, 1000)
      .select((col("id") % 50).as("k"), col("id").as("t"))
    val r = spark.range(0, 300)
      .select((col("id") % 50).as("rk"), (col("id") * 3).as("rt"))
    val agged = asof(l, r).groupBy(col("k"))
      .agg(count(col("rt")).as("n_matched"))
    agged.collect() // force AQE to finalize the executed plan
    // scope to AQE's final plan (toString prints initial + final)
    val plan = agged.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), s"operator missing:\n$plan")
    val nExchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).size
    // two side shuffles, ZERO for the agg: outputPartitioning declares
    // the left hash partitioning, so the same-key aggregate consumes it
    assert(nExchanges == 2, s"expected 2 exchanges, got $nExchanges:\n$plan")
  }
}
