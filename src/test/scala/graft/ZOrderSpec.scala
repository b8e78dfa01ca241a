package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{GraftExtensions, Tables => T}
import graft.functions.ZOrderInterleave
import graft.plans.Maintenance

/** The native zorder_interleave Catalyst expression: bit math, SQL
  * registration, codegen survival, and its effect on row-group layout. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave bit math matches the Morton definition") {
    assert(ZOrderInterleave.interleave(0L, 0L) == 0L)
    assert(ZOrderInterleave.interleave(1L, 0L) == 1L)       // even bit
    assert(ZOrderInterleave.interleave(0L, 1L) == 2L)       // odd bit
    assert(ZOrderInterleave.interleave(3L, 3L) == 15L)      // 0b1111
    assert(ZOrderInterleave.interleave(0xffffffffL, 0L) == 0x5555555555555555L)
    assert(ZOrderInterleave.interleave(0L, 0xffffffffL) ==
      0xaaaaaaaaaaaaaaaaL)
  }

  test("registered SQL function evaluates through codegen") {
    GraftExtensions.register(spark)
    val out = spark.range(0, 1000)
      .selectExpr("id", "zorder_interleave(id, id * 2) AS z")
      .as[(Long, Long)].collect()
    out.foreach { case (id, z) =>
      assert(z == ZOrderInterleave.interleave(id, id * 2))
    }
    // the plan must stay inside whole-stage codegen (no fallback) —
    // the compact plan marks codegen'd operators with a "*(stage)"
    // prefix
    val plan = spark.range(0, 10)
      .selectExpr("zorder_interleave(id, id) AS z")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen: $plan")
  }

  test("constant folding: literal calls collapse at optimization time") {
    GraftExtensions.register(spark)
    val optimized = spark.sql(
        "SELECT zorder_interleave(CAST(3 AS BIGINT), CAST(3 AS BIGINT)) AS z")
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("15"), s"not folded: $optimized")
  }

  test("M3 z-order rewrite clusters both dimensions into row groups") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    T.load(spark, sfDir, "lineitem")
      .write.mode("overwrite").parquet(s"$dir/raw")
    Maintenance.zorderRewrite(spark, s"$dir/raw", s"$dir/z",
      "l_suppkey", "l_partkey", nPartitions = 2)
    val z = spark.read.parquet(s"$dir/z")
    assert(z.count() == T.load(spark, sfDir, "lineitem").count())
    // within every file the morton code is non-decreasing
    import org.apache.spark.sql.expressions.Window
    GraftExtensions.register(spark)
    val w = Window.partitionBy(input_file_name())
      .orderBy(monotonically_increasing_id())
    val violations = z
      .withColumn("m", expr(
        "zorder_interleave(CAST(l_suppkey AS BIGINT), CAST(l_partkey AS BIGINT))"))
      .withColumn("prev", lag(col("m"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > col("m"))
      .count()
    assert(violations == 0)
  }
}
