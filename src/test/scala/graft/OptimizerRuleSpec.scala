package graft

import org.apache.spark.sql.functions._
import graft.core.GraftExtensions
import graft.plans.IdempotentStringOps

/** The injectOptimizerRule extension path: redundant trim nesting
  * collapses at plan time, values unchanged. (Case-conversion chains
  * are Catalyst's own SimplifyCaseConversionExpressions — this suite
  * pins the TRIM gap the custom rule fills.) */
class OptimizerRuleSpec extends SparkSpec {

  private def base = spark.range(3)
    .select(concat(col("id").cast("string"), lit(" A ")).as("s"))

  private def count(plan: String, needle: String) =
    plan.sliding(needle.length).count(_.equalsIgnoreCase(needle))

  test("trim(trim(e)) collapses to a single trim") {
    GraftExtensions.register(spark)
    val df = base.select(trim(trim(col("s"))).as("tr"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(count(plan, "trim(") == 1, s"trim not collapsed:\n$plan")
    // and the rewrite is a no-op on values
    val vals = df.orderBy("tr").collect().map(_.getString(0)).toSeq
    assert(vals == Seq("0 A", "1 A", "2 A"))
  }

  test("mixed trim nesting is left alone (only provable idempotence rewrites)") {
    GraftExtensions.register(spark)
    val df = base.select(trim(ltrim(col("s"))).as("x"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(count(plan, "trim(") == 2,
      s"trim(ltrim()) must not be touched:\n$plan")
  }

  test("register() is idempotent: the rule lands in the session once") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ == IdempotentStringOps) == 1)
  }

  test("the injectOptimizerRule wiring itself carries the rule") {
    // the other tests go through register()/extraOptimizations; this
    // one asserts the spark.sql.extensions path: a session built with
    // GraftExtensions must receive IdempotentStringOps from the
    // extensions instance
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.core.GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.graft.ColumnBridge
      .builtOptimizerRules(ext, spark)
    assert(rules.contains(IdempotentStringOps),
      s"injectOptimizerRule lost the rule: $rules")
  }
}
