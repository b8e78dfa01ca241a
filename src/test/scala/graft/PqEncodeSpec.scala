package graft

import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.operators.LlmOps

/** The native pq_encode expression vs its higher-order-function
  * specification (per-subspace squared-L2 argmin over the broadcast
  * codebook): bit-identical codes over the real embeddings table, a
  * codegen (non-interpreted) projection, and the shared
  * (session, dir) index cache serving all three PQ consumers one
  * encode. */
class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = T.load(spark, sfDir, "embeddings")
    .withColumn("vec", $"embedding".cast("array<double>"))

  test("native pq_encode is bit-equal to the HOF argmin specification") {
    val native = LlmOps.pqEncode(embs)
      .select($"vec_id", $"code").as[(Long, Seq[Int])].collect().toMap
    val hof = LlmOps.pqEncodeHof(embs)
      .select($"vec_id", $"code").as[(Long, Seq[Int])].collect().toMap
    assert(native.nonEmpty && native.keySet == hof.keySet)
    native.foreach { case (id, code) =>
      assert(code == hof(id), s"vec $id: native=$code hof=${hof(id)}")
    }
  }

  test("pq_encode is registered as a SQL function with literal geometry") {
    graft.core.GraftExtensions.register(spark)
    embs.createOrReplaceTempView("pq_encode_input")
    val n = spark.sql(
      s"""SELECT COUNT(DISTINCT array_join(transform(
         |  pq_encode(vec, cents, ${LlmOps.pqM}, ${LlmOps.pqSub}),
         |  c -> cast(c AS string)), ',')) AS n
         |FROM pq_encode_input CROSS JOIN (
         |  SELECT collect_list(named_struct(
         |    'cid', cast(vec_id AS int), 'cvec', vec)) AS cents
         |  FROM pq_encode_input WHERE vec_id < ${LlmOps.pqK})""".stripMargin)
      .as[Long].head()
    assert(n > 1, "registered pq_encode produced a degenerate code space")
  }

  test("pq_encode stays inside whole-stage codegen") {
    val df = LlmOps.pqEncode(embs).select($"vec_id", $"code")
    df.collect() // finalize the adaptive plan so codegen stages are marked
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("pq_encode") && l.contains("*(")),
      s"pq_encode projection not codegen'd:\n$plan")
  }

  test("sharedPqIndex caches one (vec_id, cid, code) frame per (session, dir)") {
    val a = LlmOps.sharedPqIndex(spark, sfDir)
    val b = LlmOps.sharedPqIndex(spark, sfDir)
    assert(a eq b, "sharedPqIndex rebuilt the frame for the same (session, dir)")
    assert(a.columns.toSeq == Seq("vec_id", "cid", "code"))
    assert(a.count() == embs.count())
  }
}
