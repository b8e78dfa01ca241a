package graft

import org.apache.spark.sql.functions._
import graft.core.GraftExtensions
import graft.functions.VectorSum

/** The native vector_sum aggregate: exactness on integer-valued
  * vectors (order-independent, so multi-partition merge is pinned
  * bit-exact), null semantics, SQL registration, and the
  * ObjectHashAggregate plan shape. */
class VectorSumSpec extends SparkSpec {
  import spark.implicits._

  test("vector_sum is exact and partition-order-independent on integer-valued vectors") {
    // integer-valued doubles sum exactly in ANY order, so the
    // partial/merge path across 8 partitions must reproduce the
    // single-threaded reference bit-for-bit
    val rows = (1 to 500).map { i =>
      (i % 3, Seq(i.toDouble, (2 * i).toDouble, (i % 7).toDouble))
    }
    val expected = rows.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).transpose.map(_.sum)
    }
    val got = rows.toDF("k", "vec").repartition(8)
      .groupBy($"k").agg(VectorSum.vectorSum($"vec").as("s"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, e) => assert(got(k) == e, s"group $k") }
  }

  test("vector_sum skips null rows; an all-null group yields NULL") {
    val df = Seq(
      (1, Some(Seq(1.0, 2.0))), (1, None), (1, Some(Seq(3.0, 4.0))),
      (2, None))
      .toDF("k", "vec")
    val got = df.groupBy($"k").agg(VectorSum.vectorSum($"vec").as("s"))
      .as[(Int, Option[Seq[Double]])].collect().toMap
    assert(got(1).contains(Seq(4.0, 6.0)))
    assert(got(2).isEmpty)
  }

  test("vector_sum is registered in SQL and coerces float arrays") {
    GraftExtensions.register(spark)
    graft.core.Tables.load(spark, sfDir, "embeddings")
      .createOrReplaceTempView("vsum_in")
    // embedding is array<float>; ImplicitCastInputTypes must lift it
    val s = spark.sql(
      "SELECT vector_sum(embedding) AS s FROM vsum_in")
      .as[Seq[Double]].head()
    assert(s.length == 64 && s.exists(_ != 0.0))
  }

  test("vector_sum plans as ObjectHashAggregate with a partial phase") {
    val df = Seq((1, Seq(1.0)), (2, Seq(2.0))).toDF("k", "vec")
      .repartition(2)
      .groupBy($"k").agg(VectorSum.vectorSum($"vec").as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate (typed-imperative path):\n$plan")
    assert(plan.contains("partial_vector_sum"),
      s"expected a map-side partial phase:\n$plan")
  }

  test("vector_sum fails fast on mismatched vector lengths") {
    val df = Seq((1, Seq(1.0, 2.0)), (1, Seq(3.0))).toDF("k", "vec")
      .coalesce(1)
      .groupBy($"k").agg(VectorSum.vectorSum($"vec").as("s"))
    val e = intercept[Exception](df.collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("mismatched vector lengths")), e)
  }
}
