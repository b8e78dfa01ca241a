package graft

import org.apache.spark.sql.functions._
import graft.core.{GraftExtensions, Tables => T}
import graft.functions.Text

/** The native simhash_pack expression vs its higher-order-function
  * specification: bit-identical signatures over real corpus text, a
  * codegen (non-interpreted) plan, and SQL registration. */
class SimhashPackSpec extends SparkSpec {
  import spark.implicits._

  private def tokenized = T.load(spark, sfDir, "documents").limit(200)
    .select($"doc_id", expr(Text.toksSql("text")).as("toks"))
    .repartition(4)

  test("native simhash_pack is bit-equal to the HOF hash/bit-count/pack specification") {
    val rows = tokenized
      .withColumn("hs", Text.tokenHashes("toks"))
      .withColumn("counts", Text.simhashBitCounts("hs"))
      .select($"doc_id",
        Text.packSimhash("counts").as("hof"),
        Text.simhashPack($"toks").as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: hof=${r.getLong(1)} native=${r.getLong(2)}")
    }
  }

  test("native == HOF on non-ASCII tokens too (code-point fold, not " +
      "first-byte: ascii('é') = 233 in both engines)") {
    val df = Seq(
      (1L, Seq("héllo", "wörld", "caffé")),
      (2L, Seq("日本語", "テキスト", "mixedé")),
      (3L, Seq("plain", "ascii", "tokens"))).toDF("doc_id", "toks")
    val rows = df
      .withColumn("hs", Text.tokenHashes("toks"))
      .withColumn("counts", Text.simhashBitCounts("hs"))
      .select($"doc_id",
        Text.packSimhash("counts").as("hof"),
        Text.simhashPack($"toks").as("native"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: hof=${r.getLong(1)} native=${r.getLong(2)}")
    }
  }

  test("simhash_pack stays inside whole-stage codegen") {
    val df = tokenized.select(Text.simhashPack($"toks").as("sh"))
    df.collect() // finalize the adaptive plan so codegen stages are marked
    val plan = df.queryExecution.executedPlan.toString
    // compact plan strings mark codegen stages with a *(n) prefix; the
    // projection computing simhash_pack must carry one (the HOF form
    // never can — ArrayTransform/ArrayAggregate are CodegenFallback)
    assert(plan.linesIterator.exists(l =>
        l.contains("simhash_pack") && l.contains("*(")),
      s"simhash_pack projection not codegen'd:\n$plan")
  }

  test("simhash_pack is registered as a SQL function") {
    GraftExtensions.register(spark)
    tokenized.createOrReplaceTempView("simhash_pack_input")
    val n = spark.sql(
      """SELECT COUNT(DISTINCT simhash_pack(toks)) AS n
        |FROM simhash_pack_input""".stripMargin)
      .as[Long].head()
    assert(n > 1, "registered simhash_pack produced degenerate output")
  }
}
