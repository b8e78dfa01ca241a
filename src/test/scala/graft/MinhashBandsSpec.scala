package graft

import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.functions.Text

/** The native minhash_bands expression vs its higher-order-function
  * specification (shingle hashes → 16-perm signature → band keys):
  * bit-identical band keys over real corpus shingles, and a codegen
  * (non-interpreted) projection. */
class MinhashBandsSpec extends SparkSpec {
  import spark.implicits._

  // localCheckpoint mirrors the operator's Barriers.materialize: the
  // shingle construction is itself a CodegenFallback HOF, and without
  // the barrier CollapseProject splices it into minhash_bands's child,
  // dropping the projection out of codegen (and re-shingling per
  // consumer) — in minhashCandidates the expression always reads the
  // materialized attribute.
  private lazy val shingled = T.load(spark, sfDir, "documents").limit(200)
    .select($"doc_id", Text.tokens($"text").as("toks"))
    .repartition(4)
    .select($"doc_id", Text.shinglesFromTokens("toks", 3).as("sh"))
    .filter(size($"sh") > 0)
    .localCheckpoint()

  test("native minhash_bands is bit-equal to the HOF hash/signature/band specification") {
    val rows = shingled
      .withColumn("shh", Text.shingleHashes("sh"))
      .withColumn("sig", Text.minhashSignature("shh", 16))
      .select($"doc_id",
        Text.lshBands("sig", 4, 4).as("hof"),
        Text.minhashBands($"sh", 16, 4).as("native"))
      .as[(Long, Seq[Long], Seq[Long])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, hof, native) =>
      assert(hof == native, s"doc $id: hof=$hof native=$native")
    }
  }

  test("minhash_bands is registered as a SQL function with literal params") {
    graft.core.GraftExtensions.register(spark)
    shingled.createOrReplaceTempView("minhash_bands_input")
    val n = spark.sql(
      """SELECT COUNT(DISTINCT band) AS n FROM (
        |  SELECT explode(minhash_bands(sh, 16, 4)) AS band
        |  FROM minhash_bands_input)""".stripMargin)
      .as[Long].head()
    assert(n > 4, "registered minhash_bands produced degenerate band keys")
  }

  test("minhash_bands stays inside whole-stage codegen") {
    val df = shingled.select(Text.minhashBands($"sh", 16, 4).as("bands"))
    df.collect() // finalize the adaptive plan so codegen stages are marked
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("minhash_bands") && l.contains("*(")),
      s"minhash_bands projection not codegen'd:\n$plan")
  }
}
