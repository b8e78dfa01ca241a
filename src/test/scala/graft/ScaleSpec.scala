package graft

import org.apache.spark.sql.functions._

/** Contracts of the scale-pattern operators that the DuckDB oracle
  * cannot check (sketch internals are engine-specific). */
class ScaleSpec extends SparkSpec {

  test("k02: HLL distinct stays within its configured 2% error envelope") {
    val rows = SparkEntry.queries("k02_approx_distinct")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getAs[Double]("rel_err")
      assert(err <= 0.05,
        s"${r.getString(0)}: approx=${r.getAs[Long]("approx_parts")} " +
          s"exact=${r.getAs[Long]("exact_parts")} rel_err=$err")
    }
  }

  test("k01: salted aggregation equals the direct groupBy") {
    val salted = SparkEntry.queries("k01_salted_agg")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val direct = graft.core.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(graft.core.Tables.moneySum(col("l_extendedprice")), 2).as("rev"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(salted == direct)
  }
}
