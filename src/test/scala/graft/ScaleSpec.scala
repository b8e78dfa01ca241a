package graft

import org.apache.spark.sql.functions._

/** Contracts of the scale-pattern operators that the DuckDB oracle
  * cannot check (sketch internals are engine-specific). */
class ScaleSpec extends SparkSpec {

  test("k02: HLL distinct stays within its configured 2% error envelope") {
    // the k02 entry publishes only the oracle-checkable columns (exact
    // count + the ≤5% contract boolean); this spec holds the raw
    // sketch estimate itself to the same bound
    val rows = graft.core.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts")
      val approx = r.getAs[Long]("approx_parts")
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact rel_err=$err")
    }
    // and the published contract column must agree
    SparkEntry.queries("k02_approx_distinct")(spark, sfDir).collect()
      .foreach(r => assert(r.getAs[Boolean]("within_5pct"),
        s"${r.getString(0)}: within_5pct=false"))
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
