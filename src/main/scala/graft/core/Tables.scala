package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders + canonical-arithmetic helpers shared by every operator.
  *
  * Data model (TESTDATA.md / FIXTURES.md §B): deterministic TPC-H-ish
  * parquet at `sfDir`. Domain mapping to the reference
  * (wayneweicheng/de_gcp_lakehouse_iceberg, SURVEY.md §7.0):
  * `orders ⋈ lineitem` ≈ taxi_trips fact, `nation`/`region` ≈ taxi_zones
  * broadcast dims, `events` ≈ the Pub/Sub trip-event stream.
  *
  * Scale note: loaders never cache or collect; every helper keeps the plan
  * declarative so Catalyst pushes filters/projections into the parquet scan
  * — at 100 TB the scan-level pruning is what matters, not local speed.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register each table as a temp view (for spark.sql surfaces). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  // ---- canonical arithmetic (oracle-parity helpers) -------------------
  // Double summation order differs between engines; summing exact decimals
  // and casting the final value to double yields bit-identical results in
  // Spark and DuckDB. Money-like inputs in the test data all carry <=2dp.

  /** Exact decimal view of a money-like double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a money column, surfaced as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact-sum-based average rounded to 2dp (reference rounds stats to 2dp,
    * /root/reference/main.py:251-254). Division happens in double on both
    * engines from identical inputs, so results match bit-for-bit. */
  def moneyAvg2(c: Column): Column =
    round(sum(dec2(c)).cast(DoubleType) / count(c), 2)

  /** Exact revenue sum: SUM(price * (1 - discount)) with decimal
    * intermediates (scale 4), cast to double. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(dec2(price) * (lit(BigDecimal(1).setScale(2)) - dec2(discount)))
      .cast(DoubleType)

  // Oracle-side (DuckDB) spellings of the same helpers.
  def oDec2(c: String): String = s"CAST($c AS DECIMAL(18,2))"
  def oMoneySum(c: String): String = s"CAST(SUM(${oDec2(c)}) AS DOUBLE)"
  def oMoneyAvg2(c: String): String =
    s"ROUND(CAST(SUM(${oDec2(c)}) AS DOUBLE) / COUNT($c), 2)"
  def oRevenueSum(p: String, d: String): String =
    s"CAST(SUM(${oDec2(p)} * (CAST(1.00 AS DECIMAL(3,2)) - ${oDec2(d)})) AS DOUBLE)"
}
