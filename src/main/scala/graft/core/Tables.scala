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

  /** Session-level TABLE-PLAN cache — the role a catalog/metastore
    * plays on a real deployment: `spark.read.parquet` re-resolves the
    * DataSource, re-lists the path, and re-reads a footer for schema
    * inference on EVERY call, ~40-80 ms of driver work per load that
    * 291 bench queries × 1-4 tables each pay over and over for
    * byte-identical immutable inputs. The cached value is the resolved
    * logical plan + schema ONLY — no rows are pinned, no action ever
    * runs here, and every downstream action still scans the parquet
    * input in full (the no-result-caching contract). Keyed by session
    * so a stopped session's entries are pruned, and by (dir, name) so
    * distinct scale factors never alias.
    *
    * INVARIANT — `$sfDir` tables are immutable for the life of a
    * session: the cached plan pins the parquet FILE LISTING
    * (InMemoryFileIndex), so any future code path that rewrote an
    * sfDir table in-process would silently serve a stale file list.
    * All mutating queries write under [[Scratch]] dirs (never sfDir);
    * a writer that must regenerate sfDir data (ScaleUp-style) has to
    * do it in a fresh session or against a fresh directory. */
  private val planCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    SessionCaches.prune(planCache)
    planCache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      _ =>
        if (name == "events") loadEvents(spark, sfDir)
        else spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** `events.ts` has shipped in two physical spellings across testdata
    * generations: INT64 TIMESTAMP(NANOS) — which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless read as raw long nanos and truncated
    * to micros at load (integer `div`, not `/`: an epoch-nanos value
    * ~1.7e18 overflows double's 53-bit mantissa) — and plain
    * TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ. Branch on
    * the decoded type so either generation loads to the same
    * session-local TIMESTAMP column (sessions pin UTC, so the NTZ cast
    * is wall-clock identity and DuckDB hash-matches both ways). */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

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

  /** Exact-sum-based average rounded half-up to 2dp (reference rounds
    * stats to 2dp, /root/reference/main.py:251-254). ROUND(double) is NOT
    * portable — Spark rounds the shortest decimal representation while
    * DuckDB rounds the binary value, so they disagree on half-way cases
    * (e.g. 71.74/4). Instead: sum in integer cents, then half-up integer
    * rounding `floor((2S+n)/(2n))` evaluated with the same IEEE double
    * ops on both engines — identical inputs → identical bits. Exact while
    * a group's cent-sum < 2^53 (≈ $45T per group). */
  def moneyAvg2(c: Column): Column = {
    val s = sum((dec2(c) * 100).cast(LongType)).cast(DoubleType)
    val n = count(c).cast(DoubleType)
    floor((s * 2 + n) / (n * 2)) / lit(100.0)
  }

  /** Exact revenue sum: SUM(price * (1 - discount)) with decimal
    * intermediates (scale 4), cast to double. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(dec2(price) * (lit(BigDecimal(1).setScale(2)) - dec2(discount)))
      .cast(DoubleType)

  // Oracle-side (DuckDB) spellings of the same helpers.
  def oDec2(c: String): String = s"CAST($c AS DECIMAL(18,2))"
  def oMoneySum(c: String): String = s"CAST(SUM(${oDec2(c)}) AS DOUBLE)"
  def oMoneyAvg2(c: String): String =
    s"FLOOR((CAST(SUM(CAST(${oDec2(c)} * 100 AS BIGINT)) AS DOUBLE) * 2" +
      s" + CAST(COUNT($c) AS DOUBLE)) / (CAST(COUNT($c) AS DOUBLE) * 2)) / 100.0"
  def oRevenueSum(p: String, d: String): String =
    s"CAST(SUM(${oDec2(p)} * (CAST(1.00 AS DECIMAL(3,2)) - ${oDec2(d)})) AS DOUBLE)"
}
