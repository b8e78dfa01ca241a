package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Tables => T, QueryPack, Scratch}
import graft.operators.Ingest

/** Scan/source/sink operators S1/S2/S5/S6/S8/S9 + U1 (SURVEY.md §2.1,
  * §2.7).
  *
  * Reference semantics reproduced:
  *  - S1 JSONL file scan with declared schema
  *    (`/root/reference/main.py:283-286`, parse `main.py:44-50`)
  *  - S2 CSV scan: header, per-field casts, null defaults
  *    (`PRD.md:330-368`, `scripts/generate_sample_data.py:115-138`)
  *  - S5 append table sink, WRITE_APPEND (`main.py:297-304`)
  *  - S6 error-table sink with inline schema
  *    (`src/dataflow/streaming_taxi_processor.py:200-208`)
  *  - S8 parquet export (`PRD.md:1378-1393`)
  *  - S9 federated second source + U1 UNION ALL
  *    (`PRD.md:1300-1357`, `README.md:638-640`)
  *
  * Each query is a full round-trip: derive deterministic content from the
  * test tables, WRITE it through the sink under bench scratch, READ it
  * back through the scan, and aggregate — so the oracle (an analytic
  * query over the original parquet) checks writer and reader together.
  *
  * Scale notes: file sinks/scans shard naturally (one task per partition
  * on write, split-per-128MB on read); the JSONL/CSV readers are given
  * explicit schemas so Spark never runs an inference pass over 100 TB.
  * The federated union is by-position UNION ALL — no shuffle, just
  * concatenated partitions.
  */
object Sources extends QueryPack {

  private def scratch(name: String): String = Scratch.dir(name)

  /** Declared schema for raw taxi-trip JSONL (FIXTURES.md §A1) — the
    * engine never schema-infers (SURVEY §1.3). */
  val tripJsonSchema: StructType = StructType(Seq(
    StructField("trip_id", StringType),
    StructField("vendor_id", StringType),
    StructField("pickup_datetime", StringType),
    StructField("dropoff_datetime", StringType),
    StructField("passenger_count", LongType),
    StructField("trip_distance", DoubleType),
    StructField("payment_type", StringType),
    StructField("total_amount", DoubleType),
    StructField("pickup_location_id", LongType),
    StructField("event_timestamp", StringType)))

  /** S1: schema'd JSONL scan. Writes the synthesized raw event lines as
    * text, reads them back with `spark.read.schema(...).json`, and
    * aggregates the parsed rows per payment type. Corrupt lines yield
    * all-null rows (PERMISSIVE) and are filtered like the dead-letter
    * branch. */
  private val jsonlScan: Q = (s, dir) => {
    val path = scratch("s01_jsonl")
    Ingest.rawRecords(s, dir).select("raw")
      .write.mode(SaveMode.Overwrite).text(path)
    s.read.schema(tripJsonSchema).json(path)
      .filter(col("payment_type").isNotNull &&
        col("total_amount").isNotNull && col("total_amount") > 0)
      .groupBy(col("payment_type"))
      .agg(count(lit(1)).as("n_rows"),
        round(T.moneySum(col("total_amount")), 2).as("sum_total"))
      .orderBy("payment_type")
  }

  /** S2: CSV scan with header + declared schema + null defaults
    * (`PRD.md:330-368`). Round-trips a lineitem projection through CSV
    * and re-aggregates; absent discounts default to 0 like the
    * reference's positional-parse defaults. */
  private val csvScan: Q = (s, dir) => {
    val path = scratch("s02_csv")
    T.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        // a deliberately sparse column: nulls exercise the default path
        when(col("l_discount") > 0.05, col("l_discount")).as("l_discount"),
        col("l_returnflag"), col("l_shipdate"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_shipdate", TimestampType)))
    s.read.option("header", "true").schema(schema).csv(path)
      .withColumn("l_discount", coalesce(col("l_discount"), lit(0.0)))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        round(T.revenueSum(col("l_extendedprice"), col("l_discount")), 2)
          .as("revenue"),
        count(to_date(col("l_shipdate"))).as("n_dates"))
      .orderBy("l_returnflag")
  }

  /** S5: append sink. Overwrite one month of orders, append a second
    * month, read the table back — counts prove WRITE_APPEND added rather
    * than replaced (`main.py:297-304`). */
  private val appendSink: Q = (s, dir) => {
    val path = scratch("s05_append")
    val o = T.load(s, dir, "orders")
    o.filter(month(col("o_orderdate")) === 1)
      .write.mode(SaveMode.Overwrite).parquet(path)
    o.filter(month(col("o_orderdate")) === 2)
      .write.mode(SaveMode.Append).parquet(path)
    s.read.parquet(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        round(T.moneySum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** S6+S8: dead letters → error table (inline schema) → parquet export →
    * read back. The checked counts must equal the in-flight p01 counts —
    * the sink/scan round-trip loses nothing. */
  private val errorSink: Q = (s, dir) => {
    val path = scratch("s06_errors")
    val errorSchema = StructType(Seq(
      StructField("error", StringType),
      StructField("record", StringType),
      StructField("error_type", StringType),
      StructField("pipeline_name", StringType)))
    // Ingest.pipeline, not a bare parseRecords: the invalid() filter
    // otherwise re-inlines the whole parse per field reference (see the
    // pipeline scaladoc; the p-family fix applies here identically).
    val invalid = Ingest.invalid(Ingest.pipeline(s, dir))
    // enforce the declared sink schema declaratively (stays inside
    // codegen; a schema drift fails analysis, not a mid-write task)
    invalid.select(errorSchema.fields.toIndexedSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
    s.read.schema(errorSchema).parquet(path)
      .groupBy(col("error_type"))
      .agg(count(lit(1)).as("n_errors"))
      .orderBy("error_type")
  }

  /** S9+U1: federated second source + UNION ALL. A second "cloud" copy
    * of high-value orders is exported, then queried alongside the native
    * table as one UNION ALL frame (`PRD.md:1342-1346`). */
  private val federatedUnion: Q = (s, dir) => {
    val path = scratch("s09_federated")
    val o = T.load(s, dir, "orders")
    o.filter(col("o_totalprice") > 200000.0)
      .withColumn("o_source", lit("aws"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    val native = o.withColumn("o_source", lit("gcp"))
    val federated = s.read.parquet(path)
      .select(native.columns.map(col).toIndexedSeq: _*) // align by position
    native.union(federated)
      .groupBy(col("o_source"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("o_source", "o_orderpriority")
  }

  /** S-ext: ORC round-trip — the second columnar format a lakehouse
    * ingests beside parquet (the reference's federated sources are
    * format-heterogeneous by design, `PRD.md:1300-1357`). Projection +
    * predicate push into the ORC reader the same as parquet
    * (`PushedFilters` in the scan), so the scan-level pruning story
    * carries over; writer shards one file per partition. */
  private val orcRoundtrip: Q = (s, dir) => {
    val path = scratch("s10_orc")
    T.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .write.mode(SaveMode.Overwrite).orc(path)
    s.read.orc(path)
      .filter(col("o_totalprice") > 100000.0)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        round(T.moneySum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** S11: the native DataSourceV2 generator ([[SeqSource]], the
    * reference's publisher side as a `TableProvider`) driven through
    * a real query: an event_id range predicate that must PUSH into
    * the source (pruning generated splits — SeqSourceSpec asserts the
    * partition count), then a per-type rollup. The oracle recomputes
    * the identical rows from DuckDB `range()` via the shared portable
    * mixer — a data SOURCE held to the same engine-replayability bar
    * as the hash signatures. */
  private val generatedSource: Q = (s, dir) => {
    s.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "100000").option("slices", "8").load()
      .filter(col("event_id") >= 20000 && col("event_id") < 60000)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(T.moneySum(col("value")), 2).as("sum_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .orderBy("event_type")
  }

  /** S12: corrupt-file-resilient scan — the 100 TB operational reality
    * that a directory of millions of objects contains a truncated or
    * garbage file eventually (failed writer, partial upload), and one
    * bad object must not kill an hours-long job. Plants real garbage:
    * a junk `.parquet` (not parquet at all) and a TRUNCATED copy of a
    * real footer-less parquet file beside the valid data, then scans
    * with `spark.sql.files.ignoreCorruptFiles` per-read (option, not a
    * session flip). The aggregate must equal the clean-table oracle —
    * proving both that corrupt objects are skipped AND that no valid
    * row is lost with them. */
  private val resilientScan: Q = (s, dir) => {
    val path = scratch("s12_resilient")
    val o = T.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    o.write.mode(SaveMode.Overwrite).parquet(path)
    val dirPath = java.nio.file.Paths.get(path)
    java.nio.file.Files.write(dirPath.resolve("part-junk.parquet"),
      Array.tabulate[Byte](4096)(i => (i * 37 % 251).toByte))
    val listing = java.nio.file.Files.list(dirPath)
    val firstValid =
      try {
        val it = listing.iterator()
        var found: java.nio.file.Path = null
        while (it.hasNext && found == null) {
          val p = it.next()
          if (p.getFileName.toString.startsWith("part-0")) found = p
        }
        found
      } finally listing.close()
    val bytes = java.nio.file.Files.readAllBytes(firstValid)
    java.nio.file.Files.write(dirPath.resolve("part-truncated.parquet"),
      bytes.take(math.max(8, bytes.length / 3)))
    s.read.option("ignoreCorruptFiles", "true").parquet(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        round(T.moneySum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, Q] = Map(
    "s12_resilient_scan" -> resilientScan,
    "s11_generated_source" -> generatedSource,
    "s01_jsonl_scan" -> jsonlScan,
    "s02_csv_scan" -> csvScan,
    "s05_append_sink" -> appendSink,
    "s06_error_sink" -> errorSink,
    "s09_federated_union" -> federatedUnion,
    "s10_orc_roundtrip" -> orcRoundtrip)

  val oracle: Map[String, String] = Map(
    // the resilient scan must see exactly the clean table — corrupt
    // planted files skipped, zero valid rows lost with them
    "s12_resilient_scan" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
         |  ROUND(${T.oMoneySum("o_totalprice")}, 2) AS sum_price
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // the generator formula replayed row for row from range(): same
    // mixer, same distribution cuts, same micros arithmetic
    "s11_generated_source" -> {
      import graft.functions.Text
      val roll = Text.oPortableMixWideSql("i * 5 + 2")
      val vmix = Text.oPortableMixWideSql("i * 7 + 3")
      val tmix = Text.oPortableMixWideSql("i * 11 + 4")
      s"""WITH m AS (
         |  SELECT i, ($roll) % 100 AS roll,
         |    ($vmix) % 10000 AS vraw,
         |    ($tmix) % 2592000 AS toff
         |  FROM range(20000, 60000) t(i)),
         |g AS (
         |  SELECT CASE WHEN roll < 40 THEN 'view'
         |      WHEN roll < 65 THEN 'click'
         |      WHEN roll < 80 THEN 'purchase'
         |      WHEN roll < 95 THEN 'signup'
         |      ELSE 'error' END AS event_type,
         |    vraw / 100.0 AS value,
         |    make_timestamp((1704067200 + toff) * 1000000) AS ts
         |  FROM m)
         |SELECT event_type, COUNT(*) AS n_events,
         |  ROUND(${T.oMoneySum("value")}, 2) AS sum_value,
         |  MIN(ts) AS first_ts, MAX(ts) AS last_ts
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // Classes 0/1 never parse a payment_type; class 4's total is negated;
    // the scan-side filter also requires total > 0, which additionally
    // drops zero-value events of ANY surviving class (present from sf0.1).
    "s01_jsonl_scan" ->
      s"""SELECT event_type AS payment_type, COUNT(*) AS n_rows,
         |  ROUND(${T.oMoneySum("value")}, 2) AS sum_total
         |FROM events
         |WHERE event_id % 10 NOT IN (0, 1, 4) AND value > 0
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s02_csv_scan" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_rows,
         |  ROUND(CAST(SUM(${T.oDec2("l_extendedprice")} *
         |    (CAST(1.00 AS DECIMAL(3,2)) - CASE WHEN l_discount > 0.05
         |      THEN ${T.oDec2("l_discount")}
         |      ELSE CAST(0 AS DECIMAL(18,2)) END)) AS DOUBLE), 2)
         |    AS revenue,
         |  COUNT(l_shipdate) AS n_dates
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "s05_append_sink" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
         |  ROUND(${T.oMoneySum("o_totalprice")}, 2) AS sum_price
         |FROM orders
         |WHERE month(o_orderdate) IN (1, 2)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s06_error_sink" ->
      """SELECT CASE
        |    WHEN event_id % 10 = 0 THEN 'json_parsing_failed'
        |    WHEN event_id % 10 = 1 THEN 'missing_field'
        |    WHEN event_id % 10 = 2 THEN 'invalid_timestamp_order'
        |    WHEN event_id % 10 = 3 THEN 'invalid_timestamp_format'
        |    WHEN event_id % 10 = 4 THEN 'validation_failed'
        |    WHEN value <= 0 THEN 'validation_failed'
        |    WHEN event_id % 10 = 5 THEN 'unexpected_error' END AS error_type,
        |  COUNT(*) AS n_errors
        |FROM events WHERE event_id % 10 <= 5 OR value <= 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s09_federated_union" ->
      """SELECT o_source, o_orderpriority, COUNT(*) AS n_rows
        |FROM (
        |  SELECT o_orderpriority, 'gcp' AS o_source FROM orders
        |  UNION ALL
        |  SELECT o_orderpriority, 'aws' AS o_source FROM orders
        |  WHERE o_totalprice > 200000.0)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s10_orc_roundtrip" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_rows,
         |  ROUND(${T.oMoneySum("o_totalprice")}, 2) AS sum_price
         |FROM orders WHERE o_totalprice > 100000.0
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
