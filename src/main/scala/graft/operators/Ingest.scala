package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Tables => T, QueryPack}

/** Ingest slice P1-P12 (SURVEY.md §2.2) — the reference's engine core:
  * the `ParseTaxiRecord` DoFn (`/root/reference/main.py:21-146`), which
  * fuses JSON parse → required-field validation → timestamp canonicalize →
  * temporal-order check → rounding projection → business-rule filter, with
  * a dead-letter side output (`main.py:291-293`,
  * `.with_outputs('invalid', main='valid')`).
  *
  * Spark-first decomposition: ONE declarative pass computes an
  * `error_type` column (null = valid); `valid`/`invalid` are two filters
  * over the same frame, so Catalyst plans a single scan feeding both
  * branches — the exact analog of Beam's tagged side outputs, with no
  * second read of the source.
  *
  * Input: raw taxi-trip JSON lines (FIXTURES.md §A1) synthesized
  * deterministically from the `events` table; `event_id % 10` selects a
  * corruption class so every reference error path
  * (`error_type ∈ {json_parsing_failed, missing_field,
  * invalid_timestamp_format, invalid_timestamp_order, validation_failed,
  * unexpected_error}`, `main.py:56-61,80-95,126-146`) is exercised and
  * DuckDB can compute the expected outcome analytically.
  *
  * Scale notes: everything is whole-stage-codegen expressions over one
  * scan — no UDFs, no collect. At 100 TB the valid/invalid split costs
  * one pass; both sinks append in parallel from the same stage.
  */
object Ingest extends QueryPack {

  /** Corruption classes by `event_id % 10` (5-9 = valid). */
  private val ModGarbage = 0      // not JSON at all          → json_parsing_failed
  private val ModMissing = 1      // no total_amount          → missing_field
  private val ModBadOrder = 2     // dropoff before pickup    → invalid_timestamp_order
  private val ModBadTs = 3        // unparseable pickup ts    → invalid_timestamp_format
  private val ModNegative = 4     // total_amount <= 0        → validation_failed
  private val ModBadVendor = 5    // vendor_id not a number   → unexpected_error
  private val ModNoTripId = 6     // trip_id absent           → valid, key synthesized (P3)

  /** Deterministic payload fields derived from events columns. */
  private def mod10: Column = col("event_id") % 10
  private def pickupStr: Column = {
    // ISO-8601 with 'T'; even ids carry the explicit Z suffix the
    // reference strips (`main.py:74-76`); class 3 is unparseable.
    val iso = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss")
    when(mod10 === ModBadTs, concat(lit("not-a-timestamp-"), col("event_id")))
      .when(col("event_id") % 2 === 0, concat(iso, lit("Z")))
      .otherwise(iso)
  }
  private def dropoffStr: Column = {
    val dropoff =
      expr("ts + make_interval(0, 0, 0, 0, 0, CAST(event_id % 115 + 5 AS INT), 0)")
    val badDrop = expr("ts - INTERVAL 10 MINUTES")
    date_format(when(mod10 === ModBadOrder, badDrop).otherwise(dropoff),
      "yyyy-MM-dd'T'HH:mm:ss")
  }

  /** Deterministic 12-decimal-place coordinate STRING in [0, mod/1e12):
    * integer picodegrees formatted as `<deg>.<12 digits>`. A decimal
    * string (never a double) keeps the downstream 9-dp rounding exact
    * and portable — both engines parse it to the same DECIMAL(16,12).
    * `mod` must be a multiple of 1e12 so the fractional part reduces to
    * `(event_id * mult) % 1e12` independently of the degree part. */
  private def coordStr(mult: Long, modPico: Long): Column = expr(
    s"concat(CAST(((event_id * $mult) % $modPico) div 1000000000000" +
      s" AS STRING), '.'," +
      s" lpad(CAST((event_id * $mult) % 1000000000000 AS STRING), 12, '0'))")

  /** S4-style in-memory JSONL synthesis: one raw JSON line per event
    * (generator analog: `taxi_trip_simulator.py:73-100`). */
  def rawRecords(s: SparkSession, dir: String): DataFrame = {
    // The events table arrives as one small parquet split; the JSON
    // build/parse work downstream is CPU-bound, so spread it across
    // whatever cores the cluster actually has (on a real cluster the
    // scan itself would carry the parallelism and this repartition
    // would be a no-op cost-wise).
    val ev = T.load(s, dir, "events")
      .repartition(s.sparkContext.defaultParallelism)
    val payload = to_json(struct(
      when(mod10 === ModNoTripId, lit(null).cast(StringType))
        .otherwise(concat(lit("trip_"), col("event_id"))).as("trip_id"),
      when(mod10 === ModBadVendor, lit("not-a-number"))
        .otherwise((col("user_id") % 2 + 1).cast(StringType)).as("vendor_id"),
      pickupStr.as("pickup_datetime"),
      dropoffStr.as("dropoff_datetime"),
      (col("event_id") % 5 + 1).as("passenger_count"),
      ((col("event_id") % 50).cast(DoubleType) / 2.0 + 0.5).as("trip_distance"),
      col("event_type").as("payment_type"),
      when(mod10 === ModNegative, -T.dec2(col("value")))
        .otherwise(T.dec2(col("value"))).as("total_amount"),
      col("user_id").as("pickup_location_id"),
      // 12-dp GPS coordinates the parser must round to 9 dp (P6,
      // main.py:108-111); latitudes in [0,90), longitudes in [0,180)
      coordStr(7919L, 90000000000000L).as("pickup_latitude"),
      coordStr(104729L, 180000000000000L).as("pickup_longitude"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .as("event_timestamp")))
    val raw =
      when(mod10 === ModGarbage, concat(lit("{not json at all "), col("event_id")))
        .when(mod10 === ModMissing,
          to_json(struct(
            concat(lit("trip_"), col("event_id")).as("trip_id"),
            pickupStr.as("pickup_datetime"),
            dropoffStr.as("dropoff_datetime"),
            ((col("event_id") % 50).cast(DoubleType) / 2.0 + 0.5).as("trip_distance"))))
        .otherwise(payload)
    ev.select(col("event_id"), raw.as("raw"))
  }

  /** P1-P9 + P12: parse + validate + normalize, producing `error_type`
    * (null = valid) and the canonical trip projection. Mirrors the check
    * order of `main.py:44-131`: json parse → required fields → timestamp
    * format → temporal order → field casts → business rules. */
  def parseRecords(raw: DataFrame, pipelineName: String): DataFrame = {
    // P1: permissive JSON parse into a string map; malformed → null map.
    // Every downstream field reference goes through the MATERIALIZED
    // `parsed` column, not the from_json expression itself — embedding
    // the expression would splice a fresh JSON parse into each of the
    // ~12 field lookups (observed in the executed plan: one
    // from_json(raw) per element_at), a 12× per-row parser bill.
    // Referencing the column keeps exactly one parse per row:
    // CollapseProject declines to inline an alias referenced this many
    // times, the same once-per-row discipline as Text.tokenHashes.
    def f(k: String): Column = element_at(col("parsed"), k)

    // P4: canonicalize ISO-8601 (strip Z like main.py:74-76) and parse.
    // try_* variants: ANSI mode (Spark 4 default) would otherwise THROW on
    // malformed input — the dead-letter path needs null-on-fail.
    def ts(k: String): Column =
      try_to_timestamp(regexp_replace(f(k), "Z$", ""))

    val required = Seq("pickup_datetime", "dropoff_datetime",
      "trip_distance", "total_amount")

    raw
      .withColumn("parsed", from_json(col("raw"), MapType(StringType, StringType)))
      .withColumn("pickup_ts", ts("pickup_datetime"))
      .withColumn("dropoff_ts", ts("dropoff_datetime"))
      .withColumn("vendor_id_l", f("vendor_id").try_cast(LongType))
      // try_cast EVERY untrusted numeric: plain ANSI casts would crash
      // the whole job on one malformed field instead of dead-lettering
      // it (the reference's catch-all, main.py:140-146).
      .withColumn("distance_d", f("trip_distance").try_cast(DoubleType))
      .withColumn("total_d", f("total_amount").try_cast(DoubleType))
      .withColumn("error_type",
        when(col("parsed").isNull, "json_parsing_failed")                 // P1
          .when(required.map(f(_).isNull).reduce(_ || _), "missing_field") // P2
          .when(col("pickup_ts").isNull || col("dropoff_ts").isNull,
            "invalid_timestamp_format")                                    // P4
          .when(col("pickup_ts") >= col("dropoff_ts"),
            "invalid_timestamp_order")                                     // P5
          // field present (P2 passed) but not numeric → the reference's
          // ValueError catch-all path
          .when(col("distance_d").isNull || col("total_d").isNull,
            "unexpected_error")                                            // P12
          .when(col("distance_d") <= 0 || col("total_d") <= 0,
            "validation_failed")                                           // P9
          // optional fields present but unparsable → the same catch-all
          // (silently nulling them into the valid branch would be data
          // loss the reference's ValueError handler prevents)
          .when((col("vendor_id_l").isNull && f("vendor_id").isNotNull) ||
              (f("passenger_count").isNotNull &&
                f("passenger_count").try_cast(LongType).isNull) ||
              (f("pickup_location_id").isNotNull &&
                f("pickup_location_id").try_cast(LongType).isNull) ||
              (f("pickup_latitude").isNotNull &&
                f("pickup_latitude").try_cast(DecimalType(16, 12)).isNull) ||
              (f("pickup_longitude").isNotNull &&
                f("pickup_longitude").try_cast(DecimalType(16, 12)).isNull),
            "unexpected_error")                                            // P12
          .otherwise(lit(null).cast(StringType)))
      .withColumn("trip_id",                                               // P3
        coalesce(f("trip_id"),
          concat(lit("gen_"), f("pickup_location_id"), lit("_"),
            unix_timestamp(col("pickup_ts")))))
      .withColumn("passenger_count", f("passenger_count").try_cast(LongType))
      .withColumn("trip_distance", col("distance_d"))
      .withColumn("payment_type", f("payment_type"))
      .withColumn("total_amount", round(col("total_d"), 2))                // P6
      // P6 coordinate path: GPS coordinates round to NINE decimal
      // places (not two — main.py:108-111). Rounding happens in
      // DECIMAL: the raw value parses exactly from its decimal string,
      // and DECIMAL ROUND is half-up in both engines, unlike
      // ROUND(double) which is not portable.
      .withColumn("pickup_latitude",
        round(f("pickup_latitude").try_cast(DecimalType(16, 12)), 9)
          .cast(DecimalType(13, 9)))
      .withColumn("pickup_longitude",
        round(f("pickup_longitude").try_cast(DecimalType(16, 12)), 9)
          .cast(DecimalType(13, 9)))
      .withColumn("pickup_location_id",
        f("pickup_location_id").try_cast(LongType))
      // P7: event_timestamp is parsed but never projected (dropped).
      .withColumn("created_at", current_timestamp())                       // P8
      .withColumn("pipeline_name", lit(pipelineName))
  }

  /** P10: the valid main output. */
  def valid(parsed: DataFrame): DataFrame =
    parsed.filter(col("error_type").isNull)

  /** P10: the dead-letter side output, shaped like the reference's
    * invalid payload (`main.py:56-61`, FIXTURES.md §A4). */
  def invalid(parsed: DataFrame): DataFrame =
    parsed.filter(col("error_type").isNotNull)
      .select(
        concat(lit("Record failed: "), col("error_type")).as("error"),
        col("raw").as("record"),
        col("error_type"),
        col("pipeline_name"))

  /** The parsed frame behind every p-query, MATERIALIZED. The barrier is
    * load-bearing for cost, not correctness: valid()/invalid() filter on
    * `error_type`, and predicate pushdown substitutes an attribute with
    * its defining expression when pushing a filter through a Project —
    * the pushed condition inlined the whole from_json(raw) parse once
    * per field reference (23 copies, measured in the p02 physical plan)
    * AND landed below the repartition, so the 23× parse bill ran on the
    * scan's single input split. The checkpoint pins the parse at one
    * evaluation per row, after the repartition's full parallelism. */
  def pipeline(s: SparkSession, dir: String): DataFrame = {
    graft.core.SessionCaches.prune(pipelineCache)
    pipelineCache.computeIfAbsent((s, dir), _ =>
      graft.core.Barriers.materialize(
        parseRecords(rawRecords(s, dir), "graft-batch")))
  }

  /** Process-level cache of the materialized parse frame per (session,
    * dir) — the candCache discipline: p01/p02/p03 consume the
    * IDENTICAL parsed frame, and before this cache each invocation
    * re-ran the full JSON parse into a fresh checkpoint (the parse is
    * the family's dominant cost; the barrier itself is load-bearing —
    * see the pushdown note above — so caching the barrier's OUTPUT is
    * the only place the reuse can live). */
  private val pipelineCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  /** P10 dead-letter routing: invalid counts per error_type — the
    * reference's error-table content by class. */
  private val deadLetterCounts: Q = (s, dir) =>
    invalid(pipeline(s, dir))
      .groupBy(col("error_type"), col("pipeline_name"))
      .agg(count(lit(1)).as("n_errors"))
      .orderBy("error_type")

  /** Valid-branch hourly stats — the `hourly_trip_stats` computation fed
    * by the REAL parse pipeline (parse → validate → aggregate), i.e. the
    * reference's batch DAG end-to-end (`main.py:280-330`). */
  private val validHourlyAgg: Q = (s, dir) =>
    valid(pipeline(s, dir))
      .groupBy(
        date_trunc("hour", col("pickup_ts")).as("stat_hour"),
        col("payment_type"))
      .agg(
        count(lit(1)).as("trip_count"),
        T.moneyAvg2(col("total_amount")).as("avg_total"),
        round(T.moneySum(col("total_amount")), 2).as("total_revenue"))
      .orderBy("stat_hour", "payment_type")

  /** P3/P4/P6/P7 normalize projection of the valid branch (canonical trip
    * rows, `created_at` excluded — wall-clock is not oracle-comparable;
    * its presence is asserted in IngestSpec). */
  private val normalizedProjection: Q = (s, dir) =>
    valid(pipeline(s, dir))
      .select(col("trip_id"), col("vendor_id_l").as("vendor_id"),
        col("pickup_ts").as("pickup_datetime"),
        col("dropoff_ts").as("dropoff_datetime"),
        col("passenger_count"), col("trip_distance"),
        col("payment_type"), col("total_amount"),
        col("pickup_location_id"),
        // DECIMAL(13,9) → DOUBLE at the output boundary only (the 9-dp
        // half-up round itself stays in exact decimal): the driver's
        // hash stringifies values, and decimal-typed outputs keep
        // trailing zeros the oracle path drops (r5 hash mismatch).
        // unscaled |lat|*10^9 < 2^53, so nearest-double conversion is
        // identical in Spark and DuckDB.
        col("pickup_latitude").cast("double").as("pickup_latitude"),
        col("pickup_longitude").cast("double").as("pickup_longitude"))
      .orderBy("trip_id")

  /** P11: pass-through parse + count (simple_batch_processor.py:16-30):
    * per-class record counts over the whole input, valid + invalid. */
  private val passthroughCount: Q = (s, dir) =>
    // No filter on error_type → no predicate-pushdown re-inlining (the
    // reason pipeline() checkpoints) → the barrier would be pure cost
    // here: use the raw parse plan (one from_json per row already).
    parseRecords(rawRecords(s, dir), "graft-batch")
      .agg(
        count(lit(1)).as("n_records"),
        count(when(col("error_type").isNull, 1)).as("n_valid"),
        count(when(col("error_type").isNotNull, 1)).as("n_invalid"))

  val queries: Map[String, Q] = Map(
    "p01_dead_letter_counts" -> deadLetterCounts,
    "p02_valid_hourly_agg" -> validHourlyAgg,
    "p03_normalized_projection" -> normalizedProjection,
    "p04_passthrough_count" -> passthroughCount)

  // Oracles compute the EXPECTED pipeline outcome analytically from the
  // events table: the corruption class is event_id % 10, AND the business
  // rule applies to every class that reaches it — a zero-value event in a
  // "valid" class is still validation_failed (value = 0 rows exist from
  // sf0.1 up; class-only oracles break there).
  private val oracleValid =
    "event_id % 10 NOT IN (0, 1, 2, 3, 4, 5) AND value > 0"

  /** DuckDB replay of [[coordStr]] + the parser's 9-dp DECIMAL round. */
  private def oCoord9(mult: Long, modPico: Long): String =
    s"CAST(ROUND(CAST(concat(CAST(((event_id * $mult) % $modPico)" +
      s" // 1000000000000 AS VARCHAR), '.'," +
      s" lpad(CAST((event_id * $mult) % 1000000000000 AS VARCHAR), 12, '0'))" +
      s" AS DECIMAL(16,12)), 9) AS DECIMAL(13,9))"
  private val oracleErrorType =
    """CASE
      |    WHEN event_id % 10 = 0 THEN 'json_parsing_failed'
      |    WHEN event_id % 10 = 1 THEN 'missing_field'
      |    WHEN event_id % 10 = 2 THEN 'invalid_timestamp_order'
      |    WHEN event_id % 10 = 3 THEN 'invalid_timestamp_format'
      |    WHEN event_id % 10 = 4 THEN 'validation_failed'
      |    WHEN value <= 0 THEN 'validation_failed'
      |    WHEN event_id % 10 = 5 THEN 'unexpected_error' END""".stripMargin

  val oracle: Map[String, String] = Map(
    "p01_dead_letter_counts" ->
      s"""SELECT $oracleErrorType AS error_type,
         |  'graft-batch' AS pipeline_name, COUNT(*) AS n_errors
         |FROM events WHERE event_id % 10 <= 5 OR value <= 0
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "p02_valid_hourly_agg" ->
      s"""SELECT date_trunc('hour', ts) AS stat_hour,
         |  event_type AS payment_type, COUNT(*) AS trip_count,
         |  ${T.oMoneyAvg2("value")} AS avg_total,
         |  ROUND(${T.oMoneySum("value")}, 2) AS total_revenue
         |FROM events WHERE $oracleValid
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "p03_normalized_projection" ->
      s"""SELECT
         |  CASE WHEN event_id % 10 = 6
         |    THEN 'gen_' || user_id || '_' ||
         |      CAST(CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS VARCHAR)
         |    ELSE 'trip_' || event_id END AS trip_id,
         |  user_id % 2 + 1 AS vendor_id,
         |  date_trunc('second', ts) AS pickup_datetime,
         |  date_trunc('second', ts) + INTERVAL 1 MINUTE * (event_id % 115 + 5)
         |    AS dropoff_datetime,
         |  event_id % 5 + 1 AS passenger_count,
         |  CAST(event_id % 50 AS DOUBLE) / 2.0 + 0.5 AS trip_distance,
         |  event_type AS payment_type,
         |  CAST(${T.oDec2("value")} AS DOUBLE) AS total_amount,
         |  user_id AS pickup_location_id,
         |  CAST(${oCoord9(7919L, 90000000000000L)} AS DOUBLE)
         |    AS pickup_latitude,
         |  CAST(${oCoord9(104729L, 180000000000000L)} AS DOUBLE)
         |    AS pickup_longitude
         |FROM events WHERE $oracleValid
         |ORDER BY trip_id""".stripMargin,
    "p04_passthrough_count" ->
      s"""SELECT COUNT(*) AS n_records,
         |  COUNT(CASE WHEN $oracleValid THEN 1 END) AS n_valid,
         |  COUNT(CASE WHEN NOT ($oracleValid) THEN 1 END) AS n_invalid
         |FROM events""".stripMargin)
}
