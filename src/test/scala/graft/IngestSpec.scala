package graft

import org.apache.spark.sql.functions._
import graft.operators.Ingest

/** P1-P12 semantics against the reference's invalid-input fixtures
  * (FIXTURES.md §A1 invalid cases; /root/reference/PRD.md:3065-3087):
  * missing required field, non-JSON bytes, negative total_amount,
  * pickup >= dropoff, malformed timestamp. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val validLine =
    """{"trip_id":"t1","vendor_id":1,"pickup_datetime":"2025-05-16T16:45:26",
      |"dropoff_datetime":"2025-05-16T17:50:26","passenger_count":1,
      |"trip_distance":4.47,"payment_type":"card","total_amount":136.79,
      |"pickup_location_id":161}""".stripMargin.replaceAll("\n", "")

  private def classify(lines: Seq[String]): Map[String, Seq[String]] = {
    val raw = lines.toDF("raw").withColumn("event_id", monotonically_increasing_id())
    val parsed = Ingest.parseRecords(raw, "spec")
    parsed.select(col("raw"), coalesce(col("error_type"), lit("VALID")))
      .as[(String, String)].collect().toSeq
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
  }

  test("valid record passes through with no error_type") {
    val m = classify(Seq(validLine))
    assert(m.keySet == Set("VALID"))
  }

  test("P6: GPS coordinates round to 9 dp half-up, in DECIMAL (never double)") {
    // half-way tail ...500 must round UP (the reference's round(x, 9),
    // main.py:108-111) — and exactly the same way the DuckDB oracle
    // rounds it, which only holds on the DECIMAL path
    val line = validLine.dropRight(1) +
      ""","pickup_latitude":"41.123456789500","pickup_longitude":"73.000000000499"}"""
    val raw = Seq(line).toDF("raw")
      .withColumn("event_id", monotonically_increasing_id())
    val row = Ingest.parseRecords(raw, "spec")
      .select(col("pickup_latitude").cast("string"),
        col("pickup_longitude").cast("string"))
      .as[(String, String)].head()
    assert(row._1 == "41.123456790", s"half-way tail must round up: ${row._1}")
    assert(row._2 == "73.000000000", s"below-half tail must round down: ${row._2}")
  }

  test("unparsable OPTIONAL coordinate dead-letters as unexpected_error (P12)") {
    val line = validLine.dropRight(1) +
      ""","pickup_latitude":"not-a-coordinate"}"""
    val m = classify(Seq(line))
    assert(m.keySet == Set("unexpected_error"),
      s"bad coordinate must dead-letter, got ${m.keySet}")
  }

  test("non-JSON bytes → json_parsing_failed") {
    val m = classify(Seq("definitely not json {{{"))
    assert(m.keySet == Set("json_parsing_failed"))
  }

  test("missing required field → missing_field") {
    val noTotal = validLine.replace(""","total_amount":136.79""", "")
    val m = classify(Seq(noTotal))
    assert(m.keySet == Set("missing_field"))
  }

  test("malformed pickup timestamp → invalid_timestamp_format") {
    val badTs = validLine.replace("2025-05-16T16:45:26", "yesterday-ish")
    val m = classify(Seq(badTs))
    assert(m.keySet == Set("invalid_timestamp_format"))
  }

  test("pickup >= dropoff → invalid_timestamp_order") {
    val swapped = validLine
      .replace("2025-05-16T16:45:26", "2025-05-16T18:00:00")
    val m = classify(Seq(swapped))
    assert(m.keySet == Set("invalid_timestamp_order"))
  }

  test("negative total_amount → validation_failed") {
    val neg = validLine.replace("136.79", "-5.0")
    val m = classify(Seq(neg))
    assert(m.keySet == Set("validation_failed"))
  }

  test("non-numeric required field dead-letters as unexpected_error, not a crash") {
    val bad = validLine.replace("4.47", "\"n/a\"")
    val m = classify(Seq(bad))
    assert(m.keySet == Set("unexpected_error"))
  }

  test("non-numeric OPTIONAL field dead-letters too, never silently nulls") {
    val badPax = validLine.replace(""""passenger_count":1""",
      """"passenger_count":"two"""")
    assert(classify(Seq(badPax)).keySet == Set("unexpected_error"))
    val badLoc = validLine.replace(""""pickup_location_id":161""",
      """"pickup_location_id":"x"""")
    assert(classify(Seq(badLoc)).keySet == Set("unexpected_error"))
  }

  test("Z-suffixed ISO timestamp is canonicalized, not rejected") {
    val zulu = validLine
      .replace("2025-05-16T16:45:26", "2025-05-16T16:45:26Z")
    val m = classify(Seq(zulu))
    assert(m.keySet == Set("VALID"))
  }

  test("missing trip_id is synthesized (P3) and created_at added (P8)") {
    val noId = validLine.replace(""""trip_id":"t1",""", "")
    val raw = Seq(noId).toDF("raw")
    val row = Ingest.valid(Ingest.parseRecords(raw, "spec"))
      .select("trip_id", "created_at").collect().head
    assert(row.getString(0).startsWith("gen_161_"))
    assert(!row.isNullAt(1))
  }

  test("dead-letter payload carries the reference's four fields (P10)") {
    val inv = Ingest.invalid(
      Ingest.parseRecords(Seq("nope").toDF("raw"), "spec-pipe"))
    val row = inv.collect().head
    assert(inv.columns.toSeq ==
      Seq("error", "record", "error_type", "pipeline_name"))
    assert(row.getAs[String]("record") == "nope")
    assert(row.getAs[String]("pipeline_name") == "spec-pipe")
  }

  test("valid/invalid split covers every input exactly once (P10)") {
    val lines = Seq(validLine, "garbage", validLine.replace("136.79", "-1"))
    val parsed = Ingest.parseRecords(lines.toDF("raw"), "spec")
    assert(Ingest.valid(parsed).count() + Ingest.invalid(parsed).count()
      == lines.size)
  }
}
