package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming
import graft.operators.Ingest
import graft.core.{Tables => T}

/** T1-T6: the REAL Structured Streaming path — readStream/MemoryStream
  * sources, watermarked tumbling windows, writeStream sinks, and the
  * streaming dead-letter branch — asserted against the equivalent batch
  * computation (Structured Streaming's correctness contract). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsStatic = T.load(spark, sfDir, "events").limit(2000).cache()

  test("T1/T5: streamed tumbling window agg equals batch computation") {
    implicit val sqlCtx = spark.sqlContext
    val static = eventsStatic
      .select($"ts", $"event_type", $"value").as[(java.sql.Timestamp, String, Double)]
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")

    val q = Streaming.windowedStats(streamDf, "ts", "value", "event_type")
      .writeStream.format("memory").queryName("t1_windows")
      .outputMode("append").start()
    try {
      mem.addData(static.collect().toSeq)
      q.processAllAvailable()
      // Append mode emits only watermark-closed windows; advance the
      // watermark far past the data with one sentinel event, then drop it.
      mem.addData(Seq((java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), "sentinel", 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("t1_windows")
      .filter($"event_type" =!= "sentinel")
      .orderBy("window_start", "event_type")
      .collect().toSeq
    val batch = Streaming.windowedStats(
        eventsStatic.select($"ts", $"event_type", $"value"),
        "ts", "value", "event_type")
      .orderBy("window_start", "event_type")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("T2: window_start/window_end metadata is projected") {
    val row = Streaming.windowedStats(eventsStatic, "ts", "value", "event_type")
      .select("window_start", "window_end", "stat_hour").limit(1).collect().head
    val (start, end) = (row.getTimestamp(0), row.getTimestamp(1))
    assert(end.getTime - start.getTime == 60000L)
  }

  test("T4: lateness parameter reaches the watermark") {
    // On batch inputs EliminateEventTimeWatermark drops the node (that
    // elimination is itself the batch≡stream design), so assert on a
    // genuinely streaming frame where the watermark must survive.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val plan = Streaming.windowedStats(
        mem.toDF().toDF("ts", "event_type", "value"),
        "ts", "value", "event_type",
        Streaming.Config(lateness = "5 minutes"))
      .queryExecution.logical.toString
    assert(plan.contains("5 minutes"))
  }

  test("T3/T6/S3: file-source stream with dead-letter branch routes every line once") {
    val inDir = Files.createTempDirectory("graft_stream_in").toString
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString
    // JSONL input: taxi-shaped lines from the ingest synthesizer (real
    // file source = the engine's Pub/Sub stand-in, SURVEY §2.1 S3).
    Ingest.rawRecords(spark, sfDir).limit(1000).select("raw")
      .write.mode("overwrite").text(inDir)

    val rawStream = spark.readStream.textFile(inDir).toDF("raw")
    val parsed = Ingest.parseRecords(rawStream, "graft-streaming")
    val validQ = parsed.filter(col("error_type").isNull)
      .writeStream.format("memory").queryName("t6_valid")
      .option("checkpointLocation", s"$ckDir/valid")
      .outputMode("append").start()
    val deadQ = Streaming.deadLetters(rawStream, "graft-streaming")
      .writeStream.format("memory").queryName("t6_dead")
      .option("checkpointLocation", s"$ckDir/dead")
      .outputMode("append").start()
    try { validQ.processAllAvailable(); deadQ.processAllAvailable() }
    finally { validQ.stop(); deadQ.stop() }

    val nValid = spark.table("t6_valid").count()
    val nDead = spark.table("t6_dead").count()
    assert(nValid + nDead == 1000)
    val types = spark.table("t6_dead").select("error_type")
      .distinct().as[String].collect().toSet
    assert(types.contains("json_parsing_failed"))
    assert(spark.table("t6_dead").columns.toSeq ==
      Seq("error", "record", "error_type", "pipeline_name"))
  }
}
