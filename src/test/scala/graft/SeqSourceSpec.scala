package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.SeqSource

/** The DataSourceV2 generator: filter pushdown must PRUNE generated
  * splits, column pruning must reach the reader, and the emitted rows
  * must equal the portable-mixer formula they claim to implement. */
class SeqSourceSpec extends SparkSpec {

  private def read(rows: Long = 100000L, slices: Int = 8): DataFrame =
    spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", rows.toString).option("slices", slices.toString)
      .load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("event_id range pushdown prunes generated splits") {
    val full = read().filter(col("event_id") >= 20000 &&
      col("event_id") < 60000)
    // 8 splits of 12.5k ids; [20k, 60k) overlaps splits 1-4 → 4 survive
    val parts = scanOf(full).inputRDD.getNumPartitions
    assert(parts == 4, s"expected 4 pruned splits, scan has $parts")
    assert(full.count() == 40000L)
    // the accepted filters are consumed: no post-scan Filter re-checks
    // the range (a residual filter would show as a Filter node above
    // the scan re-evaluating event_id bounds)
    val plan = full.queryExecution.executedPlan.toString
    // a residual filter would appear as its own "Filter (...)" node;
    // the scan's "RuntimeFilters: []" label is not one
    val residual = plan.linesIterator.exists(l =>
      l.contains("Filter ") && !l.contains("RuntimeFilters"))
    assert(!residual, s"pushed range still filtered post-scan:\n$plan")
    assert(plan.contains("bounds=[20000, 60000)"),
      s"pushed bounds missing from scan description:\n$plan")
  }

  test("column pruning reaches the reader's schema") {
    val df = read().filter(col("event_id") < 1000)
      .select(col("event_type"))
    val rs = scanOf(df).scan.readSchema().fieldNames.toSet
    assert(rs == Set("event_type"),
      s"reader materializes more than requested: $rs")
    assert(df.count() == 1000L)
  }

  test("rows equal the portable-mixer formula, column by column") {
    val got = read().filter(col("event_id") === 12345L).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == 12345L)
    assert(r.getTimestamp(1).toInstant.toEpochMilli * 1000L ==
      SeqSource.tsMicros(12345L))
    assert(r.getLong(2) == SeqSource.userId(12345L))
    assert(r.getString(3) == SeqSource.eventType(12345L))
    assert(r.getDouble(4) == SeqSource.value(12345L))
  }

  test("deterministic: two reads produce identical content") {
    val a = read(rows = 5000).orderBy("event_id").collect().toSeq
    val b = read(rows = 5000, slices = 3).orderBy("event_id").collect().toSeq
    assert(a.size == 5000)
    assert(a == b, "slicing must not change content")
  }

  test("micro-batch stream delivers the identical grid in rate-limited batches") {
    val q = spark.readStream.format("graft.sources.SeqSourceProvider")
      .option("rows", "5000").option("batchRows", "1200").load()
      .writeStream.format("memory").queryName("seq_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("seq_stream")
      .orderBy("event_id").collect().toSeq
    val batch = read(rows = 5000).orderBy("event_id").collect().toSeq
    assert(streamed.size == 5000)
    assert(streamed == batch, "stream must equal the batch scan")
  }

  test("generated values stay in contract ranges") {
    val df = read(rows = 20000)
    val bad = df.filter(
      col("user_id") < 0 || col("user_id") >= 150 ||
      col("value") < 0 || col("value") > 99.99 ||
      !col("event_type").isin("view", "click", "purchase", "signup", "error"))
      .count()
    assert(bad == 0L)
  }
}
