package graft

import graft.operators.Concurrency

/** The reference's concurrent-query performance scenario
  * (/root/reference/PRD.md:3579-3594): 10 concurrent analytical
  * queries on one session, every query correct, avg < 30 s and
  * max < 60 s. Row-count correctness under concurrency is ALSO
  * oracle-checked by the k03 entry; this spec pins the timing
  * thresholds and serial-equivalence (timings are environmental, so
  * they cannot live in the hash-compared oracle gate). */
class ConcurrencySpec extends SparkSpec {

  test("10 concurrent analytical queries: all complete, match serial results, within reference thresholds") {
    // the shared test session runs spark.scheduler.mode=FAIR (like the
    // Verify/Bench sessions), so per-query pools actually share slots
    assert(spark.sparkContext.getConf.get("spark.scheduler.mode", "FIFO")
      == "FAIR", "harness session must be FAIR-scheduled")

    val concurrent = Concurrency.runWorkload(spark, sfDir)
    assert(concurrent.size == 10, s"expected 10 queries, got ${concurrent.size}")

    // every query produced rows (no starvation, no silent failure)
    concurrent.foreach { case (name, rows, _) =>
      assert(rows > 0, s"$name returned no rows under concurrency")
    }

    // no cross-query interference: concurrent row counts == a serial
    // (single-thread) baseline of the same workload
    val serial = Concurrency.runWorkload(spark, sfDir, threads = 1).map {
      case (name, rows, _) => name -> rows
    }.toMap
    concurrent.foreach { case (name, rows, _) =>
      assert(rows == serial(name),
        s"$name: concurrent rows $rows != serial ${serial(name)}")
    }

    // reference thresholds: avg < 30 s, max < 60 s per query
    val times = concurrent.map(_._3)
    val avg = times.sum / times.size
    assert(avg < 30.0, s"avg query time ${avg}s exceeds the 30s envelope")
    assert(times.max < 60.0, s"max query time ${times.max}s exceeds 60s")
    // (pool-tag restoration happens inside runWorkload's per-thread
    // finally — it is thread-local to the executor threads, so it is
    // not observable from this test thread)
  }
}
