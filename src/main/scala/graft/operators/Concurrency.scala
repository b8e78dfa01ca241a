package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.QueryPack

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent-query execution harness — the reference's headline
  * performance scenario (10 concurrent analytical queries, avg < 30 s
  * and max < 60 s each, /root/reference/PRD.md:3579-3594) re-expressed
  * on one Spark session.
  *
  * Concurrency model: one driver thread per query (a fixed pool sized
  * to the workload), all sharing the SparkSession; each thread tags
  * its jobs with a per-query FAIR-scheduler pool
  * (`spark.scheduler.pool` is a thread-local property), so the
  * scheduler round-robins cluster slots across the ten queries instead
  * of letting the first-submitted job starve the rest — exactly how a
  * multi-tenant 1000-executor cluster shares capacity. Verify/Bench
  * sessions run with `spark.scheduler.mode=FAIR`; under the default
  * FIFO the harness still completes, just without the fairness
  * guarantee.
  *
  * Isolation: every filesystem-effect query writes under a
  * per-invocation [[graft.core.Scratch]] dir, so concurrent queries
  * never collide on paths. The workload below is read-only anyway —
  * it is the reference's ANALYTICAL set.
  *
  * Correctness under concurrency IS oracle-checked: k03 returns each
  * query's row count, and the oracle recomputes every count from the
  * member queries' own oracle SQL — a wrong row count from cross-query
  * interference (shared-state corruption, scratch collisions) fails
  * the gate. Timings are environmental, so the <30s/<60s thresholds
  * are asserted in ConcurrencySpec, not hash-compared.
  */
object Concurrency extends QueryPack {

  /** The 10-query analytical workload: joins, windows, heavy and light
    * aggregations — each member is itself an oracle-checked entry. */
  private def workload: Seq[(String, Q, String)] = Seq(
    Joins -> "q01_revenue_by_nation",
    Aggregates -> "q02_hourly_stats",
    Aggregates -> "q05_count_distinct",
    Aggregates -> "q07_having",
    Aggregates -> "q08_stddev",
    Aggregates -> "q09_agg_of_agg",
    Joins -> "q12_prepost_compare",
    Joins -> "q13_left_join_expr",
    Joins -> "q15_rank_join",
    Windows -> "w04_rolling_avg"
  ).map { case (pack, name) => (name, pack.queries(name), pack.oracle(name)) }

  /** Run the workload on `threads` driver threads (default: fully
    * concurrent — one thread per query; 1 = serial baseline). Returns
    * (name, rows, seconds) per query. Used by both the k03 entry
    * (rows) and ConcurrencySpec (timings + serial-equivalence). */
  def runWorkload(s: SparkSession, dir: String,
      threads: Int = 0,
      timeout: FiniteDuration = 10.minutes): Seq[(String, Long, Double)] = {
    // Daemon threads + shutdownNow + job-group cancel: a query that
    // hangs past the timeout must not wedge the JVM at exit (plain
    // shutdown() would leave the non-daemon thread running forever)
    // nor keep burning cluster slots under later queries.
    val group = s"graft-concurrent-" +
      java.util.UUID.randomUUID().toString.take(8)
    val pool = Executors.newFixedThreadPool(
      if (threads > 0) threads else workload.size,
      r => { val t = new Thread(r); t.setDaemon(true); t })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = workload.map { case (name, q, _) =>
        Future {
          s.sparkContext.setJobGroup(group, s"k03 $name",
            interruptOnCancel = true)
          s.sparkContext.setLocalProperty("spark.scheduler.pool", s"graft-$name")
          try {
            val t0 = System.nanoTime()
            val n = q(s, dir).count()
            (name, n, (System.nanoTime() - t0) / 1e9)
          } finally {
            s.sparkContext.setLocalProperty("spark.scheduler.pool", null)
            s.sparkContext.clearJobGroup()
          }
        }
      }
      try Await.result(Future.sequence(fs), timeout)
      catch { case e: Throwable =>
        s.sparkContext.cancelJobGroup(group)
        throw e
      }
    } finally pool.shutdownNow()
  }

  private val concurrentQueries: Q = (s, dir) => {
    val results = runWorkload(s, dir)
    import s.implicits._
    results.map { case (name, rows, _) => (name, rows) }
      .toDF("name", "n_rows").orderBy("name")
  }

  val queries: Map[String, Q] = Map(
    "k03_concurrent_queries" -> concurrentQueries)

  val oracle: Map[String, String] = Map(
    "k03_concurrent_queries" ->
      workload.map { case (name, _, osql) =>
        s"SELECT '$name' AS name,\n" +
          s"  (SELECT COUNT(*) FROM ($osql) AS t) AS n_rows"
      }.mkString("", "\nUNION ALL\n", "\nORDER BY name"))
}
