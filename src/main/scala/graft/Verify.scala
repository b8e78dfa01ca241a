package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftExtensions.register(spark)
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated prefix filter (same contract as Bench's
    // SPARK_GRAFT_ONLY) for fast local iteration on a few queries; the
    // dumped oracle_sql.json is filtered to match so scripts/check.py
    // checks exactly what was run. The driver sets no filter.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    def keep(name: String): Boolean = only.forall(_.exists(name.startsWith))
    // A narrowed run must be VISIBLY narrowed: a leaked filter env var in
    // a gate run would otherwise produce an all-pass report over a subset
    // with no trace in any artifact.
    val filterDesc = only.map(_.mkString(",")).getOrElse("<none>")
    System.err.println(s"[verify] SPARK_GRAFT_ONLY filter: $filterDesc")
    val statuses = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => keep(q._1)).map { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        name -> "ok"
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        name -> s"error: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(300)}"
      }
    }
    def q(s: String): String = graft.core.Jsonish.jstr(s)
    val json = SparkEntry.oracleSql.filter(e => keep(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Per-query status artifact: a failed write must be visible in the
    // output dir, not only on stderr (a missing parquet dir silently
    // drops the query from the driver's correctness report otherwise).
    Files.writeString(Paths.get(s"$outDir/_verify_status.json"),
      (statuses :+ ("_filter" -> filterDesc))
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
