package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.core.QueryPack
import graft.operators._
import graft.sources.Sources
import graft.streaming.Streaming

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryPack module into one queries/oracleSql surface.
  * Each entry is one operator from SURVEY.md §2; oracleSql holds the
  * DuckDB-equivalent ANSI SQL for the hash-compare correctness gate. */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    Joins,
    Aggregates,
    Ingest,
    Windows,
    Sources,
    Streaming,
    LlmOps,
    CurationOps,
    QualityOps,
    AuditOps,
    CorpusOps,
    KMeansOps,
    Dml,
    MaintenanceOps,
    Scalars,
    ScaleOps,
    Concurrency)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Fact ⋈ broadcast-dim revenue-by-zone with having + top-k
    * (reference flagship: /root/reference/README.md:548-557). */
  def entry(spark: SparkSession): DataFrame =
    Joins.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = {
    val sql = packs.flatMap(_.oracle).toMap
    val orphans = sql.keySet -- queries.keySet
    require(orphans.isEmpty,
      s"oracle entries without a matching query: ${orphans.mkString(", ")}")
    sql
  }
}
