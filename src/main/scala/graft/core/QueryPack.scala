package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module of SparkEntry.queries entries + their DuckDB oracle SQL.
  * Entries without an oracle (non-SQL-expressible ops) appear only in
  * `queries`; the driver records a weaker rows-only check for those. */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
