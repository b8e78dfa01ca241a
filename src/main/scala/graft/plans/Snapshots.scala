package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned-snapshot table layout — the table-format emulation for
  * time travel (D5), CDC inputs (D6), and snapshot expiry (M2), since no
  * Iceberg/Delta jars exist in this build (SURVEY.md §7.0).
  *
  * Layout: `<root>/<table>/v=<N>/` parquet per snapshot. Versions are
  * DETERMINISTIC integers (never wall-clock — reference queries pin
  * `FOR SYSTEM_TIME AS OF`, /root/reference/scripts/verify_loaded_data.sql:107-110;
  * our resolver pins `v=N`). The latest version is the "current" table.
  *
  * Scale notes: a snapshot is an immutable parquet dir — copy-on-write
  * writes a NEW version (only affected partitions at scale); readers of
  * v=N never block writers of v=N+1; expiry deletes whole version dirs.
  */
class Snapshots(root: String) {

  val rootDir: String = root

  private def tableDir(table: String) = new java.io.File(s"$root/$table")
  private def versionDir(table: String, v: Int) = s"$root/$table/v=$v"

  def versions(table: String): Seq[Int] = {
    val d = tableDir(table)
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq
      // strict v=<digits> match: an aborted write can leave v=1_tmp-style
      // dirs, which must read as orphans, not crash every operation
      .filter(f => f.isDirectory && f.getName.matches("v=\\d+"))
      .map(_.getName.stripPrefix("v=").toInt).sorted
  }

  def currentVersion(table: String): Option[Int] = versions(table).lastOption

  /** Commit `df` as the next snapshot; returns the new version. */
  def commit(df: DataFrame, table: String): Int = {
    val v = currentVersion(table).getOrElse(0) + 1
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(table, v))
    v
  }

  /** D5: read the table as of a pinned version. */
  def asOf(spark: SparkSession, table: String, v: Int): DataFrame =
    spark.read.parquet(versionDir(table, v))

  /** Read the current snapshot. */
  def current(spark: SparkSession, table: String): DataFrame =
    asOf(spark, table, currentVersion(table)
      .getOrElse(sys.error(s"no snapshots for $table")))

  /** D12: roll the table back to snapshot `v` — committed as a NEW
    * version (Iceberg-rollback semantics: history is preserved, the
    * bad version stays inspectable, readers mid-flight on it never
    * break; nothing is deleted — that's expiry's job). At scale the
    * restore is a metadata-only operation in a real table format; here
    * it re-writes the restored version's parquet, the copy-on-write
    * analog. Returns the new current version. */
  def rollback(spark: SparkSession, table: String, v: Int): Int = {
    require(versions(table).contains(v),
      s"cannot roll $table back to missing version $v")
    commit(asOf(spark, table, v), table)
  }

  /** D17: publish a branch — promote `fromTable`'s current snapshot to
    * be `toTable`'s next version (the write-audit-publish pattern:
    * loads land on a staging branch, audit queries gate them, publish
    * fast-forwards main). Readers of main never see pre-audit data;
    * a failed audit leaves main untouched and the staging history
    * inspectable. In a real table format this is a metadata-only
    * branch fast-forward; here it re-commits the staged parquet, the
    * copy-on-write analog (same trade as [[rollback]]). Returns main's
    * new version. */
  def publish(spark: SparkSession, fromTable: String, toTable: String): Int =
    commit(current(spark, fromTable), toTable)

  /** D16: `FOR SYSTEM_TIME BETWEEN` change enumeration
    * (/root/reference/README.md:573-589 pairs AS-OF with a BETWEEN
    * change-history window) — every keyed change the table went through
    * from version `fromV` to `toV`, tagged with the D6 pseudo-columns:
    * `_change_type` (INSERT/UPDATE/DELETE) and `_change_version` (the
    * version that introduced the change — the deterministic stand-in
    * for `_CHANGE_TIMESTAMP`, same trade D10 makes).
    *
    * Each consecutive version pair diffs by ONE full-outer join on the
    * key with the non-key payload struct-compared (null-safe) — one
    * shuffle per step, the same plan shape MERGE uses; unchanged rows
    * drop before the union, so the result is O(changes), not O(rows ×
    * versions). */
  def changesBetween(spark: SparkSession, table: String, fromV: Int,
      toV: Int, key: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val vs = versions(table).filter(v => v >= fromV && v <= toV)
    require(vs.contains(fromV) && vs.contains(toV) && fromV < toV,
      s"changesBetween needs existing versions $fromV < $toV; have ${versions(table)}")
    vs.sliding(2).map { case Seq(pv, nv) =>
      val others = asOf(spark, table, nv).columns.filterNot(_ == key)
      def payload(v: Int, as: String) = asOf(spark, table, v)
        .select(col(key), struct(others.toIndexedSeq.map(col): _*).as(as))
      payload(pv, "_prev").join(payload(nv, "_next"), Seq(key), "full_outer")
        .withColumn("_change_type",
          when(col("_prev").isNull, "INSERT")
            .when(col("_next").isNull, "DELETE")
            .when(!(col("_prev") <=> col("_next")), "UPDATE"))
        .filter(col("_change_type").isNotNull) // unchanged rows drop here
        .select(col(key), col("_change_type"),
          lit(nv).cast("int").as("_change_version"))
    }.reduce(_ unionByName _)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRecursively)
    f.delete()
  }

  /** M2: expire old snapshots, keeping the most recent `keep`. Returns
    * the versions removed. Deletion is recursive — an aborted Spark
    * write leaves _temporary/ subdirs that a flat delete would silently
    * keep alive. */
  def expire(table: String, keep: Int): Seq[Int] = {
    val vs = versions(table)
    val doomed = vs.dropRight(keep)
    doomed.foreach(v => deleteRecursively(new java.io.File(versionDir(table, v))))
    doomed
  }

  /** M4: orphan-file cleanup — delete files under the table root that no
    * live snapshot references (e.g. leftovers of aborted writes placed
    * outside any `v=N` dir). Returns deleted paths. */
  def cleanOrphans(table: String): Seq[String] = {
    val live = versions(table).map(v => new java.io.File(versionDir(table, v)))
      .map(_.getCanonicalPath).toSet
    // membership = exact dir or a path UNDER it — bare startsWith would
    // keep .../v=1_aborted.tmp alive because it extends .../v=1
    def isLive(f: java.io.File): Boolean = {
      val p = f.getCanonicalPath
      live.contains(p) ||
        live.exists(l => p.startsWith(l + java.io.File.separator))
    }
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk) :+ f
      else Seq(f)
    val root = tableDir(table)
    if (!root.exists()) return Seq.empty
    val doomed = walk(root)
      .filter(_ != root)
      .filterNot(isLive)
    doomed.filter(_.isFile).map { f => val p = f.getPath; f.delete(); p } ++
      doomed.filter(_.isDirectory).flatMap { d =>
        if (Option(d.listFiles()).getOrElse(Array.empty).isEmpty) {
          val p = d.getPath; d.delete(); Seq(p)
        } else Seq.empty
      }
  }
}
