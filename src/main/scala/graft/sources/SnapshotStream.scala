package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.plans.Snapshots

/** The snapshot store as a STRUCTURED STREAMING SOURCE — Iceberg's
  * Spark streaming read (`SparkMicroBatchStream`: snapshots are the
  * offsets, appended files are the batches) re-expressed over graft's
  * manifest store. The reference platform consumes streams INTO tables
  * (`/root/reference/main.py:346-398`); a lakehouse equally streams
  * OUT of them — every downstream incremental job is a tail of the
  * table's append history. This source makes [[Snapshots.appendsBetween]]
  * (already the incremental batch read, d28) the micro-batch planner:
  *
  *  - OFFSETS ARE TABLE VERSIONS. `getOffset` reads the current
  *    version (one directory listing — pure metadata); a micro-batch is
  *    the half-open version range `(start, end]`. Offsets serialize as
  *    the bare version number, so the checkpoint's offset log is
  *    human-auditable against `$snapshots` and a restart resumes from
  *    the exact committed version (kill/resume spec'd in
  *    SnapshotStreamSpec).
  *  - BATCHES ARE MANIFEST SET-DIFFS. Planning a batch costs O(manifest)
  *    metadata, and the scan touches ONLY the dirs appended in the
  *    range — never the table. At 100 TB a consumer lagging by three
  *    commits reads three commits' worth of files.
  *  - NON-APPEND COMMITS (CoW rewrite, MoR delete, fold, rollback,
  *    compaction) are change data, not appends — replaying a rewrite
  *    would duplicate rows the consumer already processed. Default
  *    `onNonAppend=fail` stops the query loudly (Iceberg's streaming
  *    default: refuse silent under-delivery); `onNonAppend=skip`
  *    mirrors `streaming-skip-overwrite/delete-snapshots=true` — the
  *    stream stays an append tail and reconciliation belongs to the
  *    change feed ([[Snapshots.changesBetween]]).
  *
  * Spark-first note on the API choice: this is a DSv1
  * [[org.apache.spark.sql.execution.streaming.Source]], not a DSv2
  * `MicroBatchStream`, deliberately. The v1 contract — offset range →
  * DataFrame — is exactly what a manifest-backed table needs: the
  * batch IS `spark.read.parquet(appended dirs)`, planned by Catalyst
  * with full pushdown/pruning/codegen. A v2 `MicroBatchStream` hands
  * back `PartitionReader[InternalRow]`s, i.e. would force
  * re-implementing the vectorized parquet reader by hand (Spark's own
  * file streaming source stays on v1 for the same reason; the v2 face
  * of this engine's source family lives in [[SeqSource]], where rows
  * are generated, not read).
  *
  * Two start modes, both replay-stable (manifests are immutable, so
  * re-running a checkpointed batch range re-reads identical entries):
  *
  *  - DEFAULT (no `startVersion`): the first batch is the FULL logical
  *    snapshot at the first observed version — Delta's
  *    initial-snapshot semantics: the consumer sees the whole table,
  *    then its growth. The anchor needs no driver state: it is the
  *    first offset Spark logs, so a restart replays `asOf` the same
  *    version.
  *  - `startVersion=v`: tail-only — appends strictly after live
  *    version `v` (Iceberg's `stream-from` semantics). Rows the table
  *    held at `v` are the consumer's presumed-already-processed past.
  *
  * Retention contract: resuming needs the checkpointed version still
  * live — [[Snapshots.expire]] retention must cover consumer lag
  * (Iceberg's rule verbatim). A resume past an expired version fails
  * loudly rather than silently skipping the GC'd gap. */
class SnapshotStreamProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-snapshots"

  // DataStreamReader lower-cases option keys on some paths and not
  // others; normalize so `startVersion` and `startversion` both work
  private def norm(parameters: Map[String, String]): Map[String, String] =
    parameters.map { case (k, v) => k.toLowerCase -> v }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val p = norm(parameters)
    val declared = schema.getOrElse(SnapshotStreamProvider.schemaFor(
      sqlContext.sparkSession, p))
    (shortName(), declared)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val p = norm(parameters)
    val maxVersions = p.get("maxversionsperbatch").map(_.toInt)
    maxVersions.foreach(m => require(m >= 1,
      s"maxVersionsPerBatch must be >= 1, got $m"))
    p.getOrElse("mode", "appends") match {
      case "appends" =>
        new SnapshotTailSource(sqlContext.sparkSession, p("root"),
          p("table"), p.get("startversion").map(_.toInt),
          p.getOrElse("onnonappend", "fail"), maxVersions)
      case "changes" =>
        new SnapshotChangesSource(sqlContext.sparkSession, p("root"),
          p("table"), p("key"),
          p.getOrElse("startversion",
            sys.error("mode=changes requires startVersion — a change " +
              "consumer names the version its state reflects " +
              "(Delta CDF's startingVersion contract)")).toInt,
          maxVersions)
      case other => sys.error(s"mode must be appends|changes, got $other")
    }
  }
}

/** Per-trigger RATE LIMIT shared by both stream faces — the
  * `maxFilesPerTrigger`/`streaming-max-files-per-micro-batch` analog,
  * in the store's natural unit: a micro-batch advances at most
  * `maxVersionsPerBatch` versions past what the source last served. A
  * consumer resuming over a 10k-version backlog then drains it as
  * bounded catch-up batches (each with bounded scan size, shuffle
  * footprint, and sink-commit size) instead of planning one giant
  * batch — at 100 TB the difference between a burst the cluster
  * absorbs and one it falls over on. `served` is internal bookkeeping
  * (the v1 FileStreamSource pattern), recovered on restart from BOTH
  * engine channels: a pending batch replays through getBatch with the
  * checkpointed range, and a clean restart re-announces the committed
  * offset through commit(end) — either way the clamp base picks up
  * where the log left off. A cold getOffset before either signal
  * clamps from the start anchor; if that undershoots an
  * already-committed offset the engine's next getBatch is empty
  * (fromV >= endV) and the base catches up — transient no-op batches,
  * never duplicates. */
private[sources] trait VersionRateLimit {
  protected def maxVersionsPerBatch: Option[Int]
  /** The highest version this source has planned a batch through. */
  @volatile private var served: Option[Int] = None

  protected def noteServed(endV: Int): Unit =
    served = Some(served.fold(endV)(math.max(_, endV)))

  /** Clamp the available offset to `base-or-served + max`. `base` is
    * the mode's start anchor (tail/changes: startVersion; snapshot
    * mode: the current version — the initial snapshot is ONE batch by
    * definition and rate limiting applies to the tail after it). */
  protected def clampAvailable(current: Int, base: Option[Int]): Int =
    maxVersionsPerBatch match {
      case None => current
      case Some(m) =>
        served.orElse(base).fold(current)(b => math.min(current, b + m))
    }
}

object SnapshotStreamProvider {
  import org.apache.spark.sql.types.{IntegerType, StringType, StructField}

  /** The change-feed projection: the consumer's key column (typed from
    * the table) plus the CDC pseudo-columns [[Snapshots.changesBetween]]
    * emits. */
  private[sources] def changesSchema(tableSchema: StructType,
      key: String): StructType =
    StructType(Seq(tableSchema(key),
      StructField("_change_type", StringType),
      StructField("_change_version", IntegerType)))

  private[sources] def schemaFor(spark: SparkSession,
      p: Map[String, String]): StructType = {
    val tableSchema =
      new Snapshots(p("root")).current(spark, p("table")).schema
    if (p.getOrElse("mode", "appends") == "changes")
      changesSchema(tableSchema, p("key"))
    else tableSchema
  }
}

/** A table version as a streaming offset. Serializes as the bare
  * number so checkpoint offset logs read as version history. */
case class VersionOffset(v: Int) extends OffsetV1 {
  override def json(): String = v.toString
}

/** See [[SnapshotStreamProvider]]. */
class SnapshotTailSource(spark: SparkSession, root: String, table: String,
    startVersion: Option[Int], onNonAppend: String,
    protected val maxVersionsPerBatch: Option[Int] = None)
    extends Source with VersionRateLimit {
  require(onNonAppend == "fail" || onNonAppend == "skip",
    s"onNonAppend must be fail|skip, got $onNonAppend")
  private val store = new Snapshots(root)
  startVersion.foreach { v =>
    require(store.versions(table).contains(v),
      s"startVersion $v is not a live version of $table " +
        s"(have ${store.versions(table)})")
  }

  override val schema: StructType = store.current(spark, table).schema

  /** Parse any offset face — [[VersionOffset]] live, or the offset
    * log's `SerializedOffset` on checkpoint recovery — via its JSON. */
  private def vOf(o: OffsetV1): Int = o.json().trim.toInt

  override def getOffset: Option[OffsetV1] = {
    val cur = store.currentVersion(table).getOrElse(
      sys.error(s"no snapshots for $table"))
    // snapshot mode's base is None: the initial snapshot is one batch
    // by definition; the rate limit applies to the tail after it
    Some(VersionOffset(clampAvailable(cur, startVersion)))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = vOf(end)
    noteServed(endV)
    val batch = start.map(vOf).orElse(startVersion) match {
      case Some(fromV) if fromV >= endV =>
        // no new versions (or a replayed empty range): schema-stable
        // empty frame with no file paths planted in the plan
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(fromV) =>
        if (onNonAppend == "fail") {
          val bad = store.nonAppendVersionsBetween(table, fromV, endV)
          if (bad.nonEmpty) throw new IllegalStateException(
            s"non-append commit(s) at version(s) ${bad.mkString(",")} of " +
              s"$table: their row deltas are change data, not appends. " +
              "Consume them via changesBetween, or set onNonAppend=skip " +
              "to tail appends only.")
        }
        store.appendsBetween(spark, table, fromV, endV)
      case None =>
        // default mode's first batch: the full logical snapshot at the
        // first logged offset — replay-stable because `end` comes from
        // the offset log on recovery
        store.asOf(spark, table, endV)
    }
    // pin every batch to the SUBSCRIBED schema (Delta's contract:
    // schema changes require a stream restart): a mid-stream ADD
    // COLUMN evolution commit widens the appended dirs, and without
    // this projection the widened batch frame would break the
    // running query's schema mid-flight; with it, the consumer keeps
    // its columns and a restart subscribes to the evolved schema. A
    // DROPPED subscribed column still fails loudly (the select cannot
    // resolve it) — delivering fabricated nulls would be worse.
    val pinned =
      if (batch.schema == schema) batch
      else batch.select(schema.fieldNames.toIndexedSeq.map(
        org.apache.spark.sql.functions.col): _*)
    // the v1 contract wants a streaming-flagged frame; the batch plan
    // still compiles with full Catalyst treatment (see streamingFrame)
    org.apache.spark.sql.graft.ColumnBridge.streamingFrame(pinned)
  }

  // the engine re-announces the committed offset on recovery — without
  // this, a CLEAN restart (no pending batch to replay) would leave the
  // rate-limit base empty and the first catch-up batch unclamped
  override def commit(end: OffsetV1): Unit = noteServed(vOf(end))
  override def stop(): Unit = ()
  override def toString: String =
    s"SnapshotTailSource(root=$root, table=$table, " +
      s"start=${startVersion.getOrElse("snapshot")}, $onNonAppend)"
}

/** `mode=changes`: the CHANGE FEED as a stream — Delta's CDF streaming
  * read / Iceberg's changelog scan re-expressed over
  * [[Snapshots.changesBetween]]. Where the append tail refuses (or
  * skips) non-append commits, this source CONSUMES them: every commit
  * type — append, CoW rewrite, MoR delete, upsert — becomes
  * (key, _change_type, _change_version) rows, the reconciliation
  * stream a downstream serving table applies (the t13 upsert pattern
  * closes the loop: snapshot-store changes in, keyed MERGE out).
  * `startVersion` is required — a change consumer names the version
  * its state reflects. Batch-slicing invariant: changesBetween over
  * (a, c] equals the union of (a, b] and (b, c] step diffs by
  * construction (it is computed per version step), so HOW triggers
  * slice the version range cannot change the delivered rows —
  * SnapshotStreamSpec pins it. Per-step cost: the delta-restricted
  * diff (exclusive dirs ∪ delete-applicability-changed kept dirs),
  * never O(table); the pure-append fast path skips the join entirely. */
class SnapshotChangesSource(spark: SparkSession, root: String,
    table: String, key: String, startVersion: Int,
    protected val maxVersionsPerBatch: Option[Int] = None)
    extends Source with VersionRateLimit {
  private val store = new Snapshots(root)
  require(store.versions(table).contains(startVersion),
    s"startVersion $startVersion is not a live version of $table " +
      s"(have ${store.versions(table)})")

  override val schema: StructType = SnapshotStreamProvider.changesSchema(
    store.current(spark, table).schema, key)

  private def vOf(o: OffsetV1): Int = o.json().trim.toInt

  override def getOffset: Option[OffsetV1] = {
    val cur = store.currentVersion(table).getOrElse(
      sys.error(s"no snapshots for $table"))
    Some(VersionOffset(clampAvailable(cur, Some(startVersion))))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = vOf(end)
    noteServed(endV)
    val fromV = start.map(vOf).getOrElse(startVersion)
    val batch =
      if (fromV >= endV)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else store.changesBetween(spark, table, fromV, endV, key)
    org.apache.spark.sql.graft.ColumnBridge.streamingFrame(batch)
  }

  // see SnapshotTailSource.commit: keeps the rate-limit base recovered
  // across a clean restart
  override def commit(end: OffsetV1): Unit = noteServed(vOf(end))
  override def stop(): Unit = ()
  override def toString: String =
    s"SnapshotChangesSource(root=$root, table=$table, key=$key, " +
      s"from=$startVersion)"
}
