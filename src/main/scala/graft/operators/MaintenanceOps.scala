package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T, QueryPack, Scratch}
import graft.plans.Maintenance

/** Query-surface entries for the maintenance module (M5/M7/M8/M9 —
  * SURVEY.md §2.10). The filesystem-mutating operators (M1 compaction,
  * M2 snapshot expiry, M3 sort rewrite, M4 orphan cleanup, M6 ANALYZE)
  * are exercised with before/after assertions in MaintenanceSpec —
  * their effects are file layouts, not row sets a SQL oracle can see.
  */
object MaintenanceOps extends QueryPack {

  /** M7: partition analysis with the reference's 5 GB / 10k-row health
    * bounds over a date-partitioned write of orders. */
  private val partitionAnalysis: Q = (s, dir) => {
    val path = Scratch.dir("m07_parts")
    T.load(s, dir, "orders")
      .withColumn("order_month", month(col("o_orderdate")).cast("long"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("order_month").parquet(path)
    Maintenance.partitionAnalysis(s, path, "order_month")
      .select(col("partition_value").cast("long").as("order_month"),
        col("n_rows"), col("needs_split"), col("needs_compaction"))
      .orderBy("order_month")
  }

  /** M8: table stats snapshot — row count, distinct days, time range,
    * data-quality ratio (`iceberg_maintenance.py:291-332`; quality =
    * share of rows passing total_amount > 0, `:300`). */
  private val tableStats: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    o.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(to_date(col("o_orderdate"))).as("n_days"),
      min(col("o_orderdate")).as("first_order"),
      max(col("o_orderdate")).as("last_order"),
      (sum(when(col("o_totalprice") > 0, 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double")).as("quality_ratio"))
  }

  /** M5: query-performance analysis — run a canned workload, report
    * rows + reference-threshold flags. The raw wall-clock seconds stay
    * OUT of the published columns (environmental), but the flags ARE
    * oracle-asserted false: the reference's envelope (slow > 30 s,
    * expensive > 60 s) has ~100× headroom over this workload at gate
    * scale, so the assertion states the M5 contract itself — the same
    * trade k02/k04 make for their sketch-accuracy booleans. */
  private val queryPerf: Q = (s, dir) => {
    val workload = Seq(
      "count_orders" -> (() => T.load(s, dir, "orders")),
      "count_lineitem" -> (() => T.load(s, dir, "lineitem")),
      "join_probe" -> (() => {
        val li = T.load(s, dir, "lineitem")
        val o = T.load(s, dir, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
      }))
    val perf = Maintenance.queryPerfAnalysis(workload)
    import s.implicits._
    perf.map(p => (p.name, p.rows, p.slow, p.expensive))
      .toDF("name", "n_rows", "slow", "expensive")
      .orderBy("name")
  }

  /** M6 as a gate-visible query: ANALYZE TABLE computes catalog
    * statistics; this entry publishes the rowCount and per-column NDV
    * the CBO will consume and asserts them against the exact oracle
    * counts. Columns are LOW-cardinality (3 and 5 distinct values) on
    * purpose: Spark's NDV is an HLL estimate, exact in that range —
    * the same sketch-contract trade k02 makes. The analyzed copy is
    * built + ANALYZEd once per (session, dir), k11's cache pattern. */
  private val analyzeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def analyzedTable(s: SparkSession, dir: String): String = {
    graft.core.SessionCaches.prune(analyzeCache)
    analyzeCache.computeIfAbsent((s, dir), _ => {
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val tbl = s"m06_orders_$tag"
      T.load(s, dir, "orders").write
        .option("path", Scratch.dir("m06_orders")).saveAsTable(tbl)
      s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS " +
        "FOR COLUMNS o_orderstatus, o_orderpriority")
      tbl
    })
  }

  private val analyzeStats: Q = (s, dir) => {
    val tbl = analyzedTable(s, dir)
    val stats = s.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).stats.get
    val rowCount = stats.rowCount.get.toLong
    import s.implicits._
    Seq("o_orderpriority", "o_orderstatus")
      .map(c => (c, rowCount,
        stats.colStats(c).distinctCount.get.toLong))
      .toDF("column_name", "row_count", "distinct_count")
      .orderBy("column_name")
  }

  /** M11 (extension): data-quality expectation suite — the dbt-test /
    * Great-Expectations report as one query: five declarative rules
    * (key uniqueness, not-null, referential integrity, accepted
    * values, numeric range) each reduced to (checked, violations,
    * passed) and unioned into the gate report a write-audit-publish
    * flow (d17) would consult before publishing. Two rules fire on
    * this corpus by design (status 'P' is outside the accepted list;
    * value has a > 400 tail), so the report proves it can FAIL, not
    * just pass.
    *
    * 100 TB shape: every rule is one aggregation over one scan (r1/r2/
    * r4/r5 are map-side-combinable counts; r3 is the one genuine join
    * — referential integrity IS a join — keyed on orderkey with the
    * usual broadcast/shuffle choice left to stats). The union is five
    * 1-row frames. */
  private val dqExpectations: Q = (s, dir) => {
    val orders = T.load(s, dir, "orders")
    val li = T.load(s, dir, "lineitem")
    val ev = T.loadEvents(s, dir)
    def rule(id: String, df: DataFrame,
        checked: org.apache.spark.sql.Column,
        viol: org.apache.spark.sql.Column): DataFrame =
      df.agg(checked.as("n_checked"), viol.as("n_violations"))
        .select(lit(id).as("rule_id"), col("n_checked"),
          col("n_violations"), (col("n_violations") === 0).as("passed"))
    val r1 = rule("r1_unique_orderkey", orders,
      count(lit(1)), count(lit(1)) - countDistinct(col("o_orderkey")))
    val r2 = rule("r2_notnull_user", ev,
      count(lit(1)), count(when(col("user_id").isNull, 1)))
    val r3 = rule("r3_ref_order_exists",
      li.join(orders.select(col("o_orderkey")),
        li("l_orderkey") === col("o_orderkey"), "left"),
      count(lit(1)), count(when(col("o_orderkey").isNull, 1)))
    val r4 = rule("r4_status_accepted", orders,
      count(lit(1)),
      count(when(!col("o_orderstatus").isInCollection(Seq("O", "F")), 1)))
    val r5 = rule("r5_value_range", ev,
      count(lit(1)), count(when(col("value") > 400.0, 1)))
    r1.unionByName(r2).unionByName(r3).unionByName(r4).unionByName(r5)
      .orderBy("rule_id")
  }

  /** m12's tier-age thresholds in days. The reference recommends
    * ARCHIVE past 365 days and NEARLINE past 90
    * (`taxi_cost_manager.py` via PRD.md:4854-4930); this corpus spans
    * ~30 days, so the REGISTERED instance uses 21/7 to exercise all
    * three classes — the thresholds are policy knobs, the ledger
    * arithmetic is the operator. */
  private val m12ArchiveDays = 21
  private val m12NearlineDays = 7

  /** M12: storage-cost report — the reference's cost-manager analog
    * (`generate_cost_report` + partition storage analysis,
    * PRD.md:4854-5090): per week-partition of the event stream
    * (date_trunc("week") — the ~30-day corpus yields just one month,
    * so the week grain is what exercises multi-partition tiering),
    * BigQuery-style LOGICAL bytes (8 per INT64/FLOAT64/TIMESTAMP,
    * 2 + octet_length per STRING — the billable definition, computable
    * identically in both engines, unlike physical parquet bytes),
    * partition age against the corpus's own max date (deterministic —
    * no wall clock), a storage-tier recommendation, and the monthly
    * standard-tier cost plus the archive saving in INTEGER micro-USD
    * ($0.02/GB standard, $0.002 archive — the reference's constants —
    * spelled as (bytes·20000) div 2³⁰, floor division, no float money).
    *
    * 100 TB shape: one map-side-combined pass to month grain; the
    * as-of date is a 1-row broadcast; everything after is
    * month-count-sized. */
  private val costReport: Q = (s, dir) => {
    val ev = T.loadEvents(s, dir)
    // 4 fixed-width cols (event_id, ts, user_id, value) = 32 bytes;
    // each non-NULL STRING bills 2 + its UTF-8 length, a NULL bills 0
    // EVERY string term is null-coalesced: a NULL string bills 0, and
    // without its own coalesce a NULL event_type would null the whole
    // sum and drop the row's fixed 32 bytes + props bytes from the bill
    val rowBytes = lit(32L) +
      coalesce(octet_length(col("event_type")).cast("long") + 2L, lit(0L)) +
      coalesce(octet_length(col("props")).cast("long") + 2L, lit(0L))
    val asOf = ev.agg(max(to_date(col("ts"))).as("d0"))
    ev.groupBy(date_trunc("week", col("ts")).cast("date").as("week"))
      .agg(count(lit(1)).as("n_rows"), sum(rowBytes).as("logical_bytes"))
      .crossJoin(broadcast(asOf))
      .withColumn("age_days", datediff(col("d0"), col("week")).cast("long"))
      .withColumn("recommendation",
        when(col("age_days") > m12ArchiveDays, "ARCHIVE_CANDIDATE")
          .when(col("age_days") > m12NearlineDays, "NEARLINE_CANDIDATE")
          .otherwise("KEEP_STANDARD"))
      .withColumn("standard_cost_micro_usd",
        expr("(logical_bytes * 20000) div 1073741824"))
      .withColumn("archive_saving_micro_usd",
        expr("(logical_bytes * 18000) div 1073741824"))
      .select(col("week"), col("n_rows"), col("logical_bytes"),
        col("age_days"), col("recommendation"),
        col("standard_cost_micro_usd"), col("archive_saving_micro_usd"))
      .orderBy("week")
  }

  /** M13: catalog-inventory query — the INFORMATION_SCHEMA.TABLES
    * surface of the reference's verification suite
    * (`scripts/verify_loaded_data.sql:100-105`: table_name / type /
    * ddl per dataset table): for every registered table, the column
    * count, the sorted lower-cased column list (the portable "ddl" —
    * engine type spellings differ, column names don't), and the row
    * count. One job: ten parallel COUNT(*) scans (parquet answers
    * them from row-group metadata, no column IO) unioned; the schema
    * facts enter as literals because schema IS metadata — reading
    * data rows to learn it would be the anti-pattern. The DuckDB
    * oracle reads its own information_schema.columns over the same
    * registered views, so the check is genuinely cross-engine: both
    * catalogs must describe the same tables the same way. */
  private val catalogTables: Q = (s, dir) =>
    T.names.map { t =>
      val df = T.load(s, dir, t)
      val cols = df.schema.fieldNames.map(_.toLowerCase).sorted
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"),
          lit(cols.length.toLong).as("n_columns"),
          lit(cols.mkString(",")).as("column_list"),
          col("n_rows"))
    }.reduce(_ unionAll _).orderBy("table_name")

  /** Process-level cache of the m14/m15 snapshot fixture — the
    * candCache discipline ([[QualityOps]]'s shared bigram frame): the
    * four-commit store is a pure function of the corpus, and building
    * it writes the orders table several times; one build per (session,
    * dir) serves the history query, the files query, and their
    * warm/timed bench runs alike. */
  private val historyFixture = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.plans.Snapshots, String)]()

  private def snapshotFixture(s: SparkSession, dir: String)
      : (graft.plans.Snapshots, String) = {
    graft.core.SessionCaches.prune(historyFixture)
    historyFixture.computeIfAbsent((s, dir), _ => {
      val sn = new graft.plans.Snapshots(Scratch.dir("m14_history"))
      val t = "orders_h"
      val o = T.load(s, dir, "orders")
      val es = sn.stageEntries(Seq(
        o.filter(month(col("o_orderdate")) <= 6),
        o.filter(month(col("o_orderdate")) >= 7)), t)
      sn.commitEntries(t, Seq(es(0)))
      sn.appendEntries(t, Seq(es(1)))
      sn.deleteWhereMoR(s, t, col("o_orderkey") % 7 === 0, Seq("o_orderkey"))
      sn.rewriteDeletes(s, t)
      (sn, t)
    })
  }

  /** M14: snapshot-history metadata table — Iceberg's `$snapshots`
    * introspection surface over the manifest store, the view the
    * reference platform's verification queries read for time-travel
    * checks (`README.md:573-589` pairs AS-OF reads with snapshot
    * history). Four commits with KNOWN composition: v1 seeds H1, v2
    * appends H2 (O(delta) — one new data entry), v3 is a merge-on-read
    * equality delete (ONE delete entry, zero data rewrites), v4 folds
    * it (both dirs hold %7 keys, so they collapse to one data entry
    * and the delete entry disappears). [[graft.plans.Snapshots.history]]
    * is pure manifest metadata — no data I/O; per-version logical row
    * counts come from [[graft.plans.Snapshots.logicalRowCount]], which
    * reads the record counts INLINED in the manifest for every
    * pure-data version (v1/v2/v4 cost zero data I/O — Iceberg's
    * `total-records` economics) and scans only the delete-affected
    * dirs of v3. The DuckDB oracle recomputes the counts from the raw
    * table while pinning the manifest composition as the constants the
    * commit sequence forces. */
  private val snapshotHistory: Q = (s, dir) => {
    val (sn, t) = snapshotFixture(s, dir)
    import s.implicits._
    val rows = sn.versions(t)
      .map(v => (v.toLong, sn.logicalRowCount(s, t, v)))
      .toDF("version", "n_rows")
    sn.history(s, t).join(rows, Seq("version")).orderBy("version")
  }

  /** M15: `$files` metadata table — the per-entry face of the same
    * introspection surface: one row per manifest entry with its kind,
    * sequence number, and the record count INLINED in the manifest
    * line (Iceberg's `$files.record_count`). Reads v3 (the mid-flight
    * merge-on-read state: two data entries + one equality-delete
    * entry) and v4 (post-fold: one data entry) of the shared fixture —
    * pure metadata, zero data I/O; the oracle pins the composition and
    * recomputes every record count from the raw table. */
  private val filesMetadataQ: Q = (s, dir) => {
    val (sn, t) = snapshotFixture(s, dir)
    Seq(3, 4).map { v =>
      sn.filesMetadata(s, t, v)
        .select(lit(v.toLong).as("version"), col("entry_kind"), col("seq"),
          col("record_count"))
    }.reduce(_ unionAll _).orderBy("version", "seq")
  }

  /** M16: `$segments` metadata table — the third face of the snapshot
    * introspection family (beside m14's `$snapshots` and m15's
    * `$files`): the version file's OWN structure under two-level
    * manifests. The fixture commits four quarterly appends into a
    * store with `segThreshold = 2`, so the commit sequence forces the
    * layout deterministically: v2 chunks its two entries into one
    * segment, and each later append reuses every predecessor ref and
    * adds exactly one single-entry segment — the O(delta) metadata
    * shape as an oracle-checked row set (counts depend only on the
    * commit sequence, never on the data). */
  private val segFixture = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.plans.Snapshots, String)]()

  private val segmentsMetadataQ: Q = (s, dir) => {
    graft.core.SessionCaches.prune(segFixture)
    val (sn, t) = segFixture.computeIfAbsent((s, dir), _ => {
      val sn = new graft.plans.Snapshots(Scratch.dir("m16_segments"),
        segThreshold = 2)
      val t = "orders_sg"
      val o = T.load(s, dir, "orders")
      sn.appendMany((1 to 4).map(q =>
        o.filter(month(col("o_orderdate")).between(3 * q - 2, 3 * q))), t)
      (sn, t)
    })
    Seq(2, 3, 4).map { v =>
      sn.segmentsMetadata(s, t, v)
        .select(lit(v.toLong).as("version"), col("position"),
          col("ref_kind"), col("n_entries"), col("n_data"))
    }.reduce(_ unionAll _).orderBy("version", "position")
  }

  /** M17: `$partitions` metadata table — the per-partition rollup of
    * the snapshot-introspection family (beside m14 `$snapshots`, m15
    * `$files`, m16 `$segments`), the surface the reference's partition
    * analysis reads for its size/row health bounds
    * (iceberg_maintenance.py:226-272 — m07 computes those bounds from
    * a filesystem listing; this is the same rollup answered from the
    * MANIFEST alone). Fixture: one append per quarter of orders with
    * an explicit o_quarter partition column, so each data dir is
    * provably single-valued on it (min == max in the inline stats) and
    * the rollup attributes every dir to its quarter with ZERO data
    * I/O. The oracle pins n_entries = 1 per quarter (forced by the
    * commit sequence) and recomputes record counts from the raw
    * table; file_count/total_bytes stay out of the checked projection
    * (physical layout, not logical content). */
  private val partFixture = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.plans.Snapshots, String)]()

  private val partitionsMetadataQ: Q = (s, dir) => {
    graft.core.SessionCaches.prune(partFixture)
    val (sn, t) = partFixture.computeIfAbsent((s, dir), _ => {
      val sn = new graft.plans.Snapshots(Scratch.dir("m17_partitions"))
      val t = "orders_pt"
      val o = T.load(s, dir, "orders")
        .withColumn("o_quarter", quarter(col("o_orderdate")).cast("long"))
      sn.appendMany((1 to 4).map(q =>
        o.filter(col("o_quarter") === q)), t)
      (sn, t)
    })
    sn.partitionsMetadata(s, t, sn.currentVersion(t).get, "o_quarter")
      .select(col("partition_value"), col("n_entries"), col("record_count"))
      .orderBy("partition_value")
  }

  /** M18: `$partitions` EXACT mode — the bounded fallback for dirs the
    * manifest stats cannot attribute. Fixture: Q1/Q2 land as provably
    * single-valued dirs (manifest-only attribution), but Q3∪Q4 arrive
    * MIXED in one dir — multi-valued on o_quarter, exactly the legacy/
    * unpartitioned-load shape the metadata-only rollup (m17) can only
    * conserve into the NULL bucket. Exact mode scans ONLY that one dir
    * (O(unattributable dirs), never O(table)) and attributes its rows
    * by value: the NULL bucket empties, per-quarter counts are exact,
    * and the scanned quarters carry has_unknown_stats = true because a
    * mixed dir's files span partitions — per-value file/byte totals
    * would be fabricated, so the surface says "unknown" instead. The
    * oracle pins all of that per quarter from the raw table. */
  private val partExactFixture = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.plans.Snapshots, String)]()

  private val partitionsExactQ: Q = (s, dir) => {
    graft.core.SessionCaches.prune(partExactFixture)
    val (sn, t) = partExactFixture.computeIfAbsent((s, dir), _ => {
      val sn = new graft.plans.Snapshots(Scratch.dir("m18_part_exact"))
      val t = "orders_ptx"
      val o = T.load(s, dir, "orders")
        .withColumn("o_quarter", quarter(col("o_orderdate")).cast("long"))
      sn.appendMany((1 to 2).map(q => o.filter(col("o_quarter") === q))
        :+ o.filter(col("o_quarter") >= 3), t) // last dir mixed Q3∪Q4
      (sn, t)
    })
    sn.partitionsMetadata(s, t, sn.currentVersion(t).get, "o_quarter",
        exact = true)
      .select(col("partition_value"), col("n_entries"),
        col("record_count"), col("has_unknown_stats"))
      .orderBy("partition_value")
  }

  /** M19: the MoR fold advisor ([[graft.plans.Snapshots.morFoldAdvice]])
    * over the d25/d26 MoR table shape (two half-year appends, the %7
    * equality delete, the %14 re-insert — [[Dml.buildMorTable]], so the
    * premise can't drift from the DML entries that read the same
    * table). Pure metadata: entry counts and inline row stats from ONE
    * manifest read, no data I/O. The oracle recomputes every signal
    * from the raw table — including that the %7 delete mass (~133‰ of
    * data rows, the denominator counting the %14 re-insert too)
    * crosses the 50‰ threshold, so the recommendation is FOLD_DELETES;
    * the below-threshold flank (and the entry-count trigger) are
    * MaintenanceSpec's flip cases. Fixture cached per (session, dir),
    * the m17 pattern. */
  private val morAdviceFixture = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.plans.Snapshots, String)]()

  private val morFoldAdvisorQ: Q = (s, dir) => {
    graft.core.SessionCaches.prune(morAdviceFixture)
    val (sn, t) = morAdviceFixture.computeIfAbsent((s, dir), _ => {
      val (sn, t, _) = Dml.buildMorTable(s, dir, "m19_fold_advice")
      (sn, t)
    })
    sn.morFoldAdvice(s, t)
      .select(col("n_data_entries"), col("n_delete_entries"),
        col("data_rows"), col("delete_rows"), col("delete_permille"),
        col("has_unknown_stats"), col("recommendation"))
  }

  val queries: Map[String, Q] = Map(
    "m19_mor_fold_advice" -> morFoldAdvisorQ,
    "m18_partitions_exact" -> partitionsExactQ,
    "m17_partitions_metadata" -> partitionsMetadataQ,
    "m16_segments_metadata" -> segmentsMetadataQ,
    "m15_files_metadata" -> filesMetadataQ,
    "m14_snapshot_history" -> snapshotHistory,
    "m13_catalog_tables" -> catalogTables,
    "m12_cost_report" -> costReport,
    "m11_dq_expectations" -> dqExpectations,
    "m06_analyze_stats" -> analyzeStats,
    "m07_partition_analysis" -> partitionAnalysis,
    "m08_table_stats" -> tableStats,
    "m05_query_perf" -> queryPerf)

  val oracle: Map[String, String] = Map(
    // the MoR fixture's composition is forced by the commit sequence
    // (3 data dirs, 1 delete dir); every row signal recomputes from the
    // raw table: data rows = both half-years + the %14 re-insert,
    // delete rows = the %7 keys staged by the equality delete, and the
    // ~133‰ ratio (the denominator includes the %14 re-insert)
    // crosses the 50‰ fold threshold
    "m19_mor_fold_advice" ->
      """WITH s AS (
        |  SELECT (SELECT COUNT(*) FROM orders)
        |      + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 14 = 0)
        |      AS data_rows,
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 0)
        |      AS delete_rows)
        |SELECT CAST(3 AS BIGINT) AS n_data_entries,
        |  CAST(1 AS BIGINT) AS n_delete_entries,
        |  data_rows, delete_rows,
        |  (1000 * delete_rows) // data_rows AS delete_permille,
        |  false AS has_unknown_stats,
        |  'FOLD_DELETES' AS recommendation
        |FROM s""".stripMargin,
    // one single-quarter dir per append (forced by the commit
    // sequence) ⇒ n_entries = 1; record counts recompute from the raw
    // table. partition_value is the stats-attributed single value,
    // rendered as a string.
    "m17_partitions_metadata" ->
      """SELECT CAST(quarter(o_orderdate) AS VARCHAR) AS partition_value,
        |  CAST(1 AS BIGINT) AS n_entries,
        |  COUNT(*) AS record_count
        |FROM orders GROUP BY 1 ORDER BY partition_value""".stripMargin,
    // Q1/Q2 attribute from the manifest (one single-valued dir each,
    // exact file stats); Q3/Q4 attribute from the bounded scan of the
    // one mixed dir — rows exact, n_entries = the one contributing dir,
    // file/byte totals unknowable per value hence the true flag. The
    // NULL bucket must be EMPTY (no row has a NULL quarter).
    "m18_partitions_exact" ->
      """SELECT CAST(quarter(o_orderdate) AS VARCHAR) AS partition_value,
        |  CAST(1 AS BIGINT) AS n_entries,
        |  COUNT(*) AS record_count,
        |  quarter(o_orderdate) >= 3 AS has_unknown_stats
        |FROM orders GROUP BY 1, 4 ORDER BY partition_value""".stripMargin,
    // the two-level manifest layout is forced by the commit sequence
    // and the threshold (pure constants): v2 chunks its 2 entries into
    // one segment; each later append reuses every predecessor ref and
    // adds exactly one single-entry segment
    "m16_segments_metadata" ->
      """SELECT * FROM (
        |  SELECT CAST(2 AS BIGINT) AS version, CAST(0 AS BIGINT)
        |    AS position, 'seg' AS ref_kind, CAST(2 AS BIGINT)
        |    AS n_entries, CAST(2 AS BIGINT) AS n_data
        |  UNION ALL SELECT 3, 0, 'seg', 2, 2
        |  UNION ALL SELECT 3, 1, 'seg', 1, 1
        |  UNION ALL SELECT 4, 0, 'seg', 2, 2
        |  UNION ALL SELECT 4, 1, 'seg', 1, 1
        |  UNION ALL SELECT 4, 2, 'seg', 1, 1
        |) ORDER BY version, position""".stripMargin,
    // manifest composition is forced by the commit sequence (constants);
    // per-entry record counts recompute from the raw table
    "m15_files_metadata" ->
      """SELECT * FROM (
        |  SELECT CAST(3 AS BIGINT) AS version, 'data' AS entry_kind,
        |    CAST(0 AS BIGINT) AS seq,
        |    (SELECT COUNT(*) FROM orders WHERE month(o_orderdate) <= 6)
        |      AS record_count
        |  UNION ALL SELECT 3, 'data', 1,
        |    (SELECT COUNT(*) FROM orders WHERE month(o_orderdate) >= 7)
        |  UNION ALL SELECT 3, 'delete', 2,
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 0)
        |  UNION ALL SELECT 4, 'data', 3,
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 <> 0)
        |) ORDER BY version, seq""".stripMargin,
    // manifest composition is forced by the commit sequence (constants);
    // per-version row counts recompute from the raw table
    "m14_snapshot_history" ->
      """SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS version,
        |    CAST(1 AS BIGINT) AS n_data_entries,
        |    CAST(0 AS BIGINT) AS n_delete_entries,
        |    CAST(0 AS BIGINT) AS max_seq,
        |    (SELECT COUNT(*) FROM orders WHERE month(o_orderdate) <= 6)
        |      AS n_rows
        |  UNION ALL SELECT 2, 2, 0, 1, (SELECT COUNT(*) FROM orders)
        |  UNION ALL SELECT 3, 2, 1, 2,
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 <> 0)
        |  UNION ALL SELECT 4, 1, 0, 3,
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 <> 0)
        |) ORDER BY version""".stripMargin,
    // the oracle's catalog, not a replay of ours: DuckDB's
    // information_schema.columns over the same registered views
    "m13_catalog_tables" -> {
      val counts = T.names
        .map(t => s"SELECT '$t' AS table_name, COUNT(*) AS n_rows FROM $t")
        .mkString(" UNION ALL ")
      val inList = T.names.map(t => s"'$t'").mkString(", ")
      s"""WITH cols AS (
         |  SELECT table_name, CAST(COUNT(*) AS BIGINT) AS n_columns,
         |    string_agg(lower(column_name), ',' ORDER BY lower(column_name))
         |      AS column_list
         |  FROM information_schema.columns
         |  WHERE table_name IN ($inList)
         |  GROUP BY 1),
         |counts AS ($counts)
         |SELECT c.table_name, c.n_columns, c.column_list, n.n_rows
         |FROM cols c JOIN counts n USING (table_name)
         |ORDER BY 1""".stripMargin
    },
    "m12_cost_report" ->
      s"""WITH b AS (
         |  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         |    32 + COALESCE(octet_length(CAST(event_type AS BLOB)) + 2, 0)
         |      + COALESCE(octet_length(CAST(props AS BLOB)) + 2, 0) AS rb
         |  FROM events),
         |a AS (SELECT MAX(CAST(ts AS DATE)) AS d0 FROM events),
         |g AS (
         |  SELECT week, COUNT(*) AS n_rows,
         |    CAST(SUM(rb) AS BIGINT) AS logical_bytes
         |  FROM b GROUP BY 1)
         |SELECT week, n_rows, logical_bytes,
         |  CAST(date_diff('day', week, a.d0) AS BIGINT) AS age_days,
         |  CASE WHEN date_diff('day', week, a.d0) > $m12ArchiveDays
         |      THEN 'ARCHIVE_CANDIDATE'
         |    WHEN date_diff('day', week, a.d0) > $m12NearlineDays
         |      THEN 'NEARLINE_CANDIDATE'
         |    ELSE 'KEEP_STANDARD' END AS recommendation,
         |  (logical_bytes * 20000) // 1073741824
         |    AS standard_cost_micro_usd,
         |  (logical_bytes * 18000) // 1073741824
         |    AS archive_saving_micro_usd
         |FROM g CROSS JOIN a ORDER BY week""".stripMargin,
    "m11_dq_expectations" ->
      """SELECT 'r1_unique_orderkey' AS rule_id, COUNT(*) AS n_checked,
        |  COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations,
        |  (COUNT(*) - COUNT(DISTINCT o_orderkey)) = 0 AS passed
        |FROM orders
        |UNION ALL
        |SELECT 'r2_notnull_user', COUNT(*),
        |  COUNT(CASE WHEN user_id IS NULL THEN 1 END),
        |  COUNT(CASE WHEN user_id IS NULL THEN 1 END) = 0 FROM events
        |UNION ALL
        |SELECT 'r3_ref_order_exists', COUNT(*),
        |  COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END),
        |  COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) = 0
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |UNION ALL
        |SELECT 'r4_status_accepted', COUNT(*),
        |  COUNT(CASE WHEN o_orderstatus NOT IN ('O', 'F') THEN 1 END),
        |  COUNT(CASE WHEN o_orderstatus NOT IN ('O', 'F') THEN 1 END) = 0
        |FROM orders
        |UNION ALL
        |SELECT 'r5_value_range', COUNT(*),
        |  COUNT(CASE WHEN value > 400.0 THEN 1 END),
        |  COUNT(CASE WHEN value > 400.0 THEN 1 END) = 0 FROM events
        |ORDER BY rule_id""".stripMargin,
    // the catalog's post-ANALYZE numbers must equal the exact counts:
    // rowCount is exact by contract, NDV is HLL-exact at 3/5 values
    "m06_analyze_stats" ->
      """SELECT 'o_orderpriority' AS column_name,
        |  COUNT(*) AS row_count,
        |  COUNT(DISTINCT o_orderpriority) AS distinct_count FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', COUNT(*),
        |  COUNT(DISTINCT o_orderstatus) FROM orders
        |ORDER BY 1""".stripMargin,
    // the workload's row counts are exact (join_probe = every lineitem
    // matches exactly one order); the flags assert the reference's
    // 30/60 s envelope holds — the M5 contract, not a measurement
    "m05_query_perf" ->
      """SELECT * FROM (
        |  SELECT 'count_lineitem' AS name,
        |    (SELECT COUNT(*) FROM lineitem) AS n_rows,
        |    false AS slow, false AS expensive
        |  UNION ALL SELECT 'count_orders',
        |    (SELECT COUNT(*) FROM orders), false, false
        |  UNION ALL SELECT 'join_probe',
        |    (SELECT COUNT(*) FROM lineitem l
        |     JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |    false, false)
        |ORDER BY name""".stripMargin,
    "m07_partition_analysis" ->
      """SELECT month(o_orderdate) AS order_month, COUNT(*) AS n_rows,
        |  false AS needs_split,
        |  COUNT(*) < 10000 AS needs_compaction
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "m08_table_stats" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
        |  MIN(o_orderdate) AS first_order,
        |  MAX(o_orderdate) AS last_order,
        |  CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS quality_ratio
        |FROM orders""".stripMargin)
}
