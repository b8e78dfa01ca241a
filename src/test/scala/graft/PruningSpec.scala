package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.core.{Tables => T, Scratch}

/** Partition-pruning proof — the reference's efficiency assertion that
  * a 1-day filter over a date-partitioned table processes only that
  * day's data (< 1 MB of a much larger table,
  * /root/reference/PRD.md:3500-3510). The observable is the EXECUTED
  * plan: the FileSourceScanExec must carry the day predicate as a
  * partition filter (pruned at planning from directory metadata — the
  * Hive-layout analog of Iceberg partition stats), and its numFiles /
  * filesSize metrics must cover exactly the one matching partition
  * directory, not the table. At 100 TB this is THE difference between
  * a 100 GB scan and a 100 TB scan. */
class PruningSpec extends SparkSpec {

  test("one-day filter on a date-partitioned table reads only that partition's files") {
    val path = Scratch.dir("prune_orders")
    // one month of orders, day-partitioned (~31 partition dirs), a few
    // files per partition
    val month1 = T.load(spark, sfDir, "orders")
      .filter(month(col("o_orderdate")) === 1)
      .withColumn("order_day", to_date(col("o_orderdate")))
    month1.coalesce(2).write.partitionBy("order_day").parquet(path)

    val day = month1.select(min(to_date(col("o_orderdate")))).head().getDate(0)
    val expectedRows = month1
      .filter(to_date(col("o_orderdate")) === lit(day)).count()

    val pruned = spark.read.parquet(path)
      .filter(col("order_day") === lit(day))
    // collect() executes THIS dataframe's plan instance — count() would
    // build a separate QueryExecution and leave these metrics unset
    assert(pruned.collect().length == expectedRows, "pruned read lost rows")

    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in executed plan"))

    // the day predicate must be a PARTITION filter (metadata-pruned),
    // not a data filter evaluated per row group
    assert(scan.partitionFilters.exists(_.references.exists(
        _.name == "order_day")),
      s"day predicate missing from partitionFilters: ${scan.partitionFilters}")

    def countFiles(dir: java.io.File): Long =
      Option(dir.listFiles()).getOrElse(Array.empty).map { f =>
        if (f.isDirectory) countFiles(f)
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      }.sum
    val root = new java.io.File(path)
    val totalFiles = countFiles(root)
    val dayFiles = countFiles(new java.io.File(root, s"order_day=$day"))
    assert(dayFiles > 0 && totalFiles > dayFiles,
      s"fixture degenerate: $dayFiles of $totalFiles files")

    // planning-time metrics: exactly the one partition's files scanned
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead == dayFiles,
      s"scan read $filesRead files, expected the $dayFiles files of " +
        s"partition order_day=$day (table has $totalFiles)")

    // and the bytes envelope: scanned size is the one partition, a
    // small fraction of the table (reference: < 1 MB of a 10 GB table)
    def sizeOf(dir: java.io.File): Long =
      Option(dir.listFiles()).getOrElse(Array.empty).map { f =>
        if (f.isDirectory) sizeOf(f) else f.length()
      }.sum
    val bytesRead = scan.metrics("filesSize").value
    assert(bytesRead <= sizeOf(new java.io.File(root, s"order_day=$day")),
      "scan claims more bytes than the partition holds")
    assert(bytesRead < sizeOf(root) / 4,
      s"scan size $bytesRead is not a small fraction of ${sizeOf(root)}")
  }

  test("d18: after partition evolution, the new key prunes new-spec " +
      "files at planning time") {
    val path = Scratch.dir("prune_evolved")
    val o = T.load(spark, sfDir, "orders")
      .withColumn("o_month", month(col("o_orderdate")))
    o.filter(col("o_month") <= 6)
      .write.mode("overwrite").partitionBy("o_month")
      .parquet(s"$path/spec1")
    o.filter(col("o_month") >= 7)
      .write.mode("overwrite").partitionBy("o_month", "o_orderpriority")
      .parquet(s"$path/spec2")
    val q = spark.read.parquet(s"$path/spec2")
      .filter(col("o_orderpriority") === "1-URGENT")
    q.collect()
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in executed plan"))
    // under the evolved spec the priority predicate is a PARTITION
    // filter — metadata-pruned, zero data touched for other priorities
    // (old-spec files would fall back to row-group stats; the logical
    // union over both specs is d18's oracle-checked query)
    assert(scan.partitionFilters.exists(_.references.exists(
        _.name == "o_orderpriority")),
      s"priority not in partitionFilters: ${scan.partitionFilters}")
    val priorities = o.filter(col("o_month") >= 7)
      .select(countDistinct(col("o_orderpriority"))).head().getLong(0)
    assert(priorities > 1, "fixture degenerate: one priority")
    // files read must be well under the spec2 total (1 of N priorities)
    def countFiles(dir: java.io.File): Long =
      Option(dir.listFiles()).getOrElse(Array.empty).map { f =>
        if (f.isDirectory) countFiles(f)
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      }.sum
    val total = countFiles(new java.io.File(s"$path/spec2"))
    val read = scan.metrics("numFiles").value
    assert(read > 0 && read < total,
      s"scan read $read of $total spec2 files — no pruning happened")
  }

  test("dynamic partition pruning: a runtime dim-side filter prunes " +
      "fact partitions the static planner cannot") {
    val path = Scratch.dir("dpp_orders")
    T.load(spark, sfDir, "orders")
      .withColumn("o_month", month(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_month").parquet(path)
    val fact = spark.read.parquet(path)
    // the dim's selective predicate is on grp, NOT the join key — so no
    // static filter on o_month exists anywhere in the query; only DPP
    // (runtime subquery reuse of the broadcast dim) can avoid reading
    // all 12 partitions
    val dim = spark.range(1, 13)
      .select(col("id").cast("int").as("m"), (col("id") % 4).as("grp"))
    val q = fact.join(dim, fact("o_month") === dim("m"))
      .filter(col("grp") === 1) // months 1, 5, 9
      .groupBy(col("o_month")).agg(count(lit(1)).as("n"))
    val got = q.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1, 5, 9), s"wrong months survived: $got")

    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan:\n$scan")
    // and the runtime effect: the fact scan read 3 of 12 partitions
    def find(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        find(a.executedPlan)
      case q2: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        find(q2.plan)
      case f: FileSourceScanExec => Some(f)
      case other => other.children.view.flatMap(find).headOption
    }
    val factScan = find(q.queryExecution.executedPlan)
      .getOrElse(fail("fact FileSourceScanExec not found"))
    def countFiles(dir: java.io.File): Long =
      Option(dir.listFiles()).getOrElse(Array.empty).map { f =>
        if (f.isDirectory) countFiles(f)
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      }.sum
    val total = countFiles(new java.io.File(path))
    val read = factScan.metrics("numFiles").value
    assert(read > 0 && read < total,
      s"DPP read $read of $total files — pruning did not engage")
  }

  test("s10: predicate and projection push into the ORC scan like parquet") {
    val path = Scratch.dir("prune_orc")
    T.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").orc(path)
    val q = spark.read.orc(path)
      .filter(col("o_totalprice") > 100000.0)
      .select(col("o_orderstatus"))
    q.collect()
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in executed plan"))
    // the price predicate must reach the ORC reader as a pushed filter
    // (search-argument row-group skipping), not stay a post-scan Filter
    assert(scan.metadata.get("PushedFilters")
        .exists(_.contains("GreaterThan(o_totalprice")),
      s"predicate not pushed: ${scan.metadata.get("PushedFilters")}")
    // and column pruning: the 3-column file must be read 2-wide
    assert(scan.requiredSchema.fieldNames.toSet ==
        Set("o_orderstatus", "o_totalprice"),
      s"scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
  }
}
