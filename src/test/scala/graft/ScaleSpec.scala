package graft

import org.apache.spark.sql.functions._

/** Contracts of the scale-pattern operators that the DuckDB oracle
  * cannot check (sketch internals are engine-specific). */
class ScaleSpec extends SparkSpec {

  test("k13: CMS never undercounts ANY key, and the registered query's " +
      "contract booleans hold") {
    // independent CMS rebuild (same geometry: d=3 seeds, w=1024) over
    // ALL keys — the structural one-sided guarantee est >= exact must
    // hold for every key, not just the top-10 the query publishes
    val w = 1024L
    val seeds = Seq(1L, 2L, 3L)
    val ev = graft.core.Tables.loadEvents(spark, sfDir)
      .select(col("user_id"))
    val sketch = seeds.map { sd =>
      sd -> ev.groupBy(pmod(xxhash64(col("user_id"), lit(sd)), lit(w))
          .as("pos"))
        .count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }.toMap
    val exact = ev.groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val hashes = ev.select(col("user_id"),
        array(seeds.map(sd =>
          pmod(xxhash64(col("user_id"), lit(sd)), lit(w))): _*).as("ps"))
      .distinct().collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    exact.foreach { case (uid, cnt) =>
      val est = seeds.zip(hashes(uid))
        .map { case (sd, pos) => sketch(sd)(pos) }.min
      assert(est >= cnt, s"CMS undercounted user $uid: $est < $cnt")
    }
    val out = SparkEntry.queries("k13_cms_heavy_hitters")(spark, sfDir)
      .collect()
    assert(out.length === 10)
    assert(out.forall(_.getBoolean(2)), "sketch_ge_exact violated")
    assert(out.forall(_.getBoolean(3)), "sketch_within_eps violated")
  }

  test("k02: HLL distinct stays within its configured 2% error envelope") {
    // the k02 entry publishes only the oracle-checkable columns (exact
    // count + the ≤5% contract boolean); this spec holds the raw
    // sketch estimate itself to the same bound
    val rows = graft.core.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts")
      val approx = r.getAs[Long]("approx_parts")
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact rel_err=$err")
    }
    // and the published contract column must agree
    SparkEntry.queries("k02_approx_distinct")(spark, sfDir).collect()
      .foreach(r => assert(r.getAs[Boolean]("within_5pct"),
        s"${r.getString(0)}: within_5pct=false"))
  }

  test("k04: GK approx median lands within rank bound of the exact percentile") {
    // the k04 entry publishes the rank-bound contract boolean; this
    // spec holds the raw sketch value against the exact interpolated
    // median: |rank(approx) - 0.5| must stay inside the window the
    // query promises, per event type.
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val exact = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("exact_p50"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_p50"),
        count(lit(1)).as("n"))
      .collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val ex = r.getAs[Double]("exact_p50")
      val ap = r.getAs[Double]("approx_p50")
      // the sketch returns an actual data value near the median; with
      // 2-dp money values the two must sit close in VALUE space too
      assert(math.abs(ap - ex) / math.max(ex, 1.0) < 0.05,
        s"${r.getString(0)}: approx=$ap exact=$ex")
    }
    SparkEntry.queries("k04_approx_quantile")(spark, sfDir).collect()
      .foreach(r => assert(r.getAs[Boolean]("within_rank_bound"),
        s"${r.getString(0)}: within_rank_bound=false"))
  }

  test("k01: salted aggregation equals the direct groupBy") {
    val salted = SparkEntry.queries("k01_salted_agg")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val direct = graft.core.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(graft.core.Tables.moneySum(col("l_extendedprice")), 2).as("rev"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(salted == direct)
  }

  test("k05: salted join shuffles (no broadcast) and splits every hot key") {
    val df = SparkEntry.queries("k05_salted_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the hint must hold — a broadcast would hide the skew the salt
    // exists to spread, leaving the pattern untested
    assert(plan.contains("SortMergeJoin"), s"expected a shuffle join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), "dim was broadcast")
    // and the salted key space must actually fan each flag out
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    val fanout = li
      .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(16)))
      .groupBy("l_returnflag").agg(countDistinct(col("salt")).as("n_salts"))
      .collect()
    fanout.foreach(r => assert(r.getAs[Long]("n_salts") > 1,
      s"${r.getString(0)}: hot key not spread"))
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    // the configured shuffle partition count is sized for the big
    // stages; AQE must shrink it for small exchanges instead of
    // spraying a handful of rows over every reducer — at 1000
    // executors an uncoalesced 3-row aggregate schedules thousands of
    // no-op tasks per query
    // pin the configs the assertion rides on (SkewSpec discipline) —
    // the test must fail only when AQE coalescing breaks, not when a
    // neighbor spec or spark-defaults flips a session flag
    val prev = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      prev.foreach { case (k, _) => spark.conf.set(k, "true") }
      val df = graft.core.Tables.load(spark, sfDir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"post-shuffle coalesce missing from the adaptive plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE promotes a sort-merge join to broadcast when runtime stats " +
      "come in under the threshold") {
    // static estimates can wildly overstate a post-filter side (no
    // stats on derived frames) — at 1000 executors the difference
    // between the planned SMJ and the runtime BHJ is two full
    // shuffles of the fact. AQE re-plans from MEASURED sizes; this
    // pins that the re-plan actually happens.
    val prev = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.localShuffleReader.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      prev.foreach { case (k, _) => spark.conf.set(k, "true") }
      val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      // an aggregate blocks static broadcast planning (unknown output
      // size > threshold assumption), but its RUNTIME output is tiny
      val smallAgg = graft.core.Tables.load(spark, sfDir, "orders")
        .groupBy(col("o_orderkey")).agg(max(col("o_totalprice")).as("p"))
        .filter(col("p") > 0)
      val joined = li.join(smallAgg, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"AQE did not promote the join to broadcast at runtime:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("k09: bitmap distinct is exact at both rollup grains") {
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    val exactPer = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = li.select(countDistinct(col("l_partkey")))
      .collect()(0).getLong(0)
    val got = SparkEntry.queries("k09_bitmap_distinct")(spark, sfDir)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("n_parts") == exactPer(r.getString(0)),
        s"${r.getString(0)}: bitmap per-flag distinct off")
      assert(r.getAs[Long]("n_parts_all") == exactAll,
        s"${r.getString(0)}: OR-merged global distinct off")
    }
  }

  test("k10: HLL union of fine-grain sketches IS the coarse-grain sketch") {
    // mergeability is lossless for HLL: union takes register-wise max,
    // so merging per-(flag, status) sketches must give the IDENTICAL
    // estimate to sketching per flag directly — not merely a close one.
    // (This is what makes a fine-grain sketch rollup table answer every
    // coarser grain exactly as well as a rescan would.)
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))")
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    val merged = graft.operators.ScaleOps.hllRolled(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_parts"))
      .toMap
    assert(merged == direct,
      s"sketch merge not lossless: merged=$merged direct=$direct")
    // and the raw estimate actually honors the published 5% contract
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (flag, est) =>
      val err = math.abs(est - exact(flag)).toDouble / exact(flag)
      assert(err <= 0.05, s"$flag: est=$est exact=${exact(flag)} err=$err")
    }
  }

  test("k06: bloom prefilter prunes non-matching rows, never matching ones") {
    val s = spark
    val dir = sfDir
    val li = graft.core.Tables.load(s, dir, "lineitem")
    val exactKeys = graft.core.Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 450000.0).select(col("o_orderkey"))
    val exact = li.join(exactKeys,
      li("l_orderkey") === exactKeys("o_orderkey"), "left_semi").count()
    val full = li.count()
    assert(exact < full, "fixture degenerate: filter prunes nothing")
    // the PRUNING property itself: the bloom candidate set must be a
    // strict subset of the scan (an always-true filter would still
    // give correct joined output) and a superset of the true matches
    // (no false negatives)
    val candidates = graft.operators.ScaleOps.bloomPruned(s, dir).count()
    assert(candidates >= exact,
      s"bloom dropped true matches: $candidates < $exact")
    assert(candidates < full,
      s"bloom filter degenerated to always-true: $candidates of $full")
    val result = SparkEntry.queries("k06_bloom_join")(s, dir)
      .agg(sum("n_lines")).collect()(0).getLong(0)
    assert(result == exact, s"bloom join lost rows: $result != $exact")
  }
}
