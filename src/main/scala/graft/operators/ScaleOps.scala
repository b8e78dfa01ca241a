package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T, QueryPack, Scratch}

/** Scale-pattern operators: the shuffle-shaping techniques the 100 TB
  * design notes promise (salting for skew; bucketing for co-located
  * joins lives in BucketingSpec because its observable is the absence
  * of an Exchange, not a row set).
  *
  * k01 demonstrates the two-phase salted aggregation: a skewed group key
  * (lineitem has only 3 return flags, so every flag is a hot key) is
  * widened with a deterministic 16-way salt for the first, heavy
  * shuffle; the second shuffle combines 3×16 partial rows. Identical
  * results to the direct groupBy — the oracle proves it — but no single
  * reducer ever sees a whole hot key's rows. AQE's skew handling covers
  * joins (proven in SkewSpec: a 95%-hot-key sort-merge join gets its
  * hot partition split at runtime, `skew=true` in the adaptive plan —
  * with the caveat that AQE declines the split when a downstream
  * operator reuses the join's output partitioning); aggregation skew
  * still wants this explicit pattern.
  */
object ScaleOps extends QueryPack {

  private val saltedAgg: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val partial = li
      .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        count(lit(1)).as("n"),
        sum(T.dec2(col("l_extendedprice"))).as("price_sum"),
        sum((T.dec2(col("l_quantity")) * 100).cast("long")).as("qty_cents"))
    partial
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("n")).as("n_lines"),
        round(sum(col("price_sum")).cast("double"), 2).as("revenue"),
        (floor((sum(col("qty_cents")).cast("double") * 2
            + sum(col("n")).cast("double"))
          / (sum(col("n")).cast("double") * 2)) / lit(100.0))
          .as("avg_qty"))
      .orderBy("l_returnflag")
  }

  /** HLL-sketch COUNT DISTINCT beside the exact one — the reference only
    * ever uses exact distinct (SURVEY §2.3 A9), but at 100 TB an exact
    * distinct is a full shuffle of every key while the sketch merges
    * fixed-size buffers. Output splits the deterministic columns from
    * the engine-specific sketch: the exact count and the ≤5%-error
    * CONTRACT are oracle-checked; the raw sketch value (which no other
    * engine can recompute) lives in ScaleSpec, where the same ≤5%
    * bound is asserted against the actual estimate. */
  private val approxDistinct: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double") /
          col("exact_parts").cast("double") <= 0.05).as("within_5pct"))
      .orderBy("l_returnflag")
  }

  /** GK-sketch quantiles beside the exact path — w05 computes exact
    * interpolated medians (sort every group), which at 100 TB is a full
    * shuffle-and-sort of the measure column per key; `percentile_approx`
    * merges fixed-size Greenwald-Khanna buffers instead, the way
    * quality-score thresholds actually get computed over a corpus.
    * Same split as k02: the deterministic columns (per-type counts) and
    * the rank-error CONTRACT are oracle-checked; the raw approx value
    * (engine-specific) is asserted against the exact percentile in
    * ScaleSpec. The bound is the sketch's own, not a fixed window: the
    * returned value v is a data point whose admissible rank interval is
    * (count(<v), count(<=v)], and the sketch bounds that interval's
    * distance from 0.5n. So count(<=v)/n >= 0.5 - eps AND
    * count(<v)/n <= 0.5 + eps, with count(<v) = count(<=v) - tie mass
    * at v — the slack absorbs ties structurally instead of guessing a
    * window for them, so a heavier-tied distribution or another scale
    * factor cannot flip the check while the sketch is in-contract.
    * eps is 2/accuracy, not 1/accuracy: Spark executes this as a
    * MERGE of per-partition GK summaries, and merging eps'-summaries
    * is guaranteed only to ~2*eps' rank error (measured: le_frac
    * 0.49899 at sf0.01 — outside 1/accuracy, inside the merge bound). */
  private val approxQuantile: Q = (s, dir) => {
    val ev = T.load(s, dir, "events")
    val sketch = ev.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), lit(0.5), lit(1000))
        .as("approx_p50"))
    val eps = 2.0 / 1000 + 1e-9 // merged-GK rank error + float-div slack
    ev.join(broadcast(sketch), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        (sum(when(col("value") <= col("approx_p50"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("le_frac"),
        (sum(when(col("value") < col("approx_p50"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("lt_frac"))
      .select(col("event_type"), col("n_rows"),
        (col("le_frac") >= 0.5 - eps && col("lt_frac") <= 0.5 + eps)
          .as("within_rank_bound"))
      .orderBy("event_type")
  }

  /** k05: two-sided salted JOIN — the join-skew twin of k01's salted
    * aggregation. lineitem joins a 3-row returnflag dimension; every
    * dim key is hot (each matches ~1/3 of the fact), the worst case
    * for a shuffle join. The cure: replicate the SMALL side once per
    * salt (3 rows × 16 salts = 48), salt the fact deterministically,
    * and join on (key, salt) — each hot key's rows now land on 16
    * reducers instead of one. The `merge` hint forces the shuffle
    * join the pattern exists for (Spark would otherwise broadcast a
    * 48-row dim and hide the skew entirely); at 100 TB the dim that
    * needs this is the one too big to broadcast. The oracle replays
    * the dim as a CASE — identical results to the unsalted join. */
  private val saltedJoin: Q = (s, dir) => {
    val salts = 16
    val li = T.load(s, dir, "lineitem")
      .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(salts)))
    val flags = s.createDataFrame(Seq(
      ("A", "returned"), ("N", "kept"), ("R", "refunded")))
      .toDF("flag", "flag_desc")
    val dim = s.range(0, salts)
      .select(col("id").cast("long").as("salt")).crossJoin(flags)
    li.hint("merge")
      .join(dim, li("l_returnflag") === dim("flag") &&
        li("salt") === dim("salt"))
      .groupBy(col("flag_desc"))
      .agg(count(lit(1)).as("n_lines"),
        round(T.moneySum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("flag_desc")
  }

  /** k06: Bloom-filter join pruning — the semi-join reduction that
    * keeps a 100 TB fact scan from shuffling rows that cannot match.
    * The dim keys (high-value orders) fold into a fixed-size bit
    * array by DISTRIBUTED aggregation; only the finished 8 KB filter
    * returns to the driver and re-enters the plan as a literal — the
    * exact materialize-and-rebroadcast shape of Spark's own runtime
    * filters, with transfer bounded by the sketch size, never the dim.
    * Inlining (rather than cross-joining the 1-row filter frame) is
    * load-bearing: as a literal, `might_contain` is a plain codegen
    * Filter sitting directly on the fact scan, so only ~selectivity·n
    * candidate rows (plus bounded false positives) pay the semi-join
    * exchange — the join-reorderer CANNOT hoist a scan-level filter
    * above the join, whereas the cross-join form got exactly that
    * treatment (BNLJ re-planned above the semi join, filtering after
    * the full shuffle it existed to prevent). The exact join after
    * the filter removes false positives; no-false-negatives is
    * structural (same hash family both sides) and the oracle's plain
    * IN-subquery proves it — any dropped key would change the
    * aggregate. */
  /** The Bloom-pruned fact frame k06 joins — public so the spec can
    * assert the PRUNING property itself (candidates strictly between
    * the exact match count and the full scan), which the end result
    * cannot show: an always-true filter would still produce correct
    * joined output. */
  def bloomPruned(s: SparkSession, dir: String): DataFrame = {
    val bits = 1 << 16 // 8 KB filter; size for the dim's key count
    val words = bits / 64
    val hashes = Seq(1, 2, 3) // k=3 seeded hash functions
    // THE shared dim-key frame (same definition the semi join probes):
    // a build-side predicate that drifted from the probe side would
    // build the filter on different keys and silently DROP matching
    // rows — a false negative, not a visible error.
    val dimKeys = bloomDimKeys(s, dir)
    // seeds as LONG on both sides: xxhash64 folds each input's bytes
    // by type, so an int seed here and a long seed in the probe would
    // silently hash to different positions (no false negatives only
    // holds if build and probe use the identical hash family)
    def positions(key: Column): Column = array(hashes.map(seed =>
      pmod(xxhash64(key, lit(seed.toLong)), lit(bits.toLong))): _*)
    // one row: the filter as array<long> of `words` OR-folded words
    // (shiftleft/shiftright by a COLUMN exist only in SQL form — the
    // Scala API pins numBits to a literal int)
    val bloom = dimKeys
      .select(explode(positions(col("o_orderkey"))).as("pos"))
      .groupBy(expr("CAST(pos DIV 64 AS INT)").as("w"))
      .agg(expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").as("word"))
      .agg(map_from_arrays(collect_list(col("w")),
        collect_list(col("word"))).as("wordmap"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("wordmap"), w), lit(0L))).as("bf"))
    // `& 1`, NOT `% 2`: when the probed bit is position 0 of a word
    // whose sign bit is also set, the unsigned shift by 0 leaves the
    // long negative and SQL % keeps the dividend's sign (-1, not 1) —
    // a false negative on exactly the keys that hashed to bit 0
    def mightContain(keyCol: String): Column =
      hashes.map { seed =>
        val pos = s"pmod(xxhash64($keyCol, ${seed}L), ${bits}L)"
        expr(s"""(shiftrightunsigned(
          |  element_at(bf, CAST($pos DIV 64 AS INT) + 1),
          |  CAST($pos % 64 AS INT)) & 1L) = 1""".stripMargin)
      }.reduce(_ && _)
    val li = T.load(s, dir, "lineitem")
    val bfWords = bloom.collect()(0).getSeq[Long](0).toArray
    li.withColumn("bf", lit(bfWords))
      .filter(mightContain("l_orderkey"))
      .drop("bf")
  }

  /** The high-value-order key set — the ONE definition both the Bloom
    * build side ([[bloomPruned]]) and the exact semi-join probe use;
    * no-false-negatives requires build and probe to agree on the key
    * set, so the predicate must never be duplicated. */
  private def bloomDimKeys(s: SparkSession, dir: String): DataFrame =
    T.load(s, dir, "orders")
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey"))

  private val bloomJoin: Q = (s, dir) => {
    val pruned = bloomPruned(s, dir)
    val dimKeys = bloomDimKeys(s, dir)
    pruned.join(dimKeys.hint("shuffle_hash"),
        pruned("l_orderkey") === dimKeys("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        round(T.moneySum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("l_returnflag")
  }

  /** k07: bucketed range join — the equi-join rewrite of t05's
    * attribution range join. A range join on (user_id, time-interval)
    * equi-joins on user_id alone and evaluates the interval as a
    * post-condition, so ONE hot user's clicks × purchases explode
    * into a per-key product no matter how far apart in time they are.
    * The rewrite quantizes time into gap-sized buckets, duplicates
    * each click into its own and the NEXT bucket (a purchase within
    * [click, click+gap) can only land in those two), and joins on
    * (user_id, bucket) — the join key now bounds candidates to
    * TEMPORALLY ADJACENT events, cutting the hot-key product from
    * |clicks|·|purchases| to Σ per-bucket products, at the cost of a
    * 2× click-side replication. This is the rewrite behind range-join
    * optimizers (e.g. Databricks' range join binning); the oracle is
    * the PLAIN range join — the optimization must be invisible in the
    * result. The `merge` hint pins the shuffle join the pattern
    * exists for (a broadcast would hide the hot-key product at test
    * scale). */
  private val bucketedRangeJoin: Q = (s, dir) => {
    val gapSec = 1800L
    val ev = T.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
      .withColumn("cb", expr(s"CAST(click_ts AS LONG) div $gapSec"))
      .withColumn("jb", explode(array(col("cb"), col("cb") + 1L)))
      .alias("c")
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("buy_ts"), col("value"))
      .withColumn("pb", expr(s"CAST(buy_ts AS LONG) div $gapSec"))
      .alias("p")
    clicks.hint("merge").join(buys,
        col("c.user_id") === col("p.user_id") &&
        col("c.jb") === col("p.pb"))
      .filter(col("buy_ts") >= col("click_ts") &&
        col("buy_ts") < col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("c.user_id"))
      .agg(count(lit(1)).as("n_attributed"),
        round(T.moneySum(col("value")), 2).as("attributed_revenue"))
      .orderBy("user_id")
  }

  /** k08: the AUTOMATIC face of k07 — the same attribution range join
    * written PLAINLY (no manual buckets) and rewritten by the injected
    * [[graft.plans.RangeJoinBinning]] optimizer rule, enabled on a
    * cloned session so the flag cannot leak into other queries (t05
    * runs the identical plain join un-rewritten in the same process).
    * The oracle is the plain range join — identical to k07's, which
    * is the whole contract: hand-binned, auto-binned, and un-binned
    * plans must be row-for-row equal. RangeJoinBinningSpec asserts
    * the plan difference (Generate + bucket equi-keys fire only under
    * the flag). */
  private val autoBinnedRangeJoin: Q = (s, dir) => {
    val s2 = s.newSession()
    graft.core.GraftExtensions.register(s2)
    s2.conf.set(graft.plans.RangeJoinBinning.confKey, "true")
    val ev = T.load(s2, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts")).alias("c")
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("buy_ts"), col("value"))
      .alias("p")
    clicks.join(buys,
        col("c.user_id") === col("p.user_id") &&
        col("p.buy_ts") >= col("c.click_ts") &&
        col("p.buy_ts") < col("c.click_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("c.user_id"))
      .agg(count(lit(1)).as("n_attributed"),
        round(T.moneySum(col("value")), 2).as("attributed_revenue"))
      .orderBy("user_id")
  }

  /** k09: EXACT distinct via roaring-style bitmap aggregation — the
    * third point on the distinct-count design space beside A9's plain
    * COUNT DISTINCT (exact, but shuffles every key occurrence) and
    * k02's HLL (fixed state, but approximate). Keys fold into per-
    * (group, 32k-bucket) bitmaps — `bitmap_bit_position` picks the bit,
    * `bitmap_construct_agg` ORs a partition's keys map-side — so the
    * shuffle carries at most one ≤4 KB bitmap per populated bucket
    * instead of one row per key occurrence: exactness at sketch-like
    * transfer cost. The payoff this query proves is REUSE: the same
    * bucket bitmaps roll up twice — summed per flag, and OR-merged
    * across flags for the global distinct — without rescanning the
    * fact, the cube-materialization trick exact COUNT DISTINCT can
    * never do (distincts don't add across groups; bitmaps OR). */
  private val bitmapDistinct: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val buckets = li
      .groupBy(col("l_returnflag"),
        expr("bitmap_bucket_number(l_partkey)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))")
        .as("bm"))
    val perFlag = buckets.groupBy(col("l_returnflag"))
      .agg(sum(expr("bitmap_count(bm)")).as("n_parts"))
    // global distinct from the SAME bitmaps: OR within bucket across
    // flags, then count — a one-row frame broadcast back onto the
    // per-flag rows (singleton crossJoin, the audited BNLJ shape)
    val global = buckets.groupBy(col("bkt"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .agg(sum(expr("bitmap_count(bm)")).as("n_parts_all"))
    perFlag.crossJoin(broadcast(global)).orderBy("l_returnflag")
  }

  /** k10: re-aggregatable HLL sketches — what k02's
    * `approx_count_distinct` CANNOT do: its partials never leave the
    * plan, so a per-(flag, status) rollup table answers no per-flag
    * question. `hll_sketch_agg` makes the sketch a COLUMN: build once
    * at the fine grain, `hll_union_agg` merges up any coarser grain
    * without touching the fact again — the mergeable-summary property
    * (Agarwal et al., "Mergeable Summaries", PODS'12) that makes
    * sketch rollup tables work at 100 TB. Deterministic columns (group
    * count, exact distinct) and the ≤5% CONTRACT are oracle-checked;
    * the estimate itself is engine-specific (ScaleSpec asserts its
    * actual error and the build-once-merge-up equivalence). */
  def hllRolled(s: SparkSession, dir: String): DataFrame = {
    val li = T.load(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_groups_merged"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_parts"))
  }

  private val hllRollup: Q = (s, dir) => {
    val exact = T.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    exact.join(hllRolled(s, dir), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_groups_merged"),
        col("exact_parts"),
        (abs(col("est_parts") - col("exact_parts")).cast("double") /
          col("exact_parts").cast("double") <= 0.05).as("within_5pct"))
      .orderBy("l_returnflag")
  }

  /** k11: bucket-pruned co-located fact⋈fact join — BOTH sides written
    * bucketed+sorted on the join key, then joined and rolled up with
    * broadcast disabled, so the join itself is exchange-free (the
    * 100 TB pattern: pay the shuffle once at write time, amortize it
    * over every subsequent join; BucketingSpec holds the plan assert —
    * zero Exchange on either side). Table FILES live under a Scratch
    * dir (external tables, JVM-exit cleanup); the bucketed copy is
    * built ONCE per (session, dir) and reused by every later
    * invocation — see [[bucketedTables]]. The bucketing must be
    * invisible in the result — the oracle is the plain unbucketed
    * join. */
  /** One bucketed copy of orders+lineitem per (session, data dir) —
    * repeated k11 invocations (bench warmup + timed run, concurrent
    * k03 harness) reuse it instead of registering fresh
    * invocation-unique tables and re-writing full table copies each
    * time (which accumulated catalog entries and Scratch data until
    * JVM exit). Reuse is also the pattern's own point: pay the
    * bucketing shuffle once at write time, amortize it over every
    * subsequent join. computeIfAbsent makes the build race-free. */
  private val bucketCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, String)]()

  private def bucketedTables(s: SparkSession, dir: String): (String, String) = {
    graft.core.SessionCaches.prune(bucketCache)
    bucketCache.computeIfAbsent((s, dir), _ => {
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val (ob, lb) = (s"orders_bk_$tag", s"lineitem_bk_$tag")
      T.load(s, dir, "orders")
        .write.option("path", Scratch.dir("k11_orders"))
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ob)
      T.load(s, dir, "lineitem")
        .write.option("path", Scratch.dir("k11_lineitem"))
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lb)
      (ob, lb)
    })
  }

  private val bucketedColocatedJoin: Q = (s, dir) => {
    val (ob, lb) = bucketedTables(s, dir)
    // MERGE hint, not a conf toggle: the frame plans lazily, so a
    // set-then-restore of autoBroadcastJoinThreshold would be undone
    // before execution — the hint rides the plan itself and keeps the
    // join sort-merge (where bucketing eliminates both exchanges) at
    // any scale factor.
    s.table(lb).hint("merge")
      .join(s.table(ob), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(T.moneySum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** k12: dynamic-partition-pruning join — the runtime half of
    * partition pruning: the selective predicate lives on the DIM's
    * non-key column, so no static fact filter exists anywhere in the
    * query and only DPP (the runtime reuse of the broadcast dim as a
    * fact-scan subquery filter) avoids reading all 12 month
    * partitions. PruningSpec holds the plan/file-count proof (3 of 12
    * partitions read); this entry makes the RESULT gate-visible — the
    * pruning must be invisible in the answer, so the oracle is the
    * plain month-filter replay on the unpartitioned table. The
    * partitioned copy is built once per (session, dir), k11's cache
    * discipline. */
  private val dppCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def partitionedOrders(s: SparkSession, dir: String): String = {
    graft.core.SessionCaches.prune(dppCache)
    dppCache.computeIfAbsent((s, dir), _ => {
      val path = Scratch.dir("k12_orders")
      T.load(s, dir, "orders")
        .withColumn("o_month", month(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_month").parquet(path)
      path
    })
  }

  private val dppJoin: Q = (s, dir) => {
    val fact = s.read.parquet(partitionedOrders(s, dir))
    val dim = s.range(1, 13)
      .select(col("id").cast("int").as("m"), (col("id") % 4).as("grp"))
    fact.join(broadcast(dim), col("o_month") === col("m"))
      .filter(col("grp") === 1) // months 1, 5, 9 — known only at runtime
      .groupBy(col("o_month").cast("long").as("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(T.moneySum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("o_month")
  }

  /** K13 sketch geometry: d=3 seeded hash rows × w=1024 counters —
    * 24 KB total, the fixed-size frequency summary. */
  private val cmsW = 1024
  private val cmsSeeds = Seq(1L, 2L, 3L)

  /** K13: Count-Min sketch heavy hitters — the fixed-size frequency
    * sketch (Cormode & Muthukrishnan '05) beside the exact rollup, the
    * same sketch-vs-exact contract pattern as k02 (HLL) and k04 (GK
    * quantiles). The sketch builds DISTRIBUTIVELY: each row fans into
    * d (seed, bucket) increments, one map-side-combined aggregation
    * folds them to ≤ d·w counter rows, and only the finished 24 KB
    * table returns to the driver and re-enters the plan as literal
    * arrays (the k06 Bloom materialize-and-rebroadcast shape —
    * transfer is bounded by sketch size, never key cardinality).
    * Estimates are min-over-rows counter lookups: scan-level, no
    * shuffle, mergeable across shards by counter-wise addition — the
    * reason a 100 TB frequency pass keeps a CMS per executor where an
    * exact per-key map would blow the heap.
    *
    * Checked contract on the exact top-10 keys: est ≥ exact (CMS never
    * undercounts — structural: the key's own increments all land in
    * its counters) and est ≤ exact + N/100 (CMS overcounts by at most
    * ε·N with ε = e/w ≈ 0.27% at 1−e^-d confidence; the 1% fence is
    * ~4× that bound and ~10× the expected N/w collision mass, wide
    * enough to be deterministic in practice across regenerations while
    * still proving sub-percent accuracy). The oracle pins the exact
    * counts and `true` for both contract booleans — a violated bound
    * fails the gate loudly. */
  /** The d seeded (seed, bucket) increments of one key — shared by k13
    * (batch build) and t12 (micro-batch partial build + merge). */
  private[graft] def cmsPositions(key: Column): Column =
    array(cmsSeeds.map(sd => struct(lit(sd).as("sd"),
      pmod(xxhash64(key, lit(sd)), lit(cmsW.toLong)).as("pos"))): _*)

  private val cmsHeavyHitters: Q = (s, dir) => {
    val ev = T.loadEvents(s, dir).select(col("user_id"))
    val counters = ev
      .select(explode(cmsPositions(col("user_id"))).as("c"))
      .groupBy(col("c.sd"), col("c.pos")).agg(count(lit(1)).as("n"))
      .collect() // bounded: ≤ d·w = 3072 counter rows (the sketch)
    val tables: Map[Long, Array[Long]] = cmsSeeds.map { sd =>
      val arr = Array.fill(cmsW)(0L)
      counters.filter(_.getLong(0) == sd)
        .foreach(r => arr(r.getLong(1).toInt) = r.getLong(2))
      sd -> arr
    }.toMap
    // Σ counters in any one row = N (every event lands once per row)
    val total = tables(cmsSeeds.head).sum
    val est = least(cmsSeeds.map { sd =>
      element_at(lit(tables(sd)),
        (pmod(xxhash64(col("user_id"), lit(sd)), lit(cmsW.toLong)) + 1)
          .cast("int"))
    }: _*)
    T.loadEvents(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(desc("n_events"), col("user_id"))
      .limit(10)
      .withColumn("est", est)
      .select(col("user_id"), col("n_events"),
        (col("est") >= col("n_events")).as("sketch_ge_exact"),
        (col("est") <= col("n_events") + lit(total / 100L))
          .as("sketch_within_eps"))
  }

  /** K14: incremental aggregate maintenance by partial-merge — the
    * pattern that makes a 100 TB rolling aggregate affordable: never
    * recompute the world, aggregate only the NEW partition and merge
    * it into the standing per-key state with the aggregates' own
    * monoid ops (count/sum add; min/max meet — `least`/`greatest`
    * skip NULLs identically in both engines, which is what makes the
    * full-outer merge correct for keys present on one side only).
    * Here the "arriving delta" is carved deterministically
    * (event_id % 10 = 0) so the oracle can hold the merge to the
    * strongest possible standard: the merged state must equal a
    * from-scratch recompute over the union, value for value.
    *
    * 100 TB shape: each side is one map-side-combined groupBy to
    * |users| rows; the merge is a key-partitioned full-outer join of
    * two pre-reduced frames — the delta side is new-partition-sized,
    * so at scale the join broadcasts the delta against the standing
    * state. Sums ride integer cents (exact monoid — double addition
    * does not reassociate). */
  private val deltaMergeAgg: Q = (s, dir) => {
    val ev = T.loadEvents(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        (T.dec2(col("value")) * 100).cast("long").as("v_cents"))
    def partial(df: DataFrame) = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("s"),
        min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    val base = partial(ev.filter(col("event_id") % 10 =!= 0))
    val delta = partial(ev.filter(col("event_id") % 10 === 0))
    base.as("b").join(delta.as("d"), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
          .as("n_events"),
        (coalesce(col("b.s"), lit(0L)) + coalesce(col("d.s"), lit(0L)))
          .as("sum_cents"),
        least(col("b.mn"), col("d.mn")).as("first_ts"),
        greatest(col("b.mx"), col("d.mx")).as("last_ts"))
      .orderBy("user_id")
  }

  val queries: Map[String, Q] = Map(
    "k14_delta_agg_merge" -> deltaMergeAgg,
    "k13_cms_heavy_hitters" -> cmsHeavyHitters,
    "k12_dpp_join" -> dppJoin,
    "k11_bucketed_join" -> bucketedColocatedJoin,
    "k07_bucketed_range_join" -> bucketedRangeJoin,
    "k08_auto_binned_range_join" -> autoBinnedRangeJoin,
    "k01_salted_agg" -> saltedAgg,
    "k02_approx_distinct" -> approxDistinct,
    "k04_approx_quantile" -> approxQuantile,
    "k05_salted_join" -> saltedJoin,
    "k06_bloom_join" -> bloomJoin,
    "k09_bitmap_distinct" -> bitmapDistinct,
    "k10_hll_rollup" -> hllRollup)

  val oracle: Map[String, String] = Map(
    // the strongest merge check: from-scratch recompute over the
    // union — the Spark side must reproduce it via partial-merge
    "k14_delta_agg_merge" ->
      s"""SELECT user_id, COUNT(*) AS n_events,
         |  CAST(SUM(CAST(${T.oDec2("value")} * 100 AS BIGINT)) AS BIGINT)
         |    AS sum_cents,
         |  MIN(ts) AS first_ts, MAX(ts) AS last_ts
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the sketch is invisible in the checked values: exact top-10
    // counts, with the two CMS contract bounds pinned true (k02/k04
    // contract pattern — the sketch itself is engine-side xxhash64,
    // which DuckDB cannot replay)
    "k13_cms_heavy_hitters" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  true AS sketch_ge_exact, true AS sketch_within_eps
        |FROM events GROUP BY 1
        |ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin,
    // partition layout + DPP are invisible in the answer: the oracle
    // replays the dim's month selection as a plain filter
    "k12_dpp_join" ->
      s"""SELECT CAST(month(o_orderdate) AS BIGINT) AS o_month,
         |  COUNT(*) AS n_orders,
         |  ROUND(${T.oMoneySum("o_totalprice")}, 2) AS revenue
         |FROM orders
         |WHERE month(o_orderdate) % 4 = 1
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // bucketing is a layout choice: the oracle is the plain join
    "k11_bucketed_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
         |  ROUND(${T.oMoneySum("l_extendedprice")}, 2) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the bucketing must be INVISIBLE in the result: the oracle is the
    // plain (unbucketed) range join — t05's semantics
    "k07_bucketed_range_join" ->
      s"""WITH c AS (
         |  SELECT user_id, ts AS click_ts FROM events
         |  WHERE event_type = 'click'),
         |p AS (
         |  SELECT user_id, ts AS buy_ts, value FROM events
         |  WHERE event_type = 'purchase')
         |SELECT c.user_id, COUNT(*) AS n_attributed,
         |  ROUND(${T.oMoneySum("value")}, 2) AS attributed_revenue
         |FROM c JOIN p ON c.user_id = p.user_id
         |  AND p.buy_ts >= c.click_ts
         |  AND p.buy_ts < c.click_ts + INTERVAL 30 MINUTE
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same contract as k07: the rewrite must be invisible in the result
    "k08_auto_binned_range_join" ->
      s"""WITH c AS (
         |  SELECT user_id, ts AS click_ts FROM events
         |  WHERE event_type = 'click'),
         |p AS (
         |  SELECT user_id, ts AS buy_ts, value FROM events
         |  WHERE event_type = 'purchase')
         |SELECT c.user_id, COUNT(*) AS n_attributed,
         |  ROUND(${T.oMoneySum("value")}, 2) AS attributed_revenue
         |FROM c JOIN p ON c.user_id = p.user_id
         |  AND p.buy_ts >= c.click_ts
         |  AND p.buy_ts < c.click_ts + INTERVAL 30 MINUTE
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "k01_salted_agg" ->
      s"""SELECT l_returnflag,
         |  COUNT(*) AS n_lines,
         |  ROUND(${T.oMoneySum("l_extendedprice")}, 2) AS revenue,
         |  ${T.oMoneyAvg2("l_quantity")} AS avg_qty
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "k02_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  true AS within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "k04_approx_quantile" ->
      """SELECT event_type, COUNT(*) AS n_rows,
        |  true AS within_rank_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the salted join must be INVISIBLE in the result: the oracle is
    // the plain unsalted join, dim replayed as a CASE
    "k05_salted_join" ->
      s"""SELECT CASE l_returnflag WHEN 'A' THEN 'returned'
         |    WHEN 'N' THEN 'kept' WHEN 'R' THEN 'refunded' END
         |    AS flag_desc,
         |  COUNT(*) AS n_lines,
         |  ROUND(${T.oMoneySum("l_extendedprice")}, 2) AS revenue
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // the bitmaps must be INVISIBLE in the result: exact distinct,
    // plain COUNT(DISTINCT) both grains
    "k09_bitmap_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)
        |    AS n_parts_all
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // deterministic columns + the error contract; the estimate itself
    // is engine-specific (asserted against exact in ScaleSpec)
    "k10_hll_rollup" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_linestatus) AS n_groups_merged,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  true AS within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // the Bloom pass must drop nothing the exact join keeps: the
    // oracle is the plain IN-subquery semi join
    "k06_bloom_join" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_lines,
         |  ROUND(${T.oMoneySum("l_extendedprice")}, 2) AS revenue
         |FROM lineitem
         |WHERE l_orderkey IN (
         |  SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
