package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Tables => T, QueryPack}

/** Window-function operators W1/W3/W4/W5 + O3 (SURVEY.md §2.5, §2.6).
  *
  * Reference semantics reproduced:
  *  - W1 ROW_NUMBER synthetic ids (`/root/reference/PRD.md:743`)
  *  - W3 LAG(1/24/168) time-series features (`PRD.md:5255-5266`)
  *  - W4 rolling avg, ROWS BETWEEN 23 PRECEDING (`PRD.md:5267-5272`)
  *  - W5 PERCENTILE_CONT(0.5) per partition (`PRD.md:853`)
  *  - O3 bare LIMIT sample (`scripts/verify_loaded_data.sql:79`)
  *
  * Scale notes: every window here is PARTITIONED (per event_type /
  * per group key) — the shuffle is on the partition key and each
  * partition sorts independently. The one global window (W1's synthetic
  * ids) runs over an already-aggregated ~25-row frame; a global
  * row_number over a fact table would be a deliberate anti-pattern
  * (single-partition sort) — at scale you'd zip partition-local indexes
  * with partition offsets instead. Portability: averages divide exact
  * integer sums in double (identical IEEE ops both engines) and the
  * median interpolates integer cents, so (a+b)/2 vs a+(b-a)/2 agree
  * bit-for-bit.
  */
object Windows extends QueryPack {

  /** Hourly event counts — the shared time-series frame for W3/W4
    * (≈ hourly demand per location, `PRD.md:5420-5429`). */
  private def hourly(s: SparkSession, dir: String): DataFrame =
    T.load(s, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("stat_hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** W1: ROW_NUMBER with explicit total order over an aggregated frame,
    * building CONCAT('hist_', rn) synthetic ids (`PRD.md:743`). */
  private val rowNumberIds: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    val c = T.load(s, dir, "customer")
    val n = T.load(s, dir, "nation")
    val perNation = o
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation_name"))
      .agg(count(lit(1)).as("n_orders"))
    perNation
      .withColumn("rn", row_number()
        .over(Window.orderBy(desc("n_orders"), col("nation_name")))
        .cast("long"))
      .select(
        concat(lit("hist_"), col("rn")).as("synthetic_id"),
        col("nation_name"), col("n_orders"))
      .orderBy("rn")
  }

  /** W3: LAG(n, 1|24|168) demand features per series
    * (`PRD.md:5255-5266`: previous hour / same hour yesterday / same
    * hour last week). */
  private val lagFeatures: Q = (s, dir) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("stat_hour"))
    hourly(s, dir)
      .select(
        col("event_type"), col("stat_hour"), col("n_events"),
        lag(col("n_events"), 1).over(w).as("prev_hour"),
        lag(col("n_events"), 24).over(w).as("same_hour_yesterday"),
        lag(col("n_events"), 168).over(w).as("same_hour_last_week"))
      .orderBy("event_type", "stat_hour")
  }

  /** W4: 24-row rolling average demand (`PRD.md:5267-5272`). The
    * average divides an exact integer window-sum by the window count —
    * the same IEEE division both engines. */
  private val rollingAvg: Q = (s, dir) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("stat_hour"))
      .rowsBetween(-23, Window.currentRow)
    hourly(s, dir)
      .select(
        col("event_type"), col("stat_hour"), col("n_events"),
        (sum(col("n_events")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("rolling_avg_24h"))
      .orderBy("event_type", "stat_hour")
  }

  /** W5: median (PERCENTILE_CONT 0.5) per partition (`PRD.md:853`),
    * computed per group then joined back (SURVEY §7.4.6) — a true
    * per-row percentile window would re-sort every frame; the
    * group-then-join plan aggregates once and broadcasts the tiny
    * medians. Interpolation runs on integer cents so half-way cases
    * are exact in both engines. */
  private val medianPerGroup: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val cents = (T.dec2(col("l_extendedprice")) * 100).cast("long")
    val med = li
      .groupBy(col("l_returnflag"))
      .agg((percentile(cents, lit(0.5)).cast("double") / 100.0)
        .as("median_price"))
    val base = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(T.moneySum(col("l_extendedprice")), 2).as("revenue"))
    base.join(broadcast(med), Seq("l_returnflag"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** W24: PERCENTILE_CONT as a TRUE analytic window — the reference's
    * literal spelling (`PRD.md:853`: PERCENTILE_CONT(trip_distance,
    * 0.5) OVER (PARTITION BY EXTRACT(HOUR FROM pickup_datetime))),
    * which w05 deliberately re-plans as group-then-join (SURVEY
    * §7.4.6). This entry keeps the analytic form — Spark ≥3.4 plans
    * `percentile_cont(...) WITHIN GROUP ... OVER (PARTITION BY ...)`
    * as a real window aggregate — so a user porting the reference SQL
    * verbatim gets the verbatim operator, and the w05 rewrite stays a
    * measured optimization, not a semantic workaround. Interpolation
    * runs on integer cents (the w05 discipline: 0.5 is exact binary,
    * cents are exact longs, so a + (b−a)/2 is bit-identical in both
    * engines). The per-row window output is rolled up per partition
    * key (every row in a partition carries the same median — MAX is
    * the identity pick), keeping the checked frame 24 rows.
    *
    * 100 TB shape: the window shuffles on pickup_hour and sorts each
    * hour partition once — the exact cost the reference accepts for
    * this query; hour cardinality is 24, so at real scale the
    * group-then-join w05 form (or a two-level pre-agg on (hour,
    * cents)) is the plan you'd migrate to, which is precisely what
    * having BOTH entries documents. */
  private val percentileWindow: Q = (s, dir) =>
    T.loadEvents(s, dir)
      .select(hour(col("ts")).cast("long").as("pickup_hour"),
        (T.dec2(col("value")) * 100).cast("long").as("cents"))
      .selectExpr("pickup_hour", "cents",
        "percentile_cont(0.5) WITHIN GROUP (ORDER BY cents) " +
          "OVER (PARTITION BY pickup_hour) AS med_raw")
      .groupBy(col("pickup_hour"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("med_raw")) / 100.0).as("median_value"))
      .orderBy("pickup_hour")

  /** O3: bare LIMIT (sample without sort). The sampled rows are
    * engine-dependent, so the checked output is the sample SIZE — the
    * limit operator itself (Global/LocalLimit) is what's exercised. */
  private val bareLimit: Q = (s, dir) =>
    T.load(s, dir, "lineitem").limit(100)
      .agg(count(lit(1)).as("n_sampled"))

  /** O6: pagination — total order + OFFSET/FETCH (`Dataset.offset`,
    * Spark 3.4+). The plan stays a single TakeOrdered-style top-(k+off)
    * with the offset dropped at the driver — no full sort materializes;
    * the ordering key includes the unique o_orderkey so page membership
    * is deterministic in both engines. */
  private val offsetFetch: Q = (s, dir) =>
    T.load(s, dir, "orders")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .offset(10).limit(20)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderpriority"))

  /** O7: KEYSET (seek) pagination — the scale-correct successor to
    * o06's OFFSET: OFFSET N must still compute-and-discard N rows
    * (top-(k+off) state, linear in page depth), while a keyset cursor
    * turns "next page" into a WHERE on the ordering key — a plain
    * scan-prunable filter plus the SAME top-k, constant in depth. The
    * cursor here is derived in-query (last row of page 2 via a
    * top-30), then the seek fetches page 3 strictly after it in
    * (o_totalprice DESC, o_orderkey ASC) order; the composite
    * row-comparison spells out as the OR-chain both engines plan as a
    * range predicate. The unique o_orderkey tie-break makes page
    * membership total, and the oracle cross-checks with plain
    * LIMIT/OFFSET — the two paginations MUST agree page-for-page. */
  private val keysetPagination: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    val cursor = o
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(30)
      .orderBy(col("o_totalprice"), desc("o_orderkey"))
      .limit(1)
      .select(col("o_totalprice").as("c_price"),
        col("o_orderkey").as("c_key"))
    o.crossJoin(broadcast(cursor))
      .filter(col("o_totalprice") < col("c_price") ||
        (col("o_totalprice") === col("c_price") &&
          col("o_orderkey") > col("c_key")))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderpriority"))
  }

  /** W6-ext: the remaining ranking/navigation window functions —
    * dense_rank (no rank gaps), ntile quartiles, first_value over the
    * full partition frame. Monthly order counts per status, windowed
    * within each status; ties on the count break by month so every
    * rank is deterministic in both engines. The window partitions by
    * the 3-value status key over ~36 aggregated rows — ranking runs
    * AFTER the aggregation, never over raw facts (the same discipline
    * as w01/q15). */
  private val windowExtras: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("n_orders").desc, col("m"))
    T.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"))
      .select(col("o_orderstatus"), col("m"), col("n_orders"),
        dense_rank().over(w).cast("long").as("dr"),
        ntile(4).over(w).cast("long").as("quartile"),
        first_value(col("m")).over(w).as("busiest_month"))
      .orderBy("o_orderstatus", "dr", "m")
  }

  /** O4-ext: EXCEPT / INTERSECT / UNION-distinct set semantics over
    * the H1 vs H2 active-customer sets — the one set-op family s09's
    * UNION ALL doesn't exercise (these dedupe, so each is a shuffle on
    * the full row as key). */
  private val setOps: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    val h1 = o.filter(month(col("o_orderdate")) <= 6).select(col("o_custkey"))
    val h2 = o.filter(month(col("o_orderdate")) > 6).select(col("o_custkey"))
    h1.intersect(h2).agg(count(lit(1)).as("n_both"))
      .crossJoin(h1.except(h2).agg(count(lit(1)).as("n_h1_only")))
      .crossJoin(h2.except(h1).agg(count(lit(1)).as("n_h2_only")))
      .crossJoin(h1.union(h2).distinct()
        .agg(count(lit(1)).as("n_active")))
  }

  /** W4-ext: time-RANGE window frame — w04's rolling average counts
    * ROWS; real event streams roll over TIME (all events in the
    * preceding hour, however many there are). The frame is RANGE over
    * epoch millis: order by `unix_millis(ts)` with
    * `rangeBetween(-(3600s-1ms), 0)` — irregular event spacing means
    * a row's frame holds a VARIABLE number of peers, which no ROWS
    * frame can express. Scale: the window partitions by event_type
    * (bounded key space) over per-type time-sorted runs — one shuffle
    * on the partition key, then a single ordered pass with a sliding
    * frame (Spark's WindowExec range mode advances two pointers; no
    * per-row rescan). */
  private val timeRangeWindow: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val hourMs = 3600L * 1000
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ms"))
      .rangeBetween(-(hourMs - 1), 0)
    T.load(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"),
        T.dec2(col("value")).as("v"))
      .select(col("event_type"), col("event_id"),
        count(lit(1)).over(w).as("n_last_hour"),
        sum(col("v")).over(w).cast("double").as("sum_last_hour"))
      // per-type tails keep the output deterministic AND small: the
      // newest 5 events per type (ties impossible: event_id unique)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("event_id").desc)))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("event_type", "event_id")
  }

  /** O-ext: explicit NULLS placement — the ordering semantic engines
    * genuinely disagree on by default (Spark sorts NULLS FIRST on ASC,
    * DuckDB NULLS LAST), so portable ordered output MUST state it.
    * A sparse column (discount only when > 0.05, like s02) is ranked
    * NULLS LAST both ascending and descending; the unique orderkey
    * tiebreak makes every position deterministic. */
  private val nullsOrdering: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val sparse = T.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_discount") > 0.05, col("l_discount")).as("d"))
    // each half: top-5 under its explicit NULLS LAST order, re-ranked
    // (window over the 5 surviving rows only) so the union's final
    // (half, rn) sort is total — cross-engine row order never rides
    // on UNION ALL's incidental ordering
    val asc5 = sparse
      .orderBy(col("d").asc_nulls_last, col("l_orderkey"),
        col("l_linenumber"))
      .limit(5)
      .select(lit(1L).as("half"), row_number().over(
          Window.orderBy(col("d").asc_nulls_last, col("l_orderkey"),
            col("l_linenumber"))).cast("long").as("rn"),
        col("l_orderkey"), col("l_linenumber"), col("d"))
    val desc5 = sparse
      .orderBy(col("d").desc_nulls_last, col("l_orderkey").desc,
        col("l_linenumber").desc)
      .limit(5)
      .select(lit(2L).as("half"), row_number().over(
          Window.orderBy(col("d").desc_nulls_last, col("l_orderkey").desc,
            col("l_linenumber").desc)).cast("long").as("rn"),
        col("l_orderkey"), col("l_linenumber"), col("d"))
    asc5.unionAll(desc5).orderBy("half", "rn")
  }

  /** W8: sequence-pattern detection (complex event processing) — find
    * per-user runs of ≥3 CONSECUTIVE error events via gaps-and-islands:
    * a running count of non-error events is constant exactly within an
    * unbroken error run, so grouping errors by (user, that count)
    * yields one row per maximal run — the standard SQL re-expression
    * of MATCH_RECOGNIZE's `E{3,}` pattern, which neither Spark nor
    * DuckDB ships. The (ts, event_id) ordering key makes runs total
    * and engine-stable.
    *
    * 100 TB shape: one shuffle on user_id; the window and both
    * groupings share that partitioning (islands key = (user, grp) is
    * a refinement, so the exchange is reused); per-user window sorts
    * are bounded by per-user history. */
  private val patternRuns: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    T.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("event_type") === "error").as("is_err"))
      .withColumn("grp",
        sum(when(col("is_err"), 0L).otherwise(1L)).over(w))
      .filter(col("is_err"))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("run_len") >= 3, 1L).otherwise(0L)).as("n_runs3"),
        max(col("run_len")).as("max_run_len"))
      .filter(col("n_runs3") >= 1)
      .orderBy("user_id")
  }

  /** W9: sessionization via Spark's native `session_window` — merge each
    * user's events into activity sessions separated by ≥ 6 h of
    * inactivity, keeping bursts of ≥ 3 events. This is THE idiomatic
    * Spark spelling (one `groupBy(session_window(...))`, no self-join,
    * no window-function pre-pass); the oracle replays it in DuckDB as
    * classic gaps-and-islands (LAG gap ≥ 6 h starts an island), which
    * also pins Spark's merge rule: a session's end is last-event + gap,
    * and an event exactly at the previous end starts a NEW session
    * (strict `<` merge), matching the oracle's `>=` break test.
    *
    * 100 TB shape: one shuffle on user_id, then per-key local sort +
    * linear merge inside `UpdatingSessionsIterator` — no O(n²), no
    * global sort; per-user state is one open session. */
  private val sessionization: Q = (s, dir) => {
    T.load(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
      .agg(
        count(lit(1)).as("n_events"),
        round(T.moneySum(col("value")), 2).as("session_value"))
      .filter(col("n_events") >= 3)
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")
  }

  /** W10: rolling z-score anomaly detection — flag hours whose event
    * count spikes ≥ 3 sample standard deviations above/below the
    * trailing 24-hour baseline (window excludes the current hour, so a
    * spike cannot suppress itself), the standard operational-metrics
    * anomaly monitor over the w03/w04 hourly frame.
    *
    * Exactness: the z² > 9 test is evaluated ENTIRELY in integer
    * arithmetic — (24x − S)²·23 > 9·24·(24Q − S²) with S = Σx,
    * Q = Σx² over the trailing window — so the oracle hash-matches
    * bit for bit; no engine's stddev/sqrt spelling is trusted. Safe
    * while hourly counts stay below ~6×10⁸ (the squared terms then
    * approach int64); beyond that, pre-aggregate to coarser keys or
    * lift to DECIMAL.
    *
    * 100 TB shape: the corpus-sized pass is the hourly pre-aggregate
    * (map-side partial); the window runs over |event_type × hours|
    * rows — thousands, not billions. */
  private val anomalyHours: Q = (s, dir) => {
    val tw = Window.partitionBy(col("event_type"))
      .orderBy(col("stat_hour")).rowsBetween(-24, -1)
    hourly(s, dir)
      .select(col("event_type"), col("stat_hour"),
        col("n_events").as("x"))
      .withColumn("n", count(lit(1)).over(tw))
      .withColumn("s", sum(col("x")).over(tw))
      .withColumn("q", sum(col("x") * col("x")).over(tw))
      .filter(col("n") === 24)
      .withColumn("dev_score",
        (col("x") * 24 - col("s")) * (col("x") * 24 - col("s")) * 23)
      .withColumn("threshold",
        lit(9L) * 24 * (col("q") * 24 - col("s") * col("s")))
      .filter(col("dev_score") > col("threshold"))
      .select(col("event_type"), col("stat_hour"),
        col("x").as("n_events"), col("dev_score"), col("threshold"))
      .orderBy("event_type", "stat_hour")
  }

  /** W11: calendar gap-fill — materialize the dense hour spine
    * (min…max observed hour × every event type), left-join the
    * observed hourly counts, zero-fill, and account the gaps
    * per series (count + longest consecutive run, via the same
    * islands technique as w08). Time-series models need the dense
    * grid — a LAG over sparse rows silently compares across holes
    * (which is exactly what w03's per-row offsets would do on a
    * sparse frame) — and the gap-run report is the data-quality
    * signal that says whether a series is usable at all.
    *
    * 100 TB shape: the corpus-sized pass is the hourly pre-aggregate;
    * the spine is |hours| × |types| rows built from a 1-row bounds
    * aggregate (broadcast) and a bounded type dim (broadcast) — both
    * joins are model-frame BNLJ/broadcast shapes, never a shuffle of
    * the fact. */
  private val gapFill: Q = (s, dir) => {
    val h = hourly(s, dir)
    val bounds = h.agg(min(col("stat_hour")).as("h0"),
      max(col("stat_hour")).as("h1"))
    val spine = bounds
      .select(explode(expr("sequence(h0, h1, interval 1 hour)"))
        .as("stat_hour"))
    val types = h.select(col("event_type")).distinct()
    val grid = spine.crossJoin(broadcast(types))
      .join(h, Seq("event_type", "stat_hour"), "left")
      .withColumn("n", coalesce(col("n_events"), lit(0L)))
    val w = Window.partitionBy(col("event_type")).orderBy(col("stat_hour"))
    grid
      .withColumn("grp",
        sum(when(col("n") > 0, 1L).otherwise(0L)).over(w))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_hours_spine"),
        sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_observed"),
        sum(when(col("n") === 0, 1L).otherwise(0L)).as("n_gap_hours"))
      .join(
        // longest consecutive gap run per series: group the zero
        // hours by the islands key and take the max run length
        grid.withColumn("grp",
            sum(when(col("n") > 0, 1L).otherwise(0L)).over(w))
          .filter(col("n") === 0)
          .groupBy(col("event_type"), col("grp"))
          .agg(count(lit(1)).as("run"))
          .groupBy(col("event_type"))
          .agg(max(col("run")).as("longest_gap_run")),
        Seq("event_type"), "left")
      .withColumn("longest_gap_run",
        coalesce(col("longest_gap_run"), lit(0L)))
      .orderBy("event_type")
  }

  /** W15: linear interpolation of the gap hours — the imputation pass
    * that turns w11's dense-but-zero-filled grid into a usable model
    * input. For each missing hour with an observed neighbor on BOTH
    * sides, the imputed count is the linear blend
    * (prev·(len−pos) + next·pos) / len, evaluated in integer
    * milli-units with a single floor division — numerator and
    * denominator are non-negative, where Spark `div` and DuckDB `//`
    * agree, so imputed values are bit-identical across engines (no
    * IEEE division enters). Gap hours before the first or after the
    * last observation have no bracket and are counted as boundary
    * holes, not imputed (leading/trailing extrapolation is a modeling
    * choice, not an interpolation).
    *
    * 100 TB shape: identical to w11 — the corpus-sized pass is the
    * hourly pre-aggregate; the spine is a broadcast-built model frame,
    * and the neighbor scan is two window sweeps (backward last, forward
    * first) over |types × hours| rows, one partition-sort each. */
  private val interpolateGaps: Q = (s, dir) => {
    val h = hourly(s, dir)
    val bounds = h.agg(min(col("stat_hour")).as("h0"),
      max(col("stat_hour")).as("h1"))
    val spine = bounds
      .select(explode(expr("sequence(h0, h1, interval 1 hour)"))
        .as("stat_hour"))
    val types = h.select(col("event_type")).distinct()
    val grid = spine.crossJoin(broadcast(types))
      .join(h, Seq("event_type", "stat_hour"), "left")
      .withColumn("n", coalesce(col("n_events"), lit(0L)))
      .withColumn("ms", unix_millis(col("stat_hour")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("stat_hour"))
    val wp = w.rowsBetween(Window.unboundedPreceding, -1)
    val wn = w.rowsBetween(1, Window.unboundedFollowing)
    def obs(c: Column): Column = when(col("n") > 0, c)
    grid
      // one select, not four withColumns: same-frame window expressions
      // declared together collapse into TWO Window operators (backward,
      // forward) over one sort — declared separately they planned as
      // four sequential Window passes
      .select(col("event_type"), col("stat_hour"), col("n"), col("ms"),
        last(obs(col("n")), ignoreNulls = true).over(wp).as("prev_n"),
        last(obs(col("ms")), ignoreNulls = true).over(wp).as("prev_ms"),
        first(obs(col("n")), ignoreNulls = true).over(wn).as("next_n"),
        first(obs(col("ms")), ignoreNulls = true).over(wn).as("next_ms"))
      .filter(col("n") === 0)
      .withColumn("interior",
        col("prev_n").isNotNull && col("next_n").isNotNull)
      .withColumn("pos", expr("(ms - prev_ms) div 3600000"))
      .withColumn("len", expr("(next_ms - prev_ms) div 3600000"))
      .withColumn("interp_milli",
        when(col("interior"),
          expr("((prev_n * (len - pos) + next_n * pos) * 1000) div len")))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("interior"), 1L).otherwise(0L)).as("n_interpolated"),
        sum(when(!col("interior"), 1L).otherwise(0L)).as("n_boundary"),
        sum(col("interp_milli")).as("sum_interp_milli"),
        max(col("interp_milli")).as("max_interp_milli"))
      .orderBy("event_type")
  }

  /** W16: seasonal-naive forecast backtest — the baseline every real
    * forecast has to beat: predict hour t with the observation at
    * t-168 (same hour last week), scored by per-series mean absolute
    * error over the backtest window. Runs on the DENSE zero-filled
    * grid (w11's spine) — on the sparse frame LAG(168) would silently
    * compare across holes, the exact bug w11's scaladoc warns about.
    * MAE is reported as integer micro-units (|err| sums are exact
    * longs; one terminal div) so both engines agree bit-for-bit.
    *
    * 100 TB shape: same as w11/w15 — corpus pass is the hourly
    * pre-aggregate, spine is a broadcast model frame, then ONE window
    * sweep per series for the lag. */
  private val seasonalNaive: Q = (s, dir) => {
    val h = hourly(s, dir)
    val bounds = h.agg(min(col("stat_hour")).as("h0"),
      max(col("stat_hour")).as("h1"))
    val spine = bounds
      .select(explode(expr("sequence(h0, h1, interval 1 hour)"))
        .as("stat_hour"))
    val types = h.select(col("event_type")).distinct()
    val grid = spine.crossJoin(broadcast(types))
      .join(h, Seq("event_type", "stat_hour"), "left")
      .withColumn("n", coalesce(col("n_events"), lit(0L)))
    val w = Window.partitionBy(col("event_type")).orderBy(col("stat_hour"))
    grid
      .withColumn("pred", lag(col("n"), 168).over(w))
      .filter(col("pred").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_scored_hours"),
        sum(abs(col("n") - col("pred"))).as("abs_err_sum"),
        sum(col("n")).as("actual_sum"))
      .withColumn("mae_micro",
        expr("(1000000 * abs_err_sum) div n_scored_hours"))
      .orderBy("event_type")
  }

  /** EWMA tap count: 8 taps at α=1/2 leaves (1/2)^8 ≈ 0.4% of the
    * kernel mass beyond the window — the truncation error bound. */
  private val ewmaTaps = 0 to 7

  /** W12: exponentially-weighted moving average over the hourly series
    * — the smoothing pass behind monitoring dashboards and forecast
    * baselines. The textbook recursion y_t = αx_t + (1-α)y_{t-1}
    * cannot run as a window function (each row depends on the
    * previous OUTPUT, an O(n) sequential chain no frame expresses);
    * the scalable spelling truncates the kernel at 8 taps and
    * evaluates it as 8 LAGs over ONE window pass with integer weights
    * 2^(7-j) — exact long arithmetic, renormalized by the weight mass
    * actually present so the series head (< 8 rows) is an average of
    * what exists, not damped toward zero. The single float op is the
    * final num/den division, identical in both engines.
    *
    * 100 TB shape: the corpus pass is the hourly pre-aggregate; the
    * window runs over |types × hours| rows in one partition-sorted
    * sweep (all 8 LAGs share the frame), and the per-type tail keeps
    * the output bounded. */
  private val ewmaHours: Q = (s, dir) => {
    val tw = Window.partitionBy(col("event_type")).orderBy(col("stat_hour"))
    val num = ewmaTaps.map(j =>
      coalesce(lag(col("x"), j).over(tw), lit(0L)) * lit(1L << (7 - j)))
      .reduce(_ + _)
    val den = ewmaTaps.map(j =>
      when(lag(col("x"), j).over(tw).isNotNull, lit(1L << (7 - j)))
        .otherwise(lit(0L))).reduce(_ + _)
    hourly(s, dir)
      .select(col("event_type"), col("stat_hour"), col("n_events").as("x"))
      .withColumn("num", num)
      .withColumn("den", den)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(desc("stat_hour"))))
      .filter(col("rn") <= 48)
      .select(col("event_type"), col("stat_hour"), col("x").as("n_events"),
        col("num"), col("den"),
        (col("num").cast("double") / col("den").cast("double")).as("ewma"))
      .orderBy("event_type", "stat_hour")
  }

  /** W13: peak concurrency by sweep line — how many 30-minute sessions
    * overlap at the busiest instant, per event type. The naive spelling
    * is a self-join (each session counts sessions overlapping it):
    * O(n²) pairs on a hot key, the t05/k07 explosion all over again.
    * The sweep line is O(n log n) and join-free: every session becomes
    * a +1 at its start and a -1 at its end, one running sum per type
    * gives the live-session count at every boundary instant, and the
    * max of that series is the peak. Intervals are half-open
    * [start, start+30min): the default RANGE frame makes all deltas at
    * one instant land together, so a session ending exactly when
    * another starts never counts as overlap — and tie ORDER within an
    * instant cannot matter, which is what makes the max deterministic.
    *
    * 100 TB shape: one narrow union (2n slim rows), one shuffle+sort
    * per type partition, no join anywhere. Skewed types at real scale
    * split by (type, day) with per-day carry-in — the same
    * boundary-fixup w09's scaladoc walks through. */
  private val peakConcurrency: Q = (s, dir) => {
    val ev = T.load(s, dir, "events")
      .select(col("event_type"), col("ts").cast("long").as("t0"))
    val deltas = ev.select(col("event_type"), col("t0").as("t"),
        lit(1L).as("delta"))
      .unionByName(ev.select(col("event_type"),
        (col("t0") + 1800L).as("t"), lit(-1L).as("delta")))
    // default frame with an ORDER BY = RANGE UNBOUNDED..CURRENT, i.e.
    // every row at instant t sees the full delta mass of t — exactly
    // the half-open-interval semantics (both engines default the same)
    val live = sum(col("delta")).over(
      Window.partitionBy(col("event_type")).orderBy(col("t")))
    deltas.withColumn("live", live)
      .groupBy(col("event_type"))
      .agg((count(lit(1)) / 2).cast("long").as("n_sessions"),
        max(col("live")).as("peak_concurrent"))
      .orderBy("event_type")
  }

  /** W18: exact trailing-24h distinct users per hour — rolling DAU, the
    * classic "hard" window: COUNT(DISTINCT) does not decompose over
    * sliding frames, so the naive spelling is an hours × presences
    * range join (every hour re-counts its whole trailing window — the
    * w13 explosion with a DISTINCT on top). The exact join-free
    * rewrite: per (user, active-hour) presence, the user is counted at
    * hour h iff their LATEST presence ≤ h lies within [h−23, h] — so
    * each presence covers hours [p, min(p+23, next_presence−1)], the
    * coverage intervals are disjoint per user by construction, and the
    * distinct count collapses to w13's ±1 sweep over interval ends. No
    * distinct state, no re-count: O(presences) narrow rows.
    *
    * 100 TB shape: the presence dedup is one (user, hour) hash agg
    * (map-side combined); the lead() window shuffles presences by
    * user; deltas aggregate to |hours| rows before the single running
    * sum (a bounded series like w11's spine — shard by day with
    * carry-in when even that grows, per w13's note). */
  /** The sweep over any events-shaped frame (user_id, ts) — public so
    * AuditSpec can pin the interval-decomposition laws on planted
    * presence patterns. */
  def rollingDistinctUsers(ev: DataFrame): DataFrame = {
    val pres = ev
      .select(col("user_id"), expr("CAST(ts AS BIGINT) div 3600").as("p"))
      .distinct()
    val iv = pres
      .withColumn("np", lead(col("p"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("p"))))
      .withColumn("cov_end",
        least(col("p") + 23, coalesce(col("np") - 1, col("p") + 23)))
    val deltas = iv.select(col("p").as("h"), lit(1L).as("delta"))
      .unionByName(iv.select((col("cov_end") + 1).as("h"),
        lit(-1L).as("delta")))
      .groupBy(col("h")).agg(sum(col("delta")).as("d"))
    val spine = pres.agg(min(col("p")).as("h0"), max(col("p")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
    spine.join(deltas, Seq("h"), "left")
      .withColumn("d", coalesce(col("d"), lit(0L)))
      .withColumn("active_users_24h",
        sum(col("d")).over(Window.orderBy(col("h"))))
      .select(col("h"), col("active_users_24h"))
      .orderBy("h")
  }

  private val rollingDistinct: Q = (s, dir) =>
    rollingDistinctUsers(T.load(s, dir, "events"))

  /** W02: RANK over revenue — the SURVEY W2 id as its own registered
    * query (previously covered only inside q15's rank-then-join).
    * Daily revenue per event type, RANK'd within the type — RANK (not
    * ROW_NUMBER) so ties share a rank: the tie behavior is itself the
    * operator under test, and it is deterministic in the VALUE, so no
    * tie-break column is needed for the hash gate (output order still
    * totals on (type, rank, day)). Window runs over the pre-aggregated
    * daily frame — types × days, bounded regardless of fact size. */
  private val rankOverRevenue: Q = (s, dir) => {
    val daily = T.load(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(T.moneySum(col("value")).as("revenue"))
    daily.withColumn("rnk", rank().over(
        Window.partitionBy(col("event_type")).orderBy(desc("revenue"))))
      .filter(col("rnk") <= 5)
      .select(col("event_type"), col("rnk").cast("long").as("rnk"),
        col("day"), col("revenue"))
      .orderBy(col("event_type"), col("rnk"), col("day"))
  }

  /** W19: OHLC (open/high/low/close) aggregation per (type, hour) — the
    * candlestick rollup, exercising SQL:2023's MIN_BY/MAX_BY: open and
    * close are the values AT the extreme timestamps, not extremes of
    * the values. The ordering key is the (ts, event_id) struct — ties
    * on ts alone would make open/close depend on physical row order,
    * exactly the nondeterminism the hash gate exists to catch; struct
    * comparison is lexicographic in BOTH engines (arg_min/arg_max over
    * the same pair in DuckDB), so the picked rows are total. One
    * map-side-combined hash aggregate — MIN_BY carries (key, value)
    * partials, never rows — linear at any scale. */
  private val ohlc: Q = (s, dir) => {
    val ev = T.load(s, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("stat_hour"),
        col("ts"), col("event_id"), col("value"))
    ev.groupBy(col("event_type"), col("stat_hour"))
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("value"), struct(col("ts"), col("event_id")))
          .as("open_value"),
        max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("close_value"),
        min(col("value")).as("low_value"),
        max(col("value")).as("high_value"))
      .orderBy("event_type", "stat_hour")
  }

  /** W14: ranking-function catalog — ntile / percent_rank / cume_dist /
    * first_value / nth_value / last_value over one shared window, the
    * remaining SQL:2003 ranking functions w01/q15/w06 don't cover.
    * The ORDER key (n_events DESC, stat_hour) is a total order — ties
    * on the count alone would make ntile assignment depend on physical
    * row order, which is exactly the nondeterminism the driver's hash
    * compare would catch. The value functions use an explicit
    * UNBOUNDED..UNBOUNDED frame: under the default frame nth_value(2)
    * is NULL at row 1 (frame ends at CURRENT ROW), a classic silent
    * cross-engine trap both engines share but no one wants.
    *
    * 100 TB shape: the window runs on the pre-aggregated hourly frame
    * (types × hours, bounded regardless of fact cardinality), so the
    * per-type sort is small even when the fact table is not; the only
    * full-scale work is the groupBy feeding it, which aggregates
    * map-side. percent_rank/cume_dist divide small exact integers in
    * double — identical IEEE results in both engines. */
  private val rankCatalog: Q = (s, dir) => {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(desc("n_events"), col("stat_hour"))
    val full = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    hourly(s, dir).select(
        col("event_type"), col("stat_hour"), col("n_events"),
        row_number().over(w).cast("long").as("rn"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first_value(col("n_events")).over(full).as("top_n"),
        nth_value(col("n_events"), 2).over(full).as("second_n"),
        last_value(col("n_events")).over(full).as("bottom_n"))
      .filter(col("rn") <= 24)
      .orderBy("event_type", "rn")
  }

  /** W17: per-user half-life-decayed engagement score — the recency
    * weight a training-data sampler attaches to a user's activity
    * (yesterday's event counts half of today's). Unlike w12's
    * truncated 8-tap series EWMA, this is the EXACT unbounded fold
    * e_n = Σ v_i / 2^(n-i), run as a HOF `aggregate` over the user's
    * (ts, event_id)-ordered value list. Bit-reproducible across
    * engines with NO integer-scaling tricks: /2 is an exponent
    * decrement (always exact in IEEE) and + is correctly rounded, so
    * identical operand sequences give identical doubles — the fold
    * order is pinned by sort_array here and ORDER BY in the oracle's
    * list() aggregate, and DuckDB's list_reduce seeds with the first
    * element exactly as the slice/init spelling does.
    *
    * 100 TB shape: one shuffle on user_id; per-user memory is one
    * user's history (the t06 mapGroups bound — a pathological user
    * would truncate to w12's tapped form). Output is |users| rows. */
  private val decayedEngagement: Q = (s, dir) =>
    T.loadEvents(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"),
        sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("value")))).as("evs"))
      .withColumn("vs", expr("transform(evs, e -> e.value)"))
      .withColumn("decayed_score", expr(
        "aggregate(slice(vs, 2, size(vs) - 1), vs[0]," +
          " (a, x) -> a / 2.0D + x)"))
      .select(col("user_id"), col("n_events"), col("last_ts"),
        col("decayed_score"))
      .orderBy("user_id")

  /** W20: MAD robust outlier gate — per event type, flag values more
    * than 3 median-absolute-deviations from the median. Unlike w10's
    * mean±stddev z-score, the median/MAD pair has a 50% breakdown
    * point: the outliers being hunted cannot drag the gate that flags
    * them — which is why robust stats are the right anomaly fence on
    * corpus-scale telemetry. Exactness discipline: values enter as
    * cents×2 longs (the w05 integer-scaling trick, doubled so the
    * group median — the midpoint of two integers — is itself an
    * integer), deviations stay integral, and only the second
    * percentile interpolates (over longs, the proven-portable
    * quantile_cont parity class). The descale /200.0 is one shared
    * spelling, so the reported doubles are bit-identical.
    *
    * 100 TB shape: two grouped exact percentiles (per-group sorted
    * state — groups here are |event types|, each holding its own
    * value list; at extreme group width k04's GK sketch is the
    * drop-in) and two broadcast joins of |groups|-row median/MAD
    * frames back onto the stream — three linear passes, the
    * robust-stats tax over w10's single mean/stddev pass. */
  private val madOutliers: Q = (s, dir) => {
    val ev = T.loadEvents(s, dir)
      .select(col("event_type"),
        (T.dec2(col("value")) * 100).cast("long").*(lit(2L)).as("vc2"))
    val med = ev.groupBy(col("event_type"))
      .agg(percentile(col("vc2"), lit(0.5)).cast("long").as("med2"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("dev2", abs(col("vc2") - col("med2")))
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("dev2"), lit(0.5)).as("mad2"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med2"), col("mad2"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("dev2").cast("double") > lit(3.0) * col("mad2"), 1))
          .as("n_outliers"))
      .select(col("event_type"), col("n_events"),
        (col("med2") / 200.0).as("median_value"),
        (col("mad2") / 200.0).as("mad_value"),
        col("n_outliers"),
        expr("(1000 * n_outliers) div n_events").as("outlier_permille"))
      .orderBy("event_type")
  }

  /** w23: Gini concentration index — "how unequal is spend across
    * orders" per priority class, exact on the integer lattice: with
    * values v₁ ≤ … ≤ vₙ in cents and ranks from one per-class window,
    * G = (2·Σ i·vᵢ − (n+1)·Σv) / (n·Σv), reported as the floor-div
    * permille (ties may rank either way — equal values contribute the
    * same Σ i·vᵢ, so the index is tie-order invariant). The Lorenz/
    * Gini rollup is the revenue-concentration audit behind "the top 1%
    * of orders carry X% of revenue" dashboards; w20/w22 catch outliers
    * and drift, this measures SHAPE.
    *
    * 100 TB shape: one shuffle on the class key; the rank window sorts
    * within each class partition (the exact path — a class too wide to
    * sort trades down to w21's fixed-bin histogram Lorenz estimate).
    * Σ i·vᵢ stays under 2⁶³ up to ~10⁸ orders/class at this price
    * scale (n²/2·v̄ ≤ 9e18 ⇒ n ≲ 1.1e8); past that the same windows
    * feed the one-shared-spelling double fold — the l97 trade,
    * documented rather than silently crossed. */
  private val giniConcentration: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("vc"), col("o_orderkey"))
    T.load(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        (T.dec2(col("o_totalprice")) * 100).cast("long").as("vc"))
      .withColumn("i", row_number().over(w))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("vc")).as("total_cents"),
        sum(col("i") * col("vc")).as("rank_weighted"))
      .withColumn("gini_permille",
        expr("(1000 * (2 * rank_weighted - (n_orders + 1) * total_cents))" +
          " div (n_orders * total_cents)"))
      .select(col("o_orderpriority"), col("n_orders"),
        col("total_cents"), col("gini_permille"))
      .orderBy("o_orderpriority")
  }

  /** w22: CUSUM change-point detection — the sequential drift monitor
    * (Page 1954) a pipeline puts on its daily volumes: per event type,
    * the one-sided cumulative sum S_t = max(0, S_{t−1} + (x_t − μ))
    * flags sustained upward drift that per-day outlier rules (w10,
    * w20) cannot see, because each individual day looks normal. The
    * recursive max is spelled as its closed form over prefix sums —
    * S_t = P_t − min(0, min_{j≤t} P_j) — which makes it two WINDOW
    * functions (running sum + running min) instead of a sequential
    * fold: the identity that turns CUSUM distributable. Everything is
    * integer-exact on the ×n_days lattice (e_t = x_t·n − T sums to
    * zero by construction), and the alarm bar — half a mean day of
    * cumulative excess — is the cross-multiplied `2·S > T`, so both
    * engines agree bit-for-bit.
    *
    * 100 TB shape: the fact reduces to day grain FIRST (one map-side
    * combined shuffle; the windows then run over ≤ a few thousand
    * calendar rows per type — the w01 bounded-frame argument); the
    * per-type (n, T) model frame broadcasts. A per-key drift monitor
    * at higher cardinality partitions the same windows by key. */
  private val cusumChangepoint: Q = (s, dir) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val d = T.loadEvents(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val tot = d.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n_events")).as("total"))
    d.join(broadcast(tot), Seq("event_type"))
      .withColumn("e", col("n_events") * col("n_days") - col("total"))
      .withColumn("p", sum(col("e")).over(w))
      .withColumn("cusum",
        col("p") - least(min(col("p")).over(w), lit(0L)))
      .withColumn("alarm", col("cusum") * 2 > col("total"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("cusum"), col("alarm"))
      .orderBy("event_type", "day")
  }

  /** Fixed-histogram geometry for w21: 32 bins over [0, 500). The
    * width 500/32 = 15.625 = 125/8 is EXACTLY representable in binary,
    * so `floor(value / 15.625)` is the same bit pattern in both
    * engines for every input double — bin assignment cannot straddle
    * an engine boundary. Values ≥ 500 clamp into the top bin. */
  private val histBins = 32
  private val histWidth = 15.625

  /** W21: histogram-sketch quantiles — p50/p90/p99 estimated from a
    * FIXED 32-bin histogram rather than a per-group sort. This is the
    * sketch trade the 100 TB path actually makes: w05/w20's exact
    * percentiles keep per-group sorted state (linear in group width),
    * while a fixed-bin histogram is a constant-size mergeable summary
    * — one map-side-combined groupBy, then quantile lookup over 32
    * rows. The answer is the bin's LOWER EDGE (bin·15.625 — exact
    * doubles), an explicit ≤-one-bin-width error bar, not a fake
    * point estimate. The cumulative rank threshold is
    * cross-multiplied (cum·100 ≥ q·n) so bin selection is
    * integer-exact; k04's GK sketch is the adaptive-precision sibling
    * (rows-only there; this one is fully oracle-checkable because the
    * geometry is fixed). */
  private val histogramQuantiles: Q = (s, dir) => {
    val bins = T.loadEvents(s, dir)
      .select(least(lit(histBins - 1),
        floor(col("value") / histWidth).cast("int")).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    // 32-row frame: the global cumulative window is bounded by
    // construction (w01's bounded-frame discipline)
    val cum = bins
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val qs = s.createDataFrame(
      Seq(Tuple1(50), Tuple1(90), Tuple1(99))).toDF("q")
    cum.join(broadcast(qs), col("cum") * 100 >= col("q") * col("total"))
      .groupBy(col("q"))
      .agg(min(col("bin")).as("bin"))
      .withColumn("lower_edge", col("bin").cast("double") * histWidth)
      .select(col("q").cast("long").as("q"), col("bin").cast("long")
        .as("bin"), col("lower_edge"))
      .orderBy("q")
  }

  val queries: Map[String, Q] = Map(
    "w21_histogram_quantiles" -> histogramQuantiles,
    "w20_mad_outliers" -> madOutliers,
    "w22_cusum_changepoint" -> cusumChangepoint,
    "w23_gini_concentration" -> giniConcentration,
    "w17_decayed_engagement" -> decayedEngagement,
    "w16_seasonal_naive" -> seasonalNaive,
    "w15_interpolate" -> interpolateGaps,
    "w14_rank_catalog" -> rankCatalog,
    "w13_peak_concurrency" -> peakConcurrency,
    "w18_rolling_distinct" -> rollingDistinct,
    "w19_ohlc" -> ohlc,
    "w02_rank_over_revenue" -> rankOverRevenue,
    "w12_ewma" -> ewmaHours,
    "w08_pattern_runs" -> patternRuns,
    "w09_sessionization" -> sessionization,
    "w10_anomaly_hours" -> anomalyHours,
    "w11_gapfill" -> gapFill,
    "w01_row_number_ids" -> rowNumberIds,
    "o05_nulls_ordering" -> nullsOrdering,
    "w03_lag_features" -> lagFeatures,
    "w04_rolling_avg" -> rollingAvg,
    "w05_median_per_group" -> medianPerGroup,
    "w24_percentile_window" -> percentileWindow,
    "w06_window_extras" -> windowExtras,
    "w07_time_range_window" -> timeRangeWindow,
    "o03_bare_limit" -> bareLimit,
    "o06_offset_fetch" -> offsetFetch,
    "o07_keyset_pagination" -> keysetPagination,
    "o04_set_ops" -> setOps)

  val oracle: Map[String, String] = Map(
    "w02_rank_over_revenue" ->
      s"""WITH d AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    ${T.oMoneySum("value")} AS revenue
         |  FROM events GROUP BY 1, 2),
         |r AS (
         |  SELECT event_type, day, revenue,
         |    RANK() OVER (PARTITION BY event_type
         |      ORDER BY revenue DESC) AS rnk
         |  FROM d)
         |SELECT event_type, CAST(rnk AS BIGINT) AS rnk, day, revenue
         |FROM r WHERE rnk <= 5 ORDER BY 1, 2, 3""".stripMargin,
    // DuckDB's arg_min/arg_max take only scalar keys, so the replay
    // picks the MIN_BY/MAX_BY rows via rank windows over the same
    // (ts, event_id) total order — different spelling, same row
    "w19_ohlc" ->
      """WITH r AS (
        |  SELECT event_type, date_trunc('hour', ts) AS stat_hour,
        |    "value",
        |    ROW_NUMBER() OVER (
        |      PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS rn_a,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT event_type, stat_hour, COUNT(*) AS n_events,
        |  MAX(CASE WHEN rn_a = 1 THEN "value" END) AS open_value,
        |  MAX(CASE WHEN rn_d = 1 THEN "value" END) AS close_value,
        |  MIN("value") AS low_value,
        |  MAX("value") AS high_value
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // brute-force replay: the hours × presences trailing range join the
    // sweep line avoids — tractable at gate scale, and the equality IS
    // the proof that the interval decomposition is exact
    "w18_rolling_distinct" ->
      // floor(epoch), not CAST: epoch() is a DOUBLE with fractional
      // seconds, and DuckDB's double→int CAST rounds half-even while
      // Spark's timestamp→long CAST truncates — 1-second drift at the
      // rounding boundary shifts an hour bucket (caught at the gate)
      """WITH pres AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS p
        |  FROM events),
        |b AS (SELECT MIN(p) AS h0, MAX(p) AS h1 FROM pres),
        |spine AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM b)
        |SELECT s.h,
        |  CAST(COUNT(DISTINCT pr.user_id) AS BIGINT) AS active_users_24h
        |FROM spine s LEFT JOIN pres pr ON pr.p BETWEEN s.h - 23 AND s.h
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the same pinned fold: list(value ORDER BY ts, event_id) seeds
    // list_reduce with its first element — /2 and + on identical
    // operand sequences are bit-identical doubles in both engines
    "w17_decayed_engagement" ->
      """SELECT user_id, COUNT(*) AS n_events, MAX(ts) AS last_ts,
        |  list_reduce(list(value ORDER BY ts, event_id),
        |    (a, b) -> a / 2 + b) AS decayed_score
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "w16_seasonal_naive" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS stat_hour,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(stat_hour) AS h0, MAX(stat_hour) AS h1 FROM h),
        |spine AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
        |    AS stat_hour FROM b),
        |grid AS (
        |  SELECT t.event_type, s.stat_hour, COALESCE(h.n, 0) AS n
        |  FROM (SELECT DISTINCT event_type FROM h) t
        |  CROSS JOIN spine s
        |  LEFT JOIN h ON h.event_type = t.event_type
        |    AND h.stat_hour = s.stat_hour),
        |g AS (
        |  SELECT event_type, n,
        |    lag(n, 168) OVER (PARTITION BY event_type
        |      ORDER BY stat_hour) AS pred
        |  FROM grid)
        |SELECT event_type, COUNT(*) AS n_scored_hours,
        |  CAST(SUM(abs(n - pred)) AS BIGINT) AS abs_err_sum,
        |  CAST(SUM(n) AS BIGINT) AS actual_sum,
        |  (1000000 * CAST(SUM(abs(n - pred)) AS BIGINT)) // COUNT(*)
        |    AS mae_micro
        |FROM g WHERE pred IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w15_interpolate" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS stat_hour,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(stat_hour) AS h0, MAX(stat_hour) AS h1 FROM h),
        |spine AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
        |    AS stat_hour FROM b),
        |grid AS (
        |  SELECT t.event_type, s.stat_hour, COALESCE(h.n, 0) AS n,
        |    epoch_ms(s.stat_hour) AS ms
        |  FROM (SELECT DISTINCT event_type FROM h) t
        |  CROSS JOIN spine s
        |  LEFT JOIN h ON h.event_type = t.event_type
        |    AND h.stat_hour = s.stat_hour),
        |nb AS (
        |  SELECT event_type, stat_hour, n, ms,
        |    last_value(CASE WHEN n > 0 THEN n END IGNORE NULLS) OVER wp
        |      AS prev_n,
        |    first_value(CASE WHEN n > 0 THEN n END IGNORE NULLS) OVER wn
        |      AS next_n,
        |    last_value(CASE WHEN n > 0 THEN ms END IGNORE NULLS) OVER wp
        |      AS prev_ms,
        |    first_value(CASE WHEN n > 0 THEN ms END IGNORE NULLS) OVER wn
        |      AS next_ms
        |  FROM grid WINDOW
        |    wp AS (PARTITION BY event_type ORDER BY stat_hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    wn AS (PARTITION BY event_type ORDER BY stat_hour
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |i AS (
        |  SELECT event_type,
        |    (prev_n IS NOT NULL AND next_n IS NOT NULL) AS interior,
        |    (ms - prev_ms) // 3600000 AS pos,
        |    (next_ms - prev_ms) // 3600000 AS len,
        |    prev_n, next_n
        |  FROM nb WHERE n = 0)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN interior THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_interpolated,
        |  CAST(SUM(CASE WHEN NOT interior THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boundary,
        |  CAST(SUM(CASE WHEN interior THEN
        |    ((prev_n * (len - pos) + next_n * pos) * 1000) // len
        |    END) AS BIGINT) AS sum_interp_milli,
        |  MAX(CASE WHEN interior THEN
        |    ((prev_n * (len - pos) + next_n * pos) * 1000) // len
        |    END) AS max_interp_milli
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,
    "w14_rank_catalog" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS stat_hour,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, stat_hour, n_events,
        |    row_number() OVER tw AS rn,
        |    ntile(4) OVER tw AS quartile,
        |    percent_rank() OVER tw AS pct_rank,
        |    cume_dist() OVER tw AS cume,
        |    first_value(n_events) OVER tf AS top_n,
        |    nth_value(n_events, 2) OVER tf AS second_n,
        |    last_value(n_events) OVER tf AS bottom_n
        |  FROM h WINDOW
        |    tw AS (PARTITION BY event_type
        |      ORDER BY n_events DESC, stat_hour),
        |    tf AS (PARTITION BY event_type
        |      ORDER BY n_events DESC, stat_hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND UNBOUNDED FOLLOWING))
        |SELECT event_type, stat_hour, n_events, rn, quartile, pct_rank,
        |  cume, top_n, second_n, bottom_n
        |FROM r WHERE rn <= 24 ORDER BY event_type, rn""".stripMargin,
    "w13_peak_concurrency" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(epoch(ts) AS BIGINT) AS t0 FROM events),
        |deltas AS (
        |  SELECT event_type, t0 AS t, CAST(1 AS BIGINT) AS delta FROM ev
        |  UNION ALL
        |  SELECT event_type, t0 + 1800 AS t, CAST(-1 AS BIGINT) AS delta
        |  FROM ev),
        |live AS (
        |  SELECT event_type,
        |    SUM(delta) OVER (PARTITION BY event_type ORDER BY t) AS live
        |  FROM deltas)
        |SELECT event_type,
        |  CAST(COUNT(*) / 2 AS BIGINT) AS n_sessions,
        |  CAST(MAX(live) AS BIGINT) AS peak_concurrent
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,
    // the 8-tap kernel terms are GENERATED from the same ewmaTaps the
    // Spark side reduces over — one tap list, two engines
    "w12_ewma" -> {
      val numTerms = ewmaTaps.map(j =>
        s"COALESCE(LAG(x, $j) OVER tw, 0) * ${1L << (7 - j)}")
        .mkString(" + ")
      val denTerms = ewmaTaps.map(j =>
        s"CASE WHEN LAG(x, $j) OVER tw IS NOT NULL THEN ${1L << (7 - j)} ELSE 0 END")
        .mkString(" + ")
      s"""WITH h AS (
         |  SELECT event_type, date_trunc('hour', ts) AS stat_hour,
         |    COUNT(*) AS x
         |  FROM events GROUP BY 1, 2),
         |w AS (
         |  SELECT event_type, stat_hour, x,
         |    $numTerms AS num,
         |    $denTerms AS den
         |  FROM h WINDOW tw AS (PARTITION BY event_type
         |    ORDER BY stat_hour))
         |SELECT event_type, stat_hour, x AS n_events,
         |  CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
         |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS ewma
         |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
         |        ORDER BY stat_hour DESC) AS rn FROM w)
         |WHERE rn <= 48
         |ORDER BY event_type, stat_hour""".stripMargin
    },
    "w11_gapfill" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS stat_hour,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(stat_hour) AS h0, MAX(stat_hour) AS h1 FROM h),
        |spine AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
        |    AS stat_hour FROM b),
        |grid AS (
        |  SELECT t.event_type, s.stat_hour, COALESCE(h.n, 0) AS n
        |  FROM (SELECT DISTINCT event_type FROM h) t
        |  CROSS JOIN spine s
        |  LEFT JOIN h ON h.event_type = t.event_type
        |    AND h.stat_hour = s.stat_hour),
        |g AS (
        |  SELECT event_type, stat_hour, n,
        |    SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY event_type ORDER BY stat_hour) AS grp
        |  FROM grid),
        |runs AS (
        |  SELECT event_type, MAX(run) AS longest_gap_run FROM (
        |    SELECT event_type, grp, COUNT(*) AS run
        |    FROM g WHERE n = 0 GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT g.event_type,
        |  COUNT(*) AS n_hours_spine,
        |  CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_observed,
        |  CAST(SUM(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_gap_hours,
        |  COALESCE(MAX(r.longest_gap_run), 0) AS longest_gap_run
        |FROM g LEFT JOIN runs r ON g.event_type = r.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w10_anomaly_hours" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS stat_hour,
        |    COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, stat_hour, x,
        |    COUNT(*) OVER tw AS n,
        |    SUM(x) OVER tw AS s,
        |    SUM(x * x) OVER tw AS q
        |  FROM h WINDOW tw AS (PARTITION BY event_type
        |    ORDER BY stat_hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, stat_hour, x AS n_events,
        |  CAST((24 * x - s) * (24 * x - s) * 23 AS BIGINT) AS dev_score,
        |  CAST(9 * 24 * (24 * q - s * s) AS BIGINT) AS threshold
        |FROM w
        |WHERE n = 24
        |  AND (24 * x - s) * (24 * x - s) * 23 > 9 * 24 * (24 * q - s * s)
        |ORDER BY event_type, stat_hour""".stripMargin,
    "w09_sessionization" ->
      s"""WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w >= INTERVAL 6 HOUR
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS sid
        |  FROM g),
        |c AS (
        |  SELECT user_id,
        |    MIN(ts) AS session_start,
        |    MAX(ts) + INTERVAL 6 HOUR AS session_end,
        |    COUNT(*) AS n_events,
        |    ROUND(${T.oMoneySum("value")}, 2) AS session_value
        |  FROM s GROUP BY user_id, sid)
        |SELECT user_id, session_start, session_end, n_events,
        |  session_value
        |FROM c WHERE n_events >= 3
        |ORDER BY user_id, session_start""".stripMargin,
    "w08_pattern_runs" ->
      """WITH e AS (
        |  SELECT user_id, (event_type = 'error') AS is_err,
        |    SUM(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS grp
        |  FROM events),
        |runs AS (
        |  SELECT user_id, grp, COUNT(*) AS run_len
        |  FROM e WHERE is_err GROUP BY 1, 2),
        |agg AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_runs3,
        |    CAST(MAX(run_len) AS BIGINT) AS max_run_len
        |  FROM runs GROUP BY 1)
        |SELECT user_id, n_runs3, max_run_len FROM agg
        |WHERE n_runs3 >= 1 ORDER BY user_id""".stripMargin,
    "w01_row_number_ids" ->
      """SELECT 'hist_' || CAST(ROW_NUMBER() OVER (
        |    ORDER BY n_orders DESC, nation_name) AS VARCHAR) AS synthetic_id,
        |  nation_name, n_orders
        |FROM (SELECT n_name AS nation_name, COUNT(*) AS n_orders
        |      FROM orders
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation ON c_nationkey = n_nationkey
        |      GROUP BY 1)
        |ORDER BY n_orders DESC, nation_name""".stripMargin,
    "w03_lag_features" ->
      """SELECT event_type, stat_hour, n_events,
        |  LAG(n_events, 1) OVER w AS prev_hour,
        |  LAG(n_events, 24) OVER w AS same_hour_yesterday,
        |  LAG(n_events, 168) OVER w AS same_hour_last_week
        |FROM (SELECT date_trunc('hour', ts) AS stat_hour, event_type,
        |        COUNT(*) AS n_events
        |      FROM events GROUP BY 1, 2)
        |WINDOW w AS (PARTITION BY event_type ORDER BY stat_hour)
        |ORDER BY event_type, stat_hour""".stripMargin,
    "w04_rolling_avg" ->
      """SELECT event_type, stat_hour, n_events,
        |  CAST(SUM(n_events) OVER w AS DOUBLE)
        |    / CAST(COUNT(*) OVER w AS DOUBLE) AS rolling_avg_24h
        |FROM (SELECT date_trunc('hour', ts) AS stat_hour, event_type,
        |        COUNT(*) AS n_events
        |      FROM events GROUP BY 1, 2)
        |WINDOW w AS (PARTITION BY event_type ORDER BY stat_hour
        |             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, stat_hour""".stripMargin,
    // same fixed 32-bin geometry; bin selection via integer
    // cross-multiplication, lower edges exact binary doubles
    "w21_histogram_quantiles" ->
      s"""WITH b AS (
         |  SELECT LEAST(${histBins - 1},
         |    CAST(FLOOR(value / $histWidth) AS INTEGER)) AS bin
         |  FROM events),
         |g AS (SELECT bin, COUNT(*) AS n FROM b GROUP BY 1),
         |c AS (SELECT bin, n,
         |  SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         |  SUM(n) OVER () AS total FROM g)
         |SELECT CAST(q AS BIGINT) AS q,
         |  CAST(MIN(bin) AS BIGINT) AS bin,
         |  CAST(MIN(bin) AS DOUBLE) * $histWidth AS lower_edge
         |FROM c JOIN (VALUES (50), (90), (99)) AS qs(q)
         |  ON cum * 100 >= q * total
         |GROUP BY q ORDER BY q""".stripMargin,
    // the rank-sum Gini closed form on the cents lattice; ties are
    // rank-order invariant so the permille is engine-exact
    "w23_gini_concentration" ->
      """WITH v AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS vc
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, vc,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY vc, o_orderkey) AS i
        |  FROM v),
        |a AS (
        |  SELECT o_orderpriority, COUNT(*) AS n_orders,
        |    CAST(SUM(vc) AS BIGINT) AS total_cents,
        |    CAST(SUM(i * vc) AS BIGINT) AS rank_weighted
        |  FROM r GROUP BY 1)
        |SELECT o_orderpriority, n_orders, total_cents,
        |  (1000 * (2 * rank_weighted - (n_orders + 1) * total_cents))
        |    // (n_orders * total_cents) AS gini_permille
        |FROM a ORDER BY 1""".stripMargin,
    // the prefix-sum closed form of the recursive CUSUM replayed with
    // the same two windows; the ×n_days lattice and the cross-
    // multiplied alarm keep every comparison integer
    "w22_cusum_changepoint" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_days,
        |    CAST(SUM(n_events) AS BIGINT) AS total
        |  FROM d GROUP BY 1),
        |e AS (
        |  SELECT d.event_type, d.day, d.n_events,
        |    d.n_events * s.n_days - s.total AS ev, s.total
        |  FROM d JOIN s USING (event_type)),
        |p AS (
        |  SELECT *, SUM(ev) OVER
        |    (PARTITION BY event_type ORDER BY day) AS pp
        |  FROM e)
        |SELECT event_type, day, n_events,
        |  CAST(pp - LEAST(MIN(pp) OVER
        |    (PARTITION BY event_type ORDER BY day), 0) AS BIGINT)
        |    AS cusum,
        |  (pp - LEAST(MIN(pp) OVER
        |    (PARTITION BY event_type ORDER BY day), 0)) * 2 > total
        |    AS alarm
        |FROM p ORDER BY event_type, day""".stripMargin,
    "w20_mad_outliers" ->
      s"""WITH b AS (SELECT event_type,
         |  CAST(${T.oDec2("value")} * 100 AS BIGINT) * 2 AS vc2
         |  FROM events),
         |m AS (SELECT event_type,
         |  CAST(quantile_cont(vc2, 0.5) AS BIGINT) AS med2
         |  FROM b GROUP BY 1),
         |d AS (SELECT b.event_type, b.vc2, m.med2,
         |  abs(b.vc2 - m.med2) AS dev2
         |  FROM b JOIN m USING (event_type)),
         |md AS (SELECT event_type, quantile_cont(dev2, 0.5) AS mad2
         |  FROM d GROUP BY 1)
         |SELECT d.event_type, COUNT(*) AS n_events,
         |  d.med2 / 200.0 AS median_value,
         |  md.mad2 / 200.0 AS mad_value,
         |  COUNT(CASE WHEN CAST(dev2 AS DOUBLE) > 3.0 * md.mad2
         |    THEN 1 END) AS n_outliers,
         |  (1000 * COUNT(CASE WHEN CAST(dev2 AS DOUBLE) > 3.0 * md.mad2
         |    THEN 1 END)) // COUNT(*) AS outlier_permille
         |FROM d JOIN md USING (event_type)
         |GROUP BY d.event_type, d.med2, md.mad2
         |ORDER BY d.event_type""".stripMargin,
    "w05_median_per_group" ->
      s"""SELECT b.l_returnflag, b.l_linestatus, b.n_lines, b.revenue,
         |  m.median_price
         |FROM (SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
         |        ROUND(${T.oMoneySum("l_extendedprice")}, 2) AS revenue
         |      FROM lineitem GROUP BY 1, 2) b
         |JOIN (SELECT l_returnflag,
         |        quantile_cont(CAST(${T.oDec2("l_extendedprice")} * 100
         |          AS BIGINT), 0.5) / 100.0 AS median_price
         |      FROM lineitem GROUP BY 1) m
         |  ON b.l_returnflag = m.l_returnflag
         |ORDER BY b.l_returnflag, b.l_linestatus""".stripMargin,
    // the same analytic form: DuckDB runs quantile_cont as a window
    // aggregate over the identical integer-cent lattice
    "w24_percentile_window" ->
      """WITH e AS (
        |  SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS pickup_hour,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT pickup_hour, cents,
        |    quantile_cont(cents, 0.5)
        |      OVER (PARTITION BY pickup_hour) AS med_raw
        |  FROM e)
        |SELECT pickup_hour, COUNT(*) AS n_events,
        |  MAX(med_raw) / 100.0 AS median_value
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "o03_bare_limit" ->
      "SELECT COUNT(*) AS n_sampled FROM (SELECT * FROM lineitem LIMIT 100)",
    "o06_offset_fetch" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 10""".stripMargin,
    // the agreement proof: the keyset page IS rows 31-40 of the total
    // order, so plain LIMIT/OFFSET replays it exactly
    "o07_keyset_pagination" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 30""".stripMargin,
    "w06_window_extras" ->
      """SELECT o_orderstatus, m, n_orders,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS dr,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  FIRST_VALUE(m) OVER w AS busiest_month
        |FROM (SELECT o_orderstatus,
        |        CAST(month(o_orderdate) AS BIGINT) AS m,
        |        COUNT(*) AS n_orders
        |      FROM orders GROUP BY 1, 2)
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY n_orders DESC, m)
        |ORDER BY o_orderstatus, dr, m""".stripMargin,
    "o04_set_ops" ->
      """WITH h1 AS (SELECT o_custkey FROM orders
        |            WHERE month(o_orderdate) <= 6),
        |h2 AS (SELECT o_custkey FROM orders
        |       WHERE month(o_orderdate) > 6)
        |SELECT
        |  (SELECT COUNT(*) FROM (SELECT * FROM h1 INTERSECT
        |    SELECT * FROM h2)) AS n_both,
        |  (SELECT COUNT(*) FROM (SELECT * FROM h1 EXCEPT
        |    SELECT * FROM h2)) AS n_h1_only,
        |  (SELECT COUNT(*) FROM (SELECT * FROM h2 EXCEPT
        |    SELECT * FROM h1)) AS n_h2_only,
        |  (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_active""".stripMargin,
    // epoch_ms mirrors unix_millis (both truncate toward zero); the
    // RANGE frame bound is the same 3599999 ms on both engines
    "w07_time_range_window" ->
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_ms(ts) AS ms,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events),
        |w AS (
        |  SELECT event_type, event_id,
        |    COUNT(*) OVER win AS n_last_hour,
        |    CAST(SUM(v) OVER win AS DOUBLE) AS sum_last_hour,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY event_id DESC) AS rn
        |  FROM e
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ms
        |    RANGE BETWEEN 3599999 PRECEDING AND CURRENT ROW))
        |SELECT event_type, event_id, n_last_hour, sum_last_hour
        |FROM w WHERE rn <= 5
        |ORDER BY 1, 2""".stripMargin,
    "o05_nulls_ordering" ->
      """WITH s AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_discount > 0.05 THEN l_discount END AS d
        |  FROM lineitem),
        |a AS (
        |  SELECT CAST(1 AS BIGINT) AS half,
        |    ROW_NUMBER() OVER (ORDER BY d ASC NULLS LAST,
        |      l_orderkey, l_linenumber) AS rn,
        |    l_orderkey, l_linenumber, d
        |  FROM s
        |  ORDER BY d ASC NULLS LAST, l_orderkey, l_linenumber LIMIT 5),
        |b AS (
        |  SELECT CAST(2 AS BIGINT) AS half,
        |    ROW_NUMBER() OVER (ORDER BY d DESC NULLS LAST,
        |      l_orderkey DESC, l_linenumber DESC) AS rn,
        |    l_orderkey, l_linenumber, d
        |  FROM s
        |  ORDER BY d DESC NULLS LAST, l_orderkey DESC, l_linenumber DESC
        |  LIMIT 5)
        |SELECT * FROM a UNION ALL SELECT * FROM b
        |ORDER BY half, rn""".stripMargin)
}
