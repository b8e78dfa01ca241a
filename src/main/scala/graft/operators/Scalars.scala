package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Tables => T, QueryPack}
import graft.functions.Geo

/** Scalar-function catalog (SURVEY.md §2.8): string/regex, date-time
  * extraction and interval arithmetic, conditional/null handling, UUID
  * generation, JSON build/extract, geohash, and the predicate set
  * (BETWEEN / IN / LIKE / IS NULL).
  *
  * Reference usages reproduced: CONCAT + CAST synthetic ids
  * (`PRD.md:743`), REGEXP_CONTAINS table filters
  * (`iceberg_maintenance.py:171`), EXTRACT/diff/interval date math
  * (`README.md:561-566`, `PRD.md:846-872`), CASE/COALESCE/NULLIF
  * (`PRD.md:1091-1105,3464`), GENERATE_UUID (`PRD.md:5519`),
  * JSON_OBJECT route data (`PRD.md:1058-1066`), ST_GEOHASH
  * (`PRD.md:1074-1079`), predicate catalog (`PRD.md:839-856`).
  *
  * Scale notes: everything here is a codegen'd scalar projection —
  * including geohash, a native Catalyst expression since round 4
  * ([[graft.functions.GeohashExpr]]). Aggregations exist purely to make
  * outputs deterministic for the oracle.
  */
object Scalars extends QueryPack {

  /** String functions: CONCAT, CAST-to-string, REGEXP_CONTAINS (rlike),
    * REGEXP_EXTRACT. */
  private val stringFuncs: Q = (s, dir) => {
    val c = T.load(s, dir, "customer")
    c.select(
        col("c_mktsegment"),
        concat(col("c_mktsegment"), lit("_"),
          col("c_custkey").cast("string")).as("tagged_id"),
        col("c_name").rlike("Customer#\\d+").as("name_ok"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1)
          .cast("long").as("name_num"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("name_ok"), 1L).otherwise(0L)).as("n_name_ok"),
        sum(col("name_num")).as("sum_name_num"),
        max(col("tagged_id")).as("max_tagged_id"))
      .orderBy("c_mktsegment")
  }

  /** Date/time: EXTRACT(hour/dayofweek/month), minute-granularity
    * timestamp diff (truncated toward zero like TIMESTAMP_DIFF), and
    * interval arithmetic (TIMESTAMP_SUB / DATE_SUB analogs). */
  private val datetimeFuncs: Q = (s, dir) => {
    val ev = T.load(s, dir, "events")
    ev.select(
        dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("h"),
        month(col("ts")).cast("long").as("m"),
        // minutes since local midnight via second-diff div (trunc-to-zero)
        ((unix_timestamp(col("ts")) -
          unix_timestamp(date_trunc("day", col("ts")))) / 60)
          .cast("long").as("minute_of_day"),
        (col("ts") - expr("INTERVAL 24 HOURS")).as("ts_minus_day"))
      .groupBy(col("dow"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("h")).as("sum_hour"),
        countDistinct(col("m")).as("n_months"),
        max(col("minute_of_day")).as("max_minute_of_day"),
        min(col("ts_minus_day")).as("min_ts_minus_day"))
      .orderBy("dow")
  }

  /** x20: calendar catalog — the date dimensions x02's extract set
    * doesn't cover: quarter, ISO weekday (Spark weekday()+1 ≡ DuckDB
    * isodow — the one shared 1=Monday spelling; raw dayofweek
    * DISAGREES across engines on Sunday's number), ISO week-of-year,
    * day-of-year, week truncation (both engines truncate to Monday),
    * and month-end via last_day. One narrow projection + one rollup
    * keyed (quarter, isodow) — the calendar-heatmap shape. */
  private val calendarFuncs: Q = (s, dir) => {
    val ev = T.load(s, dir, "events")
    ev.select(
        quarter(col("ts")).cast("long").as("q"),
        (expr("weekday(ts)") + 1).cast("long").as("isodow"),
        weekofyear(col("ts")).cast("long").as("woy"),
        dayofyear(col("ts")).cast("long").as("doy"),
        date_trunc("week", col("ts")).as("week_start"),
        last_day(col("ts")).as("month_end"))
      .groupBy(col("q"), col("isodow"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("woy")).as("n_weeks"),
        min(col("doy")).as("min_doy"),
        max(col("doy")).as("max_doy"),
        min(col("week_start")).as("first_week_start"),
        max(col("month_end")).as("last_month_end"))
      .orderBy("q", "isodow")
  }

  /** Conditional/null: CASE WHEN, COALESCE, NULLIF. */
  private val conditionalNull: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    li.select(
        col("l_returnflag"),
        nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0))
          .as("disc_defaulted"),
        when(col("l_quantity") >= 25, "bulk").otherwise("small")
          .as("size_class"))
      .groupBy(col("l_returnflag"), col("size_class"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("disc_or_null")).as("n_nonzero_disc"),
        sum(when(col("disc_defaulted") === -1.0, 1L).otherwise(0L))
          .as("n_defaulted"))
      .orderBy("l_returnflag", "size_class")
  }

  /** UUID generation: values are random, so the checked output is the
    * contract — format validity and uniqueness at row cardinality. */
  private val uuidGen: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    o.select(expr("uuid()").as("u"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("u").rlike(
          "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"),
          1L).otherwise(0L)).as("n_valid_format"),
        countDistinct(col("u")).as("n_distinct"))
  }

  /** JSON build + extract round-trip: JSON_OBJECT analog via
    * to_json(named_struct(...)), values recovered with
    * get_json_object — the oracle recomputes from the source columns,
    * so a lossy round-trip would show up as a mismatch. */
  private val jsonRoundtrip: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    val j = to_json(struct(
      col("o_orderstatus").as("status"),
      col("o_orderkey").as("key"),
      col("o_orderpriority").as("prio")))
    // ONE serialize + ONE parse per row: the original spelling used
    // three get_json_object calls, and CollapseProject spliced the
    // to_json construction into each — 3 serializations + 3 parses
    // per row (the p01 re-inlining class). from_json parses once;
    // Catalyst's OptimizeJsonExprs keeps the three field extractions
    // on that single parse.
    o.select(from_json(j, org.apache.spark.sql.types.StructType.fromDDL(
        "status STRING, key BIGINT, prio STRING")).as("r"))
      .select(col("r.status").as("status"), col("r.key").as("key"),
        col("r.prio").as("prio"))
      .groupBy(col("status"), col("prio"))
      .agg(count(lit(1)).as("n_rows"), sum(col("key")).as("sum_keys"))
      .orderBy("status", "prio")
  }

  /** Predicates: BETWEEN, IN list, LIKE, IS NULL. */
  private val predicates: Q = (s, dir) => {
    val p = T.load(s, dir, "part")
    p.select(
        col("p_type"),
        col("p_size").between(10, 30).as("mid_size"),
        col("p_brand").isin("Brand#13", "Brand#19", "Brand#5").as("top_brand"),
        col("p_name").like("%widget%").as("is_widget"),
        col("p_retailprice").isNull.as("no_price"))
      .groupBy(col("p_type"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(when(col("mid_size"), 1L).otherwise(0L)).as("n_mid_size"),
        sum(when(col("top_brand"), 1L).otherwise(0L)).as("n_top_brand"),
        sum(when(col("is_widget"), 1L).otherwise(0L)).as("n_widgets"),
        sum(when(col("no_price"), 1L).otherwise(0L)).as("n_no_price"))
      .orderBy("p_type")
  }

  /** Geohash generated column. Coords are deterministic
    * pseudo-locations derived from the customer key; known-vector
    * correctness lives in ScalarsSpec. The 2-char prefix IS
    * oracle-checked: at ≤5 bits per axis every bisection midpoint is a
    * dyadic rational (exact in double), so the prefix equals a closed-
    * form 5-bit quantization DuckDB can compute. */
  private val geohashCol: Q = (s, dir) => {
    val c = T.load(s, dir, "customer")
    c.select(
        col("c_custkey"),
        ((col("c_custkey") % 170).cast("double") - 85.0 + 0.5).as("lat"),
        ((col("c_custkey") % 350).cast("double") - 175.0 + 0.5).as("lon"))
      .withColumn("geohash", Geo.geohashCol(col("lat"), col("lon"), 7))
      // the per-prefix distinct/min/max over FULL 7-char strings pins
      // every one of the 35 bits against the oracle's closed form — a
      // wrong bit anywhere flips a cell into a different min/max/count
      .groupBy(substring(col("geohash"), 1, 2).as("geo_prefix"))
      .agg(count(lit(1)).as("n_customers"),
        countDistinct(col("geohash")).as("n_cells"),
        min(col("geohash")).as("min_cell"),
        max(col("geohash")).as("max_cell"))
      .orderBy("geo_prefix")
  }

  /** x11: the array / higher-order-function catalog — split, size,
    * transform, filter, aggregate (fold), array_contains, array_sort +
    * element_at, each over part-name word lists and all replayable in
    * DuckDB's list_* family. Rounds out §2.8 alongside the scalar
    * families (the reference's SQL surface has ARRAY_AGG/UNNEST-style
    * list handling in its verification queries). */
  private val arrayFuncs: Q = (s, dir) => {
    val p = T.load(s, dir, "part")
    p.select((col("p_size") % 5).cast("long").as("grp"),
        split(col("p_name"), " ").as("w"))
      .select(col("grp"),
        size(col("w")).cast("long").as("nw"),
        expr("size(filter(w, x -> length(x) > 5))").cast("long").as("nlong"),
        array_contains(col("w"), "green").as("has_green"),
        element_at(array_sort(col("w")), 1).as("first_sorted"),
        expr("aggregate(transform(w, x -> length(x)), 0L, (a, x) -> a + x)")
          .as("total_len"))
      .groupBy(col("grp"))
      .agg(
        sum(col("nw")).as("n_words"),
        sum(col("nlong")).as("n_long_words"),
        sum(when(col("has_green"), 1L).otherwise(0L)).as("n_green"),
        min(col("first_sorted")).as("min_first_word"),
        sum(col("total_len")).as("total_chars"))
      .orderBy("grp")
  }

  /** X17: map/struct function catalog — the complex-type surface a
    * semi-structured pipeline leans on (`map_from_entries`, `map_keys`/
    * `map_values`, `element_at`, `map_filter`, `transform_values`), as
    * one per-user usage-profile map. The per-user entry list is sorted
    * before map construction so the map's iteration order is defined by
    * construction, and every map-derived statistic is an integer — the
    * DuckDB oracle replays the VALUES as plain conditional aggregation
    * (maps are a representation choice; the numbers are the contract).
    *
    * Scale shape: the map is bounded by |event types| (a model-sized
    * per-group collect over the pre-aggregated (user, type) frame, never
    * raw events); both aggs are map-side-combined hash aggs. */
  private val mapCatalog: Q = (s, dir) => {
    val perType = T.loadEvents(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    perType
      .groupBy(col("user_id"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
      .select(
        size(map_keys(col("m"))).cast("long").as("n_types"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
        size(map_filter(col("m"), (_, v) => v >= 3)).cast("long")
          .as("n_heavy"),
        expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("total"),
        expr("aggregate(map_values(transform_values(m, (k, v) -> v * 2))," +
          " 0L, (a, x) -> a + x)").as("total2x"))
      .groupBy(col("n_types"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("clicks")).as("sum_clicks"),
        sum(col("n_heavy")).as("sum_heavy_types"),
        sum(col("total")).as("sum_events"),
        sum(col("total2x")).as("sum_events_2x"))
      .orderBy("n_types")
  }

  /** X18: UNPIVOT (melt) — the inverse of x08: a wide per-day frame
    * (one column per event type, from the same explicit-values pivot)
    * melted back to long (day, event_type, n) form with
    * `Dataset.unpivot`, then rolled up. Wide→long is its own operator
    * in every BI handoff; the oracle replays the melt as a UNION ALL
    * of per-column selects (what unpivot compiles to). The pivot ⇄
    * unpivot composition makes the pair's inverse-ness checkable: the
    * rollup equals the direct long-form aggregate. */
  private val unpivotCounts: Q = (s, dir) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = T.loadEvents(s, dir)
      .groupBy(dayofweek(col("ts")).cast("long").as("dow"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
    wide.unpivot(
        ids = Array(col("dow")),
        values = types.map(col).toArray,
        variableColumnName = "event_type",
        valueColumnName = "n")
      .groupBy(col("event_type"))
      .agg(
        sum(col("n")).as("n_events"),
        count(when(col("n") > 0, 1)).as("n_active_days"),
        max(col("n")).as("peak_day_count"))
      .orderBy("event_type")
  }

  /** X19: ANSI-safe arithmetic catalog — Spark 4 runs ANSI mode by
    * default, where overflow/bad-cast/division-by-zero THROW; the
    * `try_*` family (try_divide, try_cast, try_to_timestamp — the same
    * discipline the ingest parser lives by) turns each failure into a
    * NULL the pipeline can count instead of a job abort. The query
    * manufactures each failure class deterministically and reports how
    * many rows fall into it. Each count conditions on BOTH the NULL
    * output and its planted trigger (event_id modulus): a source row
    * with a natural NULL value/user_id/ts would also NULL the try_*
    * output, and counting it would silently diverge from the oracle
    * (which counts the trigger classes only) the day testdata grows
    * nullable rows — today's data has none, but the query shouldn't
    * depend on that. The inner `when` still proves the try_* function
    * fired (trigger rows where the output is somehow NOT null count
    * as 0, failing the hash check loudly instead of passing
    * vacuously). */
  private val tryArith: Q = (s, dir) =>
    T.loadEvents(s, dir)
      .select(
        col("event_id"),
        expr("try_divide(CAST(value AS DOUBLE)," +
          " CAST(event_id % 5 AS DOUBLE))").as("ratio"),
        expr("try_cast(CASE WHEN event_id % 7 = 0 THEN 'oops'" +
          " ELSE CAST(user_id AS STRING) END AS BIGINT)").as("uid"),
        expr("try_to_timestamp(CASE WHEN event_id % 11 = 0" +
          " THEN 'not-a-date' ELSE date_format(ts," +
          " 'yyyy-MM-dd HH:mm:ss') END)").as("parsed_ts"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("event_id") % 5 === 0 && col("ratio").isNull, 1L)
          .otherwise(0L)).as("n_div_by_zero"),
        sum(when(col("event_id") % 7 === 0 && col("uid").isNull, 1L)
          .otherwise(0L)).as("n_bad_casts"),
        sum(when(col("event_id") % 11 === 0 && col("parsed_ts").isNull, 1L)
          .otherwise(0L)).as("n_bad_timestamps"))

  /** X23: the NOT IN null trap — the classic three-valued-logic
    * footgun, pinned as engine-parity: `k NOT IN (subquery)` where the
    * subquery yields one NULL (planted via NULLIF on a real key) is
    * UNKNOWN for every row, so the anti-join returns ZERO rows — while
    * `NOT EXISTS`, which the query author almost always meant, returns
    * the true complement. Both engines must agree on all three counts:
    * the empty NOT IN, the real NOT EXISTS, and the NOT IN with the
    * NULL filtered away (which equals NOT EXISTS again). A migration
    * whose engine "fixed" this silently would corrupt every NOT IN
    * filter in user SQL — this entry is the canary.
    *
    * 100 TB shape: both quantifiers plan as broadcast/shuffle anti
    * joins on the key; the NULL-poisoned NOT IN degenerates to a
    * constant-false filter AFTER the null literal is observed — the
    * cost is the same anti join either way. */
  private val notInNullTrap: Q = (s, dir) => {
    val c = T.load(s, dir, "customer")
    // month-12 customers, with every 10th key replaced by NULL — the
    // poison rows real data would carry as unmatched/unknown keys
    val sub = T.load(s, dir, "orders")
      .filter(month(col("o_orderdate")) === 12)
      .select(when(col("o_custkey") % 10 === 0, lit(null))
        .otherwise(col("o_custkey")).cast("long").as("k"))
    val subNoNull = sub.filter(col("k").isNotNull)
    // NOT IN under 3VL: NULL in the list ⇒ no row can pass. Spark's
    // null-aware anti join (isin negation needs the literal list, so
    // spell it as the SQL the trap arises from). View names carry a
    // per-invocation unique suffix and are dropped before returning:
    // fixed names registered in the shared session catalog would let
    // concurrent/repeated invocations against different data dirs
    // silently read each other's frames (and leak into the catalog).
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val (vc, vSub, vSubNN) = (s"x23_c_$tag", s"x23_sub_$tag", s"x23_subnn_$tag")
    c.createOrReplaceTempView(vc)
    sub.createOrReplaceTempView(vSub)
    subNoNull.createOrReplaceTempView(vSubNN)
    val (notIn, notExists, notInClean) =
      try {
        // Each branch is collected to a single count row while the
        // views exist — the returned frame must not lazily re-resolve
        // dropped view names at the caller's execution time.
        def one(q: String): Long = s.sql(q).collect()(0).getLong(0)
        (one(s"SELECT COUNT(*) AS n FROM $vc WHERE c_custkey NOT IN " +
            s"(SELECT k FROM $vSub)"),
          one(s"SELECT COUNT(*) AS n FROM $vc c WHERE NOT EXISTS " +
            s"(SELECT 1 FROM $vSub s WHERE s.k = c.c_custkey)"),
          one(s"SELECT COUNT(*) AS n FROM $vc WHERE c_custkey NOT IN " +
            s"(SELECT k FROM $vSubNN)"))
      } finally Seq(vc, vSub, vSubNN).foreach(s.catalog.dropTempView(_))
    import s.implicits._
    Seq((notIn, notExists, notInClean))
      .toDF("n_not_in", "n_not_exists", "n_not_in_clean")
      .withColumn("trap_fired",
        col("n_not_in") === 0 && col("n_not_exists") > 0)
      .withColumn("clean_equals_exists",
        col("n_not_in_clean") === col("n_not_exists"))
  }

  /** X8: pivot — event counts spread into one column per event type.
    * The value list is EXPLICIT: Spark's values-less pivot runs an
    * extra distinct pass over the data to discover the columns and
    * makes the output schema data-dependent — at scale the explicit
    * list is one scan instead of two and a stable contract. The oracle
    * replays the pivot as conditional aggregation (what pivot
    * compiles to anyway). */
  private val pivotCounts: Q = (s, dir) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    T.loadEvents(s, dir)
      .groupBy(dayofweek(col("ts")).cast("long").as("dow"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy("dow")
  }

  /** X9: ROLLUP — hierarchical subtotal rows (flag×status, per-flag,
    * grand total) in ONE pass with partial aggregation, instead of
    * three jobs unioned; GROUPING() disambiguates real NULL keys from
    * subtotal rows, which is the part naive union-of-aggregates gets
    * wrong. */
  private val rollupRevenue: Q = (s, dir) =>
    T.load(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(T.moneySum(col("l_extendedprice")), 2).as("revenue"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag"), col("l_linestatus"))

  /** X9-ext: explicit GROUPING SETS — disjoint per-dimension subtotal
    * sets ((status), (priority), ()) that neither ROLLUP's nesting nor
    * CUBE's full cross can state; one pass expands each row into its
    * grouping-set copies before the hash agg (same Expand-operator
    * plan as x09), GROUPING() disambiguates the NULL-as-subtotal rows.
    */
  private val groupingSetsQ: Q = (s, dir) =>
    T.load(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(T.moneySum(col("o_totalprice")), 2).as("revenue"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
      .orderBy(col("g_status"), col("g_priority"),
        col("o_orderstatus"), col("o_orderpriority"))

  /** X13: CUBE — the full 2^n grouping-set cross (cell, per-status,
    * per-priority, grand total), completing the subtotal lane beside
    * ROLLUP (x09, nested prefixes) and explicit GROUPING SETS (x12,
    * hand-picked sets). Same single-pass Expand plan: each input row
    * fans into its 4 grouping-set copies before ONE hash aggregate —
    * at 100 TB that 4× expand feeds map-side partial aggregation, so
    * the exchange carries only (cells × sets) partial rows, never 4×
    * the scan. */
  private val cubeRevenue: Q = (s, dir) =>
    T.load(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(T.moneySum(col("o_totalprice")), 2).as("revenue"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
      .orderBy(col("g_status"), col("g_priority"),
        col("o_orderstatus"), col("o_orderpriority"))

  /** X10: complex-type aggregation — collect_set into a sorted array,
    * reduced back to scalars at the output boundary. The array is
    * serialized with array_join rather than emitted raw: collect_set
    * order is nondeterministic, sort_array pins it, and a string
    * column hashes identically across engines where an array-typed
    * column would not (same class of boundary rule as the decimal
    * ban). */
  private val complexTypes: Q = (s, dir) =>
    T.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        array_join(sort_array(collect_set(col("o_orderpriority"))), "|")
          .as("priorities"),
        size(collect_set(col("o_orderpriority"))).cast("long")
          .as("n_priorities"),
        size(collect_set(month(col("o_orderdate")))).cast("long")
          .as("n_active_months"))
      .orderBy("o_orderstatus")

  // ---- x14: statistical aggregates from exact sums --------------------

  /** The five moment sums every two-variable statistic reduces to, and
    * the closed forms over them — ONE spelling shared verbatim by the
    * Spark `expr()` and the DuckDB oracle, so both engines execute the
    * identical IEEE expression tree over identical (exactly-summed)
    * inputs and the doubles match bit-for-bit. Engine-native corr/
    * covar/regr_* are NOT portable this way: each engine picks its own
    * update algorithm (streaming co-moments vs naive sums) with
    * different rounding, so their last bits disagree. */
  private val corrF =
    "(n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))"
  private val covarSampF = "(n*sxy - sx*sy) / (n*(n - 1.0))"
  private val slopeF = "(n*sxy - sx*sy) / (n*sxx - sx*sx)"
  private val interceptF =
    "(sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n"

  /** X14: statistical aggregates — CORR / COVAR_SAMP / REGR_SLOPE /
    * REGR_INTERCEPT of (quantity, price-in-cents) per return flag.
    * Both inputs are integral, so the moment sums are computed EXACTLY
    * (longs, escalated to decimal(38,0) where the square-sum can pass
    * 2^63 — Σy² at ~10¹⁴/row crosses long range around 10⁵ rows per
    * group) and only the final closed forms run in floating point.
    *
    * 100 TB shape: one map-side-combined hash aggregate — five extra
    * long/decimal sums ride the same exchange as the count; the
    * closed-form projection runs on |groups| rows. The decimal(38,0)
    * accumulator holds Σy² exactly to ~10²³ rows per group. */
  private val statAggs: Q = (s, dir) => {
    val xq = col("l_quantity").cast("long")
    val yc = (T.dec2(col("l_extendedprice")) * 100).cast("long")
    T.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(xq).cast("double").as("sx"),
        sum(yc.cast("decimal(38,0)")).cast("double").as("sy"),
        sum((xq * xq).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((xq * yc).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((yc * yc).cast("decimal(38,0)")).cast("double").as("syy"))
      .select(col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        expr(corrF).as("corr_qty_price"),
        expr(covarSampF).as("covar_samp_cents"),
        expr(slopeF).as("regr_slope_cents"),
        expr(interceptF).as("regr_intercept_cents"))
      .orderBy("l_returnflag")
  }

  /** X15: exact order statistics — SQL-standard PERCENTILE_DISC (0.5 /
    * 0.9) and a DETERMINISTIC mode, per return flag. percentile_disc(p)
    * = the first value whose cumulative row count reaches ceil(p·n),
    * spelled in pure integer arithmetic (`(9n+9) div 10` — no float
    * rank); mode ties break to the smallest value (engine-native
    * `mode()` is tie-nondeterministic in both engines, so the oracle
    * can't use it and neither do we). The DuckDB oracle runs its
    * native `percentile_disc` WITHIN GROUP for the percentiles — the
    * standard's own definition — so the integer-rank construction is
    * checked against the spec, not against a mirror of itself.
    *
    * 100 TB shape: the heavy pass is ONE map-side-combined count over
    * the (flag, value) domain; every window after runs on |domain|
    * rows (≤ flags × 50 here), never corpus rows. This is the
    * value-domain percentile algorithm — exact answers without a
    * global sort, the reason it beats percentile_approx when the
    * domain is bounded. */
  private val orderStats: Q = (s, dir) => {
    val counts = T.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .agg(count(lit(1)).as("c"))
    val wAll = Window.partitionBy("l_returnflag")
    val ranked = counts
      .withColumn("cum", sum(col("c")).over(wAll.orderBy("q")))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("mx", max(col("c")).over(wAll))
    ranked.groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("n_rows"),
        min(when(col("c") === col("mx"), col("q"))).as("mode_qty"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("q")))
          .as("p50_qty"),
        min(when(col("cum") >= expr("(9*n + 9) div 10"), col("q")))
          .as("p90_qty"))
      .orderBy("l_returnflag")
  }

  /** X16: bitwise catalog — the AND/OR/XOR aggregates plus the scalar
    * shift/mask/popcount family, the idiom behind packed feature masks
    * and permission bitmaps. One trap each way: Spark's `^` on Columns
    * is XOR but DuckDB's `^` is POWER (its XOR is the `xor()`
    * function), and DuckDB's bit_count returns TINYINT whose SUM
    * escalates to HUGEINT — both sides pin BIGINT explicitly so the
    * engines can't drift on output type.
    *
    * 100 TB shape: one map-side-combined hash aggregate; the bitwise
    * accumulators are commutative+associative longs, so partial
    * aggregation is exact and the exchange carries |groups| rows. */
  private val bitwiseOps: Q = (s, dir) => {
    val k = col("o_orderkey")
    T.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        expr("bit_and(o_orderkey)").as("and_key"),
        expr("bit_or(o_orderkey)").as("or_key"),
        expr("bit_xor(o_orderkey)").as("xor_key"),
        sum(expr("bit_count(o_orderkey & 4095)").cast("long"))
          .as("popcount_low12"),
        sum(shiftright(k, 3).bitwiseAND(lit(7L))).as("sum_oct_digit"),
        max(shiftleft(k.bitwiseAND(lit(255L)), 8).bitwiseOR(lit(1L)))
          .as("max_packed"))
      .orderBy("o_orderstatus")
  }

  /** Rotation-keyed salt for x21 — changing it re-keys every token
    * (the GDPR "key destruction = anonymization" lever). */
  private val pseudoSalt = "corpus-v1:"

  /** X21: keyed pseudonymization — the GDPR-grade sibling of l20's
    * regex scrub: every user_id maps to a stable 64-bit token
    * (first 16 hex of sha256(salt ‖ id) — sha256 is byte-identical in
    * both engines, so the mapping itself is oracle-checked, not just
    * counted). Stable across runs (joins still work on the token),
    * irreversible without the salt, re-keyable by rotating
    * [[pseudoSalt]]. The collision audit rides along: distinct tokens
    * vs distinct users (birthday bound at 64 bits: ~n²/2^65 — zero
    * until ~10^9 users, and the count proves it rather than assumes
    * it).
    *
    * 100 TB shape: one distinct on the key column, one codegen'd hash
    * projection, one count-distinct rollup broadcast back over the
    * 10-row sample — the corpus never moves. */
  private val pseudonymize: Q = (s, dir) => {
    val users = T.loadEvents(s, dir).select(col("user_id")).distinct()
      .withColumn("token",
        substring(sha2(concat(lit(pseudoSalt),
          col("user_id").cast("string")), 256), 1, 16))
    val summary = users.agg(
        count(lit(1)).as("n_users"),
        countDistinct(col("token")).as("n_tokens"))
      .select(col("n_users"),
        (col("n_users") - col("n_tokens")).as("n_collisions"))
    users.orderBy("user_id").limit(10)
      .crossJoin(broadcast(summary))
      .select(col("user_id"), col("token"),
        col("n_users"), col("n_collisions"))
      .orderBy("user_id")
  }

  /** x22: ANSI LATERAL correlated derived table — top-2 customers by
    * account balance PER nation through `FROM nation, LATERAL (...
    * ORDER BY ... LIMIT 2)`. ONE SQL string runs verbatim on both
    * engines (the q18/q21 discipline). The shape matters because
    * Catalyst DECORRELATES it: the per-group ORDER+LIMIT rewrites to a
    * ranking window over the join of the outer keys — no per-nation
    * re-execution of the inner query, which is what makes the lateral
    * spelling safe at 100 TB (the naive nested-loop reading would run
    * |nations| scans). Ties break on c_name, so the top-2 set is
    * total. */
  private[operators] val lateralTopkText =
    """SELECT n_name, c_name, acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal AS acctbal
      |  FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2)
      |ORDER BY n_name, acctbal DESC, c_name""".stripMargin

  private val lateralTopk: Q = (s, dir) => {
    T.registerAll(s, dir)
    s.sql(lateralTopkText)
  }

  val queries: Map[String, Q] = Map(
    "x22_lateral_topk" -> lateralTopk,
    "x21_pseudonymize" -> pseudonymize,
    "x18_unpivot" -> unpivotCounts,
    "x19_try_arith" -> tryArith,
    "x23_not_in_null_trap" -> notInNullTrap,
    "x17_map_funcs" -> mapCatalog,
    "x16_bitwise" -> bitwiseOps,
    "x15_order_stats" -> orderStats,
    "x14_stat_aggs" -> statAggs,
    "x10_complex_types" -> complexTypes,
    "x08_pivot" -> pivotCounts,
    "x09_rollup" -> rollupRevenue,
    "x12_grouping_sets" -> groupingSetsQ,
    "x13_cube" -> cubeRevenue,
    "x01_string_funcs" -> stringFuncs,
    "x02_datetime_funcs" -> datetimeFuncs,
    "x20_calendar_funcs" -> calendarFuncs,
    "x03_conditional_null" -> conditionalNull,
    "x04_uuid" -> uuidGen,
    "x05_json_roundtrip" -> jsonRoundtrip,
    "x06_predicates" -> predicates,
    "x07_geohash" -> geohashCol,
    "x11_array_funcs" -> arrayFuncs)

  val oracle: Map[String, String] = Map(
    "x22_lateral_topk" -> lateralTopkText,
    "x21_pseudonymize" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |t AS (SELECT user_id,
        |  substr(sha256('corpus-v1:' || CAST(user_id AS VARCHAR)), 1, 16)
        |    AS token FROM u),
        |s AS (SELECT COUNT(*) AS n_users,
        |  COUNT(*) - COUNT(DISTINCT token) AS n_collisions FROM t)
        |SELECT t.user_id, t.token, s.n_users, s.n_collisions
        |FROM t CROSS JOIN s ORDER BY user_id LIMIT 10""".stripMargin,
    // DuckDB XOR is xor()/bit_xor() — its ^ operator is POWER; SUMs
    // over TINYINT popcounts escalate to HUGEINT, hence the casts
    "x18_unpivot" ->
      // the melt replayed as UNION ALL of per-column selects over the
      // same wide frame (what unpivot compiles to)
      """WITH wide AS (
        |  SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS click,
        |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS error,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS purchase,
        |    SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS signup,
        |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS view
        |  FROM events GROUP BY 1),
        |long AS (
        |  SELECT dow, 'click' AS event_type, click AS n FROM wide
        |  UNION ALL SELECT dow, 'error', error FROM wide
        |  UNION ALL SELECT dow, 'purchase', purchase FROM wide
        |  UNION ALL SELECT dow, 'signup', signup FROM wide
        |  UNION ALL SELECT dow, 'view', view FROM wide)
        |SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_active_days,
        |  CAST(MAX(n) AS BIGINT) AS peak_day_count
        |FROM long GROUP BY 1 ORDER BY 1""".stripMargin,
    "x23_not_in_null_trap" ->
      """WITH sub AS (
        |  SELECT CASE WHEN o_custkey % 10 = 0 THEN NULL
        |    ELSE o_custkey END AS k FROM orders
        |  WHERE month(o_orderdate) = 12),
        |subnn AS (SELECT k FROM sub WHERE k IS NOT NULL),
        |a AS (SELECT COUNT(*) AS n_not_in FROM customer
        |  WHERE c_custkey NOT IN (SELECT k FROM sub)),
        |b AS (SELECT COUNT(*) AS n_not_exists FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM sub s WHERE s.k = c.c_custkey)),
        |c AS (SELECT COUNT(*) AS n_not_in_clean FROM customer
        |  WHERE c_custkey NOT IN (SELECT k FROM subnn))
        |SELECT n_not_in, n_not_exists, n_not_in_clean,
        |  n_not_in = 0 AND n_not_exists > 0 AS trap_fired,
        |  n_not_in_clean = n_not_exists AS clean_equals_exists
        |FROM a CROSS JOIN b CROSS JOIN c""".stripMargin,
    "x19_try_arith" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_div_by_zero,
        |  CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_bad_casts,
        |  CAST(SUM(CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_bad_timestamps
        |FROM events""".stripMargin,
    "x17_map_funcs" ->
      """WITH pt AS (
        |  SELECT user_id, event_type, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, COUNT(*) AS n_types,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN c ELSE 0 END)
        |      AS BIGINT) AS clicks,
        |    CAST(SUM(CASE WHEN c >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_heavy,
        |    CAST(SUM(c) AS BIGINT) AS total
        |  FROM pt GROUP BY 1)
        |SELECT n_types, COUNT(*) AS n_users,
        |  CAST(SUM(clicks) AS BIGINT) AS sum_clicks,
        |  CAST(SUM(n_heavy) AS BIGINT) AS sum_heavy_types,
        |  CAST(SUM(total) AS BIGINT) AS sum_events,
        |  CAST(SUM(total * 2) AS BIGINT) AS sum_events_2x
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "x16_bitwise" ->
"""SELECT o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  bit_and(o_orderkey) AS and_key,
        |  bit_or(o_orderkey) AS or_key,
        |  bit_xor(o_orderkey) AS xor_key,
        |  CAST(SUM(bit_count(o_orderkey & 4095)) AS BIGINT)
        |    AS popcount_low12,
        |  CAST(SUM((o_orderkey >> 3) & 7) AS BIGINT) AS sum_oct_digit,
        |  MAX(((o_orderkey & 255) << 8) | 1) AS max_packed
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // percentiles via DuckDB's NATIVE percentile_disc (the standard's
    // definition), mode via the explicit min-of-argmax spelling (the
    // native mode() breaks ties nondeterministically in both engines)
    "x15_order_stats" ->
      """WITH counts AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |    COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (
        |  SELECT l_returnflag,
        |    MIN(CASE WHEN c = mx THEN q END) AS mode_qty,
        |    CAST(SUM(c) AS BIGINT) AS n_rows
        |  FROM (SELECT *, MAX(c) OVER (PARTITION BY l_returnflag) AS mx
        |        FROM counts)
        |  GROUP BY 1),
        |p AS (
        |  SELECT l_returnflag,
        |    percentile_disc(0.5) WITHIN GROUP
        |      (ORDER BY CAST(l_quantity AS BIGINT)) AS p50_qty,
        |    percentile_disc(0.9) WITHIN GROUP
        |      (ORDER BY CAST(l_quantity AS BIGINT)) AS p90_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT m.l_returnflag, m.n_rows, m.mode_qty, p.p50_qty, p.p90_qty
        |FROM m JOIN p USING (l_returnflag)
        |ORDER BY m.l_returnflag""".stripMargin,
    // same exact integer moment sums, same closed-form strings — the
    // formulas are interpolated from the SAME Scala constants the
    // Spark side executes
    "x14_stat_aggs" ->
      s"""WITH sums AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
         |    CAST(SUM(CAST(${T.oDec2("l_extendedprice")} * 100 AS BIGINT))
         |      AS DOUBLE) AS sy,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)
         |           * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)
         |           * CAST(${T.oDec2("l_extendedprice")} * 100 AS BIGINT))
         |      AS DOUBLE) AS sxy,
         |    CAST(SUM(CAST(${T.oDec2("l_extendedprice")} * 100 AS BIGINT)
         |           * CAST(${T.oDec2("l_extendedprice")} * 100 AS BIGINT))
         |      AS DOUBLE) AS syy
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
         |  $corrF AS corr_qty_price,
         |  $covarSampF AS covar_samp_cents,
         |  $slopeF AS regr_slope_cents,
         |  $interceptF AS regr_intercept_cents
         |FROM sums ORDER BY l_returnflag""".stripMargin,
    "x10_complex_types" ->
      """SELECT o_orderstatus,
        |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|')
        |    AS priorities,
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
        |  CAST(COUNT(DISTINCT month(o_orderdate)) AS BIGINT)
        |    AS n_active_months
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // dayofweek: DuckDB Sunday=0, Spark Sunday=1 → +1 on the oracle side
    "x08_pivot" ->
      """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "x09_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
         |  ROUND(${T.oMoneySum("l_extendedprice")}, 2) AS revenue,
         |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
         |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,
    "x12_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         |  ROUND(${T.oMoneySum("o_totalprice")}, 2) AS revenue,
         |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority"""
        .stripMargin,
    "x13_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         |  ROUND(${T.oMoneySum("o_totalprice")}, 2) AS revenue,
         |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
         |FROM orders
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority"""
        .stripMargin,
    "x01_string_funcs" ->
      """SELECT c_mktsegment, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN regexp_matches(c_name, 'Customer#\d+')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_name_ok,
        |  CAST(SUM(CAST(regexp_extract(c_name, 'Customer#(\d+)', 1)
        |    AS BIGINT)) AS BIGINT) AS sum_name_num,
        |  MAX(c_mktsegment || '_' || CAST(c_custkey AS VARCHAR))
        |    AS max_tagged_id
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "x20_calendar_funcs" ->
      """SELECT CAST(quarter(ts) AS BIGINT) AS q,
        |  CAST(isodow(ts) AS BIGINT) AS isodow,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT weekofyear(ts)) AS n_weeks,
        |  CAST(MIN(dayofyear(ts)) AS BIGINT) AS min_doy,
        |  CAST(MAX(dayofyear(ts)) AS BIGINT) AS max_doy,
        |  MIN(CAST(date_trunc('week', ts) AS TIMESTAMP))
        |    AS first_week_start,
        |  MAX(last_day(CAST(ts AS DATE))) AS last_month_end
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x02_datetime_funcs" ->
      """SELECT dayofweek(ts) + 1 AS dow, COUNT(*) AS n_events,
        |  CAST(SUM(hour(ts)) AS BIGINT) AS sum_hour,
        |  COUNT(DISTINCT month(ts)) AS n_months,
        |  MAX((CAST(floor(epoch(ts)) AS BIGINT)
        |    - CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT)) // 60)
        |    AS max_minute_of_day,
        |  MIN(ts - INTERVAL 24 HOUR) AS min_ts_minus_day
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "x03_conditional_null" ->
      """SELECT l_returnflag,
        |  CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END
        |    AS size_class,
        |  COUNT(*) AS n_rows,
        |  COUNT(NULLIF(l_discount, 0.0)) AS n_nonzero_disc,
        |  CAST(SUM(CASE WHEN COALESCE(NULLIF(l_discount, 0.0), -1.0) = -1.0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x04_uuid" ->
      """SELECT COUNT(*) AS n_rows, COUNT(*) AS n_valid_format,
        |  COUNT(*) AS n_distinct
        |FROM orders""".stripMargin,
    "x05_json_roundtrip" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS prio,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x07_geohash" -> {
      // Full precision-7 closed form (PRD.md:1074-1079 uses precision
      // 7): quantize each axis to its bit budget (lon 18, lat 17 of the
      // 35 interleaved bits), Morton-interleave lon onto even bit
      // positions, then read the 7 base32 digits. Equivalent to the
      // bisection algorithm: every bisection midpoint is a dyadic
      // rational (360/2^i, 180/2^i scales — exact doubles), and for the
      // k+0.5 coordinate grid the quotient (lon+180)/360 either IS a
      // representable dyadic (division returns it exactly) or sits
      // >= 1/45 away from the quantization boundary — 6 orders beyond
      // double rounding error — so floor never crosses a boundary.
      val lonBits = 18
      val latBits = 17
      val morton = ((0 until lonBits).map(j => s"(((lonq >> $j) & 1) << ${2 * j})")
        ++ (0 until latBits).map(j => s"(((latq >> $j) & 1) << ${2 * j + 1})"))
        .mkString(" + ")
      val chars = (0 until 7).map { d =>
        s"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((h >> ${30 - 5 * d}) & 31 AS INT) + 1, 1)"
      }.mkString(" || ")
      s"""WITH coords AS (
         |  SELECT CAST(c_custkey % 170 AS DOUBLE) - 85.0 + 0.5 AS lat,
         |    CAST(c_custkey % 350 AS DOUBLE) - 175.0 + 0.5 AS lon
         |  FROM customer),
         |quant AS (
         |  SELECT CAST(floor((lon + 180.0) / 360.0 * ${1 << lonBits})
         |      AS BIGINT) AS lonq,
         |    CAST(floor((lat + 90.0) / 180.0 * ${1 << latBits})
         |      AS BIGINT) AS latq
         |  FROM coords),
         |gh AS (
         |  SELECT $chars AS geohash
         |  FROM (SELECT $morton AS h FROM quant))
         |SELECT substr(geohash, 1, 2) AS geo_prefix,
         |  COUNT(*) AS n_customers,
         |  COUNT(DISTINCT geohash) AS n_cells,
         |  MIN(geohash) AS min_cell,
         |  MAX(geohash) AS max_cell
         |FROM gh GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "x11_array_funcs" ->
      """WITH w AS (
        |  SELECT CAST(p_size % 5 AS BIGINT) AS grp,
        |    string_split(p_name, ' ') AS w
        |  FROM part),
        |r AS (
        |  SELECT grp,
        |    CAST(len(w) AS BIGINT) AS nw,
        |    CAST(len(list_filter(w, x -> length(x) > 5)) AS BIGINT)
        |      AS nlong,
        |    list_contains(w, 'green') AS has_green,
        |    list_sort(w)[1] AS first_sorted,
        |    CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
        |      AS total_len
        |  FROM w)
        |SELECT grp,
        |  CAST(SUM(nw) AS BIGINT) AS n_words,
        |  CAST(SUM(nlong) AS BIGINT) AS n_long_words,
        |  CAST(SUM(CASE WHEN has_green THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_green,
        |  MIN(first_sorted) AS min_first_word,
        |  CAST(SUM(total_len) AS BIGINT) AS total_chars
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "x06_predicates" ->
      """SELECT p_type, COUNT(*) AS n_parts,
        |  CAST(SUM(CASE WHEN p_size BETWEEN 10 AND 30 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_mid_size,
        |  CAST(SUM(CASE WHEN p_brand IN ('Brand#13','Brand#19','Brand#5')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_top_brand,
        |  CAST(SUM(CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_widgets,
        |  CAST(SUM(CASE WHEN p_retailprice IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_no_price
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)
}
