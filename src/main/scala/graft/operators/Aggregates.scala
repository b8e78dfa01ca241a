package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Tables => T, QueryPack}

/** Aggregation operators A1-A14 (SURVEY.md §2.3) re-expressed Spark-first.
  *
  * Reference semantics reproduced:
  *  - hour-truncated grouping key (`/root/reference/main.py:163-181`)
  *  - count/sum/avg stats rounded to 2dp (`main.py:221-265`)
  *  - SQL aggregate catalog: COUNT DISTINCT, SUM(CASE), HAVING, STDDEV,
  *    AVG-over-aggregate, null-aware counts
  *    (`sql/create_iceberg_tables.sql:170-184`, `PRD.md:829-872,5420-5429`,
  *    `scripts/verify_loaded_data.sql:20-65`).
  *
  * Scale notes: every aggregate here is a single hash-aggregate with
  * map-side partial aggregation (one shuffle on the group key). No
  * collect(), no windows over a global partition. COUNT DISTINCT is exact
  * (the reference never uses APPROX_*), which Spark plans as a two-stage
  * expand+agg — acceptable because group-key cardinality bounds the shuffle.
  */
object Aggregates extends QueryPack {

  /** A1+A3+A4+A5: the hourly_trip_stats computation. `events` stands in for
    * the trip stream: stat_hour = hour-truncated event time, grouped with
    * event_type (≈ pickup_location_id), stats rounded to 2dp exactly as
    * `main.py:251-254` does. */
  private val hourlyStats: Q = (s, dir) => {
    val ev = T.load(s, dir, "events")
    ev.groupBy(
        date_trunc("hour", col("ts")).as("stat_hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("trip_count"),
        T.moneyAvg2(col("value")).as("avg_value"),
        round(T.moneySum(col("value")), 2).as("total_revenue"))
      .orderBy("stat_hour", "event_type")
  }

  /** A2: derived duration measure — ship delay in days between order date
    * and line ship date (≈ trip duration minutes, `main.py:206-218`),
    * averaged per order priority. */
  private val durationAgg: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val o = T.load(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 2)
          .as("avg_ship_delay_days"))
      .orderBy("o_orderpriority")
  }

  /** A6: global count (`simple_batch_processor.py:63-66`). */
  private val globalCount: Q = (s, dir) =>
    T.load(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))

  /** A9: exact COUNT DISTINCT per group
    * (`sql/create_iceberg_tables.sql:180`, `iceberg_maintenance.py:297`). */
  private val countDistinctQ: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(to_date(col("l_shipdate"))).as("n_ship_days"))
      .orderBy("l_returnflag")
  }

  /** A10: conditional-aggregate ratio — data-quality share analog
    * (`iceberg_maintenance.py:300`, `PRD.md:2759-2775`). */
  private val conditionalRatio: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice") > 100000.0, 1L).otherwise(0L))
          .as("n_high_value"),
        round(
          sum(when(col("o_totalprice") > 100000.0, 1.0).otherwise(0.0))
            / count(lit(1)), 4).as("high_value_ratio"))
      .orderBy("o_orderpriority")
  }

  /** A11: HAVING — post-aggregation filter (`PRD.md:843`). */
  private val havingQ: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    li.groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("trip_count"),
        round(T.moneySum(col("l_extendedprice")), 2).as("total_revenue"))
      .filter(col("trip_count") > 100)
      .orderBy("l_suppkey")
  }

  /** A12: STDDEV (sample) per group (`PRD.md:5228`); rounded to 2dp to
    * absorb engine-order float drift. */
  private val stddevQ: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    o.groupBy(col("o_orderstatus"))
      .agg(
        round(stddev(col("o_totalprice")), 2).as("price_stddev"),
        round(avg(col("o_totalprice")), 2).as("price_avg"))
      .orderBy("o_orderstatus")
  }

  /** A13: aggregate-of-aggregate — AVG(COUNT(*)) OVER (PARTITION BY month)
    * demand baseline (`PRD.md:5420-5429`): daily order counts compared to
    * the month's average daily count. The window runs over the already
    * aggregated (small) frame — the expensive shuffle happened once. */
  private val aggOfAgg: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    val daily = o.groupBy(to_date(col("o_orderdate")).as("order_day"))
      .agg(count(lit(1)).as("daily_orders"))
    val w = Window.partitionBy(date_trunc("month", col("order_day")))
    daily
      .withColumn("month_avg_daily",
        round(avg(col("daily_orders")).over(w), 2))
      .orderBy("order_day")
  }

  /** A14: null-aware per-column counts — completeness check
    * (`scripts/verify_loaded_data.sql:59-65`). */
  private val nullCounts: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    o.agg(
      count(lit(1)).as("n_rows"),
      count(col("o_custkey")).as("n_custkey"),
      count(col("o_orderdate")).as("n_orderdate"),
      count(col("o_totalprice")).as("n_totalprice"))
  }

  /** A8: min/max over timestamps + counts — table freshness snapshot
    * (`iceberg_maintenance.py:291-332`, `verify_loaded_data.sql:20-26`). */
  private val minMaxQ: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    li.groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"))
      .orderBy("l_linestatus")
  }

  /** Q23: funnel analysis — the per-user ordered view → click →
    * purchase progression (the standard product-analytics funnel over
    * an event stream, same family as the reference's event pipeline,
    * `/root/reference/main.py:163-181`). A user advances a stage only
    * with an event STRICTLY LATER than their previous stage's first
    * event, so this is ordered sequence matching, not mere presence.
    *
    * Shape: three min-aggregates and two joins, every one keyed on
    * user_id — Spark reuses the same hash partitioning across all five
    * exchanges (ReusedExchange / no re-shuffle), and each stage's input
    * shrinks monotonically (clicks join only users who viewed). At
    * 100 TB the stage frames are per-user singletons — orders of
    * magnitude smaller than the event table — so the final funnel agg
    * is over |users|, not |events|. */
  private val funnelQ: Q = (s, dir) => {
    val ev = T.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val viewed = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val clicked = ev.filter(col("event_type") === "click")
      .join(viewed, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val purchased = ev.filter(col("event_type") === "purchase")
      .join(clicked, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    viewed
      .join(clicked, Seq("user_id"), "left")
      .join(purchased, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_view"),
        count(col("t_click")).as("n_click"),
        count(col("t_purchase")).as("n_purchase"))
      .withColumn("view_to_click",
        col("n_click").cast("double") / col("n_view").cast("double"))
      .withColumn("click_to_purchase",
        col("n_purchase").cast("double") / col("n_click").cast("double"))
  }

  /** Q25: cohort retention — users grouped by first-activity week
    * (the cohort), tracked by distinct-active count at each week
    * offset, with the rate normalized against the cohort's own size
    * (its offset-0 count — every member is active in their first
    * week by construction). The product-analytics staple beside
    * q23's funnel.
    *
    * Shape: one distinct on (user, week) — the corpus-sized shuffle —
    * then everything downstream (cohort min, the join back, the
    * retention agg) is per-user or per-(cohort, offset) scale, all
    * keyed on user_id so the exchange is reused. The rate divides two
    * exact integers in double (identical IEEE bits both engines);
    * first_value over the offset-ordered cohort partition is
    * deterministic because (cohort, offset) rows are unique. */
  private val cohortRetention: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val activity = T.load(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohort = activity.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_wk"))
    val counts = activity.join(cohort, "user_id")
      .withColumn("week_offset",
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("long"))
      .groupBy(col("cohort_wk"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    counts
      .withColumn("cohort_size", first_value(col("n_active")).over(
        Window.partitionBy(col("cohort_wk")).orderBy(col("week_offset"))))
      .withColumn("retention_rate",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
      .orderBy("cohort_wk", "week_offset")
  }

  val queries: Map[String, Q] = Map(
    "q23_funnel" -> funnelQ,
    "q25_cohort_retention" -> cohortRetention,
    "q02_hourly_stats" -> hourlyStats,
    "q03_duration_agg" -> durationAgg,
    "q04_global_count" -> globalCount,
    "q05_count_distinct" -> countDistinctQ,
    "q06_conditional_ratio" -> conditionalRatio,
    "q07_having" -> havingQ,
    "q08_stddev" -> stddevQ,
    "q09_agg_of_agg" -> aggOfAgg,
    "q10_null_counts" -> nullCounts,
    "q11_minmax" -> minMaxQ)

  val oracle: Map[String, String] = Map(
    "q25_cohort_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        |  FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM a GROUP BY 1),
        |r AS (
        |  SELECT cohort_wk,
        |    CAST(date_diff('day', cohort_wk, wk) // 7 AS BIGINT)
        |      AS week_offset,
        |    COUNT(DISTINCT a.user_id) AS n_active
        |  FROM a JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_wk, week_offset, n_active,
        |  FIRST_VALUE(n_active) OVER (PARTITION BY cohort_wk
        |    ORDER BY week_offset) AS cohort_size,
        |  CAST(n_active AS DOUBLE)
        |    / CAST(FIRST_VALUE(n_active) OVER (PARTITION BY cohort_wk
        |        ORDER BY week_offset) AS DOUBLE) AS retention_rate
        |FROM r ORDER BY cohort_wk, week_offset""".stripMargin,
    "q23_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
        |SELECT COUNT(*) AS n_view,
        |  COUNT(t_click) AS n_click,
        |  COUNT(t_purchase) AS n_purchase,
        |  CAST(COUNT(t_click) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS view_to_click,
        |  CAST(COUNT(t_purchase) AS DOUBLE) / CAST(COUNT(t_click) AS DOUBLE)
        |    AS click_to_purchase
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""
        .stripMargin,
    "q02_hourly_stats" ->
      s"""SELECT date_trunc('hour', ts) AS stat_hour, event_type,
         |  COUNT(*) AS trip_count,
         |  ${T.oMoneyAvg2("value")} AS avg_value,
         |  ROUND(${T.oMoneySum("value")}, 2) AS total_revenue
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q03_duration_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  ROUND(AVG(datediff('day', o_orderdate, l_shipdate)), 2)
        |    AS avg_ship_delay_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q04_global_count" ->
      "SELECT COUNT(*) AS n_rows FROM lineitem",
    "q05_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS n_ship_days
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q06_conditional_ratio" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_high_value,
        |  ROUND(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1.0 ELSE 0.0 END)
        |    / COUNT(*), 4) AS high_value_ratio
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_having" ->
      s"""SELECT l_suppkey, COUNT(*) AS trip_count,
         |  ROUND(${T.oMoneySum("l_extendedprice")}, 2) AS total_revenue
         |FROM lineitem GROUP BY 1 HAVING COUNT(*) > 100
         |ORDER BY 1""".stripMargin,
    "q08_stddev" ->
      """SELECT o_orderstatus,
        |  ROUND(stddev_samp(o_totalprice), 2) AS price_stddev,
        |  ROUND(AVG(o_totalprice), 2) AS price_avg
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_agg_of_agg" ->
      """SELECT order_day, daily_orders,
        |  ROUND(AVG(daily_orders) OVER (
        |    PARTITION BY date_trunc('month', order_day)), 2)
        |    AS month_avg_daily
        |FROM (SELECT CAST(o_orderdate AS DATE) AS order_day,
        |        COUNT(*) AS daily_orders
        |      FROM orders GROUP BY 1)
        |ORDER BY order_day""".stripMargin,
    "q10_null_counts" ->
      """SELECT COUNT(*) AS n_rows, COUNT(o_custkey) AS n_custkey,
        |  COUNT(o_orderdate) AS n_orderdate,
        |  COUNT(o_totalprice) AS n_totalprice
        |FROM orders""".stripMargin,
    "q11_minmax" ->
      """SELECT l_linestatus, COUNT(*) AS n_rows,
        |  MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship,
        |  ROUND(MIN(l_extendedprice), 2) AS min_price,
        |  ROUND(MAX(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
}
