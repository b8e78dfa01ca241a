package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Tables => T, QueryPack}

/** Join operators J1-J6 (SURVEY.md §2.4).
  *
  * Reference semantics reproduced:
  *  - J1 fact ⋈ tiny zone dim + group/agg (`/root/reference/README.md:548-557`)
  *  - J2 pre/post-period aggregated-CTE compare (`PRD.md:923-953`)
  *  - J3 left join on derived expression keys (`PRD.md:5278-5279,5451-5455`)
  *  - J4 IN-subquery as semi join (`PRD.md:965-971`)
  *  - J5 join against window-ranked frame (`PRD.md:3686-3691`)
  *  - J6 MERGE upsert emulated as join-rewrite (`PRD.md:769-779`)
  *
  * Scale notes: `nation` (25 rows) / `region` (5 rows) / `supplier` are
  * explicitly `broadcast()` — at 100 TB the fact side never shuffles for a
  * dim join. Aggregate-then-join ordering is preserved (aggregate first,
  * join the small result), so the big shuffle happens on pre-reduced data.
  * Semi joins use `left_semi` (no row multiplication, no dedup pass).
  */
object Joins extends QueryPack {

  /** J1: fact ⋈ broadcast dim with group/agg — the flagship revenue-by-zone
    * query shape (`README.md:548-557`, `PRD.md:829-844`). Also SparkEntry
    * flagship. lineitem⋈orders shuffles on orderkey; customer⋈nation are
    * broadcast. */
  val revenueByNation: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val o = T.load(s, dir, "orders")
    val c = T.load(s, dir, "customer")
    val n = T.load(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("trip_count"),
        round(T.revenueSum(col("l_extendedprice"), col("l_discount")), 2)
          .as("total_revenue"))
      .filter(col("trip_count") > 10)
      .orderBy(desc("total_revenue"), col("n_name"))
      .limit(10)
  }

  /** J2: pre/post-period comparison (`PRD.md:923-953`). The reference
    * writes it as two aggregated CTEs joined on key; at 100 TB that plan
    * scans the fact twice. Re-expressed as ONE pass with conditional
    * aggregation — one scan, one shuffle, no self-join — which Catalyst
    * cannot derive from the two-CTE form on its own. */
  private val prePostCompare: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    val c = T.load(s, dir, "customer")
    val n = T.load(s, dir, "nation")
    val pre = year(col("o_orderdate")) < 1999
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation_name"))
      .agg(
        sum(when(pre, 1L).otherwise(0L)).as("pre_orders"),
        round(sum(when(pre, T.dec2(col("o_totalprice"))))
          .cast("double"), 2).as("pre_revenue"),
        sum(when(!pre, 1L).otherwise(0L)).as("post_orders"),
        round(sum(when(!pre, T.dec2(col("o_totalprice"))))
          .cast("double"), 2).as("post_revenue"))
      .withColumn("revenue_delta",
        round(col("post_revenue") - col("pre_revenue"), 2))
      .orderBy("nation_name")
  }

  /** J3: left outer join on derived expression keys — hourly demand LEFT
    * JOIN feature frame on a truncated-time composite key
    * (`PRD.md:5451-5455`). */
  private val leftJoinExpr: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    val li = T.load(s, dir, "lineitem")
    val dailyOrders = o
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n_orders"))
    val dailyShips = li
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(count(lit(1)).as("n_ships"),
        round(T.moneySum(col("l_extendedprice")), 2).as("ship_revenue"))
    dailyOrders.join(dailyShips, Seq("d"), "left")
      .select(col("d"),
        col("n_orders"),
        coalesce(col("n_ships"), lit(0L)).as("n_ships"),
        coalesce(col("ship_revenue"), lit(0.0)).as("ship_revenue"))
      .orderBy("d")
  }

  /** J4: IN-subquery → left-semi join (`PRD.md:965-971`). Catalyst's
    * RewritePredicateSubquery produces the same plan from SQL IN; we
    * declare the semi join directly. */
  private val semiJoin: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val o = T.load(s, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        round(T.moneySum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("l_returnflag")
  }

  /** J4-ext: ANTI join — the semi join's complement (NOT EXISTS):
    * customers who placed no urgent order. Same scale shape as q14:
    * the probe side reduces to distinct keys before broadcast, the
    * fact never shuffles; `left_anti` keeps rows with NO match, which
    * a NOT IN subquery only equals when the subquery is null-free
    * (o_custkey is a key — the oracle states NOT EXISTS to dodge the
    * NOT IN null trap entirely). */
  private val antiJoin: Q = (s, dir) => {
    val c = T.load(s, dir, "customer")
    val o = T.load(s, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** J-ext: FULL OUTER join — reconciliation between two aggregates
    * that each carry keys the other lacks (the audit query shape: which
    * days have orders but no events, and vice versa). Both sides
    * pre-aggregate to |days| rows BEFORE the join, so the full outer —
    * which cannot broadcast (both sides must keep unmatched rows) —
    * shuffles only the two small rollups, never the facts. */
  private val fullOuterJoin: Q = (s, dir) => {
    val od = T.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val ed = T.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    od.join(ed, Seq("day"), "full_outer")
      .select(
        col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("n_orders").isNull, "events_only")
          .when(col("n_events").isNull, "orders_only")
          .otherwise("both").as("presence"))
      .orderBy("day")
  }

  /** J5: join against a window-ranked aggregate, filtered on rank
    * (`PRD.md:3686-3691`): top suppliers by revenue joined back to the
    * supplier dim. The rank-then-filter form would move every group to ONE
    * partition (WindowExec warns); instead take the global top-k with
    * `orderBy.limit(k)` (planned as TakeOrderedAndProject — per-partition
    * top-k then a k-row merge on the driver) and rank only the k rows.
    * The (revenue, suppkey) ordering is total, so rank ≡ row_number and
    * no tie can straddle the limit boundary. */
  private val rankJoin: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val sup = T.load(s, dir, "supplier")
    val top5 = li.groupBy(col("l_suppkey"))
      .agg(round(T.revenueSum(col("l_extendedprice"), col("l_discount")), 2)
        .as("supp_revenue"))
      .orderBy(desc("supp_revenue"), col("l_suppkey"))
      .limit(5)
      .withColumn("revenue_rank",
        rank().over(Window.orderBy(desc("supp_revenue"), col("l_suppkey")))
          .cast("long"))
    top5.join(broadcast(sup), top5("l_suppkey") === sup("s_suppkey"))
      .select(col("revenue_rank"), col("s_name"), col("supp_revenue"))
      .orderBy("revenue_rank")
  }

  /** J6/D2: MERGE ... WHEN MATCHED THEN UPDATE emulated as a left join +
    * coalesce rewrite (`PRD.md:769-779` fare correction): source =
    * corrections for urgent orders (5% uplift), target = orders; unmatched
    * rows pass through. The uplift arithmetic stays in DECIMAL end-to-end
    * (half-up rounding, identical in DuckDB) and is cast to double only at
    * the final sum — double ROUND disagrees between engines on half-way
    * representations. No broadcast hint: the update set is ~20% of the
    * fact table, so at scale this must be a shuffle join on the key (AQE
    * picks the strategy); a copy-on-write merge never broadcasts its
    * update set. */
  private val mergeUpsert: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
    val source = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("src_key"),
        round(T.dec2(col("o_totalprice")) * lit(BigDecimal("1.05")), 2)
          .cast("double").as("corrected_price"))
    o.join(source, o("o_orderkey") === source("src_key"), "left")
      .select(
        col("o_orderkey"), col("o_orderstatus"),
        round(coalesce(col("corrected_price"), col("o_totalprice")), 2)
          .as("total_price"),
        when(col("corrected_price").isNotNull, lit("updated"))
          .otherwise(lit("unchanged")).as("merge_action"))
      .groupBy(col("o_orderstatus"), col("merge_action"))
      .agg(count(lit(1)).as("n_rows"),
        round(T.moneySum(col("total_price")), 2).as("sum_price"))
      .orderBy("o_orderstatus", "merge_action")
  }

  /** Q17: SCD2 as-of join — each fact row joins the dimension epoch
    * valid at its event time, the slowly-changing-dimension lookup
    * every lakehouse star schema runs. The dimension synthesizes four
    * quarterly price-tier epochs per nation (a [valid_from, valid_to)
    * interval table); the join is equi on the nation key with the
    * interval as a range predicate — Spark plans the hash join on the
    * equi key and applies the range as a post-join filter, so the
    * small dim BROADCASTS and the fact side never shuffles. That plan
    * shape (never a cartesian, never a fact shuffle) is the entire
    * point of keying SCD2 lookups on entity + interval. */
  private val asofScd2: Q = (s, dir) => {
    val epochs = T.load(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("dim_nationkey"),
        explode(sequence(lit(0), lit(3))).as("epoch"))
      .select(col("dim_nationkey"),
        (col("epoch") * 3 + 1).cast("long").as("valid_from_month"),
        (col("epoch") * 3 + 4).cast("long").as("valid_to_month"),
        ((col("dim_nationkey") + col("epoch")) % 5).cast("long").as("price_tier"))
    val fact = T.load(s, dir, "orders")
      .join(broadcast(T.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .select(month(col("o_orderdate")).cast("long").as("m"),
        col("o_totalprice"),
        col("c_nationkey").cast("long").as("nationkey"))
    fact.join(broadcast(epochs),
        col("nationkey") === col("dim_nationkey")
          && col("m") >= col("valid_from_month")
          && col("m") < col("valid_to_month"))
      .groupBy(col("price_tier"))
      .agg(count(lit(1)).as("n_orders"),
        round(T.moneySum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("price_tier")
  }

  /** Q18: the textual-SQL entry path — reference users type SQL, so
    * the engine must accept a whole analytics query as TEXT over
    * registered views, not only the DataFrame API. The query string is
    * deliberately ANSI-portable (decimal money sums, explicit BIGINT
    * casts for rank/month) and is shared VERBATIM with the DuckDB
    * oracle: one string, two engines, identical rows — the strongest
    * form of the SQL-compatibility claim. Top-3 revenue months per
    * nation: join + group + window rank, all planned by Catalyst from
    * the text exactly as the DataFrame form would be. */
  private[operators] val sqlEntryText =
    """WITH monthly AS (
      |  SELECT n.n_name AS nation_name,
      |    CAST(month(o.o_orderdate) AS BIGINT) AS m,
      |    COUNT(*) AS n_orders,
      |    ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
      |      AS DOUBLE), 2) AS revenue
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2)
      |SELECT nation_name, m, n_orders, revenue, rnk FROM (
      |  SELECT nation_name, m, n_orders, revenue,
      |    CAST(RANK() OVER (PARTITION BY nation_name
      |      ORDER BY n_orders DESC, m) AS BIGINT) AS rnk
      |  FROM monthly)
      |WHERE rnk <= 3
      |ORDER BY nation_name, rnk, m""".stripMargin

  private val sqlEntry: Q = (s, dir) => {
    T.registerAll(s, dir)
    s.sql(sqlEntryText)
  }

  /** Q21: correlated scalar subqueries — the textual form analysts
    * reach for first, and the optimizer feature (decorrelation) that
    * decides whether it scales: Catalyst rewrites each correlated
    * subquery into an aggregate + join (visible in the plan as
    * left-outer joins over pre-aggregated orders), so the inner query
    * runs ONCE as a set operation instead of once per customer row.
    * Shared verbatim with DuckDB like q18. The NULL branch (customers
    * with no orders) rides the outer join, exercised because customer
    * keys without orders exist at every scale factor. */
  private[operators] val correlatedSubqueryText =
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_customers,
      |  CAST(SUM(CASE WHEN (
      |    SELECT COUNT(*) FROM orders o
      |    WHERE o.o_custkey = c.c_custkey) = 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive,
      |  ROUND(CAST(SUM(COALESCE((
      |    SELECT MAX(CAST(o.o_totalprice AS DECIMAL(18,2)))
      |    FROM orders o WHERE o.o_custkey = c.c_custkey),
      |    CAST(0 AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_max_order
      |FROM customer c
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val correlatedSubquery: Q = (s, dir) => {
    T.registerAll(s, dir)
    s.sql(correlatedSubqueryText)
  }

  /** Q32: TPC-H Q20 shape — membership in an AGGREGATED subquery:
    * suppliers who shipped more than a quantity threshold of a
    * name-filtered part family. ONE ANSI string runs verbatim on both
    * engines (q18/q21's discipline). Catalyst plans the IN over a
    * GROUP-BY + HAVING subquery as a left-semi join against the
    * aggregated frame — the decorrelation pattern q21's scalar
    * subqueries don't exercise. The subquery aggregates BEFORE the
    * semi join, so the fact table contributes one shuffle on
    * l_suppkey and the semi probe is |suppliers|-sized; supplier
    * itself never fans out (semi join emits each row at most once). */
  private[operators] val aggSemiJoinText =
    """SELECT s_name, s_acctbal AS acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%red%'
      |  GROUP BY l_suppkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >
      |    CAST(50 AS DECIMAL(18,2)))
      |ORDER BY s_name""".stripMargin

  private val aggSemiJoin: Q = (s, dir) => {
    T.registerAll(s, dir)
    s.sql(aggSemiJoinText)
  }

  /** Q34: top supplier by revenue view — the TPC-H Q15 shape: an
    * aggregated revenue view per supplier, then the suppliers whose
    * revenue EQUALS the view's maximum (a scalar aggregate subquery
    * over an aggregate — ties must all surface, which is why the shape
    * is not ORDER BY/LIMIT 1). The max arrives as a 1-row broadcast
    * meeting the |suppliers|-row view; revenue compares in exact
    * DECIMAL so "equals the max" is well-defined (a double spelling
    * would make equality float-fragile).
    *
    * 100 TB shape: one fact rollup to |suppliers| rows; everything
    * after is supplier-scale. */
  private val topSupplierView: Q = (s, dir) => {
    val revenue = T.load(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum(T.dec2(col("l_extendedprice")) * (lit(1) -
        T.dec2(col("l_discount")))).as("total_rev"))
    val mx = revenue.agg(max(col("total_rev")).as("max_rev"))
    revenue.join(broadcast(mx), col("total_rev") === col("max_rev"))
      .join(broadcast(T.load(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Order-value floor defining a "premium" order for q35 (the top
    * decile of o_totalprice at every test SF — nonempty anti side by
    * construction). */
  private val premiumOrderFloor = 460000

  /** Q35: untapped high-balance customers — the TPC-H Q22 shape:
    * customers with above-average positive account balance who never
    * placed a premium (> [[premiumOrderFloor]]) order — a scalar AVG
    * subquery gating a left_anti join against a FILTERED order set,
    * rolled up by key-prefix bucket. Exactness: the average compares
    * in integer cents cross-multiplied (sum·1 > avg·n ⇔
    * bal·n_pos > sum_pos — no division at all), so the gate is
    * integer-exact in both engines.
    *
    * 100 TB shape: the anti join's build side is pre-filtered to
    * premium orders only (selectivity does the work the broadcast
    * needs); the scalar average is a 1-row broadcast. */
  private val dormantCustomers: Q = (s, dir) => {
    val c = T.load(s, dir, "customer")
      .withColumn("bal_c", (T.dec2(col("c_acctbal")) * 100).cast("long"))
    val avgBal = c.filter(col("bal_c") > 0)
      .agg(sum(col("bal_c")).as("sum_pos"),
        count(lit(1)).as("n_pos"))
    val premium = T.load(s, dir, "orders")
      .filter(col("o_totalprice") > premiumOrderFloor)
      .select(col("o_custkey"))
    c.join(broadcast(avgBal),
        col("bal_c") * col("n_pos") > col("sum_pos"))
      .join(premium, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(expr("CAST(c_custkey % 10 AS BIGINT)").as("cc_prefix"))
      .agg(count(lit(1)).as("n_custs"),
        round(T.moneySum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy("cc_prefix")
  }

  /** The two trading nations whose bilateral flow q36 measures (both
    * directions — the disjunction is the point of the shape). */
  private val tradePair = ("NATION_1", "NATION_2")

  /** Q36: bilateral shipping volume — the TPC-H Q7 shape: revenue
    * flowing between two specific nations in either direction
    * (supplier in A shipping to a customer in B, or vice versa), by
    * year. The filter is a DISJUNCTION over columns from two different
    * broadcast dims, so it cannot push below either dim join — the
    * plan that matters at 100 TB is: filter each nation dim to the
    * two-name set FIRST (that pushdown IS valid and turns both
    * broadcast sides into 2-row builds whose inner joins drop ~23/25
    * of the fact early), then apply the pair disjunction on the
    * surviving sliver. Revenue is the exact-decimal sum (q01
    * discipline). */
  private val volumeShipping: Q = (s, dir) => {
    val (na, nb) = tradePair
    val names = Seq(na, nb)
    val li = T.load(s, dir, "lineitem")
    val o = T.load(s, dir, "orders")
    val c = T.load(s, dir, "customer")
    val sup = T.load(s, dir, "supplier")
    val sn = T.load(s, dir, "nation")
      .filter(col("n_name").isin(names: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val cn = T.load(s, dir, "nation")
      .filter(col("n_name").isin(names: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
      .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
        (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(count(lit(1)).as("n_lines"),
        T.revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** The (market region, focal supplier nation) q37 measures. */
  private val shareRegion = "ASIA"
  private val shareNation = "NATION_1"

  /** Q37: market share — the TPC-H Q8 shape: within one region's
    * customer market, the fraction of yearly revenue supplied by one
    * focal nation. The fraction is kept INTEGER-EXACT: revenue sums in
    * e4 units (price×(1−disc) carries exactly 4dp), the share is an
    * integer permille via `div` — no float division, so both engines
    * agree bit-for-bit, unlike a double ratio whose rounding is
    * engine-specific.
    *
    * 100 TB shape: the region membership reduces customers via a
    * broadcast LEFT SEMI before the fact joins (no row multiplication,
    * and the filtered customer side is what shuffles); supplier→nation
    * is a broadcast chain; the CASE-sum computes both numerator and
    * denominator in ONE pass over the joined fact — Q8's classic
    * single-scan conditional-aggregation trick. */
  private val marketShare: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val o = T.load(s, dir, "orders")
    val c = T.load(s, dir, "customer")
    val sup = T.load(s, dir, "supplier")
    val regionNations = T.load(s, dir, "nation")
      .join(broadcast(T.load(s, dir, "region")
          .filter(col("r_name") === shareRegion)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val cR = c.join(broadcast(regionNations),
      col("c_nationkey") === col("c_nk"), "left_semi")
    val sn = T.load(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val revE4 = ((T.dec2(col("l_extendedprice")) *
      (lit(BigDecimal(1).setScale(2)) - T.dec2(col("l_discount")))) *
      10000).cast("long")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(cR, o("o_custkey") === cR("c_custkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === shareNation, revE4).otherwise(0L))
          .as("nation_rev_e4"),
        sum(revE4).as("total_rev_e4"))
      .withColumn("share_permille",
        expr("(nation_rev_e4 * 1000) div total_rev_e4"))
      .orderBy("o_year")
  }

  /** Q38: customer order-count distribution — the TPC-H Q13 shape:
    * LEFT OUTER join with an extra predicate in the JOIN CONDITION
    * (not the WHERE — moving it there would silently drop the
    * zero-order customers that are the query's point), then a
    * count-of-counts double aggregation. The first agg reduces the
    * fact to |customers| rows; the second is distribution-sized.
    * At 100 TB the one real shuffle is orders on o_custkey; the
    * second groupBy moves only (count, 1) pairs. */
  private val orderCountDistribution: Q = (s, dir) => {
    val c = T.load(s, dir, "customer")
    val o = T.load(s, dir, "orders")
    c.join(o,
        c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** The brand whose small-quantity tail q39 prices out. */
  private val smallQtyBrand = "Brand#1"

  /** Q39: small-quantity-order revenue — the TPC-H Q17 shape: lines of
    * one brand's parts whose quantity is below 20% of that PART's own
    * average quantity — the correlated scalar-aggregate-subquery
    * pattern, decorrelated the way Catalyst itself rewrites it: one
    * per-part aggregate joined back to the lines. The comparison
    * `q < 0.2·(S/n)` is cleared of division entirely
    * (5·q_cents·n < S_cents, exact in 64-bit far past 100 TB group
    * sizes), so the threshold is bit-identical in both engines.
    *
    * 100 TB shape: the brand filter pushes to the part scan and the
    * filtered part set broadcasts, so only matching lines ever leave
    * the lineitem scan; the per-part stats frame is |matching parts|
    * rows — broadcast back, no second fact shuffle. avg_yearly
    * truncates to cents via floor (ROUND(double) is not portable —
    * see Tables.moneyAvg2). */
  private val smallQtyRevenue: Q = (s, dir) => {
    val p = T.load(s, dir, "part")
      .filter(col("p_brand") === smallQtyBrand)
      .select(col("p_partkey"))
    val li = T.load(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val qCents = (T.dec2(col("l_quantity")) * 100).cast("long")
    val stats = li.groupBy(col("l_partkey").as("g_pk"))
      .agg(count(lit(1)).as("n_li"), sum(qCents).as("sum_q_cents"))
    li.join(broadcast(stats), col("l_partkey") === col("g_pk"))
      .filter(qCents * col("n_li") * 5 < col("sum_q_cents"))
      .agg(count(lit(1)).as("n_small_lines"),
        coalesce(T.moneySum(col("l_extendedprice")), lit(0.0))
          .as("total_rev"),
        (floor(coalesce(
          sum((T.dec2(col("l_extendedprice")) * 100).cast("long")),
          lit(0L)).cast("double") / 7.0) / 100.0).as("avg_yearly"))
  }

  /** Q40: disjunctive multi-column predicate revenue — the TPC-H Q19
    * shape: three OR'd condition groups, each mixing part attributes
    * (brand, size) with a lineitem attribute (quantity range), carried
    * INSIDE the join condition. What the shape exercises is predicate
    * decomposition: Catalyst factors the disjunction's common
    * conjuncts per side — the brand/size union pushes to the part
    * scan (the broadcast build is pre-filtered) and the quantity
    * range union pushes to the lineitem scan — so at 100 TB the scan
    * emits only rows that can possibly satisfy SOME branch, and the
    * full disjunction re-checks pairs after the broadcast probe. */
  private val disjunctiveRevenue: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val p = T.load(s, dir, "part")
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey") && cond)
      .agg(count(lit(1)).as("n_lines"),
        coalesce(T.revenueSum(col("l_extendedprice"), col("l_discount")),
          lit(0.0)).as("revenue"))
  }

  /** Q33: "suppliers who kept everyone waiting" — the TPC-H Q21 shape
    * (the hardest quantified-subquery query in the suite) re-based onto
    * this schema's columns: for FINISHED ('F') multi-supplier orders,
    * count per supplier the orders where THIS supplier's line shipped
    * late (> 90 days after the order date) while NO other supplier's
    * line did. Three quantifiers compose in one query — EXISTS another
    * supplier's line (left_semi self-join), NOT EXISTS another late
    * line (left_anti self-join), and the final rollup.
    *
    * 100 TB shape: both quantifiers run over the DISTINCT
    * (orderkey, suppkey) projection — the narrowest frame that can
    * answer them — and both plan as hash joins keyed on l_orderkey, so
    * the fact's wide columns never enter the self-joins; the late frame
    * is pre-filtered by the selective status+lateness predicate before
    * any self-join fans out. Top-k is TakeOrderedAndProject. */
  private val waitingSupplier: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val fOrders = T.load(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val late = graft.core.Barriers.materializeLazy(
      li.join(fOrders, li("l_orderkey") === fOrders("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAY"))
        .select(col("l_orderkey"), col("l_suppkey")).distinct())
    val nLate = late.count()
    // Both quantifiers collapse to per-order counts (late ⊆ lines and
    // the probe supplier is itself a line supplier, so "EXISTS another
    // supplier's line" ⇔ the order has ≥ 2 distinct suppliers, and
    // "NOT EXISTS another late line" ⇔ exactly 1 late supplier). The
    // former semi+anti SELF-JOINS re-shuffled the full 600k-row
    // distinct (orderkey, suppkey) frame three times; the counts are
    // ONE map-side-combined aggregation each — the n_supp rollup runs
    // straight off the scan projection (count-distinct partial agg
    // dedups before the exchange) and never materializes the distinct
    // pair frame at all. The late side's count gates a broadcast of
    // both order-keyed count frames (sole ⊆ late, and sole-qualifying
    // orders ⊆ late orders ≤ |late|), so at bench scale the fact-side
    // frames never shuffle again; past the cap the keyed shuffle plan
    // returns unchanged.
    val soleOrders = graft.core.Barriers.broadcastIfSmall(
      late.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_late"))
        .filter(col("n_late") === 1).select(col("l_orderkey")), nLate)
    // n_supp is only ever consulted for orders that HAVE a late line,
    // so the fact aggregation is pre-filtered to late orders (gated
    // broadcast semi — the 600k-row scan projection drops to the late
    // sliver before any exchange), which also bounds multiSupp's own
    // cardinality at |late orders| ≤ nLate, making its broadcast gate
    // sound.
    val lateOrders = graft.core.Barriers.broadcastIfSmall(
      late.select(col("l_orderkey")).distinct(), nLate)
    val multiSupp = li.select(col("l_orderkey"), col("l_suppkey"))
      .join(lateOrders, Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      .filter(col("n_supp") > 1).select(col("l_orderkey"))
    val sole = late
      .join(soleOrders, Seq("l_orderkey"), "left_semi")
      .join(graft.core.Barriers.broadcastIfSmall(multiSupp, nLate),
        Seq("l_orderkey"), "left_semi")
    sole
      .join(broadcast(T.load(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(20)
  }

  /** Q22: the full star join (TPC-H Q5 shape) — fact ⋈ fact-side
    * orders ⋈ customer ⋈ nation ⋈ region, five tables at once, the
    * arity where join ORDER starts to matter. The two key-to-key
    * joins (lineitem-orders, orders-customer) shuffle on their keys;
    * nation and region are broadcast lookups that never move the fact.
    * Catalyst's reorder keeps the selective region filter driving the
    * broadcast chain; at 100 TB the only wide exchanges are the two
    * fact-key shuffles AQE can further coalesce. */
  private val starJoin: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val o = T.load(s, dir, "orders")
    val c = T.load(s, dir, "customer")
    val n = T.load(s, dir, "nation")
    val r = T.load(s, dir, "region").filter(col("r_name") =!= "EUROPE")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        round(T.revenueSum(col("l_extendedprice"), col("l_discount")), 2)
          .as("revenue"))
      .orderBy("r_name", "o_orderpriority")
  }

  /** Q31: product-profit rollup — the TPC-H Q9 shape re-based onto the
    * available schema: every lineitem of a name-filtered part family
    * ('%bolt%'), margined against the part's list price
    * (revenue − quantity × retailprice standing in for Q9's
    * ps_supplycost), rolled up by supplier nation × order year. Two
    * shuffle joins (lineitem⋈orders on orderkey; nothing else is
    * fact-sized) and three broadcasts (filtered part, supplier,
    * nation); the p_name LIKE predicate pushes to the part scan, so
    * the broadcast build is the FILTERED part set — at 100 TB the
    * filter-before-broadcast ordering is the difference between a
    * shippable build side and an OOM. Margin arithmetic is exact
    * decimal, surfaced once as double (the q01/moneySum discipline). */
  private val profitRollup: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
    val o = T.load(s, dir, "orders")
    val p = T.load(s, dir, "part").filter(col("p_name").like("%bolt%"))
    val sup = T.load(s, dir, "supplier")
    val n = T.load(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long")
        .as("o_year"))
      .agg(
        count(lit(1)).as("n_lines"),
        T.revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
        sum(T.dec2(col("p_retailprice")) * T.dec2(col("l_quantity")))
          .cast("double").as("list_cost"),
        (T.revenueSum(col("l_extendedprice"), col("l_discount")) -
          sum(T.dec2(col("p_retailprice")) * T.dec2(col("l_quantity")))
            .cast("double")).as("profit"))
      .orderBy("n_name", "o_year")
  }

  /** Q24: native AS-OF join — each purchase event picks up the user's
    * most recent signup at or before it, through the custom
    * whole-operator extension ([[graft.plans.AsOfJoin]]: LogicalPlan +
    * injected SparkStrategy + merge-pass SparkPlan; see that file for
    * the plan shape). q17 emulates one as-of lookup by pre-building
    * interval epochs; this runs the lookup as a first-class operator —
    * one co-partitioned shuffle per side, one merge pass, |L| output
    * rows by construction. Oracle: DuckDB's NATIVE `ASOF LEFT JOIN` —
    * two independent implementations of the same operator semantics
    * checked value-for-value. */
  private val asofNative: Q = (s, dir) => {
    val ev = T.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), unix_micros(col("ts")).as("t")).distinct()
      .select(col("user_id").as("s_user"), col("t").as("s_t"))
    graft.plans.AsOfJoin(purchases, "user_id", "t", signups, "s_user", "s_t")
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("s_t")).as("n_matched"),
        sum(when(col("s_t").isNotNull, expr("(t - s_t) div 1000000"))
          .otherwise(0L)).cast("long").as("sum_gap_seconds"))
  }

  /** Q26: variable-depth hierarchy flattening — root distance for every
    * node of a parent-pointer tree, the org-chart/category-rollup query
    * the reference's BI layer answers with BigQuery's recursive CTEs.
    * Spark has no `WITH RECURSIVE`; the naive loop (join once per
    * level) costs O(depth) shuffles. This is the pointer-DOUBLING
    * spelling: state (node, anc, steps) where anc is the 2^i-th
    * ancestor, each round self-joins state on `anc = node` so the
    * known-ancestor distance doubles — O(log depth) keyed shuffles
    * total, the only scalable shape when depth is thousands (lineage
    * chains), with the root held as its own fixpoint so convergence
    * is idempotent. Each round materializes via [[Barriers]] — without
    * the barrier round i's plan embeds 2^i scans of the base.
    *
    * Fixture: the tree is the binary heap over ids 1..N densified from
    * c_custkey (parent = id div 2) — deterministic, variable-depth
    * (floor(log2 N) + 1 levels), replayable in DuckDB, where the
    * oracle walks it with a real `WITH RECURSIVE`. The row_number
    * densification is fixture prep (real hierarchies arrive with
    * parent pointers); the round count comes from ONE count action:
    * depth ≤ log2(N), so ceil(log2(log2(N)+1)) rounds clamp every
    * ancestor to the root. */
  private val hierarchyFlatten: Q = (s, dir) => {
    val ids = T.load(s, dir, "customer")
      .select(row_number().over(Window.orderBy(col("c_custkey")))
        .cast("long").as("id"))
    val n = ids.count()
    val depthBound = 63 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1L))
    val rounds = math.max(1,
      math.ceil(math.log(depthBound + 1.0) / math.log(2.0)).toInt)
    var state = graft.core.Barriers.materialize(
      ids.select(col("id").as("node"),
        when(col("id") === 1, lit(1L))
          .otherwise(expr("id div 2")).as("anc"),
        when(col("id") === 1, lit(0L)).otherwise(lit(1L)).as("steps")))
    for (_ <- 1 to rounds) {
      val hop = state.select(col("node").as("h_node"),
        col("anc").as("h_anc"), col("steps").as("h_steps"))
      state = graft.core.Barriers.materialize(
        state.join(hop, col("anc") === col("h_node"))
          .select(col("node"), col("h_anc").as("anc"),
            (col("steps") + col("h_steps")).as("steps")))
    }
    state.groupBy(col("steps").as("depth"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("node")).as("id_sum"),
        min(col("node")).as("min_id"),
        max(col("node")).as("max_id"))
      .orderBy("depth")
  }

  /** Q27: market-basket affinity — co-occurrence support and lift for
    * part pairs bought in the same order, the association-mining query
    * behind "frequently bought together". Pairs are generated LOCALLY
    * per basket (sorted distinct item array → slice/transform
    * combinations, `a < b` by the sort): per-basket fanout is
    * C(lines, 2), bounded by the basket size (≤ C(13,2) here), so
    * the pair stream is O(corpus × basket), NEVER O(parts²) — the
    * same bounded-clique discipline as the LSH band joins. Lift's
    * division runs as one closed-form double expression shared with
    * the oracle (exact integer counts in, bit-identical out). The
    * basket frame materializes once ([[graft.core.Barriers]]) and
    * feeds the pair stream, the support rollup, and the basket count.
    *
    * 100 TB shape: ONE keyed exchange builds the basket sets
    * (collect_set partial-merges map-side; arrays stay basket-bounded)
    * plus one for the pair rollup; the support side-tables ride
    * count-gated broadcasts with a keyed-join fallback, and the final
    * top-k plans as TakeOrderedAndProject, never a global sort. */
  private val basketAffinity: Q = (s, dir) => {
    // One exchange builds the per-basket DISTINCT item set (collect_set
    // is map-side partial-merged), and the C(lines, 2) pair stream is
    // generated LOCALLY from each basket's sorted array — the l61
    // slice/transform combination pattern — replacing the former
    // distinct + self-equi-join, which exchanged the 600k-row item
    // frame three times (distinct by (ok, pk), then both self-join
    // sides by ok) to produce the identical pair stream. sort_array
    // keeps the a < b orientation; per-basket fanout stays bounded by
    // basket size, never O(parts²).
    val baskets = graft.core.Barriers.materialize(
      T.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy(col("ok"))
        .agg(sort_array(collect_set(col("pk"))).as("pks")))
    val nBaskets = baskets.select(count(lit(1))
      .cast("double").as("n_baskets"))
    // The support table is keyed by part — its cardinality is bounded
    // by the part DIMENSION (FK: every l_partkey exists in part), whose
    // parquet count is metadata-only. baskets sits behind a barrier, so
    // without the gate both support joins sort-merged the pair frame;
    // the gated broadcast keeps the pair rollup un-reshuffled. Past the
    // cap (a part dimension too big to ship) the keyed joins return.
    val nParts = T.load(s, dir, "part").count()
    val supp = baskets.select(explode(col("pks")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(pks, (a, i) ->
          |  transform(slice(pks, i + 2, size(pks)),
          |    b -> struct(a AS pa, b AS pb))))""".stripMargin)).as("p"))
      .groupBy(col("p.pa").as("part_a"), col("p.pb").as("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 3)
    pairs
      .join(graft.core.Barriers.broadcastIfSmall(
        supp.select(col("pk").as("part_a"), col("n_item").as("n_a")),
        nParts), Seq("part_a"))
      .join(graft.core.Barriers.broadcastIfSmall(
        supp.select(col("pk").as("part_b"), col("n_item").as("n_b")),
        nParts), Seq("part_b"))
      .crossJoin(nBaskets)
      .select(col("part_a"), col("part_b"), col("n_pair"),
        col("n_a"), col("n_b"),
        (col("n_pair").cast("double") * col("n_baskets") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
      .orderBy(desc("n_pair"), col("part_a"), col("part_b"))
      .limit(20)
  }

  /** q28: triangle count + transitivity of the co-purchase graph
    * (parts are nodes, "appeared in the same order" is an edge).
    * Triads are the classic graph-analytics kernel whose naive
    * spelling — three-way self-join on id order — floods on hub
    * nodes. The Spark side runs the degree-ordered node-iterator
    * instead: orient every edge from its lower-(degree, id) endpoint
    * to the higher, then count per oriented edge (u,v) the size of
    * N⁺(u) ∩ N⁺(v) over sorted out-neighbor arrays — the
    * edge-iterator. Orientation makes every out-degree O(√E)
    * regardless of raw degree skew (a hub's edges point INTO it, so
    * its out-list stays small), bounding total intersection work at
    * O(E^1.5) — the Schank/Wagner bound. A triangle u→v, u→w, v→w
    * lands only at its pivot edge (u,v) (w is in both out-lists;
    * the other two edges miss one side), so no /3 fixup. The first
    * cut of this query spelled the same bound as an explicit wedge
    * self-join + closing equi-join: correct, but it shuffled one row
    * PER WEDGE (~35M at sf0.1, 16 s). The intersection form shuffles
    * one row per EDGE with its neighbor array — same asymptotics,
    * ~30× fewer shuffled rows. The DuckDB oracle spells the count as
    * the naive id-ordered triple join: equality proves the
    * orientation + intersection trick changes the plan, not the
    * answer.
    *
    * 100 TB shape: edges materialize once; adjacency arrays build on
    * one src-keyed shuffle and join back to edges by src and dst
    * (dst-side left join — sinks have no out-list). collect_list is
    * bounded by the orientation at O(√E) elements per node, so no
    * array can blow a partition. Transitivity divides two exact longs
    * in double, identical IEEE in both engines. */
  /** The undirected co-purchase edge list (u < v), shared by q28/q29:
    * per-basket-bounded pair fanout, never O(parts²). */
  private def copurchaseEdgesRaw(s: SparkSession, dir: String): DataFrame = {
    val items = T.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    items.as("a")
      .join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
  }

  /** Process-level cache of the MATERIALIZED co-purchase edge list per
    * (session, dir) — q28/q29/q30 consume the IDENTICAL graph, and the
    * C(parts-per-order, 2) self-join + distinct is the expensive part
    * of all three (the l07/l67/l68 and l21/l34 shared-frame lesson, a
    * third time: a frame consumed by k queries must be built once, not
    * k×). The kernels' own barriers then replay blocks, not lineage. */
  private val copurchaseCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame]()

  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    graft.core.SessionCaches.prune(copurchaseCache)
    copurchaseCache.computeIfAbsent((s, dir),
      _ => graft.core.Barriers.materialize(copurchaseEdgesRaw(s, dir)))
  }

  /** Node-id bound of the q41 oracle instance: components are computed
    * on the co-purchase subgraph induced by parts with id < this (the
    * l10 fixed-panel discipline — the transitive-closure recursion the
    * DuckDB oracle replays is Σ component² pairs, so the CHECKED
    * instance must be bounded; the Spark algorithm itself carries no
    * such bound). */
  private val ccPanel = 400

  /** q41: connected components — min-label propagation to FIXPOINT
    * over the co-purchase graph (panel-induced, see [[ccPanel]]),
    * rolled up to the component-size distribution. Each round joins
    * the current |V|-row label frame to the edge list and takes the
    * min over neighborhood labels; a driver-side changed-count (one
    * long per round — model-bounded traffic, the l32 k-means loop
    * discipline) detects convergence, so the output is EXACT
    * components, not a hop-bounded approximation (q30's depth-bounded
    * BFS is the other trade). Rounds = graph diameter, so this variant
    * is only safe on known-low-diameter graphs and now throws (loud)
    * rather than returning a partial labeling if the cap is hit. The
    * REGISTERED q41 entry uses [[componentSizesStar]] — alternating
    * large-star/small-star contraction (Kiveris et al., SoCC'14),
    * O(log n) rounds on ANY diameter — making this fixpoint form the
    * spec-driven pedagogical baseline, alongside the q26
    * pointer-doubling and l21 pointer-jumping rungs of the ladder.
    *
    * Scale shape per round: one shuffle of (node, lbl) pairs keyed by
    * node, edge frame materialized once and replayed; labels
    * re-materialize per round so lineage stays flat. */
  /** The q41 computation over any canonical (u < v) edge list —
    * public so GraphSpec can drive it on planted multi-component
    * graphs (the co-purchase graph itself is dense enough that every
    * panel forms one giant component, so the rollup's multi-size path
    * is exercised by the spec, not the registered instance). */
  def componentSizes(edges: DataFrame): DataFrame = {
    val ud = graft.core.Barriers.materialize(
      edges.select(col("u").as("a"), col("v").as("b"))
        .union(edges.select(col("v").as("a"), col("u").as("b"))))
    var labels = graft.core.Barriers.materialize(
      ud.select(col("a").as("node")).distinct()
        .withColumn("lbl", col("node")))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 64) {
      val nbrMin = ud.join(labels, col("b") === col("node"))
        .groupBy(col("a").as("nn")).agg(min(col("lbl")).as("nl"))
      // Carry the previous label THROUGH the materialized frame: the
      // convergence count then reads the just-pinned blocks instead of
      // re-joining next↔labels (which re-shuffled both |V|-row frames
      // once per round — the removed join halved q41's per-round cost).
      val next = graft.core.Barriers.materialize(
        labels.join(nbrMin, col("node") === col("nn"), "left")
          .select(col("node"), least(col("lbl"), col("nl")).as("lbl"),
            col("lbl").as("old")))
      changed = next.filter(col("lbl") =!= col("old")).count()
      labels = next.select(col("node"), col("lbl"))
      rounds += 1
    }
    // LOUD non-convergence: a graph whose diameter exceeds the round
    // cap must throw, never return a partially-propagated labeling as
    // if it were the component count. Diameter-robust callers should
    // use [[componentSizesStar]], which converges in O(log n) rounds.
    require(changed == 0,
      s"componentSizes: min-label propagation did not converge within " +
        s"$rounds rounds (graph diameter exceeds the cap); use " +
        "componentSizesStar for high-diameter graphs")
    labels.groupBy(col("lbl")).agg(count(lit(1)).as("size"))
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_components"), min(col("lbl")).as("min_label"))
      .orderBy("size")
  }

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — the diameter-proof variant of
    * [[componentSizes]]: O(log n) rounds regardless of graph shape, so
    * a 100 TB path-shaped graph (diameter ~n) converges in ~2·log₂ n
    * rounds where min-label propagation needs n.
    *
    * Edge state is the canonical (hi, lo) pair set, hi > lo.
    *  - large-star: for every node x, m = min(N(x) ∪ {x}); re-point
    *    every STRICTLY LARGER neighbor y > x at m — emits (y, m).
    *  - small-star: key each edge by its larger endpoint; for node u
    *    with (all-smaller) neighborhood N, m = min(N); re-point every
    *    other member of N ∪ {u} at m.
    * Both preserve connectivity and only ever lower a node's link
    * target; the composition contracts to star forests where every
    * non-min node points directly at its component minimum.
    *
    * Scale shape per round: two groupBy-min shuffles over the edge
    * list plus one anti-join for the convergence check — all keyed on
    * node ids, no row wider than (long, long). Edges re-materialize
    * per round so lineage stays flat. Convergence is verified
    * STRUCTURALLY, not assumed: the loop requires next ⊆ cur with
    * equal distinct counts (set equality), and the final state must be
    * a star forest (no root appears as a child) or the call throws. */
  def componentSizesStar(edges: DataFrame): DataFrame = {
    var cur = graft.core.Barriers.materializeLazy(
      edges.select(greatest(col("u"), col("v")).as("hi"),
          least(col("u"), col("v")).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct())
    var curCnt = cur.count()
    var changed = curCnt > 0
    var rounds = 0
    while (changed) {
      // 2·log₂(n) rounds suffice for any n the id type can hold; hitting
      // this bound means a logic bug, not a big graph — fail loud.
      require(rounds < 128, "componentSizesStar: star contraction did " +
        s"not reach a fixpoint in $rounds rounds — algorithmic invariant " +
        "violated (expected O(log n) convergence)")
      // large-star over both orientations of every edge
      val nbrs = cur.select(col("hi").as("x"), col("lo").as("y"))
        .union(cur.select(col("lo").as("x"), col("hi").as("y")))
      // Both per-round min frames are node-keyed (≤ 2·|cur| rows, a
      // bound the loop's own count already holds), but cur's origin
      // estimate is join-poisoned and survives its barrier (see
      // Barriers.broadcastIfSmall), so every round planned as two
      // sort-merge joins over the edge state. The count-gated hint
      // restores the broadcast the real sizes always justified; past
      // the cap the shuffle plan returns.
      val minsL = graft.core.Barriers.broadcastIfSmall(
        nbrs.groupBy("x").agg(min(col("y")).as("my"))
          .select(col("x"), least(col("x"), col("my")).as("m")),
        2 * curCnt)
      // No intermediate distinct on the large-star output: min() is
      // duplicate-insensitive, so minsS is identical either way, and
      // the round's closing distinct dedups the re-pointed pairs — the
      // dropped distinct was a whole extra shuffle per round whose
      // only effect was removing rows the final distinct removes too.
      val large = nbrs.join(minsL, "x").filter(col("y") > col("x"))
        .select(col("y").as("hi"), col("m").as("lo"))
      // small-star over the larger-endpoint orientation only
      val minsS = graft.core.Barriers.broadcastIfSmall(
        large.groupBy("hi").agg(min(col("lo")).as("m")), 2 * curCnt)
      val next = graft.core.Barriers.materializeLazy(
        large.join(minsS, "hi").filter(col("lo") =!= col("m"))
          .select(col("lo").as("hi"), col("m").as("lo"))
          .union(minsS.select(col("hi"), col("m").as("lo")))
          .distinct())
      val nextCnt = next.count()
      // set equality on distinct sets: next ⊆ cur (empty anti) ∧
      // |next| = |cur|. The count gate is free (the materialize already
      // ran a job); the anti-join runs ONLY on candidate fixpoints —
      // contraction shrinks the edge set most rounds, so this saves a
      // per-round shuffle job without weakening the equality proof.
      changed = nextCnt != curCnt ||
        !next.join(cur, Seq("hi", "lo"), "left_anti").isEmpty
      cur = next
      curCnt = nextCnt
      rounds += 1
    }
    // Star-forest invariant, checked loud: every lo must be a root
    // (appear in no hi position). A non-star fixpoint would silently
    // merge or split components in the rollup below.
    val roots = cur.select(col("lo").as("r")).distinct()
    require(cur.join(roots, col("hi") === col("r"), "left_semi")
      .isEmpty,
      "componentSizesStar: fixpoint is not a star forest")
    val labels = cur.select(col("hi").as("node"), col("lo").as("lbl"))
      .union(roots.select(col("r").as("node"), col("r").as("lbl")))
    labels.groupBy(col("lbl")).agg(count(lit(1)).as("size"))
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_components"), min(col("lbl")).as("min_label"))
      .orderBy("size")
  }

  private val connectedComponents: Q = (s, dir) =>
    componentSizesStar(copurchaseEdges(s, dir)
      .filter(col("u") < ccPanel && col("v") < ccPanel))

  /** The q28 computation over any canonical (u < v) edge list, exposed
    * so GraphSpec can drive it on planted cliques / paths / stars. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = graft.core.Barriers.materialize(edges)
    val deg = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val keyed = e
      .join(broadcast(deg.select(col("n").as("u"), col("d").as("du"))),
        Seq("u"))
      .join(broadcast(deg.select(col("n").as("v"), col("d").as("dv"))),
        Seq("v"))
    val oriented = graft.core.Barriers.materialize(keyed.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        col("u")).otherwise(col("v")).as("src"),
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        col("v")).otherwise(col("u")).as("dst")))
    val adj = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val tri = oriented
      .join(adj.select(col("src"), col("nbrs").as("nu")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")),
        Seq("dst"), "left")
      .select(size(array_intersect(col("nu"),
        coalesce(col("nv"), array()))).cast("long").as("t"))
      .agg(sum(col("t")).as("n_triangles"))
    val shape = e.agg(count(lit(1)).as("n_edges"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    nodes.crossJoin(shape).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        (col("n_triangles").cast("double") * 3.0 /
          col("n_wedges").cast("double")).as("transitivity"))
  }

  private val triangleCount: Q = (s, dir) =>
    triangleStats(copurchaseEdges(s, dir))

  /** q29: PageRank, three synchronous iterations over the symmetrized
    * co-purchase graph, ENTIRELY in integer arithmetic. Float PageRank
    * is not reproducible across engines (distributed sums re-order),
    * so ranks live in micro-units: r₀ = 1e6, each step is
    * r' = 0.15·1e6 + 0.85·Σ(r(m) div deg(m)) with floor division —
    * every engine computes the identical lattice of longs, which is
    * what lets the top-20 (tie-broken by node id) hash-match exactly.
    * Floor-div loses < 1 micro-unit per edge — quantization noise,
    * not drift, since both sides share it.
    *
    * 100 TB shape: the classic iterate-join — edges materialize ONCE
    * and every iteration is contribs = edges ⋈ ranks (shuffle on the
    * join key) then a map-side-combined sum by dst. Degree rides in
    * the rank frame so contributions need no second join. Three
    * iterations unroll into one plan here; a 50-iteration run would
    * checkpoint ranks each round to cut lineage, same barrier this
    * query already uses for edges. Dangling nodes cannot exist in a
    * symmetrized graph, so no mass-leak correction term is needed. */
  /** The q29 ranks over any canonical (u < v) edge list, exposed so
    * GraphSpec can pin the regular-graph fixpoint law. */
  def pageRankRanks(e: DataFrame, iters: Int): DataFrame = {
    // The doubled edge list is checkpointed PRE-PARTITIONED on dst:
    // checkpoint preserves output partitioning (LogicalRDD carries it),
    // and the per-iteration contribution aggregate groups by dst after
    // a broadcast-able rank join (broadcast joins preserve the probe
    // side's partitioning) — so the 2|E|-row frame is shuffled ONCE at
    // build instead of once per iteration. At billion-node scale the
    // rank join outgrows broadcast and planning falls back to
    // sort-merge; the dst partitioning then still serves the agg side.
    val d = graft.core.Barriers.materialize(
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
        .repartition(col("dst")))
    // Degrees pinned once: without the barrier the deg subplan (a full
    // aggregate over d) is stamped into the unrolled plan once per
    // iteration plus once per rank rebuild.
    val deg = graft.core.Barriers.materializeLazy(
      d.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    // |V| is known exactly (deg's count below both pins its blocks and
    // returns the cardinality in one fused job) and gates a broadcast
    // of the rank frame: deg's origin estimate went through the edge
    // build's joins (join-product stats survive the barrier — see
    // Barriers.broadcastIfSmall), so without the hint every unrolled
    // iteration planned the rank join as sort-merge and re-shuffled+
    // sorted the 2|E| edge frame it was dst-partitioned to never move
    // (measured: 9.0 s → the hinted plan keeps d unshuffled and the
    // per-iteration agg exchange-free). Above the row cap
    // (billion-node scale) the hint drops out and the sort-merge
    // fallback serves the dst partitioning as designed.
    val nNodes = deg.count()
    var r = deg.select(col("src").as("n"), col("deg"),
      lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contribs = d
        .join(graft.core.Barriers.broadcastIfSmall(
            r.select(col("n").as("src"), expr("r div deg").as("c")), nNodes),
          Seq("src"))
        .groupBy(col("dst").as("n")).agg(sum(col("c")).as("s"))
      // contribs is ≤ |V| rows too (one per in-degree-positive node) —
      // the same gate broadcasts it into the left-outer rank rebuild,
      // which otherwise sort-merges two |V|-row frames per iteration.
      r = deg.select(col("src").as("n"), col("deg"))
        .join(graft.core.Barriers.broadcastIfSmall(contribs, nNodes),
          Seq("n"), "left")
        .withColumn("r",
          lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100"))
        .select(col("n"), col("deg"), col("r"))
    }
    r
  }

  private val pageRank: Q = (s, dir) =>
    pageRankRanks(copurchaseEdges(s, dir), 3)
      .orderBy(desc("r"), col("n")).limit(20)
      .select(col("n").as("part"), col("deg").as("degree"),
        col("r").as("rank_micro"))

  /** BFS hop bound for q30 — enough to reach the whole co-purchase
    * component at test scale while keeping the oracle's recursive CTE
    * row count at |V| × depth. */
  private val bfsDepth = 3

  /** The bounded-depth BFS frontier expansion over any canonical
    * (u < v) edge list, exposed so GraphSpec can drive it on planted
    * paths/stars: returns (node, d) with d = min hop distance from
    * `srcNode`, d <= depth. */
  def bfsDistances(edges: DataFrame, srcNode: DataFrame,
      depth: Int): DataFrame = {
    val und = graft.core.Barriers.materialize(
      edges.select(col("u").as("a"), col("v").as("b"))
        .unionAll(edges.select(col("v").as("a"), col("u").as("b"))))
    var dist = srcNode.select(col("node"), lit(0).as("d"))
    // Reached-set size per level: 1 source row at level 0, then the
    // materialized frame's count (pinned blocks, sub-50ms) — it gates
    // the frontier broadcast below, the decision AQE cannot make
    // cheaply here because the barrier hides the true size until the
    // edge side has already been shuffle-written.
    var distCnt = 1L
    for (i <- 1 to depth) {
      // Level-synchronous expansion: only the CURRENT level set (nodes
      // at exactly d = i-1 — a pure filter of last round's state, so
      // each iteration stays a pure function of the previous one)
      // joins the edge list; the min-hop combine against the full
      // known set keeps re-discoveries idempotent. Expanding the whole
      // reached set instead (the pre-r11 form) re-walked every settled
      // node's adjacency every round — ~3× the expansion rows by the
      // last level on a dense graph, for identical output. The
      // frontier is the SMALL side (≤ the reached set, whose count the
      // loop holds), so the count-gated hint broadcasts it and the
      // edge list is never shuffled; past the row cap the plain
      // shuffle join returns.
      val frontier = graft.core.Barriers.broadcastIfSmall(
        dist.filter(col("d") === i - 1), distCnt)
      val next = frontier.join(und, frontier("node") === und("a"))
        .select(col("b").as("node"), lit(i).as("d"))
      dist = graft.core.Barriers.materializeLazy(
        dist.unionAll(next)
          .groupBy(col("node")).agg(min(col("d")).as("d")))
      distCnt = dist.count()
    }
    dist
  }

  /** q30: single-source shortest hops (bounded BFS) over the
    * co-purchase graph — "how far does part X's co-purchase
    * neighborhood reach in 3 hops", the reachability kernel behind
    * recommendation radius and blast-radius queries. Source = the
    * lowest part id in the edge list (every edge stores u < v, so
    * min(u) IS the global min node). Output: nodes per hop distance.
    *
    * Spark spelling: iterative frontier joins with a min-hop combine,
    * one materialization barrier per level (3 levels unrolled). The
    * DuckDB oracle is a recursive CTE with UNION-distinct semantics;
    * equality proves the iterative DataFrame loop computes the same
    * fixpoint prefix.
    *
    * 100 TB shape: each round shuffles (node, d) pairs — 12 bytes a
    * row, never the adjacency text — joined against the edge list on
    * its key; the barrier caps lineage growth (q26's pointer-doubling
    * notes apply). Deeper searches would switch to pointer doubling
    * (O(log diameter) rounds) exactly as q26 does for hierarchies. */
  private val bfsHops: Q = (s, dir) => {
    val e = copurchaseEdges(s, dir)
    val src = e.agg(min(col("u")).as("node"))
    bfsDistances(e, src, bfsDepth)
      .groupBy(col("d")).agg(count(lit(1)).as("n_nodes"))
      .orderBy("d")
  }

  /** Date window + lateness threshold of the q42 priority check. */
  private val q42Window = ("1996-01-01", "1996-04-01")
  private val q42LateDays = 30

  /** q42: order-priority lateness check — the TPC-H Q4 shape: count
    * orders per priority in one quarter where EXISTS a line shipped
    * more than [[q42LateDays]] days after the order date (this
    * schema's "commit date missed" stand-in). The quantifier plans as
    * a LEFT SEMI hash join — the fact side never multiplies, and a
    * multi-late order still counts once, which is exactly what EXISTS
    * buys over an inner join + distinct.
    *
    * 100 TB shape: the quarter filter prunes the orders scan FIRST
    * (3/80 months of the table), so the semi join probes with the
    * small side; the lineitem side carries only (orderkey, shipdate).
    * The lateness comparison references BOTH sides, so it rides the
    * join condition — Catalyst keys the join on orderkey and applies
    * the interval predicate as a post-probe filter. */
  private val priorityLateness: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(q42Window._1) &&
        col("o_orderdate") < lit(q42Window._2))
    val li = T.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate") +
            expr(s"INTERVAL $q42LateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** q43's reporting quarter (orders placed here, lines returned). */
  private val q43Window = ("1996-01-01", "1996-04-01")

  /** q43: returned-item reporting — the TPC-H Q10 shape: the top 20
    * customers by revenue lost to returns ('R' lines) on orders placed
    * in one quarter, with their nation. Four tables, one top-k.
    *
    * 100 TB shape: the two selective filters (order quarter, return
    * flag) push to their scans BEFORE either join; orders⋈lineitem is
    * the one real shuffle (both sides pre-filtered to the quarter's
    * sliver); customer joins on the already-aggregated-by-join frame
    * and nation broadcasts. Top-k plans as TakeOrderedAndProject —
    * only 20 rows ever reach the driver. Revenue is the exact-decimal
    * sum (q01 discipline) so the ordering key is bit-stable; ties
    * break on c_custkey. */
  private val returnedItems: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(q43Window._1) &&
        col("o_orderdate") < lit(q43Window._2))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = T.load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val c = T.load(s, dir, "customer")
    val n = T.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_returned_lines"),
        T.revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("n_returned_lines"), col("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  /** q44's reporting year and slow-ship threshold (days). */
  private val q44Window = ("1996-01-01", "1997-01-01")
  private val q44SlowDays = 60

  /** q44: shipping-latency priority mix — the TPC-H Q12 shape with
    * this schema's columns: classify each line shipped against a
    * [[q44SlowDays]]-day latency bar (the ship-mode stand-in) and
    * count critical-priority (1-URGENT / 2-HIGH) vs other orders per
    * class — "are the slow lanes carrying the urgent freight". The
    * shape's point is the conditional aggregation AFTER a join whose
    * both-sides predicate (shipdate vs orderdate) can't push to
    * either scan alone.
    *
    * 100 TB shape: the year filter prunes orders before the join; the
    * join keys on orderkey with map-side-combined CASE sums after —
    * one shuffle, two output rows. */
  private val latencyPriorityMix: Q = (s, dir) => {
    val o = T.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(q44Window._1) &&
        col("o_orderdate") < lit(q44Window._2))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = T.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    val critical = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        when(col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $q44SlowDays DAYS"), "slow")
          .otherwise("fast").as("ship_class"))
      .agg(
        sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("ship_class")
  }

  /** q45's quantity floor — a top-tail cut (max order sums ~450 at
    * every sf; the floor keeps the HAVING selective without emptying
    * the sf0.01 gate). */
  private val q45QtyFloor = 300

  /** q45: large-volume customers — the TPC-H Q18 shape: orderkeys
    * whose total quantity clears [[q45QtyFloor]] (GROUP BY + HAVING
    * over the fact), joined back to orders and customers, top 20 by
    * order value. The shape's point is the HAVING-subquery → join-back
    * composition: the qualifying-key set is computed ONCE from the
    * narrow (orderkey, quantity) projection and only then touches the
    * wide tables.
    *
    * 100 TB shape: the first aggregate reduces lineitem to |orders|
    * rows of two longs; qualifying keys (a tiny fraction) broadcast
    * back as a semi-join filter onto orders; customer joins after the
    * fact side has shrunk to the qualifiers. Quantity sums in exact
    * cents (q39 discipline); top-k is TakeOrderedAndProject keyed on
    * the raw o_totalprice double (identical bits both engines). */
  private val largeVolumeOrders: Q = (s, dir) => {
    val qty = T.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg((sum((T.dec2(col("l_quantity")) * 100).cast("long")) / 100.0)
        .as("sum_qty"))
      .filter(col("sum_qty") > q45QtyFloor)
    val o = T.load(s, dir, "orders")
    val c = T.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    o.join(qty, col("o_orderkey") === col("l_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(20)
  }

  /** q46's reporting month. */
  private val q46Window = ("1996-03-01", "1996-04-01")

  /** q46: promotion revenue effect — the TPC-H Q14 shape: the share of
    * one month's revenue carried by PROMO-type parts. Kept
    * INTEGER-EXACT end to end (q37 discipline): revenue in e4 units
    * (price×(1−disc) carries exactly 4dp), the share an integer
    * permille via floor division — no float ratio to drift between
    * engines.
    *
    * 100 TB shape: the month filter prunes the lineitem scan; part
    * pre-projects to (key, is-promo flag) and broadcasts — the flag,
    * not the type string, rides the probe. Both the numerator and
    * denominator come from ONE conditional-aggregation pass. */
  private val promoRevenue: Q = (s, dir) => {
    val li = T.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(q46Window._1) &&
        col("l_shipdate") < lit(q46Window._2))
    val p = T.load(s, dir, "part")
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    val revE4 = ((T.dec2(col("l_extendedprice")) *
      (lit(BigDecimal(1).setScale(2)) - T.dec2(col("l_discount")))) *
      10000).cast("long")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_promo"), revE4).otherwise(0L)).as("promo_rev_e4"),
        sum(revE4).as("total_rev_e4"))
      .withColumn("promo_permille",
        expr("(promo_rev_e4 * 1000) div total_rev_e4"))
  }

  /** Derived "partsupp": the schema has no part-supplier table, so the
    * (part, supplier) relation is materialized from observed lines —
    * cost = the minimum line price in cents, value = total line price
    * in cents. One map-side-combined shuffle on the compound key; the
    * result is partsupp-sized (≪ lineitem) and feeds q47/q48/q49. */
  private def derivedPartSupp(s: SparkSession, dir: String): DataFrame =
    T.load(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        (T.dec2(col("l_extendedprice")) * 100).cast("long").as("pc"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("pc")).as("cost_cents"), sum(col("pc")).as("val_cents"))

  /** q47's part filter (Q2's region/size/type slice re-based). */
  private val q47Size = 15
  private val q47Type = "LARGE"

  /** q47: min-cost supplier — the TPC-H Q2 shape: for every part in a
    * size/type slice, the supplier(s) achieving that PART's minimum
    * cost, with their nation and account balance. The correlated MIN
    * subquery decorrelates exactly as Catalyst would rewrite it (q39
    * discipline): one per-part aggregate over the derived partsupp,
    * joined back as an equality filter.
    *
    * 100 TB shape: the part slice filters and broadcasts FIRST, so the
    * partsupp build only aggregates matching lines' keys; the per-part
    * min frame is |slice| rows (broadcast back — no second shuffle);
    * supplier and nation are broadcast dims. Cost is exact cents. */
  private val minCostSupplier: Q = (s, dir) => {
    val p = T.load(s, dir, "part")
      .filter(col("p_size") === q47Size && col("p_type") === q47Type)
      .select(col("p_partkey"))
    val psf = derivedPartSupp(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val minc = psf.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("cost_cents")).as("min_cost"))
    psf.join(broadcast(minc),
        col("l_partkey") === col("mk") &&
          col("cost_cents") === col("min_cost"))
      .join(T.load(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(T.load(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("cost_cents"), col("s_name"),
        col("n_name"), col("s_acctbal"))
      .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(20)
  }

  /** q48's focal nation and HAVING fraction (value > total/1000). */
  private val q48Nation = "NATION_3"

  /** q48: important-stock identification — the TPC-H Q11 shape: parts
    * whose supply value from ONE nation's suppliers exceeds a fixed
    * fraction of that nation's total, i.e. GROUP BY + HAVING against a
    * scalar subquery over the same filtered relation. All value
    * arithmetic is exact cents and the HAVING is the cross-multiplied
    * `value·1000 > total` — no float fraction.
    *
    * 100 TB shape: the nation's supplier set broadcasts as a semi-join
    * onto the derived partsupp (the fact reduction happens before any
    * wide row moves); the per-part rollup is partsupp-sized; the total
    * is a 1-row broadcast. */
  private val importantStock: Q = (s, dir) => {
    val suppN = T.load(s, dir, "supplier")
      .join(broadcast(T.load(s, dir, "nation")
          .filter(col("n_name") === q48Nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val pv = derivedPartSupp(s, dir)
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("val_cents")).as("part_value_cents"))
    val tot = pv.agg(sum(col("part_value_cents")).as("total_cents"))
    pv.crossJoin(broadcast(tot))
      .filter(col("part_value_cents") * 1000 > col("total_cents"))
      .select(col("l_partkey").as("p_partkey"), col("part_value_cents"))
      .orderBy(desc("part_value_cents"), col("p_partkey"))
  }

  /** q49's excluded-supplier name pattern and part slice. */
  private val q49ExcludePattern = "%7%"
  private val q49Sizes = Seq(1, 3, 5, 7, 9)

  /** q49: parts-supplier relationship count — the TPC-H Q16 shape:
    * per (brand, type, size) in a slice, how many DISTINCT suppliers
    * offer the part, excluding a complained-about supplier set
    * delivered as a NOT IN (planned left_anti). The exact distinct
    * count groups on attributes that arrive via a broadcast dim.
    *
    * 100 TB shape: the derived partsupp is already distinct on
    * (part, supp); the exclusion list broadcasts (anti join before the
    * fanout); the distinct count shuffles only (brand,type,size,supp)
    * tuples. */
  private val partSupplierCounts: Q = (s, dir) => {
    val excl = T.load(s, dir, "supplier")
      .filter(col("s_name").like(q49ExcludePattern))
      .select(col("s_suppkey"))
    val ps = derivedPartSupp(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    T.load(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(q49Sizes: _*))
      .join(ps, col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** q50's shipdate cutoff (the DELTA-days pattern of Q1). */
  private val q50Cutoff = "2001-08-01"

  /** q50: pricing summary report — the TPC-H Q1 shape: the full
    * price/discount/charge rollup by (returnflag, linestatus) over
    * almost the whole fact. THE canonical scan-heavy aggregate: one
    * pass, map-side combined into ≤ |flag|×|status| groups. Sums are
    * exact decimal → double (q01 discipline); charge chains two
    * decimal multiplies (price·(1−d)·(1+t)) — exact in both engines,
    * no intermediate rounding. Averages are derivable (sum/count) and
    * deliberately not emitted as doubles. */
  private val pricingSummary: Q = (s, dir) => {
    val one = lit(BigDecimal(1).setScale(2))
    T.load(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(q50Cutoff))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum((T.dec2(col("l_quantity")) * 100).cast("long")) / 100.0)
          .as("sum_qty"),
        T.moneySum(col("l_extendedprice")).as("sum_base_price"),
        T.revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("sum_disc_price"),
        sum(T.dec2(col("l_extendedprice")) *
            (one - T.dec2(col("l_discount"))) *
            (one + T.dec2(col("l_tax"))))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q51's market segment and pivot date. */
  private val q51Segment = "BUILDING"
  private val q51Date = "1996-06-30"

  /** q51: shipping-priority top-10 — the TPC-H Q3 shape: unshipped
    * revenue (orders placed before the pivot, lines shipped after) for
    * one market segment, top 10 orders by revenue. The segment filter
    * reduces customers to a broadcast semi-join; both date filters
    * push to their scans; revenue is exact decimal; top-k plans as
    * TakeOrderedAndProject. */
  private val shippingPriority: Q = (s, dir) => {
    val c = T.load(s, dir, "customer")
      .filter(col("c_mktsegment") === q51Segment)
      .select(col("c_custkey"))
    val o = T.load(s, dir, "orders")
      .filter(col("o_orderdate") < lit(q51Date))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
    T.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit(q51Date))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .agg(T.revenueSum(col("l_extendedprice"), col("l_discount"))
        .as("revenue"))
      .orderBy(desc("revenue"), col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** q52's year window and the discount/quantity band. */
  private val q52Window = ("1996-01-01", "1997-01-01")

  /** q52: forecasting-revenue change — the TPC-H Q6 shape: the
    * simplest possible fact query (one filter, one aggregate, no
    * join), which is exactly why it matters — it measures pure scan +
    * predicate throughput. All three predicates push to the parquet
    * scan; revenue = Σ price·discount in exact decimal. The discount
    * band compares the stored doubles against the same literals in
    * both engines (bit-identical inputs ⇒ identical band). */
  private val forecastRevenue: Q = (s, dir) =>
    T.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(q52Window._1) &&
        col("l_shipdate") < lit(q52Window._2) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        count(lit(1)).as("n_lines"),
        coalesce(sum(T.dec2(col("l_extendedprice")) *
            T.dec2(col("l_discount"))).cast("double"), lit(0.0))
          .as("revenue"))

  val queries: Map[String, Q] = Map(
    "q47_min_cost_supplier" -> minCostSupplier,
    "q48_important_stock" -> importantStock,
    "q49_part_supplier_counts" -> partSupplierCounts,
    "q50_pricing_summary" -> pricingSummary,
    "q51_shipping_priority" -> shippingPriority,
    "q52_forecast_revenue" -> forecastRevenue,
    "q42_priority_lateness" -> priorityLateness,
    "q43_returned_items" -> returnedItems,
    "q44_latency_priority_mix" -> latencyPriorityMix,
    "q45_large_volume_orders" -> largeVolumeOrders,
    "q46_promo_revenue" -> promoRevenue,
    "q31_profit_rollup" -> profitRollup,
    "q32_agg_semi_join" -> aggSemiJoin,
    "q36_volume_shipping" -> volumeShipping,
    "q41_connected_components" -> connectedComponents,
    "q37_market_share" -> marketShare,
    "q38_order_count_distribution" -> orderCountDistribution,
    "q39_small_qty_revenue" -> smallQtyRevenue,
    "q40_disjunctive_revenue" -> disjunctiveRevenue,
    "q33_waiting_supplier" -> waitingSupplier,
    "q34_top_supplier_view" -> topSupplierView,
    "q35_dormant_customers" -> dormantCustomers,
    "q30_bfs_hops" -> bfsHops,
    "q29_pagerank" -> pageRank,
    "q28_triangle_count" -> triangleCount,
    "q27_basket_affinity" -> basketAffinity,
    "q26_hierarchy_flatten" -> hierarchyFlatten,
    "q24_asof_native" -> asofNative,
    "q01_revenue_by_nation" -> revenueByNation,
    "q22_star_join" -> starJoin,
    "q17_asof_scd2" -> asofScd2,
    "q18_sql_entry" -> sqlEntry,
    "q12_prepost_compare" -> prePostCompare,
    "q13_left_join_expr" -> leftJoinExpr,
    "q14_semi_join" -> semiJoin,
    "q15_rank_join" -> rankJoin,
    "q16_merge_upsert" -> mergeUpsert,
    "q19_anti_join" -> antiJoin,
    "q20_full_outer" -> fullOuterJoin,
    "q21_correlated_subquery" -> correlatedSubquery)

  /** DuckDB spelling of [[derivedPartSupp]]. */
  private val oPartSupp =
    s"""ps AS (
       |  SELECT l_partkey, l_suppkey,
       |    MIN(CAST(${T.oDec2("l_extendedprice")} * 100 AS BIGINT))
       |      AS cost_cents,
       |    CAST(SUM(CAST(${T.oDec2("l_extendedprice")} * 100 AS BIGINT))
       |      AS BIGINT) AS val_cents
       |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q47_min_cost_supplier" ->
      s"""WITH $oPartSupp,
         |slice AS (SELECT p_partkey FROM part
         |  WHERE p_size = $q47Size AND p_type = '$q47Type'),
         |psf AS (
         |  SELECT ps.* FROM ps JOIN slice ON l_partkey = p_partkey),
         |mn AS (
         |  SELECT l_partkey AS mk, MIN(cost_cents) AS min_cost
         |  FROM psf GROUP BY 1)
         |SELECT psf.l_partkey AS p_partkey, psf.cost_cents, s.s_name,
         |  n.n_name, s.s_acctbal
         |FROM psf JOIN mn
         |  ON psf.l_partkey = mn.mk AND psf.cost_cents = mn.min_cost
         |JOIN supplier s ON psf.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p_partkey
         |LIMIT 20""".stripMargin,
    "q48_important_stock" ->
      s"""WITH $oPartSupp,
         |sn AS (
         |  SELECT s_suppkey FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = '$q48Nation'),
         |pv AS (
         |  SELECT l_partkey,
         |    CAST(SUM(val_cents) AS BIGINT) AS part_value_cents
         |  FROM ps WHERE l_suppkey IN (SELECT s_suppkey FROM sn)
         |  GROUP BY 1),
         |t AS (SELECT CAST(SUM(part_value_cents) AS BIGINT)
         |  AS total_cents FROM pv)
         |SELECT l_partkey AS p_partkey, part_value_cents
         |FROM pv CROSS JOIN t
         |WHERE part_value_cents * 1000 > total_cents
         |ORDER BY part_value_cents DESC, p_partkey""".stripMargin,
    "q49_part_supplier_counts" -> {
      val sizes = q49Sizes.mkString(", ")
      s"""WITH $oPartSupp
         |SELECT p_brand, p_type, p_size,
         |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
         |FROM part JOIN ps ON p_partkey = l_partkey
         |WHERE p_brand <> 'Brand#1' AND p_size IN ($sizes)
         |  AND l_suppkey NOT IN (
         |    SELECT s_suppkey FROM supplier
         |    WHERE s_name LIKE '$q49ExcludePattern')
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin
    },
    "q50_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(${T.oDec2("l_quantity")} * 100 AS BIGINT))
         |    AS DOUBLE) / 100.0 AS sum_qty,
         |  ${T.oMoneySum("l_extendedprice")} AS sum_base_price,
         |  ${T.oRevenueSum("l_extendedprice", "l_discount")}
         |    AS sum_disc_price,
         |  CAST(SUM(${T.oDec2("l_extendedprice")}
         |    * (CAST(1.00 AS DECIMAL(3,2)) - ${T.oDec2("l_discount")})
         |    * (CAST(1.00 AS DECIMAL(3,2)) + ${T.oDec2("l_tax")}))
         |    AS DOUBLE) AS sum_charge,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '$q50Cutoff'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q51_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${T.oRevenueSum("l_extendedprice", "l_discount")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = '$q51Segment'
         |  AND o_orderdate < TIMESTAMP '$q51Date'
         |  AND l_shipdate > TIMESTAMP '$q51Date'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,
    "q52_forecast_revenue" ->
      s"""SELECT COUNT(*) AS n_lines,
         |  COALESCE(CAST(SUM(${T.oDec2("l_extendedprice")}
         |    * ${T.oDec2("l_discount")}) AS DOUBLE), 0.0) AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '${q52Window._1}'
         |  AND l_shipdate < TIMESTAMP '${q52Window._2}'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,
    "q42_priority_lateness" ->
      s"""SELECT o_orderpriority, COUNT(*) AS order_count
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '${q42Window._1}'
         |  AND o_orderdate < TIMESTAMP '${q42Window._2}'
         |  AND EXISTS (SELECT 1 FROM lineitem
         |    WHERE l_orderkey = o_orderkey
         |      AND l_shipdate > o_orderdate + INTERVAL $q42LateDays DAY)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q43_returned_items" ->
      s"""WITH r AS (
         |  SELECT o_custkey, COUNT(*) AS n_returned_lines,
         |    ${T.oRevenueSum("l_extendedprice", "l_discount")} AS revenue
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '${q43Window._1}'
         |    AND o_orderdate < TIMESTAMP '${q43Window._2}'
         |  GROUP BY 1)
         |SELECT c_custkey, c_name, n_name, n_returned_lines, revenue
         |FROM r JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q44_latency_priority_mix" ->
      s"""SELECT CASE WHEN l_shipdate > o_orderdate
         |    + INTERVAL $q44SlowDays DAY
         |    THEN 'slow' ELSE 'fast' END AS ship_class,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderdate >= TIMESTAMP '${q44Window._1}'
         |  AND o_orderdate < TIMESTAMP '${q44Window._2}'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q45_large_volume_orders" ->
      s"""WITH qty AS (
         |  SELECT l_orderkey,
         |    CAST(SUM(CAST(${T.oDec2("l_quantity")} * 100 AS BIGINT))
         |      AS DOUBLE) / 100.0 AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING sum_qty > $q45QtyFloor)
         |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
         |  o_totalprice, sum_qty
         |FROM qty JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q46_promo_revenue" ->
      s"""WITH f AS (
         |  SELECT p_type = 'PROMO' AS is_promo,
         |    CAST(${T.oDec2("l_extendedprice")}
         |      * (CAST(1.00 AS DECIMAL(3,2)) - ${T.oDec2("l_discount")})
         |      * 10000 AS BIGINT) AS rev_e4
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '${q46Window._1}'
         |    AND l_shipdate < TIMESTAMP '${q46Window._2}'),
         |a AS (
         |  SELECT COUNT(*) AS n_lines,
         |    CAST(SUM(CASE WHEN is_promo THEN rev_e4 ELSE 0 END)
         |      AS BIGINT) AS promo_rev_e4,
         |    CAST(SUM(rev_e4) AS BIGINT) AS total_rev_e4
         |  FROM f)
         |SELECT n_lines, promo_rev_e4, total_rev_e4,
         |  (promo_rev_e4 * 1000) // total_rev_e4 AS promo_permille
         |FROM a""".stripMargin,
    // exact components via transitive-closure recursion (UNION-dedup
    // fixpoint on (node, reachable-label) pairs) — replayable because
    // the instance is panel-bounded; min per node, then size rollups
    "q41_connected_components" ->
      s"""WITH RECURSIVE items AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         |  FROM lineitem WHERE l_partkey < $ccPanel),
         |e AS (
         |  SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
         |ud AS (
         |  SELECT u AS a, v AS b FROM e
         |  UNION ALL SELECT v AS a, u AS b FROM e),
         |reach(node, lbl) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM ud)
         |  UNION
         |  SELECT ud.a, reach.lbl FROM reach JOIN ud ON ud.b = reach.node),
         |m AS (SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY 1),
         |c AS (SELECT lbl, COUNT(*) AS sz FROM m GROUP BY 1)
         |SELECT sz AS size, COUNT(*) AS n_components,
         |  MIN(lbl) AS min_label
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_volume_shipping" -> {
      val (na, nb) = tradePair
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  COUNT(*) AS n_lines,
         |  ${T.oRevenueSum("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = '$na' AND n2.n_name = '$nb')
         |   OR (n1.n_name = '$nb' AND n2.n_name = '$na')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },
    "q37_market_share" ->
      s"""WITH f AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    sn.n_name AS supp_nation,
         |    CAST(${T.oDec2("l_extendedprice")}
         |      * (CAST(1.00 AS DECIMAL(3,2)) - ${T.oDec2("l_discount")})
         |      * 10000 AS BIGINT) AS rev_e4
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation sn ON s_nationkey = sn.n_nationkey
         |  WHERE c_nationkey IN (
         |    SELECT n_nationkey FROM nation
         |    JOIN region ON n_regionkey = r_regionkey
         |    WHERE r_name = '$shareRegion')),
         |y AS (
         |  SELECT o_year,
         |    CAST(SUM(CASE WHEN supp_nation = '$shareNation'
         |      THEN rev_e4 ELSE 0 END) AS BIGINT) AS nation_rev_e4,
         |    CAST(SUM(rev_e4) AS BIGINT) AS total_rev_e4
         |  FROM f GROUP BY 1)
         |SELECT o_year, nation_rev_e4, total_rev_e4,
         |  (nation_rev_e4 * 1000) // total_rev_e4 AS share_permille
         |FROM y ORDER BY o_year""".stripMargin,
    "q38_order_count_distribution" ->
      """WITH co AS (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM co GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q39_small_qty_revenue" ->
      s"""WITH li AS (
         |  SELECT l_partkey, l_extendedprice,
         |    CAST(${T.oDec2("l_quantity")} * 100 AS BIGINT) AS q_cents
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = '$smallQtyBrand'),
         |st AS (
         |  SELECT l_partkey AS g_pk, COUNT(*) AS n_li,
         |    CAST(SUM(q_cents) AS BIGINT) AS sum_q_cents
         |  FROM li GROUP BY 1),
         |sm AS (
         |  SELECT li.l_extendedprice FROM li JOIN st ON li.l_partkey = st.g_pk
         |  WHERE li.q_cents * st.n_li * 5 < st.sum_q_cents)
         |SELECT COUNT(*) AS n_small_lines,
         |  COALESCE(${T.oMoneySum("l_extendedprice")}, 0.0) AS total_rev,
         |  FLOOR(CAST(COALESCE(
         |    SUM(CAST(${T.oDec2("l_extendedprice")} * 100 AS BIGINT)), 0)
         |    AS DOUBLE) / 7.0) / 100.0 AS avg_yearly
         |FROM sm""".stripMargin,
    "q40_disjunctive_revenue" ->
      s"""SELECT COUNT(*) AS n_lines,
         |  COALESCE(${T.oRevenueSum("l_extendedprice", "l_discount")}, 0.0)
         |    AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
         |    AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q34_top_supplier_view" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    SUM(${T.oDec2("l_extendedprice")}
         |      * (1 - ${T.oDec2("l_discount")})) AS total_rev
         |  FROM lineitem GROUP BY 1)
         |SELECT s.s_suppkey, s.s_name,
         |  CAST(r.total_rev AS DOUBLE) AS total_revenue
         |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
         |WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
         |ORDER BY s.s_suppkey""".stripMargin,
    "q35_dormant_customers" ->
      s"""WITH c AS (SELECT c_custkey, c_acctbal,
         |  CAST(${T.oDec2("c_acctbal")} * 100 AS BIGINT) AS bal_c
         |  FROM customer),
         |a AS (SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_pos,
         |  COUNT(*) AS n_pos FROM c WHERE bal_c > 0),
         |prem AS (SELECT o_custkey FROM orders
         |  WHERE o_totalprice > $premiumOrderFloor)
         |SELECT CAST(c.c_custkey % 10 AS BIGINT) AS cc_prefix,
         |  COUNT(*) AS n_custs,
         |  ROUND(${T.oMoneySum("c_acctbal")}, 2) AS total_bal
         |FROM c CROSS JOIN a
         |WHERE c.bal_c * a.n_pos > a.sum_pos
         |  AND NOT EXISTS (SELECT 1 FROM prem
         |    WHERE prem.o_custkey = c.c_custkey)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q33_waiting_supplier" ->
      """WITH f AS (SELECT o_orderkey, o_orderdate FROM orders
        |  WHERE o_orderstatus = 'F'),
        |late AS (SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN f ON l.l_orderkey = f.o_orderkey
        |  WHERE l.l_shipdate > f.o_orderdate + INTERVAL 90 DAY),
        |lines AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        |SELECT s.s_name, COUNT(*) AS numwait
        |FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lines l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q31_profit_rollup" ->
      s"""SELECT n_name,
         |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  COUNT(*) AS n_lines,
         |  ${T.oRevenueSum("l_extendedprice", "l_discount")} AS revenue,
         |  CAST(SUM(${T.oDec2("p_retailprice")} * ${T.oDec2("l_quantity")})
         |    AS DOUBLE) AS list_cost,
         |  ${T.oRevenueSum("l_extendedprice", "l_discount")} -
         |    CAST(SUM(${T.oDec2("p_retailprice")} * ${T.oDec2("l_quantity")})
         |      AS DOUBLE) AS profit
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%bolt%'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // recursive CTE with UNION-distinct frontier; min-hop per node
    // replayed relationally; the depth bound interpolates bfsDepth so
    // the two sides cannot drift
    "q30_bfs_hops" ->
      s"""WITH RECURSIVE items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
        |ud AS (
        |  SELECT u AS a, v AS b FROM e
        |  UNION ALL SELECT v AS a, u AS b FROM e),
        |bfs(node, dpt) AS (
        |  SELECT (SELECT MIN(u) FROM e) AS node, 0 AS dpt
        |  UNION
        |  SELECT ud.b, bfs.dpt + 1
        |  FROM bfs JOIN ud ON ud.a = bfs.node
        |  WHERE bfs.dpt < $bfsDepth),
        |m AS (SELECT node, MIN(dpt) AS d FROM bfs GROUP BY 1)
        |SELECT d, COUNT(*) AS n_nodes FROM m GROUP BY 1 ORDER BY 1"""
        .stripMargin,
    // the three iterations unrolled as CTEs — integer micro-unit
    // ranks make the lattice identical in both engines
    "q29_pagerank" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
        |d AS (
        |  SELECT u AS src, v AS dst FROM e
        |  UNION ALL SELECT v AS src, u AS dst FROM e),
        |deg AS (SELECT src, COUNT(*) AS deg FROM d GROUP BY 1),
        |r0 AS (SELECT src AS n, deg, CAST(1000000 AS BIGINT) AS r
        |  FROM deg),
        |c1 AS (SELECT d.dst AS n, SUM(r0.r // r0.deg) AS s
        |  FROM d JOIN r0 ON r0.n = d.src GROUP BY 1),
        |r1 AS (SELECT deg.src AS n, deg.deg,
        |    CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
        |  FROM deg LEFT JOIN c1 ON c1.n = deg.src),
        |c2 AS (SELECT d.dst AS n, SUM(r1.r // r1.deg) AS s
        |  FROM d JOIN r1 ON r1.n = d.src GROUP BY 1),
        |r2 AS (SELECT deg.src AS n, deg.deg,
        |    CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
        |  FROM deg LEFT JOIN c2 ON c2.n = deg.src),
        |c3 AS (SELECT d.dst AS n, SUM(r2.r // r2.deg) AS s
        |  FROM d JOIN r2 ON r2.n = d.src GROUP BY 1),
        |r3 AS (SELECT deg.src AS n, deg.deg,
        |    CAST(150000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
        |  FROM deg LEFT JOIN c3 ON c3.n = deg.src)
        |SELECT n AS part, deg AS degree, r AS rank_micro
        |FROM r3 ORDER BY r DESC, n LIMIT 20""".stripMargin,
    // naive id-ordered triple join — the SPEC the degree-ordered
    // node-iterator must agree with
    "q28_triangle_count" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (
        |  SELECT n, COUNT(*) AS d FROM (
        |    SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        |  GROUP BY 1),
        |tri AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        |shape AS (SELECT COUNT(*) AS n_edges FROM e),
        |nodes AS (
        |  SELECT COUNT(*) AS n_nodes,
        |    CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
        |  FROM deg)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  CAST(n_triangles AS DOUBLE) * 3.0 / CAST(n_wedges AS DOUBLE)
        |    AS transitivity
        |FROM nodes, shape, tri""".stripMargin,
    "q27_basket_affinity" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |tot AS (
        |  SELECT CAST(COUNT(DISTINCT ok) AS DOUBLE) AS n_baskets FROM items),
        |supp AS (SELECT pk, COUNT(*) AS n_item FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_pair
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT p.part_a, p.part_b, p.n_pair,
        |  sa.n_item AS n_a, sb.n_item AS n_b,
        |  CAST(p.n_pair AS DOUBLE) * n_baskets
        |    / (CAST(sa.n_item AS DOUBLE) * CAST(sb.n_item AS DOUBLE))
        |    AS lift
        |FROM pairs p
        |JOIN supp sa ON p.part_a = sa.pk
        |JOIN supp sb ON p.part_b = sb.pk
        |CROSS JOIN tot
        |ORDER BY p.n_pair DESC, p.part_a, p.part_b LIMIT 20""".stripMargin,
    // the oracle walks the same heap top-down with a REAL recursive
    // CTE — BigQuery's spelling — so the pointer-doubling loop is
    // checked against the textbook semantics, not against itself
    "q26_hierarchy_flatten" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT)
        |    AS id FROM customer),
        |walk AS (
        |  SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS depth
        |  UNION ALL
        |  SELECT n.id, w.depth + 1
        |  FROM nodes n JOIN walk w ON n.id // 2 = w.id
        |  WHERE n.id > 1)
        |SELECT depth, COUNT(*) AS n_nodes,
        |  CAST(SUM(id) AS BIGINT) AS id_sum,
        |  MIN(id) AS min_id, MAX(id) AS max_id
        |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB's native ASOF JOIN vs graft's native AsOfJoinExec — the
    // same operator, two engines, value-for-value
    "q24_asof_native" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS t FROM events
        |  WHERE event_type = 'purchase'),
        |s AS (
        |  SELECT DISTINCT user_id AS s_user, epoch_us(ts) AS s_t
        |  FROM events WHERE event_type = 'signup'),
        |j AS (
        |  SELECT p.t, s.s_t FROM p ASOF LEFT JOIN s
        |    ON p.user_id = s.s_user AND p.t >= s.s_t)
        |SELECT COUNT(*) AS n_purchases,
        |  COUNT(s_t) AS n_matched,
        |  CAST(SUM(CASE WHEN s_t IS NOT NULL THEN (t - s_t) // 1000000
        |    ELSE 0 END) AS BIGINT) AS sum_gap_seconds
        |FROM j""".stripMargin,
    "q18_sql_entry" -> sqlEntryText, // the SAME text both engines run
    "q21_correlated_subquery" -> correlatedSubqueryText, // ditto
    "q32_agg_semi_join" -> aggSemiJoinText, // ditto (one shared string)
    "q22_star_join" ->
      s"""SELECT r.r_name, o.o_orderpriority,
         |  COUNT(*) AS n_lines,
         |  ROUND(${T.oRevenueSum("l.l_extendedprice", "l.l_discount")}, 2)
         |    AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE r.r_name <> 'EUROPE'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q17_asof_scd2" ->
      s"""WITH e AS (SELECT unnest([0, 1, 2, 3]) AS epoch),
         |epochs AS (
         |  SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
         |    CAST(epoch * 3 + 1 AS BIGINT) AS vfrom,
         |    CAST(epoch * 3 + 4 AS BIGINT) AS vto,
         |    CAST((n_nationkey + epoch) % 5 AS BIGINT) AS price_tier
         |  FROM nation CROSS JOIN e),
         |f AS (
         |  SELECT CAST(month(o_orderdate) AS BIGINT) AS m,
         |    o_totalprice, CAST(c_nationkey AS BIGINT) AS nationkey
         |  FROM orders JOIN customer ON o_custkey = c_custkey)
         |SELECT price_tier, COUNT(*) AS n_orders,
         |  ROUND(${T.oMoneySum("o_totalprice")}, 2) AS revenue
         |FROM f JOIN epochs ON f.nationkey = epochs.nationkey
         |  AND m >= vfrom AND m < vto
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q01_revenue_by_nation" ->
      s"""SELECT n_name, COUNT(*) AS trip_count,
         |  ROUND(${T.oRevenueSum("l_extendedprice", "l_discount")}, 2)
         |    AS total_revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name HAVING COUNT(*) > 10
         |ORDER BY total_revenue DESC, n_name LIMIT 10""".stripMargin,
    "q12_prepost_compare" ->
      s"""SELECT n_name AS nation_name,
         |  CAST(SUM(CASE WHEN year(o_orderdate) < 1999 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS pre_orders,
         |  ROUND(CAST(SUM(CASE WHEN year(o_orderdate) < 1999
         |    THEN ${T.oDec2("o_totalprice")} END) AS DOUBLE), 2)
         |    AS pre_revenue,
         |  CAST(SUM(CASE WHEN year(o_orderdate) >= 1999 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS post_orders,
         |  ROUND(CAST(SUM(CASE WHEN year(o_orderdate) >= 1999
         |    THEN ${T.oDec2("o_totalprice")} END) AS DOUBLE), 2)
         |    AS post_revenue,
         |  ROUND(ROUND(CAST(SUM(CASE WHEN year(o_orderdate) >= 1999
         |      THEN ${T.oDec2("o_totalprice")} END) AS DOUBLE), 2)
         |    - ROUND(CAST(SUM(CASE WHEN year(o_orderdate) < 1999
         |      THEN ${T.oDec2("o_totalprice")} END) AS DOUBLE), 2), 2)
         |    AS revenue_delta
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_left_join_expr" ->
      s"""SELECT d, n_orders,
         |  COALESCE(n_ships, 0) AS n_ships,
         |  COALESCE(ship_revenue, 0.0) AS ship_revenue
         |FROM (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
         |      FROM orders GROUP BY 1) a
         |LEFT JOIN (SELECT CAST(l_shipdate AS DATE) AS d2,
         |        COUNT(*) AS n_ships,
         |        ROUND(${T.oMoneySum("l_extendedprice")}, 2) AS ship_revenue
         |      FROM lineitem GROUP BY 1) b ON a.d = b.d2
         |ORDER BY d""".stripMargin,
    "q14_semi_join" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_lines,
         |  ROUND(${T.oMoneySum("l_extendedprice")}, 2) AS revenue
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
         |                     WHERE o_orderpriority = '1-URGENT')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_full_outer" ->
      """WITH od AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |ed AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT COALESCE(od.day, ed.day) AS day,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(n_events, 0) AS n_events,
        |  CASE WHEN n_orders IS NULL THEN 'events_only'
        |       WHEN n_events IS NULL THEN 'orders_only'
        |       ELSE 'both' END AS presence
        |FROM od FULL OUTER JOIN ed ON od.day = ed.day
        |ORDER BY 1""".stripMargin,
    "q15_rank_join" ->
      s"""WITH bysupp AS (
         |  SELECT l_suppkey,
         |    ROUND(${T.oRevenueSum("l_extendedprice", "l_discount")}, 2)
         |      AS supp_revenue
         |  FROM lineitem GROUP BY 1),
         |ranked AS (
         |  SELECT l_suppkey, supp_revenue,
         |    RANK() OVER (ORDER BY supp_revenue DESC, l_suppkey)
         |      AS revenue_rank
         |  FROM bysupp)
         |SELECT revenue_rank, s_name, supp_revenue
         |FROM ranked JOIN supplier ON l_suppkey = s_suppkey
         |WHERE revenue_rank <= 5 ORDER BY revenue_rank""".stripMargin,
    "q16_merge_upsert" ->
      s"""WITH source AS (
         |  SELECT o_orderkey AS src_key,
         |    CAST(ROUND(${T.oDec2("o_totalprice")} * CAST(1.05 AS DECIMAL(3,2)), 2)
         |      AS DOUBLE) AS corrected_price
         |  FROM orders WHERE o_orderpriority = '1-URGENT'),
         |merged AS (
         |  SELECT o_orderstatus,
         |    ROUND(COALESCE(corrected_price, o_totalprice), 2)
         |      AS total_price,
         |    CASE WHEN corrected_price IS NOT NULL THEN 'updated'
         |         ELSE 'unchanged' END AS merge_action
         |  FROM orders LEFT JOIN source ON o_orderkey = src_key)
         |SELECT o_orderstatus, merge_action, COUNT(*) AS n_rows,
         |  ROUND(${T.oMoneySum("total_price")}, 2) AS sum_price
         |FROM merged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
