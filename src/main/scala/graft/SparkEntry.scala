package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{EventOps, RelationalOps}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is a deterministic DataFrame plan over the
  * harness parquet tables; every entry in `oracleSql` is the equivalent
  * ANSI SQL for the DuckDB oracle. Column names and types are aligned on
  * both sides (aggregates aliased identically; integer-typed columns cast
  * to BIGINT on whichever side needs it). Double-valued aggregates are
  * computed via exact decimal sums (graft.functions.ExactNum) so results
  * are bit-identical regardless of accumulation order — i.e. reproducible
  * on one thread or a thousand executors.
  */
object SparkEntry {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    RelationalOps.revenueByNation(
      t(spark, dir, "lineitem"), t(spark, dir, "orders"),
      t(spark, dir, "customer"), t(spark, dir, "supplier"),
      t(spark, dir, "nation"), t(spark, dir, "region"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> ((s, d) =>
      RelationalOps.pricingSummary(t(s, d, "lineitem"), "2000-09-02")),
    "q02_filter_project" -> ((s, d) =>
      RelationalOps.filterProject(t(s, d, "lineitem"))),
    "q03_topk_orders" -> ((s, d) =>
      RelationalOps.topKOrders(t(s, d, "orders"), 10)),
    "q04_revenue_by_segment" -> ((s, d) =>
      RelationalOps.revenueBySegment(t(s, d, "orders"), t(s, d, "customer"))),
    "q05_revenue_by_nation" -> ((s, d) =>
      RelationalOps.revenueByNation(t(s, d, "lineitem"), t(s, d, "orders"),
        t(s, d, "customer"), t(s, d, "supplier"), t(s, d, "nation"),
        t(s, d, "region"))),
    "q06_part_stats" -> ((s, d) =>
      RelationalOps.filteredPartStats(t(s, d, "part"), "STAND")),
    "q07_distinct_customers" -> ((s, d) =>
      RelationalOps.distinctCustomersByStatus(t(s, d, "orders"))),
    "q08_top_orders_per_customer" -> ((s, d) =>
      RelationalOps.topOrdersPerCustomer(t(s, d, "orders"), 2)),
    "q09_customers_with_orders" -> ((s, d) =>
      RelationalOps.customersWithOrders(t(s, d, "customer"), t(s, d, "orders"))),
    "q10_customers_without_urgent" -> ((s, d) =>
      RelationalOps.customersWithoutUrgentOrders(t(s, d, "customer"),
        t(s, d, "orders"))),
    "q11_stats_report" -> ((s, d) =>
      RelationalOps.statsReport(t(s, d, "orders"), t(s, d, "customer"),
        t(s, d, "lineitem"))),
    "q12_order_date_buckets" -> ((s, d) =>
      RelationalOps.orderDateBuckets(t(s, d, "orders"))),
    "q13_priority_tiers" -> ((s, d) =>
      RelationalOps.priorityTiers(t(s, d, "orders"))),
    "q14_rollup_status_priority" -> ((s, d) =>
      RelationalOps.rollupStatusPriority(t(s, d, "orders"))),
    "q15_customers_both_years" -> ((s, d) =>
      RelationalOps.customersBothYears(t(s, d, "orders"))),
    "q16_customers_1996_only" -> ((s, d) =>
      RelationalOps.customers1996Only(t(s, d, "orders"))),
    "q17_big_spenders" -> ((s, d) =>
      RelationalOps.bigSpenders(t(s, d, "orders"), 2000000.0)),
    "q18_customer_labels" -> ((s, d) =>
      RelationalOps.customerLabels(t(s, d, "customer"), t(s, d, "nation"))),
    "q19_monthly_event_counts" -> ((s, d) =>
      EventOps.monthlyEventCounts(t(s, d, "events"))),
    "q20_hourly_event_counts" -> ((s, d) =>
      EventOps.hourlyEventCounts(t(s, d, "events"))),
    "q21_sessionize" -> ((s, d) =>
      EventOps.sessionize(t(s, d, "events"))),
    "q22_running_user_totals" -> ((s, d) =>
      EventOps.runningUserTotals(t(s, d, "events"))),
    "q23_user_event_matrix" -> ((s, d) =>
      EventOps.userEventTypeMatrix(t(s, d, "events"))),
    // Sketch-based variant of q07: engine-specific values, rows-only check.
    "x01_approx_distinct_customers" -> ((s, d) =>
      RelationalOps.approxDistinctCustomersByStatus(t(s, d, "orders"))),
  )

  // DuckDB-exactness conventions used below:
  //  * money sums: CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) — exact,
  //    order-independent, matches ExactNum.dsum bit-for-bit;
  //  * products: DECIMAL(12,2) * (1 +/- DECIMAL(4,2)) keeps both engines
  //    inside 38 digits (no precision-loss rescaling);
  //  * DuckDB sum(INTEGER) returns HUGEINT → always CAST AS BIGINT;
  //  * DuckDB year()/row_number() return BIGINT → Spark side casts to long;
  //  * ORDER BY uses NULLS FIRST to match Spark's asc default.
  private val SUM_DISC =
    "sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST($SUM_DISC AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-03-01'
           AND l_shipdate < TIMESTAMP '1996-06-01' AND l_quantity > 45
         ORDER BY l_orderkey, l_linenumber""",
    "q03_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q04_revenue_by_segment" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q05_revenue_by_nation" ->
      s"""SELECT n_name, CAST($SUM_DISC AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q06_part_stats" ->
      """SELECT count(*) AS n_parts,
         CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_retail
         FROM part WHERE p_type LIKE 'STAND%'""",
    "q07_distinct_customers" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
         count(*) AS n_orders
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q08_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn""",
    "q09_customers_with_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q10_customers_without_urgent" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q11_stats_report" ->
      """SELECT * FROM (
           SELECT 'total_orders' AS metric, count(*) AS value FROM orders
           UNION ALL
           SELECT 'total_customers' AS metric, count(*) AS value FROM customer
           UNION ALL
           SELECT 'total_lineitems' AS metric, count(*) AS value FROM lineitem)
         ORDER BY metric""",
    "q12_order_date_buckets" ->
      """SELECT count(*) AS total_orders,
         count(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 END) AS since_1998,
         count(CASE WHEN o_orderdate >= TIMESTAMP '2000-01-01' THEN 1 END) AS since_2000,
         count(DISTINCT o_custkey) AS unique_customers,
         max(o_orderdate) AS latest_order,
         min(o_orderdate) AS earliest_order
         FROM orders""",
    "q13_priority_tiers" ->
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                ELSE 'low' END AS tier,
         count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM orders GROUP BY 1 ORDER BY tier""",
    "q14_rollup_status_priority" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders
         GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q15_customers_both_years" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
         ORDER BY o_custkey""",
    "q16_customers_1996_only" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
         ORDER BY o_custkey""",
    "q17_big_spenders" ->
      """SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent,
         count(*) AS n_orders
         FROM orders GROUP BY o_custkey
         HAVING CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > 2000000.0
         ORDER BY o_custkey""",
    "q18_customer_labels" ->
      """SELECT c_custkey,
         concat_ws(', ', trim(c_name), upper(n_name)) AS label,
         substring(c_name, 1, 8) AS name_prefix,
         (c_name LIKE 'Customer%') AS is_customer
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_custkey""",
    "q19_monthly_event_counts" ->
      """SELECT CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2, 3 ORDER BY y, m, event_type""",
    "q20_hourly_event_counts" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
         event_type, count(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "q21_sessionize" ->
      """WITH d AS (
           SELECT user_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
         FROM d GROUP BY user_id ORDER BY user_id""",
    "q22_running_user_totals" ->
      """SELECT user_id, event_id,
         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_value
         FROM events ORDER BY user_id, event_id""",
    "q23_user_event_matrix" ->
      """SELECT user_id,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
         count(CASE WHEN event_type = 'view' THEN 1 END) AS views,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
         count(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
         count(CASE WHEN event_type = 'error' THEN 1 END) AS errors
         FROM events GROUP BY user_id ORDER BY user_id""",
  ).map { case (k, v) => k -> v.stripMargin.replaceAll("\\s+", " ").trim }
}
