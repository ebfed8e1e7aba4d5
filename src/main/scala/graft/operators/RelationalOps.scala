package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.ExactNum._

/** Core relational operators, expressed as declarative DataFrame plans so
  * Catalyst owns optimization (pushdown, pruning, join selection, AQE).
  *
  * Scale notes (100 TB design):
  *  - aggregations are hash-based with map-side partial aggregation — the
  *    shuffle carries one row per (group, partition), not per input row;
  *  - dimension joins broadcast explicitly (`broadcast(dim)`), so the fact
  *    table never shuffles for them;
  *  - top-k uses orderBy+limit which Catalyst plans as
  *    TakeOrderedAndProject: per-partition heaps + a k-row merge on the
  *    driver, never a global sort;
  *  - every output carries a deterministic total order for verification;
  *    on a production run the final orderBy is the only optional stage.
  */
object RelationalOps {

  /** TPC-H Q1-shaped pricing summary (SURVEY §2.5 A1/A2: multi-aggregate).
    * Exact-decimal sums so the result is order-independent at any
    * parallelism. */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumDisc(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        dsumDiscTax(col("l_extendedprice"), col("l_discount"), col("l_tax"))
          .as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Filter + projection (SURVEY §2.3 F3/F5, §2.2 P8). Both predicates and
    * the 4-column projection reach the parquet scan (PushedFilters /
    * ReadSchema) — at 100 TB this reads a fraction of the table bytes. */
  def filterProject(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-06-01").cast("timestamp") &&
        col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Top-k by value (SURVEY §2.6 O1/O2) → TakeOrderedAndProject. */
  def topKOrders(orders: DataFrame, k: Int): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** Dimension join + group-by (SURVEY §2.10 joins, §2.5 A2). customer is
    * NOT force-broadcast: at 100 TB the customer table is far beyond
    * broadcast limits, so the join strategy is left to Catalyst/AQE —
    * which broadcasts it at small SFs (runtime size stats) and falls back
    * to a shuffle join when it is genuinely large. */
  def revenueBySegment(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_revenue"))
      .orderBy(col("c_mktsegment"))

  /** Multi-way star join (TPC-H Q5 shape). Only the genuinely tiny
    * dimensions (nation 25 rows, region 5; supplier = smallest big-table
    * side) are force-broadcast. customer is NOT: at 100 TB it exceeds any
    * broadcast limit, so customer joins by whatever strategy AQE picks
    * from runtime sizes (broadcast at small SFs, shuffle at scale). The
    * final group-by on n_name (25 groups) is the only tiny shuffle. */
  def revenueByNation(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame = {
    val dims = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    lineitem
      .join(orders.filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(dims,
        col("o_custkey") === col("c_custkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsumDisc(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** LIKE-filtered count + sum (SURVEY §2.3 F5, §2.5 A3). */
  def filteredPartStats(part: DataFrame, typePrefix: String): DataFrame =
    part
      .filter(col("p_type").like(s"$typePrefix%"))
      .agg(count(lit(1)).as("n_parts"),
        dsum(col("p_retailprice")).as("total_retail"))

  /** Exact count-distinct per group (SURVEY §2.5 A4). At 100 TB prefer the
    * approxCountDistinct variant below (single-pass HLL, no per-key state). */
  def distinctCustomersByStatus(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  /** HLL-sketch variant — constant memory per group, one shuffle; the
    * 100 TB answer to A4. No oracle (sketch values are engine-specific). */
  def approxDistinctCustomersByStatus(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.01).as("n_customers"))
      .orderBy(col("o_orderstatus"))

  /** Per-group top-n via window row_number (SURVEY §2.10 windows; same plan
    * shape as first-wins dedup D1). */
  def topOrdersPerCustomer(orders: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Semi join: customers having at least one order (EXISTS). The semi join
    * shuffles only the key column of the probe side. */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.select(col("o_custkey")),
        customer("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Anti join: customers with no URGENT order (NOT EXISTS) — the same plan
    * shape that computes the "inserted" set of the reference's upsert
    * (D2/D3). The filter on the build side happens before the join, so the
    * anti join probes a much smaller set. */
  def customersWithoutUrgentOrders(customer: DataFrame,
      orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        customer("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** UNION ALL metric report (SURVEY §2.5 A6 / monitor.sh). */
  def statsReport(orders: DataFrame, customer: DataFrame,
      lineitem: DataFrame): DataFrame = {
    def one(metric: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast(LongType).as("value"))
        .select(lit(metric).as("metric"), col("value"))
    one("total_orders", orders)
      .unionByName(one("total_customers", customer))
      .unionByName(one("total_lineitems", lineitem))
      .orderBy(col("metric"))
  }

  /** Conditional counts in one pass (SURVEY §2.3 F4 / job_statistics):
    * count(CASE WHEN ...) buckets — one scan, no self-joins. */
  def orderDateBuckets(orders: DataFrame): DataFrame =
    orders.agg(
      count(lit(1)).as("total_orders"),
      count(when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"), 1))
        .as("since_1998"),
      count(when(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"), 1))
        .as("since_2000"),
      countDistinct(col("o_custkey")).as("unique_customers"),
      max(col("o_orderdate")).as("latest_order"),
      min(col("o_orderdate")).as("earliest_order"))

  /** CASE expression projection + group-by (SURVEY §2.8 scalar exprs). */
  def priorityTiers(orders: DataFrame): DataFrame =
    orders
      .withColumn("tier",
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
          .when(col("o_orderpriority") === "3-MEDIUM", "medium")
          .otherwise("low"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("tier"))

  /** ROLLUP aggregate (beyond the reference; SURVEY §2.10). */
  def rollupStatusPriority(orders: DataFrame): DataFrame =
    orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** INTERSECT: customers ordering in both years (SURVEY §2.7 gap). */
  def customersBothYears(orders: DataFrame): DataFrame = {
    def keys(y: Int) = orders
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey"))
    keys(1996).intersect(keys(1997)).orderBy(col("o_custkey"))
  }

  /** EXCEPT: customers ordering in 1996 but not 1997. */
  def customers1996Only(orders: DataFrame): DataFrame = {
    def keys(y: Int) = orders
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey"))
    keys(1996).except(keys(1997)).orderBy(col("o_custkey"))
  }

  /** GROUP BY ... HAVING (filter over aggregates). */
  def bigSpenders(orders: DataFrame, minTotal: Double): DataFrame =
    orders
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("spent"),
        count(lit(1)).as("n_orders"))
      .filter(col("spent") > minTotal)
      .orderBy(col("o_custkey"))

  /** String-function projection (SURVEY §2.8: trim/concat_ws/substring/
    * upper/like) over a broadcast join. */
  def customerLabels(customer: DataFrame, nation: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("c_custkey"),
        concat_ws(", ", trim(col("c_name")), upper(col("n_name")))
          .as("label"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        col("c_name").like("Customer%").as("is_customer"))
      .orderBy(col("c_custkey"))

  /** Exact interpolated quantiles (single-pass sort-based aggregate).
    * At 100 TB use approx_percentile (t-digest sketch) — exact quantiles
    * need the full sorted distribution per group. */
  def orderPriceQuantiles(orders: DataFrame): DataFrame =
    orders.agg(
      percentile(col("o_totalprice"), lit(0.25)).as("p25"),
      percentile(col("o_totalprice"), lit(0.5)).as("p50"),
      percentile(col("o_totalprice"), lit(0.75)).as("p75"),
      percentile(col("o_totalprice"), lit(0.9)).as("p90"))

  /** Approximate quantiles — the 100 TB form of orderPriceQuantiles:
    * percentile_approx's mergeable sketch holds O(accuracy) values per
    * partition instead of buffering the full distribution, with rank
    * error ≤ 1/accuracy. Same column shape as the exact query (x07 sits
    * beside q32 exactly as the HLL x01 sits beside q07); QueriesSpec
    * pins the approx-vs-exact relative error. */
  def orderPriceQuantilesApprox(orders: DataFrame,
      accuracy: Int = 10000): DataFrame =
    orders.agg(
      percentile_approx(col("o_totalprice"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.9)),
        lit(accuracy)).as("_q"))
      .select(col("_q")(0).as("p25"), col("_q")(1).as("p50"),
        col("_q")(2).as("p75"), col("_q")(3).as("p90"))

  /** x41: quantile-sketch accuracy self-evaluation — the x31/x34
    * measure-your-own-approximation discipline applied to the x07
    * sketch: exact and percentile_approx quantiles computed SIDE BY
    * SIDE at an accuracy sweep, reporting the relative error per
    * (accuracy, quantile). The table that justifies the documented
    * "swap exact percentile for the sketch at 100 TB" advice with
    * numbers instead of faith: rank error is ≤ 1/accuracy by
    * construction, and this reports what that means in VALUE terms
    * on the actual distribution.
    *
    * Engine-seeded (sketch results depend on partition merge order)
    * → rows-only; error bounds and the within-[min,max] property are
    * pinned in QueriesSpec.
    *
    * Scale shape: ONE aggregate computes every exact and sketch
    * column (the exact side is the sf-scale correctness anchor; at
    * real scale you'd run the sweep sketch-only); the explode +
    * error arithmetic run on |accuracies|·|quantiles| metadata. */
  def quantileSketchEval(orders: DataFrame,
      accuracies: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    require(accuracies.nonEmpty, "need at least one accuracy")
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val fr = array(qs.map(lit): _*)
    val agg = orders.agg(
      percentile(col("o_totalprice"), fr).as("_ex"),
      accuracies.map(a =>
        percentile_approx(col("o_totalprice").cast("double"), fr,
          lit(a)).as(s"_ap_$a")): _*)
    agg.select(explode(array(accuracies.flatMap(a =>
      qs.zipWithIndex.map { case (q, i) =>
        struct(lit(a.toLong).as("accuracy"), lit(q).as("quantile"),
          col("_ex").getItem(i).as("exact"),
          col(s"_ap_$a").getItem(i).cast("double").as("approx"))
      }): _*)).as("_s"))
      .select(col("_s.*"))
      .withColumn("rel_err",
        round(abs(col("approx") - col("exact")) / col("exact"), 12))
      .orderBy(col("accuracy"), col("quantile"))
  }

  /** CUBE: all 4 grouping combinations in one pass (Expand + hash agg —
    * the input is read once and expanded 4×, not re-scanned). */
  def cubeStatusPriority(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** GROUPING SETS (status totals + priority totals, no cross). */
  def groupingSetsStatusPriority(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** percent_rank + ntile within segment (SURVEY §2.10 windows). */
  def customerBalanceRanks(customer: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    customer.select(
      col("c_custkey"), col("c_mktsegment"),
      percent_rank().over(w).as("bal_pct_rank"),
      ntile(4).over(w).cast("long").as("bal_quartile"))
      .orderBy(col("c_custkey"))
  }

  /** Key-equality lookup (SURVEY §2.3 F6: WHERE position_uri = ?). A
    * point predicate on the natural key: pushed into the parquet scan
    * (PushedFilters), and the access-path story at 100 TB is layout —
    * partition/bucket by the key (Layout.writeBucketed) so the scan
    * touches one bucket, the columnar analogue of the reference's btree
    * index on position_uri (init.sql:25). */
  def lookupByKey(df: DataFrame, keyCol: String, value: Long): DataFrame =
    df.filter(col(keyCol) === lit(value)).orderBy(col(keyCol))

  /** Correlated comparison via window (the scalable form of the
    * correlated scalar subquery "orders above their customer's
    * average"): one shuffle on the key; the per-key average is an
    * exact-decimal sum over the window divided once — deterministic at
    * any parallelism. */
  def ordersAboveCustomerAvg(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    val avgSpent = sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
      .cast("double") / count(lit(1)).over(w)
    orders
      .withColumn("_avg", avgSpent)
      .filter(col("o_totalprice") > col("_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("_avg").as("cust_avg"))
      .orderBy(col("o_orderkey"))
  }

  /** Exact join-cardinality report WITHOUT materializing the join:
    * |A ⋈ B| = Σ_k cntA(k)·cntB(k) over per-key counts — the planner
    * pre-flight that decides whether a 100 TB join is even runnable
    * (and whether its output needs repartitioning) before any
    * fact-sized shuffle of payload columns happens.
    *
    * Scale shape: two key-only scans partial-aggregate to
    * key-cardinality-sized count tables; the join and final sum run
    * over counts, never rows. Exact integers throughout. */
  def joinCardinality(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val a = left.groupBy(col(leftKey).as("k"))
      .agg(count(lit(1)).as("n_a"))
    val b = right.groupBy(col(rightKey).as("k"))
      .agg(count(lit(1)).as("n_b"))
    a.join(b, "k")
      .agg(count(lit(1)).as("n_matching_keys"),
        sum(col("n_a") * col("n_b")).cast("long").as("join_rows"))
  }

  /** Foreign-key orphan audit: for each (child, fk) → (parent, pk)
    * relation, the child rows whose key has no parent — the
    * referential-integrity report an ingest runs before anything joins
    * (an orphaned fact row silently vanishes from every inner join
    * downstream; better to count them once here). Parent keys are
    * DISTINCTed before the probe: dirty data is this audit's premise,
    * and a duplicated "primary" key must not double-count child rows.
    *
    * Scale shape: per relation, one left join keyed on the fk (both
    * sides key-only — nothing wider than the key shuffles) folded
    * into a single accounting row; relations union to a bounded
    * report. The bloom pre-probe (bloomSemiJoinReport's pattern)
    * composes in front when the parent is far smaller than the
    * child. */
  def fkOrphanAudit(
      relations: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(relations.nonEmpty, "need at least one relation")
    relations.map { case (name, child, fk, parent, pk) =>
      child.select(col(fk).as("_k"))
        .join(parent.select(col(pk).as("_k")).distinct()
          .withColumn("_p", lit(1L)), Seq("_k"), "left")
        .agg(count(lit(1)).as("n_child"),
          count(when(col("_p").isNull, lit(1))).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_child"),
          col("n_orphans"),
          (col("n_orphans").cast("double") /
            col("n_child").cast("double")).as("orphan_rate"))
    }.reduce(_.unionByName(_)).orderBy(col("relation"))
  }

  /** Bloom-filtered semi-join report: the runtime-filter pattern that
    * makes selective fact⋈dim joins survive 100 TB — build a bloom
    * over the (filtered) dim keys as a scalar subquery, probe it
    * MAP-SIDE on the fact scan, and never shuffle fact rows that
    * cannot match. Reports kept-row counts for the bloom probe vs the
    * exact semi-join, so the false-positive overhead is measured, not
    * assumed (one-sided error: bloom_kept ⊇ exact_kept always).
    *
    * The report is the x-entry; the PATTERN (probe-then-exact-join)
    * is what a user lifts: `fact.filter(might_contain(bloom, key))`
    * composes in front of any join in this library. */
  def bloomSemiJoinReport(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23)
      : DataFrame = {
    val bloom = dim
      .agg(graft.functions.GraftFunctions.bloomAgg(col(dimKey),
        expectedItems, numBits).as("_bf"))
      .scalar()
    val kept = fact.filter(
      graft.functions.GraftFunctions.bloomMightContain(bloom,
        col(factKey)))
    val exact = fact.join(dim.select(col(dimKey).as(factKey)).distinct(),
      Seq(factKey), "left_semi")
    kept.agg(count(lit(1)).as("bloom_kept"))
      .crossJoin(exact.agg(count(lit(1)).as("exact_kept")))
      .crossJoin(fact.agg(count(lit(1)).as("fact_rows")))
      .select(col("fact_rows"), col("exact_kept"), col("bloom_kept"),
        ((col("bloom_kept") - col("exact_kept")).cast("double") /
          greatest(col("fact_rows") - col("exact_kept"), lit(1L)))
          .as("false_pos_rate"))
  }

  /** Ratio-to-report (contribution analysis): each nation's revenue
    * share of the total — the share denominator is an unpartitioned
    * window SUM over the ALREADY-AGGREGATED per-nation table (25
    * rows), so the "global window" anti-pattern never touches
    * data-sized input. Exact decimal sums; one share division each. */
  def revenueShareByNation(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame): DataFrame = {
    val perNation = lineitem
      .join(supplier.select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey")), "l_suppkey")
      .join(broadcast(nation.select(col("n_nationkey").as("s_nationkey"),
        col("n_name"))), "s_nationkey")
      .groupBy(col("n_name"))
      // keep the DECIMAL: the share denominator window-sums it
      // exactly (a double window-sum would be order-dependent)
      .agg(sum(dec2(col("l_extendedprice"))).as("_rd"))
    val w = Window.partitionBy()
    perNation
      .select(col("n_name"), col("_rd").cast("double").as("revenue"),
        round(col("_rd").cast("double") /
          sum(col("_rd")).over(w).cast("double"), 12).as("share"))
      .orderBy(col("n_name"))
  }

  /** Percent-of-parent hierarchical shares: customer revenue per
    * (region, nation) with each nation's share of its region AND of
    * the grand total — the two-level contribution drill-down (q99 is
    * the single-level form). Both share denominators window-sum the
    * exact DECIMAL over the 25-row aggregate (never the fact table,
    * never order-dependent doubles); division to double happens once
    * per row at the end.
    *
    * Scale shape: one fact-table aggregate on a 25-key bounded group;
    * dims broadcast; both share windows touch only post-aggregate
    * rows. */
  def revenueShareHierarchy(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val per = orders
      .select(col("o_custkey"), col("o_totalprice"))
      .join(customer.select(col("c_custkey").as("o_custkey"),
        col("c_nationkey")), "o_custkey")
      .join(broadcast(nation.select(
        col("n_nationkey").as("c_nationkey"), col("n_name"),
        col("n_regionkey"))), "c_nationkey")
      .join(broadcast(region.select(
        col("r_regionkey").as("n_regionkey"), col("r_name"))),
        "n_regionkey")
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec2(col("o_totalprice"))).as("_rd"))
    val wRegion = Window.partitionBy(col("r_name"))
    val wTotal = Window.partitionBy()
    per.select(col("r_name"), col("n_name"),
      col("_rd").cast("double").as("revenue"),
      round(col("_rd").cast("double") /
        sum(col("_rd")).over(wRegion).cast("double"), 12)
        .as("share_of_region"),
      round(col("_rd").cast("double") /
        sum(col("_rd")).over(wTotal).cast("double"), 12)
        .as("share_of_total"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Top-k WITH TIES: every order whose price RANK is within k — the
    * "show all tied rows" semantics a plain LIMIT cannot express
    * (FETCH FIRST k ROWS WITH TIES). A global rank window over the
    * fact table would serialize one reducer, so the kth price comes
    * from a TakeOrdered (k tiny rows), broadcasts back as a
    * pre-filter, and the rank window runs only over the ≥-threshold
    * survivors (k + ties rows). */
  def topOrdersWithTies(orders: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val kth = orders.select(col("o_totalprice"))
      .orderBy(col("o_totalprice").desc).limit(k)
      .agg(min(col("o_totalprice")).as("_kth"))
    val w = Window.orderBy(col("o_totalprice").desc)
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .crossJoin(broadcast(kth))
      .filter(col("o_totalprice") >= col("_kth"))
      .withColumn("price_rank", rank().over(w).cast("long"))
      .filter(col("price_rank") <= k)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("price_rank"))
      .orderBy(col("price_rank"), col("o_orderkey"))
  }

  /** Data-quality expectation report over the orders table: row count,
    * per-column null counts, duplicate-key count, and domain-violation
    * counts — the dbt-test / Deequ-style gate a pipeline runs before
    * publishing a snapshot. ONE scan computes every check (conditional
    * counts share the aggregate; the distinct adds its partial/final
    * expand), then the single wide row unpivots to the (check, value)
    * long form monitors ingest. */
  def dataQualityReport(orders: DataFrame): DataFrame = {
    val wide = orders.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("o_custkey").isNull, 1)).as("null_custkey"),
      count(when(col("o_orderdate").isNull, 1)).as("null_orderdate"),
      count(when(col("o_totalprice").isNull, 1)).as("null_totalprice"),
      (count(lit(1)) - countDistinct(col("o_orderkey")))
        .as("dup_orderkey"),
      count(when(col("o_totalprice") <= 0.0, 1)).as("nonpositive_price"),
      count(when(col("o_orderdate") > lit("1998-12-31").cast("date"), 1))
        .as("date_after_horizon"))
    wide.unpivot(Array.empty[org.apache.spark.sql.Column],
      wide.columns.map(col).toArray, "check", "value")
      .orderBy(col("check"))
  }

  /** NTILE binning + frame navigation (SURVEY §2.10 windows, the
    * remaining quartet: ntile / first_value / last_value / nth_value):
    * per market segment, customers binned into balance quartiles with
    * each quartile's boundary names. Windows are PARTITIONED by
    * segment, so they parallelize; a GLOBAL ntile would serialize one
    * reducer — at corpus scale, rank-binning becomes percentile
    * cutoffs (the x07 sketch) instead. */
  def segmentBalanceQuartiles(customer: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val wq = Window
      .partitionBy(col("c_mktsegment"), col("quartile"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    customer
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        col("quartile"),
        first(col("c_name")).over(wq).as("q_first_name"),
        last(col("c_name")).over(wq).as("q_last_name"))
      .orderBy(col("c_custkey"))
  }

  /** Pearson correlation from EXACT decimal moments (per return flag,
    * quantity vs extended price): n, Σx, Σy, Σxy, Σx², Σy² are
    * order-independent decimal sums; the correlation is then one fixed
    * IEEE double chain on identical inputs — deterministic at any
    * parallelism, where corr() over doubles is not. One scan, one
    * bounded-key shuffle. */
  def priceQuantityCorr(lineitem: DataFrame): DataFrame = {
    val x = col("l_quantity").cast(DecimalType(12, 2))
    val y = col("l_extendedprice").cast(DecimalType(12, 2))
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        sum(x * y).cast(DoubleType).as("sxy"),
        sum(x * x).cast(DoubleType).as("sxx"),
        sum(y * y).cast(DoubleType).as("syy"))
      .select(col("l_returnflag"), col("n"),
        // round(12): the exact decimal sums convert to double
        // correctly-rounded in the JVM but via a two-step int128 +
        // scale-divide in DuckDB — a last-ulp divergence the rounding
        // absorbs (corr ∈ [-1,1], noise ~1e-16)
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 12)
          .as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  /** String-function kitchen sink (SURVEY §2.8 extended): pad/translate/
    * regexp/reverse — all codegen'd built-ins, map-side. */
  def partLabels(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      lpad(col("p_brand"), 12, "*").as("brand_padded"),
      rpad(col("p_brand"), 16, ".").as("brand_rpadded"),
      translate(col("p_type"), "AEIOU", "aeiou").as("type_folded"),
      regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
      reverse(col("p_name")).as("name_rev"),
      length(col("p_name")).cast("long").as("name_len"))
      .orderBy(col("p_partkey"))

  /** Gini coefficient of per-customer revenue within each market
    * segment — the concentration audit a data-mix planner runs before
    * trusting a per-source quota (a segment where 1% of customers carry
    * 90% of revenue needs different treatment than a flat one).
    *
    * Formula: with per-key values x sorted ascending and 1-based rank i,
    * G = 2·Σ(i·x_i) / (n·Σx) − (n+1)/n. Ties in x make Σ(i·x_i)
    * invariant to tie order, so the statistic is deterministic; the
    * rank window still tie-breaks on the key for a stable plan.
    *
    * Scale shape: one join + partial-aggregated groupBy to per-customer
    * revenue (the only full-data shuffle), then a rank window and final
    * aggregate over key-cardinality data — at 100 TB the window runs
    * per-segment on the already-reduced per-customer frame, never the
    * fact table. All sums are exact DECIMAL; one double division per
    * segment at the end. */
  def revenueGiniBySegment(orders: DataFrame,
      customer: DataFrame): DataFrame = {
    val rev = orders
      .select(col("o_custkey"), col("o_totalprice"))
      .join(customer.select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment")), "o_custkey")
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).as("_rev"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("_rev"), col("o_custkey"))
    rev
      .select(col("c_mktsegment"), col("_rev"),
        row_number().over(w).cast(LongType).as("_i"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("_rev")).cast(DoubleType).as("total_revenue"),
        sum(col("_i") * col("_rev")).as("_iwx"),
        sum(col("_rev")).as("_sx"),
        max(col("_i")).as("_n"))
      .select(col("c_mktsegment"), col("n_customers"),
        col("total_revenue"),
        round(
          lit(2.0) * col("_iwx").cast(DoubleType) /
            (col("_n").cast(DoubleType) * col("_sx").cast(DoubleType)) -
            (col("_n") + 1).cast(DoubleType) / col("_n").cast(DoubleType),
          12).as("gini"))
      .orderBy(col("c_mktsegment"))
  }

  /** Longest streak of consecutive active months per customer — the
    * gaps-and-islands pattern (island id = month index − rank; runs of
    * consecutive months share one id). The engagement-continuity signal
    * behind churn features.
    *
    * Scale shape: DISTINCT (customer, month) partial-aggregates
    * map-side to ≤ #customers·#months rows; the rank window and both
    * follow-up aggregates run on that reduced frame, partitioned by
    * customer — no global window, no fact-table shuffle beyond the
    * first distinct. */
  def orderStreaks(orders: DataFrame): DataFrame = {
    val months = orders
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast(LongType).as("_m"))
      .distinct()
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("_m"))
    months
      .withColumn("_grp", col("_m") - row_number().over(w))
      .groupBy(col("o_custkey"), col("_grp"))
      .agg(count(lit(1)).as("_len"))
      .groupBy(col("o_custkey"))
      .agg(
        sum(col("_len")).cast(LongType).as("n_active_months"),
        max(col("_len")).cast(LongType).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy(col("o_custkey"))
  }

  /** Year-over-year revenue growth per nation: exact DECIMAL yearly
    * sums, a per-nation lag window over the ≤ #nations·#years aggregate
    * (never the fact table), one double division per row. First year's
    * growth is NULL by construction — and so is any year whose
    * PREDECESSOR year is absent from the data (the lag is gated on
    * yr − lag(yr) = 1): without the gate a gap year would silently
    * report "YoY" growth against a year 2+ earlier. */
  def yoyRevenueGrowth(orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val per = orders
      .select(col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast("int").as("yr"))
      .join(customer.select(col("c_custkey").as("o_custkey"),
        col("c_nationkey")), "o_custkey")
      .join(broadcast(nation.select(
        col("n_nationkey").as("c_nationkey"), col("n_name"))),
        "c_nationkey")
      .groupBy(col("n_name"), col("yr"))
      .agg(sum(dec2(col("o_totalprice"))).as("_rd"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("yr"))
    val adjacent = (col("yr") - lag(col("yr"), 1).over(w)) === 1
    val prev = when(adjacent, lag(col("_rd"), 1).over(w))
    per.select(col("n_name"), col("yr"),
      col("_rd").cast(DoubleType).as("revenue"),
      prev.cast(DoubleType).as("prev_revenue"),
      round((col("_rd") - prev).cast(DoubleType) /
        prev.cast(DoubleType), 12).as("yoy_growth"))
      .orderBy(col("n_name"), col("yr"))
  }

  /** Chi-square test of independence between market segment and order
    * priority — the "is this attribute informative or noise"
    * pre-flight for any stratified sampling plan. Builds the FULL
    * contingency table (absent combinations count as observed 0 via a
    * cross join of the two tiny category lists), computes expected
    * counts from row/column marginals, and folds Σ(O−E)²/E plus
    * Cramér's V into one row.
    *
    * Determinism: counts are exact; the double fold runs over
    * ≤ |segments|·|priorities| cells (round(6) absorbs the ~1e-13
    * summation-order noise between engines).
    *
    * Scale shape: the only full-data work is the join + groupBy count;
    * everything after operates on the category-cardinality-sized
    * contingency frame (windows included). */
  def chiSquareIndependence(orders: DataFrame,
      customer: DataFrame): DataFrame = {
    val joined = orders
      .select(col("o_custkey"), col("o_orderpriority").as("pri"))
      .join(customer.select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), "o_custkey")
      .select(col("seg"), col("pri"))
    val obs = joined.groupBy(col("seg"), col("pri"))
      .agg(count(lit(1)).as("_o"))
    // Tiny frames from here: the full category cross, zero-filled.
    val cells = obs.select(col("seg")).distinct()
      .crossJoin(broadcast(obs.select(col("pri")).distinct()))
      .join(obs, Seq("seg", "pri"), "left")
      .select(col("seg"), col("pri"),
        coalesce(col("_o"), lit(0L)).as("_o"))
    val rt = sum(col("_o")).over(Window.partitionBy(col("seg")))
    val ct = sum(col("_o")).over(Window.partitionBy(col("pri")))
    val n = sum(col("_o")).over(Window.partitionBy())
    val withE = cells.select(col("seg"), col("pri"), col("_o"), n.as("_n"),
      (rt.cast(DoubleType) * ct.cast(DoubleType) / n.cast(DoubleType))
        .as("_e"))
    val term = (col("_o").cast(DoubleType) - col("_e")) *
      (col("_o").cast(DoubleType) - col("_e")) / col("_e")
    withE
      .agg(
        max(col("_n")).cast(LongType).as("n_obs"),
        count(lit(1)).as("n_cells"),
        ((countDistinct(col("seg")) - 1) *
          (countDistinct(col("pri")) - 1)).cast(LongType).as("dof"),
        sum(term).as("_chi2"),
        least(countDistinct(col("seg")),
          countDistinct(col("pri"))).as("_minrc"))
      .select(col("n_obs"), col("n_cells"), col("dof"),
        round(col("_chi2"), 6).as("chi2"),
        // min(r,c)=1 ⟹ V's denominator is 0 (a single-category
        // attribute has no association to measure) — NULL, not the
        // engine-dependent NULL/Inf a 0-division would give
        when(col("_minrc") > 1,
          round(sqrt(col("_chi2") / (col("n_obs").cast(DoubleType) *
            (col("_minrc") - 1).cast(DoubleType))), 6))
          .as("cramers_v"))
  }

  /** Benford first-significant-digit profile of order totals — the
    * classic fabricated-data / corrupted-ingest detector. The first
    * digit is extracted EXACTLY (price → DECIMAL(18,2) → ×100 → BIGINT
    * → leading char), never via log10 of a double, so boundary values
    * (999.995…) can't flip digits between engines.
    *
    * Domain: strictly POSITIVE totals only (filtered up front) — a
    * negative value's leading '-' fails the digit cast and a zero
    * would hit log10(1+1/0), both engine-dependent degeneracies;
    * Benford's law is only defined over positive magnitudes anyway.
    *
    * Scale shape: map-side filter + digit extraction, a 9-group
    * aggregate, and share/expected-frequency arithmetic over the
    * 9-row result. */
  def benfordProfile(orders: DataFrame): DataFrame = {
    val digit = substring(
      (col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
        .cast(LongType).cast("string"), 1, 1).cast("int")
    val total = Window.partitionBy()
    orders
      .filter(col("o_totalprice") > 0)
      .select(digit.as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .select(col("digit"), col("n"),
        round(col("n").cast(DoubleType) /
          sum(col("n")).over(total).cast(DoubleType), 12).as("observed"),
        round(log10(lit(1.0) + lit(1.0) /
          col("digit").cast(DoubleType)), 12).as("expected"),
        round(col("n").cast(DoubleType) /
          sum(col("n")).over(total).cast(DoubleType) -
          log10(lit(1.0) + lit(1.0) /
            col("digit").cast(DoubleType)), 12).as("deviation"))
      .orderBy(col("digit"))
  }
  /** Herfindahl-Hirschman revenue concentration per nation: each
    * customer's revenue share within their nation, squared and summed
    * — HHI near 1/n_customers means revenue is spread evenly, near 1
    * means one whale dominates (the "is this segment's revenue
    * durable" pre-flight, and for a data pipeline: the skew warning
    * before partitioning by customer).
    *
    * Determinism: per-customer revenue is an exact DECIMAL(18,2) sum;
    * its square rides DECIMAL exactly; the nation totals are exact;
    * the single division per nation runs in double, round(12).
    *
    * Scale shape: one groupBy customer (shuffle on the natural key),
    * a broadcast nation join, and a bounded per-nation fold. No
    * windows, nothing driver-side. */
  def revenueHhi(orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val perCust = orders
      .groupBy(col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).as("_r"))
      .join(customer.select(col("c_custkey").as("o_custkey"),
        col("c_nationkey")), "o_custkey")
      .join(broadcast(nation.select(
        col("n_nationkey").as("c_nationkey"), col("n_name"))),
        "c_nationkey")
    // re-narrow the per-customer sum to DECIMAL(18,2) before squaring:
    // both engines widen a decimal SUM to precision 38, and a
    // (38,2)×(38,2) product overflows DuckDB's decimal width — the
    // narrow cast keeps the square exact and the types identical
    val r18 = col("_r").cast(DecimalType(18, 2))
    perCust
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("_r")).as("_rev"),
        sum((r18 * r18).cast(DecimalType(38, 4))).as("_r2"))
      .select(col("n_name"), col("n_customers"),
        col("_rev").cast(DoubleType).as("revenue"),
        round(col("_r2").cast(DoubleType) /
          (col("_rev").cast(DoubleType) * col("_rev").cast(DoubleType)),
          12).as("hhi"))
      .orderBy(col("n_name"))
  }

  /** Order-priority mix drift by month: each month's priority
    * distribution against the all-time distribution, reported as the
    * month's L1 (total-variation·2) distance plus the single most
    * over-represented priority — the composition-drift audit a
    * training-mix pipeline runs per ingestion batch (swap month →
    * batch, priority → source): a month whose mix diverges is the one
    * to investigate before it skews the blend.
    *
    * Determinism: counts are exact; shares are single divisions of
    * exact longs (round 12 pre-diff like the KS family); the argmax
    * tie-breaks on priority name.
    *
    * Scale shape: ONE (month, priority) count aggregate touches the
    * fact table; the global mix, the L1 fold and the argmax window
    * all run on the ≤ |months|·|priorities| metadata frame. */
  def priorityMixDrift(orders: DataFrame): DataFrame = {
    // month stays TIMESTAMP (UTC midnight): the driver's comparator
    // normalizes timestamps across engines but not DATE encodings
    val cell = orders
      .select(date_trunc("month", col("o_orderdate")).as("month"),
        col("o_orderpriority").as("pri"))
      .groupBy(col("month"), col("pri"))
      .agg(count(lit(1)).as("_c"))
    // metadata frames from here: zero-fill the month × priority grid
    // so an absent priority counts as share 0, not a missing row
    val grid = cell.select(col("month")).distinct()
      .crossJoin(broadcast(cell.select(col("pri")).distinct()))
      .join(cell, Seq("month", "pri"), "left")
      .select(col("month"), col("pri"),
        coalesce(col("_c"), lit(0L)).as("_c"))
    val wm = Window.partitionBy(col("month"))
    val wp = Window.partitionBy(col("pri"))
    val wAll = Window.partitionBy()
    val scored = grid.select(col("month"), col("pri"), col("_c"),
      sum(col("_c")).over(wm).as("_nm"),
      sum(col("_c")).over(wp).as("_np"),
      sum(col("_c")).over(wAll).as("_n"))
      .select(col("month"), col("pri"), col("_nm"),
        round(col("_c").cast(DoubleType) /
          col("_nm").cast(DoubleType), 12).as("_pm"),
        round(col("_np").cast(DoubleType) /
          col("_n").cast(DoubleType), 12).as("_pg"))
      .withColumn("_dev", col("_pm") - col("_pg"))
    val rk = Window.partitionBy(col("month"))
      .orderBy(col("_dev").desc, col("pri"))
    scored
      .withColumn("_rk", row_number().over(rk))
      .groupBy(col("month"))
      .agg(max(col("_nm")).as("n_orders"),
        round(sum(abs(col("_dev"))), 12).as("l1_drift"),
        max(when(col("_rk") === 1, col("pri"))).as("top_over_priority"),
        round(max(when(col("_rk") === 1, col("_dev"))), 12)
          .as("top_over_dev"))
      .orderBy(col("month"))
  }
  /** Order-total consistency audit: per order status, how many orders'
    * header totals disagree with the exact recomputed sum of their
    * line items (price·(1−disc)·(1+tax)) beyond a cent — the classic
    * cross-table DQ invariant a warehouse checks after every load
    * (and the FK-orphan complement: q124 finds dangling keys, this
    * finds VALUE drift between parent and child).
    *
    * Determinism: the recomputed total is an exact DECIMAL fold
    * (ExactNum widths); the header total is DECIMAL(18,2); diffs,
    * comparisons and the max all stay in DECIMAL — no doubles until
    * the final rate division.
    *
    * Scale shape: one groupBy on the child's natural key (l_orderkey)
    * with map-side partials, one equi-join on that key (both sides
    * key-partitioned — co-located under bucketing), one bounded
    * per-status fold. */
  def orderTotalConsistency(orders: DataFrame, lineitem: DataFrame,
      toleranceCents: Int = 1): DataFrame = {
    val DP = DecimalType(12, 2)
    val DS = DecimalType(4, 2)
    val one = lit(1).cast(DecimalType(3, 2))
    val tol = lit(toleranceCents).cast(DecimalType(10, 0)) *
      lit(0.01).cast(DecimalType(4, 2))
    val per = lineitem.groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum(col("l_extendedprice").cast(DP) *
        (one - col("l_discount").cast(DS)) *
        (one + col("l_tax").cast(DS))).as("_computed"))
    val diff = abs(col("_computed") - col("_t"))
    orders
      .select(col("o_orderkey"), col("o_orderstatus"),
        dec2(col("o_totalprice")).as("_t"))
      .join(per, Seq("o_orderkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("_computed").isNull, lit(1)))
          .as("n_no_lineitems"),
        count(when(col("_computed").isNotNull && diff > tol, lit(1)))
          .as("n_mismatch"),
        max(when(col("_computed").isNotNull, diff))
          .cast(DoubleType).as("max_abs_diff"))
      .select(col("o_orderstatus"), col("n_orders"),
        col("n_no_lineitems"), col("n_mismatch"),
        round((col("n_orders") - col("n_no_lineitems") -
          col("n_mismatch")).cast(DoubleType) /
          col("n_orders").cast(DoubleType), 12).as("consistent_rate"),
        col("max_abs_diff"))
      .orderBy(col("o_orderstatus"))
  }
  /** TPC-H Q10 shape — top customers by revenue LOST to returns: only
    * 'R'-flagged lineitems enter (the selective filter runs BEFORE
    * every join and reaches the parquet scan), then the order→customer
    * star resolves names and the top-k folds as
    * TakeOrderedAndProject. The "who should retention call first"
    * report, and at 100 TB the showcase that a 3-table star over a
    * 2%-selective fact slice costs a fraction of the full scan. */
  def returnedItemRevenue(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame, k: Int = 20): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name"),
        col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsumDisc(col("l_extendedprice"), col("l_discount"))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /** TPC-H Q14 shape — promo revenue share by ship month: what
    * fraction of each month's discounted revenue came from PROMO
    * parts. Both numerator and denominator are exact decimal folds of
    * the SAME join pass (one conditional sum, not two scans); the
    * single division per month runs in double, round(12). */
  def promoRevenueByMonth(lineitem: DataFrame, part: DataFrame)
      : DataFrame = {
    val DP = DecimalType(12, 2)
    val DS = DecimalType(4, 2)
    val one = lit(1).cast(DecimalType(3, 2))
    val disc = col("l_extendedprice").cast(DP) *
      (one - col("l_discount").cast(DS))
    lineitem
      .select(date_trunc("month", col("l_shipdate")).as("month"),
        col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(part.select(col("p_partkey").as("l_partkey"), col("p_type")),
        "l_partkey")
      .groupBy(col("month"))
      .agg(sum(disc).as("_all"),
        sum(when(col("p_type") === "PROMO", disc)
          .otherwise(lit(0).cast(DecimalType(3, 2)))).as("_promo"))
      .select(col("month"),
        col("_all").cast(DoubleType).as("revenue"),
        col("_promo").cast(DoubleType).as("promo_revenue"),
        round(lit(100.0) * col("_promo").cast(DoubleType) /
          col("_all").cast(DoubleType), 12).as("promo_pct"))
      .orderBy(col("month"))
  }

  /** TPC-H Q17 shape — revenue sitting in SMALL orders: lineitems
    * whose quantity is under 1/5 of their part's average order
    * quantity (the "candidates for batching" spend), per brand. The
    * correlated-subquery formulation decorrelates into one per-part
    * aggregate joined back to the fact; the fraction compare is
    * CROSS-MULTIPLIED (5·qty·n < Σqty) so it stays in exact decimal
    * integer arithmetic — no division, no boundary drift between
    * engines. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame)
      : DataFrame = {
    val DP = DecimalType(12, 2)
    val perPart = lineitem.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("_n"),
        sum(col("l_quantity").cast(DP)).as("_sq"))
    lineitem
      .join(perPart, "l_partkey")
      .filter(col("l_quantity").cast(DP) * lit(5) * col("_n") <
        col("_sq"))
      .join(part.select(col("p_partkey").as("l_partkey"),
        col("p_brand")), "l_partkey")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lineitems"),
        dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q19 shape — discounted revenue under an OR-of-ANDs
    * predicate (brand × size-band × quantity-band tiers): the
    * pushdown showcase — the disjunction references both tables, but
    * the part-only conjuncts prune the dimension before the join and
    * the quantity bounds reach the fact scan. One-row output. */
  def brandTierRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part.select(col("p_partkey").as("l_partkey"),
        col("p_brand"), col("p_size")), "l_partkey")
      .filter(
        (col("p_brand") === "Brand#1" &&
          col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" &&
          col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" &&
          col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 40)))
      .agg(count(lit(1)).as("n_lineitems"),
        dsumDisc(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
  /** TPC-H Q22 shape — high-balance customers per nation with no
    * URGENT order: positive-balance customers above the
    * positive-balance average who have never placed a '1-URGENT'
    * order (the "high-value accounts the priority pipeline never
    * touches" report; the harness data gives every customer SOME
    * order, so the classic no-orders leg would be vacuously empty —
    * the urgent-slice anti join keeps the exact Q22 plan shape with a
    * non-trivial answer). The average is a broadcast scalar from
    * exact decimal sums (deterministic boundary on every engine —
    * account balances are 2-decimal values); the anti join's build
    * side is pre-filtered to the urgent slice. */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
      nation: DataFrame): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0)
      .agg((sum(dec2(col("c_acctbal"))).cast(DoubleType) /
        count(lit(1))).as("_avg"))
    customer
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("_avg"))
      .join(orders.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation.select(
        col("n_nationkey").as("c_nationkey"), col("n_name"))),
        "c_nationkey")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_balance"))
      .orderBy(col("n_name"))
  }
  /** Market-basket pair mining: the top-k part pairs bought together
    * in the same order — the co-purchase association table behind
    * "frequently bought together" and bundle design. The self-join
    * keys on the ORDER id, so fan-out per key is bounded by items per
    * order (single digits), never catalog- or corpus-sized; pair
    * counts then fold with map-side partials and the top-k is
    * TakeOrderedAndProject (ties break on the part keys, so the cut
    * is deterministic). */
  def partsBoughtTogether(lineitem: DataFrame, k: Int = 20): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    items.as("a")
      .join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"),
        col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** Part supply-concentration histogram: how many parts are served
    * by exactly n distinct suppliers, plus the single-source share —
    * the supply-chain risk pre-flight (a part with one supplier is a
    * single point of failure; a catalog that is mostly single-source
    * is fragile as a whole).
    *
    * Scale shape: distinct (part, supplier) pairs fold with map-side
    * partials (catalog-shaped), then two bounded aggregates; the
    * share is one division of exact longs against a broadcast
    * one-row total. */
  def partSupplierConcentration(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    val hist = perPart.groupBy(col("n_suppliers"))
      .agg(count(lit(1)).as("n_parts"))
    hist
      .crossJoin(broadcast(hist.agg(
        sum(col("n_parts")).as("_total"))))
      .select(col("n_suppliers"), col("n_parts"),
        round(col("n_parts").cast(DoubleType) /
          col("_total").cast(DoubleType), 12).as("part_share"))
      .orderBy(col("n_suppliers"))
  }

  /** TPC-H Q7 shape — bilateral shipping volume between two nations:
    * revenue per (supplier nation, customer nation, ship year) for
    * the DISJUNCTIVE nation pair (n1→n2 or n2→n1) — the trade-flow
    * query whose defining plan property is a filter that references
    * BOTH dimension legs at once.
    *
    * Scale shape: nation broadcasts twice (once per leg) and supplier
    * broadcasts whole; the fact table shuffles once for the orders
    * key join; the disjunctive pair predicate applies the moment both
    * nation names are bound — before the aggregate — so only the two
    * nations' bilateral rows reach the final (2 × years)-row group
    * by. Revenue is the exact decimal discount sum (order-independent
    * at any parallelism). */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      n1: String = "NATION_1", n2: String = "NATION_2"): DataFrame = {
    val suppNation = supplier
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val custNation = customer
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("cust_nation"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("ship_year"))
      .agg(dsumDisc(col("l_extendedprice"), col("l_discount"))
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  /** TPC-H Q8 shape — national market share: for one part type sold
    * into one region, the share of yearly revenue supplied by one
    * nation. The two-level conditional aggregate (share = conditional
    * sum over total within the SAME group) in one pass — never a
    * self-join of the aggregate against itself.
    *
    * Scale shape: part is filtered to the type BEFORE its broadcast
    * (the selective filter prunes the build side, and the fact join
    * then prunes the probe stream); region gates the customer-nation
    * leg the same way; supplier's nation name rides a broadcast so
    * the share's CASE is map-side. One fact shuffle (orders key), one
    * |years|-row aggregate. */
  def marketShare(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, partT: DataFrame,
      suppNation: String = "NATION_9", regionName: String = "ASIA",
      pType: String = "PROMO"): DataFrame = {
    val marketCust = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppWithNation = supplier
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    lineitem
      .join(broadcast(partT.filter(col("p_type") === pType)
        .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(marketCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppWithNation),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("order_year"))
      .agg(
        dsumDisc(col("l_extendedprice"), col("l_discount"))
          .as("total_revenue"),
        sum(when(col("supp_nation") === suppNation,
          col("l_extendedprice").cast(DecimalType(12, 2)) *
            (lit(1).cast(DecimalType(3, 2)) -
              col("l_discount").cast(DecimalType(4, 2))))
          .otherwise(lit(0).cast(DecimalType(3, 2))))
          .cast(DoubleType).as("nation_revenue"))
      .withColumn("mkt_share",
        round(col("nation_revenue") / col("total_revenue"), 12))
      .orderBy(col("order_year"))
  }

  /** TPC-H Q6 shape — forecast revenue change: one exact-decimal sum
    * over a triple-filtered scan. The canonical pushdown demo: all
    * three predicates (shipdate year band, discount band, quantity
    * cap) and the 2-column projection reach the parquet scan, so at
    * 100 TB the stage reads a sliver of the table and aggregates
    * map-side to a single row — no shuffle wider than one row per
    * partition. */
  def forecastRevenue(lineitem: DataFrame,
      year: String = "1997", discLo: Double = 0.05, discHi: Double = 0.07,
      maxQty: Double = 24): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year.toInt + 1}-01-01").cast("timestamp") &&
        col("l_discount") >= discLo && col("l_discount") <= discHi &&
        col("l_quantity") < maxQty)
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
        col("l_discount").cast(DecimalType(4, 2)))
        .cast(DoubleType).as("revenue"))

  /** TPC-H Q4 shape — order-priority checking: orders in one quarter
    * that had at least one LATE line (shipped more than `lateDays`
    * after the order date — this schema has no commit/receipt dates),
    * counted per priority. The EXISTS decorrelates to a left-semi
    * join, so each order contributes at most once no matter how many
    * late lines it has and the per-priority counts never overcount.
    *
    * Scale shape: the quarter filter prunes the orders scan FIRST
    * (predicate reaches parquet), then ONE semi join keyed on
    * orderkey carries the compound lateness condition; lineitem ships
    * only (orderkey, shipdate). Aggregate is |priorities| rows. */
  def latePriorityOrders(orders: DataFrame, lineitem: DataFrame,
      qStart: String = "1997-07-01", qEnd: String = "1997-10-01",
      lateDays: Int = 90): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(qStart).cast("timestamp") &&
        col("o_orderdate") < lit(qEnd).cast("timestamp"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q13 shape — customer order-count distribution: how many
    * customers placed 0, 1, 2, … qualifying orders. The zero bucket
    * is the point: the priority filter must live in the JOIN
    * condition of a LEFT join (not a WHERE), so customers with no
    * qualifying orders survive with count 0 instead of vanishing.
    *
    * Scale shape: one outer join keyed on custkey (both sides shuffle
    * on the key — co-locatable under bucketing), a per-customer count
    * (map-side partial), then a second aggregate over |distinct
    * counts| rows — the histogram never sees the fact table. */
  def custOrderDistribution(customer: DataFrame, orders: DataFrame,
      excludePriority: String = "1-URGENT"): DataFrame =
    customer
      .join(orders.filter(col("o_orderpriority") =!= excludePriority)
        .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15 shape — top supplier(s) by quarterly revenue, TIES
    * KEPT: suppliers whose revenue equals the maximum. The scalar max
    * rides a broadcast one-row cross join and the equality happens on
    * the EXACT decimal revenue (never the double projection), so the
    * tie set is deterministic on any engine and any accumulation
    * order — a global sort+limit would both drop ties and pay a
    * data-sized exchange.
    *
    * Scale shape: one per-supplier partial+final aggregate over the
    * date-pruned scan (|suppliers| rows out), a 1-row max broadcast
    * back over it, and a broadcast supplier-dim join for the name. */
  def topRevenueSuppliers(lineitem: DataFrame, supplier: DataFrame,
      qStart: String = "1997-01-01", qEnd: String = "1997-04-01")
      : DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(qStart).cast("timestamp") &&
        col("l_shipdate") < lit(qEnd).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
        (lit(1).cast(DecimalType(3, 2)) -
          col("l_discount").cast(DecimalType(4, 2)))).as("_rev"))
    rev
      .crossJoin(broadcast(rev.agg(max(col("_rev")).as("_mx"))))
      .filter(col("_rev") === col("_mx"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("_rev").cast(DoubleType).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q2 shape — minimum-cost supplier: for each part of one
    * type in a size band, the supplier(s) offering the best (minimum)
    * observed sale price. This schema has no partsupp/supplycost, so
    * the offer book is derived: min extendedprice per (part,
    * supplier) from lineitem. The correlated MIN subquery
    * decorrelates into a per-part aggregate joined back on (partkey,
    * offer) — the classic rewrite; offers stay EXACT decimals so the
    * equality join is deterministic cross-engine.
    *
    * Scale shape: the type/size filter prunes part BEFORE its
    * broadcast, so the fact scan only aggregates matching parts; the
    * offer table is ≤ |part|·|supplier-per-part| rows, its per-part
    * min a second tiny aggregate, and the join-back is keyed — all
    * post-fact stages are dimension-sized. */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame,
      pType: String = "STANDARD", sizeLo: Int = 10, sizeHi: Int = 20)
      : DataFrame = {
    val partF = part
      .filter(col("p_type") === pType &&
        col("p_size") >= sizeLo && col("p_size") <= sizeHi)
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
    val offers = lineitem
      .join(broadcast(partF.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice").cast(DecimalType(12, 2)))
        .as("_offer"))
    val best = offers.groupBy(col("l_partkey").as("_bk"))
      .agg(min(col("_offer")).as("_best"))
    offers
      .join(best, col("l_partkey") === col("_bk") &&
        col("_offer") === col("_best"))
      .join(broadcast(partF), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("p_brand"),
        col("_offer").cast(DoubleType).as("best_price"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  /** TPC-H Q9 shape — product-type profit by nation and year: for
    * parts matching a name pattern, profit = revenue − cost, grouped
    * by the SUPPLIER's nation and the order year. No supplycost
    * column exists, so cost is modeled as retailprice·quantity·0.5 —
    * every factor an exact decimal, mirrored term-for-term in the
    * oracle so both engines sum identical values.
    *
    * Scale shape: the name filter prunes the part broadcast first
    * (the probe stream shrinks at the scan), supplier→nation rides a
    * second broadcast, and the only fact-sized exchange is the
    * orders key join; the aggregate is |nations|·|years| rows with
    * map-side partials. */
  def productTypeProfit(lineitem: DataFrame, orders: DataFrame,
      part: DataFrame, supplier: DataFrame, nation: DataFrame,
      namePattern: String = "%bolt%"): DataFrame =
    lineitem
      .join(broadcast(part.filter(col("p_name").like(namePattern))
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier
        .join(broadcast(nation.select(col("n_nationkey"),
          col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("nation"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"),
        year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(sum(
        col("l_extendedprice").cast(DecimalType(12, 2)) *
          (lit(1).cast(DecimalType(3, 2)) -
            col("l_discount").cast(DecimalType(4, 2))) -
        col("p_retailprice").cast(DecimalType(12, 2)) *
          col("l_quantity").cast(DecimalType(12, 2)) *
          lit(0.5).cast(DecimalType(4, 2)))
        .cast(DoubleType).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q11 shape — important parts: parts whose sales value
    * through one nation's suppliers exceeds a fixed fraction of that
    * nation's total. The global total is a one-row broadcast gate
    * (scalar subquery), and the threshold compare is EXACT:
    * value·2000 > total (fraction 1/2000) — integer-scaled decimals,
    * no double boundary anywhere.
    *
    * Scale shape: the nation's suppliers ride a broadcast semi join
    * into the fact scan; per-part values are one partial+final
    * aggregate; the total folds the |part|-sized value table, not
    * the corpus — and gates it via a 1-row broadcast. */
  def importantParts(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, nationName: String = "NATION_3",
      fracDenom: Int = 2000): DataFrame = {
    val natSupp = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = lineitem
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
        (lit(1).cast(DecimalType(3, 2)) -
          col("l_discount").cast(DecimalType(4, 2)))).as("_v"))
    value
      .crossJoin(broadcast(value.agg(sum(col("_v")).as("_tot"))))
      .filter(col("_v") * lit(fracDenom) > col("_tot"))
      .select(col("l_partkey"),
        col("_v").cast(DoubleType).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** TPC-H Q16 shape — supplier diversity per part attribute: how
    * many distinct suppliers have sold parts of each (brand, type,
    * size), excluding a supplier blacklist (NOT IN → broadcast
    * anti join; the blacklist here is negative-balance suppliers —
    * this schema has no comment column for the complaint text).
    *
    * Scale shape: the (part, supplier) relationship distincts the
    * fact scan down to ≤ |part|·|suppliers-per-part| rows FIRST (one
    * shuffle with partial distinct), then all remaining stages —
    * anti join, attribute broadcast, count-distinct — run on the
    * pair table, never the corpus. */
  def supplierDiversity(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, excludeBrand: String = "Brand#1",
      sizes: Seq[Int] = Seq(5, 10, 15, 20, 25, 30)): DataFrame =
    lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(supplier.filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(part
        .filter(col("p_brand") =!= excludeBrand &&
          col("p_size").isin(sizes.map(Integer.valueOf): _*))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))

  /** TPC-H Q18 shape — large-volume orders: orders whose total line
    * quantity exceeds a threshold, with customer attribution. The
    * HAVING becomes a per-order aggregate that FILTERS before any
    * dimension join — the expensive join runs on the (rare)
    * qualifying orders only, and the threshold compare is exact
    * decimal.
    *
    * Scale shape: one per-orderkey partial+final quantity sum over
    * the scan, the filter collapses it to the qualifying tail, then
    * two keyed joins (orders, customer) on that tail; final top-k is
    * TakeOrderedAndProject. */
  def largeVolumeOrders(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, minQty: Int = 250, k: Int = 100): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("_qty"))
      .filter(col("_qty") > lit(minQty).cast(DecimalType(12, 2)))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("_qty").cast(DoubleType).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** TPC-H Q20 shape — dominant suppliers: suppliers shipping more
    * than `mult`× the MEAN per-supplier quantity of some part (the
    * "holds excess share" predicate; mean-relative because an
    * absolute share threshold collapses as supplier-per-part
    * cardinality grows with the corpus). The nested aggregate
    * threshold (per-(supp,part) vs per-part total) decorrelates into
    * two stacked aggregates — the per-part rollup REUSES the first
    * aggregate's output, not a second fact scan — joined back on
    * partkey with the exact integer-scaled compare
    * (supp_qty·n_supps > mult·part_qty).
    *
    * Scale shape: one fact aggregate to (supp, part) rows; the
    * per-part rollup and join-back run on that dimension-sized
    * table; the DISTINCT supplier tail takes two broadcast dim
    * joins for attribution. */
  def dominantSuppliers(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, mult: Int = 2): DataFrame = {
    val sp = lineitem
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("_sq"))
    val pt = sp.groupBy(col("l_partkey").as("_pk"))
      .agg(sum(col("_sq")).as("_pq"), count(lit(1)).as("_ns"))
    sp
      .join(pt, col("l_partkey") === col("_pk") &&
        col("_sq") * col("_ns") > col("_pq") * lit(mult))
      .select(col("l_suppkey")).distinct()
      .join(broadcast(supplier
        .join(broadcast(nation.select(col("n_nationkey"),
          col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  /** TPC-H Q21 shape — the sole late supplier: suppliers who were the
    * ONLY late shipper in a multi-supplier order (late = shipped more
    * than `lateDays` after the order date), counted over orders. The
    * classic EXISTS + NOT-EXISTS pair of correlated self-joins
    * decorrelates into ONE per-order aggregate (distinct suppliers,
    * distinct LATE suppliers) joined back to the late lines — the
    * fact table is scanned once and self-joined zero times.
    *
    * Scale shape: one orderkey-keyed fact join (orders ships only
    * orderkey+date), one per-order aggregate, one keyed join-back of
    * the distinct late (order, supp) pairs, then a |suppliers|-row
    * count. The two correlated subqueries of the textbook plan would
    * each re-shuffle lineitem; this shape pays one shuffle total. */
  def soleLateSupplier(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, lateDays: Int = 900, k: Int = 100)
      : DataFrame = {
    val j = lineitem.select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("_late", col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
    val stats = j.groupBy(col("l_orderkey").as("_ok"))
      .agg(countDistinct(col("l_suppkey")).as("_ns"),
        countDistinct(when(col("_late"), col("l_suppkey"))).as("_nl"))
    j.filter(col("_late"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .join(stats, col("l_orderkey") === col("_ok") &&
        col("_ns") > 1 && col("_nl") === 1)
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_orderkey")).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(k)
  }
}
