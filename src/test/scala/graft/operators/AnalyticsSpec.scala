package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Direct goldens for the analytics read path (EP3): statistics view
  * values, recency filtering, group counts, top-k and the UNION ALL
  * metrics report — mirroring the reference's view/monitor.sh semantics
  * (init.sql:44-70, monitor.sh:16-58). */
class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(offsetDays: Int): Timestamp =
    new Timestamp(System.currentTimeMillis() - offsetDays * 86400000L)

  private lazy val jobs = Seq(
    ("u1", "OrgA", "DeptX", ts(0)), // today
    ("u2", "OrgA", "DeptY", ts(3)), // this week
    ("u3", "OrgB", "DeptY", ts(20)), // this month
    ("u4", "OrgC", "DeptZ", ts(45)) // older
  ).toDF("position_uri", "organization_name", "department_name",
    "created_at")

  test("statistics: totals, distincts, recency buckets, min/max") {
    val s = Analytics.statistics(jobs, "organization_name",
      "department_name", "created_at").head
    assert(s.getAs[Long]("total_jobs") == 4L)
    assert(s.getAs[Long]("unique_organizations") == 3L)
    assert(s.getAs[Long]("unique_departments") == 3L)
    assert(s.getAs[Long]("jobs_today") == 1L)
    assert(s.getAs[Long]("jobs_this_week") == 2L)
    assert(s.getAs[Long]("jobs_this_month") == 3L)
    assert(s.getAs[Timestamp]("latest_job_posted")
      .after(s.getAs[Timestamp]("earliest_job_posted")))
  }

  test("statistics approx variant: HLL counts within rsd of exact") {
    val s = Analytics.statistics(jobs, "organization_name",
      "department_name", "created_at", approx = true).head
    // 4 distinct values at rsd=0.01 are always exact in practice
    assert(s.getAs[Long]("unique_organizations") == 3L)
  }

  test("recent: 30-day filter, newest first, optional projection") {
    val r = Analytics.recent(jobs, "created_at", days = 30,
      projection = Seq("position_uri", "created_at")).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("u1", "u2", "u3"))
    assert(r.head.schema.fieldNames.toSeq ==
      Seq("position_uri", "created_at"))
  }

  test("countByGroup: largest groups first, deterministic ties") {
    val g = Analytics.countByGroup(jobs, "organization_name").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(g.toSeq == Seq(("OrgA", 2L), ("OrgB", 1L), ("OrgC", 1L)))
  }

  test("topKRecent returns the k newest rows") {
    val t = Analytics.topKRecent(jobs, "created_at", 2).collect()
    assert(t.map(_.getAs[String]("position_uri")).toSeq == Seq("u1", "u2"))
  }

  test("metricsReport: one (metric, value) row per frame, sorted") {
    val rpt = Analytics.metricsReport(
      "total_jobs" -> jobs,
      "org_a_jobs" -> jobs.filter(col("organization_name") === "OrgA"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rpt.toSeq == Seq(("org_a_jobs", 2L), ("total_jobs", 4L)))
  }

  test("joinCardinality: per-key count products equal the materialized " +
      "join size; unmatched keys contribute nothing") {
    import spark.implicits._
    val a = Seq((1L, "x"), (1L, "y"), (2L, "z"), (3L, "w"))
      .toDF("k", "pa")
    val b = Seq((1L, "p"), (1L, "q"), (1L, "r"), (2L, "s"), (9L, "t"))
      .toDF("k", "pb")
    val r = RelationalOps.joinCardinality(a, b, "k", "k").collect().head
    assert(r.getAs[Long]("n_matching_keys") == 2L) // keys 1 and 2
    assert(r.getAs[Long]("join_rows") == 2L * 3L + 1L * 1L)
    assert(r.getAs[Long]("join_rows") == a.join(b, "k").count())
  }

  test("bloomSemiJoinReport: bloom keeps a superset of the exact " +
      "semi-join (no false negatives); ample bits give zero overhead") {
    import spark.implicits._
    val fact = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "payload")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val r = RelationalOps.bloomSemiJoinReport(fact, dim, "k", "dk")
      .collect().head
    assert(r.getAs[Long]("fact_rows") == 1000L)
    assert(r.getAs[Long]("exact_kept") == 30L)
    assert(r.getAs[Long]("bloom_kept") >= r.getAs[Long]("exact_kept"))
    // 2^23 bits over 3 items: the false-positive rate is ~0
    assert(r.getAs[Long]("bloom_kept") == 30L)
    assert(r.getAs[Double]("false_pos_rate") == 0.0)
  }

  test("keySkewProfile: hand-computable statistics over a known " +
      "key-count histogram") {
    import spark.implicits._
    // counts per key: A×4, B×2, C×1, D×1
    val df = (Seq.fill(4)("A") ++ Seq.fill(2)("B") ++ Seq("C", "D"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "k")
    val r = Analytics.keySkewProfile(df, "k").collect().head
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("max_n") == 4L)
    assert(r.getAs[Double]("p50_n") == 1.5)   // {1,1,2,4} interpolated
    assert(r.getAs[Double]("top1_share") == 0.5)
    assert(r.getAs[Double]("skew_ratio") == 4.0 / 1.5)
  }

  test("fkOrphanAudit: planted orphan counted once, duplicated parent " +
      "key never double-counts child rows") {
    import spark.implicits._
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "fk")
    // parent key 10 appears TWICE (dirty data) — distinct must guard
    val parent = Seq(10L, 10L, 20L).toDF("pk")
    val out = RelationalOps.fkOrphanAudit(
      Seq(("child->parent", child, "fk", parent, "pk"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "child->parent")
    assert(r.getAs[Long]("n_child") == 3L)
    assert(r.getAs[Long]("n_orphans") == 1L)
    assert(r.getAs[Double]("orphan_rate") == 1.0 / 3.0)
  }

  test("revenueShareHierarchy: per-nation shares of region and total " +
      "are exact; regional shares sum to 1 within each region") {
    import spark.implicits._
    val orders = Seq((1L, 101L, "10.00"), (2L, 102L, "30.00"),
      (3L, 103L, "60.00"))
      .toDF("o_orderkey", "o_custkey", "_p")
      .withColumn("o_totalprice", col("_p").cast("double"))
    val customer = Seq((101L, 1L), (102L, 2L), (103L, 3L))
      .toDF("c_custkey", "c_nationkey")
    val nation = Seq((1L, "n1", 10L), (2L, "n2", 10L), (3L, "n3", 20L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((10L, "r1"), (20L, "r2"))
      .toDF("r_regionkey", "r_name")
    val out = RelationalOps.revenueShareHierarchy(
      orders, customer, nation, region).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Double]("revenue"), r.getAs[Double]("share_of_region"),
        r.getAs[Double]("share_of_total"))).toSeq
    assert(out == Seq(
      ("r1", "n1", 10.0, 0.25, 0.1),
      ("r1", "n2", 30.0, 0.75, 0.3),
      ("r2", "n3", 60.0, 1.0, 0.6)), s"got $out")
  }

  test("modalityCoverage: matched / docs-only / vecs-only partition the " +
      "id space and the coverage ratio is exact") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val emb = Seq(3L, 4L, 5L).toDF("vec_id")
    val r = Analytics.modalityCoverage(docs, emb).collect().head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_vecs") == 3L)
    assert(r.getAs[Long]("n_matched") == 2L)
    assert(r.getAs[Long]("n_docs_only") == 2L)
    assert(r.getAs[Long]("n_vecs_only") == 1L)
    assert(r.getAs[Double]("doc_coverage") == 0.5)
  }

  test("revenueGiniBySegment: flat segment gini 0; [10,30] gini 0.25 " +
      "(matches the mean-absolute-difference definition)") {
    import spark.implicits._
    // seg A: two customers, 10 each (one via two 5.0 orders) -> G = 0
    // seg B: 10 vs 30 -> mean-diff gini = 40/(2*4*20) = 0.25
    val orders = Seq((1L, 5.0), (1L, 5.0), (2L, 10.0),
      (3L, 10.0), (4L, 30.0)).toDF("o_custkey", "o_totalprice")
    val customer = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val out = RelationalOps.revenueGiniBySegment(orders, customer)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_customers"),
        r.getAs[Double]("total_revenue"), r.getAs[Double]("gini"))).toSeq
    assert(out == Seq(("A", 2L, 20.0, 0.0), ("B", 2L, 40.0, 0.25)),
      s"got $out")
  }

  test("orderStreaks: islands of consecutive months; same-month orders " +
      "collapse; year boundary Dec->Jan is consecutive") {
    import spark.implicits._
    val orders = Seq(
      (1L, "1996-01-05"), (1L, "1996-01-20"), // same month, one island
      (1L, "1996-02-11"), (1L, "1996-03-02"), // Jan-Mar streak of 3
      (1L, "1996-06-01"), // isolated month
      (2L, "1995-12-30"), (2L, "1996-01-02") // Dec->Jan consecutive
    ).toDF("o_custkey", "_d")
      .withColumn("o_orderdate", to_date(col("_d")))
    val out = RelationalOps.orderStreaks(orders).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_active_months"),
        r.getAs[Long]("longest_streak"), r.getAs[Long]("n_streaks")))
      .toSeq
    assert(out == Seq((1L, 4L, 3L, 2L), (2L, 2L, 2L, 1L)), s"got $out")
  }

  test("yoyRevenueGrowth: first year NULL, then exact (rev-prev)/prev") {
    import spark.implicits._
    val orders = Seq((1L, "1995-03-01", 100.0), (1L, "1996-07-01", 150.0),
      (1L, "1997-02-01", 75.0))
      .toDF("o_custkey", "_d", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("_d")))
    val customer = Seq((1L, 7L)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((7L, "n1")).toDF("n_nationkey", "n_name")
    val out = RelationalOps.yoyRevenueGrowth(orders, customer, nation)
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getAs[Double]("revenue"),
        Option(r.getAs[java.lang.Double]("yoy_growth")).map(_.toDouble)))
      .toSeq
    assert(out == Seq(("n1", 1995, 100.0, None),
      ("n1", 1996, 150.0, Some(0.5)),
      ("n1", 1997, 75.0, Some(-0.5))), s"got $out")
  }

  test("chiSquareIndependence: uniform table chi2 0; disjoint 2x2 " +
      "chi2 = n and Cramer's V = 1 (zero cells included)") {
    import spark.implicits._
    val customer = Seq((1L, "A"), (2L, "B")).toDF("c_custkey",
      "c_mktsegment")
    // independent: both segments see both priorities equally
    val uniform = Seq((1L, "P1"), (1L, "P2"), (2L, "P1"), (2L, "P2"))
      .toDF("o_custkey", "o_orderpriority")
    val u = RelationalOps.chiSquareIndependence(uniform, customer)
      .collect().head
    assert(u.getAs[Long]("n_obs") == 4L)
    assert(u.getAs[Long]("n_cells") == 4L)
    assert(u.getAs[Long]("dof") == 1L)
    assert(u.getAs[Double]("chi2") == 0.0)
    assert(u.getAs[Double]("cramers_v") == 0.0)
    // perfectly associated: A only ever P1, B only ever P2 -> the two
    // absent combos MUST enter as observed-0 cells for chi2 = n
    val disjoint = Seq.fill(5)((1L, "P1")) ++ Seq.fill(5)((2L, "P2"))
    val d = RelationalOps.chiSquareIndependence(
      disjoint.toDF("o_custkey", "o_orderpriority"), customer)
      .collect().head
    assert(d.getAs[Long]("n_cells") == 4L)
    assert(d.getAs[Double]("chi2") == 10.0)
    assert(d.getAs[Double]("cramers_v") == 1.0)
  }

  test("benfordProfile: exact first-digit extraction incl. the " +
      "999.99/1000.00 boundary; expected = log10(1+1/d)") {
    import spark.implicits._
    val orders = Seq(123.45, 234.00, 999.99, 1000.00)
      .toDF("o_totalprice")
    val out = RelationalOps.benfordProfile(orders).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n"),
        r.getAs[Double]("observed"))).toSeq
    assert(out == Seq((1, 2L, 0.5), (2, 1L, 0.25), (9, 1L, 0.25)),
      s"got $out")
    val exp1 = RelationalOps.benfordProfile(orders).collect()
      .head.getAs[Double]("expected")
    assert(math.abs(exp1 - math.log10(2.0)) < 1e-12)
  }
  test("yoyRevenueGrowth: a GAP year reports NULL growth (never a " +
      "silent compare against 2+ years earlier)") {
    import spark.implicits._
    val orders = Seq((1L, "1995-03-01", 100.0), (1L, "1997-02-01", 75.0))
      .toDF("o_custkey", "_d", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("_d")))
    val customer = Seq((1L, 7L)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((7L, "n1")).toDF("n_nationkey", "n_name")
    val out = RelationalOps.yoyRevenueGrowth(orders, customer, nation)
      .collect().map(r => (r.getInt(1),
        Option(r.getAs[java.lang.Double]("prev_revenue")),
        Option(r.getAs[java.lang.Double]("yoy_growth")))).toSeq
    assert(out == Seq((1995, None, None), (1997, None, None)),
      s"1996 is absent, so 1997 must NOT compare against 1995: $out")
  }

  test("chiSquareIndependence: single-category attribute yields NULL " +
      "Cramer's V (denominator min(r,c)-1 = 0), not Inf/NaN") {
    import spark.implicits._
    val customer = Seq((1L, "A"), (2L, "A")).toDF("c_custkey",
      "c_mktsegment")
    val orders = Seq((1L, "P1"), (2L, "P2"))
      .toDF("o_custkey", "o_orderpriority")
    val r = RelationalOps.chiSquareIndependence(orders, customer)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("cramers_v")),
      "one segment => no association to measure => NULL")
  }

  test("benfordProfile: negative and zero totals are excluded from " +
      "the digit domain") {
    import spark.implicits._
    val orders = Seq(123.45, -234.00, 0.0, 911.00)
      .toDF("o_totalprice")
    val out = RelationalOps.benfordProfile(orders).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n"))).toSeq
    assert(out == Seq((1, 1L), (9, 1L)),
      s"only the two positive totals count: $out")
  }

  test("revenueHhi: hand-computed shares - 25/75 split gives 0.625, " +
      "a single-whale nation gives 1.0") {
    import spark.implicits._
    val orders = Seq((1L, 10.0), (2L, 30.0), (3L, 50.0))
      .toDF("o_custkey", "o_totalprice")
    val customer = Seq((1L, 7L), (2L, 7L), (3L, 8L))
      .toDF("c_custkey", "c_nationkey")
    val nation = Seq((7L, "n1"), (8L, "n2"))
      .toDF("n_nationkey", "n_name")
    val out = RelationalOps.revenueHhi(orders, customer, nation)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_customers"),
        r.getAs[Double]("revenue"), r.getAs[Double]("hhi"))).toSeq
    // n1: shares 0.25/0.75 -> 0.0625 + 0.5625 = 0.625; n2: one whale
    assert(out == Seq(("n1", 2L, 40.0, 0.625), ("n2", 1L, 50.0, 1.0)),
      s"got $out")
  }

  test("priorityMixDrift: uniform month reports zero L1 drift; a " +
      "skewed month reports the over-represented priority") {
    import spark.implicits._
    // global mix over both months: P1 3/6, P2 3/6. Month 1 matches the
    // global mix exactly (1/2, 1/2 scaled 2x); month 2 is all P2... make
    // month1: P1,P1,P2,P2 ; month2: P1,P2,P2 -> global P1 3/7, P2 4/7
    val orders = Seq(
      ("1995-01-10", "P1"), ("1995-01-15", "P1"),
      ("1995-01-20", "P2"), ("1995-01-25", "P2"),
      ("1995-02-10", "P1"), ("1995-02-15", "P2"), ("1995-02-20", "P2"))
      .toDF("_d", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("_d")))
    val out = RelationalOps.priorityMixDrift(orders).collect()
      .map(r => (r.getAs[Long]("n_orders"), r.getAs[Double]("l1_drift"),
        r.getAs[String]("top_over_priority"))).toSeq
    // global: P1 3/7, P2 4/7. Jan (2/4, 2/4): dev P1 = .5-3/7 = 1/14,
    // dev P2 = .5-4/7 = -1/14 -> L1 = 2/14; top over = P1.
    // Feb (1/3, 2/3): dev P1 = 1/3-3/7 = -2/21, dev P2 = 2/3-4/7 =
    // 2/21 -> L1 = 4/21; top over = P2.
    assert(out.map(_._1) == Seq(4L, 3L))
    assert(out.map(_._3) == Seq("P1", "P2"), s"got $out")
    assert(math.abs(out(0)._2 - 2.0 / 14.0) < 1e-9)
    assert(math.abs(out(1)._2 - 4.0 / 21.0) < 1e-9)
  }
  test("orderTotalConsistency: consistent, mismatched and " +
      "lineitem-less orders each land in their own counter") {
    import spark.implicits._
    // order 1: one item 100 * (1-0.1) * (1+0.05) = 94.50 == header
    // order 2: header off by 5.00; order 3: no lineitems at all
    val orders = Seq((1L, "O", 94.50), (2L, "O", 100.00), (3L, "F", 7.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val lineitem = Seq((1L, 100.0, 0.10, 0.05), (2L, 100.0, 0.10, 0.05))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val out = RelationalOps.orderTotalConsistency(orders, lineitem)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_orders"),
        r.getAs[Long]("n_no_lineitems"), r.getAs[Long]("n_mismatch"),
        r.getAs[Double]("consistent_rate"))).toSeq
    assert(out == Seq(("F", 1L, 1L, 0L, 0.0), ("O", 2L, 0L, 1L, 0.5)),
      s"got $out")
    val maxDiff = RelationalOps.orderTotalConsistency(orders, lineitem)
      .collect().find(_.getString(0) == "O").get
      .getAs[Double]("max_abs_diff")
    assert(maxDiff == 5.5, s"|94.50 - 100.00| = 5.50, got $maxDiff")
  }
  test("idleRichCustomers: above-average positive balance AND no " +
      "urgent order; negative balances never pass") {
    import spark.implicits._
    val customer = Seq(
      (1L, 100.0, 7L), (2L, 300.0, 7L),  // avg positive = 200
      (3L, 250.0, 8L), (4L, -500.0, 8L))
      .toDF("c_custkey", "c_acctbal", "c_nationkey")
    val orders = Seq((2L, "1-URGENT"), (3L, "5-LOW"), (1L, "5-LOW"))
      .toDF("o_custkey", "o_orderpriority")
    val nation = Seq((7L, "n1"), (8L, "n2"))
      .toDF("n_nationkey", "n_name")
    val out = RelationalOps.idleRichCustomers(customer, orders, nation)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_customers"),
        r.getAs[Double]("total_balance"))).toSeq
    // avg positive bal = (100+300+250)/3 = 216.67; above: 2 (300,
    // urgent -> excluded) and 3 (250, no urgent -> kept)
    assert(out == Seq(("n2", 1L, 250.0)), s"got $out")
  }
  test("partsBoughtTogether: pair counted once per order regardless " +
      "of line multiplicity; deterministic top-k tie-break") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), // order 1: {10, 20} (dup line)
      (2L, 10L), (2L, 20L), (2L, 30L), // order 2: 3 pairs
      (3L, 40L))                        // singleton: no pairs
      .toDF("l_orderkey", "l_partkey")
    val out = RelationalOps.partsBoughtTogether(lineitem, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("n_orders"))).toSeq
    assert(out == Seq((10L, 20L, 2L), (10L, 30L, 1L), (20L, 30L, 1L)),
      s"got $out")
  }

  test("partSupplierConcentration: histogram over distinct supplier " +
      "counts, shares sum to 1") {
    import spark.implicits._
    val lineitem = Seq(
      (1L, 10L, 100L), (2L, 10L, 100L), // part 10: 1 supplier (dup)
      (3L, 20L, 100L), (4L, 20L, 200L), // part 20: 2 suppliers
      (5L, 30L, 300L))                   // part 30: 1 supplier
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    val out = RelationalOps.partSupplierConcentration(lineitem)
      .collect().map(r => (r.getAs[Long]("n_suppliers"),
        r.getAs[Long]("n_parts"), r.getAs[Double]("part_share"))).toSeq
    assert(out.map(t => (t._1, t._2)) == Seq((1L, 2L), (2L, 1L)))
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-12)
  }

  test("volumeShipping: only the disjunctive nation pair survives, " +
      "directions group separately, revenue is the exact disc sum") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val nation = Seq((0, "N_A"), (1, "N_B"), (2, "N_C"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((100L, 0), (101L, 1), (102L, 2))
      .toDF("s_suppkey", "s_nationkey")
    val customer = Seq((200L, 0), (201L, 1), (202L, 2))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq((1L, 201L), (2L, 200L), (3L, 202L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      // order 1 (cust N_B): supp N_A -> A->B, 1996
      (1L, 100L, 100.0, 0.10, ts("1996-03-01 00:00:00")),
      // order 1 again, 1997: second year bucket
      (1L, 100L, 200.0, 0.00, ts("1997-03-01 00:00:00")),
      // order 2 (cust N_A): supp N_B -> B->A
      (2L, 101L, 50.0, 0.00, ts("1996-05-01 00:00:00")),
      // order 2, supp N_C -> C->A: NOT in the pair, dropped
      (2L, 102L, 999.0, 0.00, ts("1996-05-01 00:00:00")),
      // order 3 (cust N_C): supp N_A -> A->C, dropped
      (3L, 100L, 999.0, 0.00, ts("1996-06-01 00:00:00")))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
    val out = RelationalOps.volumeShipping(lineitem, orders, customer,
      supplier, nation, n1 = "N_A", n2 = "N_B")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("ship_year"), r.getAs[Double]("revenue"))).toSeq
    assert(out == Seq(
      ("N_A", "N_B", 1996L, 90.0), ("N_A", "N_B", 1997L, 200.0),
      ("N_B", "N_A", 1996L, 50.0)), s"got $out")
  }

  test("marketShare: share = focal nation's conditional sum over the " +
      "region+type-gated total, per order year") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val region = Seq((0, "R_0"), (1, "R_1")).toDF("r_regionkey", "r_name")
    val nation = Seq((0, "N_A", 0), (1, "N_B", 0), (2, "N_C", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((100L, 0), (101L, 1))
      .toDF("s_suppkey", "s_nationkey")
    // cust 200 in-region (N_A/R_0); cust 202 out-of-region (N_C/R_1)
    val customer = Seq((200L, 0), (202L, 2))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (1L, 200L, ts("1996-01-10 00:00:00")),
      (2L, 202L, ts("1996-02-10 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val part = Seq((10L, "PROMO"), (11L, "LARGE"))
      .toDF("p_partkey", "p_type")
    val lineitem = Seq(
      (1L, 10L, 100L, 60.0, 0.0),  // focal supp N_A, in scope
      (1L, 10L, 101L, 40.0, 0.0),  // other supp N_B, in scope
      (1L, 11L, 100L, 999.0, 0.0), // wrong part type, dropped
      (2L, 10L, 100L, 999.0, 0.0)) // out-of-region cust, dropped
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
    val out = RelationalOps.marketShare(lineitem, orders, customer,
      supplier, nation, region, part,
      suppNation = "N_A", regionName = "R_0", pType = "PROMO")
      .collect().map(r => (r.getAs[Long]("order_year"),
        r.getAs[Double]("total_revenue"),
        r.getAs[Double]("nation_revenue"),
        r.getAs[Double]("mkt_share"))).toSeq
    assert(out == Seq((1996L, 100.0, 60.0, 0.6)), s"got $out")
  }

  test("latePriorityOrders: an order with many late lines counts " +
      "once; on-time-only and out-of-quarter orders are dropped") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val orders = Seq(
      (1L, ts("1997-07-10 00:00:00"), "1-URGENT"), // 2 late lines -> 1
      (2L, ts("1997-08-10 00:00:00"), "1-URGENT"), // on-time only
      (3L, ts("1997-09-10 00:00:00"), "5-LOW"),    // 1 late line
      (4L, ts("1997-11-10 00:00:00"), "5-LOW"))    // late but out of Q
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (1L, ts("1998-01-01 00:00:00")), (1L, ts("1998-02-01 00:00:00")),
      (2L, ts("1997-08-15 00:00:00")),
      (3L, ts("1998-03-01 00:00:00")),
      (4L, ts("1998-06-01 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
    val out = RelationalOps.latePriorityOrders(orders, lineitem,
      qStart = "1997-07-01", qEnd = "1997-10-01", lateDays = 90)
      .collect().map(r => (r.getString(0), r.getAs[Long]("order_count")))
      .toSeq
    assert(out == Seq(("1-URGENT", 1L), ("5-LOW", 1L)), s"got $out")
  }

  test("custOrderDistribution: customers with zero qualifying orders " +
      "land in the 0 bucket (filter lives in the join condition)") {
    import spark.implicits._
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "2-HIGH"), (11L, 1L, "2-HIGH"),  // cust 1: 2 orders
      (12L, 2L, "1-URGENT"))                     // cust 2: excluded -> 0
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = RelationalOps.custOrderDistribution(customer, orders)
      .collect().map(r => (r.getAs[Long]("c_count"),
        r.getAs[Long]("custdist"))).toSeq
    // custs 2 and 3 both have 0 qualifying orders; cust 1 has 2.
    assert(out == Seq((0L, 2L), (2L, 1L)), s"got $out")
  }

  test("topRevenueSuppliers: revenue ties are BOTH kept; outside-" +
      "window lines are excluded from the revenue") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val supplier = Seq((1L, "S1"), (2L, "S2"), (3L, "S3"))
      .toDF("s_suppkey", "s_name")
    val lineitem = Seq(
      (1L, 100.0, 0.0, ts("1997-02-01 00:00:00")),
      (2L, 50.0, 0.0, ts("1997-02-01 00:00:00")),
      (2L, 50.0, 0.0, ts("1997-03-01 00:00:00")), // ties supp 1
      (2L, 999.0, 0.0, ts("1997-06-01 00:00:00")), // outside window
      (3L, 10.0, 0.0, ts("1997-02-01 00:00:00")))
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val out = RelationalOps.topRevenueSuppliers(lineitem, supplier)
      .collect().map(r => (r.getAs[Long]("s_suppkey"),
        r.getAs[Double]("total_revenue"))).toSeq
    assert(out == Seq((1L, 100.0), (2L, 100.0)), s"got $out")
  }

  test("minCostSupplier: the decorrelated min keeps BOTH suppliers " +
      "on an exact price tie; out-of-band parts are pruned") {
    import spark.implicits._
    val part = Seq(
      (10L, "alpha", "Brand#1", "STANDARD", 15),
      (11L, "beta", "Brand#2", "STANDARD", 50), // size out of band
      (12L, "gamma", "Brand#3", "PROMO", 15))   // wrong type
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    val nation = Seq((0, "N_A")).toDF("n_nationkey", "n_name")
    val supplier = Seq((1L, "S1", 5.0, 0), (2L, "S2", 9.0, 0))
      .toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val lineitem = Seq(
      (10L, 1L, 40.0), (10L, 1L, 60.0), // supp 1 best offer 40
      (10L, 2L, 40.0),                  // supp 2 ties at 40
      (11L, 1L, 1.0), (12L, 2L, 1.0))   // pruned parts
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val out = RelationalOps.minCostSupplier(lineitem, part, supplier,
      nation).collect()
      .map(r => (r.getAs[String]("s_name"),
        r.getAs[Long]("p_partkey"), r.getAs[Double]("best_price")))
      .toSeq.sortBy(_._1)
    assert(out == Seq(("S1", 10L, 40.0), ("S2", 10L, 40.0)), s"got $out")
  }

  test("dominantSuppliers: mean-relative dominance — a supplier " +
      "above 2x the mean share qualifies, balanced parts yield none") {
    import spark.implicits._
    val nation = Seq((0, "N_A")).toDF("n_nationkey", "n_name")
    val supplier = Seq((1L, "S1", 1.0, 0), (2L, "S2", 2.0, 0),
      (3L, "S3", 3.0, 0), (4L, "S4", 4.0, 0))
      .toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val lineitem = Seq(
      // part 10: supp 1 ships 90 of 120 across 3 supps -> mean 40,
      // 90*3 > 2*120 -> dominant
      (10L, 1L, 90.0), (10L, 2L, 20.0), (10L, 3L, 10.0),
      // part 20: perfectly balanced -> nobody dominates
      (20L, 3L, 50.0), (20L, 4L, 50.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
    val out = RelationalOps.dominantSuppliers(lineitem, supplier, nation)
      .collect().map(r => r.getAs[Long]("s_suppkey")).toSeq
    assert(out == Seq(1L), s"got $out")
  }

  test("soleLateSupplier: qualifies only when the order is multi-" +
      "supplier AND exactly one supplier shipped late") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val supplier = Seq((1L, "S1"), (2L, "S2"), (3L, "S3"))
      .toDF("s_suppkey", "s_name")
    val orders = Seq(
      (1L, ts("1995-01-01 00:00:00")), (2L, ts("1995-01-01 00:00:00")),
      (3L, ts("1995-01-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val late = ts("1998-01-01 00:00:00")   // way past 900 days
    val ontime = ts("1995-02-01 00:00:00")
    val lineitem = Seq(
      // order 1: supp 1 late (twice), supp 2 on time -> S1 qualifies
      (1L, 1L, late), (1L, 1L, late), (1L, 2L, ontime),
      // order 2: both late -> nobody qualifies (nl = 2)
      (2L, 1L, late), (2L, 3L, late),
      // order 3: single-supplier late -> dropped (ns = 1)
      (3L, 3L, late))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val out = RelationalOps.soleLateSupplier(lineitem, orders, supplier)
      .collect().map(r => (r.getAs[Long]("s_suppkey"),
        r.getAs[Long]("numwait"))).toSeq
    assert(out == Seq((1L, 1L)), s"got $out")
  }

  test("bootstrapLengthCi: constant lengths collapse every replicate " +
      "mean onto the true mean") {
    import spark.implicits._
    val docs = (1 to 100).map(i => (i.toLong, "s1", 10L))
      .toDF("doc_id", "source", "n_chars")
    val r = Analytics.bootstrapLengthCi(docs).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_reps") == 32L)
    assert(row.getAs[Double]("mean_len") == 10.0)
    assert(row.getAs[Double]("boot_min") == 10.0)
    assert(row.getAs[Double]("boot_med") == 10.0)
    assert(row.getAs[Double]("boot_max") == 10.0)
  }

  test("bootstrapLengthCi: varying lengths give ordered, spread-out " +
      "order statistics per source") {
    import spark.implicits._
    val docs = ((1 to 200).map(i => (i.toLong, "sA", (i % 50 + 1).toLong))
      ++ (201 to 400).map(i => (i.toLong, "sB", (i % 9 + 1).toLong)))
      .toDF("doc_id", "source", "n_chars")
    val rows = Analytics.bootstrapLengthCi(docs).collect()
    assert(rows.length == 2)
    rows.foreach { row =>
      val (lo, med, hi) = (row.getAs[Double]("boot_min"),
        row.getAs[Double]("boot_med"), row.getAs[Double]("boot_max"))
      assert(lo <= med && med <= hi)
      assert(lo < hi, "varying lengths must produce replicate spread")
      assert(row.getAs[Long]("n_reps") == 32L)
      // the point estimate sits inside the bootstrap envelope
      val m = row.getAs[Double]("mean_len")
      assert(m >= lo && m <= hi, s"mean $m outside [$lo, $hi]")
    }
  }
}
