package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

/** Boundary semantics for the banded temporal range join (q45): the
  * bucket trick must be invisible — pairs that straddle a gap-bucket
  * boundary are found, interval endpoints are (open, closed], and no
  * pair is emitted twice. */
class EventOpsSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, u, t) => (id, u, ts(t)) }
      .toDF("event_id", "user_id", "ts")
  }

  test("rangeJoinWithin: (open, closed] endpoints, cross-bucket recall, " +
      "no duplicate pairs, users never mix") {
    // gap = 1 minute. Bucket width 60 s, epoch-aligned.
    val df = events(
      (1L, 7L, "2024-01-01 00:00:59"), // bucket 0 (59 s)
      (2L, 7L, "2024-01-01 00:01:30"), // bucket 1 — 31 s after e1: cross-bucket pair
      (3L, 7L, "2024-01-01 00:01:59"), // exactly 60 s after e1: boundary INCLUDED
      (4L, 7L, "2024-01-01 00:02:00"), // 61 s after e1: out of range for e1
      (5L, 7L, "2024-01-01 00:01:30"), // same instant as e2: diff 0 EXCLUDED
      (6L, 9L, "2024-01-01 00:01:00")  // other user: never pairs
    )
    val out = EventOps.rangeJoinWithin(df, gapMinutes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val pairs = out.map { case (_, a, b, _) => (a, b) }
    assert(pairs.toSet == Set(
      (1L, 2L), (1L, 5L), (1L, 3L), // cross-bucket + inclusive far endpoint
      (2L, 3L), (2L, 4L), (5L, 3L), (5L, 4L),
      (3L, 4L)),
      s"got ${pairs.toSeq.sorted.mkString(", ")}")
    assert(pairs.length == pairs.distinct.length, "no pair emitted twice")
    val gap13 = out.find(t => t._2 == 1L && t._3 == 3L).get._4
    assert(gap13 == 60L, s"gap_seconds for the 60 s pair: $gap13")
    assert(out.forall(_._1 == 7L), "user 9 has no in-gap neighbor")
  }

  test("rangeJoinWithin: empty input and single event produce no rows") {
    assert(EventOps.rangeJoinWithin(
      events((1L, 1L, "2024-01-01 00:00:00")), 5).count() == 0)
  }

  test("funnel: strict ordering, greedy-earliest chaining, partial " +
      "funnels counted per step") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes A→B→C in order
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (2L, 1L, "B", "2024-01-01 10:01:00"),
      (3L, 1L, "C", "2024-01-01 10:02:00"),
      // user 2: B before A — only step A counts
      (4L, 2L, "B", "2024-01-01 09:00:00"),
      (5L, 2L, "A", "2024-01-01 09:30:00"),
      // user 3: A and B at the SAME instant — strict > rejects the chain
      (6L, 3L, "A", "2024-01-01 08:00:00"),
      (7L, 3L, "B", "2024-01-01 08:00:00"),
      // user 4: greedy-earliest — late B still chains to the EARLIER A
      (8L, 4L, "A", "2024-01-01 07:00:00"),
      (9L, 4L, "A", "2024-01-01 07:30:00"),
      (10L, 4L, "B", "2024-01-01 07:10:00"),
      (11L, 4L, "C", "2024-01-01 07:20:00"),
      // user 5: no funnel events at all
      (12L, 5L, "X", "2024-01-01 06:00:00")
    ).map { case (e, u, t, s) => (e, u, t, Timestamp.valueOf(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.funnel(ev, Seq("A", "B", "C")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        Option(r.getTimestamp(2)))).toMap
    assert(out(1L) == (3L, Some(ts("2024-01-01 10:02:00"))))
    assert(out(2L) == (1L, None))
    assert(out(3L) == (1L, None))
    assert(out(4L) == (3L, Some(ts("2024-01-01 07:20:00"))))
    assert(out(5L) == (0L, None))
  }

  test("eventTransitions: adjacent pairs per user, users never chain " +
      "into each other, probabilities normalize per prev row") {
    import spark.implicits._
    val ev = Seq(
      // user 1: A → B → B → C
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (2L, 1L, "B", "2024-01-01 10:01:00"),
      (3L, 1L, "B", "2024-01-01 10:02:00"),
      (4L, 1L, "C", "2024-01-01 10:03:00"),
      // user 2: A → B (their first event must NOT chain off user 1's C)
      (5L, 2L, "A", "2024-01-01 10:04:00"),
      (6L, 2L, "B", "2024-01-01 10:05:00"),
      // user 3: a single event contributes no transition
      (7L, 3L, "C", "2024-01-01 10:00:00")
    ).map { case (e, u, t, s) => (e, u, t, Timestamp.valueOf(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.eventTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      ("A", "B") -> (2L, 1.0),
      ("B", "B") -> (1L, 0.5),
      ("B", "C") -> (1L, 0.5)),
      s"got $out")
  }

  test("eventTransitions: same-timestamp events order by event_id") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val ev = Seq((1L, 1L, "A", t0), (2L, 1L, "B", t0), (3L, 1L, "C", t0))
      .toDF("event_id", "user_id", "event_type", "ts")
    val pairs = EventOps.eventTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("A", "B"), ("B", "C")))
  }

  test("interArrivalProfile: gaps are within (user, type) only; exact " +
      "integer microseconds; quantiles interpolate") {
    import spark.implicits._
    val ev = Seq(
      // user 1 type A at 0s, 10s, 30s → gaps 10s, 20s
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (2L, 1L, "A", "2024-01-01 10:00:10"),
      (3L, 1L, "A", "2024-01-01 10:00:30"),
      // user 1 type B interleaved — must not shrink A's gaps
      (4L, 1L, "B", "2024-01-01 10:00:05"),
      // user 2 type A at 100s, 140s → gap 40s
      (5L, 2L, "A", "2024-01-01 10:01:40"),
      (6L, 2L, "A", "2024-01-01 10:02:20"),
      // user 3: single B event → no gap; B has no profile row
      (7L, 3L, "B", "2024-01-01 10:00:00")
    ).map { case (e, u, t, s) => (e, u, t, Timestamp.valueOf(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val rows = EventOps.interArrivalProfile(ev).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A"),
      "type B never has two events for one user")
    val a = rows.head
    assert(a.getLong(1) == 3L)                       // n_gaps
    assert(a.getLong(2) == 10000000L)                // min 10 s
    assert(a.getDouble(3) == 20000000.0)             // p50 of {10,20,40}s
    // p90 over {10,20,40}s: position 0.9*2 = 1.8 → 20s + 0.8*(40-20)s
    assert(math.abs(a.getDouble(4) - 36000000.0) < 1e-6)
    assert(a.getLong(5) == 40000000L)                // max 40 s
  }

  test("eventTrigrams: sliding length-3 windows per user in (ts, id) " +
      "order; sequences never cross users") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, "a", "2024-01-01 00:00:01"),
      (2L, 7L, "b", "2024-01-01 00:00:02"),
      (3L, 7L, "c", "2024-01-01 00:00:03"),
      (4L, 7L, "d", "2024-01-01 00:00:04"),
      (5L, 9L, "x", "2024-01-01 00:00:01"), // 2-event user: no trigram
      (6L, 9L, "y", "2024-01-01 00:00:02")
    ).map { case (e, u, t, s) => (e, u, t, Timestamp.valueOf(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.eventTrigrams(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(("a", "b", "c", 1L), ("b", "c", "d", 1L)),
      s"got ${out.mkString(", ")}")
  }

  test("conversionLag: first signup to first AT-OR-AFTER purchase; " +
      "pre-signup purchases never count, unconverted users drop") {
    import spark.implicits._
    val ev = Seq(
      // u1: purchase BEFORE signup (ignored), then one after → 30 s lag
      (1L, 1L, "purchase", "2024-01-01 00:00:00"),
      (2L, 1L, "signup", "2024-01-01 00:01:00"),
      (3L, 1L, "purchase", "2024-01-01 00:01:30"),
      (4L, 1L, "purchase", "2024-01-01 00:02:00"), // later: not first
      // u2: signup, never purchases → dropped
      (5L, 2L, "signup", "2024-01-01 00:00:00"),
      // u3: purchase only, never signs up → dropped
      (6L, 3L, "purchase", "2024-01-01 00:00:00")
    ).map { case (e, u, t, s) => (e, u, t, Timestamp.valueOf(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.conversionLag(ev, "signup", "purchase").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("lag_us")))
    assert(out.toSeq == Seq((1L, 30000000L)), s"got ${out.mkString(", ")}")
  }

  test("retentionCohorts: offset-0 cell equals cohort size; later " +
      "offsets count only returning members") {
    // weeks start Monday; 2024-01-01 and 2024-01-08 are Mondays
    val ev = events(
      (1L, 1L, "2024-01-01 10:00:00"), // u1 first: week Jan 1
      (2L, 2L, "2024-01-03 10:00:00"), // u2 first: week Jan 1
      (3L, 1L, "2024-01-08 10:00:00"), // u1 returns: offset 1
      (4L, 1L, "2024-01-10 09:00:00"), // same week — still one active row
      (5L, 3L, "2024-01-09 10:00:00")  // u3 first: week Jan 8
    )
    val out = EventOps.retentionCohorts(ev).collect().map(r =>
      (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00.0", 0L, 2L, 2L, 1.0),
      ("2024-01-01 00:00:00.0", 1L, 1L, 2L, 0.5),
      ("2024-01-08 00:00:00.0", 0L, 1L, 1L, 1.0)),
      s"got ${out.mkString(", ")}")
  }

  test("valueOutliers: exact-moment z-scores select only the planted " +
      "outlier; inliers of another type untouched") {
    import spark.implicits._
    // type A: nineteen 0.0 + one 100.0 → mean 5, std ≈ 21.79, z ≈ 4.36
    // type B: constant values → no outliers (z undefined/0-spread)
    val rows = (1L to 19L).map(i => (i, "A", 0.0)) :+ (20L, "A", 100.0)
    val ev = (rows ++ Seq((21L, "B", 7.0), (22L, "B", 7.0)))
      .map { case (e, t, v) => (e, t, v,
        Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("event_id", "event_type", "value", "ts")
    val out = EventOps.valueOutliers(ev).collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(20L))
    val z = out.head.getAs[Double]("z")
    assert(math.abs(z - 95.0 / math.sqrt(500.0 - 25.0)) < 1e-12)
  }

  test("madOutliers: Hampel rule flags the planted spike the median " +
      "resists; zero-MAD type flags nothing; nulls ignored") {
    import spark.implicits._
    // type A: {1,2,3,4,100} → median 3, |v−3| = {2,1,0,1,97} → MAD 1;
    //         only 100 exceeds 3·MAD (q83's z-score would be dragged by
    //         the spike itself — here the estimates ignore it entirely)
    // type B: constant 5s → MAD 0, strict > means nothing flagged
    val ev = (Seq((1L, "A", Some(1.0)), (2L, "A", Some(2.0)),
      (3L, "A", Some(3.0)), (4L, "A", Some(4.0)), (5L, "A", Some(100.0)),
      (6L, "B", Some(5.0)), (7L, "B", Some(5.0)), (8L, "B", Some(5.0)),
      (9L, "A", Option.empty[Double])))
      .map { case (e, t, v) =>
        (e, t, v, Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("event_id", "event_type", "value", "ts")
    val out = EventOps.madOutliers(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_outliers"),
          r.getAs[Double]("median_value"), r.getAs[Double]("mad"))))
      .toMap
    assert(out("A") == ((5L, 1L, 3.0, 1.0)), s"got ${out("A")}")
    assert(out("B") == ((3L, 0L, 5.0, 0.0)), s"got ${out("B")}")
  }

  test("sessionStats: one row per gap-delimited session with exact " +
      "duration; session count agrees with sessionize") {
    val ev = events(
      (1L, 7L, "2024-01-01 00:00:00"),
      (2L, 7L, "2024-01-01 00:10:00"), // same session (10 min gap)
      (3L, 7L, "2024-01-01 01:00:00"), // 50 min gap → new session
      (4L, 9L, "2024-01-01 00:00:00")
    ).withColumn("event_type",
      org.apache.spark.sql.functions.lit("click"))
    val out = EventOps.sessionStats(ev).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getAs[Long]("n_events"),
        r.getAs[Long]("duration_us")))
    assert(out.toSeq == Seq(
      (7L, 1L, 2L, 600000000L), // 10 min
      (7L, 2L, 1L, 0L),
      (9L, 1L, 1L, 0L)), s"got ${out.mkString(", ")}")
    // per-user session totals match q21's aggregate view
    val viaSessionize = EventOps.sessionize(ev).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_sessions")).toMap
    val viaStats = out.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(viaSessionize == viaStats)
  }

  test("rollingDistinctUsers: trailing-7-day distinct counts, repeat " +
      "user counted once per window, stale days age out, no phantom " +
      "report days") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // day 1: users 1, 2
      (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 09:00:00")), // day 2: user 1 again
      (3L, ts("2024-01-09 12:00:00"))  // day 9: outside day-1/2 windows
    ).toDF("user_id", "ts")
    val out = EventOps.rollingDistinctUsers(ev, windowDays = 7).collect()
      .map(r => (r.getDate(0).toString, r.getAs[Long]("active_users")))
      .toSeq
    // day 1 window {1,2}; day 2 window {1,2} (user 1 NOT double-
    // counted); day 9 window reaches back to day 3 → only user 3;
    // days 3-8 have no events → absent
    assert(out == Seq(("2024-01-01", 2L), ("2024-01-02", 2L),
      ("2024-01-09", 1L)), s"got $out")
  }

  test("orderedEventPaths: k-prefix in (ts, event_id) order with " +
      "same-timestamp tie-break, total count unaffected by the cut") {
    import spark.implicits._
    val ev = Seq(
      // user 7: signup and click share a timestamp — event_id orders them
      (1L, 7L, "signup", ts("2024-01-01 10:00:00")),
      (2L, 7L, "click", ts("2024-01-01 10:00:00")),
      (3L, 7L, "purchase", ts("2024-01-01 11:00:00")),
      (4L, 9L, "view", ts("2024-01-02 09:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.orderedEventPaths(ev, k = 2).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_events"),
        r.getAs[String]("path"))).toSeq
    assert(out == Seq((7L, 3L, "signup>click"), (9L, 1L, "view")),
      s"got $out")
  }

  test("negativeFunnel: blocker between first A and first-B-after " +
      "breaks clean; blockers after B or at exactly b_ts do not; " +
      "users without an A→B sequence are absent") {
    import spark.implicits._
    val ev = Seq(
      // user 1: error strictly between → dirty
      (1L, 1L, "signup", ts("2024-01-01 10:00:00")),
      (2L, 1L, "error", ts("2024-01-01 10:30:00")),
      (3L, 1L, "purchase", ts("2024-01-01 11:00:00")),
      // user 2: error only AFTER the conversion → clean
      (4L, 2L, "signup", ts("2024-01-01 10:00:00")),
      (5L, 2L, "purchase", ts("2024-01-01 11:00:00")),
      (6L, 2L, "error", ts("2024-01-01 12:00:00")),
      // user 3: purchase precedes signup, nothing after → no row
      (7L, 3L, "purchase", ts("2024-01-01 10:00:00")),
      (8L, 3L, "signup", ts("2024-01-01 11:00:00")),
      // user 4: b anchors to the FIRST purchase after signup; the
      // error sits between the two purchases, not inside the match
      (9L, 4L, "signup", ts("2024-01-01 10:00:00")),
      (10L, 4L, "purchase", ts("2024-01-01 10:30:00")),
      (11L, 4L, "error", ts("2024-01-01 10:45:00")),
      (12L, 4L, "purchase", ts("2024-01-01 11:00:00")),
      // user 5: error at EXACTLY b_ts — strict < keeps it out
      (13L, 5L, "signup", ts("2024-01-01 10:00:00")),
      (14L, 5L, "error", ts("2024-01-01 11:00:00")),
      (15L, 5L, "purchase", ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.negativeFunnel(ev).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_blockers"),
        r.getAs[Boolean]("clean"))).toSeq
    assert(out == Seq((1L, 1L, false), (2L, 0L, true),
      (4L, 0L, true), (5L, 0L, true)), s"got $out")
  }
  test("firstTouchAttribution: earliest in-window touch wins (not the " +
      "last), out-of-window and same-instant touches handled, " +
      "conversions without a touch drop") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val events = Seq(
      // user 1: touch at 0 (outside 30m window of conv at 100),
      // touches at 80 and 90 inside -> FIRST = 80
      (1L, 1L, "click", ts(0)), (2L, 1L, "click", ts(80)),
      (3L, 1L, "click", ts(90)), (4L, 1L, "purchase", ts(100)),
      // user 2: conversion with no click in window -> dropped
      (5L, 2L, "click", ts(0)), (6L, 2L, "purchase", ts(200)),
      // user 3: click at the SAME instant as the purchase does not
      // count (strictly-before frame)
      (7L, 3L, "click", ts(50)), (8L, 3L, "purchase", ts(50))
    ).map { case (id, u, t, time) => (id, u, t, time, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.firstTouchAttribution(events, "click",
      "purchase", windowMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("touch_event_id"),
        r.getAs[Long]("lag_seconds"))).toSeq
    assert(out == Seq((4L, 2L, 1200L)), s"got $out")
  }
  test("sessionTypePmi: co-session pair counted once per session, " +
      "never-co-occurring types score negative, PMI hand-checked") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // user 1 session A: {view, click} (two views - presence counts 1);
    // user 1 session B (gap > 30m): {view}; user 2: {view, error}
    val events = Seq(
      (1L, 1L, "view", 0L), (2L, 1L, "view", 5L), (3L, 1L, "click", 10L),
      (4L, 1L, "view", 100L),
      (5L, 2L, "view", 0L), (6L, 2L, "error", 1L))
      .map { case (id, u, t, m) => (id, u, t, ts(m), 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.sessionTypePmi(events, gapMinutes = 30).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("n_both"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Double]("pmi10")))).toMap
    def r6(v: Double) = BigDecimal(v).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // 3 sessions; view in 3, click in 1, error in 1
    // (click, view): n_both 1 -> pmi10 = log10(1*3/(1*3)) = 0
    assert(out(("click", "view")) == ((1L, 1L, 3L, 0.0)))
    // (error, view): n_both 1 -> log10(3/3) = 0 as well
    assert(out(("error", "view")) == ((1L, 1L, 3L, 0.0)))
    // click and error never co-occur -> pair absent (count 0)
    assert(!out.contains(("click", "error")))
  }

  test("userGrowthByWeek: new users counted in their first-seen week " +
      "only, cumulative sums monotonically to the user total") {
    import spark.implicits._
    def ts(day: Int) = new java.sql.Timestamp(
      java.time.LocalDate.of(2024, 1, day)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    // week of Jan 1 (Mon): users 1, 2; week of Jan 8: user 1 again
    // (active, not new) + user 3 (new)
    val events = Seq(
      (1L, 1L, ts(1)), (2L, 2L, ts(2)),
      (3L, 1L, ts(8)), (4L, 3L, ts(9)))
      .map { case (id, u, t) => (id, u, "view", t, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.userGrowthByWeek(events).collect()
      .map(r => (r.getAs[Long]("active_users"),
        r.getAs[Long]("new_users"), r.getAs[Long]("cum_users"))).toSeq
    assert(out == Seq((2L, 2L, 2L), (2L, 1L, 3L)), s"got $out")
  }

  test("forgetUsersAudit: hand-checked removal/retention split, value " +
      "leaving the corpus, and distinct requesting users per type") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "click", 1.50), (2L, 2L, "click", 2.25),
      (3L, 2L, "click", 0.25), (4L, 3L, "view", 5.00),
      (5L, 2L, "view", 1.00), (6L, 1L, "view", 0.75)
    ).toDF("event_id", "user_id", "event_type", "value")
    val requests = Seq(2L, 99L).toDF("user_id") // 99 has no events
    val out = EventOps.forgetUsersAudit(events, requests).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_retained"),
        r.getAs[Double]("value_removed"),
        r.getAs[Long]("n_users_removed"))).toSeq
    assert(out == Seq(
      ("click", 2L, 1L, 2.50, 1L),
      ("view", 1L, 2L, 1.00, 1L)), s"got $out")
  }

  test("forgetUsersAudit: empty request list removes nothing; " +
      "value_removed is 0.0, not null") {
    import spark.implicits._
    val events = Seq((1L, 1L, "click", 1.50))
      .toDF("event_id", "user_id", "event_type", "value")
    val out = EventOps.forgetUsersAudit(events,
      Seq.empty[Long].toDF("user_id")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_removed") == 0L)
    assert(out.head.getAs[Double]("value_removed") == 0.0)
    assert(out.head.getAs[Long]("n_users_removed") == 0L)
  }

  test("kAnonymityAudit: hand-built QI groups band by distinct-user " +
      "count, not row count") {
    import spark.implicits._
    // group (view, 10:00): 5 users -> anonymous; (click, 10:00):
    // 2 users over 4 rows -> small (row count must not promote it);
    // (buy, 11:00): 1 user -> unique
    val rows =
      (1 to 5).map(i => (i.toLong, i.toLong, "view", ts("2024-01-01 10:00:0" + i))) ++
      Seq((6L, 1L, "click", ts("2024-01-01 10:10:00")),
        (7L, 1L, "click", ts("2024-01-01 10:11:00")),
        (8L, 2L, "click", ts("2024-01-01 10:12:00")),
        (9L, 2L, "click", ts("2024-01-01 10:13:00")),
        (10L, 3L, "buy", ts("2024-01-01 11:00:00")))
    val df = rows.toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.kAnonymityAudit(df, k = 5).collect()
      .map(r => r.getAs[String]("k_band") ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("n_rows"),
          r.getAs[Double]("row_frac")))).toMap
    assert(out.keySet == Set("anonymous", "small", "unique"))
    assert(out("anonymous") == ((1L, 5L, 0.5)))
    assert(out("small") == ((1L, 4L, 0.4)))
    assert(out("unique") == ((1L, 1L, 0.1)))
  }

  test("botRegularity: a metronome user is bot_like (CV 0), a bursty " +
      "user is not, a sparse user is low_activity") {
    import spark.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // user 1: 25 events exactly 60 s apart -> 24 gaps, CV = 0
    val bot = (0 until 25).map(i =>
      (i.toLong, 1L, new Timestamp(base + i * 60000L)))
    // user 2: 25 events with alternating 1 s / 1000 s gaps -> CV ~ 1
    var t2 = base
    val bursty = (0 until 25).map { i =>
      t2 += (if (i % 2 == 0) 1000L else 1000000L); (100L + i, 2L, new Timestamp(t2))
    }
    // user 3: 3 events -> 2 gaps < minEvents
    val sparse = (0 until 3).map(i =>
      (200L + i, 3L, new Timestamp(base + i * 3600000L)))
    val df = (bot ++ bursty ++ sparse)
      .toDF("event_id", "user_id", "ts")
    val out = EventOps.botRegularity(df, minEvents = 20, cvMax = 0.5)
      .collect().map(r => r.getAs[String]("band") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_gaps"),
          r.getAs[Double]("min_cv"), r.getAs[Double]("max_cv")))).toMap
    assert(out.keySet == Set("bot_like", "regular", "low_activity") ||
      out.keySet == Set("bot_like", "bursty", "low_activity"),
      s"bands: $out")
    val (nb, gb, lob, hib) = out("bot_like")
    assert(nb == 1L && gb == 24L && lob == 0.0 && hib == 0.0)
    assert(out("low_activity")._1 == 1L && out("low_activity")._2 == 2L)
    val burstyBand = out.getOrElse("bursty", out("regular"))
    assert(burstyBand._3 > 0.9 && burstyBand._4 < 1.1,
      s"alternating-gap CV should sit near 1: $burstyBand")
  }

  test("markovStationary: Eulerian fixture with P=[[.5,.5],[.25,.75]] " +
      "converges to pi=(1/3, 2/3); pi is a distribution") {
    import spark.implicits._
    // one user's path A A A B B B B A B yields bigram counts
    // AA=2 AB=2 BA=1 BB=3 -> P(A->A)=.5 P(A->B)=.5 P(B->A)=.25 P(B->B)=.75
    val path = Seq("A", "A", "A", "B", "B", "B", "B", "A", "B")
    val base = ts("2024-01-01 00:00:00").getTime
    val df = path.zipWithIndex.map { case (t, i) =>
      (i.toLong, 1L, t, new Timestamp(base + i * 1000L))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.markovStationary(df).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("stationary_p")).toMap
    assert(math.abs(out("A") - 1.0 / 3) < 1e-9, s"pi(A)=${out("A")}")
    assert(math.abs(out("B") - 2.0 / 3) < 1e-9, s"pi(B)=${out("B")}")
    assert(math.abs(out.values.sum - 1.0) < 1e-12)
  }

  test("markovStationary: a terminal type self-loops and absorbs " +
      "all mass") {
    import spark.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val df = Seq(("A", 0), ("B", 1)).map { case (t, i) =>
      (i.toLong, 1L, t, new Timestamp(base + i * 1000L))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.markovStationary(df).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("stationary_p")).toMap
    assert(out("B") > 1.0 - 1e-12 && out("A") < 1e-12,
      s"absorbing B must take all mass: $out")
  }

  test("funnelWindowed: deadlines cut chains q50 would complete, and " +
      "a second step-1 event never re-anchors (first-touch)") {
    import spark.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val h = 3600000L
    val rows = Seq(
      // user 1: everything within 12 h windows -> 3 steps
      (10L, 1L, "signup", new Timestamp(base)),
      (11L, 1L, "click", new Timestamp(base + 1 * h)),
      (12L, 1L, "purchase", new Timestamp(base + 2 * h)),
      // user 2: purchase 13 h after click -> stops at 2
      (20L, 2L, "signup", new Timestamp(base)),
      (21L, 2L, "click", new Timestamp(base + 1 * h)),
      (22L, 2L, "purchase", new Timestamp(base + 14 * h)),
      // user 3: click 13 h after signup -> stops at 1
      (30L, 3L, "signup", new Timestamp(base)),
      (31L, 3L, "click", new Timestamp(base + 13 * h)),
      // user 4: second signup at +10 h; click at +20 h is within 12 h
      // of the SECOND signup but first-touch anchors at the first ->
      // stops at 1
      (40L, 4L, "signup", new Timestamp(base)),
      (41L, 4L, "signup", new Timestamp(base + 10 * h)),
      (42L, 4L, "click", new Timestamp(base + 20 * h)))
    val df = rows.toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.funnelWindowed(df,
      Seq("signup", "click", "purchase"), windowHours = 12)
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("steps_reached")).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 1L),
      s"got $out")
    // the unwindowed funnel completes users 2 and 3 (sanity contrast)
    val plain = EventOps.funnel(df, Seq("signup", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("steps_reached")).toMap
    assert(plain(2L) == 3L && plain(3L) == 2L)
  }

  test("trimmedMeanByType: hand-computed interpolated cuts drop the " +
      "planted outlier; the raw mean keeps it") {
    import spark.implicits._
    // values 1..19 plus outlier 1000 (n=20): p05 cut = 1.95 (between
    // v1 and v2), p95 cut = 19 + 0.05*(1000-19) = 68.05 -> kept =
    // 2..19; trimmed mean = 189/18 = 10.5; raw mean = 1190/20 = 59.5
    val base = ts("2024-01-01 00:00:00").getTime
    val df = ((1 to 19).map(_.toDouble) :+ 1000.0).zipWithIndex.map {
      case (v, i) => (i.toLong, 1L, "A", new Timestamp(base + i * 1000L), v)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.trimmedMeanByType(df).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_values") == 20L)
    assert(r.getAs[Long]("n_trimmed") == 2L)
    assert(math.abs(r.getAs[Double]("lo_cut") - 1.95) < 1e-9)
    assert(math.abs(r.getAs[Double]("hi_cut") - 68.05) < 1e-9)
    assert(r.getAs[Double]("mean_all") == 59.5)
    assert(r.getAs[Double]("trimmed_mean") == 10.5)
  }

  test("rfmSegments: four users with strictly separated R/F/M land " +
      "in four distinct diagonal segments with exact means") {
    import spark.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val day = 86400000L
    // user u: u events on consecutive days, LAST at day 30-5(u-1),
    // each valued u.0 -> R = 0/5/10/15 days, F = 1..4, M = u^2
    val rows = (1 to 4).flatMap { u =>
      val lastDay = 30 - 5 * (u - 1)
      (0 until u).map { k =>
        (u * 100L + k, u.toLong, "e",
          new Timestamp(base + (lastDay - k) * day), u.toDouble)
      }
    }
    val df = rows.toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.rfmSegments(df).collect()
      .map(r => (r.getAs[Long]("r_code"), r.getAs[Long]("f_code"),
        r.getAs[Long]("m_code")) ->
        ((r.getAs[Long]("n_users"), r.getAs[Double]("mean_recency_days"),
          r.getAs[Double]("mean_frequency"),
          r.getAs[Double]("mean_monetary")))).toMap
    // user u: recency quartile code u (R grows with u), frequency and
    // monetary code u as well (F, M grow with u)
    assert(out.keySet == Set((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L),
      (4L, 4L, 4L)), s"got ${out.keySet}")
    (1 to 4).foreach { u =>
      val (n, r, f, m) = out((u.toLong, u.toLong, u.toLong))
      assert(n == 1L)
      assert(r == 5.0 * (u - 1), s"user $u recency: $r")
      assert(f == u.toDouble && m == u.toDouble * u)
    }
  }

  test("seasonalAnomaly: a 10x spike week z-scores past 3 in its " +
      "(dow,hour) cell; a uniform type reports no anomaly and NULL z") {
    import spark.implicits._
    val base = ts("2024-01-01 09:00:00").getTime
    val week = 7L * 86400000L
    // type A: 13 weekly slots at the same (dow, hour) — twelve with
    // 10 events, the last with 100: z = 1080/sqrt(97200) = 3.4641 > 3
    val a = (0 until 13).flatMap { w =>
      val n = if (w == 12) 100 else 10
      (0 until n).map(i =>
        (w * 1000L + i, 1L, "A", new Timestamp(base + w * week + i)))
    }
    // type B: 4 weekly slots, 7 events each -> variance 0 -> NULL z
    val b = (0 until 4).flatMap { w =>
      (0 until 7).map(i =>
        (90000L + w * 100 + i, 2L, "B",
          new Timestamp(base + w * week + i)))
    }
    val df = (a ++ b).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.seasonalAnomaly(df).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val ra = out("A")
    assert(ra.getAs[Long]("n_slots") == 13L)
    assert(ra.getAs[Long]("n_anomalous") == 1L)
    val expected = 1080.0 / math.sqrt(13.0 * 11200.0 - 220.0 * 220.0)
    assert(math.abs(ra.getAs[Double]("max_abs_z") - expected) < 1e-9)
    val rb = out("B")
    assert(rb.getAs[Long]("n_slots") == 4L)
    assert(rb.getAs[Long]("n_anomalous") == 0L)
    assert(rb.isNullAt(rb.fieldIndex("max_abs_z")),
      "zero-variance cells must yield NULL z, not 0 or NaN")
  }

  test("funnelWithCi: eligibility chains through the steps and the " +
      "Wilson interval brackets each conversion") {
    import spark.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // 4 signups; users 1,2 click after; user 1 purchases after
    val rows =
      (1 to 4).map(u => (u * 10L, u.toLong, "signup",
        new Timestamp(base + u * 1000L))) ++
      Seq((100L, 1L, "click", new Timestamp(base + 100000L)),
        (101L, 2L, "click", new Timestamp(base + 100000L)),
        (200L, 1L, "purchase", new Timestamp(base + 200000L)))
    val df = rows.toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.funnelWithCi(df,
      Seq("signup", "click", "purchase")).collect()
      .sortBy(_.getAs[Long]("step"))
    assert(out.map(r => (r.getAs[Long]("n_eligible"),
      r.getAs[Long]("n_reached"))).toSeq ==
      Seq((4L, 4L), (4L, 2L), (2L, 1L)))
    assert(out.map(_.getAs[Double]("conversion")).toSeq ==
      Seq(1.0, 0.5, 0.5))
    out.foreach { r =>
      val (p, lo, hi) = (r.getAs[Double]("conversion"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= p && p <= hi, s"interval must bracket: $lo $p $hi")
      assert(lo >= 0.0 && hi <= 1.0)
      assert(hi - lo > 0.2, "n=4 must yield a WIDE interval")
    }
    // hand-check step 1 (p=1, n=4): hi clamps to 1, lo = Wilson lower
    val zz = 1.96 * 1.96
    val nd = 4.0
    val denom = 1.0 + zz / nd
    val lo1 = (1.0 + zz / (2.0 * nd)) / denom -
      (1.96 / denom) * math.sqrt(zz / (4.0 * nd * nd))
    assert(out.head.getAs[Double]("ci_hi") == 1.0)
    assert(math.abs(out.head.getAs[Double]("ci_lo") - lo1) < 1e-9)
  }

  test("trimmedMeanByType: symmetric data leaves the mean unchanged " +
      "and null values never count") {
    import spark.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (1 to 9).map(i =>
      (i.toLong, 1L, "B", new Timestamp(base + i * 1000L),
        Some(i.toDouble))) :+
      (10L, 1L, "B", new Timestamp(base + 10000L), Option.empty[Double])
    val df = rows.toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.trimmedMeanByType(df).collect().head
    assert(out.getAs[Long]("n_values") == 9L, "null row must not count")
    assert(out.getAs[Double]("mean_all") == 5.0)
    assert(out.getAs[Double]("trimmed_mean") == 5.0,
      "symmetric trim preserves the mean")
  }

  test("typeAudienceOverlap: hand-counted golden — co-occurring pairs " +
      "only, exact Jaccard") {
    import spark.implicits._
    val ev = Seq(
      (1L, 100L, "a"), (2L, 100L, "b"),
      (3L, 200L, "a"),
      (4L, 300L, "b"), (5L, 300L, "c"), (6L, 300L, "b")
    ).map { case (e, u, t) =>
      (e, u, t, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.typeAudienceOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_both"),
        r.getAs[Double]("jaccard"))).toSeq
    // audiences: a={100,200}, b={100,300}, c={300}
    // a-b share {100}: J = 1/(2+2-1); b-c share {300}: J = 1/(2+1-1);
    // a-c share nothing -> absent
    assert(out == Seq(
      ("a", "b", 1L, math.round(1.0 / 3.0 * 1e12) / 1e12),
      ("b", "c", 1L, 0.5)))
  }

  test("typeAudienceOverlapApprox: all pairs present, estimates within " +
      "HLL error of the exact counts on the harness events") {
    val ev = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "events")
    val exact = EventOps.typeAudienceOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_users_a"), r.getAs[Long]("n_users_b"),
          r.getAs[Long]("n_both"))).toMap
    val approx = EventOps.typeAudienceOverlapApprox(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("est_users_a"), r.getAs[Long]("est_users_b"),
          r.getAs[Long]("est_both"))).toMap
    // the approx emits every pair; every exact (co-occurring) pair is
    // among them
    assert(exact.keySet.subsetOf(approx.keySet))
    exact.foreach { case (pair, (na, nb, both)) =>
      val (ea, eb, eboth) = approx(pair)
      // lgK=14 -> ~0.8% RSE per sketch; inclusion-exclusion compounds
      // three estimates, give 3-sigma-ish headroom plus small-n slack
      def ok(est: Long, ex: Long): Boolean =
        math.abs(est - ex) <= math.max(5.0, 0.05 * ex)
      assert(ok(ea, na) && ok(eb, nb),
        s"$pair per-type estimates off: ($ea,$eb) vs ($na,$nb)")
      assert(math.abs(eboth - both) <=
        math.max(10.0, 0.05 * (na + nb)),
        s"$pair intersection estimate $eboth vs exact $both")
      // feasibility clamp: an intersection estimate can never be
      // negative nor exceed its smaller side's estimate
      assert(eboth >= 0L && eboth <= math.min(ea, eb),
        s"$pair est_both $eboth outside [0, min($ea,$eb)]")
    }
  }
}
