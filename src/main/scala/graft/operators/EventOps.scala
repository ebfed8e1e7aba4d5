package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactNum._

/** Event-log (time-series) operators over the `events` table. Batch forms
  * here; the streaming equivalents (Structured Streaming with watermarks /
  * mapGroupsWithState) live in graft.streaming and share the same
  * aggregation logic.
  *
  * Scale notes: all of these shuffle once, on (key) or (key, bucket); the
  * windowed forms pre-bucket on the time column so partial aggregation
  * happens map-side. Sessionization is a single window-function pass —
  * one shuffle on user_id, linear in events per user.
  */
object EventOps {

  /** Date-function projection + monthly counts (SURVEY §2.8 date funcs). */
  def monthlyEventCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("y"), col("m"), col("event_type"))

  /** Semi-structured extraction (SURVEY §1.1 semi-structured input,
    * generalized): parse the JSON props column with an explicit schema
    * (from_json — typed, codegen'd; schema-on-read like the API pages)
    * and aggregate the extracted field per event type. */
  def propsKStats(events: DataFrame): DataFrame =
    events
      .withColumn("_k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("_k")).as("k_sum"),
        min(col("_k")).as("k_min"),
        max(col("_k")).as("k_max"),
        count(col("_k")).as("n"))
      .orderBy(col("event_type"))

  /** As-of join, composed from existing operators (preference (a) of the
    * custom-operator ladder): for every `forType` event, the most recent
    * `matchType` event by the same user at-or-before its timestamp.
    *
    * Implementation is a single partition-sort window over the UNION of
    * both event streams (last ignoreNulls over an unbounded-preceding
    * frame) — one shuffle on user_id, linear scan per user. A naive
    * range join (`p.user = c.user AND c.ts <= p.ts` + max) explodes
    * quadratically per user; this shape is the 100 TB-safe as-of.
    * Tie caveat: equal (user, ts) pairs order by event_id here, while a
    * native ASOF JOIN is id-agnostic — the harness data has no such
    * ties. Inner semantics: rows with no prior match are dropped. */
  def asOfLastEvent(events: DataFrame, matchType: String,
      forType: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isMatch = col("event_type") === matchType
    events
      .filter(col("event_type").isin(matchType, forType))
      .withColumn("_m_ts",
        last(when(isMatch, col("ts")), ignoreNulls = true).over(w))
      .withColumn("_m_id",
        last(when(isMatch, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === forType && col("_m_ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("_m_id").as("match_event_id"), col("_m_ts").as("match_ts"))
      .orderBy(col("event_id"))
  }

  /** Banded temporal range join: all pairs (a, b) of events by the SAME
    * user with b strictly inside (a.ts, a.ts + gap]. The sibling of the
    * as-of join (one row per left event) — this one returns every pair
    * in the window, the shape behind co-occurrence mining and
    * session-stitching.
    *
    * Spark executes `a.user = b.user AND b.ts BETWEEN ...` as a sort-merge
    * join on user with the range as a join filter — per user that is a
    * quadratic scan of the user's whole history, which at 100 TB (years
    * of events per user) is the classic range-join blowup. Instead we
    * BAND time into gap-width buckets: b lands in bucket floor(ts/gap);
    * any a it matches lies in bucket floor(ts/gap) or the one before, so
    * exploding the LEFT side into its 2 candidate buckets turns the range
    * join into an equi-join on (user, bucket) — each a-row meets only
    * ~2 gap-windows of history, never the full user timeline, and the
    * shuffle key (user, bucket) also breaks per-user skew across
    * reducers. 2× row amplification on one side, exact range re-checked
    * post-join; no candidate pair can match twice (a's two bucket rows
    * are distinct, b has exactly one bucket). */
  def rangeJoinWithin(events: DataFrame, gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0, "gap must be positive")
    val gapUs = gapMinutes * 60L * 1000000L
    val a = events.select(col("user_id"), col("event_id").as("a_id"),
      unix_micros(col("ts")).as("a_us"))
    val b = events.select(col("user_id"), col("event_id").as("b_id"),
      unix_micros(col("ts")).as("b_us"))
    a.withColumn("_bkt",
        explode(array(floor(col("a_us") / gapUs).cast("long"),
          floor(col("a_us") / gapUs).cast("long") + 1L)))
      .join(b.withColumn("_bkt", floor(col("b_us") / gapUs).cast("long")),
        Seq("user_id", "_bkt"))
      .filter(col("b_us") > col("a_us") &&
        col("b_us") <= col("a_us") + gapUs)
      .select(col("user_id"), col("a_id"), col("b_id"),
        ((col("b_us") - col("a_us")) / 1000000L).cast("long")
          .as("gap_seconds"))
      .orderBy(col("user_id"), col("a_id"), col("b_id"))
  }

  /** Ordered funnel: for each user, the earliest strictly-increasing
    * timestamp chain through `steps` (greedy-earliest is optimal for
    * completion: taking the earliest valid event at each step can only
    * enlarge the suffix of events available for the remaining steps).
    * Output: (user_id, steps_reached, completed_at = ts of the last
    * step, null unless the whole funnel completed).
    *
    * Shape: one filtered aggregate per step — the event_type equality
    * is pushed into each scan, and every join is per-user single-row
    * (min-ts) tables, so the cost is k pruned scans + k tiny hash
    * joins, never a per-user event sort. A single-scan alternative
    * (collect_list per user + fold) shuffles every event and buffers
    * per-user history; this shape ships one row per user per step. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // stage i = (user_id, _t<i+1>): earliest completion time of the
    // funnel prefix of length i+1. Stage plans nest (stage k contains
    // stage k-1's subtree), so within the final join Spark reuses the
    // repeated exchanges rather than recomputing each prefix.
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("_t1"))
    val stages = steps.zipWithIndex.drop(1)
      .scanLeft(first) { case (prev, (step, i)) =>
        events.filter(col("event_type") === step)
          .join(prev, "user_id")
          .filter(col("ts") > col(s"_t$i"))
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as(s"_t${i + 1}"))
      }
    val base = events.select(col("user_id")).distinct()
    val joined = stages.zipWithIndex.foldLeft(base) { case (acc, (s, i)) =>
      acc.join(s.select(col("user_id"),
        col(s"_t${i + 1}").as(s"_r${i + 1}")), Seq("user_id"), "left")
    }
    joined.select(col("user_id"),
      steps.indices.map(i => when(col(s"_r${i + 1}").isNotNull, 1L)
        .otherwise(0L)).reduce(_ + _).as("steps_reached"),
      col(s"_r${steps.size}").as("completed_at"))
      .orderBy(col("user_id"))
  }

  /** True pivot (wide matrix via RelationalGroupedDataset.pivot with an
    * explicit value list — plan-stable columns; missing combinations
    * coalesced to 0 to match the conditional-count formulation). */
  def eventTypePivot(events: DataFrame): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val pivoted = events
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    pivoted.select(col("user_id") +:
      types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("user_id"))
  }

  /** Tumbling 1-hour window aggregate — Spark's `window()` bucketing, the
    * batch twin of the Structured Streaming windowed aggregation. */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"))
      .orderBy(col("hour_start"), col("event_type"))

  /** Gap-based sessionization (30-min inactivity): one window pass computes
    * session starts; the batch twin of flatMapGroupsWithState. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) >
            gapMinutes * 60L * 1000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Per-user running total (window frame aggregate, SURVEY §2.10).
    * Exact-decimal accumulation so the running values are reproducible
    * regardless of the engine's window-aggregation algorithm. */
  def runningUserTotals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"),
        sum(dec2(col("value"))).over(w).cast("double").as("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Pivot: per-user counts by event type (manual conditional aggregation
    * keeps it one scan + one shuffle; same plan Spark's pivot() makes). */
  def userEventTypeMatrix(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("clicks"),
        count(when(col("event_type") === "view", 1)).as("views"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"),
        count(when(col("event_type") === "signup", 1)).as("signups"),
        count(when(col("event_type") === "error", 1)).as("errors"))
      .orderBy(col("user_id"))

  /** Markov transition matrix over per-user event sequences: counts of
    * adjacent (prev_type → type) pairs plus the row-conditional
    * probability p(next | prev) — the "what follows what" report behind
    * funnel design and bot/anomaly detection (a user whose transition
    * distribution is far from the corpus matrix is automated traffic).
    *
    * Determinism: the per-user order is the total key (ts, event_id);
    * the probability is a single division of two exact integers, so it
    * is bit-identical across engines and partitionings.
    *
    * Scale shape: one window pass per user (shuffle on user_id, linear
    * in each user's events — the sessionize shape), then a hash
    * aggregate whose result is bounded by #event_types², so the final
    * window (row-normalization) runs over a constant-size table no
    * matter the corpus. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /** Weekly retention cohorts: users bucketed by the ISO week of their
    * FIRST event; for each (cohort_week, week_offset) the count of
    * cohort members active that week and the retention ratio — the
    * canonical growth-accounting triangle.
    *
    * Determinism: week truncation and the offset are integer arithmetic
    * on epoch microseconds (UTC session, no DST), and the ratio is one
    * division of two exact counts — bit-identical across engines.
    *
    * Scale shape: first-event is a min-aggregate on user_id (the only
    * data-sized exchange); activity distinct-pairs reuses the same
    * user_id shuffle; the cohort matrix is bounded by #weeks², and the
    * cohort-size join is a broadcast of that bounded table. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val firsts = events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).as("cohort_week"))
    val active = events
      .select(col("user_id"),
        date_trunc("week", col("ts")).as("week"))
      .distinct()
    val cells = active.join(firsts, "user_id")
      .select(col("cohort_week"),
        ((unix_micros(col("week")) - unix_micros(col("cohort_week")))
          / weekUs).cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size"))
          .as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Per-type z-score outliers: events whose value sits more than
    * `zThreshold` standard deviations from their type's mean — the
    * monitoring primitive behind alerting and fraud triage.
    *
    * Determinism: mean and variance come from EXACT decimal sums
    * (dec2 value and its decimal square — sum order cannot change
    * them); the per-row z is then a fixed chain of IEEE double ops on
    * identical inputs, so the >threshold cut selects the same rows in
    * any engine. Population (not sample) variance.
    *
    * Scale shape: one shuffle for the per-type aggregate (bounded by
    * #event_types), broadcast back over a single events scan —
    * map-side filter, no second shuffle. */
  def valueOutliers(events: DataFrame, zThreshold: Double = 3.0)
      : DataFrame = {
    val stats = events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).as("s1"),
        sum(dec2(col("value")) * dec2(col("value"))).as("s2"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("n")).as("mean"),
        sqrt((col("s2").cast("double") / col("n")) -
          (col("s1").cast("double") / col("n")) *
          (col("s1").cast("double") / col("n"))).as("stddev"))
    events.join(broadcast(stats), "event_type")
      // zero-spread groups have no meaningful z (0/0 → NaN, whose
      // comparison semantics differ across engines) — excluded
      .filter(col("stddev") > 0.0)
      .withColumn("z",
        (col("value") - col("mean")) / col("stddev"))
      .filter(abs(col("z")) > zThreshold)
      .select(col("event_id"), col("event_type"), col("value"),
        col("mean"), col("z"))
      .orderBy(col("event_id"))
  }

  /** Per-session statistics: sessionize (same 30-min gap rule as q21),
    * then one row per (user, session) with its event count, distinct
    * types, and exact duration — the table session-quality dashboards
    * aggregate further.
    *
    * Determinism: session boundaries are exact integer gap compares
    * over the pinned (ts, event_id) order; durations are integer
    * microseconds.
    *
    * Scale shape: the same single user_id window pass as sessionize
    * (the running session counter is one more window sum on the
    * already-sorted frame — no extra shuffle), then a hash aggregate
    * on (user_id, session_id). */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) >
            gapMinutes * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Moving-window average (last `nRows` events per user, inclusive):
    * the smoothing pass behind rate dashboards — a bounded ROWS frame,
    * not the cumulative frame of runningUserTotals. Exact-decimal
    * frame sums divided once per row keep every value reproducible at
    * any parallelism. One user_id window pass. */
  def movingAverage(events: DataFrame, nRows: Int = 4): DataFrame = {
    require(nRows > 0, "window must cover at least the current row")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(nRows - 1).toLong, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"),
        (sum(dec2(col("value"))).over(w).cast("double") /
          count(lit(1)).over(w)).as("moving_avg"),
        count(lit(1)).over(w).as("frame_n"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Unpivot (wide → long): the inverse of the q23 per-user event-type
    * matrix, via Spark's native melt — one map-side row expansion, no
    * shuffle beyond the matrix's own. Zero cells survive as explicit
    * (user, type, 0) rows — the contract that distinguishes unpivot
    * from a plain re-aggregation. */
  def eventMatrixLong(events: DataFrame): DataFrame = {
    val wide = userEventTypeMatrix(events)
    wide.unpivot(
      Array(col("user_id")),
      Array(col("clicks"), col("views"), col("purchases"),
        col("signups"), col("errors")),
      "event_kind", "n")
      .orderBy(col("user_id"), col("event_kind"))
  }

  /** Length-3 event paths (the trigram extension of q74's transition
    * matrix): counts of consecutive (a → b → c) type sequences per
    * user order — the funnel-DISCOVERY statistic (q50 verifies a
    * hypothesized funnel; this surfaces the paths worth hypothesizing).
    *
    * Scale shape: one user_id window pass (two lags share the single
    * sort), then a hash aggregate bounded by #event_types³. */
  def eventTrigrams(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("t1"), col("t2"), col("t3"))
  }

  /** Conversion lag: for each user with a `to` event at-or-after their
    * first `from` event, the exact microsecond lag between the first
    * `from` and the first subsequent `to` — the time-to-convert table
    * cohort and funnel dashboards aggregate.
    *
    * Scale shape: two type-filtered min-aggregates on user_id (each
    * scan prunes to one event type) + one user-keyed join — the q50
    * funnel shape at k=2, one row per user per side. */
  def conversionLag(events: DataFrame, from: String, to: String)
      : DataFrame = {
    val firstFrom = events.filter(col("event_type") === from)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("from_ts"))
    val firstTo = events.filter(col("event_type") === to)
      .join(firstFrom, "user_id")
      .filter(col("ts") >= col("from_ts"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("to_ts"))
    firstFrom.join(firstTo, "user_id")
      .select(col("user_id"), col("from_ts"), col("to_ts"),
        (unix_micros(col("to_ts")) - unix_micros(col("from_ts")))
          .as("lag_us"))
      .orderBy(col("user_id"))
  }

  /** Per-type inter-arrival profile: for each event type, the
    * distribution of the gap (microseconds, exact integers) between a
    * user's consecutive events of THAT type — purchase frequency, error
    * burstiness, the cadence statistic capacity planning reads.
    *
    * The gap is independent of the (ts, event_id) tie-break: lag(ts)
    * over equal timestamps yields the same multiset of gaps whichever
    * tie order the engine picks.
    *
    * Scale shape: one window pass keyed (user_id, event_type) — finer
    * than sessionize's key, so skew is strictly lower; the exact
    * grouped percentile is the q60 correctness-baseline trade
    * (percentile_approx is the documented 100 TB swap, as x12/x07). */
  def interArrivalProfile(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        percentile(col("gap_us"), lit(0.5)).as("p50_gap_us"),
        percentile(col("gap_us"), lit(0.9)).as("p90_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy(col("event_type"))
  }

  /** Robust (median/MAD) outlier report per event type — the q83 z-score
    * detector's heavy-tail-safe twin: mean and stddev are themselves
    * dragged by the outliers they hunt, while the median absolute
    * deviation has a 50% breakdown point (Hampel's rule: flag
    * |v − median| > `madK` · MAD). The report returns per-type counts
    * plus the location/scale estimates a monitoring pipeline alerts on.
    *
    * Three bounded passes over a |event_type|-keyed aggregate: exact
    * median per type, exact MAD per type (each a grouped percentile —
    * the q60 correctness-baseline trade, percentile_approx being the
    * documented 100 TB swap), then one conditional-count aggregate; the
    * per-type medians ride broadcast joins (|event_types| rows), so the
    * fact table is scanned, never shuffled wide. */
  def madOutliers(events: DataFrame, madK: Double = 3.0): DataFrame = {
    val med = events
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val mad = events
      .filter(col("value").isNotNull)
      .join(broadcast(med), "event_type")
      .groupBy(col("event_type"), col("med"))
      .agg(percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
    events
      .filter(col("value").isNotNull)
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(abs(col("value") - col("med")) > col("mad") * madK, 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n_events"), col("n_outliers"),
        round(col("med"), 12).as("median_value"),
        round(col("mad"), 12).as("mad"))
      .orderBy(col("event_type"))
  }

  /** Trailing-`windowDays` distinct active users per calendar day (the
    * rolling WAU/MAU report): for every day that has events, how many
    * distinct users appeared in [day − windowDays + 1, day]. EXACT
    * distinct over a sliding window — which no frame-based window
    * aggregate can express (count(distinct) isn't frameable) — via
    * coverage fan-out: each distinct (day, user) pair claims the
    * `windowDays` report days it keeps the user active on, then one
    * distinct + one count per day. Report days are restricted to days
    * that actually have events (no phantom trailing days).
    *
    * Scale shape: the fan-out is a bounded ×windowDays map-side
    * explode of the (day, user) DISTINCT pairs — already ≪ the event
    * log — and both aggregates partial map-side; shuffle keys are
    * (day, user) then day. At 100 TB the HLL swap (x01's sketch,
    * mergeable per day-bucket) answers the same report
    * approximately with no second distinct. */
  /** Ordered event-path strings: each user's first `k` event types in
    * (ts, event_id) order joined with '>', plus the user's TOTAL event
    * count — the per-user journey table behind funnel/path mining
    * (q88 counts fixed-length windows; this materializes the actual
    * prefix). Spark has no ordered string_agg — the order is carried
    * explicitly: collect_list of (rank, type) structs, array_sort on
    * the rank (struct ordering is field-order), then project + join.
    * Deterministic under ts ties via the event_id tie-break.
    *
    * Scale shape: one shuffle on user_id shared by both windows and
    * the aggregate; the collect_list is k-bounded per user (the rank
    * filter runs BEFORE the aggregate), so state never exceeds k
    * types per user. */
  def orderedEventPaths(events: DataFrame, k: Int = 8): DataFrame = {
    require(k > 0, "k must be positive")
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("_n", count(lit(1)).over(wAll))
      .filter(col("_rn") <= k)
      .groupBy(col("user_id"))
      .agg(max(col("_n")).as("n_events"),
        concat_ws(">", transform(
          array_sort(collect_list(struct(col("_rn"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
      .orderBy(col("user_id"))
  }

  /** Negative-condition funnel (MATCH_RECOGNIZE's "A then B with no C
    * between"): per user, the first `start` event, the first `finish`
    * strictly after it, and the count of `blocker` events strictly
    * between the two — `clean` marks conversions no blocker
    * interrupted. The question q50's positive funnel cannot ask: q50
    * says B followed A; this says NOTHING bad happened in between
    * (e.g. signup → purchase with no error). Strict inequalities +
    * min-of-type anchors make the match unique and deterministic.
    *
    * Scale shape: two filtered-by-type pruned aggregates (shuffle ∝
    * that type's events, never the log), one user-keyed join between
    * them, then a user-keyed left join against only the blocker-type
    * slice with a conditional count — each stage's key is user_id, so
    * AQE's skew split applies if one user dominates. */
  def negativeFunnel(events: DataFrame, start: String = "signup",
      finish: String = "purchase", blocker: String = "error")
      : DataFrame = {
    val firstA = events.filter(col("event_type") === start)
      .groupBy(col("user_id")).agg(min(col("ts")).as("a_ts"))
    val firstBAfter = events.filter(col("event_type") === finish)
      .select(col("user_id"), col("ts"))
      .join(firstA, Seq("user_id"))
      .filter(col("ts") > col("a_ts"))
      .groupBy(col("user_id"), col("a_ts"))
      .agg(min(col("ts")).as("b_ts"))
    val blockers = events.filter(col("event_type") === blocker)
      .select(col("user_id"), col("ts"))
    firstBAfter
      .join(blockers, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("a_ts"), col("b_ts"))
      .agg(count(when(col("ts") > col("a_ts") &&
        col("ts") < col("b_ts"), lit(1))).as("n_blockers"))
      .withColumn("clean", col("n_blockers") === 0)
      .orderBy(col("user_id"))
  }

  def rollingDistinctUsers(events: DataFrame, windowDays: Int = 7)
      : DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val userDays = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      // persisted: the (day, user) presence table feeds the day spine
      // AND the window count. Caching contract: the returned frame is
      // lazy over the entry — evictable, swept by one-shot runners
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val activeDays = userDays.select(col("day")).distinct()
    userDays
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("_i"),
        col("day"), col("user_id"))
      .select(date_add(col("day"), col("_i")).as("day"), col("user_id"))
      .distinct()
      .join(activeDays, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy(col("day"))
  }
  /** FIRST-touch attribution — q38's mirror: for every `convType`
    * event, the EARLIEST `touchType` event by the same user STRICTLY
    * within the preceding `windowMinutes` (marketing's first-touch
    * model: the touch that opened the converting journey gets the
    * credit; q38's as-of gives last-touch). Conversions with no touch
    * in the window drop (inner semantics, as q38).
    *
    * Scale shape: one per-user RANGE-frame window (numeric µs order,
    * frame [−window, −1] — bounded lookback, linear per user) finds
    * the first-touch timestamp; the touch ids attach by one hash
    * join on (user, µs) against the touch slice, with a min fold in
    * case of same-instant touches. No range join, no quadratic
    * per-user scan. */
  def firstTouchAttribution(events: DataFrame, touchType: String,
      convType: String, windowMinutes: Int): DataFrame = {
    require(windowMinutes > 0, "window must be positive")
    val winUs = windowMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("_us"))
      .rangeBetween(-winUs, -1)
    val isTouch = col("event_type") === touchType
    val conv = events
      .filter(col("event_type").isin(touchType, convType))
      .withColumn("_us", unix_micros(col("ts")))
      .withColumn("_ft_us", min(when(isTouch, col("_us"))).over(w))
      .filter(col("event_type") === convType && col("_ft_us").isNotNull)
      .select(col("event_id"), col("user_id"), col("value"),
        col("_us"), col("_ft_us"))
    val touches = events.filter(col("event_type") === touchType)
      .select(col("user_id"), unix_micros(col("ts")).as("_ft_us"),
        col("event_id").as("_tid"))
    conv
      .join(touches, Seq("user_id", "_ft_us"))
      .groupBy(col("event_id"), col("user_id"), col("value"),
        col("_us"), col("_ft_us"))
      .agg(min(col("_tid")).as("touch_event_id"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("touch_event_id"),
        expr("(_us - _ft_us) div 1000000").as("lag_seconds"))
      .orderBy(col("event_id"))
  }
  /** Within-session event-type PMI: which event types co-occur in the
    * SAME session more (or less) than independence predicts — the
    * association mining behind funnel design ("error co-occurs with
    * purchase sessions 3× base rate" is a checkout bug signal) one
    * level above q74's adjacent-transition matrix: PMI sees
    * co-presence at any distance within the session.
    *
    * Determinism: session ids are the q21 gap cumsum over the total
    * (ts, event_id) order; counts are exact; each PMI is ONE log of a
    * ratio of exact integers, round(6).
    *
    * Scale shape: the sessionizer is one per-user window pass; the
    * (session, type) presence table is session-count-sized; the
    * co-occurrence self-join keys on the session id with ≤ |types|
    * rows per key (bounded fan-out, never user-history-sized), and
    * the final fold is |types|²-bounded.
    *
    * Caching contract: the returned frame is LAZY over the persisted
    * presence table (it feeds three plan consumers), so the cache
    * entry lives until the caller's session drops it — evictable
    * MEMORY_AND_DISK; one-shot runners (Bench/Verify) sweep it after
    * execution, long-lived sessions should spark.catalog.clearCache()
    * between unrelated workloads. */
  def sessionTypePmi(events: DataFrame, gapMinutes: Int = 30)
      : DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("_prev"))) >
            gapMinutes * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("_sid", sum(col("_new")).over(run))
      .select(col("user_id"), col("_sid"), col("event_type"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = sess.select(col("user_id"), col("_sid")).distinct()
      .agg(count(lit(1)).as("_n"))
    val tcount = sess.groupBy(col("event_type"))
      .agg(count(lit(1)).as("_nt"))
    val pairs = sess.as("a")
      .join(sess.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a._sid") === col("b._sid") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(tcount.select(col("event_type").as("type_a"),
        col("_nt").as("_na"))), "type_a")
      .join(broadcast(tcount.select(col("event_type").as("type_b"),
        col("_nt").as("_nb"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("_na").as("n_a"), col("_nb").as("n_b"),
        round(log10(col("n_both").cast("double") *
          col("_n").cast("double") /
          (col("_na").cast("double") * col("_nb").cast("double"))), 6)
          .as("pmi10"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Weekly user-growth curve: active users, NEW users (first-ever
    * activity that week) and the cumulative user base per week — the
    * q76 vocabulary-growth reading applied to the user dimension (a
    * flattening new-user curve with steady actives is retention doing
    * the work; both flattening is stall).
    *
    * Scale shape: first-seen is one per-user min aggregate; weekly
    * actives one distinct + count; the cumulative window runs over
    * |weeks| metadata rows. Weeks stay TIMESTAMP (comparator
    * normalizes timestamps, not DATE encodings). */
  def userGrowthByWeek(events: DataFrame): DataFrame = {
    val active = events
      .select(date_trunc("week", col("ts")).as("week"), col("user_id"))
      .distinct()
      .groupBy(col("week"))
      .agg(count(lit(1)).as("active_users"))
    val firstSeen = events
      .groupBy(col("user_id")).agg(min(col("ts")).as("_first"))
      .select(date_trunc("week", col("_first")).as("week"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("new_users"))
    active
      .join(firstSeen, Seq("week"), "left")
      .select(col("week"), col("active_users"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users",
        sum(col("new_users")).over(Window.orderBy(col("week"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("week"))
  }

  /** Right-to-be-forgotten propagation audit (q187): given a deletion
    * request list (user ids), report per event type what a compliance
    * sweep would remove vs retain — event counts, the exact decimal
    * value total leaving the corpus, and how many distinct requesting
    * users actually had rows of that type. The transform itself is the
    * trivial anti join; the AUDIT is what a deletion pipeline reviews
    * and archives before destroying data, and what this operator
    * produces deterministically.
    *
    * Scale shape: the request list is bounded (requests are human-scale
    * even when the corpus is not) → it broadcasts, the fact table is
    * scanned ONCE with a map-side membership flag (left broadcast join,
    * zero fact shuffle), and one partial+final aggregate folds to
    * |event types| rows. count(distinct user) per type re-shuffles only
    * the flagged slice's (type, user) pairs — bounded by the request
    * list × types, not the corpus. */
  def forgetUsersAudit(events: DataFrame, requests: DataFrame)
      : DataFrame = {
    val req = broadcast(requests.select(col("user_id")).distinct()
      .withColumn("_forget", lit(1)))
    events
      .join(req, Seq("user_id"), "left")
      .groupBy(col("event_type"))
      .agg(
        count(when(col("_forget").isNotNull, lit(1))).as("n_removed"),
        count(when(col("_forget").isNull, lit(1))).as("n_retained"),
        coalesce(dsum(when(col("_forget").isNotNull, col("value"))),
          lit(0d)).as("value_removed"),
        countDistinct(when(col("_forget").isNotNull, col("user_id")))
          .as("n_users_removed"))
      .orderBy(col("event_type"))
  }

  /** q194: k-anonymity audit (Sweeney 2002) over the event log — the
    * OTHER half of the q187 compliance pair: q187 audits what a
    * deletion removes; this audits what a RELEASE would re-identify.
    * Quasi-identifier = (event_type, activity hour): every row in a
    * QI group whose DISTINCT-USER count is below k is re-identifiable
    * by an adversary who knows when and what a target did. Groups
    * band into `unique` (one user), `small` (2..k−1) and `anonymous`
    * (≥ k); per band: QI groups, rows, the row fraction, and the
    * user-count range — the table a privacy review reads before
    * approving an export.
    *
    * Determinism: banding is pure integer compare on exact counts;
    * the row fraction is one division of exact counts, round 12.
    *
    * Scale shape: ONE fact aggregate on (type, hour) with a two-phase
    * distinct-user count (partial (type,hour,user) dedup map-side);
    * the QI-group table is bounded by |types|·|hours-of-history| —
    * metadata even at 100 TB — and everything after (banding, the
    * total-rows window for the fraction) runs on that bounded table. */
  def kAnonymityAudit(events: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val groups = events
      .select(col("event_type"),
        date_trunc("hour", col("ts")).as("_qh"), col("user_id"))
      .groupBy(col("event_type"), col("_qh"))
      .agg(count(lit(1)).as("_rows"),
        countDistinct(col("user_id")).as("_users"))
    val banded = groups
      .select(
        when(col("_users") === 1, lit("unique"))
          .when(col("_users") < k, lit("small"))
          .otherwise(lit("anonymous")).as("k_band"),
        col("_rows"), col("_users"))
      .groupBy(col("k_band"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("_rows")).as("n_rows"),
        min(col("_users")).as("min_users"),
        max(col("_users")).as("max_users"))
    banded
      .select(col("k_band"), col("n_groups"), col("n_rows"),
        round(col("n_rows").cast("double") /
          sum(col("n_rows")).over(Window.partitionBy()).cast("double"),
          12).as("row_frac"),
        col("min_users"), col("max_users"))
      .orderBy(col("k_band"))
  }

  /** q196: bot-likeness audit — per-user inter-arrival REGULARITY.
    * Organic users are bursty (coefficient of variation of the gap
    * near or above 1, the exponential's signature); schedulers and
    * scrapers tick (CV near 0). Each user's gap CV comes from exact
    * integer moments, then users band into `bot_like` (n ≥ minEvents
    * and CV ≤ cvMax), `regular` (CV ≤ 1), `bursty` (CV > 1) and
    * `low_activity` (too few gaps to judge); per band: users, events,
    * and the CV range + mean — the triage table a data-cleaning run
    * reviews before excluding automated traffic from behavioral
    * analytics (q74/q79/q84 are all distorted by bots).
    *
    * Determinism: gaps are integer microseconds; n, Σg, Σg² are exact
    * BIGINT/DECIMAL sums (g cast DECIMAL(18,0) before squaring here —
    * product DECIMAL(37,0); the oracle casts to DECIMAL(19,0) because
    * DuckDB multiplies DECIMAL(≤18) in int64 and overflows on µs-scale
    * gaps — both sides are exact integers, so the sums agree);
    * population CV = √(n·Σg² − (Σg)²) / Σg is one fixed IEEE chain on
    * identical inputs, round 12. Band means are exact-decimal sums of
    * the rounded CVs divided once.
    *
    * Scale shape: one shuffle on user_id for the lag window (linear
    * per user), fold to |users| metadata rows (n, Σg, Σg² — 3 numbers
    * per user), then a bounded 4-row band aggregate. The per-user
    * frame never carries event payloads. */
  def botRegularity(events: DataFrame, minEvents: Int = 20,
      cvMax: Double = 0.5): DataFrame = {
    require(minEvents >= 2, "minEvents must be at least 2")
    val dec = org.apache.spark.sql.types.DecimalType(18, 0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("_gap",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .filter(col("_gap").isNotNull)
    val perUser = gaps
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("_n"),
        sum(col("_gap")).as("_sg"),
        sum(col("_gap").cast(dec) * col("_gap").cast(dec)).as("_sgg"))
      .select(col("user_id"), col("_n"),
        // CV = std/mean = sqrt(n*Sgg - Sg^2)/Sg: one double chain over
        // exact sums (Sg > 0 — gaps are strictly positive micros).
        // greatest(·, 0): n·Sgg − Sg² ≥ 0 exactly (Cauchy–Schwarz) but
        // the double casts can land an ulp under 0 at variance ≈ 0,
        // and sqrt(−ε) would NaN the band on both engines
        round(
          sqrt(greatest(
            col("_n").cast("double") * col("_sgg").cast("double") -
              col("_sg").cast("double") * col("_sg").cast("double"),
            lit(0.0))) /
            col("_sg").cast("double"), 12).as("_cv"))
    perUser
      .select(
        when(col("_n") < minEvents, lit("low_activity"))
          .when(col("_cv") <= cvMax, lit("bot_like"))
          .when(col("_cv") <= 1.0, lit("regular"))
          .otherwise(lit("bursty")).as("band"),
        col("_n"), col("_cv"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("_n")).as("n_gaps"),
        round(min(col("_cv")), 12).as("min_cv"),
        round(sum(col("_cv").cast(
            org.apache.spark.sql.types.DecimalType(26, 12)))
          .cast("double") / count(lit(1)).cast("double"), 12)
          .as("mean_cv"),
        round(max(col("_cv")), 12).as("max_cv"))
      .orderBy(col("band"))
  }

  /** q201: RFM segmentation — the classic customer-value grid: per
    * user Recency (days since last event, relative to the corpus max
    * so the report is reproducible), Frequency (events) and Monetary
    * (exact value sum), each quartile-coded 1..4 against GLOBAL
    * quartile cuts, then folded to the segment grid (≤64 rows) with
    * per-segment means. Codes are raw quartile indexes of the metric
    * (r_code 1 = most recent quartile, f_code/m_code 4 = most
    * active/valuable).
    *
    * Determinism: R is integer days; cuts are q32's exact
    * quantile_cont/percentile pairing over the per-user frame; code
    * assignment compares the same doubles on both engines; segment
    * means divide exact sums once, round 12.
    *
    * Scale shape: one user-keyed aggregate (|users| rows of 3
    * numbers), ONE bounded percentile aggregate over that frame
    * (9 cut doubles — NOT a global ntile window: rank-binning via
    * cutoffs is the q94-documented corpus-scale form), the 1-row cut
    * table broadcasts back, coding is map-side, and the final fold is
    * ≤64 rows. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val maxTs = events.agg(max(unix_micros(col("ts"))).as("_mx"))
    val perUser = events
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("_last"),
        count(lit(1)).as("_f"),
        coalesce(dsum(col("value")), lit(0d)).as("_m"))
      .crossJoin(broadcast(maxTs))
      .select(col("user_id"),
        expr(s"(_mx - _last) div $dayUs").as("_r"),
        col("_f"), col("_m"))
    val cuts = perUser.agg(
      percentile(col("_r").cast("double"), lit(0.25)).as("_r1"),
      percentile(col("_r").cast("double"), lit(0.5)).as("_r2"),
      percentile(col("_r").cast("double"), lit(0.75)).as("_r3"),
      percentile(col("_f").cast("double"), lit(0.25)).as("_f1"),
      percentile(col("_f").cast("double"), lit(0.5)).as("_f2"),
      percentile(col("_f").cast("double"), lit(0.75)).as("_f3"),
      percentile(col("_m"), lit(0.25)).as("_m1"),
      percentile(col("_m"), lit(0.5)).as("_m2"),
      percentile(col("_m"), lit(0.75)).as("_m3"))
    def code(v: org.apache.spark.sql.Column, c1: String, c2: String,
        c3: String): org.apache.spark.sql.Column =
      lit(1L) + when(v > col(c1), 1L).otherwise(0L) +
        when(v > col(c2), 1L).otherwise(0L) +
        when(v > col(c3), 1L).otherwise(0L)
    perUser
      .crossJoin(broadcast(cuts))
      .select(
        code(col("_r").cast("double"), "_r1", "_r2", "_r3").as("r_code"),
        code(col("_f").cast("double"), "_f1", "_f2", "_f3").as("f_code"),
        code(col("_m"), "_m1", "_m2", "_m3").as("m_code"),
        col("_r"), col("_f"), col("_m"))
      .groupBy(col("r_code"), col("f_code"), col("m_code"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("_r")).as("_sr"), sum(col("_f")).as("_sf"),
        sum(col("_m").cast(
          org.apache.spark.sql.types.DecimalType(18, 2))).as("_sm"))
      .select(col("r_code"), col("f_code"), col("m_code"),
        col("n_users"),
        round(col("_sr").cast("double") /
          col("n_users").cast("double"), 12).as("mean_recency_days"),
        round(col("_sf").cast("double") /
          col("n_users").cast("double"), 12).as("mean_frequency"),
        // round 6, not 12: the exact DECIMAL sum converts to double
        // via different paths (JVM direct vs DuckDB int128 + scale
        // divide) and at 10^3-10^4 magnitudes a last-ulp gap is wider
        // than the round-12 grid
        round(col("_sm").cast("double") /
          col("n_users").cast("double"), 6).as("mean_monetary"))
      .orderBy(col("r_code"), col("f_code"), col("m_code"))
  }

  /** q202: seasonality-adjusted volume anomaly audit — per event type,
    * each OBSERVED (epoch-hour) slot's count z-scored against that
    * type's (day-of-week, hour-of-day) baseline, the standard way to
    * catch a traffic spike without alerting on every Monday morning
    * (q83 z-scores values against a global mean; this z-scores VOLUME
    * against its seasonal cell). Reported per type: slots, anomalous
    * slots (|z| > zThresh), and the worst |z| — a max that is useful
    * even when nothing crosses the threshold.
    *
    * Determinism: slot counts are exact integers; dow/hour are pure
    * integer arithmetic on epoch hours ((days + 4) mod 7 — no
    * engine dayofweek() convention involved); z = (n·k − Σn) /
    * √(k·Σn² − (Σn)²) is one double chain on exact sums (squares in
    * DECIMAL, q196's discipline), round 12 at the max.
    *
    * Statistical caveat (by design): each slot is z-scored against a
    * baseline that INCLUDES the slot itself — the plain population
    * z over the cell, not a leave-one-out score. For well-observed
    * cells (k ≥ ~10 weeks of history) the self-inclusion dampens |z|
    * by at most ~1/k and is the conventional seasonal-baseline read;
    * for SPARSE cells it dampens hard — a k=1 cell always gets a
    * null z (den = 0) yet still counts in n_slots — so low-k cells'
    * non-anomalous verdicts deserve no trust. Callers needing
    * sparse-cell honesty should filter on a minimum _k before
    * alerting; the report deliberately keeps the raw convention so
    * its numbers match the standard dashboards it audits.
    *
    * Scale shape: one (type, hour-slot) count aggregate (bounded by
    * |types|·|hours-of-history| — metadata), a (type, dow, hour) fold
    * of that (≤ |types|·168 rows) broadcast back, and a |types|-row
    * final fold. The fact table is scanned once. */
  def seasonalAnomaly(events: DataFrame, zThresh: Double = 3.0)
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 0)
    val slots = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("_eh"))
      .groupBy(col("event_type"), col("_eh"))
      .agg(count(lit(1)).as("_n"))
      .select(col("event_type"), col("_eh"), col("_n"),
        pmod(expr("_eh div 24") + 4L, lit(7L)).as("_dow"),
        pmod(col("_eh"), lit(24L)).as("_hour"))
    val profile = slots
      .groupBy(col("event_type"), col("_dow"), col("_hour"))
      .agg(count(lit(1)).as("_k"), sum(col("_n")).as("_s1"),
        sum(col("_n").cast(dec) * col("_n").cast(dec)).as("_s2"))
    val den = sqrt(greatest(
      col("_k").cast("double") * col("_s2").cast("double") -
        col("_s1").cast("double") * col("_s1").cast("double"),
      lit(0.0)))
    val z = when(den > 0,
      (col("_n") * col("_k") - col("_s1")).cast("double") / den)
    slots
      .join(broadcast(profile), Seq("event_type", "_dow", "_hour"))
      .select(col("event_type"), abs(z).as("_az"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_slots"),
        count(when(col("_az") > zThresh, lit(1))).as("n_anomalous"),
        round(max(col("_az")), 12).as("max_abs_z"))
      .orderBy(col("event_type"))
  }

  /** q203: the q50 funnel with Wilson 95% score intervals on each
    * step's conversion — q193's statistical-honesty discipline applied
    * to funnels: a step-2 conversion of 38% over 40 users and over
    * 40,000 are different facts, and the Wilson interval (the
    * recommended small-n binomial interval — Brown/Cai/DasGupta 2001)
    * says which. Per step: eligible users (reached the previous
    * step), reached users, conversion, and [ci_lo, ci_hi].
    *
    * Determinism: counts come from the q50 funnel (exact); the Wilson
    * chain is fixed IEEE arithmetic on those counts — z² written as
    * 1.96·1.96 on BOTH engines (a 3.8416 literal is a different
    * double) — round 12.
    *
    * Scale shape: q50's per-step pruned scans fold to ONE row of
    * step counts; the per-step explode and the interval arithmetic
    * run on |steps| metadata rows. */
  def funnelWithCi(events: DataFrame, steps: Seq[String])
      : DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val f = funnel(events, steps)
    val counts = f.agg(count(lit(1)).as("_n0"),
      steps.indices.map(i =>
        count(when(col("steps_reached") >= i + 1, lit(1)))
          .as(s"_n${i + 1}")): _*)
    val rows = counts.select(explode(array(
      steps.zipWithIndex.map { case (s, i) =>
        struct(lit((i + 1).toLong).as("step"), lit(s).as("event_type"),
          col(s"_n$i").as("n_eligible"),
          col(s"_n${i + 1}").as("n_reached"))
      }: _*)).as("_s")).select(col("_s.*"))
    val zz = lit(1.96) * lit(1.96)
    val nd = col("n_eligible").cast("double")
    val p = col("n_reached").cast("double") / nd
    val denom = lit(1.0) + zz / nd
    val center = (p + zz / (lit(2.0) * nd)) / denom
    val half = (lit(1.96) / denom) *
      sqrt(p * (lit(1.0) - p) / nd + zz / (lit(4.0) * nd * nd))
    rows.select(col("step"), col("event_type"), col("n_eligible"),
      col("n_reached"),
      when(col("n_eligible") > 0, round(p, 12)).as("conversion"),
      when(col("n_eligible") > 0,
        round(greatest(center - half, lit(0.0)), 12)).as("ci_lo"),
      when(col("n_eligible") > 0,
        round(least(center + half, lit(1.0)), 12)).as("ci_hi"))
      .orderBy(col("step"))
  }

  /** q205: first-touch WINDOWED funnel — q50 with a conversion
    * deadline: step i+1 counts only within `windowHours` of step i's
    * completion. Semantics are FIRST-TOUCH (the Amplitude-style
    * default): step 1 anchors at its earliest occurrence and each
    * later step at its earliest in-window occurrence; a user who
    * misses a window does NOT get to re-anchor on a later step-1
    * event. Deterministic and one-pass — the exists-any-chain
    * alternative must re-try every anchor and is quadratic per user.
    * Output matches q50's shape (user_id, steps_reached,
    * completed_at).
    *
    * Scale shape: q50's — one pruned scan + per-user min-aggregate
    * per step, each join carrying one row per user; the window bound
    * is an extra filter inside each stage, nothing else changes. */
  def funnelWindowed(events: DataFrame, steps: Seq[String],
      windowHours: Int): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowHours > 0, "window must be positive")
    val windowUs = windowHours * 3600L * 1000000L
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("_t1"))
    val stages = steps.zipWithIndex.drop(1)
      .scanLeft(first) { case (prev, (step, i)) =>
        events.filter(col("event_type") === step)
          .join(prev, "user_id")
          .filter(unix_micros(col("ts")) >
              unix_micros(col(s"_t$i")) &&
            unix_micros(col("ts")) <=
              unix_micros(col(s"_t$i")) + windowUs)
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as(s"_t${i + 1}"))
      }
    val base = events.select(col("user_id")).distinct()
    val joined = stages.zipWithIndex.foldLeft(base) { case (acc, (s, i)) =>
      acc.join(s.select(col("user_id"),
        col(s"_t${i + 1}").as(s"_r${i + 1}")), Seq("user_id"), "left")
    }
    joined.select(col("user_id"),
      steps.indices.map(i => when(col(s"_r${i + 1}").isNotNull, 1L)
        .otherwise(0L)).reduce(_ + _).as("steps_reached"),
      col(s"_r${steps.size}").as("completed_at"))
      .orderBy(col("user_id"))
  }

  /** q200: trimmed mean per event type — the robust location estimate
    * between q83's mean/σ (0% breakdown) and q107's median/MAD (50%):
    * drop everything outside the [loQ, hiQ] exact quantile band and
    * average the rest, reporting both means so the gap ITSELF is the
    * signal (a trimmed mean far from the raw mean = the tails carry
    * the money — alert on the gap, not just the level).
    *
    * Determinism: the cuts are q32's quantile_cont/percentile pairing
    * (proven hash-identical cross-engine); membership compares the
    * raw double against that cut (same doubles both sides); kept sums
    * are exact 2-decimal sums divided once, round 12.
    *
    * Scale shape: q107's — one bounded per-type percentile aggregate
    * (exact percentile is the correctness baseline; the documented
    * 100 TB swap is the x07/x12 mergeable sketch), the |types|-row
    * cut table broadcasts back, and ONE more scan folds to |types|
    * rows. The fact table is never shuffled wide. */
  def trimmedMeanByType(events: DataFrame, loQ: Double = 0.05,
      hiQ: Double = 0.95): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, "need 0 <= loQ < hiQ <= 1")
    val vals = events.filter(col("value").isNotNull)
    val cuts = vals.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(loQ)).as("_lo"),
        percentile(col("value"), lit(hiQ)).as("_hi"))
    val kept = col("value") >= col("_lo") && col("value") <= col("_hi")
    vals
      .join(broadcast(cuts), "event_type")
      .groupBy(col("event_type"), col("_lo"), col("_hi"))
      .agg(count(lit(1)).as("n_values"),
        count(when(!kept, lit(1))).as("n_trimmed"),
        dsum(col("value")).as("_sum_all"),
        sum(when(kept, dec2(col("value")))).cast("double").as("_sum_kept"),
        count(when(kept, lit(1))).as("_n_kept"))
      .select(col("event_type"), col("n_values"), col("n_trimmed"),
        round(col("_lo"), 12).as("lo_cut"),
        round(col("_hi"), 12).as("hi_cut"),
        round(col("_sum_all") / col("n_values").cast("double"), 12)
          .as("mean_all"),
        round(col("_sum_kept") / col("_n_kept").cast("double"), 12)
          .as("trimmed_mean"))
      .orderBy(col("event_type"))
  }

  /** x40: stationary distribution of the q74 event-transition Markov
    * chain — where user behavior settles if today's transition
    * dynamics persist, and the principled "expected long-run mix" a
    * drift monitor (q148/x30) compares tomorrow's arrivals against
    * (the EMPIRICAL type mix is contaminated by where users happen to
    * be mid-journey; the stationary π is not). Power iteration
    * π ← πP from the uniform start on the |types|² matrix — DRIVER
    * arithmetic on metadata (the matrix is bounded by the type
    * vocabulary however large the corpus), so this is engine-seeded
    * only in float association order → rows-only; πP = π, Σπ = 1 and
    * a hand-solvable 2-state chain are pinned in EventOpsSpec.
    *
    * Scale shape: ONE corpus pass (q74's transition aggregate) folds
    * to |types|² rows; the collect pulls only that bounded matrix;
    * iteration cost is |types|²·iters driver flops. Types absent a
    * successor row (corpus-final events only) self-loop so P stays
    * row-stochastic. */
  def markovStationary(events: DataFrame, iters: Int = 64): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val spark = events.sparkSession
    val trans = eventTransitions(events)
      .select(col("prev_type"), col("event_type"), col("p"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val types = trans.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val idx = types.zipWithIndex.toMap
    val n = types.length
    val p = Array.fill(n, n)(0.0)
    trans.foreach { case (a, b, v) => p(idx(a))(idx(b)) = v }
    // rows with no observed successor self-loop (row-stochastic guard)
    (0 until n).foreach { i =>
      if (p(i).sum == 0.0) p(i)(i) = 1.0
    }
    var pi = Array.fill(n)(1.0 / n)
    (1 to iters).foreach { _ =>
      val next = Array.fill(n)(0.0)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) { next(j) += pi(i) * p(i)(j); j += 1 }
        i += 1
      }
      val s = next.sum // re-normalize: absorbs float drift per step
      pi = next.map(_ / s)
    }
    import spark.implicits._
    types.zipWithIndex
      .map { case (t, i) => (t, pi(i)) }.toSeq
      .toDF("event_type", "stationary_p")
      .orderBy(col("event_type"))
  }

  /** q210: exact audience overlap between event types — for every
    * unordered type pair, how many distinct users perform BOTH (plus
    * the Jaccard of the two audiences). The activation-analysis
    * primitive behind "users who search also purchase": feature
    * adoption overlap, funnel design, and the exact anchor for the
    * x43 HLL-sketch twin.
    *
    * Determinism: exact distinct counts; Jaccard is one division of
    * exact integers, round 12.
    *
    * Scale shape: the corpus folds ONCE to the distinct (user, type)
    * presence table (≤ |users|·|types| rows, |types| tiny); the
    * pair self-join keys on user_id with ≤ |types| rows per key —
    * bounded fan-out, C(|types|,2) output rows. The per-type distinct
    * counts ride the same presence table; nothing user-history-sized
    * crosses a second shuffle. */
  def typeAudienceOverlap(events: DataFrame): DataFrame = {
    val present = events.select(col("user_id"), col("event_type"))
      .distinct()
    val perType = present.groupBy(col("event_type"))
      .agg(count(lit(1)).as("_n"))
    val a = present.select(col("user_id"), col("event_type").as("type_a"))
    val b = present.select(col("user_id"), col("event_type").as("type_b"))
    a.join(b, "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("_n").as("_na"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("_n").as("_nb"))), "type_b")
      .select(col("type_a"), col("type_b"),
        col("_na").as("n_users_a"), col("_nb").as("n_users_b"),
        col("n_both"),
        round(col("n_both").cast("double") /
          (col("_na") + col("_nb") - col("n_both")).cast("double"), 12)
          .as("jaccard"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** x43: the sketch twin of q210 — per-type HLL sketches (Spark's
    * DataSketches hll_sketch_agg) merged pairwise, intersection by
    * inclusion–exclusion: |A∩B| ≈ |A| + |B| − |A∪B|. One pass builds
    * |types| FIXED-SIZE sketches (vs the exact path's distinct
    * presence shuffle); every later step is |types|²-bounded driver
    * metadata — at 100 TB the sketches are kilobytes where the exact
    * presence table is user-count-sized. Estimates are engine-seeded
    * → registered rows-only; EventOpsSpec pins the estimates within
    * HLL error of exact q210 and the pair list identical.
    *
    * The inclusion–exclusion difference of three estimates can go
    * slightly negative on near-disjoint audiences, or overshoot
    * min(|A|,|B|) on tiny ones — clamped into the feasible interval
    * [0, least(est_a, est_b)] (a true intersection can be neither
    * negative nor larger than its smaller side). lgK=14 ⇒ ~0.8%
    * relative standard error per sketch. */
  def typeAudienceOverlapApprox(events: DataFrame): DataFrame = {
    val sk = events.select(col("user_id"), col("event_type"))
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("_sk"))
    val a = sk.select(col("event_type").as("type_a"), col("_sk").as("_ska"))
    val b = sk.select(col("event_type").as("type_b"), col("_sk").as("_skb"))
    a.crossJoin(broadcast(b)) // |types|-row side — the pinned tiny-side rule
      .filter(col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        expr("hll_sketch_estimate(_ska)").as("_ea"),
        expr("hll_sketch_estimate(_skb)").as("_eb"),
        expr("hll_sketch_estimate(hll_union(_ska, _skb))").as("_eu"))
      .select(col("type_a"), col("type_b"),
        col("_ea").as("est_users_a"), col("_eb").as("est_users_b"),
        least(greatest(col("_ea") + col("_eb") - col("_eu"), lit(0L)),
          least(col("_ea"), col("_eb"))).as("est_both"))
      .orderBy(col("type_a"), col("type_b"))
  }
}
