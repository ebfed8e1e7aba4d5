package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user sessionizer state: O(1) per active user (public top-level —
  * the state encoder's generated code needs constructor access). */
case class UserSessionState(lastTs: Long, sessionStart: Long, nEvents: Long)

/** Streaming analytics over the events stream: watermarked windowed
  * aggregation (the streaming twin of EventOps.hourlyEventCounts) and
  * stateful gap sessionization via flatMapGroupsWithState (the streaming
  * twin of EventOps.sessionize).
  *
  * Scale notes: the windowed count keeps one row of state per
  * (window, event_type) until the watermark closes the window; the
  * sessionizer keeps O(1) state per active user (last-seen timestamp +
  * two counters) and emits a row per closed session — both bounded-state
  * designs that run indefinitely on an unbounded stream.
  */
object StreamingEvents {

  /** Event record for typed stateful processing (mirrors the harness
    * events table; ts in microseconds-epoch for arithmetic in state). */
  case class Event(event_id: Long, user_id: Long, event_type: String,
      ts: java.sql.Timestamp)

  /** A closed (or force-flushed) session. */
  case class Session(user_id: Long, n_events: Long,
      started_at: java.sql.Timestamp, ended_at: java.sql.Timestamp)

  


  /** Stream-stream temporal range join (q45's streaming twin): pairs of
    * events by the same user with the right side inside (left.ts,
    * left.ts + gap]. Both sides are watermarked, and the join condition
    * bounds b.ts relative to a.ts in BOTH directions — that pair of
    * constraints is what lets Spark expire buffered rows: each side's
    * state holds only ~(watermark + gap) of history per user, so the
    * join runs indefinitely on an unbounded stream. Without the range
    * bounds the state would grow forever (Spark rejects unbounded
    * stream-stream joins in append mode for exactly that reason).
    *
    * The batch twin (EventOps.rangeJoinWithin) bands time into buckets
    * instead — at rest, banding beats buffering; in motion, the state
    * store IS the band. StreamingSpec asserts streaming==batch parity
    * on a closed input. */
  def rangeJoinWithin(events: DataFrame, gapMinutes: Int,
      watermark: String = "1 hour"): DataFrame = {
    require(gapMinutes > 0, "gap must be positive") // parity with batch
    val a = events
      .select(col("user_id"), col("event_id").as("a_id"),
        col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = events
      .select(col("user_id").as("user_id_b"), col("event_id").as("b_id"),
        col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b,
        col("user_id") === col("user_id_b") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $gapMinutes MINUTES"))
      .select(col("user_id"), col("a_id"), col("b_id"),
        (unix_micros(col("b_ts")) - unix_micros(col("a_ts")))
          ./(lit(1000000L)).cast("long").as("gap_seconds"))
  }

  /** Watermarked hourly counts per event type (q20's streaming twin).
    * Append mode: a (window, type) row is emitted once, when the
    * watermark passes the window end. */
  def hourlyEventCounts(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"))

  /** Gap-based sessionization with explicit state (q21's streaming twin):
    * events for a user more than `gapMinutes` apart start a new session;
    * the closed session is emitted. Within a micro-batch, a user's events
    * are sorted by (ts, event_id) — the same order as the batch operator.
    * For continuous deployments pass
    * `GroupStateTimeout.ProcessingTimeTimeout()` so idle users are
    * flushed and their state reclaimed; the NoTimeout default suits
    * incremental AvailableNow passes (open sessions stay in state across
    * runs via the checkpoint). */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMinutes: Int = 30,
      idleTimeout: GroupStateTimeout =
        GroupStateTimeout.NoTimeout()): Dataset[Session] = {
    import spark.implicits._
    require(idleTimeout != GroupStateTimeout.EventTimeTimeout(),
      "event-time timeouts need setTimeoutTimestamp; pass NoTimeout or " +
        "ProcessingTimeTimeout")
    val gapMicros = gapMinutes * 60L * 1000000L
    val timeoutEnabled = idleTimeout != GroupStateTimeout.NoTimeout()

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSessionState, Session](OutputMode.Append(),
        idleTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[UserSessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, s.nEvents, micros(s.sessionStart),
                micros(s.lastTs)))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[Session]
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime * 1000L // ms → µs
              st = if (st == null) UserSessionState(t, t, 1L)
              else if (t - st.lastTs > gapMicros) {
                closed += Session(userId, st.nEvents,
                  micros(st.sessionStart), micros(st.lastTs))
                UserSessionState(t, t, 1L)
              } else
                // a LATE event (t <= lastTs, possible across micro-
                // batches) must never move the session backward: keep
                // lastTs monotone and widen the start instead
                st.copy(lastTs = math.max(st.lastTs, t),
                  sessionStart = math.min(st.sessionStart, t),
                  nEvents = st.nEvents + 1)
            }
            if (st != null) {
              state.update(st)
              if (timeoutEnabled)
                state.setTimeoutDuration(s"$gapMinutes minutes")
            }
            closed.result().iterator
          }
      }
  }

  private def micros(us: Long): java.sql.Timestamp =
    new java.sql.Timestamp(us / 1000L)
}
