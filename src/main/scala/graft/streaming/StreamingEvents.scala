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

  /** A drift-ledger row: one micro-batch's composition audit. */
  case class MixDrift(batch_id: Long, n_events: Long, l1_drift: Double,
      top_over_type: String, top_over_dev: Double)

  /** Streaming composition-drift MONITOR — q148/q140 deployed as an
    * ingestion alert: each arriving micro-batch's event_type mix is
    * compared (L1 distance + most over-represented type) against the
    * reference mix of the accepted history, and the verdicts append
    * to a drift ledger. The monitor a production feed runs so a
    * upstream change (a producer starts spamming one event type, a
    * source flips format and floods `error`) pages BEFORE the drifted
    * batch pollutes the blend — the streaming reading of the batch
    * audits: q148 finds drift after the fact, this catches it at the
    * door.
    *
    * Scale shape: the per-batch work is ONE |types|-bounded count
    * aggregate of the micro-batch (collected — bounded metadata, like
    * every fixpoint probe in this engine); the reference mix is a
    * broadcast-tiny driver map; the ledger appends one row per batch.
    * State is O(|types|), so the monitor runs indefinitely.
    *
    * Static harness (the x30 entry): the reference mix comes from the
    * full events table, the stream replays the same events in
    * `nBatches` deterministic event_id-mod drops through a
    * checkpointed AvailableNow pass each, and the ledger comes back
    * ordered. Batches ARE samples of the reference here, so measured
    * drift is small but nonzero (sampling noise) — StreamingSpec pins
    * the sharp properties (ledger == batch-computed L1 per slice;
    * zero drift for a batch that exactly matches the reference). */
  def mixDriftStatic(spark: SparkSession, events: DataFrame,
      nBatches: Int = 3): DataFrame = {
    require(nBatches >= 1, "nBatches must be positive")
    val base = Scratch.scratch("graft_mix_drift")
    val landing = base + "/landing"
    val ledger = base + "/ledger"
    val ckpt = base + "/ckpt"
    val src = events.select(col("event_id"), col("event_type"))
    val baselineRows = src.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val baseTotal = baselineRows.map(_._2).sum.toDouble
    val baseline = baselineRows.map { case (t, n) => t -> (n / baseTotal) }
      .toMap
    // try/finally: a failing stream or collect must still dispose the
    // scratch dirs (same r13 fix as StreamingQuality.qualityGateStatic)
    val rows =
      try {
        (0 until nBatches).foreach { i =>
          // ONE file per drop + maxFilesPerTrigger=1 on the reader makes
          // "each AvailableNow pass = exactly one micro-batch" an ENFORCED
          // invariant (the ledger's batch_id ↔ drop-id identity that the
          // spec pins), not an accident of the file source's default
          // 1000-file trigger cap.
          src.filter(pmod(col("event_id"), lit(nBatches.toLong)) === i)
            .coalesce(1).write.mode("append").parquet(landing)
          spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", "1").parquet(landing)
            .writeStream
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .option("checkpointLocation", ckpt)
            .foreachBatch { (batch: DataFrame, batchId: Long) =>
              val ledgerRow = auditBatch(batch, batchId, baseline)
              val sp = batch.sparkSession
              import sp.implicits._
              Seq(ledgerRow).toDS().write.mode("append").parquet(ledger)
              ()
            }
            .start().awaitTermination()
        }
        // the ledger is |batches| rows of metadata — pull it to the
        // driver and delete the scratch dirs NOW rather than leaking
        // them until JVM exit (the returned frame must not read lazily
        // from scratch)
        import spark.implicits._
        spark.read.parquet(ledger).as[MixDrift]
          .collect().sortBy(_.batch_id).toSeq
      } finally Scratch.dispose(base)
    import spark.implicits._
    rows.toDS().toDF().orderBy(col("batch_id"))
  }

  /** One micro-batch's audit against the reference mix — extracted so
    * StreamingSpec can pin ledger == direct computation on a slice.
    * The batch side is one bounded count aggregate; every type in
    * EITHER the batch or the reference enters the L1 fold (an absent
    * reference type in the batch contributes its full reference
    * share; a novel type contributes its full batch share). */
  private[streaming] def auditBatch(batch: DataFrame, batchId: Long,
      baseline: Map[String, Double]): MixDrift = {
    val counts = batch.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val types = (counts.keySet ++ baseline.keySet).toSeq.sorted
    val devs = types.map { t =>
      val p = if (n == 0) 0.0 else counts.getOrElse(t, 0L).toDouble / n
      t -> (p - baseline.getOrElse(t, 0.0))
    }
    val l1 = devs.map { case (_, d) => math.abs(d) }.sum
    // argmax deviation, ties to the lexicographically smallest type
    val (topType, topDev) = devs.sortBy { case (t, d) => (-d, t) }.head
    def r12(v: Double): Double =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_EVEN)
        .toDouble
    MixDrift(batchId, n, r12(l1), topType, r12(topDev))
  }

  /** Incrementally-maintained corpus statistics — q24's streaming
    * twin: per-source (n_docs, n_tokens, n_chars) kept as STREAMING
    * AGGREGATION STATE across micro-batches, snapshots appended to a
    * ledger in Update mode (only sources the batch touched emit).
    * The always-current stats table a curation pipeline reads without
    * ever re-scanning the corpus: ingestion cost ∝ batch, state
    * O(|sources|), runs indefinitely.
    *
    * Static harness (the x32 entry): the documents table streams in
    * `nBatches` deterministic doc_id-mod drops through a checkpointed
    * AvailableNow pass each; the returned frame is the LATEST
    * snapshot per source, which StreamingSpec pins equal to the batch
    * aggregate over the full table — incremental == from-scratch.
    *
    * Measurement: per-stage walls (each drop's landing write, each
    * checkpointed streaming pass, the snapshot collect) land in
    * target/stage_journal.jsonl (StageJournal) — the r16 verdict: the
    * x32 bench median tripled on samples spread 6.6–28 s with no code
    * change, and unlike x26 (journaled since r14) nothing attributed
    * checkpoint-I/O variance from compute. */
  def corpusStatsStatic(spark: SparkSession, docs: DataFrame,
      nBatches: Int = 3): DataFrame = {
    require(nBatches >= 1, "nBatches must be positive")
    val base = Scratch.scratch("graft_corpus_stats")
    val landing = base + "/landing"
    val ledger = base + "/ledger"
    val ckpt = base + "/ckpt"
    val src = docs.select(col("doc_id"), col("source"), col("text"))
    val stages = scala.collection.mutable.Buffer.empty[(String, Double)]
    def timed[A](name: String)(f: => A): A =
      graft.StageJournal.time(stages, name)(f)
    // try/finally: dispose the scratch dirs on ANY exit (same r13 fix
    // as StreamingQuality.qualityGateStatic)
    val (rows, schema) =
      try {
        (0 until nBatches).foreach { i =>
          // one file per drop + one-file trigger: batch ↔ drop identity
          // enforced, same reasoning as mixDriftStatic
          timed(s"land_b$i")(
            src.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === i)
              .coalesce(1).write.mode("append").parquet(landing))
          timed(s"stream_b$i")(
            spark.readStream.schema(src.schema)
              .option("maxFilesPerTrigger", "1").parquet(landing)
              .groupBy(col("source"))
              .agg(count(lit(1)).as("n_docs"),
                sum(graft.functions.TextFunctions.tokenCount(col("text")))
                  .as("n_tokens"),
                sum(length(col("text")).cast("long")).as("n_chars"))
              .writeStream
              .outputMode("update")
              .trigger(
                org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .option("checkpointLocation", ckpt)
              .foreachBatch { (batch: DataFrame, batchId: Long) =>
                batch.withColumn("_batch_id", lit(batchId))
                  .write.mode("append").parquet(ledger)
                ()
              }
              .start().awaitTermination())
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("_batch_id").desc)
        // |sources|-bounded snapshot — collect it and delete the
        // scratch dirs eagerly (see mixDriftStatic; the frame returned
        // to the caller must not depend on the scratch parquet)
        val snap = spark.read.parquet(ledger)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("n_chars"))
        timed("snapshot")((snap.collect().toSeq, snap.schema))
      } finally {
        Scratch.dispose(base)
        graft.StageJournal.record("x32_streaming_corpus_stats",
          stages.toSeq)
      }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema).orderBy(col("source"))
  }

  private def micros(us: Long): java.sql.Timestamp =
    new java.sql.Timestamp(us / 1000L)
}
