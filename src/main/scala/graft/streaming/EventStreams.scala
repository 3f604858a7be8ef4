package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Scalar

/** Structured Streaming surface. The reference is batch-only ("manual-trigger
  * execution model", src/ETL-NPL-Pipeline.py:5), but its quarterly roll-ups
  * are exactly the shape of a streaming aggregation — this module exposes
  * them as incremental queries so the same engine serves continuous feeds
  * (BASELINE.json north-star: a training-data pipeline ingests forever).
  *
  * Scale notes: event-time windows + watermark bound state; the stateful
  * sessionizer keys state by user — state store partitions by the group key,
  * so a 1000-executor cluster shards it linearly. No `collect`, no
  * foreachBatch driver loops.
  */
object EventStreams {

  /** An events feed directory as a stream (each new parquet file in the
    * directory becomes a micro-batch — the standard file-feed layout).
    * Schema is explicit — a streaming scan must never infer — but it is
    * PROBED from the feed's own parquet footer (one driver-side batch-read
    * of ingest-sized metadata, no data scan) rather than hard-coded: the
    * testdata's ts encoding has drifted between TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across regenerations, and a declared `ts BIGINT`
    * over a micros file reads the raw INT64 and silently lands every event
    * in 1970 (round-4 verdict #2). The probed schema feeds the SAME
    * [[graft.sources.Tables.adaptEventTs]] normalizer as the batch path,
    * so stream and batch cannot disagree on what `ts` means.
    */
  def readEventStream(s: SparkSession, feedDir: String): DataFrame = {
    // A feed directory that exists but holds no files yet has no footer to
    // probe (the batch read throws UNABLE_TO_INFER_SCHEMA) — a legitimate
    // state for a stream attaching BEFORE the first file lands. Fall back
    // to the declared events schema with `ts TIMESTAMP` (the micros
    // encoding current testdata ships; adaptEventTs passes it through).
    // A nanos-encoded feed still gets the probed branch the moment a file
    // exists, which is the case for every staged-feed caller here.
    val probed =
      try s.read.parquet(feedDir).schema
      catch { case _: org.apache.spark.sql.AnalysisException =>
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING")
      }
    graft.sources.Tables.adaptEventTs(
      s.readStream.schema(probed).parquet(feedDir))
  }

  /** Windowed event-time aggregation with a watermark (the streaming analog
    * of the reference's monthly/quarterly means, src:353,441).
    */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Quarterly roll-up as a streaming query — same Quarter key expression as
    * the batch path (Scalar.toQuarter), so batch and stream agree.
    */
  def quarterlyValues(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(Scalar.toQuarter(col("ts")).as("Quarter"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))

  /** Streaming exact dedup (X1 on a feed): duplicate event_ids are dropped
    * across micro-batches with state bounded by the watermark — the
    * at-least-once-feed-to-exactly-once-table pattern a training-data
    * ingest needs.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark("event_id")

  /** Gap-based session windows via the native session_window operator —
    * the same expression works on a batch DataFrame (oracle-checkable
    * against gaps-and-islands SQL) and under a watermark on a stream.
    * Session = maximal run of per-user events with < gap between
    * neighbors; window end = last event + gap.
    */
  def sessionWindowAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))

  /** Stream-stream interval join (purchase attribution): every purchase
    * matched to the same user's views in the preceding 30 minutes. Both
    * sides carry watermarks and the join condition bounds event-time
    * distance, so the state store can discard rows once the watermark
    * passes — state stays O(users × 30 min of events) regardless of feed
    * length; the join shuffles both streams on user_id (co-partitioned
    * state). The same expression evaluates on batch DataFrames as a plain
    * inner join (spec cross-checks that).
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("interval 30 minutes"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        col("p_ts"), col("v_ts"))
  }

  case class SessionIn(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class SessionAgg(events: Int = 0, first: Long = 0L, last: Long = 0L)
  /** Per-user state: every session not yet FINAL (i.e. the watermark has
    * not passed its end + gap), oldest first. Bounded: a pending session
    * has `last > watermark - gap`, so the list length is capped by
    * watermark-horizon / gap, independent of feed length.
    */
  case class SessionState(pending: Seq[SessionAgg])
  case class UserSession(user_id: Long, session_start_ms: Long, n_events: Int,
                         duration_secs: Long, closed: Boolean)

  /** Custom state: per-user GAP sessionization via flatMapGroupsWithState.
    * A session is a maximal run of a user's events with < gapMs between
    * neighbors — gap boundaries are END-EXCLUSIVE (an event exactly gapMs
    * after its predecessor starts a NEW session), matching session_window
    * and the gaps-and-islands oracle.
    *
    * Correctness under out-of-order data: a session is emitted
    * `closed = true` exactly once, and only when the WATERMARK has passed
    * its end + gap — at that point no admissible event (all arrivals have
    * event time >= watermark) can extend or bridge it. Until then it
    * stays in state, and each incoming event is INTERVAL-MERGED into the
    * pending list (it may extend a session backwards, lower `first`, or
    * bridge two pending sessions into one). The youngest pending session
    * is emitted per batch with `closed = false` as the running summary.
    * Finality is detected both on data batches and via the event-time
    * timeout armed at the oldest pending session's end + gap. (Event-time
    * timeouts fire on watermark advancement, i.e. on data — unlike a
    * processing-time timeout they schedule no wall-clock-forever empty
    * batches, so a bounded drive still quiesces.)
    */
  def sessionize(s: SparkSession, events: DataFrame,
                 watermarkDelay: String = "1 hour",
                 gapMs: Long = 30L * 60 * 1000): Dataset[UserSession] = {
    import s.implicits._

    // insert one event into the sorted pending list: merges with every
    // session within gap reach (at most its two neighbors), else opens a
    // new session in place
    def insert(pending: Seq[SessionAgg], t: Long): Seq[SessionAgg] = {
      val (left, rest) = pending.span(_.last + gapMs <= t) // end-exclusive
      val (touch, right) = rest.span(_.first < t + gapMs)
      val merged =
        if (touch.isEmpty) SessionAgg(1, t, t)
        else SessionAgg(touch.map(_.events).sum + 1,
          math.min(touch.head.first, t), math.max(touch.last.last, t))
      (left :+ merged) ++ right
    }

    events.select(col("user_id"), col("ts"), col("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state: GroupState[SessionState]) =>
          def emit(agg: SessionAgg, closed: Boolean) =
            UserSession(user, agg.first, agg.events,
              (agg.last - agg.first) / 1000, closed)
          val timedOut = state.hasTimedOut
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.map(_.pending).getOrElse(Seq.empty)
          // fold this batch's events in event-time order (per-batch volume
          // per key is bounded by the micro-batch — in-memory sort is safe)
          val pending =
            if (timedOut) prev
            else rows.map(_.ts.getTime).toArray.sorted.foldLeft(prev)(insert)
          // watermark-final sessions close EXACTLY once and leave state
          val (fin, keep) = pending.partition(_.last + gapMs <= wm)
          if (keep.isEmpty) state.remove()
          else {
            state.update(SessionState(keep))
            // fire when the oldest survivor becomes final; must be strictly
            // beyond the current watermark or the engine rejects it
            state.setTimeoutTimestamp(
              math.max(keep.map(_.last + gapMs).min, wm + 1))
          }
          val running =
            if (timedOut) Iterator.empty
            else keep.lastOption.map(emit(_, closed = false)).iterator
          fin.iterator.map(emit(_, closed = true)) ++ running
      }
  }

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily lowered —
    * a stateful streaming query bakes the setting into its state-store
    * layout at FIRST start (the checkpoint pins it thereafter), and every
    * micro-batch commits every state partition, so a low-cardinality
    * keyed state pays per-partition store-commit overhead for partitions
    * holding a handful of keys (measured 6.3s → 2.6s on the interval
    * join at 32 → 8 partitions, 150 users). Size to key cardinality /
    * cluster at scale; the batch analytics setting is the wrong default
    * for state. Restores the previous value even on failure.
    */
  def withStatePartitions[A](s: SparkSession, parts: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, parts.toString)
    try body finally s.conf.set(key, old)
  }

  /** Drive a streaming query to completion against the bounded source and
    * return the materialized result (memory sink) — the local smoke path;
    * production would writeStream to parquet/Kafka.
    *
    * `stateParts` sizes the query's state-store layout (applied via
    * [[withStatePartitions]] around the start, which is when the layout
    * is baked): the default 8 fits the gate queries' key cardinalities;
    * pass the session setting explicitly to opt out.
    */
  def runToCompletion(s: SparkSession, df: DataFrame, name: String,
                      outputMode: OutputMode = OutputMode.Update,
                      stateParts: Int = 8): DataFrame = {
    s.catalog.dropTempView(name) // idempotent under re-runs (bench passes twice)
    withStatePartitions(s, stateParts) {
      val t0 = System.nanoTime()
      val q = df.writeStream.outputMode(outputMode)
        .format("memory").queryName(name).start()
      val t1 = System.nanoTime()
      // ALWAYS stop: a failure mid-drive would otherwise leave the named
      // query active and every later start() under this name would fail.
      val t2 = try { q.processAllAvailable(); System.nanoTime() }
      finally q.stop()
      // lifecycle attribution for the q_stream_* fixed floor (see
      // plans/r13/stream_floor.md): start / per-batch durations. AFTER
      // the stop (recentProgress survives it) so a debug-path exception
      // can never skip the stop above.
      if (sys.env.contains("GRAFT_STREAM_DEBUG")) {
        val batches = q.recentProgress.toSeq.map(p => (p.batchId,
          p.durationMs.getOrDefault("triggerExecution", -1L),
          p.durationMs.getOrDefault("addBatch", -1L),
          p.numInputRows)).mkString("; ")
        System.err.println(
          f"[stream] $name start=${(t1 - t0) / 1e9}%.2fs " +
            f"drive=${(t2 - t1) / 1e9}%.2fs batches(id,trigger_ms,addBatch_ms,rows)=$batches")
      }
    }
    s.table(name)
  }
}
