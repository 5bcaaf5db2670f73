package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream table
  * (event_id, ts, user_id, event_type, value, …). The reference has no
  * streaming surface (SURVEY.md §2.2 "Streaming: None") — its only
  * incremental behavior is the R17 retrain hook
  * ([[graft.recdb.IncrementalMaintainer]]). These operators are the
  * Spark-native streaming layer a training-data pipeline needs on top:
  * watermarked tumbling/sliding aggregation and stateful sessionization.
  *
  * Scale: both are keyed-state operators — state is partitioned by group key
  * across executors, bounded by the watermark (late data beyond it is
  * dropped and state evicted), so they run indefinitely at any throughput.
  */
object EventStreams {

  /** Watermarked tumbling-window counts/sums per event_type — the streaming
    * twin of the q_events_hourly batch query.
    */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup: drop repeated keys with bounded state — state for
    * a key is evicted once the watermark passes it, so memory is bounded by
    * the key arrival rate × watermark horizon (the streaming face of
    * [[graft.ops.Dedup.exact]]).
    */
  def streamingDedup(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, events: Long, totalValue: Double)
  final case class SessionState(startMs: Long, endMs: Long, cnt: Long, total: Double)

  /** Watermarked stream-stream interval join (attribution): each left event
    * pairs with right events of the same key whose timestamp falls in
    * [left.ts, left.ts + horizon]. Both sides carry watermarks and the join
    * condition bounds event-time distance, so buffered state is evicted once
    * the watermark passes — the only formulation of a stream-stream join
    * that runs indefinitely. Column names are prefixed l_/r_ in the output.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      horizon: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(left.columns.map(c => col(c).as(s"l_$c")): _*)
    val r = right.withWatermark("ts", watermark)
      .select(right.columns.map(c => col(c).as(s"r_$c")): _*)
    l.join(r, expr(
      s"l_$key = r_$key AND r_ts >= l_ts AND r_ts <= l_ts + interval $horizon"))
  }

  /** Stream-static enrichment: join the event stream to a static dimension
    * (item/user metadata) with an explicit broadcast — each micro-batch
    * ships the dim to executors instead of shuffling the stream; the static
    * side is re-read per batch, so an updated dim table is picked up without
    * restarting the query. Left join: events never drop because metadata is
    * missing.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** The shared session fold: merge a batch of events into per-user session
    * state, closing sessions on gap splits; emits closed sessions and leaves
    * the open one in `state` with timeout armed by `arm`.
    */
  private def sessionFold(user: Long, rows: Iterator[SessionEvent],
      state: GroupState[SessionState], gapMs: Long,
      arm: (GroupState[SessionState], SessionState) => Unit): Iterator[Session] =
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(user, new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.endMs), s.cnt, s.total))
    } else {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          // within gap of the session span (late or in-order): merge,
          // extending both bounds
          case Some(s) if t >= s.startMs - gapMs && t <= s.endMs + gapMs =>
            cur = Some(s.copy(startMs = t min s.startMs,
              endMs = t max s.endMs, cnt = s.cnt + 1,
              total = s.total + e.value))
          // too-late straggler (beyond gap BEFORE the session): its own
          // immediately-closed singleton session
          case Some(s) if t < s.startMs - gapMs =>
            closed ::= Session(user, new java.sql.Timestamp(t),
              new java.sql.Timestamp(t), 1, e.value)
          // beyond gap AFTER the session: close current, start new
          case Some(s) =>
            closed ::= Session(user, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.endMs), s.cnt, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        arm(state, s)
      }
      closed.reverseIterator
    }

  /** Gap-based sessionization via flatMapGroupsWithState with a
    * processing-time timeout: a session closes when no event arrives within
    * `gapMs` of wall clock. Simple, but not replay-deterministic — prefer
    * [[sessionizeEventTime]] for production streams.
    */
  def sessionize(events: Dataset[SessionEvent],
      gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (user: Long, rows: Iterator[SessionEvent],
            state: GroupState[SessionState]) =>
          sessionFold(user, rows, state, gapMs,
            (st, _) => st.setTimeoutDuration(gapMs))
      }
  }

  /** Event-time sessionization: the session closes when the WATERMARK passes
    * its end + gap — deterministic under replay and independent of wall
    * clock, so checkpoint recovery and backfill produce identical sessions.
    * State is evicted by the same watermark that bounds every other keyed
    * operator, so memory stays bounded at any throughput.
    */
  def sessionizeEventTime(events: Dataset[SessionEvent],
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[SessionEvent],
            state: GroupState[SessionState]) =>
          sessionFold(user, rows, state, gapMs,
            (st, s) => st.setTimeoutTimestamp(s.endMs + gapMs))
      }
  }
}
