package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming (SURVEY.md §2.11): a sessionizer built on
  * flatMapGroupsWithState — the KeyValueGroupedDataset state API the
  * built-in session_window can't replace when session logic needs
  * arbitrary per-key state (here: running event count and value sum
  * emitted per closed session).
  *
  * State is keyed by user_id; at scale this shuffles once on the key
  * and keeps per-key state in the state store (RocksDB-backed on a
  * real cluster).
  */
object StatefulSessions {

  case class Event(user_id: Long, ts_ms: Long, value: Double)
  case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Long, sum_value: Double)

  val gapMs: Long = 30 * 60 * 1000L

  /** Sessionizer with EVENT-TIME timeouts: open sessions are flushed
    * when the watermark passes their last event + gap, so every
    * session is eventually emitted even if its user goes silent — the
    * semantics the timeout-less variant below cannot provide. State
    * per key is O(1) and expires with the timeout, so the state store
    * never accumulates dead keys (the unbounded-state leak being the
    * stateful-streaming failure mode at scale).
    */
  def sessionizeWithTimeout(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("event_ts", "10 minutes")
      .as[EventWithTs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[EventWithTs], state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed lastMs + gap: flush the open session
            val st = state.get
            state.remove()
            Iterator.single(
              ClosedSession(userId, st.startMs, st.lastMs, st.n, st.sum))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_ms, e.value))
            val closed = Seq.newBuilder[ClosedSession]
            var st = state.getOption.orNull
            for (e <- sorted) {
              if (st != null && e.ts_ms < st.lastMs) {
                // drop-late policy, as in sessionize
              } else if (st == null) {
                st = SessionState(e.ts_ms, e.ts_ms, 1, e.value)
              } else if (e.ts_ms - st.lastMs >= gapMs) {
                closed += ClosedSession(userId, st.startMs, st.lastMs, st.n, st.sum)
                st = SessionState(e.ts_ms, e.ts_ms, 1, e.value)
              } else {
                st = SessionState(st.startMs, e.ts_ms, st.n + 1, st.sum + e.value)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  case class EventWithTs(user_id: Long, ts_ms: Long, value: Double,
                         event_ts: java.sql.Timestamp)

  /** Emits a ClosedSession whenever an event arrives more than `gapMs`
    * after the previous one (plus the final open session on timeout —
    * not modeled here since AvailableNow drains finite input; see
    * sessionizeWithTimeout for the event-time-timeout variant that
    * flushes them).
    */
  def sessionize(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts_ms, e.value))
          val closed = Seq.newBuilder[ClosedSession]
          var st = state.getOption.orNull
          for (e <- sorted) {
            if (st != null && e.ts_ms < st.lastMs) {
              // cross-batch late event: without a watermark it would
              // rewind lastMs and make the next on-time event falsely
              // close the session — drop-late is the explicit policy
            } else if (st == null) {
              st = SessionState(e.ts_ms, e.ts_ms, 1, e.value)
            } else if (e.ts_ms - st.lastMs >= gapMs) {
              closed += ClosedSession(userId, st.startMs, st.lastMs, st.n, st.sum)
              st = SessionState(e.ts_ms, e.ts_ms, 1, e.value)
            } else {
              st = SessionState(st.startMs, e.ts_ms, st.n + 1, st.sum + e.value)
            }
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }
}
