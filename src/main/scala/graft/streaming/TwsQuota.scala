package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Per-key event-time QUOTA enforcement on Spark 4's transformWithState
  * — the arbitrary-stateful-processing API that supersedes
  * flatMapGroupsWithState (typed state VARIABLES instead of one state
  * blob, explicit timers instead of a single timeout, TTL support).
  * The operator family's reference shape is rate limiting a training-
  * data ingest: each key (user, crawl domain, tenant) may contribute at
  * most `maxPerWindow` events per tumbling event-time window; excess
  * events are emitted TAGGED rather than dropped, so downstream decides
  * (audit, spill pool, backpressure) and row-count conservation stays
  * checkable end-to-end.
  *
  * Semantics (deterministic, spec-pinned against a batch window
  * oracle): events admit in (ts_ms, value) order within a key; an
  * event's window is floor(ts/window); the first `maxPerWindow`
  * arrivals of a window admit with seq 1..N, the rest are rejected
  * with seq 0. Cross-batch determinism holds whenever slicing respects
  * event-time order (the CdcApply discipline: order is a property of
  * the DATA, the spec replays sliced ≡ serial).
  *
  * State discipline — the part transformWithState exists for:
  * - one MapState variable per key: window-start → admitted count.
  *   O(active windows) entries, not O(events): the counter saturates
  *   at maxPerWindow, so a hot key costs the same state as a quiet one.
  * - an event-time TIMER per (key, window) fires at window end +
  *   lateness (= the stream's watermark delay, so no admissible event
  *   can still arrive) and frees the window's entry — state is bounded
  *   by the number of windows inside the watermark horizon, regardless
  *   of stream length. RocksDB-backed on a cluster (transformWithState
  *   requires the RocksDB provider); ONE shuffle on the key.
  */
object TwsQuota {

  case class Event(user_id: Long, ts_ms: Long, value: Double)
  case class EventWithTs(user_id: Long, ts_ms: Long, value: Double,
                         event_ts: java.sql.Timestamp)
  case class Decision(user_id: Long, ts_ms: Long, window_start_ms: Long,
                      admitted: Boolean, seq_in_window: Long)

  val windowMs: Long = 60 * 60 * 1000L
  val maxPerWindow: Long = 3L
  /** Must equal the stream's watermark delay: the cleanup timer at
    * window end + lateness may only fire once no admissible event for
    * that window can still arrive.
    */
  val latenessMs: Long = 10 * 60 * 1000L

  class QuotaProcessor extends StatefulProcessor[Long, EventWithTs, Decision] {
    @transient private var wins: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      wins = getHandle.getMapState[Long, Long](
        "wins", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventWithTs],
                                 tv: TimerValues): Iterator[Decision] = {
      val out = Seq.newBuilder[Decision]
      for (e <- rows.toSeq.sortBy(x => (x.ts_ms, x.value))) {
        val w = math.floorDiv(e.ts_ms, windowMs) * windowMs
        val c = if (wins.containsKey(w)) wins.getValue(w) else 0L
        // first arrival of a window schedules its cleanup; the counter
        // never moves past maxPerWindow (hot keys don't grow state)
        if (c == 0L) getHandle.registerTimer(w + windowMs + latenessMs)
        if (c < maxPerWindow) {
          wins.updateValue(w, c + 1)
          out += Decision(key, e.ts_ms, w, admitted = true, c + 1)
        } else {
          out += Decision(key, e.ts_ms, w, admitted = false, 0L)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Decision] = {
      // free every window whose admission horizon the watermark passed
      // (≤, not ==: a lagging timer must still collect older windows)
      val cutoff = info.getExpiryTimeInMs - windowMs - latenessMs
      wins.keys().toSeq.filter(_ <= cutoff).foreach(wins.removeKey)
      if (!wins.keys().hasNext) wins.clear()
      Iterator.empty
    }
  }

  /** The streaming operator: tagged admit/reject decision per event. */
  def admit(events: Dataset[Event]): Dataset[Decision] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("event_ts", "10 minutes")
      .as[EventWithTs]
      .groupByKey(_.user_id)
      .transformWithState(new QuotaProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Batch oracle for the spec: the same decisions as one global window
    * computation — admitted = row_number ≤ maxPerWindow within
    * (key, window) ordered by (ts_ms, value).
    */
  def batchOracle(events: Seq[Event]): Seq[Decision] =
    events.groupBy(e => (e.user_id, math.floorDiv(e.ts_ms, windowMs)))
      .toSeq.flatMap { case ((uid, wdiv), es) =>
        es.sortBy(e => (e.ts_ms, e.value)).zipWithIndex.map { case (e, i) =>
          val adm = i < maxPerWindow
          Decision(uid, e.ts_ms, wdiv * windowMs, adm, if (adm) i + 1L else 0L)
        }
      }
}
