package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming complex-event-pattern detection on transformWithState —
  * the CONTINUOUS twin of the batch `w11_event_pattern` funnel: count
  * non-overlapping signup→…→purchase (`s[^p]*p`) matches per user,
  * EXACTLY, under out-of-order arrival.
  *
  * Why this needs ListState (the state variable TwsQuota's MapState
  * shape doesn't exercise): pattern matching is ORDER-SENSITIVE, so an
  * event may not run through the machine the moment it arrives — a
  * straggler with an earlier timestamp could still belong BEFORE it.
  * Each key therefore buffers arrivals in a ListState and only drains
  * them through the two-state machine once the WATERMARK proves their
  * prefix is final (the StreamingAsOf discipline, re-expressed on the
  * Spark 4 API):
  *
  *  - ListState[EvBuf]: the out-of-order buffer. Bounded by the
  *    watermark horizon — every drain removes the finalized prefix —
  *    not by stream length.
  *  - ValueState[Pend]: the pattern machine's single register (pending
  *    signup start + steps so far). O(1) per key however long the
  *    history: the machine carries no event backlog across matches.
  *  - one event-time timer per input batch at (max ts)+1: fires once
  *    the watermark passes the batch's newest event, draining every
  *    buffered event with ts ≤ watermark in (ts, event_id) order —
  *    the same total order the batch oracle folds in, which is what
  *    makes sliced/shuffled delivery ≡ serial replay (TwsCepSpec).
  *
  * Emission: one Match row per completed pattern (at its purchase
  * event), carrying the signup ts, purchase ts and the step count —
  * the funnel-latency feed a growth pipeline consumes continuously.
  */
object TwsCep {

  case class Ev(user_id: Long, ts_ms: Long, event_id: Long, sym: String)
  case class EvIn(user_id: Long, ts_ms: Long, event_id: Long, sym: String,
                  event_ts: java.sql.Timestamp)
  case class EvBuf(ts_ms: Long, event_id: Long, sym: String)
  case class Pend(start_ts_ms: Long, steps: Long)
  case class Match(user_id: Long, start_ts_ms: Long, end_ts_ms: Long,
                   n_steps: Long)

  /** Must equal the stream's watermark delay (same contract as
    * TwsQuota.latenessMs): a buffered event is final once the
    * watermark passes its timestamp.
    */
  val latenessMs: Long = 10 * 60 * 1000L

  class CepProcessor extends StatefulProcessor[Long, EvIn, Match] {
    @transient private var buf: ListState[EvBuf] = _
    @transient private var pend: ValueState[Pend] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[EvBuf](
        "buf", Encoders.product[EvBuf], TTLConfig.NONE)
      pend = getHandle.getValueState[Pend](
        "pend", Encoders.product[Pend], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EvIn],
                                 tv: TimerValues): Iterator[Match] = {
      var maxTs = Long.MinValue
      // one appendList per key per batch (see StreamingNearDup's
      // handleInputRows: the RocksDB ListState append is a
      // read-modify-write of the whole list — per-row appends are
      // O(L²) per key per batch against a horizon-sized buffer)
      val fresh = scala.collection.mutable.ArrayBuffer.empty[EvBuf]
      for (e <- rows) {
        fresh += EvBuf(e.ts_ms, e.event_id, e.sym)
        if (e.ts_ms > maxTs) maxTs = e.ts_ms
      }
      if (fresh.nonEmpty) buf.appendList(fresh.toArray)
      // fires once the watermark passes this batch's newest event —
      // at that point every event buffered so far is drainable (guard:
      // re-registering an expiry this key already holds is redundant)
      if (maxTs != Long.MinValue &&
          !getHandle.listTimers().contains(maxTs + 1))
        getHandle.registerTimer(maxTs + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Match] = {
      val cutoff = tv.getCurrentWatermarkInMs()
      val evs = buf.get().toSeq
      val (ready, rest) = evs.partition(_.ts_ms <= cutoff)
      if (ready.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[Match]
      var p: Option[Pend] = if (pend.exists()) Some(pend.get()) else None
      for (e <- ready.sortBy(x => (x.ts_ms, x.event_id))) {
        p match {
          case None =>
            if (e.sym == "s") p = Some(Pend(e.ts_ms, 1L))
          case Some(Pend(start, steps)) =>
            if (e.sym == "p") {
              out += Match(key, start, e.ts_ms, steps + 1)
              p = None
            } else p = Some(Pend(start, steps + 1))
        }
      }
      // drained prefix leaves the buffer; the machine register persists
      buf.clear()
      if (rest.nonEmpty) buf.appendList(rest.toArray)
      p match { case Some(v) => pend.update(v); case None => pend.clear() }
      out.result().iterator
    }
  }

  /** The streaming operator: one Match per completed s[^p]*p pattern. */
  def detect(events: Dataset[Ev]): Dataset[Match] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("event_ts", "10 minutes")
      .as[EvIn]
      .groupByKey(_.user_id)
      .transformWithState(new CepProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Batch oracle: the same non-overlapping fold over the full event
    * set in (ts, event_id) order — what w11's regex counts, with the
    * per-match spans the streaming operator also emits.
    */
  def batchOracle(events: Seq[Ev]): Seq[Match] =
    events.groupBy(_.user_id).toSeq.flatMap { case (uid, es) =>
      val out = Seq.newBuilder[Match]
      var p: Option[Pend] = None
      for (e <- es.sortBy(x => (x.ts_ms, x.event_id))) {
        p match {
          case None =>
            if (e.sym == "s") p = Some(Pend(e.ts_ms, 1L))
          case Some(Pend(start, steps)) =>
            if (e.sym == "p") { out += Match(uid, start, e.ts_ms, steps + 1); p = None }
            else p = Some(Pend(start, steps + 1))
        }
      }
      out.result()
    }
}
