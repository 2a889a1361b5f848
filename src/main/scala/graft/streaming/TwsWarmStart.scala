package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues,
  ValueState}

/** Warm-starting a stateful stream from a BATCH snapshot — the
  * transformWithState `initialState` surface, and operationally the
  * lambda-architecture handoff every long-lived pipeline eventually
  * needs: the historical corpus is folded ONCE in batch (cheap,
  * parallel, restartable), the streaming job boots with that fold as
  * its per-key state, and from the first microbatch onward it behaves
  * as if it had consumed the entire history — without replaying it
  * through the stream.
  *
  * The operator is a per-key running total (count + sum emitted per
  * event — the simplest fold where a missing warm start is VISIBLE in
  * every output row). TwsWarmStartSpec pins the contract that makes
  * warm start trustworthy: batch-prefix-fold + streamed suffix ≡
  * streaming the whole log cold, row for row.
  *
  * At 100 TB this is the difference between a streaming dedup/quota/
  * CDC job that starts useful immediately and one that must re-consume
  * months of retained log: the snapshot load is one co-partitioned
  * state write (same key hashing as the stream shuffle), not a replay.
  */
object TwsWarmStart {

  case class Ev(user_id: Long, ts_ms: Long, amount: Long)
  case class EvIn(user_id: Long, ts_ms: Long, amount: Long,
                  event_ts: java.sql.Timestamp)
  case class Snapshot(user_id: Long, n: Long, total: Long)
  case class Running(user_id: Long, ts_ms: Long, n: Long, total: Long)

  class TotalProcessor
      extends StatefulProcessorWithInitialState[Long, EvIn, Running, Snapshot] {
    @transient private var acc: ValueState[Snapshot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[Snapshot](
        "acc", Encoders.product[Snapshot], TTLConfig.NONE)

    override def handleInitialState(key: Long, initialState: Snapshot,
                                    tv: TimerValues): Unit =
      acc.update(initialState)

    override def handleInputRows(key: Long, rows: Iterator[EvIn],
                                 tv: TimerValues): Iterator[Running] = {
      var cur = if (acc.exists()) acc.get() else Snapshot(key, 0L, 0L)
      val out = Seq.newBuilder[Running]
      // per-key fold in event-time order within the batch (the CdcApply
      // slicing discipline: cross-batch determinism holds when slices
      // respect per-key event-time order)
      for (e <- rows.toSeq.sortBy(x => (x.ts_ms, x.amount))) {
        cur = Snapshot(key, cur.n + 1, cur.total + e.amount)
        out += Running(key, e.ts_ms, cur.n, cur.total)
      }
      acc.update(cur)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Running] =
      Iterator.empty
  }

  /** Streaming running totals, warm-started from `snapshot`. */
  def run(events: Dataset[Ev], snapshot: Dataset[Snapshot]): Dataset[Running] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
      .as[EvIn]
      .groupByKey(_.user_id)
      .transformWithState(new TotalProcessor, TimeMode.None(),
        OutputMode.Append(), snapshot.groupByKey(_.user_id))
  }

  /** The batch fold that produces the warm-start snapshot. */
  def snapshotOf(events: Dataset[Ev]): Dataset[Snapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroups { (uid, es) =>
        val l = es.toSeq
        Snapshot(uid, l.size.toLong, l.map(_.amount).sum)
      }
  }
}
