package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming BACKWARD AS-OF enrichment (the streaming twin of the
  * native batch as-of join, SURVEY.md §2.4/§2.11): one event stream
  * carries both reference events ("signup") and probe events
  * ("purchase"); every probe is enriched with the latest same-key
  * reference at-or-before its event time.
  *
  * Per key the state is ONE long — the latest reference time — which
  * is exactly the O(1) invariant `AsOfJoinExec`'s per-partition merge
  * holds; here it lives in the state store (RocksDB-backed on a real
  * cluster) keyed by user, so the operator scales as one shuffle on
  * the key plus bounded state, never a buffer of the stream.
  *
  * Streaming caveat (inherent to any low-latency as-of, documented
  * rather than hidden): enrichment is exact for in-order arrivals —
  * within a microbatch events are sorted by event time, and across
  * batches a reference enriches only probes in its own or later
  * batches. A reference that arrives AFTER a later-timestamped probe
  * was already emitted does not retro-correct it, and a probe that
  * arrives LATE (behind the held reference) is DROPPED rather than
  * matched forward — the state holds only the latest reference, so
  * the true backward match is gone, and emitting the future one would
  * break the signup_ts <= purchase_ts invariant. Batch as-of
  * (q19_asof_native) is the reconciliation path for both.
  */
object StreamingAsOf {

  case class Tick(user_id: Long, ts_ms: Long, event_type: String, value: Double)
  case class Enriched(user_id: Long, purchase_ts: Long, signup_ts: Long,
                      value: Double)
  case class LastRef(ts: Long)

  def asOfEnrich(ticks: Dataset[Tick]): Dataset[Enriched] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastRef, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Tick], state: GroupState[LastRef]) =>
          val out = Seq.newBuilder[Enriched]
          var last = state.getOption.map(_.ts).getOrElse(Long.MinValue)
          // per-batch event-time order; ties put the reference first so
          // an equal-time probe sees it (backward as-of is <=)
          val ordered = it.toSeq.sortBy(t =>
            (t.ts_ms, if (t.event_type == "signup") 0 else 1, t.value))
          for (t <- ordered) {
            if (t.event_type == "signup") {
              if (t.ts_ms > last) last = t.ts_ms
            } else if (t.event_type == "purchase" && last != Long.MinValue &&
                       last <= t.ts_ms) {
              // `last <= ts` guards cross-batch late probes: the held
              // reference may postdate them (see scaladoc caveat)
              out += Enriched(uid, t.ts_ms, last, t.value)
            }
          }
          if (last != Long.MinValue) state.update(LastRef(last))
          out.result().iterator
      }
  }
}
