package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_millis}
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
  * break the signup_ts <= purchase_ts invariant. Use
  * `asOfEnrichWatermarked` when out-of-order arrivals within a bounded
  * delay must match EXACTLY (it trades emission latency for that
  * exactness); batch as-of (q19_asof_native) reconciles anything later
  * than the watermark bound.
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

  /** Watermark horizon state for `asOfEnrichWatermarked`:
    *  - `oldRef`   — the single latest reference time at-or-below the
    *    watermark (everything older is collapsed into it: a buffered
    *    probe always has ts at-or-after every past watermark, so the
    *    max collapsed reference is exactly its best sub-watermark
    *    candidate);
    *  - `refs`     — reference times still above the watermark (a
    *    bounded window: watermark delay × per-key reference rate);
    *  - `probes`   — buffered (ts, value) probes awaiting maturity.
    */
  case class AsOfWmState(oldRef: Long, refs: List[Long],
                         probes: List[(Long, Double)])

  private[streaming] case class TickT(
      user_id: Long, ts_ms: Long, event_type: String, value: Double,
      event_time: java.sql.Timestamp)

  /** EXACT streaming backward as-of for arrivals within a bounded
    * event-time delay — the watermark-buffered closure of
    * `asOfEnrich`'s drop semantics: instead of dropping a probe that
    * arrives behind the held reference, probes are BUFFERED in state
    * and emitted only once the watermark passes their event time (via
    * event-time timeout when no new data arrives for the key). By
    * then every reference at-or-before the probe that can ever arrive
    * has been seen (later ones would be beyond-watermark late and are
    * filtered by the operator), so each emitted enrichment equals the
    * batch as-of answer; only events later than `delay` out of order
    * are dropped, which is the watermark contract every Structured
    * Streaming stateful operator shares.
    *
    * State stays bounded: one collapsed reference + the in-horizon
    * reference window + in-flight probes, all pruned as the watermark
    * advances — O(horizon), not O(stream), per key in the state store.
    */
  def asOfEnrichWatermarked(
      ticks: Dataset[Tick], delay: String = "2 seconds"): Dataset[Enriched] = {
    import ticks.sparkSession.implicits._
    ticks
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .as[TickT]
      .withWatermark("event_time", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfWmState, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TickT], state: GroupState[AsOfWmState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(AsOfWmState(Long.MinValue, Nil, Nil))
          var refs = st.refs
          var oldRef = st.oldRef
          var probes = st.probes
          for (t <- it) {
            if (t.event_type == "signup") refs = t.ts_ms :: refs
            else if (t.event_type == "purchase") probes = (t.ts_ms, t.value) :: probes
          }
          // a probe matures once the watermark is strictly past it: a
          // same-ts reference could still arrive at ts == wm (the late
          // filter drops only strictly-older rows), so wait it out
          val (ready, waiting) = probes.partition(_._1 < wm)
          val out = ready.sortBy(identity).flatMap { case (ts, v) =>
            val inWin = refs.filter(_ <= ts)
            val m = if (inWin.nonEmpty) inWin.max
                    else oldRef // always <= every buffered probe's ts
            if (m != Long.MinValue) Some(Enriched(uid, ts, m, v)) else None
          }
          // collapse sub-watermark references into the single max
          val (below, keep) = refs.partition(_ < wm)
          if (below.nonEmpty) oldRef = math.max(oldRef, below.max)
          if (waiting.isEmpty && keep.isEmpty && oldRef == Long.MinValue) {
            state.remove()
          } else {
            state.update(AsOfWmState(oldRef, keep, waiting))
            // fire again once the earliest waiting probe matures, even
            // if no further events arrive for this key
            if (waiting.nonEmpty)
              state.setTimeoutTimestamp(waiting.map(_._1).min + 1)
          }
          out.iterator
      }
  }
}
