package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC apply — the continuous counterpart of the batch MERGE
  * (c19_upsert_merge): a change stream of (op, key, value, seq) rows is
  * folded into a live keyed snapshot with mapGroupsWithState. Each
  * group's state is the key's CURRENT row version; every microbatch
  * emits the key's post-batch state (update output mode), so the sink
  * sees exactly the upsert stream a materialized view would apply.
  *
  * Ordering: within a batch, changes apply in `seq` order; across
  * batches, a change older than the applied high-water seq is ignored
  * (at-least-once sources redeliver — last-writer-wins BY SEQUENCE, not
  * by arrival, is what makes the fold idempotent under replay).
  * Deletes emit a tombstone row (deleted=true) and clear state, so
  * downstream sinks can retract.
  *
  * Scale shape: ONE shuffle on the key; state is one row per LIVE key
  * — bounded by the keyspace, not the stream length (deletes free
  * their key's state; the seq high-water for a deleted key rides in
  * the tombstone's grace period via ProcessingTimeTimeout below).
  * RocksDB-backed on a cluster, same discipline as StreamingAsOf.
  */
object CdcApply {

  case class Change(op: String, key: Long, value: Double, seq: Long)
  case class RowState(value: Double, seq: Long, deleted: Boolean)
  case class Snapshot(key: Long, value: Double, seq: Long, deleted: Boolean)

  /** Fold one group's batch of changes into its current state.
    * Pure function of (sorted changes, previous state) — shared by the
    * streaming operator and the spec's serial replay oracle.
    */
  def applyChanges(prev: Option[RowState], changes: Seq[Change]): Option[RowState] =
    changes.sortBy(c => (c.seq, c.op)).foldLeft(prev) { (st, c) =>
      val high = st.map(_.seq).getOrElse(Long.MinValue)
      if (c.seq <= high) st // stale redelivery: idempotent drop
      else c.op match {
        case "D" => Some(RowState(0.0, c.seq, deleted = true))
        case _   => Some(RowState(c.value, c.seq, deleted = false))
      }
    }

  /** The streaming operator: change stream in, upsert/tombstone stream
    * out. Tombstones keep their state row until the timeout so a stale
    * pre-delete redelivery cannot resurrect the key; after the grace
    * period the state is removed for good (bounded live-key state).
    */
  def applyStream(changes: Dataset[Change],
                  graceMs: Long = 60000L): Dataset[Snapshot] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState[RowState, Snapshot](
        GroupStateTimeout.ProcessingTimeTimeout) {
        (key: Long, it: Iterator[Change], state: GroupState[RowState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // tombstone grace expired: free the state slot
            val last = state.get
            state.remove()
            Snapshot(key, 0.0, last.seq, deleted = true)
          } else {
            val next = applyChanges(state.getOption, it.toSeq).get
            state.update(next)
            // live keys hold state with NO timeout (state == live row is
            // the operator's contract); only tombstones schedule their
            // own expiry
            if (next.deleted) state.setTimeoutDuration(graceMs)
            Snapshot(key, next.value, next.seq, next.deleted)
          }
      }
  }

  /** Batch oracle for the spec: the same fold applied serially per key
    * over the full change log — what the streaming result must equal
    * regardless of how the log was sliced into microbatches.
    */
  def replaySerial(all: Seq[Change]): Map[Long, RowState] =
    all.groupBy(_.key).flatMap { case (k, cs) =>
      applyChanges(None, cs).map(k -> _)
    }
}
