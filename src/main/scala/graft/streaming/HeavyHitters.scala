package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming HEAVY HITTERS with BOUNDED state — the Space-Saving
  * sketch (Metwally et al.'s top-k summary from the stream literature)
  * as a flatMapGroupsWithState operator.
  *
  * The scale problem it solves: exact streaming `groupBy(item).count`
  * keeps one state row PER DISTINCT ITEM — at billions of distinct
  * keys (URLs, user ids, n-grams) the state store becomes the job.
  * Space-Saving caps the tracked set at CAPACITY items per shard: an
  * untracked arrival evicts the current minimum and inherits its count
  * as an error bound. Guarantees (asserted by HeavyHittersSpec against
  * exact batch counts):
  *  - est  = tracked count OVERESTIMATES: true ≤ est, est − err ≤ true;
  *  - any item with true count > N_shard / capacity is GUARANTEED
  *    tracked (no false negatives above the frequency threshold).
  *
  * Sharding: items are hash-partitioned across SHARDS, so each item's
  * stream lands wholly in ONE shard — a shard-local count IS the
  * global count (no cross-shard merge error; shards exist only to
  * parallelize). State per shard is O(capacity) regardless of stream
  * length or cardinality; counts are monotone, so the LAST emission
  * per (shard, item) is the final summary (take max over emissions).
  */
object HeavyHitters {

  case class Obs(shard: Int, item: String)
  case class Tracked(item: String, est: Long, err: Long)
  case class ShardState(counters: Map[String, (Long, Long)], seen: Long)
  case class Summary(shard: Int, item: String, est: Long, err: Long,
                     shard_seen: Long)

  val shards = 8
  val capacity = 64

  def shardOf(item: String): Int = math.abs(item.hashCode % shards)

  /** One Space-Saving update pass over a batch of items. */
  private[graft] def update(st: ShardState,
                            items: Iterator[String]): ShardState =
    items.foldLeft(st) { (s, item) =>
      val c = s.counters
      val next =
        if (c.contains(item)) {
          val (est, err) = c(item)
          c.updated(item, (est + 1, err))
        } else if (c.size < capacity) {
          c.updated(item, (1L, 0L))
        } else {
          // evict the minimum (deterministic tie: smallest item key),
          // inherit its count as the new item's error bound
          val (minItem, (minEst, _)) =
            c.minBy { case (k, (est, _)) => (est, k) }
          (c - minItem).updated(item, (minEst + 1, minEst))
        }
      ShardState(next, s.seen + 1)
    }

  /** The streaming operator: shard-keyed Space-Saving over an item
    * stream; emits the shard's full summary each batch (counts are
    * monotone — the last emission wins).
    */
  def heavyHitters(obs: Dataset[Obs]): Dataset[Summary] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.shard)
      .flatMapGroupsWithState[ShardState, Summary](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[Obs], state: GroupState[ShardState]) =>
          val st0 = state.getOption.getOrElse(ShardState(Map.empty, 0L))
          val st = update(st0, it.map(_.item))
          state.update(st)
          st.counters.iterator.map { case (item, (est, err)) =>
            Summary(shard, item, est, err, st.seen)
          }
      }
  }
}
