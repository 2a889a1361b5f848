package graft

import java.nio.file.Files
import graft.streaming.HeavyHitters
import graft.streaming.HeavyHitters.{Obs, capacity, shardOf, shards}
import org.scalatest.funsuite.AnyFunSuite

/** Space-Saving guarantees, checked against exact batch counts on a
  * deterministic Zipf-ish skewed stream:
  *  - overestimate sandwich: est − err ≤ true ≤ est for every tracked
  *    item;
  *  - no false negatives above the frequency threshold: every item
  *    with true count > shard_seen / capacity is tracked;
  *  - bounded state: each shard tracks ≤ capacity items however many
  *    distinct items its stream carried.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic skew: item id i appears ~N/(i+1) times (hot head,
  // long tail), far more distinct items than capacity × shards
  private def mkStream: Seq[String] =
    (0 until 2000).flatMap { i =>
      val reps = math.max(1, 4000 / (i + 1))
      Seq.fill(reps)(s"item_$i")
    }

  test("space-saving sketch honors its guarantees on a skewed stream") {
    val items = mkStream
    val src = Files.createTempDirectory("graft-hh-src").toString
    items.map(it => Obs(shardOf(it), it)).toDS()
      .repartition(4).write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
      .as[Obs]
    val q = HeavyHitters.heavyHitters(stream)
      .writeStream.format("memory").queryName("graft_hh")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // counts are monotone → final summary = max est per (shard, item)
    val sketch = spark.table("graft_hh")
      .groupBy($"shard", $"item")
      .agg(org.apache.spark.sql.functions.max_by(
             org.apache.spark.sql.functions.struct($"est", $"err", $"shard_seen"),
             $"est").as("s"))
      .select($"shard", $"item", $"s.est", $"s.err", $"s.shard_seen")
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val exact: Map[String, Long] =
      items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val shardSeen: Map[Int, Long] =
      items.groupBy(shardOf).view.mapValues(_.size.toLong).toMap

    // bounded state
    val perShard = sketch.keys.groupBy(_._1).view.mapValues(_.size)
    perShard.foreach { case (sh, n) =>
      assert(n <= capacity, s"shard $sh tracks $n > capacity $capacity")
    }
    assert(sketch.nonEmpty && perShard.values.sum > capacity,
      "sketch suspiciously small — stream did not exercise eviction")

    // overestimate sandwich
    sketch.foreach { case ((sh, item), (est, err, seen)) =>
      val t = exact(item)
      assert(t <= est && est - err <= t,
        s"$item: true $t outside [est-err, est] = [${est - err}, $est]")
      assert(seen == shardSeen(sh),
        s"shard $sh seen $seen != actual ${shardSeen(sh)}")
    }

    // no false negatives above the guarantee threshold
    for ((item, t) <- exact) {
      val sh = shardOf(item)
      if (t > shardSeen(sh) / capacity)
        assert(sketch.contains((sh, item)),
          s"heavy item $item (true $t > ${shardSeen(sh)}/$capacity) not tracked")
    }
  }

  test("the sketch state is insensitive to batch slicing (fold associativity)") {
    // the same stream in one batch vs many batches must land identical
    // counters for TRACKED-FOREVER items: replay the pure update fold
    val items = mkStream.filter(it => shardOf(it) == 0)
    val oneShot = HeavyHitters.update(
      HeavyHitters.ShardState(Map.empty, 0L), items.iterator)
    val sliced = items.grouped(997).foldLeft(
      HeavyHitters.ShardState(Map.empty, 0L)) { (st, chunk) =>
      HeavyHitters.update(st, chunk.iterator)
    }
    assert(oneShot.seen == sliced.seen)
    assert(oneShot.counters == sliced.counters,
      "batch slicing changed the sketch — update is not a pure left fold")
  }
}
