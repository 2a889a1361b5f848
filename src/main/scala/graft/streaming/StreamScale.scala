package graft.streaming

import org.apache.spark.sql.SparkSession

/** Cluster-scale configuration for stateful streaming.
  *
  * The default (HDFSBackedStateStoreProvider) keeps every key's state
  * on the executor HEAP — at 100 TB with hundreds of millions of live
  * keys that is an OOM, not a config knob. RocksDB state (built into
  * Spark, rocksdbjni ships in jars/) moves state off-heap onto local
  * SSD with incremental (changelog) checkpointing, bounding both
  * memory and per-batch checkpoint upload to the changed keys.
  *
  * These are query-start-time confs: set them on the session before
  * `.start()` (or pass them in the SparkSession builder / defaults
  * file on a real cluster).
  */
object StreamScale {

  val rocksDbConfs: Map[String, String] = Map(
    // off-heap RocksDB state store
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // checkpoint deltas (changed keys), not full snapshots, per batch
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true",
    // bound RocksDB block-cache memory per executor instead of
    // letting every store grow unbounded
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" -> "512",
    // unload idle store instances after task-retry rebalancing
    "spark.sql.streaming.stateStore.minDeltasForSnapshot" -> "10")

  /** Apply the RocksDB state confs to a session (idempotent). Returns
    * the previous values so tests can restore them.
    */
  def enableRocksDb(spark: SparkSession): Map[String, Option[String]] = {
    val prev = rocksDbConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    rocksDbConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    prev
  }

  /** Restore confs captured by [[enableRocksDb]]. */
  def restore(spark: SparkSession, prev: Map[String, Option[String]]): Unit =
    prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
}
