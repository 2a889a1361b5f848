package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka-facing source/sink, expressed through Spark's Kafka connector
  * (string-resolved `format("kafka")`, so this compiles without the
  * connector jar; at runtime it requires spark-sql-kafka-0-10 on the
  * classpath — not present in this container, hence exercised only via
  * the parquet-backed test doubles).
  *
  * Replaces the reference's consume/commit loop (kafka_client.py:
  * 168-176) and async producer (py:70-98) wholesale: the bounded
  * tail-N dump is ONE batch read with the offset range pushed down via
  * startingOffsets JSON (OffsetPlanner), and the produce path is the
  * built-in Kafka sink with its own batching — at-least-once both
  * ways, same as the reference (§2.11).
  */
object KafkaIO {

  /** Bounded batch read of the tail-N range. `begin`/`end` come from
    * the broker (AdminClient listOffsets in a real deployment; the
    * kafka-clients jar travels with the connector).
    */
  def boundedRead(
      spark: SparkSession,
      servers: String,
      topic: String,
      begin: Map[Int, Long],
      end: Map[Int, Long],
      n: Long): DataFrame = {
    val (targets, _) = OffsetPlanner.tailN(begin, end, n)
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", OffsetPlanner.offsetsJson(topic, targets))
      .option("endingOffsets", OffsetPlanner.offsetsJson(topic, end))
      .load()
      .select(col("key"), col("value"), col("partition"), col("offset"))
  }

  /** Streaming analog of the bounded dump: AvailableNow drains what
    * exists and stops; checkpointing upgrades the reference's
    * at-least-once commit loop to exactly-once into files (§2.11).
    */
  def streamRead(spark: SparkSession, servers: String, topic: String,
                 maxOffsetsPerTrigger: Long): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .select(col("key"), col("value"), col("partition"), col("offset"))

  /** Producer sink (K3): key/value preserved so Kafka's default
    * partitioner keeps per-key ordering (kafka_client.py:397-398).
    */
  def produceSink(records: Dataset[KafkaRecord], servers: String, topic: String): Unit =
    records.toDF()
      .select(col("key"), col("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .save()
}
