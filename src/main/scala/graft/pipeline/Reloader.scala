package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Reload side (kafka_client.py:372-424): read a dump in file order,
  * apply the transformer (1→0..n flatMap), hand rows to a sink — with
  * the reference's hot-reload short-circuit (state match → offset
  * reset, no data movement).
  */
class Reloader(spark: SparkSession, store: StateStore) {

  /** Read a dump directory in the reference's order: lexicographic
    * file sort == consumption order (kafka_client.py:291). The sort
    * key includes the in-file row index — a file bigger than one scan
    * split would otherwise have its rows tie on file name alone and
    * land in nondeterministic shuffle-fetch order.
    *
    * ORDERING CONTRACT at the sink: rows leave here globally sorted,
    * but a distributed sink writes from N tasks concurrently, so only
    * PER-TASK (range-contiguous) order is guaranteed to survive at
    * the target — which is exactly the reference's own produce
    * guarantee (Kafka preserves per-partition order only, SURVEY
    * §2.11). Readers that need global order back sort file-wise, as
    * this method itself does; PipelineSpec's split-spanning test pins
    * the round trip.
    */
  def read(dumpDir: String): DataFrame =
    spark.read.parquet(dumpDir)
      .orderBy(col("_metadata.file_path"), col("_metadata.row_index"))
      .select(col("0").as("key"), col("1").as("value"))

  /** Transformer application as a typed flatMap (SURVEY.md §2.9 U1). */
  def transformed(dumpDir: String, t: Transformer): Dataset[KafkaRecord] = {
    import spark.implicits._
    read(dumpDir).as[KafkaRecord].flatMap(t.transform(_))
  }

  /** Full reload flow (kafka_client.py:406-424). Returns what happened:
    * - HotReload(offsets): state matched → the consumer group should
    *   just be reset to `offsets`; nothing was produced.
    * - Reloaded(n, state): rows went to the sink; state was generated
    *   BEFORE producing (end-offset snapshot, kafka_client.py:378 —
    *   the ordering is semantic, §2.11) and saved AFTER (py:404).
    */
  def reload(
      topic: String,
      dumpDir: String,
      dumpId: String,
      t: Transformer,
      sink: RecordSink,
      allowHotReload: Boolean = true): ReloadResult = {
    store.latestMatching(topic, dumpId, t.id).filter(_ => allowHotReload) match {
      case Some(state) =>
        HotReload(state.offsets)
      case None =>
        val preProduceOffsets = sink.endOffsets
        val state = DumpState(
          dump_id = dumpId,
          topic_name = topic,
          offsets = preProduceOffsets.map { case (p, o) => p.toString -> o },
          dump_date = System.currentTimeMillis() / 1000,
          transformer_id = t.id)
        val n = sink.write(transformed(dumpDir, t))
        store.save(state)
        Reloaded(n, state)
    }
  }
}

sealed trait ReloadResult
/** State matched: reset the consumer group to these offsets. */
case class HotReload(offsets: Map[String, Long]) extends ReloadResult
/** Rows were produced; `state` captures the pre-produce end offsets. */
case class Reloaded(rows: Long, state: DumpState) extends ReloadResult

/** Record sink boundary. Production impl: Kafka producer sink
  * (KafkaIO); test impl: parquet directory. `endOffsets` is the
  * pre-produce snapshot the hot-reload invariant depends on.
  */
trait RecordSink {
  def endOffsets: Map[Int, Long]
  def write(records: Dataset[KafkaRecord]): Long
}
