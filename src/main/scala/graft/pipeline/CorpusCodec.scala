package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Documents ⇄ Kafka-record codec: the bridge between the reference's
  * dump/reload world (opaque (key, value) byte pairs on a partitioned
  * topic, kafka_client.py:172-173) and the analytics corpus the LLM
  * ops consume. A producer publishing a document corpus to a topic
  * would emit exactly this shape: key = the document id (the standard
  * compaction/ordering key), value = one JSON document, partition =
  * hash of the key — so a dump of that topic decodes back to the
  * corpus with `decode` and the curation pipeline (t14/t26) runs on
  * the result unchanged.
  *
  * Both directions are MAP-ONLY column expressions (`to_json` /
  * `from_json` are codegen'd Catalyst expressions): no shuffle, no
  * UDF, no driver work — encode/decode cost one scan at any corpus
  * size, and the partition/offset assignment is a pure projection
  * (doc_id is unique, so `doc_id DIV nPartitions` is unique and
  * monotone within each `doc_id % nPartitions` partition — a valid
  * Kafka offset order without a corpus-wide window).
  */
object CorpusCodec {
  val Topic = "documents"
  private val NPartitions = 3

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** documents rows → (key, value, partition, offset) producer records. */
  def encode(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("string").cast("binary").as("key"),
      to_json(struct(col("doc_id"), col("text"), col("lang"),
                     col("source"), col("n_chars"))).cast("binary").as("value"),
      (col("doc_id") % NPartitions).cast("int").as("partition"),
      expr(s"doc_id DIV $NPartitions").as("offset"))

  /** Reloaded (key, value) records → documents rows. Column order and
    * types match the driver corpus exactly, so `decode(...)` written
    * as `<dir>/documents.parquet` is a drop-in corpus for every
    * registered query.
    */
  def decode(records: DataFrame): DataFrame =
    records
      .select(from_json(col("value").cast("string"), docSchema).as("d"))
      .select(col("d.doc_id"), col("d.text"), col("d.lang"),
              col("d.source"), col("d.n_chars"))
}
