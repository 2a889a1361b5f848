package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/** Parquet-backed RecordSink: the dry-run / broker-less stand-in
  * (reference dry_run keeps files local instead of uploading,
  * kafka_client.py:250-253). Also what the test suite drives.
  *
  * "End offsets" for a single-log file sink = current row count in
  * partition 0 — preserving the invariant that a consumer positioned
  * at the pre-produce snapshot reads exactly the reloaded rows.
  */
class ParquetRecordSink(spark: SparkSession, dir: String) extends RecordSink {

  override def endOffsets: Map[Int, Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map(0 -> 0L)
    else Map(0 -> spark.read.parquet(dir).count())
  }

  /** Single execution: write, then derive the row delta from parquet
    * footers. A count()-then-write would run the (possibly
    * non-deterministic) transformer twice and could report a count
    * that differs from the rows actually persisted.
    */
  override def write(records: Dataset[KafkaRecord]): Long = {
    val before = endOffsets(0)
    records.toDF().write.mode("append").parquet(dir)
    endOffsets(0) - before
  }
}
