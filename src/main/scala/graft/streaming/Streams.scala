package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming parity (SURVEY.md §2.11 / M3).
  *
  * The reference's bounded dump is a batch read of a Kafka range; its
  * continuous analog is readStream + Trigger.AvailableNow: drain
  * everything available, checkpoint, stop. The file-sink commit log
  * makes this exactly-once (an upgrade over the reference's
  * at-least-once commit loop, documented as such).
  *
  * Sources here are file streams so the logic runs (and is tested)
  * without a broker; swapping in KafkaIO.streamRead changes only the
  * source node of the plan.
  */
object Streams {

  /** Continuous dump: stream from a source directory into gzip parquet,
    * chunked by trigger (maxFilesPerTrigger ≙ the reference's batch
    * chunking). Returns the started query; callers await termination.
    */
  def streamingDump(
      spark: SparkSession,
      schema: StructType,
      srcDir: String,
      destDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .option("compression", "gzip")
      .format("parquet")
      .option("path", destDir)
      .start()

  /** Tumbling-window aggregation with a watermark (late data dropped
    * after 10 minutes of event time).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Sliding-window aggregation (1 hour window, 15 minute slide). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("user_id"), col("n"))

  /** Session windows: 30-minute inactivity gap per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
              col("user_id"), col("n"))

  /** Streaming dedup within the watermark (dropDuplicates on keys).
    * NB this variant keeps one state entry per distinct key FOREVER —
    * correct only when the key space is bounded.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")

  /** Scale-correct streaming dedup: state for a key is dropped once
    * the watermark passes its event time + delay, so the state store
    * is bounded by the watermark window rather than the lifetime key
    * count — the variant to use for unbounded key spaces (e.g.
    * event_id dedup over weeks of traffic).
    */
  def dedupStreamBounded(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases attributed to the signup
    * that happened up to `horizon` BEFORE them, per user. Both sides
    * carry watermarks and the join condition time-bounds the match,
    * so each side's buffered state is evicted once the other side's
    * watermark passes the interval — bounded state at any scale (the
    * unbounded-state stream join is the classic 100 TB OOM).
    */
  def purchaseAttribution(
      purchases: DataFrame,   // (p_id, user_id, ts)
      signups: DataFrame,     // (s_id, s_user, s_ts)
      horizon: String = "1 hour"): DataFrame =
    purchases.withWatermark("ts", "10 minutes")
      .join(
        signups.withWatermark("s_ts", "10 minutes"),
        expr(s"""user_id = s_user
                |AND ts >= s_ts
                |AND ts <= s_ts + INTERVAL $horizon""".stripMargin))
      .select(col("p_id"), col("user_id"), col("s_id"), col("ts"), col("s_ts"))

  /** Watermarked stream-stream LEFT OUTER join — the semantics the
    * inner attribution join above cannot express: a signup with NO
    * purchase inside the horizon must still be emitted (null purchase
    * side), and it can only be emitted once the WATERMARK proves no
    * matching purchase can still arrive. That proof is the whole
    * operator: the null-side row for signup s flushes when the
    * purchase-side watermark passes s_ts + horizon, which is exactly
    * when the join state for s is also freed — the same bound that
    * makes the state O(horizon), not O(stream).
    *
    * At scale this is the conversion-funnel / abandonment feed: one
    * shuffle per side on user, per-key state bounded by the horizon,
    * RocksDB-backed. The left-outer emission discipline is what a
    * "send a nudge to users who signed up but didn't buy" pipeline
    * runs continuously.
    */
  def signupOutcomes(
      purchases: DataFrame,   // (p_id, user_id, ts)
      signups: DataFrame,     // (s_id, s_user, s_ts)
      horizon: String = "1 hour"): DataFrame =
    signups.withWatermark("s_ts", "10 minutes")
      .join(
        purchases.withWatermark("ts", "10 minutes"),
        expr(s"""user_id = s_user
                |AND ts >= s_ts
                |AND ts <= s_ts + INTERVAL $horizon""".stripMargin),
        "left_outer")
      .select(col("s_id"), col("s_user"), col("s_ts"),
              col("p_id"), col("ts").as("p_ts"))

  /** Watermarked stream-stream FULL OUTER join — the reconciliation
    * ledger that completes the streaming join-mode matrix: matched
    * conversions, unconverted signups (null purchase side), AND
    * orphan purchases that attach to no signup (null signup side —
    * the attribution-leak / fraud feed an inner or left join silently
    * drops). Each null-side emission waits on the OPPOSING stream's
    * watermark proving no match can still arrive, and that same bound
    * frees the buffered state for both sides — full outer costs no
    * extra state over left outer (still O(horizon) per key), only the
    * extra emission discipline.
    */
  def attributionLedger(
      purchases: DataFrame,   // (p_id, user_id, ts)
      signups: DataFrame,     // (s_id, s_user, s_ts)
      horizon: String = "1 hour"): DataFrame =
    signups.withWatermark("s_ts", "10 minutes")
      .join(
        purchases.withWatermark("ts", "10 minutes"),
        expr(s"""user_id = s_user
                |AND ts >= s_ts
                |AND ts <= s_ts + INTERVAL $horizon""".stripMargin),
        "full_outer")
      .select(col("s_id"), col("s_user"), col("s_ts"),
              col("p_id"), col("user_id"), col("ts").as("p_ts"))

  /** STREAM-STATIC enrichment join: each microbatch of the stream
    * joins against a STATIC dimension table (here broadcast — the
    * stateless streaming join: no watermark, no join state, because
    * the static side is complete by definition). This is the
    * dimension-enrichment every event feed runs (user → segment,
    * domain → license tier) before any stateful logic; the left-outer
    * shape keeps unmatched events (null dimension) flowing rather
    * than silently dropping them. At 100 TB the dimension either
    * broadcasts (small) or is bucketed to co-locate with the stream's
    * key partitioning — either way the stream side never shuffles
    * twice.
    */
  def enrichAgainstDimension(
      events: DataFrame,      // streaming (user_id, ts, value)
      dim: DataFrame): DataFrame =  // static (user_id, segment)
    events.join(broadcast(dim), Seq("user_id"), "left_outer")
      .withColumn("segment", coalesce(col("segment"), lit("unknown")))

  /** Continuous dump INTO the reference catalog layout: each
    * micro-batch lands as its own dump (`{dumpId}-b{batch}`) with the
    * cumulative-named gzip files the batch Dumper produces —
    * foreachBatch is the bridge for sinks the streaming engine has no
    * native writer for. Checkpointing makes batch ids stable across
    * restarts, so reprocessing overwrites the same dump dir instead of
    * duplicating (effectively exactly-once at dump granularity).
    */
  def streamingDumpToCatalog(
      spark: SparkSession,
      schema: StructType,
      srcDir: String,
      destRoot: String,
      dumpId: String,
      maxPerFile: Int,
      checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        new graft.pipeline.Dumper(batch.sparkSession)
          .dump(batch, destRoot, f"$dumpId-b$batchId%03d", maxPerFile)
        ()
      }
      .start()
}
