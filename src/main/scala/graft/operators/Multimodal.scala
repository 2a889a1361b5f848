package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * decoded/feature-extracted in distributed batch passes.
  *
  * No image/audio codecs exist in this environment (SURVEY.md builder
  * contract), so the DECODE step is a deterministic fake — derived
  * only from blob bytes — while everything Spark-side is real: binary
  * column handling, typed Dataset mapPartitions (the Scala analog of
  * mapInPandas batch UDFs), schema of the decoded struct, partition
  * behavior, and frame-sampling explode. Swapping the fake for a real
  * codec changes one function body, no plan shape.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Binary payload per doc: utf-8 bytes of text stand in for an
    * encoded image; metadata travels alongside.
    */
  case class Blob(doc_id: Long, payload: Array[Byte], source: String, n_chars: Long)
  case class Decoded(doc_id: Long, source: String, width: Int, height: Int,
                     n_frames: Int, payload_bytes: Int)

  /** Deterministic fake decode: dims derived from blob bytes only.
    * A real decoder (JPEG header parse, ffprobe, …) replaces this body.
    */
  private[operators] def fakeDecode(b: Blob): Decoded = {
    val first = if (b.payload.nonEmpty) b.payload(0) & 0xff else 0
    Decoded(
      doc_id = b.doc_id,
      source = b.source,
      width = 16 + b.payload.length % 64,
      height = 16 + first % 64,
      n_frames = 1 + (b.n_chars % 8).toInt,
      payload_bytes = b.payload.length)
  }

  /** Blob extraction + decode pass via typed mapPartitions —
    * batch-shaped (iterator in/out, one decoder init per partition),
    * exactly how a native decoder would be driven at scale. Shared by
    * m1 and m3 so their decode semantics cannot drift apart.
    */
  private def decoded(s: SparkSession, d: String) = {
    import s.implicits._
    graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
              col("source"), col("n_chars"))
      .as[Blob]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec handle, etc.)
        it.map(fakeDecode)
      }
  }

  val m1DecodeMeta: Q = (s, d) =>
    decoded(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_blobs"),
           sum(col("width")).as("sum_width"),
           sum(col("height")).as("sum_height"),
           sum(col("payload_bytes")).as("sum_bytes"))

  /** Frame sampling: every 2nd frame index of each "video" exploded to
    * one row per frame — the batch shape of video-frame extraction.
    */
  val m2FrameSample: Q = (s, d) =>
    graft.sources.Tables.documents(s, d)
      .withColumn("n_frames", (lit(1) + col("n_chars") % 8).cast("int"))
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1, 2)")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled_frames"),
           max(col("frame_idx")).as("max_frame_idx"))

  /** Resize planning: target dims halved with a floor of 16 — pure
    * metadata arithmetic over the decoded struct (no shuffle).
    */
  val m3ResizePlan: Q = (s, d) =>
    decoded(s, d)
      .select(col("doc_id"),
              greatest(lit(16), (col("width") / 2).cast("int")).as("target_w"),
              greatest(lit(16), (col("height") / 2).cast("int")).as("target_h"))
      .groupBy(col("target_w"), col("target_h"))
      .agg(count(lit(1)).as("n_blobs"))

  val queries: Map[String, Q] = Map(
    "m1_decode_meta" -> m1DecodeMeta,
    "m2_frame_sample" -> m2FrameSample,
    "m3_resize_plan" -> m3ResizePlan,
  )

  // The fake decode is pure byte arithmetic, so the oracle can replay
  // it in SQL: width = 16 + octet_len%64, height = 16 + first_byte%64.
  val oracles: Map[String, String] = Map(
    "m1_decode_meta" ->
      """SELECT source, count(1) AS n_blobs,
        | CAST(sum(16 + octet_length(CAST(text AS BLOB)) % 64) AS BIGINT) AS sum_width,
        | CAST(sum(16 + ascii(substring(text, 1, 1)) % 64) AS BIGINT) AS sum_height,
        | CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS sum_bytes
        |FROM documents GROUP BY source""".stripMargin,
    "m2_frame_sample" ->
      """SELECT source, count(1) AS n_sampled_frames, max(frame_idx) AS max_frame_idx
        |FROM (SELECT source, unnest(range(0, 1 + n_chars % 8, 2)) AS frame_idx
        |      FROM documents)
        |GROUP BY source""".stripMargin,
    "m3_resize_plan" ->
      """SELECT greatest(16, (16 + octet_length(CAST(text AS BLOB)) % 64) // 2) AS target_w,
        |       greatest(16, (16 + ascii(substring(text, 1, 1)) % 64) // 2) AS target_h,
        |       count(1) AS n_blobs
        |FROM documents GROUP BY 1, 2""".stripMargin,
  )
}
