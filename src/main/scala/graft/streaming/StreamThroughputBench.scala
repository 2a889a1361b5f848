package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.streaming.StreamingAsOf.Tick

/** Throughput + state-size measurement for the watermark-buffered
  * streaming as-of (`StreamingAsOf.asOfEnrichWatermarked`) on the
  * RocksDB state store — the evidence behind its O(horizon) state
  * claim, to go with the correctness specs.
  *
  * Method: a deterministic tick stream (fixed key count, fixed per-key
  * event rate, bounded jitter so arrivals are out of order WITHIN the
  * watermark delay) is written as time-sliced parquet files and
  * replayed with `maxFilesPerTrigger=1` + AvailableNow — each slice is
  * one microbatch, so the watermark advances slice by slice exactly as
  * it would against a live source. Two runs differ ONLY in stream
  * LENGTH (more slices, same keys, same rate, same horizon):
  *
  *  - rows/sec = total input rows / wall seconds per run;
  *  - state growth = peak stateOperators.numRowsTotal and
  *    memoryUsedBytes per run, read from the query progress metrics.
  *
  * O(horizon) state means the LONGER stream must NOT hold more state
  * at its peak: in-flight probes and in-horizon references depend on
  * (keys × rate × delay), never on elapsed stream length. A buffer
  * leak (references never collapsed, probes never drained) shows up
  * as peak state scaling with the x-fold length instead.
  */
object StreamThroughputBench {

  /** One event per global index g: uid cycles over `users`, per-user
    * sequence n advances event time by `stepMs`, and a deterministic
    * jitter < half the watermark delay scrambles arrival order within
    * the horizon. Every 5th per-user event is a reference (signup).
    */
  def tickAt(g: Long, users: Int, stepMs: Long): Tick = {
    val uid = g % users
    val n = g / users
    val jitter = (g * 2654435761L % 997L) - 498L // ±0.5 s, delay is 2 s
    val ts = math.max(0L, n * stepMs + jitter)
    val kind = if (n % 5 == 0) "signup" else "purchase"
    Tick(uid, ts, kind, g.toDouble)
  }

  def writeSlices(spark: SparkSession, dir: String, users: Int,
                  slices: Int, rowsPerSlice: Int, stepMs: Long): Unit = {
    import spark.implicits._
    (0 until slices).foreach { s =>
      val base = s.toLong * rowsPerSlice
      spark.range(rowsPerSlice)
        .map(i => tickAt(base + i, users, stepMs))
        .coalesce(1)
        .write.mode("append").parquet(dir)
    }
  }

  case class RunStats(rows: Long, wallSec: Double, rowsPerSec: Double,
                      peakStateRows: Long, peakStateBytes: Long,
                      batches: Int)

  /** Replay `dir` through the watermarked as-of on RocksDB state and
    * collect wall time + peak state metrics.
    */
  def run(spark: SparkSession, dir: String, rows: Long): RunStats = {
    import spark.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stb-ckpt").toString
    val prev = StreamScale.enableRocksDb(spark)
    try {
      val ticks: Dataset[Tick] = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Tick]].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir).as[Tick]
      val t0 = System.nanoTime()
      val q: StreamingQuery = StreamingAsOf.asOfEnrichWatermarked(ticks)
        .writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
      val stateBytes = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      RunStats(rows, wall, rows / wall,
        if (stateRows.isEmpty) 0L else stateRows.max,
        if (stateBytes.isEmpty) 0L else stateBytes.max,
        progress.size)
    } finally StreamScale.restore(spark, prev)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val users = sys.env.getOrElse("SPARK_GRAFT_STREAM_USERS", "2000").toInt
    val rowsPerSlice =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICE_ROWS", "100000").toInt
    val slicesShort = sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICES", "5").toInt
    val lenFactor = 5 // long run = lenFactor x the short run
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.metricsEnabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fresh(slices: Int): String = {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft-stb-src$slices").toString
      writeSlices(spark, d, users, slices, rowsPerSlice, stepMs = 50L)
      d
    }
    val dShort = fresh(slicesShort)
    val dLong = fresh(slicesShort * lenFactor)
    // warmup run (JIT + RocksDB native lib load) on the short corpus
    run(spark, dShort, slicesShort.toLong * rowsPerSlice)
    val short = run(spark, dShort, slicesShort.toLong * rowsPerSlice)
    val long_ = run(spark, dLong,
      slicesShort.toLong * lenFactor * rowsPerSlice)
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val growth = long_.peakStateBytes.toDouble /
      math.max(short.peakStateBytes, 1L)
    println(
      s"""{"metric":"streaming_asof","users":$users,""" +
      s""""short":{"rows":${short.rows},"sec":${fmt(short.wallSec)},""" +
      s""""rows_per_sec":${fmt(short.rowsPerSec)},"peak_state_rows":${short.peakStateRows},""" +
      s""""peak_state_bytes":${short.peakStateBytes},"batches":${short.batches}},""" +
      s""""long":{"rows":${long_.rows},"sec":${fmt(long_.wallSec)},""" +
      s""""rows_per_sec":${fmt(long_.rowsPerSec)},"peak_state_rows":${long_.peakStateRows},""" +
      s""""peak_state_bytes":${long_.peakStateBytes},"batches":${long_.batches}},""" +
      s""""len_factor":$lenFactor,"state_bytes_growth":${fmt(growth)}}""")
    spark.stop()
  }
}
