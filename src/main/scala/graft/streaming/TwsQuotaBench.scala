package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.TwsQuota.Event

/** Throughput + bounded-state measurement for the transformWithState
  * quota operator — the third streaming state bound, after as-of
  * (O(horizon)) and heavy hitters (O(shards × capacity)): quota state
  * must be O(keys × live windows), where "live" is set by the
  * watermark delay — NOT by stream length, even though a longer
  * stream spans proportionally more event-time windows. The timers
  * are what enforce it: every expired window's MapState entry is
  * freed the batch after the watermark passes its admission horizon,
  * so a 5× longer stream (5× the windows, 5× the distinct
  * (key, window) pairs ever held) must peak at ~the same state size.
  *
  * Stream shape: K users in round-robin, event time advancing so each
  * (user, window) sees ~125 events (≫ the quota of 3 — the saturating
  * counter path dominates, as in production rate limiting). Slices
  * are event-time ordered, so microbatch replay is deterministic.
  */
object TwsQuotaBench {

  val users = 1000
  val stepMs = 28800L // per-row event-time advance ÷ users

  def eventAt(g: Long): Event =
    Event(g % users, (g / users) * stepMs, (g % 17).toDouble)

  def writeSlices(spark: SparkSession, dir: String, slices: Int,
                  rowsPerSlice: Int): Unit = {
    import spark.implicits._
    (0 until slices).foreach { s =>
      val base = s.toLong * rowsPerSlice
      spark.range(rowsPerSlice)
        .map(i => eventAt(base + i))
        .coalesce(1)
        .write.mode("append").parquet(dir)
    }
  }

  case class RunStats(rows: Long, wallSec: Double, rowsPerSec: Double,
                      peakStateRows: Long, peakStateBytes: Long,
                      batches: Int, windowsSpanned: Long)

  def run(spark: SparkSession, dir: String, rows: Long): RunStats = {
    import spark.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-twsb-ckpt").toString
    val prev = StreamScale.enableRocksDb(spark)
    try {
      val events = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir).as[Event]
      val t0 = System.nanoTime()
      val q = TwsQuota.admit(events)
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
      val windows = (rows / users) * stepMs / TwsQuota.windowMs + 1
      RunStats(rows, wall, rows / wall,
        if (stateRows.isEmpty) 0L else stateRows.max,
        if (stateBytes.isEmpty) 0L else stateBytes.max,
        progress.size, windows)
    } finally StreamScale.restore(spark, prev)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rowsPerSlice =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICE_ROWS", "100000").toInt
    val slicesShort = sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICES", "5").toInt
    val lenFactor = 5
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.metricsEnabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fresh(slices: Int): String = {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft-twsb-src$slices").toString
      writeSlices(spark, d, slices, rowsPerSlice)
      d
    }
    val dShort = fresh(slicesShort)
    val dLong = fresh(slicesShort * lenFactor)
    run(spark, dShort, slicesShort.toLong * rowsPerSlice) // warmup
    val short = run(spark, dShort, slicesShort.toLong * rowsPerSlice)
    val long_ = run(spark, dLong,
      slicesShort.toLong * lenFactor * rowsPerSlice)
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val growth = long_.peakStateBytes.toDouble /
      math.max(short.peakStateBytes, 1L)
    println(
      s"""{"metric":"streaming_tws_quota","users":$users,""" +
      s""""quota":${TwsQuota.maxPerWindow},""" +
      s""""short":{"rows":${short.rows},"windows":${short.windowsSpanned},""" +
      s""""sec":${fmt(short.wallSec)},"rows_per_sec":${fmt(short.rowsPerSec)},""" +
      s""""peak_state_rows":${short.peakStateRows},""" +
      s""""peak_state_bytes":${short.peakStateBytes},"batches":${short.batches}},""" +
      s""""long":{"rows":${long_.rows},"windows":${long_.windowsSpanned},""" +
      s""""sec":${fmt(long_.wallSec)},"rows_per_sec":${fmt(long_.rowsPerSec)},""" +
      s""""peak_state_rows":${long_.peakStateRows},""" +
      s""""peak_state_bytes":${long_.peakStateBytes},"batches":${long_.batches}},""" +
      s""""len_factor":$lenFactor,"state_bytes_growth":${fmt(growth)}}""")
    spark.stop()
  }
}
