package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.TwsCep.Ev

/** Throughput + bounded-state measurement for the transformWithState
  * CEP operator — the fourth streaming state bound: the ListState
  * buffer holds only the NOT-YET-FINAL suffix of each key's stream
  * (events newer than the watermark), so its peak must track the
  * watermark horizon (lateness × arrival rate), NOT stream length.
  * A 5× longer stream must peak at ~the same state size; the drains
  * are what enforce it — every timer firing removes the finalized
  * prefix after folding it through the O(1) ValueState machine.
  *
  * Stream shape: K users round-robin, event time advancing so the
  * watermark trails ~lateness behind the head; symbols cycle
  * s,x,x,p,... so matches complete continuously (the emit path is
  * exercised, not just the buffer).
  */
object TwsCepBench {

  val users = 1000
  val stepMs = 28800L // per-row event-time advance ÷ users

  private val syms = Array("s", "x", "x", "p", "x")

  def eventAt(g: Long): Ev =
    Ev(g % users, 1700000000000L + (g / users) * stepMs, g,
       syms(((g / users) % syms.length).toInt))

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
                      batches: Int)

  def run(spark: SparkSession, dir: String, rows: Long): RunStats = {
    import spark.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cepb-ckpt").toString
    val prev = StreamScale.enableRocksDb(spark)
    try {
      val events = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir).as[Ev]
      val t0 = System.nanoTime()
      val q = TwsCep.detect(events)
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
        .createTempDirectory(s"graft-cepb-src$slices").toString
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
      s"""{"metric":"streaming_tws_cep","users":$users,""" +
      s""""short":{"rows":${short.rows},"sec":${fmt(short.wallSec)},""" +
      s""""rows_per_sec":${fmt(short.rowsPerSec)},""" +
      s""""peak_state_rows":${short.peakStateRows},""" +
      s""""peak_state_bytes":${short.peakStateBytes},"batches":${short.batches}},""" +
      s""""long":{"rows":${long_.rows},"sec":${fmt(long_.wallSec)},""" +
      s""""rows_per_sec":${fmt(long_.rowsPerSec)},""" +
      s""""peak_state_rows":${long_.peakStateRows},""" +
      s""""peak_state_bytes":${long_.peakStateBytes},"batches":${long_.batches}},""" +
      s""""len_factor":$lenFactor,"state_bytes_growth":${fmt(growth)}}""")
    spark.stop()
  }
}
