package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.HeavyHitters.Obs

/** Throughput + bounded-state measurement for the Space-Saving
  * heavy-hitters operator — the streaming twin of
  * `StreamThroughputBench`, probing the OTHER state bound: as-of
  * state is O(horizon); heavy-hitter state is O(shards × capacity)
  * REGARDLESS OF DISTINCT-ITEM CARDINALITY.
  *
  * Method: a skewed item stream (30% of arrivals on 7 hot items, the
  * rest each globally UNIQUE — so cardinality grows linearly with
  * stream length) replays as time-sliced microbatches on the RocksDB
  * store at two lengths. Exact streaming `groupBy(item).count` state
  * grows with distinct items (5× length → ~5× state); Space-Saving
  * must hold peak state flat — the capacity eviction is the whole
  * point. Reported: rows/sec, distinct-item count per run, and peak
  * state rows/bytes (rows = shard count by construction; bytes are
  * the real bound since each shard holds a ≤capacity counter map).
  */
object HeavyHittersBench {

  /** Deterministic skew: 3 arrivals in 10 hit one of 7 hot items;
    * every other arrival is a NEVER-REPEATED item, so the distinct
    * count scales with stream length while the heavy hitters stay
    * fixed — the adversarial shape for any bounded summary.
    */
  def itemAt(g: Long): Obs = {
    val item = if (g % 10 < 3) s"hot_${g % 7}" else s"rare_$g"
    Obs(HeavyHitters.shardOf(item), item)
  }

  def writeSlices(spark: SparkSession, dir: String, slices: Int,
                  rowsPerSlice: Int): Unit = {
    import spark.implicits._
    (0 until slices).foreach { s =>
      val base = s.toLong * rowsPerSlice
      spark.range(rowsPerSlice)
        .map(i => itemAt(base + i))
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
      .createTempDirectory("graft-hhb-ckpt").toString
    val prev = StreamScale.enableRocksDb(spark)
    try {
      val obs = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Obs]].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir).as[Obs]
      val t0 = System.nanoTime()
      val q = HeavyHitters.heavyHitters(obs)
        .writeStream.outputMode("update")
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
    import spark.implicits._

    def fresh(slices: Int): String = {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft-hhb-src$slices").toString
      writeSlices(spark, d, slices, rowsPerSlice)
      d
    }
    val dShort = fresh(slicesShort)
    val dLong = fresh(slicesShort * lenFactor)
    val distinctShort =
      spark.read.parquet(dShort).as[Obs].map(_.item).distinct().count()
    val distinctLong =
      spark.read.parquet(dLong).as[Obs].map(_.item).distinct().count()
    run(spark, dShort, slicesShort.toLong * rowsPerSlice) // warmup
    val short = run(spark, dShort, slicesShort.toLong * rowsPerSlice)
    val long_ = run(spark, dLong,
      slicesShort.toLong * lenFactor * rowsPerSlice)
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val growth = long_.peakStateBytes.toDouble /
      math.max(short.peakStateBytes, 1L)
    println(
      s"""{"metric":"streaming_heavy_hitters",""" +
      s""""shards":${HeavyHitters.shards},"capacity":${HeavyHitters.capacity},""" +
      s""""short":{"rows":${short.rows},"distinct":$distinctShort,""" +
      s""""sec":${fmt(short.wallSec)},"rows_per_sec":${fmt(short.rowsPerSec)},""" +
      s""""peak_state_rows":${short.peakStateRows},""" +
      s""""peak_state_bytes":${short.peakStateBytes},"batches":${short.batches}},""" +
      s""""long":{"rows":${long_.rows},"distinct":$distinctLong,""" +
      s""""sec":${fmt(long_.wallSec)},"rows_per_sec":${fmt(long_.rowsPerSec)},""" +
      s""""peak_state_rows":${long_.peakStateRows},""" +
      s""""peak_state_bytes":${long_.peakStateBytes},"batches":${long_.batches}},""" +
      s""""len_factor":$lenFactor,"state_bytes_growth":${fmt(growth)}}""")
    spark.stop()
  }
}
