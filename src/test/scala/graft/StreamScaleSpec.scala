package graft

import java.nio.file.Files
import graft.streaming.{StatefulSessions, StreamScale}
import graft.streaming.StatefulSessions.Event
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The stateful sessionizer running on the RocksDB state store — the
  * 100 TB configuration (off-heap state, changelog checkpointing) —
  * must produce the same sessions as the default heap store, and the
  * checkpoint must actually be RocksDB-format.
  */
class StreamScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessionizer on RocksDB state store: same results, rocksdb checkpoint") {
    val src = Files.createTempDirectory("graft-rocks-src").toString
    val ckpt = Files.createTempDirectory("graft-rocks-ckpt").toString
    val gap = StatefulSessions.gapMs
    val rows = Seq(
      Event(1, 1000L, 1.0), Event(1, 2000L, 2.0), Event(1, 3000L, 3.0),
      Event(1, 3000L + gap, 10.0), Event(1, 4000L + gap, 20.0),
      Event(2, 500L, 7.0))
    rows.toDF().write.mode("overwrite").parquet(src)

    val prev = StreamScale.enableRocksDb(spark)
    try {
      val stream = spark.readStream.schema(rows.toDF().schema).parquet(src).as[Event]
      val q = StatefulSessions.sessionize(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_rocks")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val closed = spark.table("graft_rocks")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
                   r.getAs[Double]("sum_value")))
        .sortBy(x => (x._1, x._2))
      assert(closed.toSeq == Seq((1L, 3L, 6.0)))

      // the state dir must contain RocksDB artifacts (sst/changelog/zip),
      // not the heap store's .delta files
      val stateFiles = {
        val dir = java.nio.file.Paths.get(ckpt, "state")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(_.getFileName.toString).toList
      }
      assert(stateFiles.exists(f => f.endsWith(".changelog") || f.endsWith(".zip")),
             s"no RocksDB checkpoint artifacts in $stateFiles")
      assert(!stateFiles.exists(_.endsWith(".delta")),
             s"heap-store .delta files present: $stateFiles")
    } finally StreamScale.restore(spark, prev)
  }

  test("watermarked as-of state is O(horizon): peak state does not scale with stream length") {
    import graft.streaming.StreamThroughputBench
    val users = 50
    val rowsPerSlice = 2000
    def corpus(slices: Int): (String, Long) = {
      val d = Files.createTempDirectory(s"graft-stb-spec$slices").toString
      StreamThroughputBench.writeSlices(spark, d, users, slices,
        rowsPerSlice, stepMs = 50L)
      (d, slices.toLong * rowsPerSlice)
    }
    val (dShort, nShort) = corpus(3)
    val (dLong, nLong) = corpus(9)
    // RocksDB SST/changelog overhead varies with compaction timing —
    // under full-suite GC pressure a single run's peak bytes has been
    // observed past any fixed small bound while rows stayed exactly =
    // keys. Run each length twice (fresh checkpoints) and compare the
    // MINIMUM peaks: compaction noise is one-sided (only inflates), so
    // the min is the stable signal; a real leak inflates EVERY run.
    val shortRuns = Seq.fill(2)(StreamThroughputBench.run(spark, dShort, nShort))
    val longRuns = Seq.fill(2)(StreamThroughputBench.run(spark, dLong, nLong))
    // state rows = keys with live state; bounded by the key count for
    // both lengths (a probe-buffer leak would not add rows — it grows
    // bytes — so both dimensions are pinned)
    shortRuns.foreach(r => assert(r.peakStateRows > 0 && r.peakStateRows <= users))
    longRuns.foreach(r => assert(r.peakStateRows <= users))
    // 3x the stream length, same keys/rate/horizon: peak state BYTES
    // must not grow with length. A leak of the 3x-longer buffered
    // stream would show ~3x bytes on every run; the min-vs-min bound
    // sits at 2.5x (measured clean growth 1.37x)
    val shortB = shortRuns.map(_.peakStateBytes).min
    val longB = longRuns.map(_.peakStateBytes).min
    assert(longB * 2L < 5L * math.max(shortB, 1L),
      s"state grew with stream length: short=${shortB}B long=${longB}B")
    // ... and a generous ABSOLUTE ceiling on every individual run so
    // an intermittent leak that only inflates under unlucky compaction
    // timing can't hide inside the min-of-two: 50 keys × one horizon
    // of buffered probes is well under 1 MiB of honest state; 16 MiB
    // is compaction-noise headroom, not leak headroom (the 3x stream
    // buffers ~27 MB of raw rows if leaked).
    (shortRuns ++ longRuns).foreach(r =>
      assert(r.peakStateBytes < 16L * 1024 * 1024,
        s"single-run peak state ${r.peakStateBytes}B past the absolute ceiling"))
  }
}
