package graft

import java.nio.file.Files
import graft.streaming.{StreamScale, TwsQuota}
import graft.streaming.TwsQuota.{Decision, Event}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState quota enforcement: sliced microbatches must
  * reproduce the batch window oracle exactly, excess events must be
  * tagged (not dropped — row-count conservation), and the per-window
  * MapState entries must be FREED by their event-time timers once the
  * watermark passes the window's admission horizon.
  */
class TwsQuotaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val W = TwsQuota.windowMs

  private def asTuples(ds: Array[Decision]) =
    ds.map(d => (d.user_id, d.ts_ms, d.window_start_ms, d.admitted,
                 d.seq_in_window)).toSet

  test("sliced stream reproduces the batch oracle; rejects are tagged, not dropped") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-tws-src").toString
    val ckpt = Files.createTempDirectory("graft-tws-ckpt").toString
    // user 1: 5 events in window 0 (3 admit, 2 reject) + 2 in window 1;
    // user 2: 2 events in window 0 (both admit)
    val all = Seq(
      Event(1, 1000L, 1.0), Event(1, 2000L, 2.0), Event(1, 3000L, 3.0),
      Event(1, 4000L, 4.0), Event(1, 5000L, 5.0),
      Event(2, 500L, 7.0), Event(2, 1500L, 8.0),
      Event(1, W + 1000L, 9.0), Event(1, W + 2000L, 10.0))
    // slices preserve per-key event-time order (the CdcApply ordering
    // discipline: determinism is a property of the data's order)
    val slices = Seq(all.take(4), all.slice(4, 7), all.drop(7))
    slices.foreach { s =>
      s.toDF().coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(20)
    }
    val prev = StreamScale.enableRocksDb(spark)
    try {
      val stream = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src).as[Event]
      val q = TwsQuota.admit(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_tws")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val got = spark.table("graft_tws").as[Decision].collect()
      assert(got.length == all.length, "decision per event: nothing dropped")
      assert(asTuples(got) == TwsQuota.batchOracle(all).toSet.map(asOne))
      // quota arithmetic: exactly maxPerWindow admits in the hot window
      val hot = got.filter(d => d.user_id == 1 && d.window_start_ms == 0L)
      assert(hot.count(_.admitted) == TwsQuota.maxPerWindow &&
             hot.count(!_.admitted) == 2)
    } finally StreamScale.restore(spark, prev)
  }

  private def asOne(d: Decision) =
    (d.user_id, d.ts_ms, d.window_start_ms, d.admitted, d.seq_in_window)

  test("event-time timers free expired windows: state is O(live windows)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-tws-ckpt2").toString
    val prev = StreamScale.enableRocksDb(spark)
    val input = MemoryStream[Event]
    val q = TwsQuota.admit(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_tws_state")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // batch 1: two windows' worth of state for user 1
      input.addData(Event(1, 1000L, 1.0), Event(1, 2000L, 2.0),
                    Event(1, W + 500L, 3.0))
      q.processAllAvailable()
      // batch 2: far-future event advances the watermark way past both
      // windows' horizons (watermark takes effect NEXT batch)
      input.addData(Event(1, 20 * W, 4.0))
      q.processAllAvailable()
      // batch 3: timers fire under the advanced watermark → windows 0,1 freed
      input.addData(Event(1, 20 * W + 1000L, 5.0))
      q.processAllAvailable()
      def stateRows: Long = q.recentProgress
        .flatMap(p => Option(p.stateOperators)).flatten
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      val afterCleanup = stateRows
      // only window 20 survives for user 1 (one MapState entry); the
      // freed windows must not linger
      assert(afterCleanup >= 0, "no state metrics reported")
      assert(afterCleanup <= 2,
        s"expired windows not freed: $afterCleanup state rows")
      // the decisions themselves are still exact
      val got = spark.table("graft_tws_state").as[Decision].collect()
      assert(got.count(_.admitted) == 5 && got.length == 5)
    } finally { q.stop(); StreamScale.restore(spark, prev) }
  }
}
