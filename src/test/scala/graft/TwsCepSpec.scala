package graft

import java.nio.file.Files
import graft.streaming.{StreamScale, TwsCep}
import graft.streaming.TwsCep.{Ev, Match}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CEP on transformWithState: sliced AND out-of-order
  * delivery must reproduce the batch fold exactly (the ListState
  * buffer + watermark drain is what makes that true), and the buffer
  * must not outlive its drain.
  */
class TwsCepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val M = 60 * 1000L // one minute
  // real epoch base: an event AT the initial watermark (epoch 0) would
  // be dropped as late before the stateful operator ever sees it
  private val B = 1700000000000L

  private def asTuples(ms: Array[Match]) =
    ms.map(m => (m.user_id, m.start_ts_ms, m.end_ts_ms, m.n_steps)).toSet

  test("out-of-order sliced stream reproduces the batch pattern fold") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-cep-src").toString
    val ckpt = Files.createTempDirectory("graft-cep-ckpt").toString
    // user 1: s x s p (match: 4 steps, the second s is absorbed) then
    //         s p (second match); user 2: x p s x (no match — the p
    // precedes its s); user 3: s x x (pending forever, no match)
    val all = Seq(
      Ev(1, B + 0 * M, 1, "s"), Ev(1, B + 1 * M, 2, "x"), Ev(1, B + 2 * M, 3, "s"),
      Ev(1, B + 3 * M, 4, "p"), Ev(1, B + 4 * M, 5, "s"), Ev(1, B + 5 * M, 6, "p"),
      Ev(2, B + 0 * M, 7, "x"), Ev(2, B + 1 * M, 8, "p"), Ev(2, B + 2 * M, 9, "s"),
      Ev(2, B + 3 * M, 10, "x"),
      Ev(3, B + 1 * M, 11, "s"), Ev(3, B + 2 * M, 12, "x"), Ev(3, B + 3 * M, 13, "x"))
    // deliberately OUT-OF-ORDER slices (every ts within the 10-minute
    // lateness of the running max, so nothing is watermark-late); the
    // final slice is the far-future watermark driver that forces the
    // last drain
    val slices = Seq(
      Seq(all(3), all(0), all(7), all(11)),
      Seq(all(2), all(1), all(8), all(6), all(12)),
      Seq(all(5), all(4), all(9), all(10)),
      Seq(Ev(9, B + 100 * M, 99, "x")))
    slices.foreach { s =>
      s.toDF().coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(20)
    }
    val prev = StreamScale.enableRocksDb(spark)
    try {
      val stream = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src).as[Ev]
      val q = TwsCep.detect(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_cep")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val got = spark.table("graft_cep").as[Match].collect()
      val want = TwsCep.batchOracle(all)
      assert(asTuples(got) == asTuples(want.toArray),
        s"streaming ${got.toSeq} != batch ${want}")
      // the fold really found the two user-1 matches with their spans
      assert(asTuples(got).contains((1L, B, B + 3 * M, 4L)))
      assert(asTuples(got).contains((1L, B + 4 * M, B + 5 * M, 2L)))
      assert(got.count(_.user_id == 2) == 0 && got.count(_.user_id == 3) == 0)
    } finally StreamScale.restore(spark, prev)
  }

  test("drained buffers are freed; only machine registers persist") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-cep-ckpt2").toString
    val prev = StreamScale.enableRocksDb(spark)
    val input = MemoryStream[Ev]
    val q = TwsCep.detect(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_cep_state")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // 20 buffered events for user 1 ending in a match; user 3 left
      // with a pending signup (ValueState survives, buffer must not)
      val evs = (0 until 18).map(i => Ev(1, B + i * M, i + 1, "x")) ++
        Seq(Ev(1, B + 18 * M, 19, "s"), Ev(1, B + 19 * M, 20, "p"),
            Ev(3, B + 1 * M, 21, "s"))
      input.addData(evs: _*)
      q.processAllAvailable()
      // far-future driver advances the watermark (takes effect next
      // batch), then its own batch lets the timers fire and drain
      input.addData(Ev(9, B + 1000 * M, 99, "x"))
      q.processAllAvailable()
      input.addData(Ev(9, B + 1001 * M, 100, "x"))
      q.processAllAvailable()
      val got = spark.table("graft_cep_state").as[Match].collect()
      assert(asTuples(got) == Set((1L, B + 18 * M, B + 19 * M, 2L)))
      def stateRows: Long = q.recentProgress
        .flatMap(p => Option(p.stateOperators)).flatten
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      // all 21 buffered events drained; what remains is O(keys):
      // user 3's pending register + user 9's undrained tail buffer
      assert(stateRows >= 0, "no state metrics reported")
      assert(stateRows <= 4,
        s"drained ListState buffers not freed: $stateRows rows")
    } finally { q.stop(); StreamScale.restore(spark, prev) }
  }
}
