package graft

import java.nio.file.Files
import graft.streaming.{StreamScale, TwsWarmStart}
import graft.streaming.TwsWarmStart.{Ev, Running}
import org.scalatest.funsuite.AnyFunSuite

/** The warm-start contract: batch-prefix fold + streamed suffix must
  * equal streaming the WHOLE log cold, row for row — that equivalence
  * is the only reason to trust a snapshot-bootstrapped stream.
  */
class TwsWarmStartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val B = 1700000000000L

  private def asTuples(rs: Array[Running]) =
    rs.map(r => (r.user_id, r.ts_ms, r.n, r.total)).toSet

  test("snapshot + suffix == cold full-log replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prefix = Seq(
      Ev(1, B + 1000, 10), Ev(1, B + 2000, 20), Ev(2, B + 1500, 5),
      Ev(2, B + 2500, 7), Ev(3, B + 1800, 100), Ev(1, B + 3000, 30))
    val suffix = Seq(
      Ev(1, B + 4000, 40), Ev(2, B + 4500, 9), Ev(3, B + 5000, 200),
      Ev(4, B + 5500, 1)) // user 4 has NO snapshot entry: cold start
    val prevConf = StreamScale.enableRocksDb(spark)
    try {
      // WARM: batch fold of the prefix becomes the initial state
      val snap = TwsWarmStart.snapshotOf(prefix.toDS())
      val warmIn = MemoryStream[Ev]
      val warmQ = TwsWarmStart.run(warmIn.toDS(), snap)
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_warm")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-warm-ckpt").toString)
        .start()
      warmIn.addData(suffix: _*)
      warmQ.processAllAvailable()
      warmQ.stop()
      val warm = spark.table("graft_warm").as[Running].collect()

      // COLD: the whole log through the stream (empty initial state),
      // prefix and suffix in separate microbatches
      val coldIn = MemoryStream[Ev]
      val coldQ = TwsWarmStart.run(coldIn.toDS(),
          spark.emptyDataset[TwsWarmStart.Snapshot])
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_cold")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-cold-ckpt").toString)
        .start()
      coldIn.addData(prefix: _*)
      coldQ.processAllAvailable()
      coldIn.addData(suffix: _*)
      coldQ.processAllAvailable()
      coldQ.stop()
      val cold = spark.table("graft_cold").as[Running].collect()

      val suffixTs = suffix.map(_.ts_ms).toSet
      assert(warm.length == suffix.length,
        s"warm run must emit exactly the suffix rows, got ${warm.toSeq}")
      assert(asTuples(warm) ==
        asTuples(cold.filter(r => suffixTs.contains(r.ts_ms))),
        s"warm ${warm.toSeq} != cold-suffix ${cold.toSeq}")
      // the totals really carry the prefix history
      assert(asTuples(warm).contains((1L, B + 4000, 4L, 100L)))
      assert(asTuples(warm).contains((4L, B + 5500, 1L, 1L)))
    } finally StreamScale.restore(spark, prevConf)
  }
}
