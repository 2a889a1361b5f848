package graft

import java.nio.file.Files
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.Event
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState sessionizer over a real file stream. */
class StatefulSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("closed sessions carry count and sum; open session stays in state") {
    val src = Files.createTempDirectory("graft-fgs").toString
    val gap = StatefulSessions.gapMs
    // user 1: 3-event session, gap, 2-event session, gap, 1 open event
    // user 2: single session, never closed
    val rows = Seq(
      Event(1, 1000L, 1.0), Event(1, 2000L, 2.0), Event(1, 3000L, 3.0),
      Event(1, 3000L + gap, 10.0), Event(1, 4000L + gap, 20.0),
      Event(1, 5000L + 2 * gap, 99.0),
      Event(2, 500L, 7.0))
    rows.toDF().write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(rows.toDF().schema).parquet(src).as[Event]
    val q = StatefulSessions.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_fgs")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val closed = spark.table("graft_fgs")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .sortBy(x => (x._1, x._2))
    // two closed sessions for user 1; the open tail and user 2 stay in state
    assert(closed.toSeq == Seq((1L, 2L, 30.0), (1L, 3L, 6.0)).sortBy(x => (x._1, x._2)))
  }

  test("event-time timeout flushes open sessions when the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gap = StatefulSessions.gapMs
    val input = MemoryStream[Event]
    val q = StatefulSessions.sessionizeWithTimeout(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_fgs_timeout")
      .start()
    try {
      // batch 1: user 1 has a 2-event session, user 2 one event
      input.addData(Event(1, 1000L, 1.0), Event(1, 2000L, 2.0),
                    Event(2, 500L, 7.0))
      q.processAllAvailable()
      assert(spark.table("graft_fgs_timeout").count() == 0) // all open
      // batch 2: an event far in the future advances the watermark
      // (10 min delay) past both open sessions' lastMs + gap → flush
      input.addData(Event(9, 1000L + 10 * gap, 0.0))
      q.processAllAvailable()
      // one more batch so the new watermark takes effect on timers;
      // it also gap-closes user 9's own first session
      input.addData(Event(9, 1000L + 11 * gap, 0.0))
      q.processAllAvailable()
      val closed = spark.table("graft_fgs_timeout")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
                   r.getAs[Double]("sum_value")))
        .sortBy(_._1)
      assert(closed.toSeq ==
        Seq((1L, 2L, 3.0), (2L, 1L, 7.0), (9L, 1L, 0.0)))
    } finally q.stop()
  }
}
