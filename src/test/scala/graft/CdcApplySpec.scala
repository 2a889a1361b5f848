package graft

import java.nio.file.Files
import graft.streaming.CdcApply
import graft.streaming.CdcApply.{Change, RowState}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CDC apply: the microbatched fold over a sliced change log
  * must converge to the same snapshot as a serial replay of the whole
  * log (any slicing), redeliveries must be idempotent, and state must
  * stay bounded by the live keyspace.
  */
class CdcApplySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def changeLog: Seq[Change] = {
    val inserts = (0L until 50L).map(k => Change("I", k, k * 10.0, k * 100 + 1))
    val updates = (0L until 50L).filter(_ % 2 == 0)
      .map(k => Change("U", k, k * 10.0 + 5, k * 100 + 2))
    val deletes = (0L until 50L).filter(_ % 5 == 0)
      .map(k => Change("D", k, 0.0, k * 100 + 3))
    val reinserts = (0L until 50L).filter(_ % 10 == 0)
      .map(k => Change("I", k, 7777.0, k * 100 + 4))
    // redeliveries: the first insert of every 4th key arrives AGAIN
    // late (at-least-once source) — must be dropped by the seq gate
    val redelivered = (0L until 50L).filter(_ % 4 == 0)
      .map(k => Change("I", k, k * 10.0, k * 100 + 1))
    inserts ++ updates ++ deletes ++ reinserts ++ redelivered
  }

  test("sliced stream == serial replay; redelivery idempotent; state bounded") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-cdc-src").toString
    // five sequential slices -> five microbatches (maxFilesPerTrigger=1)
    val log = changeLog
    val slices = log.grouped((log.size + 4) / 5).toSeq
    slices.foreach { s =>
      s.toDF().coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(20) // distinct mtimes => deterministic file order
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src).as[Change]
    val q = CdcApply.applyStream(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_cdc")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val emitted = spark.table("graft_cdc")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    // final state per key = the emission with the highest applied seq
    val finalByKey = emitted.groupBy(_._1).map { case (k, rows) =>
      k -> rows.maxBy(_._3)
    }
    val oracle: Map[Long, RowState] = CdcApply.replaySerial(log)
    assert(finalByKey.keySet == oracle.keySet)
    oracle.foreach { case (k, st) =>
      val (_, v, seq, del) = finalByKey(k)
      assert(seq == st.seq && del == st.deleted &&
             (st.deleted || v == st.value),
        s"key $k diverged: got ($v,$seq,$del) want $st")
    }
    // spot-check semantics: deleted-not-reinserted keys are tombstones,
    // reinserted keys carry the reinsert value, redelivered inserts
    // never clobber a later update
    assert(finalByKey(5L)._4, "key 5 must be a tombstone")
    assert(finalByKey(10L)._2 == 7777.0 && !finalByKey(10L)._4)
    assert(finalByKey(4L)._2 == 45.0, "redelivered insert clobbered an update")
    // state bounded by the keyspace: one state row per key ever seen
    // (tombstones still inside their grace period)
    val st = q.recentProgress.flatMap(p => Option(p.stateOperators))
      .flatten.lastOption
    st.foreach(s => assert(s.numRowsTotal <= 50,
      s"state rows ${s.numRowsTotal} exceed the keyspace"))
  }

  test("the shared fold is idempotent under whole-log redelivery") {
    val log = changeLog
    val once = CdcApply.replaySerial(log)
    val twice = CdcApply.replaySerial(log ++ log)
    assert(once == twice, "replaying the full log twice must be a no-op")
  }
}
