package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.Streams
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming parity: AvailableNow drain-and-stop dump,
  * watermarked window aggregations, streaming dedup — all driven by
  * file sources so no broker is needed.
  */
class StreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def eventsFixture(dir: String): Unit = {
    val rows = (0 until 200).map { i =>
      (i.toLong, new Timestamp(1700000000000L + i * 60000L), (i % 7).toLong,
       if (i % 3 == 0) "click" else "view", i * 1.5)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(4).write.mode("overwrite").parquet(dir)
  }

  test("streamingDump drains all files exactly once and stops (AvailableNow)") {
    val src = Files.createTempDirectory("graft-ss-src").toString
    val dst = Files.createTempDirectory("graft-ss-dst").toString + "/out"
    val ckp = Files.createTempDirectory("graft-ss-ckp").toString
    eventsFixture(src)
    val schema = spark.read.parquet(src).schema
    val q = Streams.streamingDump(spark, schema, src, dst, ckp)
    q.awaitTermination(120000)
    assert(spark.read.parquet(dst).count() == 200)
    // restart with same checkpoint: nothing new → no duplicates (exactly-once)
    val q2 = Streams.streamingDump(spark, schema, src, dst, ckp)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(dst).count() == 200)
  }

  test("windowed counts with watermark over a file stream") {
    val src = Files.createTempDirectory("graft-ss-src2").toString
    eventsFixture(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = Streams.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_windowed")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("graft_windowed")
    // 200 events, 1/minute → 4 hour-windows × ≤2 types; counts sum to 200
    assert(got.agg(org.apache.spark.sql.functions.sum($"n")).head.getLong(0) == 200)
    assert(got.select($"window_start").distinct().count() == 4)
  }

  test("session windows close after the 30-minute gap") {
    val src = Files.createTempDirectory("graft-ss-src3").toString
    // user 1: two bursts separated by 2 hours → 2 sessions
    val rows = Seq(
      (1L, new Timestamp(1700000000000L), 1L, "click", 1.0),
      (2L, new Timestamp(1700000060000L), 1L, "click", 1.0),
      (3L, new Timestamp(1700007200000L), 1L, "click", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    val q = Streams.sessionCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_sessions")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("graft_sessions").collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 2L))
  }

  test("foreachBatch streams into the reference dump-catalog layout") {
    import graft.pipeline.DumpCatalog
    val src = Files.createTempDirectory("graft-fb-src").toString
    val dst = Files.createTempDirectory("graft-fb-dst").toString
    val ckp = Files.createTempDirectory("graft-fb-ckp").toString
    val rows = (0 until 300).map { i =>
      (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"), i % 3, (i / 3).toLong)
    }
    rows.toDF("key", "value", "partition", "offset")
      .repartition(4).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = Streams.streamingDumpToCatalog(
      spark, schema, src, dst, "sd01", maxPerFile = 50, ckp)
    q.awaitTermination(120000)
    val cat = new DumpCatalog(dst, spark.sparkContext.hadoopConfiguration)
    val dumps = cat.dumpIds().sorted
    assert(dumps.nonEmpty && dumps.forall(_.startsWith("sd01-b")))
    // every batch-dump obeys the naming + order contract and the
    // union of all dumps is the full corpus, exactly once
    val total = dumps.map { id =>
      val files = cat.dumpFiles(id)
      assert(files == files.sorted)
      assert(files.forall(_.matches(s"$id-\\d{15}\\.parquet")))
      spark.read.parquet(cat.dumpPath(id)).count()
    }.sum
    assert(total == 300)
  }

  test("streaming dedup drops in-watermark duplicates") {
    val src = Files.createTempDirectory("graft-ss-src4").toString
    eventsFixture(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    val q = Streams.dedupStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // 7 users × 2 event types
    assert(spark.table("graft_dedup").count() == 14)
  }

  test("dropDuplicatesWithinWatermark dedups with bounded state") {
    val src = Files.createTempDirectory("graft-ss-src5").toString
    // duplicate event_ids within the watermark window
    val rows = Seq(
      (1L, new Timestamp(1700000000000L), 1L, "click", 1.0),
      (1L, new Timestamp(1700000030000L), 1L, "click", 1.0), // dup id
      (2L, new Timestamp(1700000060000L), 2L, "view", 2.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    val q = Streams.dedupStreamBounded(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup_wm")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("graft_dedup_wm").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("stream-static enrichment joins each microbatch against the dimension") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-ss-dim").toString
    val rows = Seq(
      (1L, new Timestamp(1700000000000L), 10.0),
      (2L, new Timestamp(1700000001000L), 20.0),
      (9L, new Timestamp(1700000002000L), 30.0)) // no dimension row
    rows.toDF("user_id", "ts", "value").write.mode("overwrite").parquet(src)
    val dim = Seq((1L, "gold"), (2L, "trial"), (3L, "gold"))
      .toDF("user_id", "segment")
    val stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    val q = Streams.enrichAgainstDimension(stream, dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_enrich")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("graft_enrich")
      .select("user_id", "segment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // left outer: the unmatched event flows with the sentinel segment
    assert(got == Map(1L -> "gold", 2L -> "trial", 9L -> "unknown"))
  }

  test("stream-stream interval join attributes purchases to signups") {
    val pSrc = Files.createTempDirectory("graft-ssj-p").toString
    val sSrc = Files.createTempDirectory("graft-ssj-s").toString
    val t0 = 1700000000000L
    def ts(min: Long) = new Timestamp(t0 + min * 60000L)
    // signups: user 1 at t+0, user 2 at t+5
    Seq((10L, 1L, ts(0)), (11L, 2L, ts(5)))
      .toDF("s_id", "s_user", "s_ts").write.mode("overwrite").parquet(sSrc)
    // purchases: u1 in-horizon (t+30), u1 out-of-horizon (t+90),
    // u2 before signup (t+2), u3 no signup
    Seq((100L, 1L, ts(30)), (101L, 1L, ts(90)), (102L, 2L, ts(2)),
        (103L, 3L, ts(40)))
      .toDF("p_id", "user_id", "ts").write.mode("overwrite").parquet(pSrc)
    val p = spark.readStream.schema(spark.read.parquet(pSrc).schema).parquet(pSrc)
    val sgn = spark.readStream.schema(spark.read.parquet(sSrc).schema).parquet(sSrc)
    val q = Streams.purchaseAttribution(p, sgn)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_ssj")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("graft_ssj")
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("s_id"))).sorted
    assert(got.toSeq == Seq((100L, 10L)))
  }
}

/** Left-outer stream-stream join: converted signups match, and the
  * null-side row for an unconverted signup is emitted ONLY once the
  * watermark proves no in-horizon purchase can still arrive.
  */
class StreamOuterJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unconverted signups surface with a null purchase side after the watermark") {
    val pSrc = Files.createTempDirectory("graft-soj-p").toString
    val sSrc = Files.createTempDirectory("graft-soj-s").toString
    val t0 = 1700000000000L
    def ts(min: Long) = new Timestamp(t0 + min * 60000L)
    // signups: user 1 converts, user 2 never does, user 4 converts late
    // (out of horizon => still unconverted)
    Seq((10L, 1L, ts(0)), (11L, 2L, ts(5)), (12L, 4L, ts(6)))
      .toDF("s_id", "s_user", "s_ts").coalesce(1)
      .write.mode("append").parquet(sSrc)
    Thread.sleep(50)
    // far-future signup: the OUTER flush waits on the GLOBAL watermark
    // (min across both streams), so the signup side must advance too;
    // s99 itself stays unflushed (its own horizon is still open) and
    // is excluded from the assertion
    Seq((99L, 9L, ts(600)))
      .toDF("s_id", "s_user", "s_ts").coalesce(1)
      .write.mode("append").parquet(sSrc)
    // slice 1: the in-horizon purchase; slice 2: far-future events that
    // push BOTH watermarks past every signup's s_ts + horizon + delay,
    // forcing the outer join to flush its null-side rows
    Seq((100L, 1L, ts(30)))
      .toDF("p_id", "user_id", "ts").coalesce(1).write.mode("append").parquet(pSrc)
    Thread.sleep(50)
    Seq((101L, 4L, ts(90)), (999L, 9L, ts(600)))
      .toDF("p_id", "user_id", "ts").coalesce(1).write.mode("append").parquet(pSrc)
    val p = spark.readStream.schema(spark.read.parquet(pSrc).schema)
      .option("maxFilesPerTrigger", "1").parquet(pSrc)
    val sgn = spark.readStream.schema(spark.read.parquet(sSrc).schema)
      .option("maxFilesPerTrigger", "1").parquet(sSrc)
    val q = Streams.signupOutcomes(p, sgn)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_soj")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("graft_soj").collect()
      .map(r => (r.getAs[Long]("s_id"),
                 Option(r.getAs[java.lang.Long]("p_id")).map(Long2long)))
      .filter(_._1 < 90)
      .sortBy(_._1)
    // s10 matched p100; s11 unconverted (no purchase at all); s12
    // unconverted (its only purchase is outside the horizon)
    assert(got.toSeq == Seq((10L, Some(100L)), (11L, None), (12L, None)),
      s"outer join emitted $got")
  }

  test("full-outer ledger also surfaces orphan purchases with a null signup side") {
    val pSrc = Files.createTempDirectory("graft-led-p").toString
    val sSrc = Files.createTempDirectory("graft-led-s").toString
    val t0 = 1700000000000L
    def ts(min: Long) = new Timestamp(t0 + min * 60000L)
    // signups: user 1 converts, user 2 never does
    Seq((10L, 1L, ts(0)), (11L, 2L, ts(5)))
      .toDF("s_id", "s_user", "s_ts").coalesce(1)
      .write.mode("append").parquet(sSrc)
    Thread.sleep(50)
    // far-future signup advances the signup-side watermark (the outer
    // flush waits on the GLOBAL min watermark); excluded from asserts
    Seq((99L, 9L, ts(600)))
      .toDF("s_id", "s_user", "s_ts").coalesce(1)
      .write.mode("append").parquet(sSrc)
    // slice 1: the matched purchase + an ORPHAN purchase (user 7 never
    // signed up); slice 2: far-future events flush both outer sides
    Seq((100L, 1L, ts(30)), (102L, 7L, ts(31)))
      .toDF("p_id", "user_id", "ts").coalesce(1).write.mode("append").parquet(pSrc)
    Thread.sleep(50)
    Seq((999L, 9L, ts(600)))
      .toDF("p_id", "user_id", "ts").coalesce(1).write.mode("append").parquet(pSrc)
    val p = spark.readStream.schema(spark.read.parquet(pSrc).schema)
      .option("maxFilesPerTrigger", "1").parquet(pSrc)
    val sgn = spark.readStream.schema(spark.read.parquet(sSrc).schema)
      .option("maxFilesPerTrigger", "1").parquet(sSrc)
    val q = Streams.attributionLedger(p, sgn)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_ledger")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("graft_ledger").collect()
      .map(r => (Option(r.getAs[java.lang.Long]("s_id")).map(Long2long),
                 Option(r.getAs[java.lang.Long]("p_id")).map(Long2long)))
      .filter { case (s, pp) => // drop the far-future watermark drivers
        s.forall(_ < 90) && pp.forall(_ < 900) }
      .sortBy { case (s, pp) => (s.getOrElse(Long.MaxValue), pp.getOrElse(0L)) }
    // matched (s10, p100); unconverted signup (s11, null);
    // orphan purchase (null, p102) — the row only FULL OUTER emits
    assert(got.toSeq == Seq(
      (Some(10L), Some(100L)), (Some(11L), None), (None, Some(102L))),
      s"full-outer ledger emitted $got")
  }
}
