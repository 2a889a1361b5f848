package graft

import graft.streaming.StreamingAsOf
import graft.streaming.StreamingAsOf.{Enriched, Tick}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming backward as-of enrichment vs the NATIVE batch as-of join
  * on the same data: for in-order arrivals the two must agree exactly.
  */
class StreamingAsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    Tick(1, 1000, "signup", 0.0),
    Tick(1, 2000, "purchase", 5.0),   // -> signup 1000
    Tick(1, 3000, "signup", 0.0),
    Tick(1, 3000, "purchase", 6.0),   // tie: sees the 3000 signup (<=)
    Tick(1, 9000, "purchase", 7.0),   // -> signup 3000
    Tick(2, 500, "purchase", 1.0),    // no signup yet -> dropped (inner)
    Tick(2, 600, "signup", 0.0),
    Tick(2, 700, "purchase", 2.0),    // -> signup 600
    Tick(3, 100, "signup", 0.0))      // signup with no purchase

  test("memory-stream enrichment matches the native batch as-of join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Tick]
    val q = StreamingAsOf.asOfEnrich(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_asof")
      .start()
    try {
      // two batches split MID-KEY: user 1's last purchase arrives after
      // its state was persisted — exercises the cross-batch state path
      input.addData(rows.take(4))
      q.processAllAvailable()
      input.addData(rows.drop(4))
      q.processAllAvailable()
      // a LATE probe behind user 1's held reference (ts 3000) must be
      // dropped, not enriched with a future signup
      input.addData(Seq(Tick(1, 1500, "purchase", 99.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("graft_stream_asof").as[Enriched]
      .collect().map(e => (e.user_id, e.purchase_ts, e.signup_ts, e.value))
      .sortBy(t => (t._1, t._2)).toSeq

    // native batch as-of over the same rows
    val df = rows.toDF()
    val probes = df.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms"), col("value"))
    val refs = df.filter(col("event_type") === "signup")
      .select(col("user_id").as("r_user"), col("ts_ms").as("r_ts"))
    val batch = graft.plans.AsOf.join(
        probes, refs,
        leftOn = Seq("user_id"), rightOn = Seq("r_user"),
        leftTimeCol = "ts_ms", rightTimeCol = "r_ts")
      .select(col("user_id"), col("ts_ms"), col("r_ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

    assert(got == batch)
    assert(got == Seq(
      (1L, 2000L, 1000L, 5.0), (1L, 3000L, 3000L, 6.0),
      (1L, 9000L, 3000L, 7.0), (2L, 700L, 600L, 2.0)))
  }

  test("watermarked variant enriches late probes within the horizon exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val late = Tick(1, 1500, "purchase", 99.0)
    val input = MemoryStream[Tick]
    val q = StreamingAsOf.asOfEnrichWatermarked(input.toDS(), "8 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_asof_wm")
      .start()
    try {
      input.addData(rows.take(4))
      q.processAllAvailable()
      input.addData(rows.drop(4))
      q.processAllAvailable()
      // the late probe arrives BEHIND user 1's held reference (3000)
      // but within the 8 s watermark (wm = 9000 - 8000 = 1000): the
      // drop variant discards it; here it must match signup 1000
      input.addData(Seq(late))
      q.processAllAvailable()
      // advance the watermark past every buffered probe, then trigger
      // one more batch so the event-time timeouts fire and drain state
      input.addData(Seq(Tick(9, 100000L, "signup", 0.0)))
      q.processAllAvailable()
      input.addData(Seq(Tick(9, 100001L, "signup", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("graft_stream_asof_wm").as[Enriched]
      .collect().map(e => (e.user_id, e.purchase_ts, e.signup_ts, e.value))
      .sortBy(t => (t._1, t._2, t._4)).toSeq

    // native batch as-of over the same rows INCLUDING the late probe
    val df = (rows :+ late).toDF()
    val probes = df.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms"), col("value"))
    val refs = df.filter(col("event_type") === "signup")
      .select(col("user_id").as("r_user"), col("ts_ms").as("r_ts"))
    val batch = graft.plans.AsOf.join(
        probes, refs,
        leftOn = Seq("user_id"), rightOn = Seq("r_user"),
        leftTimeCol = "ts_ms", rightTimeCol = "r_ts")
      .select(col("user_id"), col("ts_ms"), col("r_ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._4)).toSeq

    assert(got == batch)
    assert(got.contains((1L, 1500L, 1000L, 99.0)),
      "late probe within the watermark must be enriched with its true backward match")
  }

  test("late reference within the horizon retro-corrects a buffered probe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Tick]
    val q = StreamingAsOf.asOfEnrichWatermarked(input.toDS(), "8 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_asof_lateref")
      .start()
    try {
      // probe at 5000 arrives FIRST; its true match (signup 4000)
      // arrives a batch later, out of order but within the watermark —
      // the probe is still buffered (wm has not passed 5000), so the
      // late reference must win over the earlier signup 1000
      input.addData(Seq(Tick(1, 1000, "signup", 0.0),
                        Tick(1, 5000, "purchase", 42.0)))
      q.processAllAvailable()
      input.addData(Seq(Tick(1, 4000, "signup", 0.0)))
      q.processAllAvailable()
      // advance the watermark past the probe, then fire the timeout
      input.addData(Seq(Tick(9, 100000L, "signup", 0.0)))
      q.processAllAvailable()
      input.addData(Seq(Tick(9, 100001L, "signup", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("graft_stream_asof_lateref").as[Enriched]
      .collect().map(e => (e.user_id, e.purchase_ts, e.signup_ts, e.value)).toSeq
    assert(got == Seq((1L, 5000L, 4000L, 42.0)),
      s"buffered probe must match the late-arriving nearer reference, got $got")
  }

  test("watermarked state survives checkpoint restart; buffered probes emit once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckp = java.nio.file.Files.createTempDirectory("graft-asof-wm-ckp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-asof-wm-out").toString + "/enriched"
    val late = Tick(1, 1500, "purchase", 99.0)
    val input = MemoryStream[Tick]
    // parquet sink: fault-tolerant (exactly-once via the file-sink log),
    // so the SAME checkpoint can resume — memory sink refuses recovery
    def start() =
      StreamingAsOf.asOfEnrichWatermarked(input.toDS(), "8 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckp)
        .format("parquet").option("path", out)
        .start()
    // run 1: everything buffered except what matures at wm=1000
    val q1 = start()
    try {
      input.addData(rows.take(4)); q1.processAllAvailable()
      input.addData(rows.drop(4)); q1.processAllAvailable()
      input.addData(Seq(late));    q1.processAllAvailable()
    } finally q1.stop()
    // run 2: restart from the checkpoint — the late probe and the rest
    // of the buffer must be restored from the state store, then drain
    // as the watermark passes them
    val q2 = start()
    try {
      input.addData(Seq(Tick(9, 100000L, "signup", 0.0))); q2.processAllAvailable()
      input.addData(Seq(Tick(9, 100001L, "signup", 0.0))); q2.processAllAvailable()
    } finally q2.stop()
    val got = spark.read.parquet(out).as[Enriched].collect()
      .map(e => (e.user_id, e.purchase_ts, e.signup_ts, e.value))
      .sortBy(t => (t._1, t._2, t._4)).toSeq
    assert(got == got.distinct, s"duplicate emissions across restart: $got")
    assert(got == Seq(
      (1L, 1500L, 1000L, 99.0), (1L, 2000L, 1000L, 5.0),
      (1L, 3000L, 3000L, 6.0), (1L, 9000L, 3000L, 7.0),
      (2L, 700L, 600L, 2.0)))
  }
}
