package graft

import java.nio.file.Files
import graft.streaming.{StreamScale, StreamingNearDup}
import graft.streaming.StreamingNearDup.{BandHit, Doc}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash-LSH near-dup filtering: sliced AND out-of-order
  * delivery must reproduce the batch band-claim fold exactly (the
  * ListState buffer + watermark drain is what makes that true), the
  * banding must be the SAME index d3/d9 build in batch (shared
  * expression constants), and exact re-crawls must be flagged against
  * their original.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val M = 60 * 1000L
  // real epoch base: a doc AT the initial watermark would be dropped
  // as late before the stateful operator ever sees it
  private val B = 1700000000000L

  test("out-of-order sliced stream reproduces the batch band-claim fold") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-sndup-src").toString
    val ckpt = Files.createTempDirectory("graft-sndup-ckpt").toString
    val all = Seq(
      Doc(1, B + 0 * M, "alpha beta gamma delta epsilon zeta"),
      // exact re-crawl of doc 1: every band collides -> dup_of = 1
      Doc(2, B + 1 * M, "alpha beta gamma delta epsilon zeta"),
      Doc(3, B + 1 * M, "one two three four five six seven"),
      // near-variant of doc 3 (last word changed): band overlap is
      // whatever the real minhash says — the oracle computes the SAME
      // bands, so equality is asserted either way
      Doc(4, B + 2 * M, "one two three four five six eight"),
      Doc(5, B + 3 * M, "totally different content with no overlap at all"))
    // out-of-order slices (every ts within the 10-minute lateness of
    // the running max); final slice drives the watermark past all docs
    val slices = Seq(
      Seq(all(1), all(0)),
      Seq(all(3), all(2)),
      Seq(all(4)),
      Seq(Doc(99, B + 100 * M, "watermark driver sentinel text here")))
    slices.foreach { s =>
      s.toDF().coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(20)
    }
    val prev = StreamScale.enableRocksDb(spark)
    try {
      val stream = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src).as[Doc]
      val q = StreamingNearDup.probe(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_sndup")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val got = StreamingNearDup
        .consolidate(spark.table("graft_sndup").filter("doc_id <= 5"))
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3), r.getLong(4)))
        .toSet
      val want = StreamingNearDup
        .batchOracle(all.take(5).toDF())
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == want, s"streaming $got != batch $want")
      // the planted facts hold regardless of minhash luck on doc 4:
      val byDoc = got.map(t => t._1 -> t).toMap
      assert(!byDoc(1L)._2, "doc 1 is novel")
      assert(byDoc(2L)._2 && byDoc(2L)._3 == 1L,
        "exact re-crawl must be flagged against its original")
      assert(!byDoc(3L)._2, "doc 3 is novel")
      assert(!byDoc(5L)._2, "doc 5 shares nothing")
      // every doc's verdict folded all 4 band probes (4 bands x 2 rows)
      assert(got.forall(_._4 == 4L), s"n_bands drifted: $got")
    } finally StreamScale.restore(spark, prev)
  }

  test("re-ingesting duplicates does not grow claim state with stream length") {
    // The operator's state contract: claims grow with DISTINCT bands
    // (unique corpus), NOT with stream length — re-crawls of known
    // docs hit existing claims and add nothing durable. Stream 3x the
    // slices over a FIXED 50-doc universe: peak state must saturate,
    // not scale with rows ingested. (The deliberate linear-in-history
    // axis — more UNIQUE docs — is documented on the operator; this
    // test pins the orthogonal axis a leak would show up on.)
    import spark.implicits._
    val users = 50
    def textOf(u: Int) =
      s"unique document number $u with words w${u}a w${u}b w${u}c w${u}d"
    def corpus(slices: Int): String = {
      val dir = Files.createTempDirectory(s"graft-sndup-sc$slices").toString
      for (sl <- 0 until slices) {
        (0 until users)
          .map(u => StreamingNearDup.Doc(sl.toLong * users + u,
            B + sl * M, textOf(u)))
          .toDF().coalesce(1).write.mode("append").parquet(dir)
      }
      dir
    }
    def run(dir: String): (Long, Long) = {
      val ckpt = Files.createTempDirectory("graft-sndup-sc-ckpt").toString
      val prev = StreamScale.enableRocksDb(spark)
      try {
        val stream = spark.readStream
          .schema(spark.read.parquet(dir).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(dir).as[StreamingNearDup.Doc]
        val q = StreamingNearDup.probe(stream)
          .writeStream.outputMode("append").format("noop")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination(180000)
        val progress = q.recentProgress.toSeq
        (progress.flatMap(_.stateOperators.map(_.numRowsTotal)).max,
         progress.flatMap(_.stateOperators.map(_.memoryUsedBytes)).max)
      } finally StreamScale.restore(spark, prev)
    }
    val (shortRows, shortBytes) = run(corpus(3))
    val (longRows, longBytes) = run(corpus(9))
    assert(shortRows > 0)
    // 3x the ingested rows, same 50-doc universe: claims saturate at
    // <= 4 bands/doc; the drainable buffer is bounded by the watermark
    // horizon (identical for both runs). 2x is saturation headroom,
    // not growth headroom — a per-ingest leak would show ~3x.
    assert(longRows <= shortRows * 2,
      s"state rows grew with stream length: short=$shortRows long=$longRows")
    assert(longBytes < math.max(shortBytes, 1L) * 5 / 2,
      s"state bytes grew with stream length: short=$shortBytes long=$longBytes")
  }

  /** The spec-side reference for the event-time TTL: the sequential
    * per-band claim fold with a (claim.ts, claim.ts + ttl] window,
    * applied to the SAME bands the operator computes, then the same
    * consolidation. O(n log n) per band — test-scale only.
    */
  private def ttlOracle(all: Seq[Doc], ttlMs: Long): Set[(Long, Boolean, Long)] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val bands = graft.operators.Dedup.bandExploded(all.toDF())
      .select(col("band"), col("doc_id"), col("ts_ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hits = bands.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      var claim: Option[(Long, Long)] = None // (ts, doc)
      ps.sortBy(p => (p._3, p._2)).map { case (_, doc, ts) =>
        if (claim.exists(c => ts - c._1 > ttlMs)) claim = None
        claim match {
          case Some((_, cd)) => (doc, true, cd)
          case None => claim = Some((ts, doc)); (doc, false, -1L)
        }
      }
    }
    hits.groupBy(_._1).map { case (doc, hs) =>
      val hit = hs.filter(_._2)
      (doc, hit.nonEmpty, if (hit.nonEmpty) hit.map(_._3).min else -1L)
    }.toSet
  }

  test("event-time claim TTL: expiry, re-claim, bounded state, " +
       "unaffected within-horizon detection") {
    import spark.implicits._
    val ttl = 20 * M
    val src = Files.createTempDirectory("graft-sndup-ttl-src").toString
    val ckpt = Files.createTempDirectory("graft-sndup-ttl-ckpt").toString
    val txt = "alpha beta gamma delta epsilon zeta"
    val all = Seq(
      Doc(1, B + 0 * M, txt), // novel; claims its bands at t=0
      Doc(2, B + 5 * M, txt), // within (0, 20m] -> dup_of 1
      Doc(3, B + 30 * M, txt), // claim expired at t=30m -> novel, RE-claims
      Doc(4, B + 35 * M, txt), // within (30m, 50m] -> dup_of 3
      Doc(5, B + 31 * M, "totally different content with no overlap here"))
    val sentinel = Doc(99, B + 200 * M, "watermark driver sentinel text here")
    // two slices so the t=0..5m claims DRAIN (and the cleanup timer
    // fires) before the t>=30m probes are evaluated
    Seq(all.take(2), all.drop(2), Seq(sentinel)).foreach { s =>
      s.toDF().coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(20)
    }
    val prev = StreamScale.enableRocksDb(spark)
    try {
      val stream = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src).as[Doc]
      val q = StreamingNearDup.probe(stream, claimTtlMs = ttl)
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_sndup_ttl")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val got = StreamingNearDup
        .consolidate(spark.table("graft_sndup_ttl").filter("doc_id <= 5"))
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3)))
        .toSet
      // full equality with the sequential TTL fold over the same bands
      assert(got == ttlOracle(all, ttl), s"streaming $got != ttl fold")
      val byDoc = got.map(t => t._1 -> t).toMap
      // (c) within-horizon detection unaffected by the TTL being set
      assert(byDoc(2L)._2 && byDoc(2L)._3 == 1L,
        "within-horizon re-crawl must still be flagged against its original")
      // (a) claims expire: the 30-minute re-crawl outlives the
      // 20-minute window, so it is NOVEL and becomes the new claimant
      assert(!byDoc(3L)._2, "claim must expire after the event-time TTL")
      assert(byDoc(4L)._2 && byDoc(4L)._3 == 3L,
        "expired band must be re-claimable by the next probe")
      assert(!byDoc(5L)._2, "unrelated content stays novel")
      // (b) state bounded by the horizon: the sentinel watermark
      // (190m) passed every claim's expiry timer except its own
      // (200m + ttl), so only the sentinel's 4 band claims survive —
      // doc 1-5's claims were physically cleared by the cleanup
      // timers, idle bands included
      val finalRows = q.recentProgress.toSeq.reverse
        .flatMap(_.stateOperators.map(_.numRowsTotal)).headOption.getOrElse(-1L)
      assert(finalRows <= 4,
        s"expired claims must be physically cleared: $finalRows rows remain")
    } finally StreamScale.restore(spark, prev)
  }

  test("with a TTL, claim state is bounded by the horizon, not corpus size") {
    // UNIQUE docs forever (the axis the no-TTL operator honestly grows
    // on): with an event-time TTL, claims older than the horizon are
    // cleared by their timers as the watermark advances, so peak state
    // tracks the docs inside the (ttl + lateness) window — 3x the
    // unique corpus must NOT move peak state rows ~3x.
    import spark.implicits._
    val ttl = 20 * M
    val perSlice = 20
    def corpus(slices: Int): String = {
      val dir = Files.createTempDirectory(s"graft-sndup-ttlb$slices").toString
      for (sl <- 0 until slices) {
        (0 until perSlice)
          .map(u => Doc(sl.toLong * perSlice + u, B + sl * 30 * M,
            s"slice $sl doc $u words s${sl}u${u}a s${sl}u${u}b s${sl}u${u}c"))
          .toDF().coalesce(1).write.mode("append").parquet(dir)
      }
      dir
    }
    def run(dir: String): Long = {
      val ckpt = Files.createTempDirectory("graft-sndup-ttlb-ckpt").toString
      val prev = StreamScale.enableRocksDb(spark)
      try {
        val stream = spark.readStream
          .schema(spark.read.parquet(dir).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(dir).as[Doc]
        val q = StreamingNearDup.probe(stream, claimTtlMs = ttl)
          .writeStream.outputMode("append").format("noop")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination(180000)
        q.recentProgress.toSeq
          .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      } finally StreamScale.restore(spark, prev)
    }
    val shortRows = run(corpus(4))
    val longRows = run(corpus(12))
    assert(shortRows > 0)
    // each slice advances event time 30m > ttl, so claims die two
    // slices after birth; peak state plateaus within the short run.
    // 2x is plateau headroom — an unexpired-claim leak would show ~3x.
    assert(longRows <= shortRows * 2,
      s"claim state grew past the TTL horizon: short=$shortRows long=$longRows")
  }
}
