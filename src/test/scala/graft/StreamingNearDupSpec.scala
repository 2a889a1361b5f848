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
}
