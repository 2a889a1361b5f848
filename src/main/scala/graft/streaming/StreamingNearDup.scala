package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming NEAR-duplicate filtering at ingest — the continuous twin
  * of the d3/d9 MinHash-LSH batch index, and the missing half of the
  * streaming dedup story (`wb4`/dropDuplicates is EXACT dedup; a
  * re-crawl with one changed word sails through it). Every arriving
  * document computes the SAME 4×2 minhash bands as the batch index
  * ([[graft.operators.Dedup.bandExploded]] — shared constants, so the
  * continuous index cannot drift from the batch one), and a document
  * is flagged when any of its bands was already claimed by an earlier
  * document.
  *
  * Distributed shape: the band id is the shuffle key (4 slim rows per
  * document at any corpus size — exactly d3's scale argument, made
  * continuous). Per band key, transformWithState holds:
  *
  *  - ListState[ProbeBuf]: the out-of-order buffer, drained in
  *    (ts, doc_id) order once the watermark proves the prefix final —
  *    the TwsCep discipline, which is what makes sliced/out-of-order
  *    delivery ≡ the batch fold (StreamingNearDupSpec pins it).
  *    Bounded by the watermark horizon, not stream length.
  *  - ValueState[Claim]: the band's first claimant — set ONCE (drains
  *    are globally event-time ordered, so the first drained probe is
  *    the earliest forever), O(1) per band thereafter.
  *
  * State honesty at 100 TB: claims grow with DISTINCT BANDS, i.e.
  * linearly with unique corpus — the same linear-in-history footprint
  * d13's bloom sketch carries, and the real product requirement
  * ("dup of anything ever ingested"). RocksDB keeps it on disk; a
  * deployment that only needs a retention horizon bounds it with a
  * TTL on the claim state (the `claimTtl` knob) without touching the
  * operator.
  *
  * Emission is one BandHit per (doc, band) probe; `consolidate` folds
  * the 4 probes of a document into its verdict (dup iff ANY band hit,
  * `dup_of` = the smallest claimant id among hitting bands). All of a
  * document's probes finalize at the same watermark crossing, so the
  * fold is a plain per-batch aggregation downstream — no second
  * stateful stage.
  */
object StreamingNearDup {

  case class Doc(doc_id: Long, ts_ms: Long, text: String)
  case class Probe(band: String, doc_id: Long, ts_ms: Long,
                   event_ts: java.sql.Timestamp)
  case class ProbeBuf(ts_ms: Long, doc_id: Long)
  case class Claim(ts_ms: Long, doc_id: Long)
  case class BandHit(doc_id: Long, ts_ms: Long, band: String,
                     hit: Boolean, claim_doc: Long)

  /** The stream's watermark delay (TwsQuota/TwsCep contract): a
    * buffered probe is final once the watermark passes its timestamp.
    * `probe` derives its `withWatermark` string from THIS constant so
    * the two can't drift apart.
    */
  val latenessMs: Long = 10 * 60 * 1000L

  class BandClaimProcessor(claimTtl: TTLConfig)
      extends StatefulProcessor[String, Probe, BandHit] {
    @transient private var buf: ListState[ProbeBuf] = _
    @transient private var claim: ValueState[Claim] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[ProbeBuf](
        "buf", Encoders.product[ProbeBuf], TTLConfig.NONE)
      claim = getHandle.getValueState[Claim](
        "claim", Encoders.product[Claim], claimTtl)
    }

    override def handleInputRows(key: String, rows: Iterator[Probe],
                                 tv: TimerValues): Iterator[BandHit] = {
      var maxTs = Long.MinValue
      for (p <- rows) {
        buf.appendValue(ProbeBuf(p.ts_ms, p.doc_id))
        if (p.ts_ms > maxTs) maxTs = p.ts_ms
      }
      if (maxTs != Long.MinValue &&
          !getHandle.listTimers().contains(maxTs + 1))
        getHandle.registerTimer(maxTs + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[BandHit] = {
      val cutoff = tv.getCurrentWatermarkInMs()
      val (ready, rest) = buf.get().toSeq.partition(_.ts_ms <= cutoff)
      if (ready.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[BandHit]
      var c: Option[Claim] = if (claim.exists()) Some(claim.get()) else None
      var claimed = false // update state ONLY when the claim is newly
      // set this drain: an unconditional update would reset a
      // configured TTL on every drain, turning "expire N after claim
      // creation" into "expire N after last band activity" — and the
      // claim is immutable once set, so re-writing it buys nothing
      for (p <- ready.sortBy(x => (x.ts_ms, x.doc_id))) {
        c match {
          case None =>
            out += BandHit(p.doc_id, p.ts_ms, key, hit = false, claim_doc = -1L)
            c = Some(Claim(p.ts_ms, p.doc_id))
            claimed = true
          case Some(h) =>
            // the claimant is the earliest probe this band ever
            // drained; everything after it is a near-dup candidate
            out += BandHit(p.doc_id, p.ts_ms, key, hit = true,
                           claim_doc = h.doc_id)
        }
      }
      buf.clear()
      if (rest.nonEmpty) buf.appendList(rest.toArray)
      if (claimed) c.foreach(claim.update)
      out.result().iterator
    }
  }

  /** The streaming operator: one BandHit per (document, band) probe. */
  def probe(docs: Dataset[Doc],
            claimTtl: TTLConfig = TTLConfig.NONE): Dataset[BandHit] = {
    import docs.sparkSession.implicits._
    graft.operators.Dedup.bandExploded(docs.toDF())
      .select(col("band"), col("doc_id"), col("ts_ms"),
              timestamp_millis(col("ts_ms")).as("event_ts"))
      .withWatermark("event_ts", s"$latenessMs milliseconds")
      .as[Probe]
      .groupByKey(_.band)
      .transformWithState(new BandClaimProcessor(claimTtl),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Per-document verdict fold over emitted probes (all of a doc's
    * bands finalize at the same watermark crossing, so this is a
    * plain aggregation — run it per micro-batch in foreachBatch, or
    * over the sink table): dup iff any band hit an earlier claimant;
    * `dup_of` = the smallest such claimant (-1 when novel).
    */
  def consolidate(hits: DataFrame): DataFrame =
    hits.groupBy(col("doc_id"), col("ts_ms"))
      .agg(max(col("hit")).as("is_dup"),
           coalesce(min(when(col("hit"), col("claim_doc"))), lit(-1L))
             .as("dup_of"),
           count(lit(1)).as("n_bands"))

  /** Batch oracle: the same banding over the full document set, each
    * band claimed by its (ts, doc_id)-earliest member, every later
    * member a hit — then the same consolidation. What the streaming
    * path must equal under any slicing the watermark admits.
    */
  def batchOracle(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val banded = graft.operators.Dedup.bandExploded(docs)
    val w = Window.partitionBy(col("band"))
      .orderBy(col("ts_ms"), col("doc_id"))
    val hits = banded
      .withColumn("rn", row_number().over(w))
      .withColumn("first_doc", first(col("doc_id")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("hit", col("rn") > 1)
      .withColumn("claim_doc",
        when(col("hit"), col("first_doc")).otherwise(lit(-1L)))
      .select(col("doc_id"), col("ts_ms"), col("band"), col("hit"),
              col("claim_doc"))
    consolidate(hits)
  }
}
