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
  * deployment that only needs a retention horizon bounds it with the
  * `claimTtlMs` knob: an EVENT-TIME TTL evaluated inside the
  * processor — a claim covers (claim.ts, claim.ts + ttl]; a probe
  * past the window finds the band unclaimed and becomes the new
  * claimant, and a watermark-driven cleanup timer physically clears
  * expired claims so idle bands do not hold state forever. Event
  * time, not Spark's TTLConfig, for two reasons: TTLConfig is
  * processing-time-only (Spark rejects it under TimeMode.EventTime —
  * `StatefulProcessorCannotAssignTTLInTimeMode`), and a wall-clock
  * horizon is the wrong semantics for an event-time operator anyway
  * (a checkpoint replay or backfill would expire claims at replay
  * speed; the event-time window is replay-deterministic).
  * StreamingNearDupSpec pins expiry, re-claim, bounded state, and
  * unaffected within-horizon detection.
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

  /** Sentinel for "no TTL": claims live forever (the default, honest
    * dup-of-anything-ever shape).
    */
  val NoTtl: Long = Long.MaxValue

  class BandClaimProcessor(claimTtlMs: Long)
      extends StatefulProcessor[String, Probe, BandHit] {
    require(claimTtlMs > 0, s"claimTtlMs must be positive: $claimTtlMs")
    @transient private var buf: ListState[ProbeBuf] = _
    @transient private var claim: ValueState[Claim] = _
    private def ttlFinite: Boolean = claimTtlMs != NoTtl

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[ProbeBuf](
        "buf", Encoders.product[ProbeBuf], TTLConfig.NONE)
      claim = getHandle.getValueState[Claim](
        "claim", Encoders.product[Claim], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Probe],
                                 tv: TimerValues): Iterator[BandHit] = {
      var maxTs = Long.MinValue
      // ONE appendList per key per batch, never appendValue per row:
      // the RocksDB ListState append is a read-modify-write of the
      // ENTIRE accumulated list (measured: one get per append, bytes
      // read per get tracking list length — 120k gets / 2.8 GB read
      // for a 10k-doc microbatch by batch 3), so per-row appends are
      // O(L) each and O(L²) per key per batch while the buffer holds
      // a watermark-horizon of probes. Batching to one append makes
      // the batch cost O(L).
      val fresh = scala.collection.mutable.ArrayBuffer.empty[ProbeBuf]
      for (p <- rows) {
        fresh += ProbeBuf(p.ts_ms, p.doc_id)
        if (p.ts_ms > maxTs) maxTs = p.ts_ms
      }
      if (fresh.nonEmpty) buf.appendList(fresh.toArray)
      if (maxTs != Long.MinValue &&
          !getHandle.listTimers().contains(maxTs + 1))
        getHandle.registerTimer(maxTs + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[BandHit] = {
      val cutoff = tv.getCurrentWatermarkInMs()
      val (ready, rest) = buf.get().toSeq.partition(_.ts_ms <= cutoff)
      val out = Seq.newBuilder[BandHit]
      var c: Option[Claim] = if (claim.exists()) Some(claim.get()) else None
      var claimed = false // write state ONLY when the claim changed
      // this drain — the claim is immutable until it expires, so
      // re-writing it every drain buys nothing
      for (p <- ready.sortBy(x => (x.ts_ms, x.doc_id))) {
        // event-time TTL: the claim covers (claim.ts, claim.ts + ttl];
        // a probe past the window sees the band unclaimed (and becomes
        // the new claimant below). Evaluated per probe because a claim
        // can expire BETWEEN two probes of the same drain.
        if (ttlFinite && c.exists(h => p.ts_ms - h.ts_ms > claimTtlMs))
          c = None
        c match {
          case None =>
            out += BandHit(p.doc_id, p.ts_ms, key, hit = false, claim_doc = -1L)
            c = Some(Claim(p.ts_ms, p.doc_id))
            claimed = true
            // physical cleanup for idle bands: without a timer, an
            // expired claim on a band that never receives another
            // probe would hold its state row forever — exactly the
            // unbounded growth the TTL exists to prevent
            if (ttlFinite &&
                !getHandle.listTimers().contains(p.ts_ms + claimTtlMs + 1))
              getHandle.registerTimer(p.ts_ms + claimTtlMs + 1)
          case Some(h) =>
            // the claimant is the earliest probe inside the live
            // window; everything after it is a near-dup candidate
            out += BandHit(p.doc_id, p.ts_ms, key, hit = true,
                           claim_doc = h.doc_id)
        }
      }
      buf.clear()
      if (rest.nonEmpty) buf.appendList(rest.toArray)
      // expiry vs the WATERMARK is safe to apply physically: any probe
      // drained in the future carries ts >= the watermark at its own
      // ingest >= this cutoff (older ones are dropped as late), so if
      // the claim is expired relative to cutoff no future probe can
      // ever sit inside its window again
      if (ttlFinite && c.exists(h => cutoff - h.ts_ms > claimTtlMs)) {
        if (claim.exists()) claim.clear()
      } else if (claimed) c.foreach(claim.update)
      out.result().iterator
    }
  }

  /** The streaming operator: one BandHit per (document, band) probe.
    * `claimTtlMs` bounds claim state to an event-time retention
    * horizon (see the class doc); the default keeps claims forever.
    */
  def probe(docs: Dataset[Doc],
            claimTtlMs: Long = NoTtl): Dataset[BandHit] = {
    import docs.sparkSession.implicits._
    graft.operators.Dedup.bandExploded(docs.toDF())
      .select(col("band"), col("doc_id"), col("ts_ms"),
              timestamp_millis(col("ts_ms")).as("event_ts"))
      .withWatermark("event_ts", s"$latenessMs milliseconds")
      .as[Probe]
      .groupByKey(_.band)
      .transformWithState(new BandClaimProcessor(claimTtlMs),
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
