package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.operators.{Dedup, TextAnalysis}

/** Streaming near-duplicate dedup — the streaming twin of the q37
  * MinHash+LSH tier: documents arrive as an unbounded stream and each
  * is kept only if it is FIRST-SEEN, i.e. no earlier in-horizon
  * document claimed any of its LSH band keys.
  *
  * Shape: the signature pipeline is the exact batch code (tokens →
  * shingles → codegen'd MinHash → [[Dedup.bandKeyArray]] — identical
  * keys by construction), then one `transformWithState` keyed by band
  * key whose state is a single claim (first (ts, doc) to touch the
  * band, ties to the lowest doc id within a trigger). Every band row
  * gets a verdict `ok = (claimant == this doc)`; a document is
  * first-seen iff ALL its band verdicts are ok ([[firstSeen]] — a
  * per-document reduction that is batch-side in the sink, since a
  * document's band rows never split across triggers).
  *
  * State is BOUNDED BY THE WATERMARK: each claim registers an
  * event-time timer at `claim + horizonMs`; once the watermark passes
  * it, the claim clears and the band is claimable again — exactly
  * `dropDuplicatesWithinWatermark`'s contract, applied per band key.
  * State size = one small row per distinct band key seen within the
  * horizon, independent of stream length. On a 100 TB/day stream this
  * is the only viable dedup shape: no pairwise join ever forms, and a
  * viral near-dup cluster costs one claim per band, not k² pairs.
  *
  * Ordering contract: claims are judged in (event-time, doc id) order
  * WITHIN a trigger; across triggers, arrival order decides (a late
  * out-of-order document inside the watermark cannot retract an
  * already-granted claim — standard streaming dedup semantics; the
  * batch twin [[firstSeenBatch]] matches when input is event-time
  * ordered, which is what its equivalence spec feeds). */
object StreamDedup {

  /** One exploded band row: band key, document, event time (micros +
    * the watermarked timestamp itself). */
  case class BandRow(bk: String, docId: Long, tsUs: Long, ts: Timestamp)

  /** Per-(doc, band) claim verdict; `ok` = this doc owns the band. */
  case class BandVerdict(doc_id: Long, ts_us: Long, ok: Boolean)

  private[streaming] case class Claim(docId: Long, tsUs: Long)

  /** Shared projection: docs → exploded (doc, ts, band key) rows. Docs
    * too short to shingle are excluded (they cannot be n-gram near-dups
    * of anything — the q37 guard). */
  private def bandRows(docs: DataFrame, idCol: String, tsCol: String,
                       textCol: String, n: Int, numHashes: Int,
                       bands: Int): DataFrame = {
    val rpb = numHashes / bands
    docs
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("docId"), col("ts"), TextAnalysis.shingles(col("toks"), n).as("sh"))
      .select(col("docId"), col("ts"), Dedup.minhashSignature(col("sh"), numHashes).as("sig"))
      .select(explode(Dedup.bandKeyArray(col("sig"), bands, rpb)).as("bk"),
        col("docId"), col("ts"))
  }

  private class ClaimProcessor(horizonMs: Long)
      extends StatefulProcessor[String, BandRow, BandVerdict] {
    @transient private var claim: ValueState[Claim] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      claim = getHandle.getValueState[Claim]("claim",
        Encoders.product[Claim], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BandRow],
                                 timers: TimerValues): Iterator[BandVerdict] = {
      // (event time, doc id) order decides ties arriving in one trigger —
      // deterministic regardless of partition arrival order
      val sorted = rows.toArray.sortBy(r => (r.tsUs, r.docId))
      var c = if (claim.exists()) claim.get() else null
      val out = sorted.map { r =>
        if (c == null) {
          c = Claim(r.docId, r.tsUs)
          claim.update(c)
          // the claim forgets itself once the watermark passes its
          // horizon — THE state bound: one live claim per in-horizon band
          getHandle.registerTimer(r.tsUs / 1000L + horizonMs)
        }
        BandVerdict(r.docId, r.tsUs, c.docId == r.docId)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[BandVerdict] = {
      claim.clear()
      Iterator.empty
    }
  }

  /** Streaming band-claim verdicts (append mode; requires the RocksDB
    * state store provider, as all transformWithState operators do).
    * Reduce with [[firstSeen]] in the sink. `lateness` is the watermark
    * (how out-of-order input may be); `horizonMs` is the dedup window
    * (how long a claim suppresses near-dups), the
    * `dropDuplicatesWithinWatermark` knob. */
  def bandVerdicts(docs: DataFrame, idCol: String, tsCol: String,
                   textCol: String, lateness: String, horizonMs: Long,
                   n: Int = 3, numHashes: Int = 32,
                   bands: Int = 16): Dataset[BandVerdict] = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    claimVerdicts(bandRows(docs, idCol, tsCol, textCol, n, numHashes, bands),
      lateness, horizonMs)
  }

  /** [[bandVerdicts]] PLUS a whole-document exact claim per doc: every
    * doc additionally publishes `"X|" + md5(text)` (a key space disjoint
    * from the numeric-prefixed band keys), so exact duplicates drop even
    * when the doc is too short to shingle — the streaming twin of the
    * batch lake plan's exact tier riding the SAME claim processor and
    * the same state bound (one claim per distinct in-horizon key).
    * Reduce with [[firstSeen]]: a doc survives iff it owns its md5 claim
    * AND every band claim. */
  def exactAndBandVerdicts(docs: DataFrame, idCol: String, tsCol: String,
                           textCol: String, lateness: String, horizonMs: Long,
                           n: Int = 3, numHashes: Int = 32,
                           bands: Int = 16): Dataset[BandVerdict] = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val exact = docs.select(
      concat(lit("X|"), coalesce(md5(col(textCol).cast("binary")), lit(""))).as("bk"),
      col(idCol).as("docId"), col(tsCol).as("ts"))
    val rows = bandRows(docs, idCol, tsCol, textCol, n, numHashes, bands)
      .unionByName(exact)
    claimVerdicts(rows, lateness, horizonMs)
  }

  /** The shared claim tail: watermark the exploded claim rows and run
    * the per-key first-claim processor. */
  private def claimVerdicts(rows: DataFrame, lateness: String,
                            horizonMs: Long): Dataset[BandVerdict] = {
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    implicit val rowEnc = Encoders.product[BandRow]
    implicit val outEnc = Encoders.product[BandVerdict]
    implicit val keyEnc = Encoders.STRING
    rows
      .withWatermark("ts", lateness)
      .select(col("bk"), col("docId"), unix_micros(col("ts")).as("tsUs"), col("ts"))
      .as[BandRow]
      .groupByKey(_.bk)
      .transformWithState(new ClaimProcessor(horizonMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Reduce band verdicts to first-seen documents: a doc survives iff
    * EVERY band verdict is ok. Batch-side (run it in foreachBatch or on
    * the collected sink): a document's band rows share its trigger, so
    * the reduction never needs cross-batch state. */
  def firstSeen(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("doc_id"), col("ts_us"))
      .agg(min(when(col("ok"), 1L).otherwise(0L)).as("_all_ok"))
      .filter(col("_all_ok") === 1L)
      .select("doc_id", "ts_us")

  /** The BATCH twin (equivalence oracle): claimant of each band = the
    * (ts, doc id) minimum over the corpus; a doc is first-seen iff it
    * claims every band it touches. Assumes the whole corpus lies within
    * one dedup horizon (the fixture regime); the stream adds horizon
    * expiry on top. */
  def firstSeenBatch(docs: DataFrame, idCol: String, tsCol: String,
                     textCol: String, n: Int = 3, numHashes: Int = 32,
                     bands: Int = 16): DataFrame = {
    val b = bandRows(docs, idCol, tsCol, textCol, n, numHashes, bands)
      .select(col("bk"), col("docId").as("doc_id"), unix_micros(col("ts")).as("ts_us"))
      // exchange barrier (the lshCandidates lesson): the subtree feeds the
      // claim build AND the probe join; one pinned exchange reuses it
      .repartition(col("bk"))
    val claims = b.groupBy("bk")
      .agg(min(struct(col("ts_us"), col("doc_id"))).as("c"))
    b.join(claims, "bk")
      .groupBy(col("doc_id"), col("ts_us"))
      .agg(min(when(col("c.doc_id") === col("doc_id"), 1L).otherwise(0L)).as("_ok"))
      .filter(col("_ok") === 1L)
      .select("doc_id", "ts_us")
  }
}
