package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
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

  /** One exploded claim row CARRYING the doc's signature (null on the
    * exact-md5 key, where band equality already proves identity). */
  case class SigRow(bk: String, docId: Long, tsUs: Long, ts: Timestamp,
                    sig: Array[Long])

  private[streaming] case class SigClaim(docId: Long, tsUs: Long,
                                         sig: Array[Long])

  /** The VERIFIED claim processor: a band's state is the list of its
    * in-horizon claimants WITH their signatures, and a new arrival is
    * suppressed only when some prior claimant's signature agreement
    * reaches `minAgree` slots — the MinHash Jaccard estimate
    * (agree/numHashes, the q137 estimator: E[est] = J), i.e. the batch
    * tier's candidates-then-verify with the exact-jaccard verify
    * replaced by the estimator the signatures already carry. On the
    * unverified tier a band COLLISION suppresses outright, which
    * over-drops on real text (measured 16 % of bench-corpus survivors at
    * sf0.1 — common-stopword shingles collide docs at jaccard ~0.1);
    * here a collision is only a candidate. Chain rule as everywhere: a
    * suppressed doc still joins the claimant list. */
  private class VerifiedClaimProcessor(horizonMs: Long, minAgree: Int,
                                       excludeSelf: Boolean)
      extends StatefulProcessor[String, SigRow, BandVerdict] {
    @transient private var seen: ListState[SigClaim] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[SigClaim]("seen",
        Encoders.product[SigClaim], TTLConfig.NONE)

    private def agrees(a: Array[Long], b: Array[Long]): Boolean = {
      // null signature = the exact-md5 key: band equality IS identity
      if (a == null || b == null) return true
      var i = 0; var agree = 0
      val m = math.min(a.length, b.length)
      while (i < m) { if (a(i) == b(i)) agree += 1; i += 1 }
      agree >= minAgree
    }

    override def handleInputRows(key: String, rows: Iterator[SigRow],
                                 timers: TimerValues): Iterator[BandVerdict] = {
      val sorted = rows.toArray.sortBy(r => (r.tsUs, r.docId))
      val live = scala.collection.mutable.ArrayBuffer.empty[SigClaim]
      if (seen.exists()) seen.get().foreach(live += _)
      val out = sorted.map { r =>
        // excludeSelf: a keyed feed's NEW VERSION of a doc must not be
        // suppressed by the doc's own earlier claims (it REPLACES them)
        val dup = live.exists(c =>
          (!excludeSelf || c.docId != r.docId) && agrees(c.sig, r.sig))
        val me = SigClaim(r.docId, r.tsUs, r.sig)
        live += me
        seen.appendValue(me)
        getHandle.registerTimer(r.tsUs / 1000L + horizonMs)
        BandVerdict(r.docId, r.tsUs, ok = !dup)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[BandVerdict] = {
      val cutoff = info.getExpiryTimeInMs()
      val keep = seen.get()
        .filter(s => s.tsUs / 1000L + horizonMs > cutoff).toArray
      if (keep.isEmpty) seen.clear() else seen.put(keep)
      Iterator.empty
    }
  }

  /** [[exactAndBandVerdicts]] with SIGNATURE-VERIFIED suppression — the
    * textual tier the composed streaming lake plan runs: exact dups drop
    * via the md5 claim; a band collision suppresses only at estimated
    * jaccard ≥ `threshold` (agreement ≥ ceil(threshold·numHashes) slots)
    * against some in-horizon band-mate. State = each band's in-horizon
    * claimant list with signatures (~(bands+1)·(numHashes+2) longs per
    * in-horizon doc), expired by event-time timers — heavier than the
    * one-claim-per-band tier but still horizon-bounded and join-free;
    * use [[bandVerdicts]] when collision-suppression's over-dropping is
    * acceptable (aggressive pre-filters). Deviation from the batch
    * verify, documented: batch thresholds EXACT jaccard, this thresholds
    * the estimator — pairs whose estimate and exact value straddle the
    * threshold diverge (measured on the bench corpus in Probe
    * streamlake; zero on planted high-overlap dups). */
  def exactAndVerifiedBandVerdicts(docs: DataFrame, idCol: String,
                                   tsCol: String, textCol: String,
                                   lateness: String, horizonMs: Long,
                                   threshold: Double,
                                   n: Int = 3, numHashes: Int = 32,
                                   bands: Int = 16,
                                   excludeSelf: Boolean = false): Dataset[BandVerdict] = {
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    val rpb = numHashes / bands
    val minAgree = math.ceil(threshold * numHashes).toInt
    val withSig = docs
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        col(textCol).as("_txt"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("docId"), col("ts"), col("_txt"),
        when(size(col("toks")) >= n,
          Dedup.minhashSignature(
            TextAnalysis.shingles(col("toks"), n), numHashes)).as("sig"))
      // exchange barrier before the explode (the lshCandidates lesson):
      // Generate would re-derive the minhash once per band reference
      .repartition(col("docId"))
    val banded = withSig.filter(col("sig").isNotNull)
      .select(explode(Dedup.bandKeyArray(col("sig"), bands, rpb)).as("bk"),
        col("docId"), col("ts"), col("sig"))
    val exact = withSig.select(
      concat(lit("X|"), coalesce(md5(col("_txt").cast("binary")), lit(""))).as("bk"),
      col("docId"), col("ts"), lit(null).cast("array<bigint>").as("sig"))
    implicit val rowEnc = Encoders.product[SigRow]
    implicit val outEnc = Encoders.product[BandVerdict]
    implicit val keyEnc = Encoders.STRING
    banded.unionByName(exact)
      .withWatermark("ts", lateness)
      .select(col("bk"), col("docId"), unix_micros(col("ts")).as("tsUs"),
        col("ts"), col("sig"))
      .as[SigRow]
      .groupByKey(_.bk)
      .transformWithState(new VerifiedClaimProcessor(horizonMs, minAgree,
          excludeSelf),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** One exploded shingle-claim row: shingle hash, document, event
    * time (multiset semantics — the batch [[Dedup.shingleIndex]]
    * explodes without dedup, so `n_a`/`inter` count instances there
    * too). */
  case class ShingleRow(sk: Long, docId: Long, tsUs: Long, ts: Timestamp)

  /** One COUNTED shingle instance of a doc (it was under the df cap at
    * arrival, so it enters the containment DENOMINATOR — mirroring the
    * batch tier where `n_a` counts only CAPPED index rows). `priors`
    * leads with a `-1` self-marker, then one element per prior
    * in-horizon claim instance of the same shingle the arrival matched.
    * One array row per instance instead of one scalar row per (marker +
    * match) keeps the stateful operator's output-encoder path at
    * ~|shingles| rows while the candidate volume (the batch capped
    * join's Σ C(df,2)) explodes downstream in whole-stage codegen —
    * measured 274→183 s on the sf3 textual hop (stream/batch within-run
    * ratio 4.3×→2.4×). Reduce with [[containmentSuppressed]]. */
  case class ContainMatch(doc_id: Long, ts_us: Long, priors: Array[Long])

  private[streaming] case class SClaim(docId: Long, tsUs: Long)

  /** The streaming CONTAINMENT tier's claim processor (round-16: the
    * sf3 under-drop attribution measured the composed stream's entire
    * 2.2 % divergence as CONTAINMENT-class — low-jaccard subset pairs
    * never collide in LSH bands, so no band tier can mirror the batch
    * `pairStats` containment gate): state per shingle hash is the list
    * of its in-horizon claim instances, and each arrival emits one
    * match row per prior instance — the sink counts matches per
    * (doc, prior) to rebuild `inter` and compares against the doc's own
    * shingle count, exactly the batch `ca = inter / n_a` arithmetic.
    *
    * The batch tier's df cap (a shingle with df > cap contributes NO
    * pairs) becomes an in-horizon cap: once a shingle's live instance
    * count reaches `dfCap` it stops emitting AND stops appending (state
    * stays bounded at dfCap rows per hot shingle). Two documented
    * approximations vs batch: matches already emitted before a shingle
    * went hot cannot be retracted, and the cap counts IN-HORIZON
    * instances where batch counts the whole corpus. */
  private class ContainProcessor(horizonMs: Long, dfCap: Int)
      extends StatefulProcessor[Long, ShingleRow, ContainMatch] {
    @transient private var seen: ListState[SClaim] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[SClaim]("seen",
        Encoders.product[SClaim], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ShingleRow],
                                 timers: TimerValues): Iterator[ContainMatch] = {
      val sorted = rows.toArray.sortBy(r => (r.tsUs, r.docId))
      val live = scala.collection.mutable.ArrayBuffer.empty[SClaim]
      if (seen.exists()) seen.get().foreach(live += _)
      val out = scala.collection.mutable.ArrayBuffer.empty[ContainMatch]
      val fresh = scala.collection.mutable.ArrayBuffer.empty[SClaim]
      var maxTsUs = Long.MinValue
      sorted.foreach { r =>
        if (live.size < dfCap) {
          // the instance enters the doc's DENOMINATOR (batch: n_a counts
          // capped index rows only) — the leading -1 self-marker — and
          // matches every prior claim instance; same-doc never matches
          // (batch: a.doc_id < b.doc_id), which in keyed mode also
          // exempts a doc's own earlier version
          val priors = Array.newBuilder[Long]
          priors += -1L
          live.foreach { c =>
            if (c.docId != r.docId) priors += c.docId
          }
          out += ContainMatch(r.docId, r.tsUs, priors.result())
          live += SClaim(r.docId, r.tsUs)
          fresh += SClaim(r.docId, r.tsUs)
          if (r.tsUs > maxTsUs) maxTsUs = r.tsUs
        }
      }
      // ONE state write and ONE timer per (key, trigger) — per-instance
      // appendValue/registerTimer both measured as dominant RocksDB
      // write costs at sf3; expiry prunes everything due and re-arms
      // for the earliest survivor
      if (fresh.nonEmpty) {
        seen.appendList(fresh.toArray)
        getHandle.registerTimer(maxTsUs / 1000L + horizonMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[ContainMatch] = {
      val cutoff = info.getExpiryTimeInMs()
      val keep = seen.get()
        .filter(s => s.tsUs / 1000L + horizonMs > cutoff).toArray
      if (keep.isEmpty) seen.clear()
      else {
        seen.put(keep)
        getHandle.registerTimer(keep.map(_.tsUs).min / 1000L + horizonMs)
      }
      Iterator.empty
    }
  }

  /** Streaming containment matches (append mode, RocksDB state store):
    * one row per COUNTED shingle instance of an arriving doc, carrying
    * the prior in-horizon claim instances it matched as an array. The
    * stateful input is ~|shingles| rows per doc — the same order as the
    * batch tier's inverted-index shuffle, and an order of magnitude
    * above the band tier's (bands+1) rows, which is why the composed
    * plan exposes this tier behind its own knob. Suppression cannot
    * reach a pair whose CONTAINED side arrived first (batch drops it
    * regardless of order) — the irreducible online class, measured and
    * spec-pinned — nor a pair only the batch cap's CORPUS-GLOBAL df
    * solve reaches (the cap-scope class, also measured and pinned). */
  def containmentMatches(docs: DataFrame, idCol: String, tsCol: String,
                         textCol: String, lateness: String, horizonMs: Long,
                         n: Int = 3, dfCap: Int = 1024): Dataset[ContainMatch] = {
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    require(dfCap >= 2, s"dfCap must be >= 2, got $dfCap")
    implicit val rowEnc = Encoders.product[ShingleRow]
    implicit val outEnc = Encoders.product[ContainMatch]
    implicit val keyEnc = Encoders.scalaLong
    docs
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("docId"), col("ts"),
        TextAnalysis.shingles(col("toks"), n).as("sh"))
      // exchange barrier before the explode (the lshCandidates lesson):
      // Generate would otherwise re-derive the shingle array per
      // reference (size + every output row)
      .repartition(col("docId"))
      .withWatermark("ts", lateness)
      .select(col("docId"), col("ts"), explode(col("sh")).as("s"))
      .select(xxhash64(col("s")).as("sk"), col("docId"),
        unix_micros(col("ts")).as("tsUs"), col("ts"))
      .as[ShingleRow]
      .groupByKey(_.sk)
      .transformWithState(new ContainProcessor(horizonMs, dfCap),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Reduce [[containmentMatches]] to the suppressed (doc_id, ts_us)
    * set: a doc is containment-suppressed iff its match count with some
    * single prior doc reaches `threshold` of its own COUNTED instance
    * total — `round(inter / n, 4) >= t` with both sides under the df
    * cap, the batch tier's arithmetic (n_a counts capped index rows).
    * Batch-side in the sink (a doc's rows share its trigger). Expects
    * the `priors` array column (each instance's leading -1 self-marker
    * rebuilds `n`; the explode runs in whole-stage codegen here, not in
    * the stateful operator's encoder path). */
  def containmentSuppressed(matches: DataFrame, threshold: Double): DataFrame =
    matches
      .select(col("doc_id"), col("ts_us"),
        explode(col("priors")).as("prior_id"))
      .groupBy(col("doc_id"), col("ts_us"), col("prior_id"))
      .agg(count(lit(1)).as("c"))
      // one more local agg instead of a denominator self-join (a raw
      // self-join on the same foreachBatch/memory lineage hits
      // conflicting-reference resolution): n = marker total, the tier
      // fires on the doc's BEST single prior
      .groupBy(col("doc_id"), col("ts_us"))
      .agg(sum(when(col("prior_id") === -1L, col("c")).otherwise(0L)).as("n"),
        max(when(col("prior_id") =!= -1L, col("c"))).as("max_inter"))
      .filter(col("max_inter").isNotNull && col("n") > 0L &&
        round(col("max_inter").cast("double") / col("n"), 4) >= threshold)
      .select("doc_id", "ts_us")

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
