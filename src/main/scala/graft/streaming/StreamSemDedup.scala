package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import graft.operators.Similarity

/** Streaming SEMANTIC dedup — the streaming twin of the q184 SemDeDup
  * tier ([[Similarity.semDedupKeep]]) and the last lake-pipeline tier
  * without one (round-13 directive #5; [[StreamDedup]] covers the LSH
  * textual tier): documents arrive with an embedding, and each is kept
  * only if no earlier in-horizon document in its IVF block reaches
  * `threshold` cosine.
  *
  * Shape: cell assignment is the exact batch kernel
  * ([[Similarity.centroidAssignment]] over a FROZEN centroid set — the
  * persistent [[graft.operators.AnnIndex]] artifact's handle, never a
  * per-stream retrain), then one `transformWithState` keyed by
  * (cell, sub-block) whose state is the block's in-horizon vectors. A
  * new document compares against every PRIOR block-mate — kept or
  * dropped, exactly the batch rule: `semDedupKeep` drops b iff some
  * LOWER-id a in the block reaches the threshold, regardless of whether
  * a itself was dropped (chain drops: a~b, b~c, a≁c still drops both b
  * and c). The in-state cosine is [[Similarity.cosineTo]] under the same
  * 4-dp HALF_UP rounding as the batch join's `round(cosine, 4) >= t` —
  * bit-identical arithmetic, so stream == batch on ordered input is
  * exact, not approximate.
  *
  * MEGA-CELL PARITY (round-14 directive #4): above `maxCell` the batch
  * tier sub-splits a cell by deterministic hyperplane sign bits
  * ([[Similarity.ivfCellBlocks]]) so no block pays C(cell, 2). The
  * stream applies the SAME split: pass `cellMasks` (the batch ladder's
  * per-cell masks — [[Similarity.cellMasks]] derives them from a corpus,
  * or compute them from an index's committed cell occupancy) and the
  * state key becomes (cell, hyperplaneBucket & mask) with the identical
  * dim-64/8-bit splitmix planes, so stream == batch holds on skewed
  * corpora too, and a viral cell's state is bounded per BLOCK. An empty
  * map (the default) keys whole cells — identical to batch whenever
  * every cell is at or under `maxCell` (every oracle-checked scale).
  *
  * State is BOUNDED BY THE WATERMARK: each arrival registers an
  * event-time timer at `ts + horizonMs`; expired entries prune from the
  * block's list, so state = the in-horizon occupancy of each ACTIVE
  * block — on a 100 TB/day stream the bound is (docs/day within
  * horizon) ÷ blocks per active block, the same contract as the batch
  * tier's adaptive-k cell bound, and no pairwise join ever forms across
  * blocks.
  *
  * Ordering contract (the [[StreamDedup]] discipline): within a trigger,
  * (event-time, doc id) order decides; across triggers, arrival order —
  * a late in-watermark document cannot retract a granted verdict. The
  * batch twin matches when input arrives in id order (the equivalence
  * spec's regime, and the lake fixture's).
  *
  * Null embeddings pass the gate KEPT, carrying a verdict row with
  * `cent_id = -1` (the un-embeddable sentinel — the batch cell join
  * never matches a null cell, so `semDedupKeep` keeps them too; the
  * verdict row exists so [[kept]] covers the whole input, round-14
  * ADVICE). */
object StreamSemDedup {

  /** One assigned row: cell, sub-block, document, event time, embedding. */
  case class CellRow(cell: Long, blk: Long, docId: Long, tsUs: Long,
                     ts: Timestamp, vec: Array[Float])

  /** Per-document verdict; `kept` = first of its semantic group.
    * `cent_id = -1` marks a null-embedding document gated through. */
  case class SemVerdict(doc_id: Long, ts_us: Long, cent_id: Long, kept: Boolean)

  private[streaming] case class Seen(docId: Long, tsUs: Long, vec: Array[Float])

  /** Spark's `round(_, 4)` on a double, exactly (HALF_UP through
    * BigDecimal) — the batch join's threshold arithmetic. */
  private def rounded4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private class CellProcessor(threshold: Double, horizonMs: Long,
                              excludeSelf: Boolean)
      extends StatefulProcessor[(Long, Long), CellRow, SemVerdict] {
    @transient private var seen: ListState[Seen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Seen]("seen",
        Encoders.product[Seen], TTLConfig.NONE)

    override def handleInputRows(key: (Long, Long), rows: Iterator[CellRow],
                                 timers: TimerValues): Iterator[SemVerdict] = {
      // (event time, doc id) order decides within a trigger —
      // deterministic regardless of partition arrival order
      val sorted = rows.toArray.sortBy(r => (r.tsUs, r.docId))
      val live = scala.collection.mutable.ArrayBuffer.empty[Seen]
      if (seen.exists()) seen.get().foreach(live += _)
      val out = sorted.map { r =>
        // excludeSelf: a keyed feed's new version of a doc must not be
        // suppressed by the doc's own earlier in-horizon vector
        val dup = live.exists(s =>
          (!excludeSelf || s.docId != r.docId) &&
            rounded4(Similarity.cosineTo(s.vec, r.vec)) >= threshold)
        val me = Seen(r.docId, r.tsUs, r.vec)
        // EVERY arrival joins the block's compare set (batch rule: a
        // dropped doc still suppresses later members of its chain) and
        // forgets itself once the watermark passes its horizon
        live += me
        seen.appendValue(me)
        getHandle.registerTimer(r.tsUs / 1000L + horizonMs)
        SemVerdict(r.docId, r.tsUs, key._1, kept = !dup)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: (Long, Long), timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SemVerdict] = {
      val cutoff = info.getExpiryTimeInMs()
      val keep = seen.get().filter(s => s.tsUs / 1000L + horizonMs > cutoff).toArray
      if (keep.isEmpty) seen.clear() else seen.put(keep)
      Iterator.empty
    }
  }

  /** Streaming per-document semantic verdicts (append mode; RocksDB
    * state store, as all transformWithState operators). `centroids` is
    * the FROZEN quantizer — pass `AnnIndex.load(spark, dir).centroids`
    * to gate against the lake's index artifact. `lateness` is the
    * watermark; `horizonMs` the dedup window. `cellMasks` is the batch
    * sub-split ladder for over-`maxCell` cells ([[Similarity.cellMasks]];
    * empty = whole-cell keys). Null-embedding rows pass through KEPT
    * with `cent_id = -1` (match the batch cell join's null semantics —
    * and carry a verdict so downstream keep-sets don't lose them). */
  def cellVerdicts(docs: DataFrame, centroids: Seq[(Long, Array[Float])],
                   threshold: Double, lateness: String, horizonMs: Long,
                   idCol: String = "vec_id", tsCol: String = "ts",
                   vecCol: String = "embedding",
                   cellMasks: Map[Long, Long] = Map.empty,
                   excludeSelf: Boolean = false): Dataset[SemVerdict] = {
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    implicit val rowEnc = Encoders.product[CellRow]
    implicit val outEnc = Encoders.product[SemVerdict]
    implicit val keyEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    val assigned = docs
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        col(vecCol).cast("array<float>").as("vec"))
      .withColumn("cell", Similarity.centroidAssignment(col("vec"), centroids))
      .withWatermark("ts", lateness)
    // un-embeddable docs: stateless pass-through verdict (kept, cell -1),
    // map-side — they never touch the stateful gate or its shuffle
    val nulls = assigned.filter(col("cell").isNull)
      .select(col("docId").as("doc_id"), unix_micros(col("ts")).as("ts_us"),
        lit(-1L).as("cent_id"), lit(true).as("kept"))
      .as[SemVerdict]
    // the batch ladder's sub-block: hyperplane sign bits masked by the
    // cell's mask (0 — whole cell — when the map has no entry), the
    // identical column kernel ivfCellBlocks applies
    val maskCol =
      if (cellMasks.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(cellMasks), col("cell")), lit(0L))
    val gated = assigned
      .filter(col("cell").isNotNull)
      .select(col("cell"),
        Similarity.hyperplaneBucket(col("vec"), dim = 64, nBits = 8)
          .bitwiseAND(maskCol).as("blk"),
        col("docId"), unix_micros(col("ts")).as("tsUs"),
        col("ts"), col("vec"))
      .as[CellRow]
      .groupByKey(r => (r.cell, r.blk))
      .transformWithState(new CellProcessor(threshold, horizonMs, excludeSelf),
        TimeMode.EventTime(), OutputMode.Append())
    gated.union(nulls)
  }

  /** Reduce verdicts to the kept set (one verdict row per doc — unlike
    * [[StreamDedup.firstSeen]] no per-band fold is needed; null-embedding
    * docs ride through as kept, `cent_id = -1`). */
  def kept(verdicts: DataFrame): DataFrame =
    verdicts.filter(col("kept")).select("doc_id", "ts_us")
}
