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
  * only if no earlier in-horizon document in its IVF cell reaches
  * `threshold` cosine.
  *
  * Shape: cell assignment is the exact batch kernel
  * ([[Similarity.centroidAssignment]] over a FROZEN centroid set — the
  * persistent [[graft.operators.AnnIndex]] artifact's handle, never a
  * per-stream retrain), then one `transformWithState` keyed by cell
  * whose state is the cell's in-horizon vectors. A new document compares
  * against every PRIOR cell-mate — kept or dropped, exactly the batch
  * rule: `semDedupKeep` drops b iff some LOWER-id a in the cell reaches
  * the threshold, regardless of whether a itself was dropped (chain
  * drops: a~b, b~c, a≁c still drops both b and c). The in-state cosine
  * is [[Similarity.cosineTo]] under the same 4-dp HALF_UP rounding as
  * the batch join's `round(cosine, 4) >= t` — bit-identical arithmetic,
  * so stream == batch on ordered input is exact, not approximate.
  *
  * State is BOUNDED BY THE WATERMARK: each arrival registers an
  * event-time timer at `ts + horizonMs`; expired entries prune from the
  * cell's list, so state = the in-horizon occupancy of each ACTIVE cell
  * — on a 100 TB/day stream the bound is (docs/day within horizon) ÷ k
  * cells per active cell, the same contract as the batch tier's
  * adaptive-k cell bound, and no pairwise join ever forms across cells.
  * A viral semantic cluster costs one state row per in-horizon member
  * of ONE cell, compared map-side.
  *
  * Ordering contract (the [[StreamDedup]] discipline): within a trigger,
  * (event-time, doc id) order decides; across triggers, arrival order —
  * a late in-watermark document cannot retract a granted verdict. The
  * batch twin matches when input arrives in id order (the equivalence
  * spec's regime, and the lake fixture's).
  *
  * Deviations from the batch tier, documented: (1) a mega-cell's
  * hyperplane sub-split ([[Similarity.ivfCellBlocks]] above `maxCell`)
  * is a batch-only recall/cost refinement — the stream compares the
  * WHOLE cell, so within an over-full cell it can only drop MORE
  * near-dups than batch, never fewer; at or under `maxCell` (every
  * oracle-checked scale) the two are identical. (2) null embeddings
  * pass the gate un-compared (kept) on both sides — the batch cell join
  * never matches a null cell. */
object StreamSemDedup {

  /** One assigned row: cell, document, event time, embedding. */
  case class CellRow(cell: Long, docId: Long, tsUs: Long, ts: Timestamp,
                     vec: Array[Float])

  /** Per-document verdict; `kept` = first of its semantic group. */
  case class SemVerdict(doc_id: Long, ts_us: Long, cent_id: Long, kept: Boolean)

  private case class Seen(docId: Long, tsUs: Long, vec: Array[Float])

  /** Spark's `round(_, 4)` on a double, exactly (HALF_UP through
    * BigDecimal) — the batch join's threshold arithmetic. */
  private def rounded4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private class CellProcessor(threshold: Double, horizonMs: Long)
      extends StatefulProcessor[Long, CellRow, SemVerdict] {
    @transient private var seen: ListState[Seen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Seen]("seen",
        Encoders.product[Seen], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CellRow],
                                 timers: TimerValues): Iterator[SemVerdict] = {
      // (event time, doc id) order decides within a trigger —
      // deterministic regardless of partition arrival order
      val sorted = rows.toArray.sortBy(r => (r.tsUs, r.docId))
      val live = scala.collection.mutable.ArrayBuffer.empty[Seen]
      if (seen.exists()) seen.get().foreach(live += _)
      val out = sorted.map { r =>
        val dup = live.exists(s =>
          rounded4(Similarity.cosineTo(s.vec, r.vec)) >= threshold)
        val me = Seen(r.docId, r.tsUs, r.vec)
        // EVERY arrival joins the cell's compare set (batch rule: a
        // dropped doc still suppresses later members of its chain) and
        // forgets itself once the watermark passes its horizon
        live += me
        seen.appendValue(me)
        getHandle.registerTimer(r.tsUs / 1000L + horizonMs)
        SemVerdict(r.docId, r.tsUs, key, kept = !dup)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
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
    * watermark; `horizonMs` the dedup window. Null-embedding rows pass
    * through un-gated (match the batch cell join's null semantics) —
    * they carry no verdict row. */
  def cellVerdicts(docs: DataFrame, centroids: Seq[(Long, Array[Float])],
                   threshold: Double, lateness: String, horizonMs: Long,
                   idCol: String = "vec_id", tsCol: String = "ts",
                   vecCol: String = "embedding"): Dataset[SemVerdict] = {
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    implicit val rowEnc = Encoders.product[CellRow]
    implicit val outEnc = Encoders.product[SemVerdict]
    implicit val keyEnc = Encoders.scalaLong
    docs
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        col(vecCol).cast("array<float>").as("vec"))
      .withColumn("cell", Similarity.centroidAssignment(col("vec"), centroids))
      .filter(col("cell").isNotNull)
      .withWatermark("ts", lateness)
      .select(col("cell"), col("docId"), unix_micros(col("ts")).as("tsUs"),
        col("ts"), col("vec"))
      .as[CellRow]
      .groupByKey(_.cell)
      .transformWithState(new CellProcessor(threshold, horizonMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Reduce verdicts to the kept set (one verdict row per doc — unlike
    * [[StreamDedup.firstSeen]] no per-band fold is needed). */
  def kept(verdicts: DataFrame): DataFrame =
    verdicts.filter(col("kept")).select("doc_id", "ts_us")
}
