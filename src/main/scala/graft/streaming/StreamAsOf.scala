package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One reference-stream row (the quotes side of trades⋈quotes). A
  * NULL-VALUED reference still shadows older values, exactly like the
  * struct-marker contract in the batch [[graft.operators.AsOf]]. */
case class AsOfRef(key: Long, ts: java.sql.Timestamp, seq: Long,
                   ref_value: Option[Double])

/** One probe-stream row (the trades side). */
case class AsOfProbe(key: Long, ts: java.sql.Timestamp, seq: Long,
                     value: Option[Double])

/** A probe joined with the latest reference at-or-before its time. */
case class AsOfJoined(key: Long, ts: java.sql.Timestamp, seq: Long,
                      value: Option[Double], asof_value: Option[Double])

/** A probe joined with its NEAREST reference in either direction. */
case class AsOfNearest(key: Long, ts: java.sql.Timestamp, seq: Long,
                       value: Option[Double], side: String,
                       nearest_value: Option[Double], delta_us: Option[Long])

/** Internal tagged union row; side 0 = reference, 1 = probe — the same
  * (ts, side, seq) tie order as the batch union+window formulation. */
private[streaming] case class AsOfEvt(key: Long, ts: java.sql.Timestamp,
                                      seq: Long, side: Int, v: Option[Double])

/** Per-key buffer: (micros, seq, value) for refs awaiting supersession and
  * probes awaiting finalization. */
private[streaming] case class AsOfBuf(refs: List[(Long, Long, Option[Double])],
                                      probes: List[(Long, Long, Option[Double])])

/** Stream-stream as-of join — the streaming twin of
  * [[graft.operators.AsOf.joinLatest]] (whose batch form is hash-checked
  * as q54). Spark's native stream-stream joins express equality + time
  * RANGE conditions, not "latest at-or-before", so this is the custom
  * state form: union the tagged streams, group by key, and buffer under
  * `flatMapGroupsWithState`.
  *
  * Correctness contract: a probe is emitted exactly once, when the
  * event-time watermark passes its timestamp — from that point the
  * watermark guarantees no reference with `ref.ts <= probe.ts` can still
  * be accepted, so the join value is final (same inclusive semantics and
  * greatest-seq tie-break as the batch operator).
  *
  * State/scale shape (the part that must survive 100 TB/day streams):
  * per key, the buffer holds (a) probes newer than the watermark — bounded
  * by the lateness budget, (b) references newer than the watermark plus
  * ONE anchor (the latest reference at-or-before the watermark; older
  * references are superseded for every future probe and evicted each
  * trigger). An idle key's state converges to just its anchor — one row —
  * which is the minimum any as-of semantics can keep, because a probe
  * arriving years later still joins against it. Probes finalize either
  * in-trigger (watermark already past) or via an event-time timeout set to
  * the oldest pending probe, so emission never waits for new same-key data.
  */
object StreamAsOf {

  private val MicrosPerSecond = 1000000L

  private[graft] def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * MicrosPerSecond + ts.getNanos / 1000L

  private def tsOf(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, MicrosPerSecond) * 1000L)
    t.setNanos((Math.floorMod(us, MicrosPerSecond) * 1000L).toInt)
    t
  }

  /** Join each probe with the latest reference at-or-before its time.
    * `delay` is the shared lateness budget (`withWatermark` on both
    * streams; the union's watermark is their minimum). Append-mode
    * output: one row per probe, final on emission. */
  def joinLatest(probes: Dataset[AsOfProbe], refs: Dataset[AsOfRef],
                 delay: String): Dataset[AsOfJoined] = {
    import probes.sparkSession.implicits._
    val tagged = refs.map(r => AsOfEvt(r.key, r.ts, r.seq, 0, r.ref_value))
      .withWatermark("ts", delay)
      .unionByName(
        probes.map(p => AsOfEvt(p.key, p.ts, p.seq, 1, p.value))
          .withWatermark("ts", delay))
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfBuf, AsOfJoined](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[AsOfEvt], state: GroupState[AsOfBuf]) =>
          val st0 = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
          var refsL = st0.refs
          var probesL = st0.probes
          it.foreach { e =>
            val entry = (micros(e.ts), e.seq, e.v)
            if (e.side == 0) refsL ::= entry else probesL ::= entry
          }
          // Spark drops input rows at or below the current watermark before
          // this function sees them (measured in StatefulSessions), so a
          // probe at-or-below the watermark can never gain another
          // qualifying reference: finalize it now.
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (done, pending) = probesL.partition(_._1 <= wmUs)
          val out = done.sortBy(p => (p._1, p._2)).map { case (pus, pseq, pv) =>
            val eligible = refsL.filter(_._1 <= pus)
            val best =
              if (eligible.isEmpty) None
              else Some(eligible.maxBy(r => (r._1, r._2)))
            AsOfJoined(key, tsOf(pus), pseq, pv, best.flatMap(_._3))
          }
          // evict superseded references: for every FUTURE acceptable probe
          // (ts > watermark), only the newest at-or-before-watermark
          // reference (the anchor) and the post-watermark ones can win
          val (oldRefs, liveRefs) = refsL.partition(_._1 <= wmUs)
          val anchor = if (oldRefs.isEmpty) Nil
                       else List(oldRefs.maxBy(r => (r._1, r._2)))
          val kept = AsOfBuf(anchor ++ liveRefs, pending)
          if (kept.refs.isEmpty && kept.probes.isEmpty) state.remove()
          else {
            state.update(kept)
            // flush the oldest pending probe the moment the watermark
            // passes it, even if this key never sees another event; with
            // no pending probe, wake when the watermark passes the NEWEST
            // live reference — one wake collapses every then-old ref into
            // the single anchor, so an idle key's state really does
            // converge to one row instead of freezing at however many
            // refs arrived in its final lateness window (a group with no
            // timeout is only revisited on new same-key data)
            pending.map(_._1).minOption
              .orElse(liveRefs.map(_._1).maxOption)
              .foreach { us =>
                state.setTimeoutTimestamp(math.max(
                  Math.floorDiv(us + 999L, 1000L),
                  state.getCurrentWatermarkMs() + 1L))
              }
          }
          out.iterator
      }
  }

  /** FORWARD stream-stream as-of join — the streaming twin of
    * [[graft.operators.AsOf.joinNext]] (hash-checked as q149): each probe
    * joins the EARLIEST reference at-or-after its time (inclusive, ties
    * to the LOWEST seq — the batch operator's order).
    *
    * Finality differs fundamentally from [[joinLatest]]: a backward join
    * is final once the watermark passes the probe (nothing older can
    * arrive), but a forward join waits on the FUTURE — "no next reference
    * ever" is undecidable on an unbounded stream. `horizonMs` bounds the
    * wait: the match is searched in [probe.ts, probe.ts + horizonMs], so
    * a probe finalizes either when the watermark passes its earliest
    * known qualifying reference (no earlier one can still arrive), or
    * with a null when the watermark passes the horizon end (every
    * in-horizon reference has arrived and none qualified). Batch
    * equivalence therefore holds whenever every batch match gap is
    * within the horizon.
    *
    * State shape: pending probes (bounded by horizon + lateness) and
    * references still above the watermark or at-or-after the oldest
    * pending probe. An idle key's state drains to EMPTY — unlike the
    * backward join, no anchor is needed, because a future probe can only
    * match future references. */
  def joinNext(probes: Dataset[AsOfProbe], refs: Dataset[AsOfRef],
               delay: String, horizonMs: Long): Dataset[AsOfJoined] = {
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    val horizonUs = horizonMs * 1000L
    import probes.sparkSession.implicits._
    val tagged = refs.map(r => AsOfEvt(r.key, r.ts, r.seq, 0, r.ref_value))
      .withWatermark("ts", delay)
      .unionByName(
        probes.map(p => AsOfEvt(p.key, p.ts, p.seq, 1, p.value))
          .withWatermark("ts", delay))
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfBuf, AsOfJoined](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[AsOfEvt], state: GroupState[AsOfBuf]) =>
          val st0 = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
          var refsL = st0.refs
          var probesL = st0.probes
          it.foreach { e =>
            val entry = (micros(e.ts), e.seq, e.v)
            if (e.side == 0) refsL ::= entry else probesL ::= entry
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // earliest qualifying IN-HORIZON reference per probe; final when
          // the watermark passes it (rows at-or-below the watermark can no
          // longer arrive, so nothing earlier-qualifying is still coming)
          def bestFor(pus: Long): Option[(Long, Long, Option[Double])] = {
            val q = refsL.filter(r => r._1 >= pus && r._1 <= pus + horizonUs)
            if (q.isEmpty) None else Some(q.minBy(r => (r._1, r._2)))
          }
          val (done, pending) = probesL.partition { case (pus, _, _) =>
            bestFor(pus).exists(_._1 <= wmUs) || wmUs >= pus + horizonUs
          }
          val out = done.sortBy(p => (p._1, p._2)).map { case (pus, pseq, pv) =>
            AsOfJoined(key, tsOf(pus), pseq, pv,
              bestFor(pus).filter(_._1 <= wmUs).flatMap(_._3))
          }
          // evict references no future or pending probe can match: future
          // probes have ts > watermark, pending ones have ts >= their min
          val pendingMin = pending.map(_._1).minOption
          val keptRefs = refsL.filter(r =>
            r._1 > wmUs || pendingMin.exists(r._1 >= _))
          val kept = AsOfBuf(keptRefs, pending)
          if (kept.refs.isEmpty && kept.probes.isEmpty) state.remove()
          else {
            state.update(kept)
            // wake when the oldest pending probe can finalize: its known
            // match's ts, else its horizon end (whichever comes first).
            // With no pending probe, wake when the watermark passes the
            // EARLIEST kept reference so it is evicted — a ref-only key
            // (references but never a probe) would otherwise hold its
            // refs forever, since a group with no timeout is only
            // revisited on new same-key data; with the timeout the state
            // drains to empty as the scaladoc promises
            pending.map { case (pus, _, _) =>
              bestFor(pus).map(_._1).getOrElse(Long.MaxValue)
                .min(pus + horizonUs)
            }.minOption
              .orElse(keptRefs.map(_._1).minOption)
              .foreach { us =>
                state.setTimeoutTimestamp(math.max(
                  Math.floorDiv(us + 999L, 1000L),
                  state.getCurrentWatermarkMs() + 1L))
              }
          }
          out.iterator
      }
  }

  /** NEAREST stream-stream as-of join — the streaming twin of
    * [[graft.operators.AsOf.joinNearest]] (whose batch form is
    * hash-checked as q171): each probe joins the reference closest in
    * time in EITHER direction, equal distances to the EARLIER reference
    * (so an exact-timestamp reference always wins as 'prev').
    *
    * Finality composes both parents': the backward candidate is final
    * once the watermark passes the probe; the forward side is bounded by
    * `horizonMs` AND by the backward candidate's distance — a forward
    * reference only matters if STRICTLY closer than the backward one, so
    * the probe resolves when the watermark passes
    * `min(known-next ts, probe.ts + cap)` where
    * `cap = min(prevDelta - 1us, horizon)` (no prev: `horizon`). A probe
    * with an exact-timestamp reference resolves immediately at its own
    * watermark: nothing can beat delta 0. Batch equivalence holds
    * whenever every batch 'next' win is within the horizon.
    *
    * State shape: pending probes (bounded by horizon + lateness) and,
    * per key, references above the watermark plus one global anchor and
    * each pending probe's own backward candidate (eviction cannot drop a
    * pending probe's prev — the global anchor may be NEWER than the
    * probe). An idle key's state converges to its anchor, like
    * [[joinLatest]]. */
  def joinNearest(probes: Dataset[AsOfProbe], refs: Dataset[AsOfRef],
                  delay: String, horizonMs: Long): Dataset[AsOfNearest] = {
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    val horizonUs = horizonMs * 1000L
    import probes.sparkSession.implicits._
    val tagged = refs.map(r => AsOfEvt(r.key, r.ts, r.seq, 0, r.ref_value))
      .withWatermark("ts", delay)
      .unionByName(
        probes.map(p => AsOfEvt(p.key, p.ts, p.seq, 1, p.value))
          .withWatermark("ts", delay))
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfBuf, AsOfNearest](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[AsOfEvt], state: GroupState[AsOfBuf]) =>
          val st0 = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
          var refsL = st0.refs
          var probesL = st0.probes
          it.foreach { e =>
            val entry = (micros(e.ts), e.seq, e.v)
            if (e.side == 0) refsL ::= entry else probesL ::= entry
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          def prevCand(pus: Long): Option[(Long, Long, Option[Double])] = {
            val q = refsL.filter(_._1 <= pus)
            if (q.isEmpty) None else Some(q.maxBy(r => (r._1, r._2)))
          }
          // distances at which a forward reference could still WIN:
          // strictly closer than prev (ties go backward), inside horizon
          def capOf(pus: Long): Long = prevCand(pus) match {
            case Some(p) => math.min(pus - p._1 - 1L, horizonUs)
            case None => horizonUs
          }
          // earliest forward reference that would win (within cap)
          def nextWin(pus: Long): Option[(Long, Long, Option[Double])] = {
            val cap = capOf(pus)
            val q = refsL.filter(r => r._1 >= pus && r._1 - pus <= cap)
            if (q.isEmpty) None else Some(q.minBy(r => (r._1, r._2)))
          }
          // refs at-or-below the watermark can no longer arrive, so a
          // known winning next at-or-below it is the TRUE nearest-forward;
          // past probe.ts + cap nothing arriving can win forward at all
          def resolvedAt(pus: Long): Boolean = wmUs >= pus && {
            nextWin(pus).exists(_._1 <= wmUs) || wmUs >= pus + capOf(pus)
          }
          val (done, pending) = probesL.partition(p => resolvedAt(p._1))
          val out = done.sortBy(p => (p._1, p._2)).map { case (pus, pseq, pv) =>
            nextWin(pus).filter(_._1 <= wmUs) match {
              case Some(n) =>
                AsOfNearest(key, tsOf(pus), pseq, pv, "next", n._3, Some(n._1 - pus))
              case None => prevCand(pus) match {
                case Some(p) =>
                  AsOfNearest(key, tsOf(pus), pseq, pv, "prev", p._3, Some(pus - p._1))
                case None =>
                  AsOfNearest(key, tsOf(pus), pseq, pv, "none", None, None)
              }
            }
          }
          // eviction: live refs, the global anchor (for FUTURE probes),
          // and each pending probe's own backward candidate
          val (oldRefs, liveRefs) = refsL.partition(_._1 <= wmUs)
          val anchor = if (oldRefs.isEmpty) Nil
                       else List(oldRefs.maxBy(r => (r._1, r._2)))
          val pinned = pending.flatMap(p => prevCand(p._1))
          val kept = AsOfBuf((anchor ++ pinned ++ liveRefs).distinct, pending)
          if (kept.refs.isEmpty && kept.probes.isEmpty) state.remove()
          else {
            state.update(kept)
            // wake at each pending probe's resolution point (its own ts if
            // the watermark has not reached it; else the earlier of its
            // known winning next and ts + cap); with no pending probe,
            // wake to collapse old refs into the anchor like joinLatest
            pending.map { case (pus, _, _) =>
              if (pus > wmUs) pus
              else math.min(
                nextWin(pus).map(_._1).getOrElse(Long.MaxValue),
                pus + capOf(pus))
            }.minOption
              .orElse(liveRefs.map(_._1).maxOption)
              .foreach { us =>
                state.setTimeoutTimestamp(math.max(
                  Math.floorDiv(us + 999L, 1000L),
                  state.getCurrentWatermarkMs() + 1L))
              }
          }
          out.iterator
      }
  }
}
