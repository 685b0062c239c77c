package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for stateful sessionization (a concrete, Encoder-friendly
  * shape; map wider frames onto it with `.as[SessionEvent]`). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** The open-session state kept per key: all integer micros, so the gap
  * arithmetic is exact (same contract as the batch
  * [[graft.operators.Sessionize]], which tests on `unix_micros`). */
case class OpenSession(startMicros: Long, lastMicros: Long, n: Long, sum: Double)

/** A finalized session, emitted exactly once. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long,
                         sum_value: Double)

/** Gap-based sessionization that EMITS CLOSED SESSIONS — the
  * `flatMapGroupsWithState` member of the streaming family (SURVEY §2.2
  * B-surface; `StreamOps.sessionAgg` is the `session_window` aggregation
  * form, `StatefulSnapshot` the `mapGroupsWithState` one).
  *
  * Why this exists beside `session_window`: the aggregation form can only
  * publish session AGGREGATES chosen up front, and in append mode it holds
  * results until the watermark closes them anyway. The custom-state form
  * owns the session record — it can emit arbitrarily shaped rows the
  * moment a session closes, either because a same-key event arrived past
  * the gap (in-stream close) or because the event-time watermark passed
  * `last + gap` with no successor (timeout close).
  *
  * Semantics match the batch [[graft.operators.Sessionize.assign]]: the
  * boundary is END-EXCLUSIVE — an event at exactly `last + gap` starts a
  * new session ([start, last+gap), like `session_window`).
  *
  * Scale/state shape: state is one `OpenSession` (4 numbers) per ACTIVE
  * key, independent of history length; the timeout guarantees eviction, so
  * state size tracks concurrently-active keys, not total keys ever seen.
  * Out-of-order caveats are the operator family's usual ones: events are
  * time-sorted within a trigger, and an event older than the open
  * session's last-seen time still joins it (gap measured to the newest
  * event) — events arriving later than the watermark delay can mis-split,
  * exactly as with `session_window`. Note Spark drops input rows at or
  * below the CURRENT watermark before the function sees them (measured:
  * an event at exactly the watermark is discarded), so the effective
  * lateness contract is strict. */
object StatefulSessions {

  private val MicrosPerSecond = 1000000L

  private[graft] def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * MicrosPerSecond + ts.getNanos / 1000L

  private def tsOf(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, MicrosPerSecond) * 1000L)
    t.setNanos((Math.floorMod(us, MicrosPerSecond) * 1000L).toInt)
    t
  }

  private def close(key: Long, s: OpenSession): ClosedSession =
    ClosedSession(key, tsOf(s.startMicros), tsOf(s.lastMicros), s.n, s.sum)

  /** `events` must already carry a watermark on `ts` (the caller picks the
    * lateness budget); returns the append-mode stream of closed sessions. */
  def closedSessions(events: Dataset[SessionEvent], gapSeconds: Long): Dataset[ClosedSession] = {
    require(gapSeconds > 0, s"gap must be positive, got $gapSeconds")
    val gapMicros = gapSeconds * MicrosPerSecond
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed last + gap with no successor: final close
            val out = state.getOption.map(close(key, _)).iterator
            state.remove()
            out
          } else {
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            // sort within the trigger; equal-ts order cannot move a
            // boundary (gap 0 < gapMicros), so micros alone is total enough
            it.toArray.sortBy(e => micros(e.ts)).foreach { e =>
              val us = micros(e.ts)
              cur = cur match {
                case Some(s) if us - s.lastMicros < gapMicros =>
                  Some(OpenSession(s.startMicros, Math.max(s.lastMicros, us),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= close(key, s)
                  Some(OpenSession(us, us, 1L, e.value))
                case None =>
                  Some(OpenSession(us, us, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // event-time timeout fires once the watermark passes this
              state.setTimeoutTimestamp(Math.floorDiv(s.lastMicros, 1000L) + gapSeconds * 1000L)
            }
            closed.reverse.iterator
          }
      }
  }
}
