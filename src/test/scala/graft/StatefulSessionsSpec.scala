package graft

import org.apache.spark.sql.functions._
import graft.streaming.{ClosedSession, SessionEvent, StatefulSessions}

/** The flatMapGroupsWithState session emitter must produce exactly the
  * batch Sessionize sessions: same boundaries (end-exclusive gap), same
  * counts, same sums — whether a session closes in-stream (a same-key
  * successor past the gap) or by event-time timeout. */
class StatefulSessionsSpec extends SparkSpec {

  private val Gap = 1800L

  private def runStream(batches: Seq[Seq[SessionEvent]]): Seq[ClosedSession] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    val q = StatefulSessions
      .closedSessions(mem.toDS().withWatermark("ts", "0 seconds"), Gap)
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table("closed_sessions").as[ClosedSession].collect().toSeq
      .sortBy(c => (c.user_id, StatefulSessions.micros(c.session_start)))
  }

  private def batchSessions(events: Seq[SessionEvent]): Seq[ClosedSession] = {
    import spark.implicits._
    graft.operators.Sessionize
      .assign(events.toDF(), Seq("user_id"), "ts", "value", Gap)
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
      .drop("session_id").as[ClosedSession].collect().toSeq
      .sortBy(c => (c.user_id, StatefulSessions.micros(c.session_start)))
  }

  private def assertSame(got: Seq[ClosedSession], want: Seq[ClosedSession]): Unit = {
    assert(got.map(c => (c.user_id, c.session_start, c.session_end, c.n_events)) ===
      want.map(c => (c.user_id, c.session_start, c.session_end, c.n_events)))
    // float addition order differs between the sequential stream fold and
    // the batch aggregate — value-equal within ulps, not bit-equal
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g.sum_value - w.sum_value) < 1e-6, s"$g vs $w")
    }
  }

  test("matches batch Sessionize on the sf0.001 events (timeout closes)") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"value").as[SessionEvent].collect().toSeq
    // one far-future flush event per user: every REAL session then closes
    // deterministically (in-stream or by the advancing watermark), and the
    // flush sessions themselves stay open and unemitted
    val maxUs = events.map(e => StatefulSessions.micros(e.ts)).max
    val flushTs = new java.sql.Timestamp((maxUs / 1000000L + 20 * Gap) * 1000L)
    val flush = events.map(_.user_id).distinct.map(SessionEvent(_, flushTs, 0.0))
    val got = runStream(Seq(events, flush))
    val want = batchSessions(events ++ flush)
      .groupBy(_.user_id).flatMap { case (_, ss) => ss.init }.toSeq // drop flush sessions
      .sortBy(c => (c.user_id, StatefulSessions.micros(c.session_start)))
    assert(got.nonEmpty)
    assertSame(got, want)
  }

  test("in-stream close across triggers, without waiting for the timeout") {
    def ev(u: Long, sec: Long, v: Double) =
      SessionEvent(u, new java.sql.Timestamp(sec * 1000L), v)
    // trigger 1 opens u1's session; trigger 2's event is past the gap, so
    // the first session closes immediately on arrival
    val got = runStream(Seq(
      Seq(ev(1, 1000, 1.0), ev(1, 1100, 2.0)),
      Seq(ev(1, 1100 + Gap, 5.0))))
    assert(got.map(c => (c.user_id, c.n_events, c.sum_value)) === Seq((1L, 2L, 3.0)))
    assert(StatefulSessions.micros(got.head.session_start) === 1000L * 1000000L)
    assert(StatefulSessions.micros(got.head.session_end) === 1100L * 1000000L)
  }

  test("an event at exactly last + gap starts a NEW session (end-exclusive)") {
    // base offset keeps every event strictly ABOVE the initial watermark
    // (t=0): Spark's stateful operators drop input rows at or below the
    // current watermark before the user function ever sees them
    val B = 100000L
    def ev(u: Long, sec: Long, v: Double) =
      SessionEvent(u, new java.sql.Timestamp((B + sec) * 1000L), v)
    val boundary = runStream(Seq(
      Seq(ev(1, 0, 1.0), ev(1, Gap, 1.0), ev(2, 0, 1.0), ev(2, Gap - 1, 1.0)),
      Seq(ev(1, 10 * Gap, 0.0), ev(2, 10 * Gap, 0.0))))
    // user 1: boundary event split into a second session; user 2: one session
    assert(boundary.filter(_.user_id == 1).map(_.n_events) === Seq(1L, 1L))
    assert(boundary.filter(_.user_id == 2).map(_.n_events) === Seq(2L))
  }
}
