package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group a keyed event stream into sessions
  * separated by inactivity gaps — the batch equivalent of Structured
  * Streaming's `session_window` (the streaming form lives in
  * [[graft.streaming.StreamOps]]).
  *
  * Scale shape: ONE shuffle+sort on the session key (the window), then the
  * session aggregation reuses the same partitioning — no second exchange.
  * State per row is two longs (previous timestamp + running break count);
  * nothing is materialized per session until the final aggregate.
  */
object Sessionize {

  /** Assign 1-based session ids per key: a new session starts when the gap
    * since the previous event reaches `gapSeconds`. The boundary is
    * END-EXCLUSIVE — an event at exactly `prev + gap` opens a NEW session —
    * matching Structured Streaming's `session_window` ([start, last+gap)),
    * so the batch and streaming forms sessionize identically. Ordering
    * within a key is `(tsCol, seqCol)` — `seqCol` must make the order total
    * so the assignment is deterministic under equal timestamps.
    *
    * The gap test runs on integer epoch-micros (`unix_micros`), never on
    * float seconds: micros fit a long exactly, so the same rows produce the
    * same sessions in any engine. */
  def assign(df: DataFrame, keyCols: Seq[String], tsCol: String, seqCol: String,
             gapSeconds: Long): DataFrame = {
    require(!df.columns.contains("session_id") && !df.columns.contains("_brk"),
      "input already has a session_id/_brk column — drop or rename it first " +
        "(assign would silently overwrite it)")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(seqCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isBreak = when(
      prev.isNull ||
        unix_micros(col(tsCol)) - unix_micros(prev) >= gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("_brk", isBreak)
      .withColumn("session_id",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_brk")
  }
}
