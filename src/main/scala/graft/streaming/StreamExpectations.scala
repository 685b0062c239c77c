package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The streaming face of operators/Expectations: data-quality gating ON
  * THE INGEST PATH, so a pipeline quarantines bad rows and tracks
  * violation rates per event-time window instead of discovering them in
  * tomorrow's batch audit (the same posture as the CDC error routing in
  * operators/Cdc.scala, generalized to declarative checks).
  *
  * Both forms keep streaming-viable shapes: the report is ONE windowed
  * aggregation whose state is a row per (window, check-vector) — all
  * checks ride a single groupBy as indicator sums, exploded after —
  * and the gate is a stateless map-side projection (no state at all),
  * so either runs on an unbounded stream with watermark-bounded or
  * zero state. */
object StreamExpectations {

  /** Per-window violation report for row-local checks: one output row
    * per (window_start, check) with n_checked / n_violations. All
    * checks share the single shuffle (indicator sums in one agg). */
  def windowedReport(stream: DataFrame, tsCol: String,
                     checks: Seq[(String, Column)],
                     windowLen: String = "1 hour",
                     lateness: String = "10 minutes"): DataFrame = {
    require(checks.nonEmpty, "windowedReport needs at least one check")
    val aggs = count(lit(1)).cast("long").as("_se_n") +:
      checks.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).cast("long").as(s"_se_v$i")
      }
    stream.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start"),
        explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
          struct(lit(name).as("check"), col("_se_n").as("n_checked"),
            col(s"_se_v$i").as("n_violations"))
        }: _*)).as("r"))
      .select(col("window_start"), col("r.check").as("check"),
        col("r.n_checked").as("n_checked"),
        col("r.n_violations").as("n_violations"))
  }

  /** Stateless quarantine gate: annotates each row with the NAMES of
    * its failed checks (`violations`, empty array = clean) and a
    * `passed` flag. Compose with a foreachBatch dual sink (the
    * CdcStream pattern) to route clean rows onward and quarantined
    * rows to the error zone — same semantics, declarative checks. */
  def gate(stream: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "gate needs at least one check")
    val names = checks.map { case (name, pred) =>
      when(pred, lit(name)).otherwise(lit(null).cast("string"))
    }
    stream
      .withColumn("violations",
        filter(array(names: _*), c => c.isNotNull))
      .withColumn("passed", size(col("violations")) === 0)
  }
}
