package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming relational operators over an event stream with an event-time
  * column: windowed aggregations + watermarking + dedupe (SURVEY.md §2.2,
  * "engine surface present but excluded from the t2 hash set"; validated by
  * stream-vs-batch equivalence in StreamingSpec).
  *
  * All of these are incremental one-shuffle aggregations: partial
  * aggregation happens map-side per micro-batch, the state store holds one
  * row per open (window, key) group, and the watermark bounds state size —
  * the properties that keep them viable on an unbounded 100 TB/day stream.
  */
object StreamOps {

  /** Tumbling-window count+sum per (window, key); watermark bounds state and
    * drops data later than `lateness`. Batch-equivalent of Q31. */
  def tumblingAgg(events: DataFrame, tsCol: String, keyCol: String,
                  valueCol: String, windowLen: String = "1 hour",
                  lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol), col("cnt"), col("sum_value"))

  /** Sliding-window variant (window/slide). */
  def slidingAgg(events: DataFrame, tsCol: String, keyCol: String,
                 windowLen: String, slide: String,
                 lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col(keyCol), col("cnt"))

  /** Session windows (gap-based), per key. */
  def sessionAgg(events: DataFrame, tsCol: String, keyCol: String,
                 gap: String = "30 minutes",
                 lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("session_start"), col(keyCol), col("cnt"))

  /** At-least-once -> effectively-once: drop duplicate event ids, keeping
    * state only within the watermark horizon. */
  def dedupeWithinWatermark(events: DataFrame, tsCol: String,
                            idCols: Seq[String], lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream equi+interval join: left rows match right rows with the
    * same key whose event time lies in `[left.ts - lowerBound, left.ts +
    * upperBound]`. BOTH sides carry watermarks and the time bounds are part
    * of the join condition — that pair is what lets the state store evict
    * rows once the other side's watermark passes them, keeping state O(
    * in-flight interval) instead of unbounded; without the bounds Spark
    * rejects the plan (or with outer joins would hold state forever.)
    *
    * Column convention: left columns keep their names and right's key/ts
    * become `keyCol_r`/`tsCol_r`; any OTHER column name shared by both
    * sides is rejected up front (it would silently produce ambiguous
    * duplicate output columns) — rename before joining.
    *
    * `left_semi` emits each left row at most once (first match wins, no
    * right columns in the output) — "purchases that had a view nearby"
    * without the match multiplicity. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, lowerBound: String = "10 minutes",
                   upperBound: String = "10 minutes",
                   lateness: String = "10 minutes",
                   joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer", "right_outer", "full_outer", "left_semi")(joinType),
      s"stream-stream interval join supports inner/left_outer/right_outer/" +
        s"full_outer/left_semi, got $joinType")
    val overlap = left.columns.toSet
      .intersect(right.columns.toSet -- Set(keyCol, tsCol))
    require(overlap.isEmpty,
      s"rename overlapping non-key columns before intervalJoin: ${overlap.mkString(", ")}")
    // The rename targets themselves must be free on EITHER side: a left (or
    // right non-key) column already named `key_r`/`ts_r` would collide with
    // the renamed right key/ts — exactly the ambiguity the guard above exists
    // to prevent.
    val renameTargets = Set(s"${keyCol}_r", s"${tsCol}_r")
    val clash = (left.columns.toSet ++ (right.columns.toSet -- Set(keyCol, tsCol)))
      .intersect(renameTargets)
    require(clash.isEmpty,
      s"columns ${clash.mkString(", ")} collide with intervalJoin's " +
        s"${keyCol}_r/${tsCol}_r rename targets — rename them first")
    val l = left.withWatermark(tsCol, lateness)
    val r0 = right
      .withColumnRenamed(keyCol, s"${keyCol}_r")
      .withColumnRenamed(tsCol, s"${tsCol}_r")
    val r = r0.withWatermark(s"${tsCol}_r", lateness)
    // outer variants: an unmatched row's null-extended output is emitted
    // only once the OTHER side's watermark passes the interval's upper
    // edge — correctness over latency, the only sound choice for an
    // unbounded stream (full_outer pays it in both directions).
    l.join(r,
      col(keyCol) === col(s"${keyCol}_r") &&
        col(s"${tsCol}_r") >= col(tsCol) - expr(s"INTERVAL $lowerBound") &&
        col(s"${tsCol}_r") <= col(tsCol) + expr(s"INTERVAL $upperBound"),
      joinType)
  }

  /** Streaming approximate distinct-count: HLL registers per tumbling
    * window, maintained incrementally. Exact streaming COUNT(DISTINCT) is
    * impossible with bounded state (every seen key must be remembered);
    * the HLL register MAX is an incremental aggregate, so state is
    * bounded at 64 registers per open window no matter how many events
    * flow through — the only viable distinct-count shape on an unbounded
    * 100 TB/day stream. Emit these registers to a sink and finish with
    * [[graft.operators.Sketch.hllFinish]] (a second chained streaming agg
    * would be rejected in append mode); registers from different shards/
    * restarts MAX-merge losslessly (SketchSpec pins distributivity). */
  def hllRegistersStream(events: DataFrame, tsCol: String, keyCol: String,
                         windowLen: String = "1 hour",
                         lateness: String = "10 minutes"): DataFrame = {
    val (bucket, rho) = graft.operators.Sketch.hllBucketRho(col(keyCol))
    events
      .withWatermark(tsCol, lateness)
      .select(col(tsCol), bucket, rho)
      .groupBy(window(col(tsCol), windowLen), col("bucket"))
      .agg(max(col("rho")).as("m_j"))
      .select(col("window.start").as("window_start"), col("bucket"), col("m_j"))
  }

  /** Streaming Count-Min frequency sketch: per-window counters maintained
    * incrementally — COUNT is an incremental aggregate, so state is
    * bounded at depth x width counters per open window no matter how many
    * events flow through (the frequency twin of [[hllRegistersStream]]).
    * Emit to a sink and answer point queries with
    * [[graft.operators.Sketch.cmEstimates]]; counters from shards or
    * restarts SUM-merge losslessly. */
  def cmCountersStream(events: DataFrame, tsCol: String, keyCol: String,
                       windowLen: String = "1 hour",
                       lateness: String = "10 minutes",
                       depth: Int = 4, width: Int = 256): DataFrame = {
    import graft.functions.HashFunctions
    events
      .withWatermark(tsCol, lateness)
      .select(col(tsCol),
        HashFunctions.h32(col(keyCol).cast("string")).as("_h"))
      .select(col(tsCol), explode(array((0 until depth).map { k =>
          struct(lit(k).as("row"),
            (HashFunctions.permHash(k, col("_h")) % width).as("bucket"))
        }: _*)).as("_rb"))
      .groupBy(window(col(tsCol), windowLen),
        col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("row"), col("bucket"), col("cnt"))
  }

  /** Stream-static dim enrichment: the streaming fact joins a bounded dim
    * relation. The static side re-plans per micro-batch (picking up dim
    * updates between batches); no stream-stream state at all, which is why
    * this is the FIRST join shape to reach for when one side is a table.
    *
    * Defaults are the safe enrichment semantics: LEFT OUTER (a fact row
    * with no dim match passes through with null dim columns instead of
    * silently vanishing) and `broadcastDim = true` for genuinely small
    * dims — pass false for a large dim to let Spark pick from its size
    * estimate instead of force-collecting it to the driver. */
  def enrich(stream: DataFrame, dim: DataFrame, keyCol: String,
             dimKeyCol: String, joinType: String = "left_outer",
             broadcastDim: Boolean = true): DataFrame = {
    val overlap = stream.columns.toSet.intersect(dim.columns.toSet)
    require(overlap.isEmpty,
      s"rename overlapping columns before enrich: ${overlap.mkString(", ")}")
    val d = if (broadcastDim) broadcast(dim) else dim
    stream.join(d, col(keyCol) === col(dimKeyCol), joinType)
  }
}
