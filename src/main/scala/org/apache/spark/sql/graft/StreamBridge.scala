package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge into `private[sql]` streaming-DataFrame construction (the
  * classic path every built-in v1 streaming Source uses from inside
  * Spark's namespace). A v1 `Source.getBatch` must return a Dataset
  * whose `isStreaming` is true — the only public-API way to build one is
  * `readStream` itself, which is exactly what a Source cannot call. Same
  * extension-library pattern as [[ColumnBridge]]; no Spark internals are
  * modified.
  *
  * Since the GraftScan pushdown landed this is the FALLBACK batch path:
  * graft's sources emit a prunable GraftScan leaf when the session
  * registered [[graft.plans.GraftExtensions]], and this plain bridged
  * frame (correct, just unpruned) when a vanilla session drives them. */
object StreamBridge {
  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                         schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Batch view of a v1 `Sink.addBatch` DataFrame. The frame a sink
    * receives wraps the micro-batch's ALREADY-PLANNED incremental
    * execution and reports `isStreaming = true` — feeding it to a batch
    * writer (`df.write`, which every TxLog commit stages through) would
    * re-analyze a plan with streaming leaves and refuse. The fix is the
    * one Spark's own ForeachBatchSink uses: lift the planned execution's
    * RDD into a fresh NON-streaming frame (`queryExecution.toRdd` is a
    * lazy val on the existing execution, so nothing is re-planned or
    * recomputed). */
  def sinkBatchDataFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
