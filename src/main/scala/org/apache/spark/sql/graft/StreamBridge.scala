package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
