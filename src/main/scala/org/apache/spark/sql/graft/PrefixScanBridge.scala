package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Bridge for [[graft.operators.GlobalOrder]]'s two-pass range-partitioned
  * prefix scan, InternalRow end to end.
  *
  * The original implementation crossed the external-Row boundary twice per
  * row (`df.rdd` deserializes every field to boxed objects;
  * `createDataFrame(RDD[Row], schema)` re-encodes them) — the same
  * serialization tax the optimization guide's UDF chapter warns about, paid
  * by every one of the ~37 GlobalOrder/GroupPrefix/GroupMedian call sites.
  * Here the scan stays on the operator's `toRdd` InternalRows: job A reads
  * one long per row; job B appends the running value via a mutable
  * single-field row + JoinedRow, and the downstream RDDScanExec's own
  * UnsafeProjection materializes each output row (no extra copy here).
  * Arithmetic, ordering, and partition structure are byte-identical to the
  * Row-based form — only the row representation changed.
  *
  * Lives in Spark's namespace solely to reach `private[sql]`
  * `internalCreateDataFrame` (same extension-library pattern as
  * [[PlanBridge]]); no Spark internals are modified. */
object PrefixScanBridge {

  /** Range-partition `df` by `sortExprs` and sort within partitions,
    * returning the sorted InternalRow RDD + its schema. ONE lineage
    * object: running two jobs over the returned RDD reuses the
    * exchange's map output instead of re-shuffling. */
  def ranged(df: DataFrame, sortExprs: Seq[Column],
             numPartitions: Int): (RDD[InternalRow], StructType) = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    (sorted.queryExecution.toRdd, sorted.schema)
  }

  /** Job A: per-partition totals of `weightOf` (collected by the caller's
    * driver-side prefix scan — numPartitions longs, never data). */
  def partitionTotals(rdd: RDD[InternalRow],
                      weightOf: InternalRow => Long): Array[(Int, Long)] =
    rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += weightOf(r))
      Iterator((pid, s))
    }.collect()

  /** Job B: stream each partition once, appending non-null LongType
    * `outName` = rowValue(running) with running += weightOf(row) after
    * each row (exclusive semantics, exactly the Row-based contract). */
  def appended(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType,
               offsets: Array[Long], weightOf: InternalRow => Long,
               outName: String, rowValue: Long => Long): DataFrame = {
    val outSchema = StructType(schema.fields :+
      StructField(outName, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      // the joined view is materialized per row by the downstream scan's
      // UnsafeProjection before the iterator advances, so reusing these
      // mutable holders is safe (the standard InternalRow iterator contract)
      val joined = new JoinedRow
      val extra = new SpecificInternalRow(Seq(LongType))
      var run = offsets(pid)
      it.map { r =>
        extra.setLong(0, rowValue(run))
        run += weightOf(r)
        joined(r, extra): InternalRow
      }
    }
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(out, outSchema)
  }
}
