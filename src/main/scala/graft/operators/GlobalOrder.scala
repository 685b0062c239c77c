package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.PrefixScanBridge
import org.apache.spark.sql.types.LongType

/** Distributed totally-ordered analytics: exclusive running sums, global
  * row numbers, and exact NTILE without a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key is correct but collapses
  * the whole input onto ONE task (Spark logs "No Partition Defined for
  * Window operation") — a non-starter at lake scale. The classic fix is
  * the two-pass range-partitioned prefix scan (the same shape Spark
  * itself uses for `zipWithIndex` / global `sort`):
  *
  *   1. range-partition by the sort key and sort within partitions — the
  *      only full shuffle in the plan;
  *   2. job A: one tiny row per partition (its local weight total) is
  *      collected and prefix-scanned on the driver (numPartitions values,
  *      bytes not gigabytes);
  *   3. job B: each partition re-reads its shuffle output (stage reuse —
  *      the exchange is NOT recomputed) and streams its rows once, adding
  *      its driver-computed base offset to a local running total.
  *
  * Wall-clock is one shuffle plus two linear map passes, fully parallel;
  * the driver handles only numPartitions longs. Rows with equal sort keys
  * land in one partition (RangePartitioner splits on key boundaries), so
  * results match the single-partition window whenever the sort key is a
  * total order — under ties the running values are as nondeterministic as
  * the window form.
  *
  * Both passes run over InternalRows via [[PrefixScanBridge]] (round 16:
  * the previous `df.rdd` + `createDataFrame(RDD[Row])` form paid a boxed
  * de/re-serialization of EVERY field of EVERY row — pure per-task-work
  * overhead in the kernel behind 37 call sites).
  *
  * Construction runs job A eagerly (like `rdd.zipWithIndex`), so callers
  * get a plain DataFrame back, at the cost of an action at build time.
  */
object GlobalOrder {

  /** Range-partition + in-partition sort, materialized once so both
    * passes share one shuffle; driver prefix-scans the per-partition
    * totals into base offsets. */
  private def prefixScan(
      df: DataFrame, sortExprs: Seq[Column], weightOf: InternalRow => Long,
      numPartitions: Int): (org.apache.spark.rdd.RDD[InternalRow],
                            org.apache.spark.sql.types.StructType,
                            Array[Long], Long) = {
    val (rdd, schema) = PrefixScanBridge.ranged(df, sortExprs, numPartitions)
    val totals = PrefixScanBridge.partitionTotals(rdd, weightOf)
    val offsets = new Array[Long](rdd.getNumPartitions)
    var acc = 0L
    totals.sortBy(_._1).foreach { case (pid, s) => offsets(pid) = acc; acc += s }
    (rdd, schema, offsets, acc)
  }

  private def longWeight(df: DataFrame, valueCol: String): InternalRow => Long = {
    val idx = df.schema.fieldIndex(valueCol)
    require(df.schema(idx).dataType == LongType,
      s"$valueCol must be LongType (cast first), got ${df.schema(idx).dataType}")
    r => if (r.isNullAt(idx)) 0L else r.getLong(idx)
  }

  /** Cheap invariants go BEFORE prefixScan — the scan runs a shuffle and a
    * driver collect, too expensive to waste on a knowable-bad call. */
  private def checkOutCol(df: DataFrame, outCol: String): Unit =
    require(!df.columns.contains(outCol), s"output column $outCol already exists")

  /** Appends `outCol` = sum of `valueCol` over all rows strictly before
    * this one in `sortExprs` order (0 for the first row; nulls add 0) —
    * the scalable form of
    * `coalesce(sum(v).over(Window.orderBy(...).rowsBetween(unboundedPreceding, -1)), 0)`.
    * `valueCol` must already be LongType. */
  def exclusiveRunningSum(df: DataFrame, sortExprs: Seq[Column], valueCol: String,
                          outCol: String, numPartitions: Int = 0): DataFrame = {
    checkOutCol(df, outCol)
    val w = longWeight(df, valueCol)
    val (rdd, schema, offsets, _) = prefixScan(df, sortExprs, w, numPartitions)
    PrefixScanBridge.appended(df.sparkSession, rdd, schema, offsets, w,
      outCol, identity)
  }

  /** Appends `outCol` = 1-based global row number in `sortExprs` order —
    * the scalable form of `row_number().over(Window.orderBy(...))`.
    * Nondeterministic under ties, exactly like the window form. */
  def rowNumber(df: DataFrame, sortExprs: Seq[Column], outCol: String,
                numPartitions: Int = 0): DataFrame = {
    checkOutCol(df, outCol)
    val w = (_: InternalRow) => 1L
    val (rdd, schema, offsets, _) = prefixScan(df, sortExprs, w, numPartitions)
    PrefixScanBridge.appended(df.sparkSession, rdd, schema, offsets, w,
      outCol, _ + 1L)
  }

  /** Appends `outCol` = NTILE(k) over the global `sortExprs` order.
    * Matches SQL NTILE exactly: with n rows, the first n % k tiles hold
    * floor(n/k)+1 rows and the rest floor(n/k) (when k > n each row is
    * its own tile, 1..n) — computable from just the row number and the
    * (job A) grand total, no second window. */
  def ntile(df: DataFrame, k: Int, sortExprs: Seq[Column], outCol: String,
            numPartitions: Int = 0): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    checkOutCol(df, outCol)
    val w = (_: InternalRow) => 1L
    val (rdd, schema, offsets, total) = prefixScan(df, sortExprs, w, numPartitions)
    val q = if (total > 0) total / k else 0L // tile base size
    val r = if (total > 0) total % k else 0L // tiles holding one extra row
    val cut = r * (q + 1) // zero-based row count covered by the big tiles
    PrefixScanBridge.appended(df.sparkSession, rdd, schema, offsets, w, outCol,
      rn0 => if (rn0 < cut) rn0 / (q + 1) + 1 else r + (rn0 - cut) / q + 1)
  }
}
