package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Deterministic dataset splitting for training pipelines: train/valid/test
  * membership derived from a hash of the row's id, never from `rand()`.
  *
  * Why hash, not random: the split must be (1) reproducible across runs and
  * engines, (2) stable under re-partitioning and data growth — a document
  * keeps its split forever, so later pipeline runs never leak test rows
  * into training, and (3) computable map-side in the scan (no shuffle, no
  * state). All properties a `rand()`-based split lacks.
  */
object Splits {

  /** Stable bucket in [0, buckets): md5-derived 32-bit hash of the id
    * (cross-engine stable, [[graft.functions.HashFunctions.h32]]). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    HashFunctions.h32(id.cast("string")) % buckets

  /** Add a `split` column assigning each row to a named split with the
    * given weights (must sum to ~1). Ranges are cumulative over the hash
    * bucket, so enlarging one split keeps all rows of the smaller prior
    * splits in place. */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)], buckets: Int = 100): DataFrame = {
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights must sum to 1, got $total")
    require(splits.nonEmpty)
    val bucket = hashBucket(col(idCol), buckets)
    val cums = splits.scanLeft(0.0)(_ + _._2).tail.map(c => math.round(c * buckets))
    // Loud, not silently empty: a weight below the bucket resolution would
    // round its range to zero width and the split would never get a row.
    require((0L +: cums).zip(cums).forall { case (lo, hi) => hi > lo },
      s"split weights ${splits.map(_._2).mkString(",")} collapse below the " +
        s"1/$buckets bucket resolution — raise `buckets` or merge splits")
    val expr = splits.init.zip(cums.init).foldRight(lit(splits.last._1)) {
      case (((name, _), cum), acc) => when(bucket < cum, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Token-budget corpus selection — the "fill each source's quota" step
    * of a training-data mixing pipeline: within each `groupCol` value,
    * rank rows by `sortCols` and keep rows while the cumulative
    * `weightCol` (inclusive of the current row) stays within `budget`.
    * Returns the kept rows plus a `cum_<weightCol>` column.
    *
    * The textbook form is
    * `sum(w).over(Window.partitionBy(group).orderBy(sort))` — which hands
    * each group's ENTIRE membership to one task; with a handful of big
    * sources that is a single-task collapse at lake scale. This
    * implementation instead runs [[GlobalOrder.exclusiveRunningSum]] once
    * over the composite (group, sort...) total order — one range shuffle,
    * fully parallel, driver state = numPartitions longs — and recovers
    * the per-group cumulative sum by subtracting each group's base offset
    * (the sum of all PRECEDING groups' totals, itself a tiny two-phase
    * aggregate prefix-scanned the same scalable way and joined back by
    * group key). Equal to the window form whenever (sortCols) is a total
    * order within each group.
    *
    * `weightCol` must already be LongType (GlobalOrder's contract); null
    * weights add 0 to the running sum but keep `cum` non-null. */
  def budgetSelect(df: DataFrame, groupCol: String, sortCols: Seq[Column],
                   weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val cumExcl = "__graft_cum_excl"
    val outCol = s"cum_$weightCol"
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists; rename it first")
    val ranked = GlobalOrder.exclusiveRunningSum(
      df, col(groupCol) +: sortCols, weightCol, cumExcl)
    val bases = GlobalOrder.exclusiveRunningSum(
      df.groupBy(groupCol).agg(sum(col(weightCol)).as("__grp_total")),
      Seq(col(groupCol)), "__grp_total", "__grp_base")
      .select(col(groupCol), col("__grp_base"))
    // group-count rows only; the hint is advisory — Spark falls back to a
    // shuffle join if the group relation outgrows the broadcast threshold
    ranked.join(broadcast(bases), Seq(groupCol))
      .withColumn(outCol,
        col(cumExcl) - col("__grp_base") + coalesce(col(weightCol), lit(0L)))
      .filter(col(outCol) <= budget)
      .drop(cumExcl, "__grp_base")
  }
}
