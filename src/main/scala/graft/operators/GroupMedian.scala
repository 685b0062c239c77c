package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group (weighted) lower medians at any group size.
  *
  * The obvious form — a running-sum window PARTITIONED BY the group —
  * is only scale-safe while every group fits one task: with a
  * low-cardinality group key (order status, return flag: 3 values) the
  * window funnels a third of the TABLE through each of three tasks,
  * the same cliff the partition-less-window rule exists for, just one
  * notch up. This operator keeps the semantics and fixes the shape:
  * ONE GlobalOrder range-partitioned prefix scan over the composite
  * (group, value, ties) order yields global cumulative weights; the
  * per-group cumulative is then the global one minus the group's
  * starting offset, where the offsets come from a second prefix scan
  * over the GROUP-DOMAIN-bounded totals relation (broadcast back).
  * Parallelism is the range partitioning — independent of how few
  * groups there are.
  *
  * "Lower median" = the smallest value whose in-group cumulative
  * weight w satisfies 2w >= total — integer-exact, no interpolation,
  * the same contract as the 2*cum >= tot SQL idiom it replaces. */
object GroupMedian {

  /** Per-group weighted lower median of `valueCol` (LongType), weights
    * in `weightCol` (LongType, must be positive). `tieCols` must make
    * the composite (group, value, ties) order TOTAL — equal weights on
    * tied rows make the median itself deterministic regardless, but a
    * total order keeps the two GlobalOrder jobs replay-identical.
    * Returns one row per group: (groupCol, outCol). */
  def weightedLowerMedian(df: DataFrame, groupCol: String, valueCol: String,
                          weightCol: String, tieCols: Seq[Column],
                          outCol: String): DataFrame =
    weightedLowerQuantile(df, groupCol, valueCol, weightCol, tieCols, outCol, 1, 2)

  /** Per-group weighted lower p-quantile for p = pNum/pDen: the
    * smallest value whose in-group cumulative weight w satisfies
    * w * pDen >= total * pNum — all-integer (nearest-rank, no
    * interpolation); median is p = 1/2, p90 is 9/10. With `keepTotal`
    * the group's weight total rides along as `_gm_tot` — callers that
    * also need the group count/weight then skip a whole second pass
    * over `df` (round 16: q281/q292 re-ran their pairwise joins just to
    * COUNT the pairs the scan had already weighed). */
  def weightedLowerQuantile(df: DataFrame, groupCol: String, valueCol: String,
                            weightCol: String, tieCols: Seq[Column],
                            outCol: String, pNum: Int, pDen: Int,
                            keepTotal: Boolean = false): DataFrame =
    weightedLowerQuantiles(df, groupCol, valueCol, weightCol, tieCols,
      Seq((outCol, pNum, pDen)), keepTotal)

  /** Several nearest-rank quantiles of ONE value column off a SINGLE
    * prefix scan: the cumulative-weight relation is computed once and
    * each requested (outCol, pNum, pDen) becomes one conditional-min
    * aggregate over it — asking for median + p90 costs the same two
    * GlobalOrder jobs as asking for either alone. */
  def weightedLowerQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                             weightCol: String, tieCols: Seq[Column],
                             quantiles: Seq[(String, Int, Int)],
                             keepTotal: Boolean = false): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (name, n, dd) =>
      require(n > 0 && n <= dd, s"quantile $name = $n/$dd outside (0, 1]")
    }
    val cum = GroupPrefix.exclusiveRunningSum(df, groupCol,
      col(valueCol) +: tieCols, weightCol, "_gm_cum", keepTotals = true)
    val aggs = quantiles.map { case (name, pNum, pDen) =>
      min(when((col("_gm_cum") + col(weightCol)) * pDen >= col("_gp_tot") * pNum,
        col(valueCol))).as(name)
    } ++ (if (keepTotal) Seq(max(col("_gp_tot")).as("_gm_tot")) else Nil)
    cum.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }

  /** Unweighted per-group lower median (each row weighs 1). */
  def lowerMedian(df: DataFrame, groupCol: String, valueCol: String,
                  tieCols: Seq[Column], outCol: String): DataFrame = {
    val withW = df.withColumn("_gm_w", lit(1L))
    weightedLowerMedian(withW, groupCol, valueCol, "_gm_w", tieCols, outCol)
  }
}
