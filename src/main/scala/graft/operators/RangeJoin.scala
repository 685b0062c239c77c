package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless point-in-interval joins that hash-partition instead of
  * nested-looping.
  *
  * `points JOIN intervals ON p BETWEEN lo AND hi` has no equi-condition,
  * so Catalyst can only plan BroadcastNestedLoopJoin (when one side fits)
  * or a cartesian product — both dead at large×large scale. The standard
  * fix is bucket banding: quantize the value axis into width-`w` buckets,
  * expand each interval to every bucket it touches, tag each point with
  * its single bucket, equi-join on the bucket id, and re-check the exact
  * BETWEEN. A point lives in exactly ONE bucket, so a qualifying pair
  * meets in exactly one bucket — no dedup pass is needed (unlike
  * interval-interval banding).
  *
  * Cost model: the interval side inflates by `width/w + 1` rows; the join
  * itself becomes an ordinary shuffled hash/sort-merge join on a numeric
  * key. Pick `w` near the TYPICAL interval width — too small explodes the
  * interval side, too large funnels everything into few buckets (skew).
  * Null/NaN/infinite points and null bounds and intervals with lo > hi
  * match nothing (the same rows the BETWEEN they replace rejects) — but a
  * NaN or infinite BOUND raises loudly: banding cannot represent an
  * open-ended interval (floor(inf/w) -> Long.MaxValue buckets), and under
  * Spark's NaN-is-greatest ordering a NaN hi would silently change which
  * rows qualify, so failing beats guessing.
  */
object RangeJoin {

  private val BucketCol = "__rj_bucket"

  /** Pass-through that raises (distributed, at evaluation time) on a
    * non-finite interval bound; nulls pass through to the isNotNull
    * filter. A driver-side require can't see data, so the guard rides the
    * expression tree. */
  private def finiteOrRaise(c: Column, name: String): Column =
    when(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity,
      raise_error(concat(lit(s"RangeJoin: non-finite $name bound: "), c.cast("string"))))
      .otherwise(c)

  /** Inner-join `points` to every interval containing `points(pointCol)`
    * (closed bounds, exactly `BETWEEN lo AND hi`). Output columns are
    * points' ++ intervals'; names must not collide.
    * `maxBucketsPerInterval` bounds the banding blow-up: an interval
    * spanning more buckets raises with a hint to grow `bucketWidth`
    * (default 1M buckets — far past it the expansion IS the problem). */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0 && !bucketWidth.isNaN && !bucketWidth.isInfinite,
      s"bucketWidth must be a positive finite number, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column names collide across sides: $overlap")
    require(!points.columns.contains(BucketCol) && !intervals.columns.contains(BucketCol),
      s"$BucketCol is reserved; rename that input column")
    val w = lit(bucketWidth)
    val p = points.withColumn(BucketCol, floor(col(pointCol) / w).cast("long"))
    val loB = floor(finiteOrRaise(col(loCol), "lo") / w).cast("long")
    val hiB = floor(finiteOrRaise(col(hiCol), "hi") / w).cast("long")
    val span = hiB - loB + 1L
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .withColumn(BucketCol, explode(sequence(loB,
        when(span > maxBucketsPerInterval,
          raise_error(concat(
            lit(s"RangeJoin: interval spans more than $maxBucketsPerInterval buckets ("),
            span.cast("string"),
            lit(s"); increase bucketWidth (=$bucketWidth) or maxBucketsPerInterval"))))
          .otherwise(hiB))))
    p.join(iv, p(BucketCol) === iv(BucketCol) &&
        col(pointCol).between(col(loCol), col(hiCol)), "inner")
      .drop(BucketCol)
  }

  /** [[pointInInterval]] with the bucket width derived from the DATA at
    * plan time instead of guessed by the caller — one tiny aggregation
    * over the interval side (median width via an approximate quantile
    * sketch), then `w = medianWidth / 4`.
    *
    * Why a fraction of the typical width: a candidate pair that fails the
    * exact BETWEEN exists only when the interval overlaps the point's
    * BUCKET but not the point — that waste is LINEAR in `w` — while the
    * interval-side inflation is `width/w + 1` rows per interval, tiny
    * until `w` drops far below the typical width. At w = medW/4 a typical
    * interval expands to ~5 bucket rows (cheap scalars) and the rounding
    * waste is ~1/8 of what w = medW pays; past that the curve is flat.
    * A fixed width is the classic trap this closes: the round-6 testdata
    * regeneration packed the q130 price bands ~10x denser and the
    * unchanged w=100 paid 2.4x the irreducible candidates — adapting at
    * plan time is what survives a data-distribution change. The width
    * affects ONLY the plan: the exact BETWEEN recheck makes any width
    * return identical rows.
    *
    * Degenerate stats fall back loudly sane: all zero-width intervals
    * (lo == hi) make any width exact, so w = 1; an empty interval side
    * joins nothing either way. */
  def pointInIntervalAuto(points: DataFrame, pointCol: String,
                          intervals: DataFrame, loCol: String, hiCol: String,
                          maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    val stats = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .select(percentile_approx(
        finiteOrRaise(col(hiCol), "hi") - finiteOrRaise(col(loCol), "lo"),
        lit(0.5), lit(1000)).as("med_w"))
      .head()
    val medW = if (stats.isNullAt(0)) 0.0 else stats.getDouble(0)
    val w = if (medW > 0.0) medW / 4.0 else 1.0
    pointInInterval(points, pointCol, intervals, loCol, hiCol,
      bucketWidth = w, maxBucketsPerInterval = maxBucketsPerInterval)
  }
}
