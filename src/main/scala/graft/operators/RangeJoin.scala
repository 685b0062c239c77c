package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Rows with null/NaN points or null bounds, and intervals with lo > hi,
  * match nothing (same as the BETWEEN they replace).
  */
object RangeJoin {

  private val BucketCol = "__rj_bucket"

  /** Inner-join `points` to every interval containing `points(pointCol)`
    * (closed bounds, exactly `BETWEEN lo AND hi`). Output columns are
    * points' ++ intervals'; names must not collide. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0 && !bucketWidth.isNaN && !bucketWidth.isInfinite,
      s"bucketWidth must be a positive finite number, got $bucketWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column names collide across sides: $overlap")
    require(!points.columns.contains(BucketCol) && !intervals.columns.contains(BucketCol),
      s"$BucketCol is reserved; rename that input column")
    val w = lit(bucketWidth)
    val p = points.withColumn(BucketCol, floor(col(pointCol) / w).cast("long"))
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .withColumn(BucketCol, explode(sequence(
        floor(col(loCol) / w).cast("long"), floor(col(hiCol) / w).cast("long"))))
    p.join(iv, p(BucketCol) === iv(BucketCol) &&
        col(pointCol).between(col(loCol), col(hiCol)), "inner")
      .drop(BucketCol)
  }
}
