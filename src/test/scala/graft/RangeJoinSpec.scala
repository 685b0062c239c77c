package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Banded point-in-interval must equal the naive BETWEEN theta-join and
  * must plan as a hash join, not a nested loop. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = spark.range(0, 500).toDF("pid")
    .select($"pid", (($"pid" * 37) % 101).cast("double").as("v"))
  private lazy val intervals = spark.range(0, 60).toDF("iid")
    .select($"iid",
      (($"iid" * 13) % 90).cast("double").as("lo"),
      ((($"iid" * 13) % 90) + ($"iid" % 7)).cast("double").as("hi"))

  test("equals the naive BETWEEN join, at several bucket widths") {
    val naive = points.join(intervals, $"v".between($"lo", $"hi"))
      .select("pid", "iid").orderBy("pid", "iid").collect().toSeq
    assert(naive.nonEmpty)
    for (w <- Seq(0.5, 3.0, 7.0, 1000.0)) {
      val banded = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", w)
        .select("pid", "iid").orderBy("pid", "iid").collect().toSeq
      assert(banded === naive, s"bucketWidth=$w")
    }
  }

  test("null points, null bounds, and inverted intervals match nothing") {
    val p = Seq((1L, Some(5.0)), (2L, None)).toDF("pid", "v")
    val iv = Seq((1L, Some(0.0), Some(10.0)), (2L, None, Some(10.0)),
      (3L, Some(0.0), None), (4L, Some(10.0), Some(0.0))).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "v", iv, "lo", "hi", 2.0)
      .select("pid", "iid").collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Seq((1L, 1L)))
  }

  test("plans as a hash-partitioned join — never a nested loop or cartesian") {
    val plan = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banding failed to produce an equi-join:\n$plan")
  }

  test("auto width equals the naive join, derives w from interval stats, stays equi-join") {
    val naive = points.join(intervals, $"v".between($"lo", $"hi"))
      .select("pid", "iid").orderBy("pid", "iid").collect().toSeq
    val auto = RangeJoin.pointInIntervalAuto(points, "v", intervals, "lo", "hi")
    assert(auto.select("pid", "iid").orderBy("pid", "iid").collect().toSeq === naive)
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"auto banding failed to produce an equi-join:\n$plan")
    // degenerate stats: all zero-width intervals (median width 0) fall
    // back to w=1 and still answer exactly
    val pts = Seq((1L, 5.0), (2L, 7.5)).toDF("pid", "v")
    val zw = Seq((1L, 5.0, 5.0), (2L, 6.0, 6.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInIntervalAuto(pts, "v", zw, "lo", "hi")
      .select("pid", "iid").collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Seq((1L, 1L)))
    // empty interval side joins nothing rather than failing on null stats
    assert(RangeJoin.pointInIntervalAuto(pts, "v", zw.filter($"iid" < 0L),
      "lo", "hi").count() === 0L)
  }

  test("guards: bad width and colliding schemas are loud") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 0.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "v", points.withColumnRenamed("v", "lo")
        .withColumn("hi", $"lo"), "lo", "hi", 1.0)
    }
  }

  test("non-finite bounds and over-wide intervals raise instead of guessing") {
    def run(iv: org.apache.spark.sql.DataFrame, maxB: Long = 1L << 20) =
      RangeJoin.pointInInterval(points, "v", iv, "lo", "hi", 2.0, maxB).count()
    // an open-ended band would need Long.MaxValue buckets
    val inf = Seq((1L, 0.0, Double.PositiveInfinity)).toDF("iid", "lo", "hi")
    val eInf = intercept[Exception] { run(inf) }
    assert(eInf.getMessage.contains("non-finite hi"), eInf.getMessage)
    // NaN hi would qualify rows under Spark's NaN-is-greatest ordering
    val nan = Seq((1L, 0.0, Double.NaN)).toDF("iid", "lo", "hi")
    val eNan = intercept[Exception] { run(nan) }
    assert(eNan.getMessage.contains("non-finite hi"), eNan.getMessage)
    // finite but wider than the expansion budget
    val wide = Seq((1L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val eWide = intercept[Exception] { run(wide, maxB = 1000L) }
    assert(eWide.getMessage.contains("increase bucketWidth"), eWide.getMessage)
  }
}
