package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalOrder

/** GlobalOrder (range-partitioned prefix scan) must agree with the
  * single-partition window forms it replaces — including across forced
  * partition boundaries, under k > n NTILE, null weights, and emptiness. */
class GlobalOrderSpec extends SparkSpec {

  // 101 rows over 7 partitions: boundaries fall mid-stream, several
  // partitions are multi-row, values include 0 and nulls.
  private lazy val base = spark.range(101).toDF("id")
    .select(col("id"),
      when(col("id") % 7 === 0, lit(null).cast("long"))
        .otherwise((col("id") * 37) % 11).as("v"))

  test("exclusiveRunningSum matches the window form across partition boundaries") {
    val got = GlobalOrder.exclusiveRunningSum(base, Seq(col("id")), "v", "cum", numPartitions = 7)
    val w = Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)
    val want = base.select(col("id"), coalesce(sum(col("v")).over(w), lit(0L)).as("cum"))
    assert(got.select("id", "cum").orderBy("id").collect().toSeq ===
      want.orderBy("id").collect().toSeq)
    assert(got.rdd.getNumPartitions === 7) // it actually ran distributed
  }

  test("rowNumber matches row_number over a global order, desc with tie-break") {
    val sort = Seq(col("v").desc_nulls_last, col("id"))
    val got = GlobalOrder.rowNumber(base, sort, "rn", numPartitions = 5)
    val want = base.select(col("id"),
      row_number().over(Window.orderBy(sort: _*)).cast("long").as("rn"))
    assert(got.select("id", "rn").orderBy("id").collect().toSeq ===
      want.orderBy("id").collect().toSeq)
  }

  test("ntile matches SQL NTILE for k below, at, and above n") {
    for (k <- Seq(1, 3, 10, 101, 250)) {
      val got = GlobalOrder.ntile(base, k, Seq(col("id")), "t", numPartitions = 6)
      val want = base.select(col("id"),
        ntile(k).over(Window.orderBy(col("id"))).cast("long").as("t"))
      assert(got.select("id", "t").orderBy("id").collect().toSeq ===
        want.orderBy("id").collect().toSeq, s"k=$k")
    }
  }

  test("empty input yields empty output, not a crash") {
    val empty = base.filter(col("id") < 0)
    assert(GlobalOrder.exclusiveRunningSum(empty, Seq(col("id")), "v", "cum").count() === 0L)
    assert(GlobalOrder.ntile(empty, 4, Seq(col("id")), "t").count() === 0L)
  }

  test("guards: non-long value column and output-name collisions are loud") {
    val dbl = base.select(col("id"), col("v").cast("double").as("v"))
    intercept[IllegalArgumentException] {
      GlobalOrder.exclusiveRunningSum(dbl, Seq(col("id")), "v", "cum")
    }
    intercept[IllegalArgumentException] {
      GlobalOrder.rowNumber(base, Seq(col("id")), "v")
    }
    intercept[IllegalArgumentException] {
      GlobalOrder.ntile(base, 0, Seq(col("id")), "t")
    }
  }
}
