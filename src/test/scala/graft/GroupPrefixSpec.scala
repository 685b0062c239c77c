package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** GroupPrefix must be a DROP-IN for the group-partitioned window forms
  * it replaces — same numbers, different shape. Pit both operators
  * against the window implementations on seeded random data (many
  * groups, duplicate sort keys resolved by a tie column), and pin the
  * single-scan shape of the expectations row checks. */
class GroupPrefixSpec extends SparkSpec {
  import spark.implicits._

  private def randomRows(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (s"g${rnd.nextInt(6)}", rnd.nextInt(40).toLong,
        1L + rnd.nextInt(9).toLong, i.toLong)
    }
  }

  test("exclusiveRunningSum equals the window form on random data") {
    val df = randomRows(7, 500).toDF("g", "v", "w", "id")
    val got = graft.operators.GroupPrefix
      .exclusiveRunningSum(df, "g", Seq(col("v"), col("id")), "w", "cum")
      .select(col("g"), col("id"), col("cum"))
      .as[(String, Long, Long)].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .select(col("g"), col("id"),
        coalesce(sum("w").over(w), lit(0L)).as("cum"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("rowNumber equals the window form, and keepTotals carries group sizes") {
    val df = randomRows(11, 400).toDF("g", "v", "w", "id")
    val got = graft.operators.GroupPrefix
      .rowNumber(df, "g", Seq(col("v"), col("id")), "rn", keepTotals = true)
      .select(col("g"), col("id"), col("rn"), col("_gp_tot"))
      .as[(String, Long, Long, Long)].collect()
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val expected = df
      .select(col("g"), col("id"), row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy("g")).as("n"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got.toSet === expected)
  }

  test("a high-cardinality group key fails LOUD, not a driver OOM") {
    // the driver-side offsets collect is bounded: violating the
    // low-cardinality contract must surface the contract, not pull an
    // unbounded relation onto the driver (round-16 verdict #7)
    val df = spark.range(100001L)
      .select(concat(lit("g"), $"id").as("g"), lit(1L).as("w"), $"id".as("v"))
    val e = intercept[IllegalArgumentException] {
      graft.operators.GroupPrefix
        .exclusiveRunningSum(df, "g", Seq(col("v")), "w", "cum").count()
    }
    assert(e.getMessage.contains("distinct values"))
  }

  test("a non-Long valueCol fails with the contract, not a ClassCastException") {
    val df = Seq(("a", 1.5, 1L), ("b", 2.5, 2L)).toDF("g", "w", "id")
    val e = intercept[IllegalArgumentException] {
      graft.operators.GroupPrefix
        .exclusiveRunningSum(df, "g", Seq(col("id")), "w", "cum").count()
    }
    assert(e.getMessage.contains("must be LongType"))
  }

  test("Expectations.rowChecks plans ONE scan for many checks") {
    import graft.operators.Expectations
    val df = graft.sources.Tables.lineitem(spark, sf0001)
    val rep = Expectations.rowChecks(df, Seq(
      "a" -> (col("l_quantity") < 0),
      "b" -> (col("l_discount") > 1),
      "c" -> col("l_orderkey").isNull))
    val scans = rep.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("lineitem.parquet"))
    assert(scans === 1, "all row-local checks must share a single scan")
    assert(rep.count() === 3L)
  }
}
