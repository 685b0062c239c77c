package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline
import graft.sources.Tables

/** Skyline operator: equivalence with the quadratic NOT EXISTS
  * formulation, partition invariance, and the dominance edge cases the
  * sweep must respect (exact (min,max) ties survive together; a
  * same-price smaller row is dominated). q135's DuckDB oracle pins the
  * cross-engine agreement; these pin the operator's semantics. */
class SkylineSpec extends SparkSpec {

  private def bruteForce(df: org.apache.spark.sql.DataFrame): Set[Long] = {
    val pts = df.select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    pts.filter { case (_, pr1, sz1) =>
      !pts.exists { case (_, pr2, sz2) =>
        pr2 <= pr1 && sz2 >= sz1 && (pr2 < pr1 || sz2 > sz1)
      }
    }.map(_._1).toSet
  }

  test("skyline matches the quadratic formulation on part") {
    val part = Tables.part(spark, sf0001)
    val got = Skyline.skyline2d(part, "p_retailprice", "p_size")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == bruteForce(part))
  }

  test("skyline is partition-invariant") {
    val part = Tables.part(spark, sf0001)
    val a = Skyline.skyline2d(part.repartition(1), "p_retailprice", "p_size")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val b = Skyline.skyline2d(part.repartition(13), "p_retailprice", "p_size")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("NaN measures are excluded, not skyline-corrupting") {
    import spark.implicits._
    // a NaN-priced row must neither survive nor (the old sentinel bug)
    // poison the sweep state so every later row survives unconditionally
    val rows = Seq(
      (1L, 10.0, 5), (2L, Double.NaN, 50), (3L, 10.0, 3), (4L, 20.0, 4)
    ).toDF("p_partkey", "p_retailprice", "p_size")
    val got = Skyline.skyline2d(rows, "p_retailprice", "p_size")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L)) // 3 same-price-smaller, 4 costlier-smaller, 2 NaN
  }

  test("dominance edge cases: ties survive, same-price-smaller is dominated") {
    import spark.implicits._
    // (key, price, size): 1 and 2 tie exactly -> both survive; 3 is
    // same price but smaller -> dominated; 4 cheaper+smaller survives
    // (incomparable with 1/2); 5 costlier and no larger -> dominated.
    val df = Seq(
      (1L, 10.0, 9), (2L, 10.0, 9), (3L, 10.0, 7),
      (4L, 5.0, 3), (5L, 12.0, 9)
    ).toDF("p_partkey", "p_retailprice", "p_size")
    val got = Skyline.skyline2d(df, "p_retailprice", "p_size")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("null measures are excluded, not crashed on") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0), Some(9)), (2L, None, Some(5)), (3L, Some(4.0), None)
    ).toDF("p_partkey", "p_retailprice", "p_size")
    val got = Skyline.skyline2d(df, "p_retailprice", "p_size")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }
}
