package graft

import org.apache.spark.sql.functions._

/** Round-8 eleventh batch: quartile-membership bounds, the
  * Gini/Lorenz consistency identity, and dispersion accounting. */
class Round8kSpec extends SparkSpec {
  import spark.implicits._

  test("q285: upper-quartile membership is between 1/4 and the tie-inflated bound") {
    val rows = Queries.queryMap("q285_upper_quartile_segment")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, _, upper) =>
      // nearest-rank p75: at least ceil(n/4) customers sit at or above
      assert(upper >= (n + 3) / 4, s"upper $upper below ceil(n/4) of $n")
      assert(upper <= n)
    }
  }

  test("q286: Gini is consistent with the q271 Lorenz curve and bounded") {
    val (n, s, gini) = Queries.queryMap("q286_revenue_gini")(spark, sf0001)
      .as[(Long, Long, Double)].first()
    assert(n > 0 && s > 0)
    assert(gini >= 0.0 && gini <= 1.0)
    // driver recompute via the rank formula
    val cents = graft.sources.Tables.orders(spark, sf0001)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .select(col("c").cast("long")).as[Long].collect().sorted
    val rs = cents.zipWithIndex.map { case (c, i) => (i + 1).toDouble * c }.sum
    val expected = 2.0 * rs / (cents.length.toDouble * cents.sum.toDouble) -
      (cents.length + 1.0) / cents.length
    assert(math.abs(gini - expected) < 1e-6)
  }

  test("q287: histogram partitions orders and the dispersion matches the sums") {
    val rows = Queries.queryMap("q287_order_fanout")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    val nTotal = rows.head._3
    assert(rows.map(_._2).sum === nTotal)
    val lineCount = graft.sources.Tables.lineitem(spark, sf0001).count()
    assert(rows.map(r => r._1 * r._2).sum === lineCount,
      "k-weighted histogram must account for every lineitem")
    val nOrders = graft.sources.Tables.lineitem(spark, sf0001)
      .select("l_orderkey").distinct().count()
    assert(nTotal === nOrders)
  }
}
