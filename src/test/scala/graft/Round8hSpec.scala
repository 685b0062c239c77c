package graft

import org.apache.spark.sql.functions._

/** Round-8 eighth batch: trending-term conservation, degree-histogram
  * accounting, and aging-quantile ordering. */
class Round8hSpec extends SparkSpec {
  import spark.implicits._

  test("q278: ppm frequencies are exact floors and deltas are consistent") {
    val rows = Queries.queryMap("q278_trending_terms")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, f1, f2, delta) =>
      assert(delta === f2 - f1)
      assert(f1 >= 0L && f1 <= 1000000L && f2 >= 0L && f2 <= 1000000L)
    }
    // top-10 by growth must be sorted non-increasing
    rows.map(_._6).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b); case _ =>
    }
  }

  test("q279: degree histogram accounts for every document") {
    val rows = Queries.queryMap("q279_dup_graph_degrees")(spark, sf0001)
      .as[(Long, Long)].collect()
    val total = graft.sources.Tables.documents(spark, sf0001).count()
    assert(rows.map(_._2).sum === total, "histogram must partition the corpus")
    assert(rows.map(_._1).distinct.length === rows.length, "one row per degree")
    // handshake: sum(degree * count) = 2 * |pairs|
    val pairs = graft.operators.Dedup.jaccardFromStats(
      TrainingQueries.cachedPairStats(spark, sf0001), 0.8).count()
    assert(rows.map(r => r._1 * r._2).sum === 2 * pairs)
  }

  test("q280: aging quantiles are ordered and the anchor is data-derived") {
    val rows = Queries.queryMap("q280_pending_order_aging")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, med, p90) =>
      assert(n > 0L)
      assert(med >= 0L && p90 >= med)
    }
    val totalPending = graft.sources.Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "P").count()
    assert(rows.map(_._2).sum === totalPending)
  }
}
