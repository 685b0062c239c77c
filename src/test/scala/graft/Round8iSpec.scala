package graft

import org.apache.spark.sql.functions._

/** Round-8 ninth batch: Theil-Sen robustness, drawdown recompute, and
  * the A/B readout's statistical identities. */
class Round8iSpec extends SparkSpec {
  import spark.implicits._

  test("q281: median pairwise slope matches a driver-side recompute") {
    val (nPairs, medSlope) = Queries.queryMap("q281_theil_sen_slope")(spark, sf0001)
      .as[(Long, Long)].first()
    val smp = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), expr("unix_micros(ts) div 1000000").as("t"),
        round(col("value") * 100).cast("long").as("c"))
      .orderBy(md5(col("event_id").cast("string")), col("event_id"))
      .limit(200)
      .as[(Long, Long, Long)].collect()
    val slopes = for {
      a <- smp; b <- smp if a._2 < b._2
    } yield {
      val num = (b._3 - a._3) * 1000000L; val den = b._2 - a._2
      (num / den, a._1, b._1) // truncation-toward-zero matches div
    }
    assert(nPairs === slopes.length.toLong)
    val sorted = slopes.sortBy(x => (x._1, x._2, x._3))
    assert(medSlope === sorted(((sorted.length + 1) / 2) - 1)._1)
    // robustness: corrupting the largest value changes the least-squares
    // slope but leaves the MEDIAN slope within the pairwise-slope range
    assert(medSlope >= sorted.head._1 && medSlope <= sorted.last._1)
  }

  test("q282: drawdown is the max peak-to-trough drop, nonnegative") {
    val rows = Queries.queryMap("q282_max_drawdown")(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, dd) => assert(dd >= 0L) }
    // exact recompute for the top user
    val (u, expected) = rows.head
    val seq = graft.sources.Tables.events(spark, sf0001)
      .filter(col("user_id") === u)
      .orderBy(col("ts"), col("event_id"))
      .select(round(col("value") * 100).cast("long")).as[Long].collect()
    var peak = Long.MinValue; var dd = 0L
    seq.foreach { c => peak = math.max(peak, c); dd = math.max(dd, peak - c) }
    assert(expected === dd)
  }

  test("q283: rates are exact ppm floors and the z sign follows the rates") {
    val r = Queries.queryMap("q283_ab_readout")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Option[Double])].first()
    val (n0, k0, n1, k1, r0, r1, z) = r
    assert(r0 === k0 * 1000000L / n0)
    assert(r1 === k1 * 1000000L / n1)
    assert(n0 + n1 === graft.sources.Tables.events(spark, sf0001)
      .select("user_id").distinct().count())
    // z defined iff pooled rate is strictly inside (0,1); its sign
    // matches the rate difference
    if (k0 + k1 > 0 && k0 + k1 < n0 + n1) {
      assert(z.isDefined)
      if (k1.toDouble / n1 > k0.toDouble / n0) assert(z.get > 0)
      if (k1.toDouble / n1 < k0.toDouble / n0) assert(z.get < 0)
    }
  }
}
