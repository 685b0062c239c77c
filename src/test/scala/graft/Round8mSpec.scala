package graft

import org.apache.spark.sql.functions._

/** Round-8 thirteenth batch: nonparametric identities — the U
  * conservation law, midrank exactness against a driver recompute,
  * tau bounds and its consistency with the Theil-Sen sign. */
class Round8mSpec extends SparkSpec {
  import spark.implicits._

  test("q292: pairwise-difference median matches a driver recompute") {
    val (nPairs, qn) = Queries.queryMap("q292_pairwise_diff_scale")(spark, sf0001)
      .as[(Long, Long)].first()
    val smp = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .orderBy(md5(col("event_id").cast("string")), col("event_id"))
      .limit(200).as[(Long, Long)].collect()
    val diffs = (for {
      a <- smp; b <- smp if a._1 < b._1
    } yield (math.abs(a._2 - b._2), a._1, b._1)).sortBy(x => (x._1, x._2, x._3))
    assert(nPairs === diffs.length.toLong)
    assert(qn === diffs(((diffs.length + 1) / 2) - 1)._1)
  }

  test("q293: U statistics conserve 2*n0*n1 and match a midrank recompute") {
    val (n0, n1, u0x2, u1x2) = Queries.queryMap("q293_mann_whitney_u")(spark, sf0001)
      .as[(Long, Long, Long, Long)].first()
    assert(u0x2 + u1x2 === 2 * n0 * n1, "U conservation law")
    assert(u0x2 >= 0 && u1x2 >= 0)
    // driver-side midrank recompute
    val vals = graft.sources.Tables.documents(spark, sf0001)
      .select(col("n_chars").cast("long"),
        (substring(col("source"), 4, 10).cast("int") % 2))
      .as[(Long, Int)].collect()
    val all = vals.map(_._1).sorted
    // midrank2(v) = 2 * average rank of v's ties = first + last 1-based rank
    val rank2 = all.distinct.map { v =>
      val first = all.indexWhere(_ == v) + 1
      val last = all.lastIndexWhere(_ == v) + 1
      v -> (first + last).toLong
    }.toMap
    val rs2 = vals.filter(_._2 == 0).map(x => rank2(x._1)).sum
    assert(u0x2 === rs2 - n0 * (n0 + 1))
  }

  test("q294: tau-a is bounded, pairs account, and its sign matches Theil-Sen") {
    val (nc, nd, np, tau) = Queries.queryMap("q294_kendall_tau")(spark, sf0001)
      .as[(Long, Long, Long, Long)].first()
    assert(nc + nd <= np, "ties belong to neither direction")
    assert(tau >= -1000000L && tau <= 1000000L)
    assert(tau === (nc - nd) * 1000000L / np)
    val (_, slope) = Queries.queryMap("q281_theil_sen_slope")(spark, sf0001)
      .as[(Long, Long)].first()
    // same sample, same monotone-trend question: the signs agree unless
    // both sit at zero
    if (slope != 0L && tau != 0L)
      assert(slope > 0 === tau > 0, s"tau $tau vs Theil-Sen slope $slope")
  }
}
