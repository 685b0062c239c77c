package graft

import org.apache.spark.sql.functions._

/** Round-8 fourteenth batch: signed-rank conservation, Benford
  * accounting, and Spearman's agreement with a driver-side rank
  * recompute. */
class Round8nSpec extends SparkSpec {
  import spark.implicits._

  test("q295: W+ and W- conserve n(n+1) and match a driver recompute") {
    val (n, wp2, wm2) = Queries.queryMap("q295_wilcoxon_signed_rank")(spark, sf0001)
      .as[(Long, Long, Long)].first()
    assert(wp2 + wm2 === n * (n + 1), "signed-rank conservation")
    assert(wp2 >= 0 && wm2 >= 0)
    // driver recompute: diffs, midranks over |diff|, doubled W+
    val pv = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .as[(Long, Long, Long, Long)].collect()
    val diffs = pv.groupBy(_._1).values.filter(_.length > 1).map { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.last._4 - sorted.head._4
    }.filter(_ != 0L).toSeq
    assert(n === diffs.length.toLong)
    val sortedAbs = diffs.map(math.abs).sorted
    val rank2 = sortedAbs.distinct.map { v =>
      v -> (sortedAbs.indexOf(v) + 1 + sortedAbs.lastIndexOf(v) + 1).toLong
    }.toMap
    val expWp2 = diffs.filter(_ > 0).map(dd => rank2(math.abs(dd))).sum
    assert(wp2 === expWp2)
  }

  test("q296: Benford rows account for every order and expectations sum to ~1e6") {
    val rows = Queries.queryMap("q296_benford_gate")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq.sorted === (1L to 9L))
    val total = graft.sources.Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 0).count()
    assert(rows.map(_._2).sum === total)
    val expSum = rows.map(_._4).sum
    assert(expSum > 999990L && expSum <= 1000000L,
      s"Benford ppm literals must sum to ~1e6, got $expSum")
    rows.foreach { case (_, _, obs, exp, dev) => assert(dev === obs - exp) }
  }

  test("q297: Spearman matches Pearson over driver-computed midranks") {
    val (n, rho) = Queries.queryMap("q297_spearman_rho")(spark, sf0001)
      .as[(Long, Double)].first()
    assert(rho >= -1.0 && rho <= 1.0)
    val v = graft.sources.Tables.documents(spark, sf0001)
      .select(col("n_chars").cast("long"),
        size(graft.operators.TextAnalysis.tokens(col("text"))).cast("long"))
      .as[(Long, Long)].collect()
    assert(n === v.length.toLong)
    def rank2(xs: Seq[Long]): Map[Long, Double] = {
      val sorted = xs.sorted
      sorted.distinct.map { x =>
        x -> (sorted.indexOf(x) + 1 + sorted.lastIndexOf(x) + 1).toDouble
      }.toMap
    }
    val rx = rank2(v.map(_._1)); val ry = rank2(v.map(_._2))
    val pairs = v.map { case (x, y) => (rx(x), ry(y)) }
    val nn = pairs.length.toDouble
    val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
    val sab = pairs.map(p => p._1 * p._2).sum
    val saa = pairs.map(p => p._1 * p._1).sum
    val sbb = pairs.map(p => p._2 * p._2).sum
    val expected = (nn * sab - sa * sb) /
      (math.sqrt(nn * saa - sa * sa) * math.sqrt(nn * sbb - sb * sb))
    assert(math.abs(rho - expected) < 1e-6)
    // sanity anchor: tokens ~ affine in chars, so rho is near +1
    assert(rho > 0.9)
  }
}
