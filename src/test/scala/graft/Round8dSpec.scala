package graft

import org.apache.spark.sql.functions._

/** Round-8 fourth batch: semantics beyond the oracle hashes — the
  * multi-source BFS must equal per-seed single-source searches, the
  * dyadic EWMA must be the exact weighted mean it claims, the log2
  * histogram's median bucket must BRACKET the exact median, and the
  * seasonality shares must be a floor-rounded partition of unity. */
class Round8dSpec extends SparkSpec {
  import spark.implicits._

  test("q257: joint frontier equals per-seed single-source BFS on sf0.001") {
    val got = Queries.queryMap("q257_harmonic_centrality")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // driver-side reference: adjacency map + per-seed 3-level BFS
    val e0 = AnalyticsQueries.fulfillmentEdges(spark, sf0001)
      .select(col("src"), col("dst")).as[(Long, Long)].collect()
    val adj = (e0 ++ e0.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    got.keys.foreach { seed =>
      var visited = Set(seed)
      var frontier = Set(seed)
      val sizes = (1 to 3).map { _ =>
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited
        visited ++= next
        frontier = next
        next.size.toLong
      }
      val (_, n1, n2, n3, harm6) = got(seed)
      assert((n1, n2, n3) === ((sizes(0), sizes(1), sizes(2))), s"seed $seed levels")
      assert(harm6 === 6 * n1 + 3 * n2 + 2 * n3, s"seed $seed harmonic identity")
    }
  }

  test("q258: EWMA is the exact dyadic weighted mean of the recent window") {
    val rows = Queries.queryMap("q258_user_ewma")(spark, sf0001)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nRecent, num, den, ewma) =>
      assert(nRecent >= 1L && nRecent <= 20L)
      // denominator is a sum of distinct powers of two: 2^19 + ... down
      // to 2^(20-nRecent) = 2^20 - 2^(20-nRecent)
      assert(den === (1L << 20) - (1L << (20 - nRecent.toInt)))
      assert(math.abs(ewma - math.round(num.toDouble / den.toDouble / 100 * 1e4) / 1e4) < 1e-9)
    }
    // exact recompute for the smallest user id
    val u0 = rows.minBy(_._1)._1
    val recent = graft.sources.Tables.events(spark, sf0001)
      .filter(col("user_id") === u0)
      .orderBy(col("ts").desc, col("event_id").desc)
      .select(round(col("value") * 100).cast("long")).as[Long].collect().take(20)
    val expNum = recent.zipWithIndex.map { case (c, i) => c * (1L << (19 - i)) }.sum
    assert(rows.find(_._1 == u0).get._3 === expNum)
  }

  test("q259: shares floor-partition ppm and slots stay in the hour-of-week domain") {
    val rows = Queries.queryMap("q259_hour_of_week")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 168)
    rows.foreach { case (dow, hr, n, cents, avg, _) =>
      assert(dow >= 1L && dow <= 7L && hr >= 0L && hr <= 23L)
      assert(avg === cents / n)
    }
    val shareSum = rows.map(_._6).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length,
      s"floor-rounded shares must sum to within one ulp per slot, got $shareSum")
  }

  test("q260: cells partition the embedding set exactly") {
    val rows = Queries.queryMap("q260_grid_density_cores")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    val total = graft.sources.Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_._3).sum === total)
    rows.foreach { case (_, _, n, core) =>
      assert(core === (if (n >= 5) 1L else 0L))
    }
  }

  test("q261: the median bucket brackets the exact median") {
    val rows = Queries.queryMap("q261_log2_histogram")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    val byType = graft.sources.Tables.events(spark, sf0001)
      .filter(col("value") > 0)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { case (t, _, nValues, medBucket, medLo) =>
      val vals = byType(t).map(_._2).sorted
      assert(nValues === vals.length.toLong)
      // exact lower median (smallest x with 2*rank >= n)
      val med = vals(((vals.length + 1) / 2) - 1)
      assert(medLo === (1L << (medBucket.toInt - 1)))
      assert(med >= medLo && med < 2 * medLo,
        s"$t: exact median $med outside bucket [$medLo, ${2 * medLo})")
    }
  }

  test("q262: skew identities hold and the hottest key beats the mean") {
    val rows = Queries.queryMap("q262_key_skew_report")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 3)
    rows.foreach { case (_, nRows, nKeys, maxRows, skew, top1) =>
      assert(nKeys <= nRows)
      assert(maxRows * nKeys >= nRows, "max >= mean implies skew_e6 >= 1e6 pre-floor")
      assert(skew === maxRows * nKeys * 1000000L / nRows)
      assert(top1 === maxRows * 1000000L / nRows)
    }
  }
}
