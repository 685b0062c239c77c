package graft

import org.apache.spark.sql.functions._

/** Round-8 twelfth batch: balance-audit identities and HHI bounds. */
class Round8lSpec extends SparkSpec {
  import spark.implicits._

  test("q288: balance identities hold and chi2 is zero for a uniform table") {
    val (k, n, mn, mx, imb, chi2) =
      Queries.queryMap("q288_label_balance")(spark, sf0001)
        .as[(Long, Long, Long, Long, Long, Double)].first()
    assert(mn <= mx && mn > 0)
    assert(imb === mx * 1000000L / mn)
    assert(chi2 >= 0.0)
    val counts = graft.sources.Tables.embeddings(spark, sf0001)
      .groupBy("label").count().as[(Int, Long)].collect()
    assert(k === counts.length.toLong && n === counts.map(_._2).sum)
    assert(mx === counts.map(_._2).max && mn === counts.map(_._2).min)
    // degenerate: perfectly uniform classes give chi2 = 0 exactly
    val u = Seq.tabulate(12)(i => (i % 3, i)).toDF("lbl", "id")
      .groupBy("lbl").agg(count(lit(1)).cast("long").as("cn"))
      .agg(sum(col("cn") * 3 - lit(12L)).as("dev")).as[Long].first()
    assert(u === 0L)
  }

  test("q289: HHI is bounded by [1/n_sup, 1] and matches a driver recompute") {
    val rows = Queries.queryMap("q289_brand_hhi")(spark, sf0001)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nSup, _, hhi) =>
      assert(hhi >= 1.0 / nSup - 1e-9 && hhi <= 1.0 + 1e-9)
    }
    // recompute one brand exactly
    val (brand, _, tot, hhi) = rows.head
    val cents = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.part(spark, sf0001),
        col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === brand)
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("c"))
      .select(col("c").cast("long")).as[Long].collect()
    assert(tot === cents.sum)
    val expected = cents.map { c =>
      val sh = c.toDouble / tot.toDouble; sh * sh
    }.sum
    assert(math.abs(hhi - expected) < 1e-6)
  }

  test("q290: the ladder is monotone and consistent with q269's totals") {
    val (n, h1, h24, d7, ever, rate) =
      Queries.queryMap("q290_conversion_ladder")(spark, sf0001)
        .as[(Long, Long, Long, Long, Long, Long)].first()
    assert(h1 <= h24 && h24 <= d7 && d7 <= ever && ever <= n)
    assert(rate === d7 * 1000000L / n)
    val q269 = Queries.queryMap("q269_conversion_latency")(spark, sf0001)
      .as[(String, Long, Long, Option[Long])].collect()
    assert(n === q269.map(_._2).sum, "same signup population as q269")
    assert(ever === q269.map(_._3).sum, "same ever-converted count as q269")
  }

  test("q291: the baseline accuracy is the modal transition share") {
    val rows = Queries.queryMap("q291_transition_baseline")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, tn, bn, acc) =>
      assert(bn <= tn)
      assert(acc === bn * 1000000L / tn)
      // modal share is at least 1/|successor types| (5 types here)
      assert(acc >= 1000000L / 5 - 1)
    }
    // transitions must total events minus one per active user
    val perUser = graft.sources.Tables.events(spark, sf0001)
      .groupBy("user_id").count().as[(Long, Long)].collect()
    assert(rows.map(_._2).sum === perUser.map(_._2 - 1).sum)
  }
}
