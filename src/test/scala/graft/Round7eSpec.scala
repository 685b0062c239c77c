package graft

import org.apache.spark.sql.functions._

/** Sanity and plan contracts for the q224–q233 block that the oracle
  * hash alone can't pin: quantile-form equivalence, no partition-less
  * windows on the scalable paths, metric ranges, and cross-query
  * consistency of the dedup-reduction report. */
class Round7eSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q225 global quantiles == Spark's exact percentile, no global window") {
    val df = Queries.queryMap("q225_global_quantiles")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "the GlobalOrder quantile path must not plan a window")
    val r = df.head()
    val exact = graft.sources.Tables.documents(spark, sf)
      .agg(expr("percentile(n_chars, 0.5)"), expr("percentile(n_chars, 0.9)"))
      .head()
    assert(r.getDouble(1) === math.round(exact.getDouble(0) * 1e4) / 1e4)
    assert(r.getDouble(2) === math.round(exact.getDouble(1) * 1e4) / 1e4)
  }

  test("q228 coverage curve is monotone and bounded") {
    val rows = Queries.queryMap("q228_vocab_coverage_curve")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    val cov = rows.map(_.getDouble(2))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage must be monotone")
    assert(cov.forall(c => c > 0.0 && c <= 1.0))
    val cum = rows.map(_.getLong(1))
    assert(cum.zip(cum.tail).forall { case (a, b) => a < b })
  }

  test("q230 drift cosines are in [-1, 1] and cover every label") {
    val rows = Queries.queryMap("q230_centroid_drift")(spark, sf).collect()
    val nLabels = graft.sources.Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    assert(rows.length.toLong === nLabels)
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= -1.0001 && c <= 1.0001, s"cosine out of range: $r")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0, s"parity split empty: $r")
    }
  }

  test("q232 packing efficiency is consistent with the q123 bins") {
    val eff = Queries.queryMap("q232_packing_efficiency")(spark, sf).head()
    val bins = Queries.queryMap("q123_sequence_packing")(spark, sf).collect()
    assert(eff.getLong(0) === bins.length.toLong)
    assert(eff.getLong(1) === bins.map(_.getLong(2)).sum)
    val fill = eff.getDouble(4)
    assert(fill > 0.5 && fill < 1.5, s"mean fill out of plausible range: $fill")
  }

  test("q233 reduction report agrees with the cluster relation") {
    val rep = Queries.queryMap("q233_dedup_reduction")(spark, sf).collect()
    val cl = ExtendedQueries.cachedDupClusters(spark, sf)
    val members = cl.count()
    val clusters = cl.select("cluster_id").distinct().count()
    assert(rep.map(_.getLong(2)).sum === members - clusters,
      "total dropped must equal members minus one survivor per cluster")
    rep.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), s"kept tokens exceed total: $r")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("q214 personalized ranks never exceed their q139 uniform counterparts' scale") {
    // seeds-only teleport mass is a fraction of the uniform one: the
    // total personalized mass must be far below the uniform total
    val ppr = Queries.queryMap("q214_personalized_pagerank")(spark, sf)
      .agg(sum("rank")).head().getLong(0)
    val upr = graft.operators.PageRank.fixedPoint(
        AnalyticsQueries.fulfillmentGraph(spark, sf), iterations = 3,
        redistributeDangling = false)
      .agg(sum("rank")).head().getLong(0)
    assert(ppr < upr, s"personalized total mass $ppr must be below uniform $upr")
  }
}
