package graft

/** Plan-shape assertions for the round-5 corpus-statistics queries: the
  * properties that keep them viable at 100 TB — map-side combine before
  * every token shuffle, broadcast for the 1-row corpus totals, and the
  * contamination semi-join never becoming a nested loop. */
class Round5PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    Queries.inventory.find(_.name == name).get
      .run(spark, sf0001).queryExecution.executedPlan.toString
  }

  test("q144 LM score: partial aggregation before both shuffles; totals broadcast") {
    val p = plan("q144_unigram_lm_score")
    // vocab count and per-doc sum must both map-side combine
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) >= 0,
      s"expected partial+final aggregate pairs:\n$p")
    assert(p.contains("BroadcastExchange"), s"corpus totals not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in LM score plan:\n$p")
  }

  test("q145 TF-IDF: no cartesian; D broadcast; window partitioned by doc") {
    val p = plan("q145_tfidf_topterms")
    assert(p.contains("BroadcastExchange"), s"D not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in tf-idf plan:\n$p")
    assert(p.contains("Window"), "expected per-doc ranking window")
  }

  test("q146 contamination: shingle join is a hash join, never a nested loop") {
    val p = plan("q146_contamination")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi hash join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"contamination check degenerated to a loop join:\n$p")
  }

  test("q152 triangles: wedge closure stays equi-join (no cartesian/loop join)") {
    val p = plan("q152_triangle_count")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle counting degenerated to a loop join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 not TakeOrdered:\n$p")
  }

  test("q154 cohorts: distinct-count aggregation is partial before the shuffle") {
    val p = plan("q154_retention_cohorts")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) >= 0,
      s"expected partial+final aggregate pair:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in cohort plan:\n$p")
  }
}
