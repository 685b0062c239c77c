package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Physical-plan assertions for the scale-critical behaviors (SURVEY §4):
  * these pin the properties that make the declared queries viable at 100 TB
  * — filter/column pushdown into the parquet scan, broadcast joins for
  * small dims, TakeOrderedAndProject for top-k, partial aggregation —
  * so a refactor that silently loses one fails CI, not the cluster. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = {
    // default metadata truncation (100 chars) hides the PushedFilters tail
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    df.queryExecution.executedPlan.toString
  }

  test("Q02 filter + projection push into the parquet scan") {
    val p = plan(Queries.queryMap("q02_filter_project")(spark, sf0001))
    assert(p.contains("PushedFilters:"), "no pushed filters section")
    assert(p.contains("GreaterThan(l_quantity,30.0)"), s"quantity filter not pushed:\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"), "returnflag filter not pushed")
    // column pruning: only the 4 referenced columns are read
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double,l_returnflag:string>"),
      s"scan reads more columns than needed:\n$p")
  }

  test("Q07 small-dim join broadcasts (no shuffle of the fact side)") {
    val p = plan(Queries.queryMap("q07_join_broadcast")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("Q08 multiway join broadcasts the filtered dimension side") {
    val p = plan(Queries.queryMap("q08_join_multiway")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast for customer side:\n$p")
    // the BUILDING predicate reaches the customer scan
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "segment filter not pushed to scan")
  }

  test("Q18 global sort + limit plans as TakeOrderedAndProject (no full sort)") {
    val p = plan(Queries.queryMap("q18_topk")(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$p")
  }

  test("Q10 aggregation is two-phase (map-side partial before the shuffle)") {
    val p = plan(Queries.queryMap("q10_agg_pricing_summary")(spark, sf0001))
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0, s"expected HashAggregate + Exchange:\n$p")
    assert(p.indexOf("HashAggregate", firstAgg + 1) >= 0, "expected partial+final agg pair")
  }

  test("CDC snapshot is a single shuffle with map-side partial max_by") {
    val flat = Queries.queryMap("q27_cdc_transform")(spark, sf0001)
    val p = plan(graft.operators.Cdc.snapshot(
      flat.withColumn("seq_l", col("seq").cast("long")),
      Seq("id", "name"), Seq("ingest_ts", "seq_l"), eventCol = "event"))
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"snapshot should shuffle exactly once:\n$p")
    assert(!p.contains("Window"), "snapshot must not use a window sort")
  }

  test("events scan prunes to referenced columns only") {
    val df = Tables.events(spark, sf0001).select(col("user_id")).distinct()
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<user_id:bigint>"),
      s"events scan did not prune columns:\n$p")
  }

  test("Q73 streams the fact: lineitem never sits under a BroadcastExchange") {
    // Column-pruned static stats under-estimate the fact table enough for
    // Catalyst to broadcast it (measured: BuildRight=lineitem before the
    // fact-first rewrite) — pin the corrected shape.
    val p = plan(Queries.queryMap("q73_tpch_q5")(spark, sf0001))
    val li = p.indexOf("lineitem.parquet")
    val bc = p.indexOf("BroadcastExchange")
    assert(li >= 0 && bc >= 0, s"expected lineitem scan + broadcast dims:\n$p")
    // the streamed side of the outermost join prints before any build
    // side's BroadcastExchange; a broadcast fact would print after one
    assert(li < bc, s"lineitem appears on a broadcast build side:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dim joins:\n$p")
  }

  test("Q124 streams lineitem with both date cutoffs pushed to the scans") {
    val p = plan(Queries.queryMap("q124_tpch_q3")(spark, sf0001))
    val li = p.indexOf("lineitem.parquet")
    val bc = p.indexOf("BroadcastExchange")
    assert(li >= 0 && bc >= 0 && li < bc,
      s"lineitem must stream (build sides broadcast after it):\n$p")
    assert(p.contains("GreaterThan(l_shipdate,"), s"shipdate cutoff not pushed:\n$p")
    assert(p.contains("LessThan(o_orderdate,"), s"orderdate cutoff not pushed:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), s"segment filter not pushed:\n$p")
  }

  test("no declared query plans a partition-less WindowExec") {
    // An unpartitioned window funnels the whole input through ONE task —
    // invisible at sf0.001, fatal at 100 TB. Every global-order need in
    // the suite goes through GlobalOrder's range-partitioned two-pass
    // scan or a broadcast 1-row aggregate instead; pin that invariant
    // over the entire declared inventory so a regression fails CI.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val offenders = Queries.inventory.flatMap { q =>
      val plan = q.run(spark, sf0001).queryExecution.executedPlan
      val inner = plan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      val bad = inner.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (bad.nonEmpty) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"queries with single-task global windows: $offenders")
  }

  test("Q108 pushes the quarter filter and streams lineitem") {
    val p = plan(Queries.queryMap("q108_returned_items")(spark, sf0001))
    val li = p.indexOf("lineitem.parquet")
    val bc = p.indexOf("BroadcastExchange")
    assert(li >= 0 && bc >= 0 && li < bc,
      s"lineitem must stream (build sides broadcast after it):\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"returnflag not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate,"), s"quarter filter not pushed:\n$p")
    // top-20 by revenue must be TakeOrderedAndProject, not a global sort
    assert(p.contains("TakeOrderedAndProject"), s"limit not fused with order:\n$p")
  }
}
