package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located join: the plan must contain NO shuffle exchange —
  * the property that makes repeated fact-table joins viable at 100 TB. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs with zero exchanges") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
    Bucketing.writeBucketed(o, "orders_b", Seq("o_orderkey"), 4, Seq("o_orderkey"))
    Bucketing.writeBucketed(l, "lineitem_b", Seq("l_orderkey"), 4, Seq("l_orderkey"))
    // disable auto-broadcast so the join strategy is the bucketed SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.table(spark, "lineitem_b")
        .join(Bucketing.table(spark, "orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle; only the final small agg may
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
        s"lineitem side shuffled despite bucketing:\n$plan")
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"orders side shuffled despite bucketing:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), "bucketed scan not used")
      // and it still computes the right answer
      val viaBuckets = joined.orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getLong(1)))
      val direct = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(viaBuckets.toSeq === direct.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
