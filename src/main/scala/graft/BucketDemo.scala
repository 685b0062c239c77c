package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Dev drive: bucketed co-located join through the public API — the user
  * workflow of paying one shuffle at write time, then joining shuffle-free. */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    Bucketing.writeBucketed(spark.read.parquet(s"$d/orders.parquet"),
      "demo_orders_b", Seq("o_orderkey"), 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(spark.read.parquet(s"$d/lineitem.parquet"),
      "demo_lineitem_b", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = Bucketing.table(spark, "demo_lineitem_b")
      .join(Bucketing.table(spark, "demo_orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
    val plan = joined.queryExecution.executedPlan.toString
    println("plan has bucketed scans: " + plan.contains("SelectedBucketsCount"))
    val smjPart = plan.substring(plan.indexOf("SortMergeJoin"))
    println("join-side shuffles: " +
      (if (smjPart.contains("Exchange hashpartitioning(l_orderkey") ||
           smjPart.contains("Exchange hashpartitioning(o_orderkey")) "PRESENT (bad)" else "none"))
    joined.orderBy("o_orderstatus").show(false)
    spark.sql("DROP TABLE IF EXISTS demo_orders_b")
    spark.sql("DROP TABLE IF EXISTS demo_lineitem_b")
    spark.stop()
  }
}
