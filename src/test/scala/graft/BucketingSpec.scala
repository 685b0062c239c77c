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

/** Salted join / aggregation equal their unsalted counterparts. */
class SkewSpec extends SparkSpec {
  import graft.operators.Skew

  test("salted join == plain join (hot-key fact table)") {
    import spark.implicits._
    // fact: 10k rows, 90% on key 1 (hot); dim: 5 keys
    val fact = spark.range(10000).select($"id",
      when($"id" % 10 < 9, 1L).otherwise($"id" % 5).as("k"))
    val dim = spark.range(5).select($"id".as("dk"), concat(lit("v"), $"id").as("payload"))
    val plain = fact.join(dim, $"k" === $"dk").groupBy("payload")
      .count().orderBy("payload").collect().map(r => (r.getString(0), r.getLong(1)))
    val saltedJ = Skew.saltedJoin(fact, dim, "k", "dk", "id", k = 8)
      .groupBy("payload").count().orderBy("payload")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(saltedJ.toSeq === plain.toSeq)
  }

  test("salted two-phase aggregation == direct aggregation") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = Skew.saltedCountSum(ev, "event_type", "value", "event_id", k = 8)
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq === direct.toSeq)
  }
}

/** Guard-rail coverage for the review findings on Skew. */
class SkewGuardSpec extends SparkSpec {
  import graft.operators.Skew
  import spark.implicits._

  test("unsafe join types, k<=0, and _salt collisions are rejected") {
    val fact = Seq((1L, 1L)).toDF("id", "k")
    val dim = Seq((1L, "v")).toDF("dk", "payload")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", "dk", "id", 8, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", "dk", "id", 0)
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact.withColumn("__graft_salt", lit(1)), dim, "k", "dk", "id", 8)
    }
    // left_outer (fact-preserving) IS allowed and keeps unmatched fact rows once
    val f2 = Seq((1L, 1L), (2L, 99L)).toDF("id", "k")
    val lo = Skew.saltedJoin(f2, dim, "k", "dk", "id", 4, joinType = "left_outer")
    assert(lo.count() === 2)
    assert(lo.filter($"payload".isNull).count() === 1)
  }
}
