package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

/** Dev drive: skew-salting through the public API on real testdata. */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, d)
    val part = Tables.part(spark, d).select(col("p_partkey"), col("p_brand"))

    val plain = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").count().orderBy("p_brand").collect()
    val salted = Skew.saltedJoin(li, part, "l_partkey", "p_partkey",
        "l_orderkey", k = 8)
      .groupBy("p_brand").count().orderBy("p_brand").collect()
    println("salted join == plain join: " +
      (plain.map(r => (r.getString(0), r.getLong(1))).toSeq ==
       salted.map(r => (r.getString(0), r.getLong(1))).toSeq) +
      s" (${plain.length} brands)")

    val agg = Skew.saltedCountSum(Tables.events(spark, d), "event_type", "value", "event_id", 8)
    agg.orderBy("event_type").show(3, false)

    try { Skew.saltedJoin(li, part, "l_partkey", "p_partkey", "l_orderkey", 8, "full_outer") }
    catch { case e: IllegalArgumentException => println("full_outer rejected: " + e.getMessage.take(80)) }
    spark.stop()
  }
}
