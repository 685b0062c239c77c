package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Fixed-point PageRank: hand-computed 3-node fixture, partition
  * invariance (integer sums cannot drift with shuffle order), and rank
  * conservation sanity. q139's DuckDB oracle pins cross-engine
  * agreement on the real graph. */
class PageRankSpec extends SparkSpec {

  // a(1) -> b(2), b -> a, a -> c(3); c dangles.
  // r1: a=1000000, b=c=575000
  // r2: a=638750,  b=c=575000
  // r3: a=638750,  b=c=421468
  private def edges = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
  }

  test("hand-computed 3-node graph, 3 iterations") {
    val got = PageRank.fixedPoint(edges, "src", "dst", 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 638750L), (2L, 421468L), (3L, 421468L)))
  }

  test("iteration 1 matches the closed form") {
    val got = PageRank.fixedPoint(edges, "src", "dst", 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 1000000L), (2L, 575000L), (3L, 575000L)))
  }

  test("partition-invariant on a real graph slice") {
    val e = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"), (lit(1000000L) + col("o_custkey")).as("dst"))
    def run(parts: Int): Seq[(Long, Long)] =
      PageRank.fixedPoint(e.repartition(parts), "src", "dst", 2)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(1) === run(7))
  }

  test("duplicate edges collapse (edge set, not multiset)") {
    import spark.implicits._
    val dup = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val a = PageRank.fixedPoint(dup, "src", "dst", 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === Seq((1L, 638750L), (2L, 421468L), (3L, 421468L)))
  }
}
