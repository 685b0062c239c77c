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

  test("redistribute: hand-computed dangling shares") {
    // D = rank(c); share = floor(85*D/(100*3)) added to every node.
    // iter1: share = floor(85e6/300) = 283333
    //   a = 150000 + 850000 + 283333 = 1283333; b = c = 858333
    // iter2: D = 858333 -> share = floor(72958305/300) = 243194
    //   a = 150000 + floor(858333*85/100) + 243194 = 1122777
    //   b = c = 150000 + floor(1283333*85/200) + 243194 = 938610
    val got = PageRank.fixedPoint(edges, "src", "dst", 2, redistributeDangling = true)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 1122777L), (2L, 938610L), (3L, 938610L)))
  }

  test("redistribute conserves total rank mass up to floor losses") {
    // each iteration floors once per edge and once per node, each losing
    // < 1 scaled unit; absorbed-into-carried losses only shrink (x0.85),
    // so after k iterations: N*Scale - k*(E + N) <= total <= N*Scale
    val e = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"), (lit(1000000L) + col("o_custkey")).as("dst"))
    val nNodes = e.select(col("src").as("n")).union(e.select(col("dst").as("n")))
      .distinct().count()
    val nEdges = e.distinct().count()
    for (k <- Seq(1, 3)) {
      val total = PageRank.fixedPoint(e, "src", "dst", k, redistributeDangling = true)
        .agg(sum(col("rank"))).head.getLong(0)
      val ideal = nNodes * PageRank.Scale
      assert(total <= ideal, s"mass created at k=$k: $total > $ideal")
      assert(total >= ideal - k * (nEdges + nNodes),
        s"mass lost beyond floor bound at k=$k: $total vs $ideal")
    }
    // the absorb default, by contrast, genuinely loses the dangling mass
    val absorbed = PageRank.fixedPoint(e, "src", "dst", 3)
      .agg(sum(col("rank"))).head.getLong(0)
    assert(absorbed < (nNodes * PageRank.Scale * 9) / 10,
      "absorb variant unexpectedly conserved mass — fixture has no danglings?")
  }

  test("redistribute is a no-op on a graph with no dangling nodes") {
    import spark.implicits._
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    def run(redist: Boolean) =
      PageRank.fixedPoint(cycle, "src", "dst", 3, redistributeDangling = redist)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(true) === run(false))
  }

  test("equal weights reduce exactly to the unweighted iteration") {
    import spark.implicits._
    val e = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"), (lit(1000000L) + col("o_custkey")).as("dst"))
      .distinct()
    val weighted = PageRank.fixedPointWeighted(
        e.withColumn("w", lit(1L)), "src", "dst", "w", 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val plain = PageRank.fixedPoint(e, "src", "dst", 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(weighted === plain)
  }

  test("weighted: multi-edge weights sum; heavier edges carry more rank") {
    import spark.implicits._
    // a -> b (w=3), a -> c (w=1): b gets floor(3/4), c floor(1/4) of a's flow
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val got = PageRank.fixedPointWeighted(e, "src", "dst", "w", 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    // a: base only. b: 150000 + floor(1e6*85*3/400) = 150000+637500
    // c: 150000 + floor(1e6*85*1/400) = 150000+212500
    assert(got.toSeq === Seq((1L, 150000L), (2L, 787500L), (3L, 362500L)))
  }

  test("duplicate edges collapse (edge set, not multiset)") {
    import spark.implicits._
    val dup = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val a = PageRank.fixedPoint(dup, "src", "dst", 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === Seq((1L, 638750L), (2L, 421468L), (3L, 421468L)))
  }
}
