package graft

import org.apache.spark.sql.functions._
import graft.operators.Triangles

/** Triangle counting: brute-force equality on random graphs, exactly-once
  * closure (no multiset corrections), and partition invariance. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def bruteTriangles(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = und.map(_._1).toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  test("per-node counts match brute force on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }.toSet
    val df = edges.toSeq.toDF("src", "dst")
    val got = Triangles.perNode(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === bruteTriangles(edges.map { case (a, b) =>
      (math.min(a, b), math.max(a, b)) }))
  }

  test("multi-edges, self-loops, and both directions collapse to one edge") {
    val df = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val got = Triangles.perNode(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("partition-invariant") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    def run(parts: Int) = Triangles.perNode(df.repartition(parts), "src", "dst")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(1) === run(13))
  }
}
