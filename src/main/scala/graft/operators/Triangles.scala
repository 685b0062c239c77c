package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by the degree-ordered edge-iterator
  * (Latapy's compact-forward / the Cohen MapReduce formulation): orient
  * every undirected edge toward its higher-(degree, id) endpoint, join
  * wedges on the shared LOW vertex, and close each wedge with one lookup
  * in the oriented edge set.
  *
  * Why this shape at scale: a naive wedge join on arbitrary orientation
  * pays Σ deg(v)² — a single celebrity vertex with 1e6 neighbors
  * generates 1e12 wedge rows. Degree-ordering caps every vertex's
  * out-degree at O(√E), so the wedge relation is bounded by O(E^1.5)
  * total (the optimal bound for exact counting), shuffled as three
  * scalar columns. Each triangle {a,b,c} with key order a<b<c exists as
  * oriented edges a→b, a→c, b→c and closes exactly once (the wedge
  * (a→b, a→c) matched by b→c; the mirrored wedge looks up c→b, which the
  * orientation excludes) — no post-hoc dedup, no multiset corrections.
  * All counting is integer; the result is partition-invariant and
  * oracle-checkable.
  */
object Triangles {

  /** Oriented edge relation (s -> t with key(s) < key(t), key =
    * (degree, id)) from an undirected edge list; multi-edges and
    * self-loops dropped. */
  private def orient(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = e0.select(col("u").as("n")).unionAll(e0.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    e0.join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      // u < v always, so a degree tie orients u -> v: key = (deg, id)
      .select(
        when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("s"),
        when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("t"))
  }

  /** One row per triangle, as (a, b, c) in (degree, id)-key order. */
  def triangleRows(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val o = orient(edges, srcCol, dstCol).localCheckpoint(true)
    val wedges = o.select(col("s"), col("t").as("x"))
      .join(o.select(col("s"), col("t").as("y")), "s")
      .filter(col("x") =!= col("y"))
    wedges.join(o.select(col("s").as("x"), col("t").as("y")), Seq("x", "y"))
      .select(col("s").as("a"), col("x").as("b"), col("y").as("c"))
  }

  /** Per-node triangle participation counts. */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val tri = triangleRows(edges, srcCol, dstCol)
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
  }
}
