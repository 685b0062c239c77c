package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core peeling — the degeneracy member of the graph-operator
  * family beside connected components (connectivity), PageRank/HITS
  * (centrality), label propagation (community) and triangle counting
  * (cohesion). The k-core of a graph is the maximal subgraph in which
  * every node has degree >= k; it is computed by repeatedly deleting
  * nodes of degree < k, whose removal can drop neighbors below k in
  * turn (the cascade).
  *
  * Rounds are bounded by the caller (`rounds`) rather than iterated to
  * convergence, the same honest contract as [[LabelProp]]: each round is
  * one degree aggregation plus two semi-join-shaped filters, and the
  * cascade depth a corpus needs is data-dependent — a pipeline picks the
  * round budget it is willing to pay, and `rounds` rounds of peeling
  * always yields a SUPERSET of the true k-core (never over-deletes), so
  * the result is a sound over-approximation that tightens monotonically.
  *
  * Scale shape: the edge list is doubled once and checkpointed (it is
  * the loop invariant); each round shuffles scalar (node, degree) pairs
  * with map-side partial count and equi-joins the keep-list back — no
  * windows, no driver-side state, lineage kept flat by a per-round
  * checkpoint exactly like [[PageRank]]/[[LabelProp]].
  */
object KCore {

  /** @param edges one row per UNDIRECTED edge (each pair once, either
    *   orientation, no self-loops); both orientations derived internally.
    * @return surviving (node, deg) — degree WITHIN the peeled subgraph —
    *   after `rounds` synchronized peels at threshold `k`. */
  def peel(edges: DataFrame, srcCol: String, dstCol: String,
           k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      // keep-list = nodes still meeting the degree bar; checkpointed so
      // the two join probes below share one materialization instead of
      // re-aggregating degrees twice.
      val keep = e.groupBy("a").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("a").as("kn"))
        .localCheckpoint(true)
      e = e.join(keep, e("a") === keep("kn")).drop("kn")
        .join(keep.withColumnRenamed("kn", "km"), col("b") === col("km")).drop("km")
        .localCheckpoint(true)
    }
    e.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
  }
}
