package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by SYNCHRONOUS weighted label propagation — the
  * clustering member of the graph-operator family beside connected
  * components (pure connectivity), PageRank/HITS (centrality) and
  * triangle counting (cohesion).
  *
  * Labels initialize to node ids; each round every node adopts the
  * label carrying the greatest summed incident edge weight among its
  * neighbors, ties to the LOWEST label — the determinism knob the
  * classic asynchronous formulation lacks (async LP's result depends on
  * visit order, which no distributed engine should promise). Rounds are
  * unrolled by the caller's `rounds` knob rather than iterated to
  * convergence: synchronous LP can 2-cycle on bipartite graphs (labels
  * legitimately oscillate between sides), so a fixed round count is the
  * honest contract.
  *
  * Scale shape: each round is one equi-join of the |2·edges| scalar-key
  * edge list against the |nodes|-row label relation, a weighted count, and a
  * per-node max-struct winner pick — all two-phase aggregations with
  * map-side partial combine, no window sort anywhere; the label relation is eagerly
  * checkpointed per round to keep lineage flat — the same distributed-
  * loop discipline as [[PageRank]].
  */
object LabelProp {

  /** @param edges one row per UNDIRECTED edge (each pair once, either
    *   orientation); both orientations are derived internally.
    * @return (node, lbl) for every node with at least one edge. */
  def run(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
          rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // The max-struct tie-break negates the label (max(-lbl) = min(lbl)),
    // which is only correct for integral ids — a string id would cast to
    // null and silently INVERT the documented lowest-label rule.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idTypes = Seq(edges.schema(srcCol).dataType, edges.schema(dstCol).dataType)
    require(idTypes.forall(Seq(ByteType, ShortType, IntegerType, LongType).contains),
      s"LabelProp needs integral node ids (got ${idTypes.mkString(", ")}); " +
        "map other id types to longs first")
    // CONTRACT: pass a MATERIALIZED edge relation (checkpointed/cached),
    // like q172's session-cached fulfillment edges — an UN-materialized
    // caller would otherwise re-execute its upstream lineage per round.
    // The doubled list is checkpointed HASH-PARTITIONED BY `b` (round 16;
    // guide §2.4): every round joins e ⋈ lbl ON b = node, and a
    // checkpoint preserves outputPartitioning, so the per-round join
    // re-shuffles only the |nodes|-row label relation, never the 2|E|
    // edge rows. This revisits the round-14 A/B that found a bare
    // (unpartitioned) eager checkpoint a loss: materializing WITHOUT
    // aligning the partitioning saved nothing per round — partitioned, the
    // one build-time exchange replaces `rounds` edge-sized ones.
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"), col(wCol).as("w"))
      .unionByName(
        edges.select(col(dstCol).as("a"), col(srcCol).as("b"), col(wCol).as("w")))
      .repartition(col("b")).sortWithinPartitions("b").localCheckpoint(true)
    var lbl = e.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    // handle on the checkpoint backing `lbl` (after a round `lbl` is a
    // projection over it, which Lineage.free deliberately won't touch);
    // null until the first round checkpoints
    var lblCp: DataFrame = null
    val spark = edges.sparkSession
    var converged = false
    var round = 0
    while (!converged && round < rounds) {
      val votes = e.join(lbl, e("b") === lbl("node"))
        .select(e("a").as("vnode"), col("lbl"), col("w"))
        .groupBy("vnode", "lbl").agg(sum("w").as("wt"))
      // winner = greatest weight, ties to the LOWEST label — as a MAX of
      // (wt, -lbl, lbl) structs (struct ordering is lexicographic, and
      // max(-lbl) = min(lbl)), not a per-node ROW_NUMBER window: both are
      // the same deterministic winner, but the agg is two-phase with
      // map-side partial combine while the window must SORT every vote
      // row inside its node partition (measured 16.3 s -> agg form at
      // sf1 on the q172 fulfillment graph).
      val winners = votes
        .groupBy(col("vnode").as("node"))
        .agg(max(struct(col("wt"), (-col("lbl")).as("nl"), col("lbl"))).as("m"))
        .select(col("node"), col("m.lbl").as("lbl"))
      // Early exit at a true fixpoint (the CC accumulator trick): compare
      // against the incoming labels during the same materializing pass —
      // one |V|⋈|V| equi-join of checkpointed scalar relations, trivial
      // beside the vote join. Synchronous LP is a pure function of the
      // label relation, so an unchanged round proves every further round
      // identical (a bipartite 2-cycle never reads as converged — labels
      // differ each round). Round budget stays a CAP on converged graphs.
      // Accumulator retries can double-count; only `== 0` is consulted.
      // The LAST round skips the instrumentation entirely: its signal
      // could only gate rounds that no longer exist, so a caller whose
      // graph never converges (q172's bipartite 2 rounds) pays the
      // comparison join rounds-1 times, not rounds.
      round += 1
      if (round == rounds) {
        lbl = winners.localCheckpoint(true)
        if (lblCp != null) Lineage.free(lblCp)
        lblCp = lbl
      } else {
        val acc = spark.sparkContext.longAccumulator("labelprop_changed")
        val flagged = udf { (c: Boolean) => { if (c) acc.add(1L); c } }
        // chg must ride THROUGH the checkpoint (dropped only after):
        // pruned before materialization, the udf would never run and
        // every round would read as converged.
        val newCp = winners.as("w")
          .join(lbl.as("p"), col("w.node") === col("p.node"))
          .select(col("w.node").as("node"), col("w.lbl").as("lbl"),
            flagged(col("w.lbl") =!= col("p.lbl")).as("chg"))
          // one materialized |nodes|-row relation per round, flat lineage
          .localCheckpoint(true)
        lbl = newCp.drop("chg")
        converged = acc.value == 0L
        if (lblCp != null) Lineage.free(lblCp)
        lblCp = newCp
      }
    }
    lbl
  }
}
