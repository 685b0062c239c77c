package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: power iteration over a directed edge list with
  * ALL arithmetic in scaled integers, so the result is bit-stable across
  * engines, partitionings, and summation orders — float PageRank is none
  * of those (a double Σ contributions depends on shuffle arrival order).
  *
  * Per iteration, with ranks scaled by 1e6 (r₀ = 1.0 → 1 000 000):
  *   contribution(u→v) = floor(r_u · 85 / (100 · outdeg_u))
  *   r_v = 150 000 + Σ contributions  (i.e. 0.15 + 0.85·Σ r_u/deg_u,
  *   floored per edge — the documented fixed-point semantics)
  * Integer BIGINT sums are exact in any order; floor-div of exact
  * integers is engine-identical (IEEE division of exactly-representable
  * operands rounds to the true quotient's floor consistently).
  *
  * Dangling destinations (no out-edges) have two standard treatments,
  * both offered:
  *  - `redistributeDangling = false` (default): dangling nodes absorb
  *    rank without re-emitting it — the simplification, stated rather
  *    than hidden. Total mass decays where danglings accumulate rank.
  *  - `redistributeDangling = true`: each iteration also adds
  *    floor(85·D / (100·N)) to every node, where D = Σ rank over
  *    dangling nodes (exact BIGINT) and N = |nodes| — the canonical
  *    uniform redistribution (Page et al.; Ipsen & Selee's lumped
  *    formulation). Because the share derives from the single exact
  *    total D, it is as order-independent as the edge contributions;
  *    total mass is then conserved up to the documented floor losses
  *    (< 1 per edge + 1 per node per iteration — PageRankSpec pins the
  *    bound).
  *
  * Scale shape: one edges⋈ranks hash join + one SUM aggregation per
  * iteration — the same two-shuffle loop as
  * [[Dedup.connectedComponents]], with the same lineage discipline:
  * edges/nodes/degrees (and the dangling set) are materialized once
  * (they feed every round) and the rank relation is checkpointed per
  * round, so iteration N's plan does not re-derive rounds 1..N-1
  * (measured 2x on q139 at sf0.1). Redistribution adds one
  * dangling-semi-join SUM (a 1-row aggregate, crossJoin-broadcast back)
  * per iteration — no per-node state on the driver. Checkpointing moves
  * no values — the arithmetic is integer — so the oracle is unaffected.
  */
object PageRank {

  val Scale = 1000000L
  val Base = 150000L // 0.15 scaled

  /** The materialized iteration-invariant relations: distinct edges,
    * node set, out-degrees. Build ONCE ([[buildGraph]]) when several
    * rank computations iterate over the same edge set (q139 + q142 share
    * one graph) — each relation is an eager checkpoint, so reuse skips
    * the distinct/union/aggregate shuffles, not just the scan. */
  final case class Graph(e: DataFrame, nodes: DataFrame, deg: DataFrame)

  def buildGraph(edges: DataFrame, srcCol: String, dstCol: String): Graph = {
    // The edge relation is hash-partitioned by SRC — and sorted within
    // partitions on it — before its one-time checkpoint (round 16, guide
    // §2.4 "share one exchange"): every iteration joins e ⋈ ranks ON
    // src = node, and a checkpoint preserves outputPartitioning AND
    // outputOrdering, so the per-round join re-shuffles (and, under
    // sort-merge, re-sorts) only the |nodes|-row rank relation, never
    // the edge list. deg inherits the same partitioning (groupBy(src)
    // over a src-partitioned parent needs no exchange), and the
    // distinct() it replaces shuffled by (src, dst) anyway, so the
    // repartition adds one build-time exchange in place of `iterations`
    // edge-sized ones per consumer of the shared graph.
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct()
      .repartition(col("src")).sortWithinPartitions("src")
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    Graph(e, nodes, deg)
  }

  /** Ranks after `iterations` rounds over `edges` (srcCol, dstCol) —
    * one row per node appearing as source or destination. */
  def fixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                 iterations: Int,
                 redistributeDangling: Boolean = false): DataFrame =
    fixedPoint(buildGraph(edges, srcCol, dstCol), iterations, redistributeDangling)

  /** [[fixedPoint]] over a prebuilt [[Graph]]. */
  def fixedPoint(g: Graph, iterations: Int,
                 redistributeDangling: Boolean): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val Graph(e, nodes, deg) = g
    // dangling set and |N| are edge-derived and static across rounds
    val dang = if (redistributeDangling)
      nodes.join(deg, col("node") === col("src"), "left_anti").localCheckpoint(true)
    else null
    val nNodes = if (redistributeDangling) nodes.count() else 0L
    var ranks = nodes.withColumn("rank", lit(Scale))
    for (i <- 0 until iterations) {
      val contribs = e
        .join(ranks, col("src") === col("node"))
        .join(deg, "src")
        // floor((r*85) / (100*deg)): r*85 <= ~8.5e11 — exact in the
        // double division both engines use, so the floor is the true
        // integer quotient
        .select(col("dst"),
          floor((col("rank") * 85L) / (col("deg") * 100L)).cast("long").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_sum"))
      val base = nodes
        .join(contribs, col("node") === col("dst"), "left_outer")
      val next =
        if (redistributeDangling) {
          // ONE exact total D (1-row aggregate, broadcast back); every
          // node's share floor(85*D/(100*N)) derives from it, so the
          // redistribution is as shuffle-order-proof as the edge sums
          val dmass = ranks.join(dang, "node")
            .agg(coalesce(sum(col("rank")), lit(0L)).as("_dsum"))
          val share = floor((col("_dsum") * 85L) / lit(100L * nNodes)).cast("long")
          base.crossJoin(broadcast(dmass))
            .select(col("node"),
              (lit(Base) + coalesce(col("in_sum"), lit(0L)) + share).as("rank"))
        } else base
          .select(col("node"), (lit(Base) + coalesce(col("in_sum"), lit(0L))).as("rank"))
      // cut lineage between rounds; leave the LAST round lazy so callers
      // compose (top-k, filters) without a forced extra materialization
      // free the superseded round's checkpoint blocks once the new round
      // has materialized (no-op on round 0's lazy initial relation)
      ranks = if (i == iterations - 1) next
        else { val cp = next.localCheckpoint(true); Lineage.free(ranks); cp }
    }
    ranks
  }

  /** Edge-WEIGHTED fixed-point PageRank: contribution(u→v) =
    * floor(r_u · 85 · w_uv / (100 · W_u)) with W_u = Σ w over u's
    * out-edges — rank flows proportionally to integer edge weights
    * (e.g. interaction counts) instead of uniformly. Multi-edges sum
    * their weights; weights must be positive integers small enough that
    * r·85·w stays under 2^53 (the exact-double-division bound; with
    * count-like weights and 1e6-scaled ranks that is w ≲ 1e4). Dangling
    * destinations absorb, as in the unweighted default. Same two-shuffle
    * per-round loop and checkpoint lineage discipline as [[fixedPoint]];
    * equal weights reduce EXACTLY to the unweighted iteration
    * (PageRankSpec pins it). */
  def fixedPointWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                         weightCol: String, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(weightCol).cast("long").as("w"))
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
    // the out-weight total is iteration-invariant like the edges
    // themselves — fold it INTO the edge relation once (one extra long
    // per edge) instead of re-joining a wdeg relation every round.
    // src-partitioned before the one-time checkpoint (same reasoning as
    // buildGraph): each round's e ⋈ ranks join then shuffles only ranks.
    val wdeg = e0.groupBy("src").agg(sum(col("w")).as("tw"))
    val e = e0.join(wdeg, "src").repartition(col("src"))
      .sortWithinPartitions("src").localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(true)
    var ranks = nodes.withColumn("rank", lit(Scale))
    for (i <- 0 until iterations) {
      val contribs = e
        .join(ranks, col("src") === col("node"))
        .select(col("dst"),
          floor((col("rank") * 85L * col("w")) / (col("tw") * 100L)).cast("long").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_sum"))
      val next = nodes
        .join(contribs, col("node") === col("dst"), "left_outer")
        .select(col("node"), (lit(Base) + coalesce(col("in_sum"), lit(0L))).as("rank"))
      // free the superseded round's checkpoint blocks once the new round
      // has materialized (no-op on round 0's lazy initial relation)
      ranks = if (i == iterations - 1) next
        else { val cp = next.localCheckpoint(true); Lineage.free(ranks); cp }
    }
    ranks
  }

  /** Oracle-SQL twin of [[fixedPointWeighted]] over an
    * `edges(src, dst, w)` relation provided as `edgesSql`. */
  def fixedPointWeightedSql(edgesSql: String, iterations: Int): String = {
    val rounds = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         $Base + COALESCE((
         |           SELECT SUM(CAST(FLOOR((r.rank * 85 * e.w) / (d.tw * 100)) AS BIGINT))
         |           FROM e JOIN r${i - 1} r ON e.src = r.node
         |           JOIN wdeg d ON d.src = e.src
         |           WHERE e.dst = n.node), 0) AS rank
         |  FROM nodes n)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w
       |           FROM ($edgesSql) GROUP BY src, dst),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |wdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS tw FROM e GROUP BY src),
       |r0 AS (SELECT node, CAST($Scale AS BIGINT) AS rank FROM nodes),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$iterations""".stripMargin
  }

  /** PERSONALIZED fixed-point PageRank: teleport mass lands only on the
    * `seeds` — r₀ = Scale on seeds / 0 elsewhere, per-round base = Base
    * on seeds / 0 elsewhere, contributions as in [[fixedPoint]]. The
    * random-walk-with-restart relevance measure data-selection pipelines
    * use to rank a corpus graph around a trusted seed set (the
    * link-based cousin of q168's DSIR importance weighting). Same
    * all-integer arithmetic (bit-stable in any shuffle order), same
    * two-shuffle-per-round loop and checkpoint lineage discipline;
    * dangling nodes absorb. The seed list is a broadcast literal —
    * driver state is |seeds| longs. */
  def fixedPointPersonalized(g: Graph, seeds: Seq[Long],
                             iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(seeds.nonEmpty, "personalized PageRank needs at least one seed")
    val Graph(e, nodes, deg) = g
    def isSeed = col("node").isin(seeds: _*)
    var ranks = nodes.withColumn("rank",
      when(isSeed, lit(Scale)).otherwise(lit(0L)))
    for (i <- 0 until iterations) {
      val contribs = e
        .join(ranks, col("src") === col("node"))
        .join(deg, "src")
        .select(col("dst"),
          floor((col("rank") * 85L) / (col("deg") * 100L)).cast("long").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_sum"))
      val next = nodes
        .join(contribs, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (when(isSeed, lit(Base)).otherwise(lit(0L))
            + coalesce(col("in_sum"), lit(0L))).as("rank"))
      // free the superseded round's checkpoint blocks once the new round
      // has materialized (no-op on round 0's lazy initial relation)
      ranks = if (i == iterations - 1) next
        else { val cp = next.localCheckpoint(true); Lineage.free(ranks); cp }
    }
    ranks
  }

  /** Oracle twin of [[fixedPointPersonalized]] — generated beside the
    * Scala so the constants and the seed handling cannot drift. */
  def fixedPointPersonalizedSql(edgesSql: String, seeds: Seq[Long],
                                iterations: Int): String = {
    val seedList = seeds.mkString(", ")
    val rounds = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         CASE WHEN n.node IN ($seedList) THEN $Base ELSE 0 END + COALESCE((
         |           SELECT SUM(CAST(FLOOR((r.rank * 85) / (d.deg * 100)) AS BIGINT))
         |           FROM e JOIN r${i - 1} r ON e.src = r.node
         |           JOIN deg d ON d.src = e.src
         |           WHERE e.dst = n.node), 0) AS rank
         |  FROM nodes n)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgesSql)),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |r0 AS (SELECT node,
       |         CAST(CASE WHEN node IN ($seedList) THEN $Scale ELSE 0 END AS BIGINT) AS rank
       |       FROM nodes),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$iterations""".stripMargin
  }

  /** Oracle-SQL twin (DuckDB dialect): the same iterations unrolled as
    * chained CTEs over an `edges(src, dst)` CTE that the caller provides
    * as `edgesSql`. Generated beside the Scala so the constants cannot
    * drift. */
  def fixedPointSql(edgesSql: String, iterations: Int,
                    redistributeDangling: Boolean = false): String = {
    val share = if (redistributeDangling)
      s""" + (SELECT CAST(FLOOR((COALESCE(SUM(r2.rank), 0) * 85) / (100 * (SELECT COUNT(*) FROM nodes))) AS BIGINT)
         |        FROM rPREV r2 JOIN dang ON dang.node = r2.node)""".stripMargin
    else ""
    val rounds = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         $Base + COALESCE((
         |           SELECT SUM(CAST(FLOOR((r.rank * 85) / (d.deg * 100)) AS BIGINT))
         |           FROM e JOIN r${i - 1} r ON e.src = r.node
         |           JOIN deg d ON d.src = e.src
         |           WHERE e.dst = n.node), 0)${share.replace("rPREV", s"r${i - 1}")} AS rank
         |  FROM nodes n)""".stripMargin
    }.mkString(",\n")
    val dangCte = if (redistributeDangling)
      "\ndang AS (SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM deg)),"
    else ""
    s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgesSql)),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),$dangCte
       |r0 AS (SELECT node, CAST($Scale AS BIGINT) AS rank FROM nodes),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$iterations""".stripMargin
  }
}
