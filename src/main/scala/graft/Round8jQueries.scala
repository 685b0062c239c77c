package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Queries.{dsum, dsumSql, Q}
import graft.operators.TxLog
import graft.sources.Tables

/** Round-8 tenth batch: incremental JOIN view maintenance under the
  * hash gate — the two-sided delta-join identity
  * dV = (dA ⋈ B₀) ∪ (A₀ ⋈ dB) ∪ (dA ⋈ dB) proven hash-equal to the
  * flat join, with both deltas served by the TxLog change feed (the
  * join-view sibling of q212's aggregate IVM; together they cover the
  * two shapes every materialized view decomposes into). */
object Round8jQueries {

  /** One lineitem feed zone + pinned first generation per (JVM, sf
    * dir): gen 1 = lineitems of low-key orders (replace), then one
    * append with the rest — the same split key (5000) as q210's orders
    * feed zone, so the two feeds' delta terms are all non-trivial. */
  private val liFeedZones = scala.collection.concurrent.TrieMap
    .empty[String, (String, Long)]
  private[graft] def lineitemFeedZone(s: org.apache.spark.sql.SparkSession,
                                      d: String): (String, Long) =
    liFeedZones.getOrElseUpdate(d, {
      val zone = java.nio.file.Files
        .createTempDirectory("graft_q284").toString + "/zone"
      val base = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val g1 = TxLog.replace(s, zone, base.filter(col("l_orderkey") < 5000)).gen
      TxLog.append(s, zone, base.filter(col("l_orderkey") >= 5000))
      (zone, g1)
    })

  def all: Seq[Q] = Seq(

    Q("q284_incremental_join",
      // Per-customer revenue view over orders ⋈ lineitem, maintained
      // INCREMENTALLY from two TxLog change feeds: base ⋈ base plus the
      // three delta terms (dO ⋈ L₀, O₀ ⋈ dL, dO ⋈ dL), partial-agged
      // and combined — hash-equal to the oracle's flat join because
      // count and decimal revenue are commutative monoids and the four
      // terms tile the (order, line) pair space exactly. At 100 TB the
      // view update joins one batch's files against the other side's
      // snapshot instead of recomputing the join — THE reason lakehouse
      // change feeds exist. Insert-only deltas by construction (updates
      // need retraction — the q201 merge sink's LWW snapshot is the
      // engine's answer for keyed state).
      Some(s"""SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
              |       ROUND(${dsumSql("l_extendedprice * (1 - l_discount)")}, 4) AS revenue
              |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      (s, d) => {
        val (oz, og1) = Round7cQueries.changeFeedZone(s, d)
        val (lz, lg1) = lineitemFeedZone(s, d)
        def snapAt(zone: String, g: Long) = TxLog.readSnapshot(s, zone,
          TxLog.snapshotAt(s, zone, g).getOrElse(
            sys.error(s"q284: base generation $g vacuumed")))
        val o0 = snapAt(oz, og1)
        val dO = TxLog.appendedBetween(s, oz, og1)
        val l0 = snapAt(lz, lg1)
        val dL = TxLog.appendedBetween(s, lz, lg1)
        def part(o: DataFrame, l: DataFrame) =
          o.join(l, col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(count(lit(1)).as("n"),
              dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("t"))
        part(o0, l0)
          .unionByName(part(dO, l0))
          .unionByName(part(o0, dL))
          .unionByName(part(dO, dL))
          .groupBy("o_custkey")
          .agg(sum(col("n")).cast("long").as("n_lines"),
            round(sum(col("t")).cast("decimal(18,4)").cast("double"), 4).as("revenue"))
          .orderBy("o_custkey")
      })
  )
}
