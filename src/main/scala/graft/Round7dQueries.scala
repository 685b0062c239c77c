package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.TrainingQueries.toksSql
import graft.operators.PageRank
import graft.sources.Tables

/** Round-7 additions, fourth block: graph-relevance and co-occurrence
  * operators for training-data selection — personalized PageRank around
  * a trusted seed set (q214) and word2vec-style skip-gram pair counts
  * (q215). Same determinism discipline: all-integer rank arithmetic,
  * exact pair counts, total tie orders, TakeOrderedAndProject tops. */
object Round7dQueries {

  /** The q139 fulfillment edge list as oracle SQL — one copy, shared
    * with the q139/q142 oracles' shape. */
  private val fulfillEdgesSql =
    "SELECT l_suppkey AS src, 1000000 + o_custkey AS dst " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"

  private val PprSeeds = Seq(1L, 2L, 3L, 4L, 5L)

  def all: Seq[Q] = Seq(

    Q("q214_personalized_pagerank",
      // Random-walk-with-restart relevance around suppliers 1-5: teleport
      // mass lands only on the seeds, so rank measures proximity to the
      // trusted set — the link-based corpus-selection measure beside
      // q168's DSIR importance weights. Same all-integer fixed point as
      // q139 (bit-stable under any shuffle order), over the SAME shared
      // materialized graph; zero-rank nodes (unreachable from the seeds)
      // are dropped, top 20 by (rank, node id). At 100 TB: the seed list
      // is a broadcast literal, each round is the same edges-rank join +
      // SUM as q139 — personalization costs nothing extra.
      Some(s"""SELECT node, rank FROM (
              |  ${PageRank.fixedPointPersonalizedSql(fulfillEdgesSql,
                   PprSeeds, iterations = 3)})
              |WHERE rank > 0
              |ORDER BY rank DESC, node LIMIT 20""".stripMargin),
      (s, d) => PageRank
        .fixedPointPersonalized(AnalyticsQueries.fulfillmentGraph(s, d),
          PprSeeds, iterations = 3)
        .filter(col("rank") > 0L)
        .orderBy(col("rank").desc, col("node")).limit(20)),

    Q("q215_skipgram_pairs",
      // Word2vec-style skip-gram pair counts (window +1/+2, directional):
      // the co-occurrence table an embedding trainer consumes, and the
      // order-aware widening of q179's adjacent-bigram collocations. The
      // scale shape is the q187 position-join discipline: positions ride
      // the token explode as ints, each window offset is ONE equi-join on
      // (doc, position+δ) — never a per-doc quadratic band join — and the
      // top-30 is TakeOrderedAndProject under the (cnt DESC, ta, tb)
      // total order.
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |g AS (SELECT doc_id,
              |             UNNEST(GENERATE_SERIES(1, LEN(toks))) AS p,
              |             UNNEST(toks) AS tok
              |      FROM t),
              |pr AS (SELECT a.tok AS ta, b.tok AS tb
              |       FROM g a JOIN g b ON a.doc_id = b.doc_id AND b.p = a.p + 1
              |       UNION ALL
              |       SELECT a.tok, b.tok
              |       FROM g a JOIN g b ON a.doc_id = b.doc_id AND b.p = a.p + 2),
              |c AS (SELECT ta, tb, COUNT(*) AS cnt FROM pr GROUP BY ta, tb)
              |SELECT ta, tb, cnt FROM (
              |  SELECT ta, tb, cnt,
              |         ROW_NUMBER() OVER (ORDER BY cnt DESC, ta, tb) AS rn FROM c) r
              |WHERE rn <= 30 ORDER BY cnt DESC, ta, tb""".stripMargin),
      (s, d) => {
        val g = TrainingQueries.cachedDocToks(s, d)
          .select(col("doc_id"),
            posexplode(col("toks")).as(Seq("p0", "tok")))
          .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
        def offset(delta: Int) = g.as("a").join(g.as("b"),
            col("a.doc_id") === col("b.doc_id") &&
              col("b.p") === col("a.p") + delta)
          .select(col("a.tok").as("ta"), col("b.tok").as("tb"))
        offset(1).unionByName(offset(2))
          .groupBy("ta", "tb").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("ta"), col("tb")).limit(30)
      })
  )
}
