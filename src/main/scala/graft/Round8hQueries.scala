package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.TrainingQueries.{shingleRowsSql, toksSql}
import graft.operators.{Dedup, GroupMedian}
import graft.sources.Tables

/** Round-8 eighth batch: corpus- and ops-monitoring closers — trending
  * terms between corpus halves, the near-dup graph's degree profile,
  * and pending-order aging quantiles. Same scale discipline: hash aggs
  * over bounded domains, GroupMedian for low-cardinality group
  * quantiles, floor-scaled integer ratios. */
object Round8hQueries {

  def all: Seq[Q] = Seq(

    Q("q278_trending_terms",
      // Trending terms: per-token frequency (ppm of each half's token
      // mass) in the first vs second half of the corpus by doc id
      // (ingestion order), top-10 by frequency GROWTH. The discrete
      // lens on q229's novelty curve — which tokens drive the drift
      // q268 measures distributionally. One token scan, one hash agg,
      // broadcast totals.
      Some(s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) nd FROM documents),
              |t AS (SELECT CASE WHEN doc_id*2 < n.nd THEN 0 ELSE 1 END half,
              |             UNNEST($toksSql) tok
              |      FROM documents CROSS JOIN n),
              |c AS (SELECT tok,
              |        CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) c1,
              |        CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) c2
              |      FROM t GROUP BY tok),
              |tt AS (SELECT CAST(SUM(c1) AS BIGINT) t1, CAST(SUM(c2) AS BIGINT) t2 FROM c)
              |SELECT tok, c1, c2,
              |       c1*1000000//tt.t1 f1_e6, c2*1000000//tt.t2 f2_e6,
              |       c2*1000000//tt.t2 - c1*1000000//tt.t1 delta_e6
              |FROM c CROSS JOIN tt
              |ORDER BY delta_e6 DESC, tok LIMIT 10""".stripMargin),
      (s, d) => {
        val n = Tables.documents(s, d).agg(count(lit(1)).cast("long").as("nd"))
        val c = Tables.documents(s, d).crossJoin(broadcast(n))
          .select(when(col("doc_id") * 2 < col("nd"), 0).otherwise(1).as("half"),
            explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("tok")
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).cast("long").as("c1"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).cast("long").as("c2"))
        val tt = c.agg(sum("c1").as("t1"), sum("c2").as("t2"))
        c.crossJoin(broadcast(tt))
          .select(col("tok"), col("c1"), col("c2"),
            expr("c1*1000000 div t1").as("f1_e6"),
            expr("c2*1000000 div t2").as("f2_e6"),
            expr("c2*1000000 div t2 - c1*1000000 div t1").as("delta_e6"))
          .orderBy(col("delta_e6").desc, col("tok")).limit(10)
      }),

    Q("q279_dup_graph_degrees",
      // Degree distribution of the jaccard >= 0.8 near-dup graph,
      // degree-0 row included: the shape report that says whether dups
      // come as pairs (degree 1), chains, or boilerplate hubs — and
      // therefore whether q56's cluster resolution has real work to do.
      // Reuses the session-cached pair stats; the histogram is bounded
      // by the max degree.
      Some(s"""WITH ${TrainingQueries.cappedShingleCtes},
              |cnt AS (SELECT doc_id, COUNT(*) n_sh FROM sh GROUP BY doc_id),
              |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, COUNT(*) i
              |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |          GROUP BY 1, 2),
              |jc AS (SELECT a_id, b_id FROM inter
              |       JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
              |       WHERE ROUND(i::DOUBLE/(ca.n_sh + cb.n_sh - i), 4) >= 0.8),
              |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) dg FROM (
              |  SELECT a_id node FROM jc UNION ALL SELECT b_id FROM jc) GROUP BY node),
              |nd AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM documents),
              |hist AS (SELECT dg degree, CAST(COUNT(*) AS BIGINT) n_docs FROM deg GROUP BY dg
              |         UNION ALL
              |         SELECT 0, nd.n - (SELECT COUNT(*) FROM deg) FROM nd)
              |SELECT degree, n_docs FROM hist ORDER BY degree""".stripMargin),
      (s, d) => {
        val jc = Dedup.jaccardFromStats(
          TrainingQueries.cachedPairStats(s, d), 0.8)
        val deg = jc.select(col("a_id").as("node"))
          .unionAll(jc.select(col("b_id").as("node")))
          .groupBy("node").agg(count(lit(1)).cast("long").as("dg"))
        val nd = Tables.documents(s, d).agg(count(lit(1)).cast("long").as("n"))
        val involved = deg.agg(count(lit(1)).cast("long").as("ni"))
        val hist = deg.groupBy(col("dg").as("degree"))
          .agg(count(lit(1)).cast("long").as("n_docs"))
          .unionByName(broadcast(nd).crossJoin(broadcast(involved))
            .select(lit(0L).as("degree"), (col("n") - col("ni")).as("n_docs")))
        hist.orderBy("degree")
      }),

    Q("q280_pending_order_aging",
      // Aging report for PENDING orders: exact nearest-rank median and
      // p90 age in days per priority, anchored on the newest order date
      // (data-derived, deterministic). Priorities are a 5-value key, so
      // the quantiles run through GroupMedian's prefix scan — the
      // operational twin of q263's gap profile.
      Some("""WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) d FROM orders),
             |a AS (SELECT o_orderpriority pri,
             |        DATE_DIFF('day', CAST(o_orderdate AS DATE), mx.d) age_d, o_orderkey
             |      FROM orders, mx WHERE o_orderstatus = 'P'),
             |r AS (SELECT pri, age_d,
             |        SUM(1) OVER (PARTITION BY pri ORDER BY age_d, o_orderkey
             |                     ROWS UNBOUNDED PRECEDING) cum,
             |        COUNT(*) OVER (PARTITION BY pri) tot FROM a)
             |SELECT pri AS o_orderpriority, CAST(MAX(tot) AS BIGINT) n_pending,
             |  CAST(MIN(CASE WHEN 2*cum >= tot THEN age_d END) AS BIGINT) med_age_days,
             |  CAST(MIN(CASE WHEN 10*cum >= 9*tot THEN age_d END) AS BIGINT) p90_age_days
             |FROM r GROUP BY pri ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val mx = Tables.orders(s, d)
          .agg(max(col("o_orderdate").cast("date")).as("d"))
        val a = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
          .crossJoin(broadcast(mx))
          .select(col("o_orderpriority").as("pri"),
            datediff(col("d"), col("o_orderdate").cast("date")).cast("long").as("age_d"),
            col("o_orderkey"))
        // n_pending = the quantile scan's own weight total (weights are
        // 1/order): the checkpoint + count job + join-back are gone — the
        // prefix scan was already weighing every row (round 16)
        GroupMedian.weightedLowerQuantiles(
            a.withColumn("one", lit(1L)), "pri", "age_d", "one",
            Seq(col("o_orderkey")),
            Seq(("med_age_days", 1, 2), ("p90_age_days", 9, 10)), keepTotal = true)
          .select(col("pri").as("o_orderpriority"),
            col("_gm_tot").cast("long").as("n_pending"),
            col("med_age_days"), col("p90_age_days"))
          .orderBy("o_orderpriority")
      })
  )
}
