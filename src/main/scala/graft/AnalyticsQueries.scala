package graft

import org.apache.spark.sql.functions._
import graft.Queries.{Q, r4}
import graft.operators.Skyline
import graft.sources.Tables

/** Round-4 analytics inventory (q134–q136): text normalization (the LLM
  * preprocessing staple, exercised on the messy JSON `props` strings, not
  * the already-clean document bodies), a distributed 2-D skyline
  * (Pareto frontier — an operator Spark lacks, built as the two-phase
  * local/global sweep in [[graft.operators.Skyline]]), and a staged
  * event funnel (signup -> view -> purchase with strict temporal order).
  * All hash-checked under the §2.2 determinism rules.
  */
object AnalyticsQueries {

  /** The supplier→customer fulfillment graph (src, dst, w = lineitem
    * count per pair), aggregated and MATERIALIZED once per (session, sf
    * dir): q139, q142 and q151 all power-iterate over this exact graph,
    * and rebuilt per query the lineitem⋈orders join + pair aggregation
    * was ~13% of the round-5 bench across the three. The cache holds one
    * eagerly checkpointed pair relation — |suppliers×customers| scalar
    * rows, tiny next to the fact tables it derives from. Keyed by the
    * session OBJECT (LRU-bounded — see [[SessionCache]]) so a stopped
    * session's checkpoint is never served to a new session and dead
    * sessions do not pin their checkpoints forever. */
  private val fulfillCache = new SessionCache[org.apache.spark.sql.DataFrame]
  private[graft] def fulfillmentEdges(s: org.apache.spark.sql.SparkSession,
                                      d: String): org.apache.spark.sql.DataFrame =
    fulfillCache.getOrElseUpdate(s, d)(
      Tables.lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey").cast("long").as("src"),
          (lit(1000000L) + col("o_custkey")).cast("long").as("dst"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint(true))

  /** The DOUBLED (undirected) fulfillment edge relation (a, b, w),
    * hash-partitioned by `a` and checkpointed once per (session, dir) —
    * shared by the frontier/relaxation family (q166 BFS, q169
    * Bellman-Ford, q257 harmonic): every round of theirs joins ON
    * a = frontier.node, and a checkpoint preserves outputPartitioning,
    * so each round shuffles only the frontier relation, never the 2|E|
    * edge rows (round 16, guide §2.4 "share one exchange"). */
  private val undirCache = new SessionCache[org.apache.spark.sql.DataFrame]
  private[graft] def fulfillmentUndirected(s: org.apache.spark.sql.SparkSession,
                                           d: String): org.apache.spark.sql.DataFrame =
    undirCache.getOrElseUpdate(s, d) {
      val e0 = fulfillmentEdges(s, d)
        .select(col("src").as("a"), col("dst").as("b"), col("w"))
      e0.unionByName(e0.select(col("b").as("a"), col("a").as("b"), col("w")))
        .repartition(col("a")).sortWithinPartitions("a").localCheckpoint(true)
    }

  /** The iteration-invariant PageRank relations (distinct edges, nodes,
    * degrees) over [[fulfillmentEdges]], built once and shared by q139
    * and q142 — the two unweighted variants differ only in dangling-mass
    * treatment, which is derived inside the iteration. */
  private val graphCache = new SessionCache[graft.operators.PageRank.Graph]
  private[graft] def fulfillmentGraph(s: org.apache.spark.sql.SparkSession,
                                      d: String): graft.operators.PageRank.Graph =
    graphCache.getOrElseUpdate(s, d)(
      graft.operators.PageRank.buildGraph(fulfillmentEdges(s, d), "src", "dst"))

  def all: Seq[Q] = Seq(

    Q("q134_text_normalize",
      // lower -> strip non-alphanumerics -> collapse runs of spaces ->
      // trim: both engines use the same regex classes ([^a-z0-9 ], ' +'),
      // which RE2 (DuckDB) and java.util.regex (Spark) treat identically.
      // Aggregated per event_type over the normalized token stream.
      Some("""WITH n AS (
             |  SELECT event_type,
             |         TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(props),
             |              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
             |  FROM events)
             |SELECT event_type,
             |       COUNT(*) AS n_rows,
             |       CAST(SUM(LEN(norm)) AS BIGINT) AS total_chars,
             |       CAST(SUM(LEN(string_split(norm, ' '))) AS BIGINT) AS total_tokens,
             |       MIN(norm) AS min_norm
             |FROM n GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        val norm = trim(regexp_replace(regexp_replace(lower(col("props")),
          "[^a-z0-9 ]", " "), " +", " "))
        Tables.events(s, d)
          .select(col("event_type"), norm.as("norm"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            sum(length(col("norm")).cast("long")).as("total_chars"),
            sum(size(split(col("norm"), " ")).cast("long")).as("total_tokens"),
            min(col("norm")).as("min_norm"))
          .orderBy("event_type")
      }),

    Q("q135_skyline",
      // Pareto frontier of part on (minimize p_retailprice, maximize
      // p_size): no other part is both cheaper-or-equal and
      // larger-or-equal with one strict. The oracle is the quadratic
      // NOT EXISTS; the engine runs the two-phase sweep — identical sets
      // because skyline is partition-invariant.
      Some("""SELECT p_partkey, p_size, ROUND(p_retailprice, 4) AS price
             |FROM part p1
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM part p2
             |  WHERE p2.p_retailprice <= p1.p_retailprice
             |    AND p2.p_size >= p1.p_size
             |    AND (p2.p_retailprice < p1.p_retailprice OR p2.p_size > p1.p_size))
             |ORDER BY p_partkey""".stripMargin),
      (s, d) => Skyline.skyline2d(
          Tables.part(s, d).select("p_partkey", "p_size", "p_retailprice"),
          minCol = "p_retailprice", maxCol = "p_size")
        .select(col("p_partkey"), col("p_size"), r4(col("p_retailprice")).as("price"))
        .orderBy("p_partkey"))
      ,

    Q("q136_funnel",
      // Staged funnel with STRICT temporal order per user: first signup,
      // then the first view after it, then the first purchase after that.
      // Timestamps only ever compare (never print), so Spark's
      // nanos-as-long and DuckDB's native timestamp order identically.
      Some("""WITH s1 AS (
             |  SELECT user_id, MIN(ts) AS t1 FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id),
             |s2 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t2
             |  FROM events e JOIN s1 ON e.user_id = s1.user_id
             |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
             |s3 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t3
             |  FROM events e JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
             |SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
             |       (SELECT COUNT(*) FROM s2) AS n_view_after,
             |       (SELECT COUNT(*) FROM s3) AS n_purchase_after,
             |       ROUND((SELECT COUNT(*) FROM s3) * 1.0
             |             / (SELECT COUNT(*) FROM s1), 4) AS conversion""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val s2 = ev.filter(col("event_type") === "view").as("e")
          .join(s1, "user_id")
          .filter(col("e.ts") > col("t1"))
          .groupBy("user_id").agg(min(col("e.ts")).as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase").as("e")
          .join(s2, "user_id")
          .filter(col("e.ts") > col("t2"))
          .groupBy("user_id").agg(min(col("e.ts")).as("t3"))
        val c1 = s1.agg(count(lit(1)).as("n_signup"))
        val c2 = s2.agg(count(lit(1)).as("n_view_after"))
        val c3 = s3.agg(count(lit(1)).as("n_purchase_after"))
        c1.crossJoin(c2).crossJoin(c3)
          .select(col("n_signup"), col("n_view_after"), col("n_purchase_after"),
            r4(col("n_purchase_after") * lit(1.0) / col("n_signup")).as("conversion"))
      }),

    Q("q138_weighted_sample",
      // Deterministic weighted priority sampling (reproducible corpus
      // subsampling): priority = h32(doc_id)·1000 ÷ n_tok (integer
      // floor-div — h·1000 < 2^42, so the double division floors
      // identically in both engines), top-3 smallest per lang. Longer
      // docs get smaller priorities — weight-biased — and the same seedless
      // md5 order reproduces on any cluster, any partitioning, any rerun;
      // rand()-based sampling reproduces on none of them.
      Some(s"""WITH t AS (
              |  SELECT doc_id, lang,
              |         CAST(LEN(${TrainingQueries.toksSql}) AS BIGINT) AS n_tok
              |  FROM documents),
              |p AS (
              |  SELECT doc_id, lang, n_tok,
              |         CAST(FLOOR((${TrainingQueries.h32Sql.format("CAST(doc_id AS VARCHAR)")}
              |                     * 1000) / n_tok) AS BIGINT) AS priority
              |  FROM t WHERE n_tok > 0),
              |r AS (
              |  SELECT *, ROW_NUMBER() OVER
              |    (PARTITION BY lang ORDER BY priority, doc_id) AS rn
              |  FROM p)
              |SELECT lang, doc_id, n_tok, priority
              |FROM r WHERE rn <= 3 ORDER BY lang, doc_id""".stripMargin),
      (s, d) => {
        import graft.functions.HashFunctions
        import graft.operators.TextAnalysis
        import org.apache.spark.sql.expressions.Window
        val t = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
          .filter(col("n_tok") > 0)
        val pri = floor((HashFunctions.h32(col("doc_id").cast("string")) * 1000L)
          / col("n_tok")).cast("long")
        val w = Window.partitionBy(col("lang")).orderBy(col("priority"), col("doc_id"))
        t.withColumn("priority", pri)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("lang", "doc_id", "n_tok", "priority")
          .orderBy("lang", "doc_id")
      }),

    Q("q139_pagerank",
      // Fixed-point integer PageRank (3 power iterations) over the
      // supplier -> customer fulfillment graph (customers offset by 1e6
      // to keep the node spaces disjoint). All-integer arithmetic makes
      // the iteration bit-stable across engines and shuffle orders —
      // float PageRank is not — so an ITERATIVE graph analytic sits
      // under the hash gate. Top 20 by rank, ties broken by node id.
      Some(s"""SELECT node, rank FROM (
              |  ${graft.operators.PageRank.fixedPointSql(
                   "SELECT l_suppkey AS src, 1000000 + o_custkey AS dst " +
                     "FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
                   iterations = 3)})
              |ORDER BY rank DESC, node LIMIT 20""".stripMargin),
      (s, d) => {
        import graft.operators.PageRank
        // shared materialized graph (edges, nodes, degrees built once
        // for q139 + q142; see fulfillmentGraph)
        PageRank.fixedPoint(fulfillmentGraph(s, d), iterations = 3,
            redistributeDangling = false)
          .orderBy(col("rank").desc, col("node")).limit(20)
      }),

    Q("q142_pagerank_redistribute",
      // q139's graph with the canonical dangling treatment instead of the
      // absorb simplification: every customer node is a sink in the
      // supplier->customer graph, so each round redistributes
      // floor(85*D/(100*N)) — D the exact BIGINT dangling mass — to all
      // nodes. Total mass is conserved up to floor losses (PageRankSpec
      // pins the bound); arithmetic stays integer, so the iterative
      // analytic remains hash-checkable. Top 20 by rank, ties by node.
      Some(s"""SELECT node, rank FROM (
              |  ${graft.operators.PageRank.fixedPointSql(
                   "SELECT l_suppkey AS src, 1000000 + o_custkey AS dst " +
                     "FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
                   iterations = 3, redistributeDangling = true)})
              |ORDER BY rank DESC, node LIMIT 20""".stripMargin),
      (s, d) => {
        import graft.operators.PageRank
        PageRank.fixedPoint(fulfillmentGraph(s, d), iterations = 3,
            redistributeDangling = true)
          .orderBy(col("rank").desc, col("node")).limit(20)
      }),

    Q("q140_ann_recall",
      // The IVF quality/latency tradeoff MEASURED: recall@10 of 1-probe
      // vs 3-probe against the exact brute-force top-10, plus the
      // candidate counts each probe setting scans (1/16 vs 3/16 of the
      // corpus). Cell ranking, assignment, and cosine all share the q69
      // arithmetic, so the oracle reproduces the exact candidate sets —
      // an approximate index whose approximation error is itself
      // hash-checked.
      Some(ExtendedQueries.annRecallOracleSql),
      (s, d) => {
        import graft.operators.Similarity
        import graft.functions.VectorFunctions.cosine
        import org.apache.spark.sql.functions.broadcast
        val emb = Tables.embeddings(s, d)
        val cents = ExtendedQueries.trainedCentroids(s, d) // shared deterministic training
        val assigned = Similarity.assignToCentroidsLocal(emb, cents)
          .filter(col("vec_id") =!= 0)
        val qe = emb.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<float>"))
          .collect().head.getSeq[Float](0).toArray
        val ranked = Similarity.rankCells(cents, qe)
        val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        def top10(base: org.apache.spark.sql.DataFrame) = base
          .crossJoin(broadcast(query))
          .select(col("vec_id"), cosine(col("embedding"), col("qe")).as("c"))
          .orderBy(col("c").desc, col("vec_id")).limit(10).select("vec_id")
        val brute = top10(emb.filter(col("vec_id") =!= 0))
        def probed(n: Int) = assigned.filter(col("cent_id").isin(ranked.take(n): _*))
        val cand1 = probed(1).agg(count(lit(1)).as("cand_1probe"))
        val cand3 = probed(3).agg(count(lit(1)).as("cand_3probe"))
        val h1 = top10(probed(1)).join(brute, "vec_id").agg(count(lit(1)).as("h1"))
        val h3 = top10(probed(3)).join(brute, "vec_id").agg(count(lit(1)).as("h3"))
        cand1.crossJoin(cand3).crossJoin(h1).crossJoin(h3)
          .select(col("cand_1probe"), col("cand_3probe"),
            r4(col("h1") / 10.0).as("recall_1probe"),
            r4(col("h3") / 10.0).as("recall_3probe"))
      })
  )
}
