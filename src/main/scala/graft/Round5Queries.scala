package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.{Splits, TextAnalysis}
import graft.sources.Tables

/** Round-5 inventory extension (q144–q146): the corpus-statistics tier of
  * an LLM training-data pipeline — unigram LM quality scoring (the CCNet-
  * style "does this look like the corpus" filter), TF-IDF term salience,
  * and train/test contamination measurement (n-gram containment of test
  * documents in the training split — the decontamination step every
  * eval-honest pipeline runs).
  *
  * All three share one determinism discipline, chosen so an engine-
  * independent oracle exists: NO transcendental functions (a libm log is
  * not bit-pinned across engines), only integer counting — exact in any
  * summation order — down to ONE final IEEE division (or multiply+divide
  * of exactly-representable integers), then ROUND(x, 4). The classic
  * log-space formulations (perplexity, log-idf) order the same documents
  * monotonically identically for fixed denominators; the rational
  * variants here trade the familiar scale for bit-stable output.
  */
object Round5Queries {

  import TrainingQueries.toksSql

  def all: Seq[Q] = Seq(

    Q("q144_unigram_lm_score",
      // Per-document mean add-one-smoothed unigram probability, scaled by
      // 1e6: score(d) = 1e6 * Σ_{t∈d}(cnt(t)+1) / (|d| * (N+V)). Token
      // counts are corpus-wide BIGINTs (exact in any order); the scaled
      // numerator stays < 2^53 at every test SF, so the single division
      // is IEEE-identical in both engines. Zero-token documents are
      // excluded (no token rows) — consistently on both sides.
      Some(s"""WITH tok AS (SELECT doc_id, UNNEST($toksSql) AS tok FROM documents),
              |vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
              |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
              |               COUNT(*) AS v_size FROM vocab),
              |d AS (SELECT t.doc_id, CAST(SUM(v.cnt + 1) AS BIGINT) AS s,
              |             COUNT(*) AS n_tok
              |      FROM tok t JOIN vocab v USING (tok) GROUP BY t.doc_id)
              |SELECT d.doc_id, d.n_tok,
              |       ROUND(CAST(d.s * 1000000 AS DOUBLE)
              |             / CAST(d.n_tok * (tot.n_total + tot.v_size) AS DOUBLE),
              |             4) AS lm_score
              |FROM d, tot ORDER BY doc_id""".stripMargin),
      (s, d) => {
        // direct scan, NOT cachedDocToks: row-exploding consumers decode
        // the cached token arrays slower than they re-split the text
        // (same-machine A/B q144 0.76 -> 1.63 s behind the cache)
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
          // exchange barrier (round 16, the pairStats idiom): the vocab
          // agg and the scoring join both need hash(tok); without it each
          // computes its own exchange and the tokenize+explode runs twice
          .repartition(col("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val tot = vocab.agg(sum(col("cnt")).as("n_total"), count(lit(1)).as("v_size"))
        toks.join(vocab, "tok")
          .groupBy("doc_id")
          .agg(sum(col("cnt") + 1L).as("s"), count(lit(1)).as("n_tok"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("n_tok"),
            round((col("s") * 1000000L).cast("double")
              / (col("n_tok") * (col("n_total") + col("v_size"))).cast("double"),
              4).as("lm_score"))
          .orderBy("doc_id")
      }),

    Q("q145_tfidf_topterms",
      // Top-3 salient terms per document by rational TF-IDF:
      // score = tf * D / df (D = docs with >= 1 token, df = docs
      // containing the term). tf*D is an exact BIGINT product; one IEEE
      // division; ties broken by term — a total order per document. The
      // log-idf variant ranks identically for fixed D (both are
      // monotone in tf and 1/df); the rational form is engine-exact.
      Some(s"""WITH tok AS (SELECT doc_id, UNNEST($toksSql) AS tok FROM documents),
              |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
              |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
              |dd AS (SELECT COUNT(DISTINCT doc_id) AS d FROM tok),
              |scored AS (
              |  SELECT tf.doc_id, tf.tok AS term,
              |         ROUND(CAST(tf.tf * dd.d AS DOUBLE) / CAST(df.df AS DOUBLE), 4) AS score
              |  FROM tf JOIN df USING (tok), dd),
              |r AS (SELECT doc_id, term, score, CAST(ROW_NUMBER() OVER (
              |        PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rn
              |      FROM scored)
              |SELECT doc_id, term, score, rn FROM r WHERE rn <= 3
              |ORDER BY doc_id, rn""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // direct scan — the row-explode consumer rule (see q144)
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        // tf materialized once (round 16): its three consumers (df, D,
        // the scoring join) each re-ran tokenize+explode+agg; D =
        // COUNT(DISTINCT doc_id) over tf is the same set of docs (every
        // doc with >= 1 token has a tf row)
        val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
          .localCheckpoint(true)
        val dfRel = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val dd = tf.agg(countDistinct(col("doc_id")).as("d"))
        val scored = tf.join(dfRel, "tok").crossJoin(broadcast(dd))
          .select(col("doc_id"), col("tok").as("term"),
            round((col("tf") * col("d")).cast("double") / col("df").cast("double"), 4)
              .as("score"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
        scored.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("doc_id", "term", "score", "rn")
          .orderBy("doc_id", "rn")
      }),

    Q("q146_contamination",
      // Train/test decontamination measurement: for every TEST document
      // (the q70 hash split at the 90% boundary), the fraction of its
      // distinct 3-gram shingles that occur anywhere in the TRAIN split.
      // The candidate relation is a distinct-shingle semi-join against
      // the train shingle set — the inverted-index shape of q36, never
      // test x train document pairs. Counting is integer; one division.
      // Documents under 3 tokens have no shingles and are excluded
      // (consistently: shingle-less docs cannot be contaminated).
      Some(s"""WITH sh AS (
              |  SELECT doc_id, UNNEST(LIST_DISTINCT(CASE WHEN LEN(t) >= 3 THEN
              |           LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
              |                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
              |         ELSE [] END)) AS shingle
              |  FROM (SELECT doc_id, $toksSql AS t FROM documents) d),
              |tagged AS (SELECT doc_id, shingle,
              |                  CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              |                    % 100 >= 90 AS is_test
              |           FROM sh),
              |train_sh AS (SELECT DISTINCT shingle FROM tagged WHERE NOT is_test),
              |t AS (SELECT doc_id, COUNT(*) AS n_shingles,
              |             CAST(SUM(CASE WHEN shingle IN (SELECT shingle FROM train_sh)
              |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
              |      FROM tagged WHERE is_test GROUP BY doc_id)
              |SELECT doc_id, n_shingles, n_contaminated,
              |       ROUND(CAST(n_contaminated AS DOUBLE) / CAST(n_shingles AS DOUBLE), 4)
              |         AS contamination
              |FROM t ORDER BY doc_id""".stripMargin),
      (s, d) => {
        // the shared tokenized corpus (already its own projection — the
        // Dedup.shingleIndex lesson; inlined, element_at inside the shingle
        // lambda would re-split the text once per accessed element)
        val sh = TrainingQueries.cachedDocToks(s, d)
          .select(col("doc_id"),
            explode(TextAnalysis.shingles(col("toks"), 3)).as("shingle"))
          .withColumn("is_test", Splits.hashBucket(col("doc_id")) >= 90)
        val trainSh = sh.filter(!col("is_test")).select("shingle").distinct()
          .withColumn("_hit", lit(1L))
        sh.filter(col("is_test"))
          .join(trainSh, Seq("shingle"), "left_outer")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce(col("_hit"), lit(0L))).as("n_contaminated"))
          .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
            round(col("n_contaminated").cast("double") / col("n_shingles").cast("double"), 4)
              .as("contamination"))
          .orderBy("doc_id")
      }),

    Q("q147_shingle_containment",
      // Directional containment |sh(a) ∩ sh(b)| / |sh(a)| >= 0.8: the
      // asymmetric near-dup metric that catches near-SUPERSETS (quoted /
      // boilerplate-wrapped copies) where Jaccard stays low because the
      // union is dominated by the larger doc. Same inverted-index shape
      // as q36; both directions of a mutual near-copy appear.
      Some(s"""WITH ${TrainingQueries.cappedShingleCtes},
              |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
              |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
              |          FROM sh a JOIN sh b
              |            ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
              |          GROUP BY 1, 2)
              |SELECT a_id, b_id, ROUND(i::DOUBLE / ca.n_sh, 4) AS containment
              |FROM inter JOIN cnt ca ON ca.doc_id = a_id
              |WHERE ROUND(i::DOUBLE / ca.n_sh, 4) >= 0.8
              |ORDER BY a_id, b_id""".stripMargin),
      // skew guard: the CORPUS-DERIVED df cap (Dedup.adaptiveShingleDfCap,
      // rendered above) — resolves to 1024 > testdata max df (25 at
      // sf0.1), keeping the hash oracle-identical, while a skewed corpus
      // gets a cap that bounds candidate work linear in its size. Shares
      // the session-cached pair-stats relation with q36 — containment and
      // Jaccard are both projections of (inter, n_a, n_b)
      (s, d) => graft.operators.Dedup
        .containmentFromStats(TrainingQueries.cachedPairStats(s, d), threshold = 0.8)
        .orderBy("a_id", "b_id")),

    Q("q148_cdc_scd2",
      // SCD Type-2 history from the CDC event log (the lakehouse-classic
      // companion to q28's snapshot): each non-REMOVE event opens a
      // version valid [ts, next change); REMOVE closes without opening;
      // the un-closed version per key is is_current — q28's snapshot is
      // exactly the is_current slice. Validity bounds leave as formatted
      // micro-precision strings (NULL open end on both engines).
      Some(s"""SELECT id, name, props, seq, etype,
              |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
              |       strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
              |       valid_to_ts IS NULL AS is_current
              |FROM (
              |  SELECT *, LEAD(ts) OVER (
              |    PARTITION BY id, name
              |    ORDER BY ts, CAST(seq AS BIGINT)) AS valid_to_ts
              |  FROM (${Queries.cdcOracleBase}) t) v
              |WHERE event <> 'REMOVE'
              |ORDER BY CAST(id AS INT), name, CAST(seq AS BIGINT)""".stripMargin),
      (s, d) => {
        val flat = Queries.cdcFlattened(s, d).withColumn("seq_l", col("seq").cast("long"))
        graft.operators.Cdc.scd2History(flat, Seq("id", "name"),
            Seq("ingestion_timestamp", "seq_l"), eventCol = "event")
          .select(col("id"), col("name"), col("props"), col("seq"), col("etype"),
            date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
            date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"),
            col("is_current"))
          .orderBy(col("id").cast("int"), col("name"), col("seq").cast("long"))
      }),

    Q("q149_asof_forward",
      // The FORWARD as-of join (q54's mirror): each purchase picks up the
      // NEXT view's value at-or-after its time per user — union + one
      // window pass with the walk reversed (ts DESC), never a range join.
      // Inclusive at equal timestamps, ties to the lowest event_id.
      Some("""WITH u AS (
             |  SELECT user_id, ts, event_id, {'v': value} AS qr, NULL AS tv, 0 AS side
             |  FROM events WHERE event_type = 'view'
             |  UNION ALL
             |  SELECT user_id, ts, event_id, CAST(NULL AS STRUCT(v DOUBLE)), value, 1
             |  FROM events WHERE event_type = 'purchase'),
             |m AS (
             |  SELECT user_id, event_id, tv, side,
             |         (LAST_VALUE(qr IGNORE NULLS) OVER (
             |           PARTITION BY user_id ORDER BY ts DESC, side, event_id DESC
             |           ROWS UNBOUNDED PRECEDING)).v AS av
             |  FROM u)
             |SELECT user_id, event_id, ROUND(tv, 4) AS purchase_value,
             |       ROUND(av, 4) AS next_view_value
             |FROM m WHERE side = 1 ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        import graft.operators.AsOf
        import graft.Queries.r4
        val ev = Tables.events(s, d)
        val views = ev.filter(col("event_type") === "view")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts", "value")
        AsOf.joinNext(purchases, views, Seq("user_id"), "ts", "event_id",
            "value", outCol = "next_view_value")
          .select(col("user_id"), col("event_id"),
            r4(col("value")).as("purchase_value"),
            r4(col("next_view_value")).as("next_view_value"))
          .orderBy("user_id", "event_id")
      }),

    Q("q150_max_concurrency",
      // Interval-overlap maximum via the +1/-1 sweep — the stabbing query
      // that is O(n log n), never the n^2 self-join: each event opens a
      // 10-minute window; per event_type, the peak number of concurrently
      // open windows and the first instant it is reached. Half-open
      // intervals: an end at instant t frees its slot before a start at t
      // (delta -1 sorts first). Cumulative integer sums are exact in any
      // engine; the per-type window is key-partitioned (never global).
      Some("""WITH iv AS (
             |  SELECT event_type, ts AS s, ts + INTERVAL 10 MINUTE AS e, event_id
             |  FROM events),
             |pts AS (
             |  SELECT event_type, s AS t, 1 AS d, event_id FROM iv
             |  UNION ALL
             |  SELECT event_type, e AS t, -1 AS d, event_id FROM iv),
             |c AS (
             |  SELECT event_type, t, CAST(SUM(d) OVER (
             |    PARTITION BY event_type ORDER BY t, d, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
             |  FROM pts),
             |mx AS (SELECT event_type, MAX(conc) AS max_concurrent FROM c GROUP BY event_type)
             |SELECT c.event_type, mx.max_concurrent,
             |       strftime(MIN(c.t), '%Y-%m-%d %H:%M:%S.%f') AS first_peak
             |FROM c JOIN mx ON c.event_type = mx.event_type AND c.conc = mx.max_concurrent
             |GROUP BY c.event_type, mx.max_concurrent
             |ORDER BY c.event_type""".stripMargin),
      (s, d) => {
        val iv = Tables.events(s, d).select(col("event_type"),
          col("ts").as("s"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("e"), col("event_id"))
        val pts = iv.select(col("event_type"), col("s").as("t"),
            lit(1L).as("d"), col("event_id"))
          .unionByName(iv.select(col("event_type"), col("e").as("t"),
            lit(-1L).as("d"), col("event_id")))
        // the sweep's running sum per event TYPE (5 values) must not be
        // a type-partitioned window — that is one whole-stream task per
        // type at scale; GroupPrefix range-partitions the composite
        // (type, t) order instead. Materialized once for the two
        // downstream consumers (peak agg + first-peak join).
        val c = graft.operators.GroupPrefix.exclusiveRunningSum(pts,
            "event_type", Seq(col("t"), col("d"), col("event_id")), "d", "ex")
          .withColumn("conc", (col("ex") + col("d")).cast("long"))
          .localCheckpoint(true)
        val mx = c.groupBy("event_type")
          .agg(max(col("conc")).as("max_concurrent"))
          .withColumnRenamed("event_type", "et")
        c.join(broadcast(mx),
            col("event_type") === col("et") && col("conc") === col("max_concurrent"))
          .groupBy(col("event_type"), col("max_concurrent"))
          .agg(date_format(min(col("t")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_peak"))
          .select("event_type", "max_concurrent", "first_peak")
          .orderBy("event_type")
      }),

    Q("q151_pagerank_weighted",
      // Edge-weighted PageRank over the fulfillment graph: rank flows
      // proportionally to the lineitem count per (supplier, customer)
      // pair instead of uniformly — the interaction-strength variant.
      // Count weights are small integers, so r*85*w stays exact-double-
      // divisible and the iteration remains bit-stable; oracle generated
      // from the same constants. Top 20 by rank, ties by node.
      Some(s"""SELECT node, rank FROM (
              |  ${graft.operators.PageRank.fixedPointWeightedSql(
                   "SELECT l_suppkey AS src, 1000000 + o_custkey AS dst, " +
                     "COUNT(*) AS w FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
                     "GROUP BY 1, 2",
                   iterations = 3)})
              |ORDER BY rank DESC, node LIMIT 20""".stripMargin),
      (s, d) => {
        import graft.operators.PageRank
        // shared materialized (src, dst, w) graph — built once for
        // q139/q142/q151 (AnalyticsQueries.fulfillmentEdges); the
        // operator's own (src, dst) re-aggregation is a no-op on it
        PageRank.fixedPointWeighted(AnalyticsQueries.fulfillmentEdges(s, d),
            "src", "dst", "w", iterations = 3)
          .orderBy(col("rank").desc, col("node")).limit(20)
      }),

    Q("q152_triangle_count",
      // Exact triangle counting on the part co-order graph (parts are
      // adjacent when some order contains both) via the degree-ordered
      // edge-iterator: oriented wedges join on the low vertex and close
      // with one edge lookup, so each triangle counts once and no vertex
      // fans out past O(sqrt E) — the formulation that survives celebrity
      // vertices at 100 TB. Top 10 parts by triangle participation.
      Some("""WITH li AS (
             |  SELECT l_orderkey, l_partkey FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'),
             |raw AS (
             |  SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
             |  FROM li l1 JOIN li l2
             |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
             |deg AS (SELECT n, COUNT(*) AS d FROM (
             |  SELECT u AS n FROM raw UNION ALL SELECT v FROM raw) GROUP BY n),
             |o AS (SELECT CASE WHEN du.d <= dv.d THEN raw.u ELSE raw.v END AS s,
             |             CASE WHEN du.d <= dv.d THEN raw.v ELSE raw.u END AS t
             |      FROM raw JOIN deg du ON du.n = raw.u JOIN deg dv ON dv.n = raw.v),
             |tri AS (SELECT e1.s AS a, e1.t AS b, e2.t AS c
             |        FROM o e1 JOIN o e2 ON e1.s = e2.s AND e1.t <> e2.t
             |        JOIN o e3 ON e3.s = e1.t AND e3.t = e2.t),
             |pn AS (SELECT node, COUNT(*) AS tri_cnt FROM (
             |  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
             |  UNION ALL SELECT c FROM tri) GROUP BY node)
             |SELECT node, tri_cnt FROM pn
             |ORDER BY tri_cnt DESC, node LIMIT 10""".stripMargin),
      (s, d) => {
        // one quarter's co-order graph: the co-occurrence graph of the
        // full fact is quadratically dense in parts-per-order — the
        // windowed graph is the realistic analytic (and the operator is
        // subgraph-agnostic)
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select("l_orderkey", "l_partkey")
        val edges = li.as("l1").join(li.as("l2"),
            col("l1.l_orderkey") === col("l2.l_orderkey") &&
              col("l1.l_partkey") < col("l2.l_partkey"))
          .select(col("l1.l_partkey").as("src"), col("l2.l_partkey").as("dst"))
        graft.operators.Triangles.perNode(edges, "src", "dst")
          .orderBy(col("tri_cnt").desc, col("node")).limit(10)
      }),

    Q("q153_rank_fusion",
      // Reciprocal rank fusion (Cormack et al.) of two ANN retrievers —
      // the retrieval-stack combiner: RRF(d) = Σ 1/(60 + rank_d) over the
      // IVF top-20 (q44's index) and the LSH-bucket top-20 (q127's).
      // Ranks derive from the shared ROUND(cos,4)/vec_id order on BOTH
      // engines (rounded, so rank ties cannot fork cross-engine); the
      // score is a fixed two-term IEEE expression — deterministic. The
      // Spark side computes ranks with a count-of-better aggregation on
      // the 20-row lists, not a global window (the partition-less
      // WindowExec ban holds for every declared plan).
      Some {
        import ExtendedQueries.kmeansCtePrefix
        import TrainingQueries.cosOf
        def top20(src: String): String =
          s"""(SELECT vec_id, rn FROM (
             |  SELECT c.vec_id, ROW_NUMBER() OVER (
             |    ORDER BY ROUND(${cosOf("c.embedding", "q.qe")}, 4) DESC, c.vec_id) AS rn
             |  FROM $src c CROSS JOIN qv q) t WHERE rn <= 20)""".stripMargin
        s"""WITH $kmeansCtePrefix,
           |qcell AS (SELECT cid FROM (
           |  SELECT c.cid, ROW_NUMBER() OVER (
           |    ORDER BY ${cosOf("q.qe", "c.ce")} DESC, c.cid) AS rn
           |  FROM qv q CROSS JOIN c2 c) r WHERE rn = 1),
           |ivf_cand AS (SELECT a.vec_id, a.embedding FROM afinal a
           |             JOIN qcell ON a.cid = qcell.cid WHERE a.vec_id <> 0),
           |bkt AS (SELECT vec_id, embedding,
           |               ${Round4Queries.bucketSql("embedding", 64, 8)} AS bkt
           |        FROM v WHERE vec_id <> 0),
           |qb AS (SELECT ${Round4Queries.bucketSql("qe", 64, 8)} AS bkt FROM qv),
           |lsh_cand AS (SELECT b.vec_id, b.embedding FROM bkt b JOIN qb USING (bkt)),
           |ivf AS (SELECT vec_id, rn AS r_ivf FROM ${top20("ivf_cand")} t1),
           |lsh AS (SELECT vec_id, rn AS r_lsh FROM ${top20("lsh_cand")} t2)
           |SELECT vec_id, r_ivf, r_lsh,
           |       ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + r_ivf), 0)
           |             + COALESCE(CAST(1 AS DOUBLE) / (60 + r_lsh), 0), 6) AS rrf
           |FROM ivf FULL OUTER JOIN lsh USING (vec_id)
           |ORDER BY rrf DESC, vec_id LIMIT 10""".stripMargin
      },
      (s, d) => {
        import graft.operators.Similarity
        val emb = Tables.embeddings(s, d)
        val cents = ExtendedQueries.trainedCentroids(s, d) // shared deterministic training
        val assigned = Similarity.assignToCentroidsLocal(emb, cents)
          .filter(col("vec_id") =!= 0)
        val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        val ivfTop = Similarity.ivfTopK(assigned, cents, query, 20,
          "vec_id", "embedding", "qe")
        val lshTop = Similarity.lshTopK(emb.filter(col("vec_id") =!= 0), query,
          k = 20, dim = 64)
        // rank = 1 + |better rows| on the tiny top-k list: a broadcast
        // count-of-better join, not a partition-less window
        def ranked(t: org.apache.spark.sql.DataFrame, rName: String) = {
          val x = t.select(col("vec_id").as("xid"), col("sim").as("xs"))
          val y = t.select(col("vec_id").as("yid"), col("sim").as("ys"))
          x.join(broadcast(y),
              col("ys") > col("xs") ||
                (col("ys") === col("xs") && col("yid") < col("xid")),
              "left_outer")
            .groupBy(col("xid")).agg((count(col("yid")) + 1L).as(rName))
            .withColumnRenamed("xid", "vec_id")
        }
        val score = round(
          coalesce(lit(1.0) / (lit(60L) + col("r_ivf")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60L) + col("r_lsh")), lit(0.0)), 6)
        ranked(ivfTop, "r_ivf").join(ranked(lshTop, "r_lsh"), Seq("vec_id"), "full_outer")
          .select(col("vec_id"), col("r_ivf"), col("r_lsh"), score.as("rrf"))
          .orderBy(col("rrf").desc, col("vec_id")).limit(10)
      }),

    Q("q154_retention_cohorts",
      // Weekly retention cohorts — the canonical product-analytics matrix:
      // users cohorted by signup week; each later event lands in a
      // weeks-since-signup offset; cell = distinct active users. All
      // arithmetic is integer day/week math (epoch-day difference floor-
      // divided by 7 — engine-identical), counts are exact; negative
      // offsets (events logged before the signup row) are excluded on
      // both sides.
      Some("""WITH s AS (
             |  SELECT user_id, MIN(ts) AS signup_ts FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id),
             |a AS (
             |  SELECT e.user_id,
             |         CAST(FLOOR(DATEDIFF('day', DATE '1970-01-01',
             |                             CAST(s.signup_ts AS DATE)) / 7) AS BIGINT) AS cohort_week,
             |         CAST(FLOOR(DATEDIFF('day', CAST(s.signup_ts AS DATE),
             |                             CAST(e.ts AS DATE)) / 7) AS BIGINT) AS week_offset
             |  FROM events e JOIN s ON e.user_id = s.user_id)
             |SELECT cohort_week, week_offset,
             |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
             |FROM a WHERE week_offset >= 0 AND week_offset <= 8
             |GROUP BY cohort_week, week_offset
             |ORDER BY cohort_week, week_offset""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val signup = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
        val epoch = lit("1970-01-01").cast("date")
        ev.join(signup, "user_id")
          .select(col("user_id"),
            floor(datediff(col("signup_ts").cast("date"), epoch) / 7)
              .cast("long").as("cohort_week"),
            floor(datediff(col("ts").cast("date"), col("signup_ts").cast("date")) / 7)
              .cast("long").as("week_offset"))
          .filter(col("week_offset") >= 0 && col("week_offset") <= 8)
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy("cohort_week", "week_offset")
      }),

    Q("q155_countmin_estimates",
      // Count-Min point-frequency estimates beside the exact counts for
      // the 20 most frequent tokens — completing the portable sketch
      // family (HLL, bloom, minhash-estimate, Misra-Gries): 4x256
      // permutation-hashed counters (the q137 MinHash coefficient family,
      // inlined in the oracle), estimate = min over the token's 4
      // counters. All-integer, so the approximation error is itself
      // hash-checked; CmSketchSpec pins the never-underestimates bound.
      Some {
        import TrainingQueries.{h32Sql, toksSql}
        def bucket(k: Int): String = {
          val a = graft.functions.HashFunctions.permA(k)
          val b = graft.functions.HashFunctions.permB(k)
          val p = graft.functions.HashFunctions.P
          s"((h * $a + $b) % $p) % 256"
        }
        val kRows = (0 until 4).map(k => s"SELECT tok, $k AS k, ${bucket(k)} AS b FROM h")
          .mkString(" UNION ALL ")
        s"""WITH tok AS (SELECT UNNEST($toksSql) AS tok FROM documents),
           |h AS (SELECT tok, ${h32Sql.format("tok")} AS h FROM tok),
           |buck AS ($kRows),
           |sk AS (SELECT k, b, COUNT(*) AS cnt FROM buck GROUP BY k, b),
           |exact AS (SELECT tok, COUNT(*) AS exact_cnt FROM tok GROUP BY tok),
           |top AS (SELECT tok, exact_cnt FROM (
           |  SELECT tok, exact_cnt, ROW_NUMBER() OVER (
           |    ORDER BY exact_cnt DESC, tok) AS rn FROM exact) t WHERE rn <= 20),
           |pb AS (SELECT DISTINCT bk.tok, bk.k, bk.b
           |       FROM buck bk JOIN top ON top.tok = bk.tok),
           |est AS (SELECT tok, CAST(MIN(sk.cnt) AS BIGINT) AS cm_est
           |        FROM pb JOIN sk ON sk.k = pb.k AND sk.b = pb.b GROUP BY tok)
           |SELECT t.tok AS token, t.exact_cnt, e.cm_est
           |FROM top t JOIN est e USING (tok)
           |ORDER BY exact_cnt DESC, token""".stripMargin
      },
      (s, d) => {
        import graft.operators.Sketch
        // direct scan — the row-explode consumer rule (see q144)
        val toks = Tables.documents(s, d)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
        val top = exact.orderBy(col("exact_cnt").desc, col("tok")).limit(20)
        val sketch = Sketch.countMin(toks, "tok")
        val est = Sketch.cmEstimates(sketch, top.select("tok"), "tok")
        top.join(est, "tok")
          .select(col("tok").as("token"), col("exact_cnt"), col("cm_est"))
          .orderBy(col("exact_cnt").desc, col("token"))
      })
  )
}
