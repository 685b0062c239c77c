package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.TrainingQueries.toksSql
import graft.operators.{Dedup, PageRank, Profile, Similarity, TextAnalysis, TxLog}
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
        // Both window offsets pair a token with a LATER SLOT OF THE SAME
        // ARRAY, so the pair relation is a pure map-side HOF (round 16):
        // the previous self-join on (doc, p+δ) shuffled the exploded
        // token-position rows four times to reconstruct adjacency the
        // array already held. Identical pair multiset; first shuffle is
        // now the count agg itself.
        val t = TrainingQueries.cachedDocToks(s, d).select(col("toks"))
        def pairs(delta: Int) = t.filter(size(col("toks")) > delta)
          .select(explode(expr(
            s"transform(sequence(1, size(toks) - $delta), " +
              s"i -> struct(element_at(toks, i) AS ta, " +
              s"element_at(toks, i + $delta) AS tb))")).as("pr"))
          .select(col("pr.ta").as("ta"), col("pr.tb").as("tb"))
        pairs(1).unionByName(pairs(2))
          .groupBy("ta", "tb").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("ta"), col("tb")).limit(30)
      }),

    Q("q216_overlap_chunks",
      // RAG-style overlapping chunker: windows of 32 tokens at stride 24
      // (8-token overlap carries context across chunk boundaries — the
      // retrieval-chunking counterpart of q122's disjoint chunks). Pure
      // map-side sequence-explode: chunk starts ride one
      // posexplode(sequence(1, n, 24)), lengths clamp at the tail —
      // nothing shuffles until the output sort. Emitted per chunk:
      // position, clamped length, and the head token (the dedup/debug
      // anchor).
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |c AS (SELECT doc_id,
              |             UNNEST(GENERATE_SERIES(1, LEN(toks), 24)) AS sp,
              |             toks
              |      FROM t WHERE LEN(toks) >= 1)
              |SELECT doc_id,
              |       CAST((sp - 1) / 24 AS BIGINT) AS chunk_idx,
              |       CAST(sp AS BIGINT) AS start_p,
              |       CAST(LEAST(32, LEN(toks) - sp + 1) AS BIGINT) AS n_tok,
              |       toks[sp] AS head_tok
              |FROM c ORDER BY doc_id, chunk_idx""".stripMargin),
      (s, d) => TrainingQueries.cachedDocToks(s, d)
        .filter(size(col("toks")) >= 1)
        .select(col("doc_id"), col("toks"),
          posexplode(expr("sequence(1, size(toks), 24)")).as(Seq("i0", "sp")))
        .select(col("doc_id"),
          col("i0").cast("long").as("chunk_idx"),
          col("sp").cast("long").as("start_p"),
          least(lit(32), size(col("toks")) - col("sp") + 1).cast("long").as("n_tok"),
          element_at(col("toks"), col("sp")).as("head_tok"))
        .orderBy("doc_id", "chunk_idx")),

    Q("q217_binary_recall",
      // Binary-quantization recall study (the 1-bit extreme of the
      // q181/q183/q198 quantization family): 64-dim vectors compress to
      // TWO sign-bit 32-bit codes (2⁶³ would overflow BIGINT — same
      // 32-bit discipline as SimHash), candidates rank by integer
      // hamming distance, the top-40 re-rank by exact cosine, and both
      // recalls@10 are reported against the exact ranking. 32× smaller
      // than float32 — the shuffle/memory scale path when even int8 is
      // too wide; the study quantifies what that costs. All-integer
      // candidate scoring, rounded-cosine re-rank, vec_id ties.
      Some({
        def lo(e: String) =
          s"""CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEAST(LEN($e), 32)),
             |  i -> CASE WHEN $e[i] > 0 THEN CAST(POWER(2, i - 1) AS BIGINT)
             |            ELSE 0 END)) AS BIGINT)""".stripMargin
        def hi(e: String) =
          s"""CASE WHEN LEN($e) < 33 THEN 0 ELSE
             |  CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(33, LEAST(LEN($e), 64)),
             |    i -> CASE WHEN $e[i] > 0 THEN CAST(POWER(2, i - 33) AS BIGINT)
             |              ELSE 0 END)) AS BIGINT) END""".stripMargin
        s"""WITH c AS (SELECT vec_id, embedding, ${lo("embedding")} AS blo,
           |                  ${hi("embedding")} AS bhi
           |           FROM embeddings WHERE vec_id >= 5),
           |q AS (SELECT vec_id AS q_id, embedding AS qe, ${lo("embedding")} AS qlo,
           |             ${hi("embedding")} AS qhi
           |      FROM embeddings WHERE vec_id < 5),
           |s AS (SELECT q.q_id, c.vec_id,
           |             ROUND(${TrainingQueries.cosOf("c.embedding", "q.qe")}, 4) AS sim,
           |             BIT_COUNT(XOR(c.blo, q.qlo)) + BIT_COUNT(XOR(c.bhi, q.qhi)) AS ham
           |      FROM c CROSS JOIN q),
           |r AS (SELECT q_id, vec_id, sim, ham,
           |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS re,
           |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ham, vec_id) AS rb
           |      FROM s),
           |ex AS (SELECT q_id, vec_id FROM r WHERE re <= 10),
           |bi AS (SELECT q_id, vec_id FROM r WHERE rb <= 10),
           |rr AS (SELECT q_id, vec_id FROM (
           |         SELECT q_id, vec_id, ROW_NUMBER() OVER (
           |           PARTITION BY q_id ORDER BY sim DESC, vec_id) AS r2
           |         FROM r WHERE rb <= 40) t WHERE r2 <= 10),
           |hb AS (SELECT ex.q_id, COUNT(*) AS h FROM ex JOIN bi
           |       ON ex.q_id = bi.q_id AND ex.vec_id = bi.vec_id GROUP BY ex.q_id),
           |hr AS (SELECT ex.q_id, COUNT(*) AS h FROM ex JOIN rr
           |       ON ex.q_id = rr.q_id AND ex.vec_id = rr.vec_id GROUP BY ex.q_id)
           |SELECT q.q_id,
           |       ROUND(CAST(COALESCE(hb.h, 0) AS DOUBLE) / 10.0, 4) AS recall_binary,
           |       ROUND(CAST(COALESCE(hr.h, 0) AS DOUBLE) / 10.0, 4) AS recall_rerank
           |FROM q LEFT JOIN hb ON q.q_id = hb.q_id
           |       LEFT JOIN hr ON q.q_id = hr.q_id
           |ORDER BY q.q_id""".stripMargin
      }: String),
      (s, d) => {
        import graft.functions.VectorFunctions.cosine
        val emb = Tables.embeddings(s, d)
        val c = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id"), col("embedding"),
            Similarity.signBitCode("embedding", 1, 32).as("blo"),
            Similarity.signBitCode("embedding", 33, 32).as("bhi"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
            Similarity.signBitCode("embedding", 1, 32).as("qlo"),
            Similarity.signBitCode("embedding", 33, 32).as("qhi"))
        val scored = c.crossJoin(broadcast(q))
          .select(col("q_id"), col("vec_id"),
            round(cosine(col("embedding"), col("qe")), 4).as("sim"),
            (bit_count(col("blo").bitwiseXOR(col("qlo")))
              + bit_count(col("bhi").bitwiseXOR(col("qhi")))).as("ham"))
        val wE = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
        val wB = Window.partitionBy("q_id").orderBy(col("ham"), col("vec_id"))
        val ranked = scored
          .withColumn("re", row_number().over(wE))
          .withColumn("rb", row_number().over(wB))
        val ex = ranked.filter(col("re") <= 10).select("q_id", "vec_id")
        val bi = ranked.filter(col("rb") <= 10).select("q_id", "vec_id")
        val rr = ranked.filter(col("rb") <= 40)
          .withColumn("r2", row_number().over(
            Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))))
          .filter(col("r2") <= 10).select("q_id", "vec_id")
        val hb = ex.join(bi, Seq("q_id", "vec_id")).groupBy("q_id")
          .agg(count(lit(1)).as("h_bin"))
        val hr = ex.join(rr, Seq("q_id", "vec_id")).groupBy("q_id")
          .agg(count(lit(1)).as("h_rr"))
        q.select("q_id")
          .join(hb, Seq("q_id"), "left").join(hr, Seq("q_id"), "left")
          .select(col("q_id"),
            round(coalesce(col("h_bin"), lit(0L)).cast("double") / 10.0, 4)
              .as("recall_binary"),
            round(coalesce(col("h_rr"), lit(0L)).cast("double") / 10.0, 4)
              .as("recall_rerank"))
          .orderBy("q_id")
      }),

    Q("q218_profile_table",
      // One-pass table profiling (SUMMARIZE/ANALYZE-style): per column,
      // exact row/null/distinct counts and numeric min/max — the
      // arrival-QA report. ONE aggregation over one scan computes every
      // measure (the multi-distinct expands internally); min/max ride
      // try_cast(double) so the string column profiles as null bounds
      // under ANSI instead of failing, and no engine-specific
      // number-to-string formatting enters the result.
      Some("""WITH w AS (SELECT COUNT(*) AS n,
             |  SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nu1,
             |  COUNT(DISTINCT o_orderkey) AS d1,
             |  MIN(TRY_CAST(o_orderkey AS DOUBLE)) AS mn1,
             |  MAX(TRY_CAST(o_orderkey AS DOUBLE)) AS mx1,
             |  SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nu2,
             |  COUNT(DISTINCT o_custkey) AS d2,
             |  MIN(TRY_CAST(o_custkey AS DOUBLE)) AS mn2,
             |  MAX(TRY_CAST(o_custkey AS DOUBLE)) AS mx2,
             |  SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nu3,
             |  COUNT(DISTINCT o_orderstatus) AS d3,
             |  MIN(TRY_CAST(o_orderstatus AS DOUBLE)) AS mn3,
             |  MAX(TRY_CAST(o_orderstatus AS DOUBLE)) AS mx3,
             |  SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nu4,
             |  COUNT(DISTINCT o_totalprice) AS d4,
             |  MIN(TRY_CAST(o_totalprice AS DOUBLE)) AS mn4,
             |  MAX(TRY_CAST(o_totalprice AS DOUBLE)) AS mx4
             |  FROM orders)
             |SELECT col_name, n AS n_rows, n_nulls, n_distinct, min_num, max_num
             |FROM (
             |  SELECT 'o_orderkey' AS col_name, n, CAST(nu1 AS BIGINT) AS n_nulls,
             |         d1 AS n_distinct, mn1 AS min_num, mx1 AS max_num FROM w
             |  UNION ALL
             |  SELECT 'o_custkey', n, CAST(nu2 AS BIGINT), d2, mn2, mx2 FROM w
             |  UNION ALL
             |  SELECT 'o_orderstatus', n, CAST(nu3 AS BIGINT), d3, mn3, mx3 FROM w
             |  UNION ALL
             |  SELECT 'o_totalprice', n, CAST(nu4 AS BIGINT), d4, mn4, mx4 FROM w)
             |ORDER BY col_name""".stripMargin),
      (s, d) => Profile.profile(Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
        .orderBy("col_name")),

    Q("q219_txlog_restore",
      // RESTORE under the hash gate: replace → range delete → restore to
      // the pre-delete generation; reading the head back must equal the
      // untouched source table — a manifest-level rollback that copies
      // no data (the restored files are the ORIGINAL immutable files,
      // re-referenced by a new commit; TxLogDeleteSpec's sibling spec
      // pins history and retention behavior). The recovery story every
      // bad-deploy postmortem asks for, at manifest cost.
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => TxLog.read(s, restoredOrdersZone(s, d))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey")),

    Q("q220_assortativity",
      // Newman degree assortativity of the fulfillment graph: the
      // Pearson correlation between source out-degree and destination
      // in-degree across edges — the one-number answer to "do busy
      // suppliers serve busy customers", and the graph-QA check run
      // before trusting degree-targeted sampling. All sums are exact
      // integer aggregates (products < 2^53 through sf1 — the documented
      // exact-double-conversion bound); the final r is one fixed IEEE
      // expression over those exact sums, identical on both engines;
      // zero variance on either side reports 0. One distinct-edge agg,
      // two degree aggs, two equi-joins, a 1-row reduce.
      Some("""WITH e AS (SELECT DISTINCT src, dst FROM (
             |  SELECT l_suppkey AS src, 1000000 + o_custkey AS dst
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)),
             |od AS (SELECT src, COUNT(*) AS x FROM e GROUP BY src),
             |idg AS (SELECT dst, COUNT(*) AS y FROM e GROUP BY dst),
             |j AS (SELECT od.x, idg.y FROM e
             |      JOIN od USING (src) JOIN idg USING (dst)),
             |s AS (SELECT COUNT(*) AS m, SUM(x) AS sx, SUM(y) AS sy,
             |             SUM(x * y) AS sxy, SUM(x * x) AS sxx,
             |             SUM(y * y) AS syy FROM j)
             |SELECT CAST(m AS BIGINT) AS m_edges,
             |  CASE WHEN (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
             |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <= 0
             |         OR (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
             |               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
             |       THEN 0.0
             |       ELSE ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
             |                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |            / (SQRT(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
             |                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |               * SQRT(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
             |                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
             |  END AS assortativity
             |FROM s""".stripMargin),
      (s, d) => assortativity(AnalyticsQueries.fulfillmentGraph(s, d).e)),

    Q("q221_source_lang_gini",
      // Per-source language Gini impurity (1 − Σ pᵢ²) + dominant
      // language: the mixture diagnostic that flags a "monolingual"
      // source leaking other languages before per-language quotas are
      // computed from it. Exact integer counts and squared sums (Gini
      // is the log-free diversity metric — entropy's log is not
      // engine-portable, Σn²/N² is); one two-phase agg + the skew-safe
      // majority tournament.
      Some("""WITH lc AS (SELECT source, lang, COUNT(*) AS c
             |        FROM documents GROUP BY source, lang),
             |st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             |              CAST(SUM(c * c) AS BIGINT) AS ss
             |       FROM lc GROUP BY source),
             |top AS (SELECT source, lang AS top_lang FROM (
             |   SELECT source, lang, ROW_NUMBER() OVER (
             |     PARTITION BY source ORDER BY c DESC, lang) AS rn FROM lc) t
             |   WHERE rn = 1)
             |SELECT s.source, s.n AS n_docs, t.top_lang,
             |       ROUND(1.0 - CAST(s.ss AS DOUBLE)
             |             / (CAST(s.n AS DOUBLE) * CAST(s.n AS DOUBLE)), 4) AS gini
             |FROM st s JOIN top t USING (source) ORDER BY s.source""".stripMargin),
      (s, d) => {
        val lc = Tables.documents(s, d).groupBy("source", "lang")
          .agg(count(lit(1)).as("c"))
        val st = lc.groupBy("source")
          .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("ss"))
        val top = graft.operators.Skew.topKPerKey(lc, Seq(col("source")),
            Seq(col("c").desc, col("lang")), k = 1)
          .select(col("source"), col("lang").as("top_lang"))
        st.join(top, "source")
          .select(col("source"), col("n").as("n_docs"), col("top_lang"),
            round(lit(1.0) - col("ss").cast("double")
              / (col("n").cast("double") * col("n").cast("double")), 4).as("gini"))
          .orderBy("source")
      }),

    Q("q222_langid_confusion",
      // The confusion matrix of q192's trained TextCat classifier
      // against the gold labels — the eval table a pipeline inspects
      // before trusting language quotas to the classifier. Reuses the
      // session-cached classification AND the one shared oracle CTE
      // chain (the two queries can never train divergent profiles).
      // |langs|² cells at most; exact counts.
      Some(s"""WITH ${Round7bQueries.textcatPredCtes}
              |SELECT d.lang AS true_lang, p.pred_lang, COUNT(*) AS n
              |FROM pred p JOIN documents d ON d.doc_id = p.doc_id
              |GROUP BY d.lang, p.pred_lang
              |ORDER BY true_lang, pred_lang""".stripMargin),
      (s, d) => Round7bQueries.cachedTextcatPred(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"),
          col("lang").as("true_lang")), "doc_id")
        .groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n"))
        .orderBy("true_lang", "pred_lang")),

    Q("q223_simhash_proxy_eval",
      // Precision/recall of SimHash hamming ≤ 3 (q46's near-dup proxy)
      // against exact Jaccard ≥ 0.8 pairs (q36's ground truth) — the
      // one-row report that justifies (or indicts) shipping the cheap
      // 32-bit proxy instead of the shingle pipeline at 100 TB. Exact
      // pair-set intersection counts; guarded divisions.
      Some(s"""WITH ${Round7cQueries.simhashShSql},
              |sp AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              |       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |       WHERE BIT_COUNT(XOR(a.simhash, b.simhash)) <= 3),
              |jp AS (SELECT a_id, b_id FROM (${TrainingQueries.jaccardPairsSql})),
              |c AS (SELECT
              |        (SELECT COUNT(*) FROM sp JOIN jp USING (a_id, b_id)) AS tp,
              |        (SELECT COUNT(*) FROM sp) AS np,
              |        (SELECT COUNT(*) FROM jp) AS nt)
              |SELECT CAST(tp AS BIGINT) AS tp,
              |       CAST(np - tp AS BIGINT) AS fp,
              |       CAST(nt - tp AS BIGINT) AS fn,
              |       CASE WHEN np = 0 THEN 0.0
              |            ELSE ROUND(CAST(tp AS DOUBLE) / CAST(np AS DOUBLE), 4) END AS precision_,
              |       CASE WHEN nt = 0 THEN 0.0
              |            ELSE ROUND(CAST(tp AS DOUBLE) / CAST(nt AS DOUBLE), 4) END AS recall_
              |FROM c""".stripMargin),
      (s, d) => {
        import graft.operators.Dedup
        val sp = Dedup.simhashNearDups(Tables.documents(s, d), "doc_id", "text",
          maxHamming = 3, bands = 8).select("a_id", "b_id")
        val jp = Dedup.jaccardFromStats(TrainingQueries.cachedPairStats(s, d),
          threshold = 0.8).select("a_id", "b_id")
        val counts = sp.agg(count(lit(1)).as("np"))
          .crossJoin(jp.agg(count(lit(1)).as("nt")))
          .crossJoin(sp.join(jp, Seq("a_id", "b_id")).agg(count(lit(1)).as("tp")))
        counts.select(col("tp"), (col("np") - col("tp")).as("fp"),
          (col("nt") - col("tp")).as("fn"),
          when(col("np") === 0L, lit(0.0))
            .otherwise(round(col("tp").cast("double") / col("np").cast("double"), 4))
            .as("precision_"),
          when(col("nt") === 0L, lit(0.0))
            .otherwise(round(col("tp").cast("double") / col("nt").cast("double"), 4))
            .as("recall_"))
      }),

    Q("q224_group_quantiles",
      // Exact per-source length quantiles (median / p90, linear
      // interpolation — QUANTILE_CONT semantics on both engines): the
      // length-distribution summary behind batch-shape decisions (q196's
      // bucket ladder picks its powers from exactly these numbers). The
      // EXACT percentile is the point: both engines interpolate
      // (1-f)·lo + f·hi over integer inputs — a fixed IEEE expression —
      // where approximate sketches (GK/KLL/t-digest) are
      // implementation-defined and could never sit under a cross-engine
      // hash. Scale shape: one hash shuffle by group; each group's sort
      // is partition-local (groups are the parallelism unit — the right
      // shape while no single group outgrows an executor; past that,
      // the GlobalOrder two-pass form computes exact ranks per group).
      Some("""SELECT source, COUNT(*) AS n,
             |       ROUND(QUANTILE_CONT(n_chars, 0.5), 4) AS med_chars,
             |       ROUND(QUANTILE_CONT(n_chars, 0.9), 4) AS p90_chars
             |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(n_chars, 0.5)"), 4).as("med_chars"),
          round(expr("percentile(n_chars, 0.9)"), 4).as("p90_chars"))
        .orderBy("source")),

    Q("q225_global_quantiles",
      // CORPUS-WIDE exact quantiles without a single-partition sort —
      // the scale path q224's comment points at: GlobalOrder's
      // range-partitioned two-pass row numbering assigns every doc its
      // exact global rank by (n_chars, doc_id), the two rows bracketing
      // each quantile rank are filtered out (a pushdown-friendly
      // predicate, not a window), and one bounded 1-row reduce applies
      // the same (1-f)·lo + f·hi interpolation QUANTILE_CONT defines.
      // At 100 TB: one range shuffle, no task ever holds the corpus;
      // the per-engine comparison is bit-exact because every rank and
      // bracket row is integer-determined.
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |       ROUND(QUANTILE_CONT(n_chars, 0.5), 4) AS med_chars,
             |       ROUND(QUANTILE_CONT(n_chars, 0.9), 4) AS p90_chars
             |FROM documents""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val ranked = graft.operators.GlobalOrder.rowNumber(docs,
          Seq(col("n_chars"), col("doc_id")), "pos")
        val n = docs.count() // one scalar to the driver (job-count parity
        // with the prefix-scan pass GlobalOrder already runs)
        def quantile(q: Double) = {
          val r = (n - 1).toDouble * q
          val (loR, hiR) = (math.floor(r).toLong + 1L, math.ceil(r).toLong + 1L)
          val f = r - math.floor(r)
          val b = ranked.filter(col("pos") === loR || col("pos") === hiR)
            .agg(min(when(col("pos") === loR, col("n_chars"))).as("lo"),
              min(when(col("pos") === hiR, col("n_chars"))).as("hi"))
          b.select((col("lo").cast("double") * (1.0 - f)
            + col("hi").cast("double") * f).as("v"))
        }
        quantile(0.5).crossJoin(quantile(0.9).withColumnRenamed("v", "v9"))
          .select(lit(n).as("n"), round(col("v"), 4).as("med_chars"),
            round(col("v9"), 4).as("p90_chars"))
      }),

    Q("q226_jaccard_histogram",
      // The exact-Jaccard distribution over the LSH candidate pairs,
      // binned by 0.1 — the threshold-choice diagnostic beside q208's
      // hamming histogram: where the mass sits decides whether 0.8 is a
      // cliff or a ridge. Rides the session-cached inverted-index pair
      // stats (zero extra candidate generation in an inventory pass);
      // bins are exact integer floor(j*10) over the rounded jaccard, so
      // the bin edges cannot fork between engines.
      Some(s"""WITH ${TrainingQueries.cappedShingleCtes},
              |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
              |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
              |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |          GROUP BY 1, 2),
              |j AS (SELECT ROUND(i::DOUBLE / (ca.n_sh + cb.n_sh - i), 4) AS jac
              |      FROM inter
              |      JOIN cnt ca ON ca.doc_id = a_id
              |      JOIN cnt cb ON cb.doc_id = b_id),
              |b AS (SELECT LEAST(CAST(FLOOR(jac * 10) AS BIGINT), 9) AS bin FROM j)
              |SELECT bin, COUNT(*) AS n_pairs
              |FROM b GROUP BY bin ORDER BY bin""".stripMargin),
      (s, d) => Dedup.jaccardFromStats(TrainingQueries.cachedPairStats(s, d),
          threshold = 0.0)
        .select(least(floor(col("jaccard") * 10).cast("long"), lit(9L)).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
        .orderBy("bin")),

    Q("q227_cross_source_prefix_dups",
      // Cross-source LEAD-IN fingerprint sharing: source pairs whose
      // documents open with the same 32-char prefix — the boilerplate/
      // template/syndication detector (copied headers surface here even
      // when bodies diverge; full-text md5 finds nothing on this corpus
      // and a real crawl's exact copies are the easy subset anyway).
      // The byte-prefix complement of q202's n-gram sharing; distinct
      // (hash, source) bounds fan-out by the source count, output ≤
      // C(|sources|,2).
      Some("""WITH h AS (SELECT DISTINCT MD5(SUBSTR(text, 1, 32)) AS th, source
             |           FROM documents)
             |SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared_prefixes
             |FROM h a JOIN h b ON a.th = b.th AND a.source < b.source
             |GROUP BY a.source, b.source
             |ORDER BY src_a, src_b""".stripMargin),
      (s, d) => {
        val h = Tables.documents(s, d)
          .select(md5(substring(col("text"), 1, 32)).as("th"), col("source"))
          .distinct()
        h.as("a").join(h.as("b"),
            col("a.th") === col("b.th") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("shared_prefixes"))
          .orderBy("src_a", "src_b")
      }),

    Q("q228_vocab_coverage_curve",
      // Cumulative token-mass coverage of the top-k vocabulary at
      // k = 1, 2, 4, 8, 16: "how much of the corpus does a k-entry
      // vocabulary explain" — the budget curve behind q185's single-size
      // OOV rate and q204's decay ratios. The cumulative sum runs over
      // the SAME count-of-better rank join as q204 (bounded 16-row
      // relation, no partition-less window); masses are exact longs, one
      // division per row.
      Some(s"""WITH v AS (SELECT tok, COUNT(*) AS freq FROM (
              |             SELECT UNNEST($toksSql) AS tok FROM documents) s GROUP BY tok),
              |tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS t FROM v),
              |r AS (SELECT tok, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rank FROM v),
              |c AS (SELECT rank, SUM(freq) OVER (ORDER BY rank
              |        ROWS UNBOUNDED PRECEDING) AS cum FROM r)
              |SELECT CAST(rank AS BIGINT) AS k, CAST(cum AS BIGINT) AS cum_tokens,
              |       ROUND(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE), 4) AS coverage
              |FROM c CROSS JOIN tot WHERE rank IN (1, 2, 4, 8, 16)
              |ORDER BY k""".stripMargin),
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val freqs = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
        val tot = freqs.agg(sum(col("freq")).as("t"))
        val top = freqs.orderBy(col("freq").desc, col("tok")).limit(16)
        // rank and cumulative mass by count-of-better-or-equal over the
        // bounded top-16 (b covers a's whole prefix, so SUM(b.freq) IS
        // the cumulative mass at a's rank)
        val ranked = top.as("a").join(broadcast(top.as("b")),
            col("b.freq") > col("a.freq") ||
              (col("b.freq") === col("a.freq") && col("b.tok") <= col("a.tok")))
          .groupBy(col("a.tok").as("tok"))
          .agg(count(lit(1)).as("k"), sum(col("b.freq")).as("cum_tokens"))
        ranked.crossJoin(broadcast(tot))
          .filter(col("k").isin(1L, 2L, 4L, 8L, 16L))
          .select(col("k"), col("cum_tokens"),
            round(col("cum_tokens").cast("double") / col("t").cast("double"), 4)
              .as("coverage"))
          .orderBy("k")
      }),

    Q("q229_delta_novelty",
      // Incremental-corpus novelty: treating sources 0-9 as the BASE
      // crawl and 10-19 as the NEW batch, the fraction of the new
      // batch's distinct 3-gram shingles never seen in the base — the
      // "is this crawl additive or a rehash" gate run before paying to
      // process an increment (the corpus-level twin of q210's row-level
      // change feed). Exact distinct counts, one anti-join on the
      // shingle key, one division.
      Some(s"""WITH t AS (SELECT CAST(SUBSTR(source, 4) AS INT) AS sid, $toksSql AS t
              |           FROM documents),
              |g AS (SELECT sid, UNNEST(LIST_DISTINCT(CASE WHEN LEN(t) >= 3 THEN
              |         LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
              |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
              |       ELSE [] END)) AS sh
              |      FROM t),
              |b AS (SELECT DISTINCT sh FROM g WHERE sid < 10),
              |dl AS (SELECT DISTINCT sh FROM g WHERE sid >= 10),
              |novel AS (SELECT COUNT(*) AS nn FROM dl
              |          WHERE sh NOT IN (SELECT sh FROM b))
              |SELECT (SELECT COUNT(*) FROM b) AS base_grams,
              |       (SELECT COUNT(*) FROM dl) AS delta_grams,
              |       CAST(nn AS BIGINT) AS novel_grams,
              |       ROUND(CAST(nn AS DOUBLE)
              |             / CAST((SELECT COUNT(*) FROM dl) AS DOUBLE), 4) AS novelty
              |FROM novel""".stripMargin),
      (s, d) => {
        val g = TrainingQueries.cachedDocToks(s, d)
          .select(substring(col("source"), 4, 10).cast("int").as("sid"),
            col("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("sid"), explode(array_distinct(expr(
            "transform(sequence(1, size(toks) - 2), " +
              "i -> concat_ws(' ', slice(toks, i, 3)))"))).as("sh"))
        val base = g.filter(col("sid") < 10).select("sh").distinct()
        val delta = g.filter(col("sid") >= 10).select("sh").distinct()
        val novel = delta.join(base, Seq("sh"), "left_anti")
        base.agg(count(lit(1)).as("base_grams"))
          .crossJoin(delta.agg(count(lit(1)).as("delta_grams")))
          .crossJoin(novel.agg(count(lit(1)).as("novel_grams")))
          .select(col("base_grams"), col("delta_grams"), col("novel_grams"),
            round(col("novel_grams").cast("double")
              / col("delta_grams").cast("double"), 4).as("novelty"))
      }),

    Q("q230_centroid_drift",
      // Embedding-batch drift monitor: per label, the cosine between the
      // even-id and odd-id batches' centroid DIRECTIONS — the "did the
      // encoder or the data shift between exports" check. Scale-
      // invariance does the heavy determinism lifting: cos(Σᵉ/nᵉ, Σᵒ/nᵒ)
      // = cos(Σᵉ, Σᵒ), so the engine compares EXACT per-dim integer sums
      // of 10⁻⁴-quantized values (the q207 discipline) and only the
      // final cosine touches IEEE — a fixed in-order fold both engines
      // share. Shapes: one posexplode, a (label, parity, dim) two-phase
      // agg, ordered-array assembly, |labels| rows out.
      Some("""WITH x AS (SELECT label, vec_id % 2 AS par, i AS pos,
             |             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000.0, 0) AS BIGINT) AS v4
             |           FROM embeddings, (SELECT UNNEST(GENERATE_SERIES(1,
             |                (SELECT MAX(LEN(embedding)) FROM embeddings))) AS i)),
             |s AS (SELECT label, par, pos, SUM(v4) AS sv FROM x GROUP BY 1, 2, 3),
             |a AS (SELECT label, par, LIST(sv ORDER BY pos) AS vec FROM s GROUP BY 1, 2),
             |e AS (SELECT label,
             |        MAX(CASE WHEN par = 0 THEN vec END) AS ve,
             |        MAX(CASE WHEN par = 1 THEN vec END) AS vo
             |      FROM a GROUP BY label),
             |n AS (SELECT label,
             |        CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
             |        CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
             |      FROM embeddings GROUP BY label)
             |SELECT n.label, n.n_even, n.n_odd,
             |       ROUND((CASE WHEN SQRT(LIST_AGGREGATE(LIST_TRANSFORM(ve, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
             |                        * SQRT(LIST_AGGREGATE(LIST_TRANSFORM(vo, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) = 0.0
             |                   THEN 0.0
             |                   ELSE LIST_AGGREGATE(LIST_TRANSFORM(
             |                          GENERATE_SERIES(1, LEN(ve)),
             |                          i -> CAST(ve[i] AS DOUBLE) * CAST(vo[i] AS DOUBLE)), 'sum')
             |                        / (SQRT(LIST_AGGREGATE(LIST_TRANSFORM(ve, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
             |                           * SQRT(LIST_AGGREGATE(LIST_TRANSFORM(vo, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
             |              END), 4) AS drift_cos
             |FROM n JOIN e ON e.label = n.label
             |ORDER BY n.label""".stripMargin),
      (s, d) => {
        // double-array cosine with the oracle's exact op order (the
        // float kernel would quantize the exact integer sums past 2^24)
        def ddot(a: String, b: String) = expr(
          s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
        def cosD(a: String, b: String) = {
          val den = sqrt(ddot(a, a)) * sqrt(ddot(b, b))
          when(den === 0.0, lit(0.0)).otherwise(ddot(a, b) / den)
        }
        val emb = Tables.embeddings(s, d)
        val x = emb.select(col("label"), (col("vec_id") % 2).as("par"),
            posexplode(col("embedding")).as(Seq("p0", "v")))
          .select(col("label"), col("par"), (col("p0") + 1).as("pos"),
            round(col("v").cast("double") * lit(10000.0), 0).cast("long").as("v4"))
        val sums = x.groupBy("label", "par", "pos").agg(sum(col("v4")).as("sv"))
        val arrs = sums.groupBy("label", "par")
          .agg(expr("transform(array_sort(collect_list(struct(pos, sv))), p -> cast(p.sv as double))")
            .as("vec"))
        val e = arrs.groupBy("label")
          .agg(max(when(col("par") === 0, col("vec"))).as("ve"),
            max(when(col("par") === 1, col("vec"))).as("vo"))
        val n = emb.groupBy("label")
          .agg(sum((col("vec_id") % 2 === 0).cast("long")).as("n_even"),
            sum((col("vec_id") % 2 === 1).cast("long")).as("n_odd"))
        n.join(e, "label")
          .select(col("label"), col("n_even"), col("n_odd"),
            round(cosD("ve", "vo"), 4).as("drift_cos"))
          .orderBy("label")
      }),

    Q("q231_bpe_fertility",
      // Tokenizer FERTILITY per language: mean BPE symbols per
      // whitespace word under q191's trained merges — the multilingual
      // fairness metric ("tokenizer premium": a language with 2× the
      // fertility pays 2× the sequence length for the same text). Same
      // shared training chain as q191/q197 (profiles can never diverge);
      // exact long sums, one division per language.
      Some(s"""${Round7Queries.bpeChainSql(3, keepTok = true)},
              |v AS (SELECT tok,
              |        CAST(LEN(s) - LEN(REPLACE(s, '<', '')) AS BIGINT) AS n_sym
              |      FROM s3),
              |d AS (SELECT lang, UNNEST($toksSql) AS tok FROM documents)
              |SELECT lang, COUNT(*) AS n_tok,
              |       CAST(SUM(v.n_sym) AS BIGINT) AS n_sym,
              |       ROUND(CAST(SUM(v.n_sym) AS DOUBLE)
              |             / CAST(COUNT(*) AS DOUBLE), 4) AS fertility
              |FROM d JOIN v USING (tok)
              |GROUP BY lang ORDER BY lang""".stripMargin),
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val tc = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        val v = graft.operators.Bpe.appliedSymbolCounts(tc, rounds = 3)
        toks.join(v, "tok")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_tok"),
            sum(col("n_sym")).cast("long").as("n_sym"),
            round(sum(col("n_sym")).cast("double")
              / count(lit(1)).cast("double"), 4).as("fertility"))
          .orderBy("lang")
      }),

    Q("q232_packing_efficiency",
      // The one-row efficiency report over q123's greedy sequence
      // packing (capacity 500): bin count, token totals, mean fill, and
      // the straddle overflow — what fraction of capacity the packer
      // wastes or overhangs. Everything derives from the same
      // GlobalOrder prefix scan as q123 (no single-task window), then
      // ONE bounded 1-row reduce; fills are exact rationals rounded.
      Some("""WITH t AS (
             |  SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, n_tok,
             |         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
             |  FROM t),
             |b AS (SELECT CAST(FLOOR(cum_before / 500.0) AS BIGINT) AS bin,
             |             CAST(SUM(n_tok) AS BIGINT) AS tt
             |      FROM c GROUP BY 1)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
             |       CAST(SUM(tt) AS BIGINT) AS total_tokens,
             |       CAST(MIN(tt) AS BIGINT) AS min_bin_tokens,
             |       CAST(MAX(tt) AS BIGINT) AS max_bin_tokens,
             |       ROUND(CAST(SUM(tt) AS DOUBLE)
             |             / (CAST(COUNT(*) AS DOUBLE) * 500.0), 4) AS mean_fill
             |FROM b""".stripMargin),
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
        graft.operators.GlobalOrder
          .exclusiveRunningSum(toks, Seq(col("doc_id")), "n_tok", "cum_before")
          .groupBy(floor(col("cum_before") / lit(500.0)).cast("long").as("bin"))
          .agg(sum(col("n_tok")).as("tt"))
          .agg(count(lit(1)).as("n_bins"),
            sum(col("tt")).cast("long").as("total_tokens"),
            min(col("tt")).cast("long").as("min_bin_tokens"),
            max(col("tt")).cast("long").as("max_bin_tokens"),
            round(sum(col("tt")).cast("double")
              / (count(lit(1)).cast("double") * lit(500.0)), 4).as("mean_fill"))
      }),

    Q("q233_dedup_reduction",
      // The corpus-reduction REPORT of the full dedup pipeline: per
      // source, how many documents and tokens survive q174's resolution
      // (LSH candidates → exact verify → connected components → best-
      // quality survivor per cluster). The number a data lead actually
      // reads — "dedup cost us X% of source Y" — and the composition
      // capstone of the q36/q37/q56/q174 chain, all off the one
      // session-cached cluster relation. Exact counts, one division.
      Some(s"""WITH RECURSIVE pairs AS (
              |  SELECT a_id, b_id FROM (${TrainingQueries.jaccardPairsExactSql})),
              |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              |          UNION ALL SELECT b_id, a_id FROM pairs),
              |reach(node, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.node),
              |cl AS (SELECT node AS doc_id, MIN(r) AS cluster_id
              |       FROM reach GROUP BY node),
              |q AS (SELECT doc_id,
              |        ROUND(LEAST(LEN(t) / 100.0, 1.0) *
              |          (1.0 - LEN(LIST_FILTER(t, x -> x IN ('the','a','of','and','to','in')))::DOUBLE
              |           / LEN(t)), 4) AS quality
              |      FROM (SELECT doc_id, $toksSql AS t FROM documents) d),
              |m AS (SELECT cl.cluster_id, cl.doc_id, q.quality
              |      FROM cl JOIN q USING (doc_id)),
              |w AS (SELECT doc_id FROM (
              |        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY cluster_id
              |          ORDER BY quality DESC, doc_id) AS rn FROM m) t WHERE rn = 1),
              |dropped AS (SELECT doc_id FROM m
              |            WHERE doc_id NOT IN (SELECT doc_id FROM w)),
              |t AS (SELECT doc_id, source, CAST(LEN($toksSql) AS BIGINT) AS n_tok
              |      FROM documents)
              |SELECT source, COUNT(*) AS docs_total,
              |       CAST(SUM(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_dropped,
              |       CAST(SUM(t.n_tok) AS BIGINT) AS tokens_total,
              |       CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN t.n_tok ELSE 0 END) AS BIGINT) AS tokens_kept,
              |       ROUND(CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN t.n_tok ELSE 0 END) AS DOUBLE)
              |             / CAST(SUM(t.n_tok) AS DOUBLE), 4) AS keep_ratio
              |FROM t LEFT JOIN dropped dr ON dr.doc_id = t.doc_id
              |GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => {
        val cl = ExtendedQueries.cachedDupClusters(s, d)
        val q = Tables.documents(s, d).select(col("doc_id"),
          round(TextAnalysis.qualityScore(TextAnalysis.tokens(col("text"))), 4)
            .as("quality"))
        val winners = cl.join(q, "doc_id")
          .groupBy("cluster_id")
          .agg(max(struct(col("quality"), (-col("doc_id")).as("nd"),
            col("doc_id").as("sid"))).as("w"))
          .select(col("w.sid").as("doc_id"))
        val dropped = cl.select("doc_id")
          .join(winners, Seq("doc_id"), "left_anti")
          .withColumn("is_dropped", lit(1L))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
          .join(dropped, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("docs_total"),
            sum(coalesce(col("is_dropped"), lit(0L))).cast("long").as("docs_dropped"),
            sum(col("n_tok")).cast("long").as("tokens_total"),
            sum(when(col("is_dropped").isNull, col("n_tok")).otherwise(0L))
              .cast("long").as("tokens_kept"),
            round(sum(when(col("is_dropped").isNull, col("n_tok")).otherwise(0L))
              .cast("double") / sum(col("n_tok")).cast("double"), 4)
              .as("keep_ratio"))
          .orderBy("source")
      }),

    Q("q234_cdc_stream_pipeline",
      // The reference's ENTIRE architecture as one hash-checked query:
      // three overlapping keyed CDC batches land in a staging zone, a
      // real Structured Streaming query reads them through the txlog
      // SOURCE and upserts into a current-state zone through the
      // exactly-once merge SINK (per-key last-writer-wins by seq), and
      // the state zone is read back — it must hash-equal the relational
      // LWW over the batch union. Stream-in/stream-out, offsets,
      // batch-LWW reduce, stats-pruned merges, and the manifest commit
      // protocol all sit under the same gate as a GROUP BY. (The
      // micro-batch CUT is engine-timing-dependent — one batch may carry
      // one or three generations — but LWW is associative across any
      // cut, so the final state is cut-invariant; that invariance is
      // exactly what the hash pins.)
      Some("""WITH b1 AS (SELECT o_orderkey, CAST(1 AS BIGINT) AS seq, o_totalprice
             |            FROM orders WHERE o_orderkey < 1000),
             |b2 AS (SELECT o_orderkey, CAST(2 AS BIGINT), o_totalprice
             |       FROM orders WHERE o_orderkey BETWEEN 500 AND 1499),
             |b3 AS (SELECT o_orderkey, CAST(3 AS BIGINT), o_totalprice
             |       FROM orders WHERE o_orderkey BETWEEN 1000 AND 1999),
             |u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2
             |      UNION ALL SELECT * FROM b3)
             |SELECT o_orderkey, seq, o_totalprice FROM (
             |  SELECT o_orderkey, seq, o_totalprice, ROW_NUMBER() OVER (
             |    PARTITION BY o_orderkey ORDER BY seq DESC) AS rn FROM u) t
             |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin),
      (s, d) => TxLog.read(s, cdcLoopZone(s, d))
        .select(col("o_orderkey"), col("seq"), col("o_totalprice"))
        .orderBy("o_orderkey"))
  )

  /** The full lake loop per (JVM, sf dir), for q234: a staging zone
    * accumulates three overlapping keyed batches (replace + 2 appends,
    * seq-stamped), a REAL Structured Streaming query reads it through
    * the txlog source and upserts into a state zone via the exactly-once
    * CDC merge sink, and the builder returns the state zone — the
    * reference's entire architecture (CDC stream → lake → current
    * state), executed, then hash-checked against the relational LWW. */
  private val loopZones = scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def cdcLoopZone(s: org.apache.spark.sql.SparkSession,
                                 d: String): String =
    loopZones.getOrElseUpdate(d, {
      val staging = java.nio.file.Files
        .createTempDirectory("graft_q234s").toString + "/zone"
      val state = java.nio.file.Files
        .createTempDirectory("graft_q234t").toString + "/zone"
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
      TxLog.replace(s, staging,
        base.filter(col("o_orderkey") < 1000)
          .select(col("o_orderkey"), lit(1L).as("seq"), col("o_totalprice")))
      TxLog.append(s, staging,
        base.filter(col("o_orderkey").between(500, 1499))
          .select(col("o_orderkey"), lit(2L).as("seq"), col("o_totalprice")))
      TxLog.append(s, staging,
        base.filter(col("o_orderkey").between(1000, 1999))
          .select(col("o_orderkey"), lit(3L).as("seq"), col("o_totalprice")))
      val q = s.readStream.format("txlog").option("zone", staging).load()
        .writeStream
        .foreachBatch(TxLog.cdcMergeSink(state, "o_orderkey", "seq"))
        .outputMode("update").start()
      q.processAllAvailable(); q.stop()
      state
    })

  /** One restored-orders zone per (JVM, sf dir): replace → range delete
    * → restore to the pre-delete generation. */
  private val restoreZones = scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def restoredOrdersZone(s: org.apache.spark.sql.SparkSession,
                                        d: String): String =
    restoreZones.getOrElseUpdate(d, {
      val zone = java.nio.file.Files
        .createTempDirectory("graft_q219").toString + "/zone"
      val g = TxLog.replace(s, zone,
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .repartitionByRange(8, col("o_orderkey")),
        statsCols = Seq("o_orderkey")).gen
      TxLog.deleteWhereCol(s, zone, "o_orderkey", 200, 399)
      TxLog.restore(s, zone, g)
      zone
    })

  /** Newman degree assortativity over a distinct edge list — see q220. */
  private[graft] def assortativity(e: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val od = e.groupBy("src").agg(count(lit(1)).as("x"))
    val idg = e.groupBy("dst").agg(count(lit(1)).as("y"))
    val s = e.join(od, "src").join(idg, "dst")
      .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    def d(c: String) = col(c).cast("double")
    val varX = d("m") * d("sxx") - d("sx") * d("sx")
    val varY = d("m") * d("syy") - d("sy") * d("sy")
    val r = round((d("m") * d("sxy") - d("sx") * d("sy"))
      / (sqrt(varX) * sqrt(varY)), 4)
    s.select(col("m").as("m_edges"),
      when(varX <= 0.0 || varY <= 0.0, lit(0.0)).otherwise(r)
        .as("assortativity"))
  }
}
