package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.TrainingQueries.toksSql
import graft.operators.{GlobalOrder, Skew}
import graft.sources.Tables

/** Round-8 additions: corpus-curation planning operators — decay-weighted
  * activity, exact largest-remainder quota allocation, vocabulary-growth
  * (Heaps) curves, winsorized length gating, an integer-exact nearest-
  * centroid classifier screen, and per-document keyword extraction.
  * Same determinism discipline as the whole inventory: integer or
  * power-of-two-exact arithmetic everywhere, ONE IEEE division per
  * output value at most, total tie orders, no log/exp. */
object Round8Queries {

  /** Largest-remainder (Hamilton) allocation of `budget` over a
    * per-source count CTE named `c(source, n_docs)` — shared by q236
    * (raw counts) and q243 (deduped counts) so the twins can never
    * fork. All integer: floor quotas, then +1 to the largest remainders
    * (ties by source name), via a count-of-better self-join over the
    * ~|sources| aggregate — no window. */
  private def hamiltonSql(cCte: String, budget: Int): String =
    s"""WITH c AS ($cCte),
       |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM c),
       |b AS (SELECT source, n_docs,
       |        ($budget * n_docs) // total AS base,
       |        ($budget * n_docs) % total AS rem
       |      FROM c, t),
       |e AS (SELECT $budget - CAST(SUM(base) AS BIGINT) AS extra FROM b),
       |r AS (SELECT b.source, b.n_docs, b.base, b.rem,
       |        (SELECT COUNT(*) FROM b b2 WHERE b2.rem > b.rem
       |           OR (b2.rem = b.rem AND b2.source < b.source)) AS rk
       |      FROM b)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(base + CASE WHEN rk < e.extra THEN 1 ELSE 0 END AS BIGINT) AS quota
       |FROM r, e ORDER BY source""".stripMargin

  /** The Spark twin of [[hamiltonSql]]: `c` must be (source, n_docs). */
  private def hamilton(c: org.apache.spark.sql.DataFrame,
                       budget: Int): org.apache.spark.sql.DataFrame = {
    val t = c.agg(sum(col("n_docs")).cast("long").as("total"))
    val b = c.crossJoin(broadcast(t))
      .select(col("source"), col("n_docs"),
        expr(s"($budget * n_docs) div total").as("base"),
        expr(s"($budget * n_docs) % total").as("rem"))
    val e = b.agg((lit(budget) - sum(col("base")).cast("long")).as("extra"))
    val b2 = b.select(col("source").as("s2"), col("rem").as("rem2"))
    val rk = b.join(broadcast(b2),
        col("rem2") > col("rem") ||
          (col("rem2") === col("rem") && col("s2") < col("source")),
        "left")
      .groupBy("source", "n_docs", "base", "rem")
      .agg(count(col("s2")).as("rk"))
    rk.crossJoin(broadcast(e))
      .select(col("source"), col("n_docs").cast("long").as("n_docs"),
        (col("base") + when(col("rk") < col("extra"), 1L).otherwise(0L))
          .cast("long").as("quota"))
      .orderBy("source")
  }

  def all: Seq[Q] = Seq(

    Q("q235_decayed_activity",
      // Half-life-decayed per-user activity score: weight 2^(20-age)
      // where age = weeks before the corpus's newest day, clamped at 20
      // — the recency prior a feed/retention pipeline ranks by. EXACT:
      // weights are powers of two summed as BIGINT (no float decay —
      // exp() is neither portable nor needed), the anchor is
      // data-derived (max event date), and the top-100 order is total.
      // Scale shape: one scan -> map-side weight -> hash agg by user ->
      // TakeOrdered 100; the 1-row anchor broadcasts.
      Some("""WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS d FROM events),
             |w AS (SELECT user_id,
             |        CAST(POWER(2, 20 - LEAST(DATE_DIFF('day', CAST(ts AS DATE), mx.d) // 7,
             |                                 20)) AS BIGINT) AS wt
             |      FROM events, mx)
             |SELECT user_id, CAST(SUM(wt) AS BIGINT) AS decayed_score
             |FROM w GROUP BY user_id
             |ORDER BY decayed_score DESC, user_id LIMIT 100""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("date").as("dt"))
        val mx = ev.agg(max(col("dt")).as("d"))
        ev.crossJoin(broadcast(mx))
          .select(col("user_id"),
            pow(lit(2.0), lit(20) - least(expr("datediff(d, dt) div 7"), lit(20)))
              .cast("long").as("wt"))
          .groupBy("user_id")
          .agg(sum(col("wt")).as("decayed_score"))
          .orderBy(col("decayed_score").desc, col("user_id"))
          .limit(100)
      }),

    Q("q236_stratified_quota",
      // Largest-remainder (Hamilton) allocation of a 1000-doc sampling
      // budget across sources proportional to size — the exact-integer
      // way to turn mixture weights into per-source quotas that sum to
      // the budget (floor everything, then give the +1s to the largest
      // remainders; ties broken by source name). The allocation a
      // training-mix sampler (q165's weights, q199's balancer) actually
      // executes. All integer; the rank is a count-of-better self-join
      // over the ~|sources| aggregate, never a window.
      Some(hamiltonSql(
        "SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source",
        budget = 1000)),
      (s, d) => hamilton(
        Tables.documents(s, d).groupBy("source").agg(count(lit(1)).as("n_docs")),
        budget = 1000)),

    Q("q237_vocab_growth",
      // Heaps-law vocabulary growth curve: distinct-token counts after
      // the first n/4, n/2, 3n/4, and n documents (in doc_id order) —
      // the diagnostic that says whether more data still buys new
      // vocabulary. Each token contributes its FIRST-occurrence ordinal
      // only (one row per distinct token, not per occurrence), and the
      // ordinal comes from GlobalOrder's two-pass row number — no
      // single-partition window at any size. The four thresholds
      // broadcast against the token relation.
      Some(s"""WITH d AS (SELECT doc_id, text,
              |            ROW_NUMBER() OVER (ORDER BY doc_id) AS ord FROM documents),
              |tok AS (SELECT t AS token, MIN(ord) AS first_ord
              |        FROM d, UNNEST($toksSql) AS u(t)
              |        GROUP BY t),
              |n AS (SELECT COUNT(*) AS nd FROM documents),
              |ks AS (SELECT CAST((nd * k) // 4 AS BIGINT) AS k
              |       FROM n, UNNEST([1, 2, 3, 4]) AS kk(k))
              |SELECT k, CAST((SELECT COUNT(*) FROM tok WHERE first_ord <= k) AS BIGINT) AS vocab
              |FROM ks ORDER BY k""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val ordered = GlobalOrder.rowNumber(docs, Seq(col("doc_id")), "ord")
        val firstOrd = ordered
          .select(col("ord"),
            explode(graft.operators.TextAnalysis.tokens(col("text"))).as("token"))
          .groupBy("token").agg(min(col("ord")).as("first_ord"))
        val n = docs.agg(count(lit(1)).as("nd"))
        val ks = n.select(explode(array(lit(1), lit(2), lit(3), lit(4))).as("kk"),
            col("nd"))
          .select(expr("(nd * kk) div 4").cast("long").as("k"))
        firstOrd.join(broadcast(ks), col("first_ord") <= col("k"))
          .groupBy("k").agg(count(lit(1)).cast("long").as("vocab"))
          .orderBy("k")
      }),

    Q("q238_winsor_trim",
      // Winsorized length gate: per source, the nearest-rank p10/p90
      // token-length bounds and how many docs survive trimming to them —
      // the outlier fence a curation pipeline applies before length
      // statistics mean anything. Ranks come from GroupPrefix's
      // range-partitioned composite (source, len) order — NOT a
      // source-partitioned window, which would be one whole-table task
      // per source — and the per-source bounds broadcast back against
      // the lengths.
      Some(s"""WITH l AS (SELECT source, doc_id,
              |            CAST(LEN($toksSql) AS BIGINT) AS len FROM documents),
              |r AS (SELECT source, len,
              |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY len, doc_id) AS rk,
              |        COUNT(*) OVER (PARTITION BY source) AS n
              |      FROM l),
              |b AS (SELECT source,
              |        MAX(CASE WHEN rk = (n + 9) // 10 THEN len END) AS lo,
              |        MAX(CASE WHEN rk = (9 * n + 9) // 10 THEN len END) AS hi
              |      FROM r GROUP BY source)
              |SELECT b.source, lo, hi,
              |       CAST(SUM(CASE WHEN l.len BETWEEN lo AND hi THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
              |FROM b JOIN l ON l.source = b.source
              |GROUP BY b.source, lo, hi ORDER BY b.source""".stripMargin),
      (s, d) => {
        // per-SOURCE ranks via GroupPrefix (20 sources would be 20
        // whole-table window tasks at scale; the range-partitioned
        // composite order keeps parallelism independent of the source
        // count). Tokenized lengths materialize once for the rank pass
        // and the final trim count.
        val l = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            size(graft.operators.TextAnalysis.tokens(col("text")))
              .cast("long").as("len"))
          .localCheckpoint(true)
        val r = graft.operators.GroupPrefix.rowNumber(l, "source",
            Seq(col("len"), col("doc_id")), "rk", keepTotals = true)
          .withColumnRenamed("_gp_tot", "n")
        val b = r.groupBy("source").agg(
          max(when(col("rk") === expr("(n + 9) div 10"), col("len"))).as("lo"),
          max(when(col("rk") === expr("(9 * n + 9) div 10"), col("len"))).as("hi"))
        l.join(broadcast(b), Seq("source"))
          .groupBy("source", "lo", "hi")
          .agg(sum(when(col("len").between(col("lo"), col("hi")), 1L)
            .otherwise(0L)).cast("long").as("n_kept"))
          .select("source", "lo", "hi", "n_kept")
          .orderBy("source")
      }),

    Q("q239_centroid_confusion",
      // Nearest-centroid classifier screen over the embedding table: the
      // label-vs-predicted confusion counts that say whether the
      // embedding space separates the labels at all (the 1-NN-to-
      // centroid baseline every probing paper reports first). INTEGER-
      // EXACT end to end: values quantize to floor((x+2)*1024) (shift
      // keeps them non-negative so truncating and flooring division
      // agree across engines; *1024 is a power of two, exact on floats),
      // centroids are integer-divided sums, distances are BIGINT sums of
      // squares, and argmin ties break to the smaller label. Scale
      // shape: quantized codes explode to (vec, dim) rows once; the 640-
      // row centroid table broadcasts; no float ever rides the shuffle.
      Some("""WITH q AS (SELECT vec_id, label, i,
             |        CAST(FLOOR((embedding[i] + 2) * 1024) AS BIGINT) AS qv
             |      FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS s(i)),
             |cent AS (SELECT label AS clabel, i, SUM(qv) // COUNT(*) AS cq
             |         FROM q GROUP BY label, i),
             |dist AS (SELECT q.vec_id, q.label, cent.clabel,
             |           SUM((q.qv - cent.cq) * (q.qv - cent.cq)) AS d2
             |         FROM q JOIN cent USING (i) GROUP BY q.vec_id, q.label, cent.clabel),
             |p AS (SELECT vec_id, label, clabel,
             |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
             |      FROM dist)
             |SELECT CAST(label AS BIGINT) AS label, CAST(clabel AS BIGINT) AS pred,
             |       COUNT(*) AS n
             |FROM p WHERE rn = 1 GROUP BY label, clabel ORDER BY label, pred""".stripMargin),
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("i0", "val")))
          .select(col("vec_id"), col("label"), (col("i0") + 1).as("i"),
            floor((col("val").cast("double") + lit(2.0)) * lit(1024.0))
              .cast("long").as("qv"))
        val cent = q.groupBy(col("label").as("clabel"), col("i"))
          .agg(expr("sum(qv) div count(*)").as("cq"))
        val dist = q.join(broadcast(cent), Seq("i"))
          .groupBy("vec_id", "label", "clabel")
          .agg(sum((col("qv") - col("cq")) * (col("qv") - col("cq"))).as("d2"))
        dist.groupBy("vec_id", "label")
          .agg(min(struct(col("d2"), col("clabel"))).as("w"))
          .select(col("label").cast("long").as("label"),
            col("w.clabel").cast("long").as("pred"))
          .groupBy("label", "pred").agg(count(lit(1)).as("n"))
          .orderBy("label", "pred")
      }),

    Q("q240_doc_keywords",
      // Per-document keyword extraction: the top-3 tokens by tf/df (term
      // frequency over corpus document frequency — the idf-flavored
      // salience score with NO log, so it stays engine-portable). One
      // IEEE division per (doc, token) score; the (score desc, token)
      // tie order is total. The engine runs the skew-safe fixed-k
      // tournament (topKPerKey) instead of a per-doc window over the
      // full score relation; the 3-row-per-doc result then ranks in a
      // partitioned window that touches 3 rows per task.
      Some(s"""WITH tok AS (SELECT doc_id, t AS token
              |             FROM documents, UNNEST($toksSql) AS u(t)),
              |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
              |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
              |sc AS (SELECT doc_id, token, CAST(tf AS DOUBLE) / df AS score
              |       FROM tf JOIN df USING (token)),
              |r AS (SELECT doc_id, token, score,
              |        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn
              |      FROM sc)
              |SELECT doc_id, token, CAST(rn AS BIGINT) AS rn
              |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(graft.operators.TextAnalysis.tokens(col("text"))).as("token"))
        val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df = tok.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
        val sc = tf.join(df, Seq("token"))
          .select(col("doc_id"), col("token"),
            (col("tf").cast("double") / col("df")).as("score"))
        val top = Skew.topKPerKey(sc, Seq(col("doc_id")),
          Seq(col("score").desc, col("token")), k = 3)
        top.select(col("doc_id"), col("token"),
            row_number().over(Window.partitionBy("doc_id")
              .orderBy(col("score").desc, col("token"))).cast("long").as("rn"))
          .orderBy("doc_id", "rn")
      }),

    Q("q241_novelty_curve",
      // Per-decile novelty curve: processing docs in doc_id order, what
      // fraction of each decile's distinct 3-gram shingles was never
      // seen in ANY earlier doc — the marginal-value-of-more-data curve
      // (q229 answers it once for one base/delta split; this is the
      // whole trajectory). A gram charges its FIRST doc only (min
      // ordinal), ordinals come from GlobalOrder (no single-partition
      // window), and the doc count broadcasts for the decile bucketing.
      // ROUND at the edge, one division per decile.
      Some(s"""WITH d AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS ord,
              |            $toksSql AS t FROM documents),
              |g AS (SELECT ord, UNNEST(LIST_DISTINCT(CASE WHEN LEN(t) >= 3 THEN
              |         LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
              |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
              |       ELSE [] END)) AS sh
              |      FROM d),
              |f AS (SELECT sh, MIN(ord) AS first_ord FROM g GROUP BY sh),
              |n AS (SELECT COUNT(*) AS nd FROM documents),
              |p AS (SELECT g.ord, COUNT(*) AS total,
              |        SUM(CASE WHEN f.first_ord = g.ord THEN 1 ELSE 0 END) AS novel
              |      FROM g JOIN f USING (sh) GROUP BY g.ord)
              |SELECT CAST(((ord - 1) * 10) // nd AS BIGINT) AS decile,
              |       CAST(SUM(novel) AS BIGINT) AS novel_grams,
              |       CAST(SUM(total) AS BIGINT) AS total_grams,
              |       ROUND(CAST(SUM(novel) AS DOUBLE) / SUM(total), 4) AS novelty
              |FROM p, n GROUP BY decile ORDER BY decile""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val ordered = GlobalOrder.rowNumber(docs, Seq(col("doc_id")), "ord")
        val g = ordered
          .select(col("ord"),
            graft.operators.TextAnalysis.tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 3)
          .select(col("ord"), explode(array_distinct(
            graft.operators.TextAnalysis.shingles(col("t"), 3))).as("sh"))
          // exchange barrier (round 16, the pairStats idiom): first-seen
          // agg and the join both need hash(sh); without it each computes
          // its own exchange and the tokenize+shingle chain runs twice
          .repartition(col("sh"))
        val f = g.groupBy("sh").agg(min(col("ord")).as("first_ord"))
        val n = docs.agg(count(lit(1)).as("nd"))
        g.join(f, Seq("sh"))
          .groupBy("ord")
          .agg(count(lit(1)).as("total"),
            sum(when(col("first_ord") === col("ord"), 1L).otherwise(0L)).as("novel"))
          .crossJoin(broadcast(n))
          .groupBy(expr("((ord - 1) * 10) div nd").cast("long").as("decile"))
          .agg(sum(col("novel")).cast("long").as("novel_grams"),
            sum(col("total")).cast("long").as("total_grams"),
            round(sum(col("novel")).cast("double") / sum(col("total")), 4)
              .as("novelty"))
          .orderBy("decile")
      }),

    Q("q242_simpson_diversity",
      // Corpus-level Simpson diversity per source: 1 - sum(c·(c-1)) /
      // (N·(N-1)) over token occurrence counts — the no-log diversity
      // index (Shannon needs log, which is not engine-portable; Simpson
      // is exact integer sums with ONE division), the per-source twin of
      // q177's per-doc diversity. Two hash aggs, map-side partials all
      // the way; a repeated-token-heavy source scores low.
      Some(s"""WITH tok AS (SELECT source, t AS token
              |             FROM documents, UNNEST($toksSql) AS u(t)),
              |c AS (SELECT source, token, COUNT(*) AS c FROM tok GROUP BY source, token),
              |a AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
              |        CAST(SUM(c * (c - 1)) AS BIGINT) AS s2 FROM c GROUP BY source)
              |SELECT source, n AS n_tokens,
              |       ROUND(1.0 - CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)), 4)
              |         AS simpson_diversity
              |FROM a ORDER BY source""".stripMargin),
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.operators.TextAnalysis.tokens(col("text"))).as("token"))
        val c = tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
        c.groupBy("source")
          .agg(sum(col("c")).cast("long").as("n"),
            sum(col("c") * (col("c") - 1)).cast("long").as("s2"))
          .select(col("source"), col("n").as("n_tokens"),
            round(lit(1.0) - col("s2").cast("double")
              / (col("n").cast("double") * (col("n") - 1)), 4)
              .as("simpson_diversity"))
          .orderBy("source")
      }),

    Q("q243_dedup_quota",
      // The q236 allocation recomputed over DEDUPED counts (distinct
      // md5(text) per source) — quotas must follow what a source
      // CONTRIBUTES, not what it ships, or a heavily-duplicated source
      // buys sampling weight with copies (the q233 reduction report
      // feeding the q236 allocator, composed). Shares the Hamilton
      // fragment with q236 so the two allocators can never fork.
      Some(hamiltonSql(
        "SELECT source, COUNT(DISTINCT MD5(text)) AS n_docs FROM documents GROUP BY source",
        budget = 1000)),
      (s, d) => hamilton(
        Tables.documents(s, d).groupBy("source")
          .agg(countDistinct(md5(col("text"))).as("n_docs")),
        budget = 1000)),

    Q("q244_lsh_calibration",
      // The calibration curve that licenses estimate-only dedup at
      // 100 TB: q137's LSH candidate pairs bucketed by their SIGNATURE
      // estimate (floor(est·8), clamped), with the count of pairs whose
      // EXACT Jaccard clears the 0.8 production threshold and the exact
      // mean per bucket — if high-estimate buckets are pure, the
      // expensive exact-verify stage can be skipped above a cutoff.
      // Mean-of-rounded-doubles is summed as scaled LONGS (×10⁴ exact
      // integers), and the mean stays in INTEGER space end to end:
      // round-half-up(S/n) = (2S + n) div (2n) — a final ROUND(double, 4)
      // hit the .00005 tie at sf0.001 where Spark's HALF_UP-on-decimal-
      // repr and DuckDB's true-binary rounding disagree (the float twin
      // of the HUGEINT trap). `mean_jaccard_e4` is the mean in 1e-4
      // units, exact in both engines at any scale.
      Some(s"""WITH est AS (${TrainingQueries.minhashEstimateSql})
              |SELECT LEAST(CAST(FLOOR(est_jaccard * 8) AS BIGINT), 7) AS bucket,
              |       COUNT(*) AS n_pairs,
              |       CAST(SUM(CASE WHEN jaccard >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
              |         AS n_true_08,
              |       CAST((2*CAST(SUM(CAST(ROUND(jaccard * 10000) AS BIGINT)) AS BIGINT)
              |             + COUNT(*)) // (2*COUNT(*)) AS BIGINT) AS mean_jaccard_e4
              |FROM est GROUP BY bucket ORDER BY bucket""".stripMargin),
      (s, d) => {
        val est = graft.operators.Dedup.minhashEstimatePairs(
          Tables.documents(s, d), "doc_id", "text",
          n = 3, numHashes = 32, bands = 16)
        est.groupBy(least(floor(col("est_jaccard") * 8).cast("long"), lit(7L))
            .as("bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).cast("long")
              .as("n_true_08"),
            sum(round(col("jaccard") * 10000).cast("long")).as("_s"))
          .select(col("bucket"), col("n_pairs"), col("n_true_08"),
            expr("(2*_s + n_pairs) div (2*n_pairs)").as("mean_jaccard_e4"))
          .orderBy("bucket")
      }),

    Q("q245_source_token_overlap",
      // Source-vocabulary affinity matrix: |top-100 tokens of a ∩ top-100
      // of b| for every source pair — the cheap integer screen for "are
      // these two crawls the same distribution" run before the expensive
      // content-level contamination pass (q202). Top-100 per source is a
      // partitioned rank (WindowGroupLimit pushdown); the pair join fans
      // out by sources-per-token, bounded by the source count.
      Some(s"""WITH tok AS (SELECT source, t AS token
              |             FROM documents, UNNEST($toksSql) AS u(t)),
              |c AS (SELECT source, token, COUNT(*) AS c FROM tok GROUP BY source, token),
              |r AS (SELECT source, token,
              |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, token) AS rk
              |      FROM c),
              |top AS (SELECT source, token FROM r WHERE rk <= 100)
              |SELECT a.source AS a_src, b.source AS b_src,
              |       CAST(COUNT(*) AS BIGINT) AS shared
              |FROM top a JOIN top b ON a.token = b.token AND a.source < b.source
              |GROUP BY a.source, b.source ORDER BY a_src, b_src""".stripMargin),
      (s, d) => {
        val c = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.operators.TextAnalysis.tokens(col("text"))).as("token"))
          .groupBy("source", "token").agg(count(lit(1)).as("c"))
        val top = Skew.topKPerKey(c, Seq(col("source")),
          Seq(col("c").desc, col("token")), k = 100)
          .select(col("source"), col("token"))
        // the top relation is |sources| x 100 rows — broadcast the probe
        // side so the pair join never shuffles the token lists
        top.select(col("source").as("a_src"), col("token"))
          .join(broadcast(top.select(col("source").as("b_src"), col("token"))),
            Seq("token"))
          .filter(col("a_src") < col("b_src"))
          .groupBy("a_src", "b_src").agg(count(lit(1)).cast("long").as("shared"))
          .orderBy("a_src", "b_src")
      }),

    Q("q246_cluster_span",
      // Do near-dup clusters cross sources? Per cluster-span (distinct
      // source count), how many clusters and docs — the single-source
      // spans are within-crawl duplication (dedup locally), the multi-
      // source spans are syndication/mirroring (the contamination
      // signal). Reuses the session-cached q56 cluster relation; the
      // oracle extends q56's recursive closure with the source join.
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
              |pc AS (SELECT cluster_id, COUNT(*) AS sz,
              |         COUNT(DISTINCT d.source) AS ns
              |       FROM cl JOIN documents d USING (doc_id) GROUP BY cluster_id)
              |SELECT CAST(ns AS BIGINT) AS n_sources,
              |       CAST(COUNT(*) AS BIGINT) AS n_clusters,
              |       CAST(SUM(sz) AS BIGINT) AS n_docs
              |FROM pc GROUP BY ns ORDER BY n_sources""".stripMargin),
      // the cluster relation (dup docs only) is tiny next to the corpus:
      // broadcast it so the source join is a map-side lookup over the
      // documents scan, never a corpus shuffle
      (s, d) => broadcast(ExtendedQueries.cachedDupClusters(s, d))
        .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("sz"), countDistinct(col("source")).as("ns"))
        .groupBy(col("ns").cast("long").as("n_sources"))
        .agg(count(lit(1)).cast("long").as("n_clusters"),
          sum(col("sz")).cast("long").as("n_docs"))
        .orderBy("n_sources"))
  )
}
