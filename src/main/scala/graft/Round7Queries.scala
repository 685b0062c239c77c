package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.{Dedup, Similarity, Skew, Splits, TextAnalysis}
import graft.sources.Tables

/** Round-7 additions: the int8 scalar-quantization tier of the ANN
  * family (q181) — the memory/shuffle scale path at 100 TB, where the
  * float32 corpus is the dominant cost and SQ8 codes are 4× smaller
  * with integer candidate scoring and exact re-ranking. Hash-checked
  * under the §2.2 determinism rules (floor-based quantization, exact
  * long dot products, rounded cosines).
  */
object Round7Queries {

  /** DuckDB twin of [[Similarity.quantizeInt8]] over list `v`, with
    * `mns`/`mxs` lists in scope — ONE copy (bit-parity-critical: the
    * floor/clamp/cast chain must not fork between q181 and q182). */
  private def quantSql(v: String): String =
    s"""LIST_TRANSFORM(GENERATE_SERIES(1, LEN($v)), i ->
       |           CASE WHEN mxs[i] = mns[i] THEN 0
       |                ELSE CAST(GREATEST(-128.0, LEAST(127.0,
       |                  FLOOR((CAST($v[i] AS DOUBLE) - mns[i])
       |                        / (mxs[i] - mns[i]) * 255.0 + 0.5) - 128.0))
       |                  AS INT) END)""".stripMargin

  /** DuckDB twin of [[Similarity.int8Dot]] over two code lists. */
  private def int8DotSql(a: String, b: String): String =
    s"""CAST(LIST_AGGREGATE(LIST_TRANSFORM(
       |               GENERATE_SERIES(1, LEN($a)),
       |               i -> CAST($a[i] AS BIGINT) * $b[i]), 'sum')
       |               AS BIGINT)""".stripMargin

  def all: Seq[Q] = Seq(

    Q("q181_int8_recall",
      // The recall STUDY for scalar quantization (the q140 discipline
      // applied to SQ8): 5 query vectors against the rest of the corpus;
      // per query, recall@10 of (a) ranking by the raw int8 dot product
      // and (b) taking the top-40 int8 candidates then re-ranking those
      // by exact cosine — the standard quantize-then-refine ANN design.
      // Every step is engine-pinned: per-dim min/max are exact widened
      // floats, quantization is floor(x+0.5) (half-up/half-even safe),
      // codes are exact INTs, the candidate score is an exact BIGINT
      // dot, and the final ranking reuses the rounded-cosine fragment.
      // Scale shape: the stats pass is one posexplode min/max agg (dim
      // doubles to the driver — the kmeans-centroid discipline); codes
      // are one map-side projection; scoring is a broadcast of 5 query
      // rows against the corpus scan; rankings are per-query windows
      // (never global). At 100 TB the code column replaces the float
      // corpus in the scan/shuffle at 1/4 the bytes, and exact vectors
      // are fetched only for the 40-row candidate lists.
      Some(s"""WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
              |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
              |st AS (SELECT i AS pos,
              |              MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
              |              MAX(CAST(embedding[i] AS DOUBLE)) AS mx
              |       FROM c, (SELECT UNNEST(GENERATE_SERIES(1,
              |              (SELECT MAX(LEN(embedding)) FROM c))) AS i)
              |       GROUP BY i),
              |mm AS (SELECT LIST(mn ORDER BY pos) AS mns,
              |              LIST(mx ORDER BY pos) AS mxs FROM st),
              |cc AS (SELECT vec_id, embedding,
              |         ${quantSql("embedding")} AS code
              |       FROM c, mm),
              |qq AS (SELECT q_id, qe,
              |         ${quantSql("qe")} AS qcode
              |       FROM q, mm),
              |scored AS (SELECT q_id, vec_id,
              |             ROUND(${TrainingQueries.cosOf("cc.embedding", "qq.qe")}, 4) AS sim,
              |             ${int8DotSql("code", "qcode")} AS iscore
              |           FROM cc, qq),
              |ranked AS (SELECT q_id, vec_id, sim, iscore,
              |             ROW_NUMBER() OVER (PARTITION BY q_id
              |               ORDER BY sim DESC, vec_id) AS re,
              |             ROW_NUMBER() OVER (PARTITION BY q_id
              |               ORDER BY iscore DESC, vec_id) AS ri
              |           FROM scored),
              |ex AS (SELECT q_id, vec_id FROM ranked WHERE re <= 10),
              |it AS (SELECT q_id, vec_id FROM ranked WHERE ri <= 10),
              |rr AS (SELECT q_id, vec_id FROM (
              |         SELECT q_id, vec_id, ROW_NUMBER() OVER (
              |           PARTITION BY q_id ORDER BY sim DESC, vec_id) AS r2
              |         FROM ranked WHERE ri <= 40) t WHERE r2 <= 10),
              |hi AS (SELECT ex.q_id, COUNT(*) AS h FROM ex JOIN it
              |       ON ex.q_id = it.q_id AND ex.vec_id = it.vec_id GROUP BY ex.q_id),
              |hr AS (SELECT ex.q_id, COUNT(*) AS h FROM ex JOIN rr
              |       ON ex.q_id = rr.q_id AND ex.vec_id = rr.vec_id GROUP BY ex.q_id)
              |SELECT q.q_id,
              |       ROUND(CAST(COALESCE(hi.h, 0) AS DOUBLE) / 10.0, 4) AS recall_int8,
              |       ROUND(CAST(COALESCE(hr.h, 0) AS DOUBLE) / 10.0, 4) AS recall_rerank
              |FROM q LEFT JOIN hi ON q.q_id = hi.q_id
              |       LEFT JOIN hr ON q.q_id = hr.q_id
              |ORDER BY q.q_id""".stripMargin),
      (s, d) => {
        import graft.functions.VectorFunctions.cosine
        val emb = Tables.embeddings(s, d)
        val corpus = emb.filter(col("vec_id") >= 5).select("vec_id", "embedding")
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val (mins, maxs) = Similarity.dimMinMax(corpus)
        val cc = corpus.withColumn("code",
          Similarity.quantizeInt8(col("embedding"), mins, maxs))
        val qq = queries.withColumn("qcode",
          Similarity.quantizeInt8(col("qe"), mins, maxs))
        // one corpus pass scores BOTH rankings (exact + int8) per pair
        val scored = cc.crossJoin(broadcast(qq))
          .select(col("q_id"), col("vec_id"),
            round(cosine(col("embedding"), col("qe")), 4).as("sim"),
            Similarity.int8Dot(col("code"), col("qcode")).as("iscore"))
        val wE = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
        val wI = Window.partitionBy("q_id").orderBy(col("iscore").desc, col("vec_id"))
        val ranked = scored
          .withColumn("re", row_number().over(wE))
          .withColumn("ri", row_number().over(wI))
        val ex = ranked.filter(col("re") <= 10).select("q_id", "vec_id")
        val it = ranked.filter(col("ri") <= 10).select("q_id", "vec_id")
        val rr = ranked.filter(col("ri") <= 40)
          .withColumn("r2", row_number().over(
            Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))))
          .filter(col("r2") <= 10).select("q_id", "vec_id")
        val hi = ex.join(it, Seq("q_id", "vec_id")).groupBy("q_id")
          .agg(count(lit(1)).as("h_int8"))
        val hr = ex.join(rr, Seq("q_id", "vec_id")).groupBy("q_id")
          .agg(count(lit(1)).as("h_rr"))
        queries.select("q_id")
          .join(hi, Seq("q_id"), "left").join(hr, Seq("q_id"), "left")
          .select(col("q_id"),
            round(coalesce(col("h_int8"), lit(0L)).cast("double") / 10.0, 4)
              .as("recall_int8"),
            round(coalesce(col("h_rr"), lit(0L)).cast("double") / 10.0, 4)
              .as("recall_rerank"))
          .orderBy("q_id")
      }),

    Q("q182_knn_ivf_int8",
      // The COMPOSED modern ANN stack (q159 × q181): IVF cell blocking
      // (shared deterministic k=16 training), int8 candidate scoring
      // inside the probed cells (only the quarter-byte CODES ride the
      // cell join), exact-cosine re-rank of each query's top-20 integer
      // candidates to top-5. The oracle replays the identical unrolled
      // k-means, quantization (floor-pinned) and both rankings — exact
      // integer scores and rounded cosines, lowest-id ties everywhere.
      // Scale shape: candidates = |q|·nProbe·(n/16) CODE rows; float
      // vectors are fetched only for the |q|·20 refine winners via a
      // broadcast join back to the corpus — at 100 TB the float corpus
      // never rides a shuffle.
      Some(s"""WITH ${ExtendedQueries.kmeansCtePrefix},
              |cor AS (SELECT vec_id, embedding, cid FROM afinal WHERE vec_id >= 20),
              |st AS (SELECT i AS pos,
              |              MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
              |              MAX(CAST(embedding[i] AS DOUBLE)) AS mx
              |       FROM cor, (SELECT UNNEST(GENERATE_SERIES(1,
              |              (SELECT MAX(LEN(embedding)) FROM cor))) AS i)
              |       GROUP BY i),
              |mm AS (SELECT LIST(mn ORDER BY pos) AS mns,
              |              LIST(mx ORDER BY pos) AS mxs FROM st),
              |qs AS (SELECT vec_id AS q_id, embedding AS qe FROM v WHERE vec_id < 20),
              |qprob AS (SELECT q_id, qe, cid FROM (
              |  SELECT q.q_id, q.qe, c.cid,
              |         ROW_NUMBER() OVER (PARTITION BY q.q_id
              |           ORDER BY ROUND(${TrainingQueries.cosOf("q.qe", "c.ce")}, 4) DESC,
              |                    c.cid) AS rn
              |  FROM qs q CROSS JOIN c2 c) r WHERE rn <= 3),
              |cc AS (SELECT vec_id, cid,
              |         ${quantSql("embedding")} AS code
              |       FROM cor, mm),
              |qq AS (SELECT q_id, cid,
              |         ${quantSql("qe")} AS qcode
              |       FROM qprob, mm),
              |win AS (SELECT q_id, vec_id FROM (
              |  SELECT qq.q_id, cc.vec_id,
              |         ROW_NUMBER() OVER (PARTITION BY qq.q_id
              |           ORDER BY ${int8DotSql("cc.code", "qq.qcode")} DESC,
              |                    cc.vec_id) AS rr
              |  FROM qq JOIN cc ON qq.cid = cc.cid) t WHERE rr <= 20),
              |ranked AS (SELECT w.q_id, w.vec_id,
              |             ROUND(${TrainingQueries.cosOf("cv.embedding", "q.qe")}, 4) AS sim,
              |             CAST(ROW_NUMBER() OVER (PARTITION BY w.q_id
              |               ORDER BY ROUND(${TrainingQueries.cosOf("cv.embedding", "q.qe")}, 4) DESC,
              |                        w.vec_id) AS BIGINT) AS rank
              |           FROM win w JOIN v cv ON cv.vec_id = w.vec_id
              |                      JOIN qs q ON q.q_id = w.q_id)
              |SELECT q_id, vec_id, sim, rank FROM ranked WHERE rank <= 5
              |ORDER BY q_id, rank""".stripMargin),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val corpus = emb.filter(col("vec_id") >= 20)
        val (mins, maxs) = Similarity.dimMinMax(corpus)
        Similarity.knnJoinIvfInt8(corpus, queries,
            ExtendedQueries.trainedCentroids(s, d), mins, maxs,
            k = 5, nProbe = 3, refine = 20)
          .orderBy("q_id", "rank")
      }),

    Q("q183_pq_recall",
      // Product quantization — the sub-byte ANN representation beside
      // q181's SQ8: dim-64 vectors become m=8 codes over a k=16-entry
      // per-subspace codebook (seeded deterministically from the 16
      // lowest-id corpus vectors — random-sample codebooks, the RNG-free
      // PQ training flavor). Scoring is classic ADC: per query, a
      // |q|·m·k lookup table of subspace dots (broadcast), then one
      // equi-join of exploded codes against it and an ORDER-FREE decimal
      // sum per (query, vector) — the float corpus never rides the
      // scoring join, codes are ~16× smaller than the vectors. The study
      // mirrors q181: recall@10 of the ADC ranking against the exact
      // rounded inner-product ranking, and of the top-40 ADC candidates
      // exactly re-ranked. Every step is engine-pinned: encode distances
      // and subspace dots are left-to-right double folds over exactly
      // widened floats (ties to the lowest code index), the ADC sum goes
      // through DECIMAL(25,10) (a binary double is never an exact
      // decimal midpoint, so the engines' rounding modes cannot
      // diverge), and rankings tie-break by vec_id.
      Some(s"""WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
              |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
              |sd AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j, embedding
              |       FROM (SELECT vec_id, embedding FROM c ORDER BY vec_id LIMIT 16)),
              |sub AS (SELECT ss.s, sd.j,
              |               LIST_SLICE(sd.embedding, ss.s*8+1, ss.s*8+8) AS sub
              |        FROM sd, (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS s) ss),
              |enc AS (SELECT vec_id, s, j AS code FROM (
              |  SELECT c.vec_id, sub.s, sub.j,
              |         ROW_NUMBER() OVER (PARTITION BY c.vec_id, sub.s ORDER BY
              |           LIST_AGGREGATE(LIST_TRANSFORM(GENERATE_SERIES(1, 8), i ->
              |             (CAST(c.embedding[sub.s*8+i] AS DOUBLE) - CAST(sub.sub[i] AS DOUBLE))
              |             * (CAST(c.embedding[sub.s*8+i] AS DOUBLE) - CAST(sub.sub[i] AS DOUBLE))),
              |             'sum'),
              |           sub.j) AS rn
              |  FROM c, sub) t WHERE rn = 1),
              |lut AS (SELECT q.q_id, sub.s, sub.j,
              |               ${TrainingQueries.dotSql("LIST_SLICE(q.qe, sub.s*8+1, sub.s*8+8)", "sub.sub")} AS pd
              |        FROM q, sub),
              |adc AS (SELECT l.q_id, e.vec_id,
              |               CAST(SUM(CAST(l.pd AS DECIMAL(25,10))) AS DOUBLE) AS adc
              |        FROM enc e JOIN lut l ON l.s = e.s AND l.j = e.code
              |        GROUP BY l.q_id, e.vec_id),
              |ex AS (SELECT q.q_id, c.vec_id,
              |              ROUND(${TrainingQueries.dotSql("c.embedding", "q.qe")}, 4) AS sim
              |       FROM c, q),
              |ranked AS (SELECT ex.q_id, ex.vec_id, ex.sim, adc.adc,
              |             ROW_NUMBER() OVER (PARTITION BY ex.q_id
              |               ORDER BY ex.sim DESC, ex.vec_id) AS re,
              |             ROW_NUMBER() OVER (PARTITION BY ex.q_id
              |               ORDER BY adc.adc DESC, ex.vec_id) AS ra
              |           FROM ex JOIN adc ON adc.q_id = ex.q_id AND adc.vec_id = ex.vec_id),
              |exact10 AS (SELECT q_id, vec_id FROM ranked WHERE re <= 10),
              |adc10 AS (SELECT q_id, vec_id FROM ranked WHERE ra <= 10),
              |rr10 AS (SELECT q_id, vec_id FROM (
              |          SELECT q_id, vec_id, ROW_NUMBER() OVER (
              |            PARTITION BY q_id ORDER BY sim DESC, vec_id) AS r2
              |          FROM ranked WHERE ra <= 40) t WHERE r2 <= 10),
              |ha AS (SELECT a.q_id, COUNT(*) AS h FROM exact10 a JOIN adc10 b
              |       ON a.q_id = b.q_id AND a.vec_id = b.vec_id GROUP BY a.q_id),
              |hrr AS (SELECT a.q_id, COUNT(*) AS h FROM exact10 a JOIN rr10 b
              |        ON a.q_id = b.q_id AND a.vec_id = b.vec_id GROUP BY a.q_id)
              |SELECT q.q_id,
              |       ROUND(CAST(COALESCE(ha.h, 0) AS DOUBLE) / 10.0, 4) AS recall_adc,
              |       ROUND(CAST(COALESCE(hrr.h, 0) AS DOUBLE) / 10.0, 4) AS recall_rerank
              |FROM q LEFT JOIN ha ON q.q_id = ha.q_id
              |       LEFT JOIN hrr ON q.q_id = hrr.q_id
              |ORDER BY q.q_id""".stripMargin),
      (s, d) => {
        import graft.functions.VectorFunctions.dot
        val emb = Tables.embeddings(s, d)
        val corpus = emb.filter(col("vec_id") >= 5).select("vec_id", "embedding")
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val m = 8
        val seeds = Similarity.pqSeeds(corpus, 16)
        // map-side encode: the codebook is literal state in one projection
        val codes = corpus
          .select(col("vec_id"), Similarity.pqEncode(col("embedding"), seeds, m).as("codes"))
          .select(col("vec_id"), posexplode(col("codes")).as(Seq("s", "code")))
        // the classic ADC lookup table: |q|·m·k subspace dots, broadcast
        val lut = queries
          .crossJoin(broadcast(Similarity.pqCodebookRelation(s, seeds, m)))
          .select(col("q_id"), col("s").as("ls"), col("j"),
            dot(slice(col("qe"), col("s") * 8 + 1, lit(8)), col("sub")).as("pd"))
        val adc = codes.join(broadcast(lut),
            col("s") === col("ls") && col("code") === col("j"))
          .groupBy("q_id", "vec_id")
          .agg(sum(col("pd").cast("decimal(25,10)")).cast("double").as("adc"))
        val ex = corpus.crossJoin(broadcast(queries))
          .select(col("q_id"), col("vec_id"),
            round(dot(col("embedding"), col("qe")), 4).as("sim"))
        val joined = ex.join(adc, Seq("q_id", "vec_id"))
        val wE = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
        val wA = Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id"))
        val ranked = joined
          .withColumn("re", row_number().over(wE))
          .withColumn("ra", row_number().over(wA))
        val exact10 = ranked.filter(col("re") <= 10).select("q_id", "vec_id")
        val adc10 = ranked.filter(col("ra") <= 10).select("q_id", "vec_id")
        val rr10 = ranked.filter(col("ra") <= 40)
          .withColumn("r2", row_number().over(
            Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))))
          .filter(col("r2") <= 10).select("q_id", "vec_id")
        val ha = exact10.join(adc10, Seq("q_id", "vec_id")).groupBy("q_id")
          .agg(count(lit(1)).as("h_adc"))
        val hrr = exact10.join(rr10, Seq("q_id", "vec_id")).groupBy("q_id")
          .agg(count(lit(1)).as("h_rr"))
        queries.select("q_id")
          .join(ha, Seq("q_id"), "left").join(hrr, Seq("q_id"), "left")
          .select(col("q_id"),
            round(coalesce(col("h_adc"), lit(0L)).cast("double") / 10.0, 4)
              .as("recall_adc"),
            round(coalesce(col("h_rr"), lit(0L)).cast("double") / 10.0, 4)
              .as("recall_rerank"))
          .orderBy("q_id")
      }),

    Q("q184_semdedup",
      // SemDeDup (Abbas et al. 2023): within each IVF cell of the shared
      // deterministic k=16 training, drop every vector whose cosine to a
      // LOWER-id cell-mate reaches 0.45 — the lowest-id member of each
      // semantic group survives. The keep/drop DECISION relation is what
      // a corpus-pruning pipeline anti-joins against; q170 lists the
      // pairs, this query settles them. Oracle replays the identical
      // unrolled k-means (cells bit-stable), the same rounded-cosine
      // pair predicate, and the same left-join verdict. Scale shape:
      // candidates bounded per cell, decision is a distinct projection
      // + one scalar-id left join — nothing vector-sized past the cell
      // join.
      Some(s"""WITH ${ExtendedQueries.kmeansCtePrefix},
              |${ExtendedQueries.cellBlockCte},
              |p AS (SELECT b.vec_id AS b_id
              |      FROM ablk a JOIN ablk b
              |        ON a.cid = b.cid AND a.blk = b.blk AND a.vec_id < b.vec_id
              |      WHERE ROUND(${TrainingQueries.cosOf("a.embedding", "b.embedding")}, 4) >= 0.45
              |      GROUP BY b.vec_id)
              |SELECT f.vec_id, f.cid AS cent_id,
              |       CAST(p.b_id IS NULL AS INT) AS kept
              |FROM afinal f LEFT JOIN p ON f.vec_id = p.b_id
              |ORDER BY f.vec_id""".stripMargin),
      (s, d) => Similarity.semDedupKeep(Tables.embeddings(s, d), 0.45,
          ExtendedQueries.trainedCentroids(s, d))
        .orderBy("vec_id")),

    Q("q185_vocab_oov",
      // Vocabulary coverage: build the top-16 tokens by corpus frequency
      // (ties lexicographic — the boundary is deterministic on both
      // engines) and score every document's out-of-vocabulary token
      // fraction — the "does this tokenizer vocabulary cover the corpus"
      // check beside q39's quality score and q175's readability. All
      // counts exact longs, one IEEE division, rounded. Scale shape:
      // vocab = two-phase count agg + global top-16
      // (TakeOrderedAndProject, driver holds 16 rows); scoring = explode
      // + broadcast left join + two-phase agg.
      Some("""WITH tr AS (SELECT doc_id,
             |              UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS tok
             |            FROM documents),
             |v AS (SELECT tok FROM (
             |        SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rn
             |        FROM tr GROUP BY tok) s WHERE rn <= 16)
             |SELECT tr.doc_id, COUNT(*) AS n_tok,
             |       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             |       ROUND(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |             / CAST(COUNT(*) AS DOUBLE), 4) AS oov_frac
             |FROM tr LEFT JOIN v ON tr.tok = v.tok
             |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin),
      (s, d) => TextAnalysis.oovStats(Tables.documents(s, d), "doc_id", "text", 16)
        .orderBy("doc_id")),

    Q("q186_token_budget_select",
      // Token-budget corpus selection — fill each source's quota with its
      // biggest documents: rank docs per source by (n_tok DESC, doc_id)
      // and keep rows while the INCLUSIVE cumulative token count stays
      // within 600. The oracle is the textbook per-source running-sum
      // window; the engine rides GlobalOrder's range-partitioned prefix
      // scan over the composite (source, n_tok DESC, doc_id) order and
      // subtracts per-source base offsets — one range shuffle, fully
      // parallel, no single task ever owns a whole source (the window
      // form hands each source's ENTIRE membership to one task — the
      // 100 TB trap this operator exists to avoid).
      Some("""WITH t AS (SELECT doc_id, source,
             |             CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
             |           FROM documents),
             |c AS (SELECT doc_id, source, n_tok,
             |             SUM(n_tok) OVER (PARTITION BY source
             |               ORDER BY n_tok DESC, doc_id
             |               ROWS UNBOUNDED PRECEDING) AS cum_n_tok
             |      FROM t)
             |SELECT doc_id, source, n_tok, CAST(cum_n_tok AS BIGINT) AS cum_n_tok
             |FROM c WHERE cum_n_tok <= 600
             |ORDER BY source, doc_id""".stripMargin),
      (s, d) => {
        val t = Tables.documents(s, d).select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
        Splits.budgetSelect(t, "source",
            Seq(col("n_tok").desc, col("doc_id")), "n_tok", 600L)
          .select("doc_id", "source", "n_tok", "cum_n_tok")
          .orderBy("source", "doc_id")
      }),

    Q("q187_shared_span",
      // Exact-substring duplication (Lee et al. 2022): per document pair
      // sharing at least one 8-token gram with corpus df in [2, 64], the
      // longest VERBATIM shared token span, found by chaining gram
      // position matches along alignment diagonals (runs of consecutive
      // positions at constant pa - pb; span = run + 7). The order-aware
      // complement of q36's set-overlap Jaccard — boilerplate quotes and
      // copied passages surface here even when the rest of the docs
      // differ completely. Pairs below 12 tokens are noise and dropped.
      // Scale shape: linear gram explode (positions ride as ints), one
      // df agg, df-capped equi-join (the pairStats skew guard), and run
      // windows partitioned by (pair, diagonal) — never global.
      Some("""WITH t AS (SELECT doc_id, toks FROM (
             |       SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS toks
             |       FROM documents) s WHERE LEN(toks) >= 8),
             |g AS (SELECT doc_id,
             |             UNNEST(GENERATE_SERIES(1, LEN(toks) - 7)) AS p,
             |             UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 7),
             |               i -> ARRAY_TO_STRING(LIST_SLICE(toks, i, i + 7), ' '))) AS gram
             |      FROM t),
             |keep AS (SELECT gram FROM g GROUP BY gram
             |         HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 64),
             |gg AS (SELECT g.doc_id, g.p, g.gram FROM g JOIN keep USING (gram)),
             |pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.p AS pa, a.p - b.p AS diag
             |       FROM gg a JOIN gg b ON a.gram = b.gram AND a.doc_id < b.doc_id),
             |runs AS (SELECT a_id, b_id, diag,
             |                pa - ROW_NUMBER() OVER (PARTITION BY a_id, b_id, diag
             |                                        ORDER BY pa) AS grp
             |         FROM pr),
             |rl AS (SELECT a_id, b_id, diag, grp, COUNT(*) AS run
             |       FROM runs GROUP BY 1, 2, 3, 4)
             |SELECT a_id, b_id, CAST(MAX(run) + 7 AS BIGINT) AS span
             |FROM rl GROUP BY a_id, b_id HAVING MAX(run) + 7 >= 12
             |ORDER BY a_id, b_id""".stripMargin),
      (s, d) => Dedup.sharedSpanPairs(TrainingQueries.cachedDocToks(s, d),
          n = 8, maxGramDf = 64L, minSpan = 12)
        .orderBy("a_id", "b_id")),

    Q("q188_consistent_sample",
      // Fixed-k consistent sampling per source: the 10 docs with the
      // smallest md5('smp|' || doc_id) priority — reproducible across
      // runs/engines AND stable under corpus growth (a doc's priority
      // never changes, so adding docs can only displace, never reshuffle,
      // the sample — the property rand() and fraction-based q118 lack for
      // fixed-size quotas). The oracle is the textbook per-source
      // ROW_NUMBER window; the engine runs Skew.topKPerKey's two-level
      // tournament (local top-10 per (source, input-partition), then
      // top-10 of that bounded union), equal to the window form because
      // (priority, doc_id) totally orders each source — and skew-safe
      // where the window form gives a giant source to ONE task.
      Some("""SELECT source, doc_id FROM (
             |  SELECT source, doc_id, ROW_NUMBER() OVER (
             |    PARTITION BY source
             |    ORDER BY MD5('smp|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents) t WHERE rn <= 10
             |ORDER BY source, doc_id""".stripMargin),
      (s, d) => Skew.topKPerKey(
          Tables.documents(s, d).select(col("source"), col("doc_id"),
            md5(concat(lit("smp|"), col("doc_id").cast("string"))).as("pri")),
          Seq(col("source")), Seq(col("pri"), col("doc_id")), k = 10)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")),

    Q("q189_gopher_rules",
      // Gopher-style composite quality gate (Rae et al. 2021 App. A1.1):
      // per-doc flags for token-count bounds, mean-word-length bounds
      // (INTEGER cross-multiplied — no float quotient at the boundary),
      // and minimum stopword occurrences, plus their conjunction. The
      // flags stay separate so a pipeline can tune the gate without
      // re-scanning. Pure map-side integer logic in ONE projection — the
      // scale shape of a filter that must run before anything expensive.
      Some("""SELECT doc_id,
             |  CAST(LEN(t) BETWEEN 50 AND 100000 AS INT) AS wc_ok,
             |  CAST(LEN(t) > 0 AND 3 * LEN(t) <= LEN(ARRAY_TO_STRING(t, ''))
             |       AND LEN(ARRAY_TO_STRING(t, '')) <= 10 * LEN(t) AS INT) AS mwl_ok,
             |  CAST(LEN(LIST_FILTER(t, x -> x IN ('the','a','of','and','to','in'))) >= 2
             |       AS INT) AS stop_ok,
             |  CAST(LEN(t) BETWEEN 50 AND 100000
             |       AND (LEN(t) > 0 AND 3 * LEN(t) <= LEN(ARRAY_TO_STRING(t, ''))
             |            AND LEN(ARRAY_TO_STRING(t, '')) <= 10 * LEN(t))
             |       AND LEN(LIST_FILTER(t, x -> x IN ('the','a','of','and','to','in'))) >= 2
             |       AS INT) AS pass
             |FROM (SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS t
             |      FROM documents) d
             |ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.gopherFlags(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    Q("q190_k_anonymity",
      // k-anonymity release gate over the (lang, source) quasi-identifier
      // projection: a document may be released only if >= 5 docs share
      // its full QI combination (Sweeney's suppression rule) — the
      // row-level privacy counterpart of q74's value-level redaction.
      // Scale shape: one two-phase QI count + one equi-join back (each
      // row matches exactly ONE group row — a hot QI combo is a big
      // group, never join fan-out); the distinct-QI relation is small
      // enough that Spark broadcasts it on its own.
      Some("""SELECT d.doc_id, d.lang, d.source, g.qi_n,
             |       CAST(g.qi_n >= 5 AS INT) AS released
             |FROM documents d
             |JOIN (SELECT lang, source, COUNT(*) AS qi_n
             |      FROM documents GROUP BY lang, source) g
             |  USING (lang, source)
             |ORDER BY d.doc_id""".stripMargin),
      (s, d) => graft.operators.Privacy.kAnonymity(
          Tables.documents(s, d).select("doc_id", "lang", "source"),
          Seq("lang", "source"), k = 5L)
        .select("doc_id", "lang", "source", "qi_n", "released")
        .orderBy("doc_id")),

    Q("q191_bpe_merges",
      // BPE vocabulary induction (Sennrich et al. 2016): 3 merge rounds
      // over the corpus-weighted token-frequency table — each round
      // counts adjacent symbol pairs, merges the winner everywhere, and
      // records (round, pair, merged, cnt). The sentinel-wrapped string
      // encoding makes merge application a plain REPLACE with identical
      // left-to-right non-overlapping semantics on both engines, so the
      // whole training loop sits under the hash gate; ties break to the
      // lexicographically smallest pair. The oracle unrolls the same 3
      // rounds as CTEs (the k-means discipline).
      Some(Round7Queries.bpeOracleSql(3)),
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
        graft.operators.Bpe.merges(toks, rounds = 3).orderBy("round")
      })
  )

  /** The shared BPE training CTE chain (tc, s0, p_r/b_r/s_r per round):
    * the bit-parity-critical fragment of q191 AND q197 — ONE copy, so
    * the two oracles can never train divergent merges. `keepTok` rides
    * the token identity through the rewrite chain for the APPLY side
    * (q197 joins per-token symbol counts back to the corpus); it cannot
    * change what trains — pair counts group the same (c, s) rows either
    * way. */
  private[graft] def bpeChainSql(rounds: Int, keepTok: Boolean): String = {
    val tokCol = if (keepTok) "tok, " else ""
    val head =
      s"""WITH tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
         |       SELECT UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS tok
         |       FROM documents) z GROUP BY tok),
         |s0 AS (SELECT ${tokCol}c,
         |         '<' || ARRAY_TO_STRING(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tok)),
         |                  i -> SUBSTR(tok, i, 1)), '><') || '>' AS s
         |       FROM tc)""".stripMargin
    val roundsSql = (1 to rounds).map { r =>
      s"""p$r AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
         |  SELECT c, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(sy) - 1),
         |           i -> '<' || sy[i] || '><' || sy[i+1] || '>')) AS pair
         |  FROM (SELECT c, STRING_SPLIT(SUBSTR(s, 2, LEN(s) - 2), '><') AS sy
         |        FROM s${r - 1}) q) z GROUP BY pair),
         |b$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         |s$r AS (SELECT ${tokCol}c, REPLACE(s, b.pair, REPLACE(b.pair, '><', '')) AS s
         |        FROM s${r - 1}, b$r b)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$roundsSql"
  }

  /** DuckDB twin of [[graft.operators.Bpe.merges]]: the same sentinel
    * encoding, pair counting, tie rule, and REPLACE-based merge apply,
    * unrolled round by round. */
  private[graft] def bpeOracleSql(rounds: Int): String = {
    val out = (1 to rounds).map { r =>
      s"""SELECT $r AS round,
         |  REPLACE(REPLACE(REPLACE(pair, '><', ' '), '<', ''), '>', '') AS pair,
         |  REPLACE(REPLACE(REPLACE(pair, '><', ''), '<', ''), '>', '') AS merged,
         |  cnt FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"${bpeChainSql(rounds, keepTok = false)}\n$out\nORDER BY round"
  }
}
