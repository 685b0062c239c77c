package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.Similarity
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
            ExtendedQueries.trainedCentroids16(s, d), mins, maxs,
            k = 5, nProbe = 3, refine = 20)
          .orderBy("q_id", "rank")
      })
  )
}
