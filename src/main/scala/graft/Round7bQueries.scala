package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.TrainingQueries.{h32Sql, toksSql}
import graft.operators.{Dedup, GlobalOrder, Skew, Splits, TextAnalysis, TextCat, Winnow}
import graft.sources.Tables

/** Round-7 additions, second block: the trained-classifier /
  * corpus-curation tier of the LLM-pipeline surface — TextCat
  * rank-profile language ID (q192), CCNet-style quality tiering
  * (q193), cross-split near-dup leakage (q194), MOSS winnowing
  * fingerprints (q195), and length-bucketed batching stats (q196).
  * Same determinism discipline as everywhere: integer counts/ranks,
  * total tie orders, at most one IEEE division per output value,
  * ROUND 4.
  */
object Round7bQueries {

  /** The q70 split assignment as oracle SQL — ONE copy of the
    * md5-bucket CASE (bit-parity-critical with
    * [[Splits.assignSplit]]'s 80/10/10 buckets). */
  private val splitSql =
    """CASE WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 80 THEN 'train'
      |     WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'valid'
      |     ELSE 'test' END""".stripMargin

  /** The q196 bucket ladder (powers of two, 16 .. 65536; longer docs
    * clamp to the top bucket). Declared once, rendered into BOTH
    * engines from the same Seq. */
  private val LengthBuckets: Seq[Long] =
    Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L, 8192L,
      16384L, 32768L, 65536L)

  /** The q192 TextCat prediction CTE chain (train profiles + classify),
    * ending in `pred(doc_id, pred_lang)` — shared with q222's confusion
    * matrix so the two oracles can never train divergent profiles. */
  private[graft] val textcatPredCtes =
    """g AS (SELECT doc_id, lang,
      |             UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LENGTH(text) - 2),
      |                    i -> SUBSTR(text, i, 3))) AS gram
      |           FROM documents WHERE LENGTH(text) >= 3),
      |dgc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
      |dg AS (SELECT doc_id, gram, rd FROM (
      |         SELECT doc_id, gram,
      |                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rd
      |         FROM dgc) WHERE rd <= 20),
      |lgc AS (SELECT lang, gram, COUNT(*) AS c FROM g GROUP BY lang, gram),
      |lp AS (SELECT lang, gram, rl FROM (
      |         SELECT lang, gram,
      |                ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS rl
      |         FROM lgc) WHERE rl <= 20),
      |sizes AS (SELECT doc_id, COUNT(*) AS nd FROM dg GROUP BY doc_id),
      |langs AS (SELECT DISTINCT lang FROM lp),
      |m AS (SELECT dg.doc_id, lp.lang,
      |             SUM(ABS(dg.rd - lp.rl)) AS msum, COUNT(*) AS mcnt
      |      FROM dg JOIN lp USING (gram) GROUP BY dg.doc_id, lp.lang),
      |dist AS (SELECT s.doc_id, l.lang,
      |           COALESCE(m.msum, 0) + (s.nd - COALESCE(m.mcnt, 0)) * 20 AS dist
      |         FROM sizes s CROSS JOIN langs l
      |         LEFT JOIN m ON m.doc_id = s.doc_id AND m.lang = l.lang),
      |pred AS (SELECT doc_id, lang AS pred_lang FROM (
      |           SELECT doc_id, lang,
      |                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, lang) AS rn
      |           FROM dist) WHERE rn = 1)""".stripMargin

  /** One classified-corpus relation per (session, sf dir) — the TextCat
    * training + classification is the expensive part of BOTH q192 and
    * q222, and the result is a |docs|-row scalar table. */
  private val predCache = new graft.SessionCache[org.apache.spark.sql.DataFrame]
  private[graft] def cachedTextcatPred(s: org.apache.spark.sql.SparkSession,
                                       d: String): org.apache.spark.sql.DataFrame =
    predCache.getOrElseUpdate(s, d)(
      TextCat.classify(Tables.documents(s, d), "doc_id", "lang", "text", k = 20)
        .localCheckpoint(true))

  def all: Seq[Q] = Seq(

    Q("q192_textcat_langid",
      // TextCat (Cavnar & Trenkle 1994): TRAIN per-language top-20
      // char-trigram rank profiles from the corpus's own labels, then
      // classify every doc by integer out-of-place distance — the
      // trained counterpart of q40's fixed marker-word heuristic. All
      // ranks are (count DESC, gram ASC) total orders; distance is
      // integer; argmin ties go to the smaller language code — fully
      // engine-deterministic. Scale: the model is 5 langs x 20 rows,
      // broadcast; per-doc windows partition by doc_id; the lang rank
      // window runs over per-lang DISTINCT-gram counts (charset^3
      // bounded). See [[TextCat]] for the full shape.
      Some(s"""WITH $textcatPredCtes
              |SELECT p.doc_id, p.pred_lang,
              |       CAST(CASE WHEN d.lang = p.pred_lang THEN 1 ELSE 0 END AS BIGINT) AS is_match
              |FROM pred p JOIN documents d ON d.doc_id = p.doc_id
              |ORDER BY p.doc_id""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d)
        cachedTextcatPred(s, d)
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .select(col("doc_id"), col("pred_lang"),
            (col("lang") === col("pred_lang")).cast("long").as("is_match"))
          .orderBy("doc_id")
      }),

    Q("q193_quality_tiers",
      // CCNet-style corpus tiering (Wenzek et al. 2020): rank every
      // document by its q144 LM quality score and cut the corpus into
      // head/middle/tail thirds — the step that decides what a
      // pretraining run keeps, samples, or drops. The global cut uses
      // GlobalOrder.ntile (two-pass prefix scan — the scalable form of
      // NTILE() OVER (ORDER BY ...), no single-partition window), over
      // the ROUNDED score with doc_id tiebreak — a total order, so the
      // tier boundary is engine-exact.
      Some(s"""WITH tok AS (SELECT doc_id, UNNEST($toksSql) AS tok FROM documents),
              |vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
              |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
              |               COUNT(*) AS v_size FROM vocab),
              |d AS (SELECT t.doc_id, CAST(SUM(v.cnt + 1) AS BIGINT) AS s,
              |             COUNT(*) AS n_tok
              |      FROM tok t JOIN vocab v USING (tok) GROUP BY t.doc_id),
              |sc AS (SELECT d.doc_id, d.n_tok,
              |         ROUND(CAST(d.s * 1000000 AS DOUBLE)
              |               / CAST(d.n_tok * (tot.n_total + tot.v_size) AS DOUBLE),
              |               4) AS lm_score
              |       FROM d, tot),
              |t AS (SELECT doc_id, n_tok, lm_score,
              |        NTILE(3) OVER (ORDER BY lm_score DESC, doc_id) AS t FROM sc)
              |SELECT doc_id, n_tok, lm_score,
              |       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
              |FROM t ORDER BY doc_id""".stripMargin),
      (s, d) => {
        // the q144 score, inline (direct scan — the row-explode consumer
        // rule), then the scalable global cut
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val tot = vocab.agg(sum("cnt").as("n_total"), count(lit(1)).as("v_size"))
        val sc = toks.join(vocab, "tok")
          .groupBy("doc_id")
          .agg(sum(col("cnt") + 1L).as("s"), count(lit(1)).as("n_tok"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("n_tok"),
            round((col("s") * 1000000L).cast("double")
              / (col("n_tok") * (col("n_total") + col("v_size"))).cast("double"),
              4).as("lm_score"))
        GlobalOrder.ntile(sc, 3, Seq(col("lm_score").desc, col("doc_id")), "t")
          .select(col("doc_id"), col("n_tok"), col("lm_score"),
            when(col("t") === 1, "head").when(col("t") === 2, "middle")
              .otherwise("tail").as("tier"))
          .orderBy("doc_id")
      }),

    Q("q194_split_leakage",
      // Test-set decontamination audit (the near-dup face of q146's
      // n-gram contamination check): exact-Jaccard near-dup pairs
      // (q36's shared pair-stats relation, threshold 0.8) that CROSS
      // the q70 train/valid/test hash split — each row is a test or
      // valid document whose near-twin sits in train, i.e. leaked
      // evaluation signal. Composes two cached relations (pair-stats +
      // the md5 split assignment); the split join is an equi-join on
      // doc_id against the (small) pair list — at 100 TB the pair side
      // is the broadcast side.
      Some(s"""WITH jp AS (${TrainingQueries.jaccardPairsSql}),
              |sp AS (SELECT doc_id, $splitSql AS split FROM documents)
              |SELECT jp.a_id, jp.b_id, sa.split AS split_a, sb.split AS split_b,
              |       jp.jaccard
              |FROM jp
              |JOIN sp sa ON sa.doc_id = jp.a_id
              |JOIN sp sb ON sb.doc_id = jp.b_id
              |WHERE sa.split <> sb.split
              |ORDER BY jp.a_id, jp.b_id""".stripMargin),
      (s, d) => {
        val pairs = Dedup.jaccardFromStats(
          TrainingQueries.cachedPairStats(s, d), threshold = 0.8)
        val sp = Splits.assignSplit(
            Tables.documents(s, d).select("doc_id"), "doc_id",
            Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
          .select(col("doc_id"), col("split"))
        pairs
          .join(sp.as("sa"), col("a_id") === col("sa.doc_id"))
          .join(sp.as("sb"), col("b_id") === col("sb.doc_id"))
          .filter(col("sa.split") =!= col("sb.split"))
          .select(col("a_id"), col("b_id"),
            col("sa.split").as("split_a"), col("sb.split").as("split_b"),
            col("jaccard"))
          .orderBy("a_id", "b_id")
      }),

    Q("q195_winnowing_pairs",
      // MOSS winnowing fingerprints (Schleimer et al. 2003): window-of-4
      // minima over the ordered 3-gram hash stream, distinct per doc,
      // then pairs sharing >= 2 fingerprints — LOCAL-overlap detection
      // (shared boilerplate runs, partial plagiarism) with a guaranteed
      // floor: any shared run of >= 6 tokens yields a shared
      // fingerprint, at ~2/(w+1) the index size of the full q36 shingle
      // index. Integer end to end; skew-capped inverted index (df <=
      // 256) with the pairStats internal-consistency contract. See
      // [[Winnow]].
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents),
              |hg AS (SELECT doc_id,
              |         LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
              |           i -> ${h32Sql.format("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")}) AS hg
              |       FROM t WHERE LEN(t) >= 3),
              |fps AS (SELECT doc_id,
              |          CASE WHEN LEN(hg) >= 4 THEN
              |            LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(hg) - 3),
              |              p -> LIST_AGGREGATE(hg[p:p+3], 'min')))
              |          ELSE [LIST_AGGREGATE(hg, 'min')] END AS fps
              |        FROM hg),
              |idx AS (SELECT doc_id, UNNEST(fps) AS fp FROM fps),
              |dfp AS (SELECT fp, COUNT(*) AS df FROM idx GROUP BY fp),
              |capl AS (SELECT l.c, SUM(CASE WHEN dfp.df <= l.c
              |                              THEN dfp.df * (dfp.df - 1) // 2 ELSE 0 END) AS cand
              |         FROM (VALUES (32),(64),(128),(256),(512),(1024)) l(c)
              |         CROSS JOIN dfp GROUP BY l.c),
              |capv AS (SELECT COALESCE(MAX(c), 32) AS cap FROM capl
              |         WHERE cand <= 512 * (SELECT COUNT(*) FROM documents)),
              |ci AS (SELECT doc_id, fp FROM idx JOIN dfp USING (fp)
              |       WHERE dfp.df <= (SELECT cap FROM capv))
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared_fp
              |FROM ci a JOIN ci b ON a.fp = b.fp AND a.doc_id < b.doc_id
              |GROUP BY 1, 2
              |HAVING COUNT(*) >= 2
              |ORDER BY a_id, b_id""".stripMargin),
      // fingerprint df cap: corpus-derived (Winnow.adaptiveFpDfCap, the
      // shared ladder solve), rendered above — resolves to 1024 >> max
      // df on testdata, so the hash is unchanged
      (s, d) => {
        val toks = TrainingQueries.cachedDocToks(s, d)
        // fused form: index computed once, cap solved on its own df
        // relation (same ladder arithmetic, same cap, same output)
        Winnow.sharedFingerprintPairsAdaptive(toks, n = 3, w = 4,
            minShared = 2L)
          .orderBy("a_id", "b_id")
      }),

    Q("q196_length_buckets",
      // Length-bucketed batching stats: assign every document to the
      // smallest power-of-two token bucket (16..65536, clamp at top)
      // and report per-bucket doc count, real tokens, padding tokens,
      // and the padding-waste fraction — the table a trainer reads to
      // size batch shapes (the static-shape counterpart of q123's
      // first-fit packing). Map-side CASE ladder + one two-phase agg;
      // exact longs, one IEEE division per bucket.
      Some(s"""WITH d AS (SELECT CAST(LEN($toksSql) AS BIGINT) AS n_tok FROM documents),
              |b AS (SELECT n_tok,
              |        CASE ${LengthBuckets.init.map(t => s"WHEN n_tok <= $t THEN $t")
                               .mkString(" ")}
              |             ELSE ${LengthBuckets.last} END AS bucket
              |      FROM d WHERE n_tok >= 1)
              |SELECT bucket, COUNT(*) AS n_docs,
              |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
              |       CAST(SUM(bucket - n_tok) AS BIGINT) AS n_pad,
              |       ROUND(CAST(SUM(bucket - n_tok) AS DOUBLE)
              |             / CAST(bucket * COUNT(*) AS DOUBLE), 4) AS waste_frac
              |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
      (s, d) => {
        val n = col("n_tok")
        val bucket = LengthBuckets.init.reverse
          .foldLeft(lit(LengthBuckets.last): org.apache.spark.sql.Column)(
            (acc, t) => when(n <= t, lit(t)).otherwise(acc))
        Tables.documents(s, d)
          .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
          .filter(n >= 1)
          .withColumn("bucket", bucket)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum(n).cast("long").as("n_tokens"),
            sum(col("bucket") - n).cast("long").as("n_pad"),
            round(sum(col("bucket") - n).cast("double")
              / (col("bucket") * count(lit(1))).cast("double"), 4).as("waste_frac"))
          .orderBy("bucket")
      }),

    Q("q197_bpe_apply",
      // The APPLY side of q191's trained tokenizer: encode the corpus
      // under the 3 learned merges and report per-source compression —
      // tokens, symbols before (= characters), symbols after, and the
      // after/before ratio a tokenizer team reads to judge a vocabulary.
      // Training and application both run over the DISTINCT-token table
      // (|vocab|·|word| work); the corpus-weighted roll-up is one
      // equi-join of the token stream against the vocab-sized
      // (tok, n_sym) relation and a two-phase agg. The oracle reuses
      // the ONE training CTE chain (bpeChainSql) so q191/q197 can never
      // train divergent merges; all sums are exact longs, one IEEE
      // division per source.
      Some(s"""${Round7Queries.bpeChainSql(3, keepTok = true)},
              |v AS (SELECT tok, CAST(LEN(tok) AS BIGINT) AS n_chr,
              |        CAST(LEN(s) - LEN(REPLACE(s, '<', '')) AS BIGINT) AS n_sym
              |      FROM s3),
              |d AS (SELECT source, UNNEST($toksSql) AS tok FROM documents)
              |SELECT source, COUNT(*) AS n_tok,
              |       CAST(SUM(v.n_chr) AS BIGINT) AS n_sym_before,
              |       CAST(SUM(v.n_sym) AS BIGINT) AS n_sym_after,
              |       ROUND(CAST(SUM(v.n_sym) AS DOUBLE)
              |             / CAST(SUM(v.n_chr) AS DOUBLE), 4) AS compression
              |FROM d JOIN v USING (tok)
              |GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val tc = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        val v = graft.operators.Bpe.appliedSymbolCounts(tc, rounds = 3)
        toks.join(v, "tok")
          .groupBy("source")
          .agg(count(lit(1)).as("n_tok"),
            sum(length(col("tok")).cast("long")).cast("long").as("n_sym_before"),
            sum(col("n_sym")).cast("long").as("n_sym_after"),
            round(sum(col("n_sym")).cast("double")
              / sum(length(col("tok")).cast("long")).cast("double"), 4)
              .as("compression"))
          .orderBy("source")
      }),

    Q("q198_matryoshka_recall",
      // Matryoshka-style truncation recall (Kusupati et al. 2022): can
      // the first 8 / 16 of the 64 embedding dims stand in for the full
      // vector? Per query (the 5 lowest vec_ids, q181's protocol),
      // recall@10 of the truncated-cosine ranking against the full-dim
      // exact ranking — the study a pipeline runs before committing to
      // a cheaper prefix index. Rankings use UNROUNDED sims with vec_id
      // tie-breaks (the q140 discipline — both engines' cosine is
      // bit-identical, so the order is too). Scale shape: one broadcast
      // of 5 query rows against the corpus scan, per-query windows
      // (never global); at 100 TB a d=8 prefix scan moves 1/8 the bytes
      // — exactly what this query quantifies the cost of.
      Some(s"""WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
              |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
              |scored AS (SELECT q.q_id, c.vec_id,
              |             ${TrainingQueries.cosOf("c.embedding", "q.qe")} AS sf,
              |             ${TrainingQueries.cosOf("c.embedding[1:8]", "q.qe[1:8]")} AS s8,
              |             ${TrainingQueries.cosOf("c.embedding[1:16]", "q.qe[1:16]")} AS s16
              |           FROM c CROSS JOIN q),
              |r AS (SELECT q_id, vec_id,
              |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sf DESC, vec_id) AS rf,
              |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s8 DESC, vec_id) AS r8,
              |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s16 DESC, vec_id) AS r16
              |      FROM scored)
              |SELECT q_id,
              |       ROUND(SUM(CASE WHEN rf <= 10 AND r8 <= 10 THEN 1 ELSE 0 END) / 10.0, 4) AS recall_d8,
              |       ROUND(SUM(CASE WHEN rf <= 10 AND r16 <= 10 THEN 1 ELSE 0 END) / 10.0, 4) AS recall_d16
              |FROM r GROUP BY q_id ORDER BY q_id""".stripMargin),
      (s, d) => {
        import graft.functions.VectorFunctions.cosine
        val emb = Tables.embeddings(s, d)
        val c = emb.filter(col("vec_id") >= 5).select(col("vec_id"), col("embedding"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val scored = c.crossJoin(broadcast(q)).select(col("q_id"), col("vec_id"),
          cosine(col("embedding"), col("qe")).as("sf"),
          cosine(slice(col("embedding"), 1, 8), slice(col("qe"), 1, 8)).as("s8"),
          cosine(slice(col("embedding"), 1, 16), slice(col("qe"), 1, 16)).as("s16"))
        val w = Window.partitionBy("q_id")
        val r = scored.select(col("q_id"), col("vec_id"),
          row_number().over(w.orderBy(col("sf").desc, col("vec_id"))).as("rf"),
          row_number().over(w.orderBy(col("s8").desc, col("vec_id"))).as("r8"),
          row_number().over(w.orderBy(col("s16").desc, col("vec_id"))).as("r16"))
        r.groupBy("q_id").agg(
            round(sum(when(col("rf") <= 10 && col("r8") <= 10, 1L).otherwise(0L))
              / 10.0, 4).as("recall_d8"),
            round(sum(when(col("rf") <= 10 && col("r16") <= 10, 1L).otherwise(0L))
              / 10.0, 4).as("recall_d16"))
          .orderBy("q_id")
      }),

    Q("q199_cluster_balanced_select",
      // Cluster-balanced corpus selection: 5 representatives per IVF
      // cell by md5 priority — the diversity-preserving counterpart of
      // q186's quality-ranked budget select (SemDeDup prunes WITHIN
      // cells; this KEEPS a balanced cross-section of every cell).
      // Reuses the session-shared 16-cell k-means (q69/q140/q153) and
      // the q188 consistent-sampling rule: md5(vec_id) priority with
      // vec_id tie-break is a total order, growth-stable, and
      // engine-exact; the per-cell top-5 runs as the skew-safe
      // two-level tournament, never a giant-cell single window task.
      Some(s"""WITH ${ExtendedQueries.kmeansCtePrefix}
              |SELECT cid, vec_id FROM (
              |  SELECT a.cid, a.vec_id,
              |         ROW_NUMBER() OVER (PARTITION BY a.cid
              |           ORDER BY MD5(CAST(a.vec_id AS VARCHAR)), a.vec_id) AS rn
              |  FROM afinal a) t WHERE rn <= 5
              |ORDER BY cid, vec_id""".stripMargin),
      (s, d) => {
        val assigned = graft.operators.Similarity.assignToCentroidsLocal(
            Tables.embeddings(s, d), ExtendedQueries.trainedCentroids(s, d))
          .select(col("cent_id").cast("long").as("cid"), col("vec_id"))
        Skew.topKPerKey(assigned, Seq(col("cid")),
            Seq(md5(col("vec_id").cast("string")), col("vec_id")), k = 5)
          .select(col("cid"), col("vec_id"))
          .orderBy("cid", "vec_id")
      }),

    Q("q200_mmr_rerank",
      // Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
      // 1998): from the top-20 cosine candidates of query vec 0, pick 5
      // greedily by mmr = 0.7·sim(q,d) − 0.3·max_{s∈S} sim(d,s) — the
      // classic diversity re-ranker between retrieval and display. The
      // candidate list is BOUNDED BY CONTRACT (rerank always works on a
      // top-k, never the corpus — that is its scale shape: the corpus
      // pays one broadcast-scan top-k; everything after is 20 rows, so
      // the 20×20 pair matrix and 5 unrolled argmax rounds are noise at
      // any corpus size). Greedy rounds unroll as cumulative CTEs (the
      // k-means discipline); rankings use unrounded sims, vec_id ties.
      Some(mmrOracleSql(rounds = 5)),
      (s, d) => {
        import graft.functions.VectorFunctions.cosine
        val emb = Tables.embeddings(s, d)
        val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        // bounded: 20 rows; checkpointed so the corpus top-k runs ONCE,
        // not once per greedy round
        val cand = emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), col("embedding"),
            cosine(col("embedding"), col("qe")).as("sq"))
          .orderBy(col("sq").desc, col("vec_id")).limit(20)
          .localCheckpoint(true)
        val p = cand.as("a")
          .join(cand.as("b"), col("a.vec_id") =!= col("b.vec_id"))
          .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
            cosine(col("a.embedding"), col("b.embedding")).as("s"))
          .localCheckpoint(true)
        var sel = cand.orderBy(col("sq").desc, col("vec_id")).limit(1)
          .select(lit(1).as("round"), col("vec_id"),
            (lit(0.7) * col("sq")).as("mmr"))
        for (r <- 2 to 5) {
          val ms = p.join(sel.select(col("vec_id").as("b_id")), "b_id")
            .groupBy("a_id").agg(max("s").as("ms"))
          val next = cand.join(sel.select(col("vec_id")), Seq("vec_id"), "left_anti")
            .join(ms, col("vec_id") === col("a_id"))
            .select(col("vec_id"),
              (lit(0.7) * col("sq") - lit(0.3) * col("ms")).as("m"))
            .orderBy(col("m").desc, col("vec_id")).limit(1)
            .select(lit(r).as("round"), col("vec_id"), col("m").as("mmr"))
          sel = sel.unionByName(next)
        }
        sel.select(col("round"), col("vec_id"),
          round(col("mmr"), 4).as("mmr_score")).orderBy("round")
      })
  )

  /** DuckDB twin of the q200 greedy MMR loop, unrolled: cumulative
    * selected-set CTEs S1..S{rounds}, each round's winner by
    * (mmr DESC, vec_id) over the not-yet-selected candidates. */
  private def mmrOracleSql(rounds: Int): String = {
    val cos = TrainingQueries.cosOf _
    val head =
      s"""WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |cand AS (SELECT vec_id, embedding, sq FROM (
         |  SELECT v.vec_id, v.embedding, ${cos("v.embedding", "q.qe")} AS sq,
         |         ROW_NUMBER() OVER (ORDER BY ${cos("v.embedding", "q.qe")} DESC, v.vec_id) AS rn
         |  FROM embeddings v CROSS JOIN qv q WHERE v.vec_id <> 0) t WHERE rn <= 20),
         |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |        ${cos("a.embedding", "b.embedding")} AS s
         |      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |s1 AS (SELECT 1 AS round, vec_id, 0.7 * sq AS mmr FROM (
         |  SELECT vec_id, sq, ROW_NUMBER() OVER (ORDER BY sq DESC, vec_id) AS rn
         |  FROM cand) t WHERE rn = 1),
         |acc1 AS (SELECT * FROM s1)""".stripMargin
    val rest = (2 to rounds).map { r =>
      s"""s$r AS (SELECT $r AS round, vec_id, mmr FROM (
         |  SELECT c.vec_id, 0.7 * c.sq - 0.3 * m.ms AS mmr,
         |         ROW_NUMBER() OVER (ORDER BY (0.7 * c.sq - 0.3 * m.ms) DESC, c.vec_id) AS rn
         |  FROM cand c
         |  JOIN (SELECT p.a_id, MAX(p.s) AS ms FROM p
         |        JOIN acc${r - 1} a ON p.b_id = a.vec_id GROUP BY p.a_id) m
         |    ON m.a_id = c.vec_id
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM acc${r - 1})) t WHERE rn = 1),
         |acc$r AS (SELECT * FROM acc${r - 1} UNION ALL SELECT * FROM s$r)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$rest
       |SELECT round, vec_id, ROUND(mmr, 4) AS mmr_score
       |FROM acc$rounds ORDER BY round""".stripMargin
  }
}
