package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Queries.Q
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Training-data-pipeline query inventory (q36–q44): dedup, similarity
  * search, and text analysis over `documents`/`embeddings` — first-class
  * engine surface alongside Q01–Q35, each with a DuckDB oracle.
  *
  * Oracle strategy: all hashing is md5-derived (HashFunctions), all folds
  * are left-to-right with explicit double casts, so DuckDB reproduces every
  * value exactly. For MinHash+LSH (q37) the oracle is the *exact* Jaccard
  * pair set: candidates are exact-verified (no false positives) and the
  * banding (16 bands x 2 rows, threshold 0.8) has miss probability
  * (1-j^2)^16 <= 4e-8 for any pair at the threshold — the LSH output equals
  * the exact answer on any non-adversarial corpus, and q36 (the exact
  * inverted-index algorithm) pins the same result independently.
  */
object TrainingQueries {

  /** DuckDB SQL fragments mirroring TextAnalysis/HashFunctions. */
  private[graft] val toksSql = "LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '')"
  private[graft] val h32Sql = "CAST('0x' || SUBSTR(MD5(%s), 1, 8) AS BIGINT)"

  private[graft] val shingleRowsSql =
    s"""SELECT doc_id, UNNEST(LIST_DISTINCT(CASE WHEN LEN(t) >= 3 THEN
       |         LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
       |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |       ELSE [] END)) AS shingle
       |FROM (SELECT doc_id, $toksSql AS t FROM documents) d""".stripMargin

  /** The ADAPTIVE-CAPPED shingle relation every pair-stats oracle builds
    * on — Dedup.adaptiveShingleDfCap rendered in SQL, bit-for-bit: pick
    * the largest cap c from the ladder {32..1024} whose materialized
    * candidate count Σ_shingle [df ≤ c]·df·(df−1)//2 fits the
    * 512-per-doc budget (floor 32), then keep only shingles with
    * df ≤ cap. Exact integer arithmetic on both engines (`//` / `div`),
    * so Spark and DuckDB derive the SAME cap from the same corpus at any
    * scale; at the oracle's sf ≤ 0.1 sizes the solve returns 1024 (max
    * df 25), the filter keeps everything, and every consumer hash is
    * unchanged. Ends defining `sh` so consumers splice it where the raw
    * shingle CTE used to sit. */
  private[graft] val cappedShingleCtes =
    s"""sh0 AS ($shingleRowsSql),
       |dfp AS (SELECT shingle, COUNT(*) AS df FROM sh0 GROUP BY shingle),
       |capl AS (SELECT l.c, SUM(CASE WHEN dfp.df <= l.c
       |                              THEN dfp.df * (dfp.df - 1) // 2 ELSE 0 END) AS cand
       |         FROM (VALUES (32),(64),(128),(256),(512),(1024)) l(c)
       |         CROSS JOIN dfp GROUP BY l.c),
       |capv AS (SELECT COALESCE(MAX(c), 32) AS cap FROM capl
       |         WHERE cand <= 512 * (SELECT COUNT(*) FROM documents)),
       |sh AS (SELECT s.doc_id, s.shingle FROM sh0 s JOIN dfp USING (shingle)
       |       WHERE dfp.df <= (SELECT cap FROM capv))""".stripMargin

  /** The UNCAPPED exact pair set — the oracle for the LSH-side
    * consumers (q37, and the cluster relation behind q56/q174/q205/
    * q233/q246), whose declared Spark path exact-verifies its LSH
    * candidates with NO df cap. The capped [[jaccardPairsSql]] below
    * backs the inverted-index (pairStatsAdaptive) consumers. At every
    * oracle-checked scale the two coincide (the adaptive cap resolves
    * above the corpus max df), but each oracle must state ITS path's
    * semantics at any scale. */
  private[graft] val jaccardPairsExactSql =
    s"""WITH sh AS ($shingleRowsSql),
       |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT a_id, b_id,
       |       ROUND(i::DOUBLE / (ca.n_sh + cb.n_sh - i), 4) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = a_id
       |JOIN cnt cb ON cb.doc_id = b_id
       |WHERE ROUND(i::DOUBLE / (ca.n_sh + cb.n_sh - i), 4) >= 0.8
       |ORDER BY a_id, b_id""".stripMargin

  /** Exact pairwise 3-gram Jaccard >= 0.8 over the adaptive-capped
    * shingle relation — the oracle for q36 and the other
    * cachedPairStats consumers. */
  private[graft] val jaccardPairsSql =
    s"""WITH $cappedShingleCtes,
       |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT a_id, b_id,
       |       ROUND(i::DOUBLE / (ca.n_sh + cb.n_sh - i), 4) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = a_id
       |JOIN cnt cb ON cb.doc_id = b_id
       |WHERE ROUND(i::DOUBLE / (ca.n_sh + cb.n_sh - i), 4) >= 0.8
       |ORDER BY a_id, b_id""".stripMargin

  /** DuckDB cosine over lists, mirroring [[graft.functions.FloatVecDot]]'s
    * strict double accumulation AND VectorFunctions.cosine's zero-norm
    * guard (sim = 0.0, not NaN/NULL, for a zero-norm input). ONE copy for
    * every oracle (q34/q43/q44/q69) — the fragment is bit-parity-critical,
    * so it must not fork. */
  private def normSql(v: String): String =
    s"SQRT(LIST_AGGREGATE(LIST_TRANSFORM($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
  /** The indexed double-fold dot product underneath [[cosOf]] — also the
    * fragment the q127 hyperplane buckets reuse (same bit-parity rule:
    * one copy, never forked). */
  private[graft] def dotSql(a: String, b: String): String =
    s"""LIST_AGGREGATE(LIST_TRANSFORM(GENERATE_SERIES(1, LEN($a)),
       |             i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')""".stripMargin
  private[graft] def cosOf(a: String, b: String): String =
    s"""(CASE WHEN ${normSql(a)} * ${normSql(b)} = 0.0 THEN 0.0
       |      ELSE ${dotSql(a, b)}
       |           / (${normSql(a)} * ${normSql(b)}) END)""".stripMargin
  private def cos(a: String, b: String): String = cosOf(a, b)

  /** Oracle for q137: rebuild the 32 md5-permutation minima (the
    * MinHashSig family: a_k = 37k+11, b_k = 101k+7, mod P, empty -> P
    * sentinel), band them 16 x 2 into the same '|'-joined scalar keys as
    * Dedup.lshCandidates, self-join for candidates, then emit the
    * slot-agreement estimate beside the exact Jaccard. Generated, so the
    * permutation coefficients can never drift from HashFunctions. */
  private[graft] val minhashEstimateSql: String = {
    val P = graft.functions.HashFunctions.P
    val sigTerms = (0 until 32).map { k =>
      val a = graft.functions.HashFunctions.permA(k)
      val b = graft.functions.HashFunctions.permB(k)
      s"COALESCE(LIST_MIN(LIST_TRANSFORM(hs, h -> (h * $a + $b) % $P)), $P)"
    }.mkString("[", ",\n             ", "]")
    val bandKeys = (0 until 16).map { b =>
      s"'$b|' || CAST(sig[${2 * b + 1}] AS VARCHAR) || '|' || CAST(sig[${2 * b + 2}] AS VARCHAR)"
    }.mkString("[", ",\n             ", "]")
    s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents),
       |shs AS (SELECT doc_id,
       |               LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
       |                             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
       |        FROM t WHERE LEN(t) >= 3),
       |hs AS (SELECT doc_id, sh,
       |              LIST_TRANSFORM(sh, s -> ${h32Sql.format("s")}) AS hs
       |       FROM shs),
       |sig AS (SELECT doc_id, sh, $sigTerms AS sig FROM hs),
       |banded AS (SELECT doc_id, UNNEST($bandKeys) AS bk FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM banded a JOIN banded b ON a.bk = b.bk AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id,
       |       ROUND(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 32),
       |               i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 32.0,
       |             4) AS est_jaccard,
       |       ROUND(CAST(LEN(LIST_INTERSECT(sa.sh, sb.sh)) AS DOUBLE)
       |             / LEN(LIST_DISTINCT(sa.sh || sb.sh)), 4) AS jaccard
       |FROM cand
       |JOIN sig sa ON a_id = sa.doc_id
       |JOIN sig sb ON b_id = sb.doc_id
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** The co-shingled pair-stats relation (a_id, b_id, inter, n_a, n_b;
    * n=3) shared by the eight set-overlap consumers (q36/q147/q173/q194/
    * q223/q226/q274/q279): every metric is a pure projection of it, and
    * the inverted-index join that produces it is the expensive part of
    * any of them — so it is computed once per (session, sf dir) and
    * checkpointed (a few hundred K scalar rows at sf0.1; exact longs, so
    * every derived hash is unchanged). The shingle df cap is
    * CORPUS-DERIVED ([[Dedup.adaptiveShingleDfCap]], mirrored into the
    * oracles via [[cappedShingleCtes]]): candidate work stays bounded
    * linear in corpus size instead of riding duplication density
    * quadratically until a frozen cap bites (the round-11 `weak`). */
  private val pairStatsCache = new SessionCache[org.apache.spark.sql.DataFrame]
  private[graft] def cachedPairStats(s: org.apache.spark.sql.SparkSession,
                                     d: String): org.apache.spark.sql.DataFrame =
    pairStatsCache.getOrElseUpdate(s, d)(
      Dedup.pairStatsAdaptive(Tables.documents(s, d), "doc_id", "text", n = 3)
        .localCheckpoint(true))

  /** The tokenized corpus (doc_id, source, text, toks, hs) shared by the
    * ARRAY-SIDE members of the per-document text family (q146, q164,
    * q175-q177, q180): the md5 token-hash pass and the tokenize are paid
    * once per (session, sf dir) and each metric is a projection.
    *
    * Two measured boundaries (same-machine full-inventory A/Bs):
    *  - persist(), NOT localCheckpoint: the checkpoint path materializes
    *    wide UnsafeRows every consumer deserializes IN FULL (no column
    *    pruning on a scanned RDD), while the columnar InMemoryRelation
    *    serves each query only the columns it references.
    *  - Only consumers that keep the arrays ARRAY-SIDE (size, HOFs,
    *    shingle explode feeding an immediate agg) read from here. The
    *    row-EXPLODING consumers (q144/q145/q155/q165/q167/q168/q179)
    *    scan parquet directly: decoding a cached array column per output
    *    row costs more than re-splitting the text (q179 1.01 -> 2.17 s,
    *    q144 0.76 -> 1.63 s when they read the cache), so sharing is a
    *    loss exactly where the explode multiplies the decode count. At
    *    100 TB the same rule holds: materialize derived arrays for the
    *    operators that consume arrays; let row-stream operators scan the
    *    columnar source with pruning. */
  private val docToksCache = new SessionCache[org.apache.spark.sql.DataFrame]
  private[graft] def cachedDocToks(s: SparkSession, d: String): DataFrame =
    docToksCache.getOrElseUpdate(s, d) {
      val t = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("source"), col("text"),
          TextAnalysis.tokens(col("text")).as("toks"))
        .withColumn("hs", TextAnalysis.tokenHashes(col("toks")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t.count()
      t
    }

  def all: Seq[Q] = Seq(

    Q("q36_dedup_ngram_jaccard",
      Some(jaccardPairsSql),
      // skew guard ON, self-tuning: the corpus-derived df cap
      // (Dedup.adaptiveShingleDfCap — largest ladder cap whose candidate
      // count fits 512/doc, floor 32), mirrored bit-for-bit into the
      // oracle's cappedShingleCtes. On testdata it resolves to 1024 >>
      // max df 25, so results are unchanged; on a duplication-dense
      // corpus the cap tightens itself, bounding candidate work linear
      // in corpus size (DedupSkewSpec pins both behaviors)
      (s, d) => Dedup.jaccardFromStats(cachedPairStats(s, d), threshold = 0.8)
        .orderBy("a_id", "b_id")),

    Q("q37_dedup_minhash_lsh",
      Some(jaccardPairsExactSql),
      (s, d) => Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
          n = 3, numHashes = 32, bands = 16, threshold = 0.8)
        .orderBy("a_id", "b_id")),

    Q("q137_minhash_estimate",
      // The estimator STUDY behind q37: per LSH candidate pair (bands=16,
      // r=2, NO threshold), the signature-agreement estimate
      // (matching slots / 32 — E[est] = J, the property that lets a
      // 100 TB dedup pass skip exact verification when approximation
      // suffices) beside the exact Jaccard. The oracle rebuilds the md5
      // permutation signatures (same 37k+11 / 101k+7 family as
      // MinHashSig), bands them into the same '|'-joined keys, and must
      // agree on both numbers for the identical candidate set.
      Some(minhashEstimateSql),
      (s, d) => Dedup.minhashEstimatePairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, numHashes = 32, bands = 16)
        .orderBy("a_id", "b_id")),

    Q("q38_dedup_simhash",
      Some(s"""SELECT doc_id,
              |       CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(0, 31), b ->
              |         CASE WHEN LIST_SUM(LIST_TRANSFORM(hs, h ->
              |                CASE WHEN CAST(FLOOR(h / POWER(2, b)) AS BIGINT) % 2 = 1
              |                     THEN 1 ELSE -1 END)) > 0
              |              THEN CAST(POWER(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
              |FROM (SELECT doc_id,
              |             LIST_TRANSFORM($toksSql, t -> ${h32Sql.format("t")}) AS hs
              |      FROM documents) d
              |ORDER BY doc_id""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          Dedup.simhash32(TextAnalysis.tokens(col("text"))).as("simhash"))
        .orderBy("doc_id")),

    Q("q39_text_quality",
      Some(s"""SELECT doc_id,
              |       CAST(LEN(t) AS BIGINT) AS n_tokens,
              |       CAST(LEN(LIST_DISTINCT(t)) AS BIGINT) AS n_distinct,
              |       CAST(LEN(LIST_FILTER(t, x -> x IN ('the','a','of','and','to','in'))) AS BIGINT) AS stop_cnt,
              |       ROUND(LEAST(LEN(t) / 100.0, 1.0) *
              |             (1.0 - LEN(LIST_FILTER(t, x -> x IN ('the','a','of','and','to','in')))::DOUBLE / LEN(t)), 4) AS quality
              |FROM (SELECT doc_id, $toksSql AS t FROM documents) d
              |ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val t = TextAnalysis.tokens(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(t).cast("long").as("n_tokens"),
            size(array_distinct(t)).cast("long").as("n_distinct"),
            TextAnalysis.stopwordCount(t).cast("long").as("stop_cnt"),
            round(TextAnalysis.qualityScore(t), 4).as("quality"))
          .orderBy("doc_id")
      }),

    Q("q40_text_langid",
      Some("""WITH scored AS (
             |  SELECT doc_id, lang,
             |         LEN(LIST_FILTER(t, x -> x IN ('the','of','and'))) AS s_en,
             |         LEN(LIST_FILTER(t, x -> x IN ('el','la','de'))) AS s_es,
             |         LEN(LIST_FILTER(t, x -> x IN ('der','die','das'))) AS s_de,
             |         LEN(LIST_FILTER(t, x -> x IN ('le','et','ou'))) AS s_fr,
             |         LEN(LIST_FILTER(t, x -> x IN ('de','le','he'))) AS s_zh
             |  FROM (SELECT doc_id, lang, LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '') AS t
             |        FROM documents) d)
             |SELECT doc_id,
             |       CASE WHEN s_en >= GREATEST(s_es, s_de, s_fr, s_zh) THEN 'en'
             |            WHEN s_es >= GREATEST(s_de, s_fr, s_zh) THEN 'es'
             |            WHEN s_de >= GREATEST(s_fr, s_zh) THEN 'de'
             |            WHEN s_fr >= s_zh THEN 'fr'
             |            ELSE 'zh' END AS pred_lang,
             |       CAST(CASE WHEN lang = (CASE WHEN s_en >= GREATEST(s_es, s_de, s_fr, s_zh) THEN 'en'
             |            WHEN s_es >= GREATEST(s_de, s_fr, s_zh) THEN 'es'
             |            WHEN s_de >= GREATEST(s_fr, s_zh) THEN 'de'
             |            WHEN s_fr >= s_zh THEN 'fr'
             |            ELSE 'zh' END) THEN 1 ELSE 0 END AS BIGINT) AS is_match
             |FROM scored ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val t = TextAnalysis.tokens(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), TextAnalysis.predictedLang(t).as("pred_lang"), col("lang"))
          .withColumn("is_match",
            when(col("lang") === col("pred_lang"), 1L).otherwise(0L))
          .select("doc_id", "pred_lang", "is_match")
          .orderBy("doc_id")
      }),

    Q("q41_token_counts",
      Some(s"""SELECT doc_id,
              |       CAST(LEN($toksSql) AS BIGINT) AS ws_tokens,
              |       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens,
              |       CAST(LEN(LIST_DISTINCT($toksSql)) AS BIGINT) AS distinct_tokens
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val t = TextAnalysis.tokens(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(t).cast("long").as("ws_tokens"),
            TextAnalysis.regexTokenCount(col("text")).cast("long").as("re_tokens"),
            size(array_distinct(t)).cast("long").as("distinct_tokens"))
          .orderBy("doc_id")
      }),

    Q("q42_text_fingerprint",
      Some(s"""SELECT doc_id,
              |       CAST(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
              |         LIST_TRANSFORM($toksSql, t -> ${h32Sql.format("t")})),
              |         (a, x) -> (a * 31 + x) % 1000000007) AS BIGINT) AS fp
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.fingerprint(TextAnalysis.tokens(col("text"))).as("fp"))
        .orderBy("doc_id")),

    Q("q43_embedding_neardup",
      Some(s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              |       ROUND(${cos("a.embedding", "b.embedding")}, 4) AS sim
              |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |WHERE ROUND(${cos("a.embedding", "b.embedding")}, 4) >= 0.45
              |ORDER BY a_id, b_id""".stripMargin),
      (s, d) => Similarity.cosineNearDupPairs(Tables.embeddings(s, d), 0.45)
        .orderBy("a_id", "b_id")),

    Q("q45_dedup_exact_groups",
      Some("""SELECT MD5(text) AS content_hash, COUNT(*) AS cnt,
             |       MIN(doc_id) AS canonical_id
             |FROM documents GROUP BY MD5(text) ORDER BY canonical_id""".stripMargin),
      (s, d) => Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy("canonical_id")),

    Q("q46_dedup_simhash_pairs",
      Some(s"""WITH sh AS (
              |  SELECT doc_id,
              |         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(0, 31), b ->
              |           CASE WHEN LIST_SUM(LIST_TRANSFORM(hs, h ->
              |                  CASE WHEN CAST(FLOOR(h / POWER(2, b)) AS BIGINT) % 2 = 1
              |                       THEN 1 ELSE -1 END)) > 0
              |                THEN CAST(POWER(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
              |  FROM (SELECT doc_id,
              |               LIST_TRANSFORM($toksSql, t -> ${h32Sql.format("t")}) AS hs
              |        FROM documents) d)
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |       CAST(BIT_COUNT(XOR(a.simhash, b.simhash)) AS BIGINT) AS hamming
              |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |WHERE BIT_COUNT(XOR(a.simhash, b.simhash)) <= 3
              |ORDER BY a_id, b_id""".stripMargin),
      // bands = 8 -> 56 five-piece subset keys of 20 bits (exhaustive for
      // hamming <= 3 by pigeonhole; the oracle is the blocking-independent
      // all-pairs form, so the subset scheme changes cost, never output)
      (s, d) => Dedup.simhashNearDups(Tables.documents(s, d), "doc_id", "text",
          maxHamming = 3, bands = 8)
        .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
        .orderBy("a_id", "b_id")),

    Q("q47_correlated_subquery",
      // decimal-exact inner AVG so the correlated comparison is
      // boundary-stable across engines (Catalyst decorrelates to a join)
      Some("""SELECT c_custkey, ROUND(c_acctbal, 4) AS bal
             |FROM customer c
             |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
             |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_cust_q47")
        s.sql("""SELECT c_custkey, ROUND(c_acctbal, 4) AS bal
                |FROM graft_cust_q47 c
                |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                |                   FROM graft_cust_q47 c2 WHERE c2.c_nationkey = c.c_nationkey)
                |ORDER BY c_custkey""".stripMargin)
      }),

    Q("q48_window_ntile",
      Some("""SELECT o_custkey, o_orderkey,
             |       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
             |       ROUND(PERCENT_RANK() OVER w, 4) AS pr
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 4).as("pr"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    Q("q44_ann_ivf",
      Some(s"""WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16),
              |v AS (SELECT vec_id, embedding FROM embeddings),
              |dots AS (SELECT v.vec_id, c.cid, ${cos("v.embedding", "c.ce")} AS s
              |         FROM v CROSS JOIN c),
              |assign AS (SELECT vec_id, cid FROM
              |             (SELECT vec_id, cid,
              |                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
              |              FROM dots) r WHERE rn = 1),
              |qcell AS (SELECT cid FROM assign WHERE vec_id = 0),
              |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT v.vec_id, ROUND(${cos("v.embedding", "qe")}, 4) AS sim
              |FROM v JOIN assign USING (vec_id) JOIN qcell USING (cid) CROSS JOIN q
              |WHERE v.vec_id <> 0
              |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val cents = Similarity.collectCentroids(emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce")))
        val assigned = Similarity.assignToCentroidsLocal(emb, cents)
        val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        Similarity.ivfTopK(assigned.filter(col("vec_id") =!= 0), cents, query, 10,
          "vec_id", "embedding", "qe")
      })
  )
}
