package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.TrainingQueries.{dotSql, h32Sql, toksSql}
import graft.operators.{Dedup, Similarity, Skew, TextAnalysis, TxLog}
import graft.sources.Tables

/** Round-7 additions, third block: the lake-write tier under the hash
  * gate (q201 proves the keyed MERGE end-to-end the way q156 proved the
  * pruned READ), plus the corpus-QA operators a pipeline runs before
  * committing to a training mix — cross-source contamination mapping,
  * blocklist gating, token-frequency shape, dedup-cluster purity, and
  * two embedding-health screens. Same determinism discipline as the rest
  * of the inventory: integer counts, total tie orders, exact micro-unit
  * longs under every float mean, ROUND at the edge. */
object Round7cQueries {

  /** One merged-orders TxLog zone per (JVM, sf dir): base = orders
    * range-clustered by key into 8 stat-tracked files, then TWO merges —
    * a matched-key update batch (status 'U' over one key band) and an
    * insert batch (key + 10¹² — disjoint from any sf's key space, so the
    * second merge must touch zero existing files). Built once per
    * process; every fresh JVM (each Verify run) rebuilds from source, so
    * the hash gate always checks a from-scratch build + merge + read. */
  private val mergedZones =
    scala.collection.concurrent.TrieMap.empty[String, (String, Long)]
  private[graft] def mergedOrdersZone(s: org.apache.spark.sql.SparkSession,
                                      d: String): String =
    mergedOrdersZoneWithInserts(s, d)._1
  /** The zone plus the EXACT insert-batch row count (the second merge's
    * `insertedRows` — not a hardcoded keyspace assumption, so a sparse
    * orderkey space keeps q213's subtraction honest). */
  private[graft] def mergedOrdersZoneWithInserts(
      s: org.apache.spark.sql.SparkSession, d: String): (String, Long) =
    mergedZones.getOrElseUpdate(d, {
      val zone = java.nio.file.Files
        .createTempDirectory("graft_q201").toString + "/zone"
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
      TxLog.replace(s, zone, base.repartitionByRange(8, col("o_orderkey")),
        statsCols = Seq("o_orderkey"))
      // matched updates: one key band flips to status 'U'
      TxLog.merge(s, zone,
        base.filter(col("o_orderkey").between(1000, 1999))
          .select(col("o_orderkey"), col("o_custkey"),
            lit("U").as("o_orderstatus"), col("o_totalprice")),
        key = "o_orderkey")
      // inserts: keys shifted past any scale factor's range
      val ins = TxLog.merge(s, zone,
        base.filter(col("o_orderkey").between(100, 199))
          .select((col("o_orderkey") + lit(1000000000000L)).as("o_orderkey"),
            col("o_custkey"), lit("N").as("o_orderstatus"), col("o_totalprice")),
        key = "o_orderkey")
      (zone, ins.insertedRows)
    })

  /** One deleted-orders zone per (JVM, sf dir): base = the same 8-file
    * range-clustered layout as q201, then one range DELETE over the
    * [500, 699] key band — two of eight files rewritten, six carried
    * (TxLogDeleteSpec pins the touch count on its own fixture). */
  private val deletedZones = scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def deletedOrdersZone(s: org.apache.spark.sql.SparkSession,
                                       d: String): String =
    deletedZones.getOrElseUpdate(d, {
      val zone = java.nio.file.Files
        .createTempDirectory("graft_q209").toString + "/zone"
      TxLog.replace(s, zone,
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderstatus"), col("o_totalprice"))
          .repartitionByRange(8, col("o_orderkey")),
        statsCols = Seq("o_orderkey"))
      TxLog.deleteWhereCol(s, zone, "o_orderkey", 500, 699)
      zone
    })

  /** One append-only zone + pinned first generation per (JVM, sf dir):
    * gen 1 = low-key orders (replace), then two appends. q210 reads the
    * CHANGE FEED from gen 1 — exactly the appended rows, by file diff. */
  private val feedZones = scala.collection.concurrent.TrieMap
    .empty[String, (String, Long)]
  private[graft] def changeFeedZone(s: org.apache.spark.sql.SparkSession,
                                    d: String): (String, Long) =
    feedZones.getOrElseUpdate(d, {
      val zone = java.nio.file.Files
        .createTempDirectory("graft_q210").toString + "/zone"
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val g1 = TxLog.replace(s, zone, base.filter(col("o_orderkey") < 5000)).gen
      TxLog.append(s, zone,
        base.filter(col("o_orderkey") >= 5000 && col("o_orderkey") < 9000))
      TxLog.append(s, zone, base.filter(col("o_orderkey") >= 9000))
      (zone, g1)
    })

  /** The q38/q46 simhash CTE (bit-parity-critical — same construction),
    * parameterized on the source relation so q208 can run it over its
    * consistent sample while q234 keeps the full-corpus form. */
  private[graft] def simhashShSqlOver(table: String): String =
    s"""sh AS (
       |  SELECT doc_id,
       |         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(0, 31), b ->
       |           CASE WHEN LIST_SUM(LIST_TRANSFORM(hs, h ->
       |                  CASE WHEN CAST(FLOOR(h / POWER(2, b)) AS BIGINT) % 2 = 1
       |                       THEN 1 ELSE -1 END)) > 0
       |                THEN CAST(POWER(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
       |  FROM (SELECT doc_id,
       |               LIST_TRANSFORM($toksSql, t -> ${h32Sql.format("t")}) AS hs
       |        FROM $table) d)""".stripMargin

  private[graft] val simhashShSql = simhashShSqlOver("documents")

  /** q208's deterministic diagnostic sample size: a fixed-priority
    * (md5-keyed) top-N, so the histogram's candidate cost is N²/16 —
    * CONSTANT in corpus size — while any corpus at or below N (sf0.01's
    * 500 docs, where the hash gate runs) is sampled in full. */
  private[graft] val SimhashSampleN = 2000

  def all: Seq[Q] = Seq(

    Q("q201_txlog_merge",
      // The keyed MERGE under the hash gate: equality with the plain
      // anti-join ∪ updates ∪ inserts relational form proves the
      // stats-pruned rewrite (TxLogMergeSpec pins that only overlapping
      // files were touched) lost and invented nothing — the write-side
      // twin of q156's pruned-read check. At 100 TB the property being
      // bought is write amplification: a CDC batch touching one key band
      // rewrites that band's files, never the zone.
      Some("""WITH upd AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice
             |             FROM orders WHERE o_orderkey BETWEEN 1000 AND 1999),
             |ins AS (SELECT o_orderkey + 1000000000000 AS o_orderkey, o_custkey,
             |               'N' AS o_orderstatus, o_totalprice
             |        FROM orders WHERE o_orderkey BETWEEN 100 AND 199),
             |base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |         FROM orders WHERE o_orderkey NOT BETWEEN 1000 AND 1999)
             |SELECT * FROM (SELECT * FROM base UNION ALL
             |               SELECT * FROM upd UNION ALL
             |               SELECT * FROM ins) u
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => TxLog.read(s, mergedOrdersZone(s, d))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
        .orderBy("o_orderkey")),

    Q("q202_cross_source_grams",
      // Cross-source contamination matrix: distinct shared 8-grams per
      // source pair (q146's split check widened to all pairs). The
      // distinct (source, gram) projection bounds every gram's fan-out
      // by the source count — no df cap needed, output ≤ C(|sources|,2)
      // rows. See [[Dedup.crossSourceGramShare]].
      Some(s"""WITH t AS (SELECT source, $toksSql AS t FROM documents),
              |g AS (SELECT DISTINCT source, gram FROM (
              |   SELECT source, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 7),
              |          i -> ARRAY_TO_STRING(LIST_SLICE(t, i, i + 7), ' '))) AS gram
              |   FROM t WHERE LEN(t) >= 8) s)
              |SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
              |FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
              |GROUP BY a.source, b.source
              |ORDER BY src_a, src_b""".stripMargin),
      (s, d) => Dedup.crossSourceGramShare(TrainingQueries.cachedDocToks(s, d), n = 8)
        .orderBy("src_a", "src_b")),

    Q("q203_blocklist_gate",
      // C4-style bad-words dry-run report per source: docs containing
      // any listed token, occurrence totals, flag rate. The list
      // compiles into one codegen'd array-HOF projection — no join, no
      // UDF. See [[TextAnalysis.blocklistStats]].
      Some(s"""WITH d AS (SELECT source,
              |             LEN(LIST_FILTER($toksSql,
              |                 x -> x = 'slow' OR x = 'dup' OR x = 'drop')) AS n_hits
              |           FROM documents)
              |SELECT source, COUNT(*) AS n_docs,
              |       CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
              |       CAST(SUM(n_hits) AS BIGINT) AS total_hits,
              |       ROUND(CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS DOUBLE)
              |             / CAST(COUNT(*) AS DOUBLE), 4) AS flag_rate
              |FROM d GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => TextAnalysis.blocklistStats(Tables.documents(s, d),
          "source", "text", Seq("slow", "dup", "drop"))
        .orderBy("source")),

    Q("q204_zipf_decades",
      // Token-frequency shape at rank decades (1, 2, 4, 8, 16): freq and
      // decay ratio vs rank 1 — the Zipf-fit diagnostic that decides
      // tokenizer vocabulary budgets, using exact integer ratios instead
      // of a log-log regression (whose log sums are not engine-portable).
      // Scale shape: two-phase count agg, global top-16 via
      // TakeOrderedAndProject (driver never holds more than 16 rows),
      // rank by count-of-better over the bounded 16-row relation (the
      // q140/q160 discipline — no partition-less window), 1-row broadcast
      // for the rank-1 frequency.
      Some(s"""WITH v AS (SELECT tok, COUNT(*) AS freq FROM (
              |             SELECT UNNEST($toksSql) AS tok FROM documents) s GROUP BY tok),
              |r AS (SELECT tok, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rank FROM v),
              |top1 AS (SELECT freq AS f1 FROM r WHERE rank = 1)
              |SELECT CAST(rank AS BIGINT) AS rank, tok, freq,
              |       ROUND(CAST(t.f1 AS DOUBLE) / CAST(freq AS DOUBLE), 4) AS decay
              |FROM r CROSS JOIN top1 t WHERE rank IN (1, 2, 4, 8, 16)
              |ORDER BY rank""".stripMargin),
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val freqs = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
        val top = freqs.orderBy(col("freq").desc, col("tok")).limit(16)
        // rank within the top-16 == global rank: every strictly-better
        // row is itself in the top 16, so count-of-better is complete
        val ranked = top.as("a").join(broadcast(top.as("b")),
            col("b.freq") > col("a.freq") ||
              (col("b.freq") === col("a.freq") && col("b.tok") < col("a.tok")),
            "left")
          .select(col("a.tok").as("tok"), col("a.freq").as("freq"),
            col("b.tok").as("btok"))
          .groupBy("tok", "freq")
          .agg((count(col("btok")) + 1L).as("rank"))
        val f1 = top.orderBy(col("freq").desc, col("tok")).limit(1)
          .select(col("freq").as("f1"))
        ranked.crossJoin(broadcast(f1))
          .filter(col("rank").isin(1L, 2L, 4L, 8L, 16L))
          .select(col("rank"), col("tok"), col("freq"),
            round(col("f1").cast("double") / col("freq").cast("double"), 4)
              .as("decay"))
          .orderBy("rank")
      }),

    Q("q205_cluster_purity",
      // Near-dup cluster language purity: per q56 cluster, the majority
      // language's share — the dedup-QA check that catches a
      // too-aggressive LSH threshold gluing unrelated languages into one
      // cluster (purity collapses) before resolution (q174) deletes the
      // wrong docs. Reuses the session-cached cluster relation (shared
      // with q56/q174) + one small join and two aggs; the majority pick
      // is the skew-safe two-level tournament, not a global window.
      Some(s"""WITH RECURSIVE pairs AS (SELECT a_id, b_id FROM (${TrainingQueries.jaccardPairsExactSql})),
              |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              |          UNION ALL SELECT b_id, a_id FROM pairs),
              |reach(node, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.node),
              |cl AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
              |lc AS (SELECT c.cluster_id, d.lang, COUNT(*) AS cnt
              |       FROM cl c JOIN documents d ON d.doc_id = c.doc_id
              |       GROUP BY c.cluster_id, d.lang),
              |sz AS (SELECT cluster_id, CAST(SUM(cnt) AS BIGINT) AS size
              |       FROM lc GROUP BY cluster_id),
              |top AS (SELECT cluster_id, lang AS top_lang, cnt AS top_cnt FROM (
              |          SELECT cluster_id, lang, cnt, ROW_NUMBER() OVER (
              |            PARTITION BY cluster_id ORDER BY cnt DESC, lang) AS rn
              |          FROM lc) t WHERE rn = 1)
              |SELECT s.cluster_id, s.size, t.top_lang,
              |       CAST(t.top_cnt AS BIGINT) AS top_cnt,
              |       ROUND(CAST(t.top_cnt AS DOUBLE) / CAST(s.size AS DOUBLE), 4) AS purity
              |FROM sz s JOIN top t USING (cluster_id)
              |ORDER BY s.cluster_id""".stripMargin),
      (s, d) => {
        val lc = ExtendedQueries.cachedDupClusters(s, d)
          .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
          .groupBy("cluster_id", "lang").agg(count(lit(1)).as("cnt"))
        val sz = lc.groupBy("cluster_id").agg(sum(col("cnt")).as("size"))
        val top = Skew.topKPerKey(lc, Seq(col("cluster_id")),
            Seq(col("cnt").desc, col("lang")), k = 1)
          .select(col("cluster_id"), col("lang").as("top_lang"),
            col("cnt").as("top_cnt"))
        sz.join(top, "cluster_id")
          .select(col("cluster_id"), col("size"), col("top_lang"), col("top_cnt"),
            round(col("top_cnt").cast("double") / col("size").cast("double"), 4)
              .as("purity"))
          .orderBy("cluster_id")
      }),

    Q("q206_norm_stats",
      // Embedding L2-norm health per label: min/max/mean norm — the
      // first screen on a vector column (a collapsed or exploded norm
      // band is the classic broken-encoder symptom). The mean goes
      // through exact micro-unit longs; see
      // [[Similarity.normStatsByGroup]].
      Some(s"""WITH e AS (SELECT label, SQRT(${dotSql("embedding", "embedding")}) AS nv
              |           FROM embeddings),
              |m AS (SELECT label, nv,
              |             CAST(ROUND(nv * 10000.0, 0) AS BIGINT) AS micro FROM e)
              |SELECT label, COUNT(*) AS n,
              |       ROUND(MIN(nv), 4) AS min_norm,
              |       ROUND(MAX(nv), 4) AS max_norm,
              |       ROUND(CAST(SUM(micro) AS DOUBLE)
              |             / (CAST(COUNT(*) AS DOUBLE) * 10000.0), 4) AS mean_norm
              |FROM m GROUP BY label ORDER BY label""".stripMargin),
      (s, d) => Similarity.normStatsByGroup(Tables.embeddings(s, d), "label")
        .orderBy("label")),

    Q("q207_dim_screen",
      // Per-dimension mean/variance over 10⁻⁴-quantized values: the
      // dead-dimension screen run before an ANN index or Matryoshka
      // truncation (q198) commits to a prefix. Exact integer sums under
      // the float mean/variance; see [[Similarity.dimScreen]].
      Some("""WITH x AS (SELECT i AS pos,
             |             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000.0, 0) AS BIGINT) AS v4
             |           FROM embeddings, (SELECT UNNEST(GENERATE_SERIES(1,
             |                (SELECT MAX(LEN(embedding)) FROM embeddings))) AS i))
             |SELECT pos, COUNT(*) AS n,
             |       ROUND(CAST(SUM(v4) AS DOUBLE)
             |             / (CAST(COUNT(*) AS DOUBLE) * 10000.0), 6) AS mean_v,
             |       ROUND(CAST(SUM(v4 * v4) AS DOUBLE)
             |               / (CAST(COUNT(*) AS DOUBLE) * 100000000.0)
             |             - (CAST(SUM(v4) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 10000.0))
             |               * (CAST(SUM(v4) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 10000.0)),
             |             6) AS var_v,
             |       CAST(ROUND(CAST(SUM(v4 * v4) AS DOUBLE)
             |               / (CAST(COUNT(*) AS DOUBLE) * 100000000.0)
             |             - (CAST(SUM(v4) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 10000.0))
             |               * (CAST(SUM(v4) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 10000.0)),
             |             6) < 0.0001 AS INT) AS is_dead
             |FROM x GROUP BY pos ORDER BY pos""".stripMargin),
      (s, d) => Similarity.dimScreen(Tables.embeddings(s, d))),

    Q("q209_txlog_delete",
      // The targeted DELETE under the hash gate: a range scrub over one
      // key band, read back in full and hash-compared to the plain
      // NOT-BETWEEN filter — the GDPR/retention write path proven the
      // same way q201 proves merge. TxLogDeleteSpec pins that only the
      // stats-overlapping files were rewritten; the hash pins that the
      // rewrite lost and invented nothing.
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM orders WHERE o_orderkey NOT BETWEEN 500 AND 699
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => TxLog.read(s, deletedOrdersZone(s, d))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
        .orderBy("o_orderkey")),

    Q("q210_txlog_change_feed",
      // The append-only change feed under the hash gate: two appends
      // after the pinned base generation, served by FILE DIFF — the
      // incremental-consumer read (a maintained aggregate pays for the
      // delta, never the zone; TxLogDeleteSpec pins the incremental-agg
      // equivalence and the rewrite refusal). Equality with the plain
      // key-range filter proves the diff is exactly the delta.
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders WHERE o_orderkey >= 5000
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val (zone, g1) = changeFeedZone(s, d)
        TxLog.appendedBetween(s, zone, g1)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy("o_orderkey")
      }),

    Q("q211_hard_negatives",
      // Hard-negative mining for contrastive embedding training: per
      // query vector, the 5 most-similar vectors with a DIFFERENT label
      // — the "looks close, should be far" pairs a triplet/InfoNCE run
      // feeds beside its positives. Rounded-cosine + vec_id total order;
      // the top-5 pick is the skew-safe two-level tournament, not a
      // per-query window over the whole corpus. Scale shape: 5 query
      // rows broadcast against the corpus scan (the label filter rides
      // in the join), candidates never leave their partition until the
      // bounded local top-5s union.
      Some(s"""WITH c AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id >= 5),
              |q AS (SELECT vec_id AS q_id, label AS ql, embedding AS qe
              |      FROM embeddings WHERE vec_id < 5),
              |s AS (SELECT q.q_id, c.vec_id,
              |             ROUND(${TrainingQueries.cosOf("c.embedding", "q.qe")}, 4) AS sim
              |      FROM c CROSS JOIN q WHERE c.label <> q.ql)
              |SELECT q_id, vec_id, sim FROM (
              |  SELECT q_id, vec_id, sim, ROW_NUMBER() OVER (
              |    PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn FROM s) t
              |WHERE rn <= 5 ORDER BY q_id, vec_id""".stripMargin),
      (s, d) => {
        import graft.functions.VectorFunctions.cosine
        val emb = Tables.embeddings(s, d)
        val c = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id"), col("label"), col("embedding"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("label").as("ql"),
            col("embedding").as("qe"))
        val scored = c.join(broadcast(q), col("label") =!= col("ql"))
          .select(col("q_id"), col("vec_id"),
            round(cosine(col("embedding"), col("qe")), 4).as("sim"))
        Skew.topKPerKey(scored, Seq(col("q_id")),
            Seq(col("sim").desc, col("vec_id")), k = 5)
          .select("q_id", "vec_id", "sim")
          .orderBy("q_id", "vec_id")
      }),

    Q("q212_incremental_agg",
      // Incremental view maintenance under the hash gate: the per-key
      // (count, decimal sum) aggregate over the q210 zone computed as
      // BASE-SNAPSHOT AGG ⊎ CHANGE-FEED AGG (partial aggs combined by a
      // second agg — the maintained-view update step), hash-equal to the
      // oracle's flat GROUP BY over everything. Works because count and
      // decimal sum are commutative monoids — the exactness the dsum
      // discipline exists for (float sums would drift between the
      // incremental and flat forms). At 100 TB the view update reads
      // one batch's files, never the zone.
      Some(s"""SELECT o_custkey, COUNT(*) AS n_orders,
              |       ${Queries.dsumSql("o_totalprice")} AS total
              |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      (s, d) => {
        val (zone, g1) = changeFeedZone(s, d)
        val base = TxLog.readSnapshot(s, zone,
          TxLog.snapshotAt(s, zone, g1).getOrElse(
            sys.error(s"q212: base generation $g1 vacuumed")))
        val delta = TxLog.appendedBetween(s, zone, g1)
        def part(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("o_custkey").agg(count(lit(1)).as("n"),
            Queries.dsum(col("o_totalprice")).as("t"))
        part(base).unionByName(part(delta))
          .groupBy("o_custkey")
          .agg(sum(col("n")).as("n_orders"),
            sum(col("t")).cast("decimal(18,4)").cast("double").as("total"))
          .orderBy("o_custkey")
      }),

    Q("q213_metadata_count",
      // COUNT(*) answered from the manifest's per-file row stats — zero
      // data files read (the plan is a 1-row LocalRelation; Round7cSpec
      // pins that metadataCount needs no scan and agrees after merge and
      // delete). The aggregate-pushdown path every lake format serves
      // from metadata; the hash gate proves the committed stats carry
      // the EXACT count through replace + merge + merge.
      Some("SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders"),
      (s, d) => {
        // the q201 zone: base orders + one update merge (row count
        // unchanged) + one insert merge - so the metadata count must
        // equal |orders| + insertedRows; subtracting the merge's OWN
        // reported insert count (not a keyspace assumption) yields
        // |orders| for the oracle comparison
        val (zone, inserted) = mergedOrdersZoneWithInserts(s, d)
        val n = TxLog.metadataCount(s, zone).getOrElse(
          sys.error("q213: zone lost its stats - metadataCount fell back"))
        import s.implicits._
        Seq(n - inserted).toDF("n")
      }),

    Q("q208_simhash_hamming_hist",
      // The SimHash distance histogram that justifies a near-dup
      // threshold choice: pair counts by hamming distance up to 7, found
      // via 8 × 4-bit rotating bands (pigeonhole: hamming ≤ 7 ⇒ at least
      // one of 8 bands identical — the banded join IS exhaustive over
      // its input). q46 lists the ≤3 pairs; this is the distribution a
      // pipeline inspects before picking that 3.
      // Scale contract: exhaustiveness at ≤7 forces 4-bit band keys (16
      // values), whose buckets grow n²/16 — quadratic in corpus size, so
      // the DECLARED diagnostic runs over a [[SimhashSampleN]]-doc
      // CONSISTENT sample (md5-priority, the q188 machinery): a doc's
      // priority never changes, so the sample — and the histogram — is
      // reproducible across runs and engines, and the candidate cost is
      // constant in corpus size. Corpora at or below the sample size
      // (sf0.01, where the hash gate runs) are sampled in FULL, so the
      // oracle checks the exact exhaustive histogram there
      // (Round7cSpec pins sampled == full at that scale). The full-
      // corpus form stays available as Dedup.simhashNearDups for the
      // production ≤3 filter (piece-subset pigeonhole keys — 56
      // twenty-bit subsets at the default geometry).
      Some(s"""WITH smp AS (SELECT doc_id, text FROM documents
              |             ORDER BY MD5('shs|' || CAST(doc_id AS VARCHAR)), doc_id
              |             LIMIT $SimhashSampleN),
              |${simhashShSqlOver("smp")}
              |SELECT CAST(BIT_COUNT(XOR(a.simhash, b.simhash)) AS BIGINT) AS hamming,
              |       COUNT(*) AS n_pairs
              |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |WHERE BIT_COUNT(XOR(a.simhash, b.simhash)) <= 7
              |GROUP BY 1 ORDER BY hamming""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d)
        // TakeOrderedAndProject: per-partition top-N, merged once — the
        // global-limit plan that never single-partition-sorts the corpus
        val smp = docs
          .select(col("doc_id"), col("text"),
            md5(concat(lit("shs|"), col("doc_id").cast("string"))).as("__pri"))
          .orderBy(col("__pri"), col("doc_id"))
          .limit(SimhashSampleN)
          .select("doc_id", "text")
        Dedup.simhashNearDups(smp, "doc_id", "text", maxHamming = 7, bands = 8)
          .groupBy(col("hamming").cast("long").as("hamming"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("hamming")
      })
  )
}
