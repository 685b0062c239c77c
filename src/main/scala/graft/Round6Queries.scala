package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.{GlobalOrder, TextAnalysis, TxLog}
import graft.sources.Tables

/** Round-6 inventory extension: the transaction-log read path under the
  * hash gate. q156 reads lineitem THROUGH a TxLog zone with typed per-file
  * stats and a date-range predicate, so manifest-based file skipping (the
  * 100 TB difference between scanning 3 files and 800k) is pinned by the
  * same rows+schema+hash oracle as every other operator, not just by unit
  * tests. Reference anchor: the reference lake writes raw hour prefixes
  * with no stats/skipping at all (`lib/dynamodb-streaming-datalake-stack
  * .ts:199-203`), so every reader scans the full zone; this is the
  * engine's answer. */
object Round6Queries {

  import TrainingQueries.toksSql

  /** One TxLog zone per (JVM, sf dir): lineitem clustered by l_shipdate
    * (range partitioning = what turns per-file min/max into a sharp
    * pruning predicate) and committed with typed stats. Built once per
    * process so a bench's timed pass measures the pruned READ, while
    * every fresh JVM (each Verify run) rebuilds from the source parquet —
    * no stale state can leak across driver rounds. */
  private val zones = scala.collection.concurrent.TrieMap.empty[String, String]

  private[graft] def shipdateZone(s: SparkSession, d: String): String =
    zones.getOrElseUpdate(d, {
      val san = d.replaceAll("[^A-Za-z0-9.]", "_")
      val zone = java.nio.file.Files
        .createTempDirectory(s"graft_q156_$san").toString + "/zone"
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
      TxLog.replace(s, zone,
        li.repartitionByRange(8, col("l_shipdate")),
        statsCols = Seq("l_shipdate"))
      zone
    })

  /** Z-ordered TxLog zone over (l_partkey, l_quantity): clusterByZ makes
    * every file's min/max tight on BOTH columns at once, so q157's
    * conjunctive range read prunes on their intersection. Partkey is
    * bucketed into the z-value's 10-bit budget with a divisor derived
    * from the table's actual max key (Layout.zValue IGNORES bits above
    * 2^bits, so an overflowing bucket id would interleave DISTANT
    * partkeys into the same z-cells — every file's min/max then spans
    * the whole key range and pruning silently degenerates to a full
    * scan at exactly the scale it exists for); quantity fits raw. The
    * floor of 32 keeps the small-sf layout identical to the fixed /32
    * bucketing this query shipped with. */
  private val zZones = scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def zorderZone(s: SparkSession, d: String): String =
    zZones.getOrElseUpdate(d, {
      val zone = java.nio.file.Files
        .createTempDirectory("graft_q157").toString + "/zone"
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_quantity"))
      val maxPk = li.agg(max(col("l_partkey")).cast("long")).first().getLong(0)
      val div = math.max(32L, (maxPk >> 10) + 1L) // ceil-ish: maxPk/div < 1024
      val clustered = graft.operators.Layout.clusterByZ(
        li.withColumn("_pb", floor(col("l_partkey") / div)),
        Seq("_pb", "l_quantity"), bits = 10, numFiles = 16).drop("_pb")
      TxLog.replace(s, zone, clustered,
        statsCols = Seq("l_partkey", "l_quantity"))
      zone
    })

  /** Two generations over lineitem split by quantity: gen 1 = the
    * low-quantity rows (replace), gen 2 = gen 1 + the rest (append).
    * q158 reads the PINNED gen-1 snapshot after gen 2 exists — time
    * travel within the vacuum retention window, under the hash gate. */
  private val ttZones = scala.collection.concurrent.TrieMap
    .empty[String, (String, TxLog.Snapshot)]
  private[graft] def timeTravelZone(s: SparkSession, d: String): (String, TxLog.Snapshot) =
    ttZones.getOrElseUpdate(d, {
      val zone = java.nio.file.Files
        .createTempDirectory("graft_q158").toString + "/zone"
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val gen1 = TxLog.replace(s, zone, li.filter(col("l_quantity") <= 25))
      TxLog.append(s, zone, li.filter(col("l_quantity") > 25))
      (zone, gen1)
    })

  def all: Seq[Q] = Seq(

    Q("q156_txlog_pruned_read",
      // the oracle reads the SAME rows straight from the source table —
      // equality proves the zone build + manifest pruning lost nothing
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <= TIMESTAMP '1996-03-31 23:59:59'
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate""".stripMargin),
      // the PLAIN read path: spark.read over the zone + an ordinary
      // filter — the DSv2 table's pushdown hands the range to the
      // manifest's stats pruning (the round-10 batch twin of the
      // streaming hook), where this query previously had to call the
      // explicit readWhereCol API to get the same file skip
      (s, d) => s.read.format("txlog").option("zone", shipdateZone(s, d)).load()
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") <= lit("1996-03-31 23:59:59").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
        // (l_orderkey, l_linenumber) is NOT unique in the driver testdata
        // — order by every output column so ties cannot fork the oracle
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")),

    Q("q157_txlog_zorder_pruned",
      // conjunctive range read over the Z-ordered zone: correctness is
      // the plain two-predicate filter; the zone layout + per-column
      // stats intersection is the engine's business (Round6Spec pins
      // that the scan honors the intersected keep-list)
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
             |FROM lineitem
             |WHERE l_partkey BETWEEN 50 AND 120
             |  AND l_quantity BETWEEN 10 AND 20
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin),
      (s, d) => TxLog
        .readWhereCols(s, zorderZone(s, d),
          Seq(("l_partkey", 50, 120), ("l_quantity", 10, 20)))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_quantity"))
        // non-unique (l_orderkey, l_linenumber): total-order on all
        // output columns (this flaked at sf0.001 before the tiebreak)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")),

    Q("q158_txlog_time_travel",
      // the pinned gen-1 snapshot read AFTER gen 2 was published must
      // see exactly the pre-append rows — snapshot isolation / time
      // travel under the hash gate
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem WHERE l_quantity <= 25
             |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin),
      (s, d) => {
        val (zone, gen1) = timeTravelZone(s, d)
        TxLog.readSnapshot(s, zone, gen1)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          // non-unique (l_orderkey, l_linenumber): total-order on all
          // output columns so oracle tie order cannot diverge
          .orderBy("l_orderkey", "l_linenumber", "l_quantity")
      }),

    Q("q159_knn_join",
      // Batch k-NN JOIN: the 20 lowest-id vectors are the query set, the
      // rest the corpus; every query probes its 3 best IVF cells (the
      // shared deterministic adaptive-k training) and takes exact cosine top-5
      // inside them. Candidates are a cell equi-join — |q|·nProbe·(n/16)
      // rows, never |q|·n — and the oracle replays the identical probe
      // and ranking arithmetic (rounded cosine, lowest-id ties) over the
      // same unrolled k-means CTEs as q69/q140.
      Some(s"""WITH ${ExtendedQueries.kmeansCtePrefix},
              |qs AS (SELECT vec_id AS q_id, embedding AS qe FROM v WHERE vec_id < 20),
              |qprob AS (SELECT q_id, qe, cid FROM (
              |  SELECT q.q_id, q.qe, c.cid,
              |         ROW_NUMBER() OVER (PARTITION BY q.q_id
              |           ORDER BY ROUND(${TrainingQueries.cosOf("q.qe", "c.ce")}, 4) DESC,
              |                    c.cid) AS rn
              |  FROM qs q CROSS JOIN c2 c) r WHERE rn <= 3),
              |cand AS (SELECT p.q_id, p.qe, a.vec_id, a.embedding
              |         FROM qprob p JOIN afinal a ON a.cid = p.cid
              |         WHERE a.vec_id >= 20),
              |ranked AS (SELECT q_id, vec_id,
              |                  ROUND(${TrainingQueries.cosOf("qe", "embedding")}, 4) AS sim,
              |                  CAST(ROW_NUMBER() OVER (PARTITION BY q_id
              |                    ORDER BY ROUND(${TrainingQueries.cosOf("qe", "embedding")}, 4) DESC,
              |                             vec_id) AS BIGINT) AS rank
              |           FROM cand)
              |SELECT q_id, vec_id, sim, rank FROM ranked WHERE rank <= 5
              |ORDER BY q_id, rank""".stripMargin),
      (s, d) => {
        import graft.operators.Similarity
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val corpus = emb.filter(col("vec_id") >= 20)
        Similarity.knnJoinIvf(corpus, queries,
            ExtendedQueries.trainedCentroids(s, d), k = 5, nProbe = 3)
          .orderBy("q_id", "rank")
      }),

    Q("q160_bm25_topk",
      // BM25 retrieval (k1=1.2, b=0.75) for a data-derived query-term set
      // (document-frequency ranks 10-12, ties by term), top-10 documents.
      // Determinism discipline of the q144-q146 family: the idf factor
      // (N-df+0.5)/(df+0.5) and the tf saturation tf(k1+1)/(tf+k1(1-b+
      // b*dl/avgdl)) are each ONE IEEE division of exact integers (both
      // rationals scaled through by 2 resp. 10*L so numerator and
      // denominator stay integral and < 2^53), rounded to 6dp, multiplied
      // EXACTLY as decimals, and summed EXACTLY as decimals — no
      // order-dependent double summation, no transcendental log (the
      // log-idf variant ranks identically for fixed N; see q145's note).
      Some(s"""WITH tok AS (SELECT doc_id, UNNEST($toksSql) AS tok FROM documents),
              |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
              |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
              |dfr AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
              |nn AS (SELECT COUNT(*) AS n FROM dl),
              |ll AS (SELECT CAST(SUM(dl) AS BIGINT) AS l FROM dl),
              |qt AS (SELECT tok, df FROM (
              |  SELECT tok, df, ROW_NUMBER() OVER (ORDER BY df DESC, tok) AS rk
              |  FROM dfr) r WHERE rk BETWEEN 10 AND 12),
              |per AS (SELECT tf.doc_id, ROUND(
              |    CAST(ROUND(CAST(2*nn.n - 2*qt.df + 1 AS DOUBLE)
              |               / CAST(2*qt.df + 1 AS DOUBLE), 6) AS DECIMAL(18,6))
              |  * CAST(ROUND(CAST(22 * tf.tf * ll.l AS DOUBLE)
              |               / CAST(10 * ll.l * tf.tf + 3 * ll.l + 9 * dl.dl * nn.n AS DOUBLE), 6)
              |         AS DECIMAL(18,6)), 6) AS s
              |  FROM tf JOIN qt USING (tok) JOIN dl USING (doc_id), nn, ll),
              |sc AS (SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS score FROM per GROUP BY doc_id)
              |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin),
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        // tf materialized once (round 16): doc length, df, and the scoring
        // join all derive from it — dl = SUM(tf) per doc IS the doc's
        // token count, so the separate tokenize pass for dl is gone too
        val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
          .localCheckpoint(true)
        val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
        val dfr = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val nn = dl.agg(count(lit(1)).as("n"))
        val ll = dl.agg(sum(col("dl")).cast("long").as("l"))
        // rank the vocabulary by df without a partition-less window: the
        // engine's own two-pass GlobalOrder row number
        val qt = GlobalOrder.rowNumber(dfr, Seq(col("df").desc, col("tok")), "rk")
          .filter(col("rk").between(10, 12)).select("tok", "df")
        val idf = round((lit(2) * col("n") - lit(2) * col("df") + lit(1)).cast("double")
          / (lit(2) * col("df") + lit(1)).cast("double"), 6).cast("decimal(18,6)")
        val tfp = round((lit(22) * col("tf") * col("l")).cast("double")
          / (lit(10) * col("l") * col("tf") + lit(3) * col("l")
             + lit(9) * col("dl") * col("n")).cast("double"), 6).cast("decimal(18,6)")
        tf.join(broadcast(qt), "tok")
          .join(dl, "doc_id")
          .crossJoin(broadcast(nn)).crossJoin(broadcast(ll))
          .select(col("doc_id"), round(idf * tfp, 6).as("s"))
          .groupBy("doc_id").agg(sum(col("s")).cast("double").as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(10)
      }),

    Q("q161_event_transitions",
      // First-order Markov transition matrix over per-user event
      // sequences: LEAD over (ts, event_id) within each user, pair
      // counts, and row-normalized probabilities — exact BIGINT counts
      // down to one IEEE division, ROUND 4 (the family discipline).
      Some("""WITH seqd AS (SELECT user_id, event_type,
             |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
             |  FROM events),
             |pairs AS (SELECT event_type AS from_type, next_type AS to_type,
             |                 COUNT(*) AS n_transitions
             |          FROM seqd WHERE next_type IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS t
             |        FROM pairs GROUP BY 1)
             |SELECT p.from_type, p.to_type, p.n_transitions,
             |       ROUND(CAST(p.n_transitions AS DOUBLE) / CAST(t.t AS DOUBLE), 4) AS prob
             |FROM pairs p JOIN tot t USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val seqd = Tables.events(s, d).select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        val pairs = seqd.filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n_transitions"))
        // the per-from-type totals are at most |event types| rows —
        // always broadcastable, never a second wide shuffle
        val tot = pairs.groupBy("from_type")
          .agg(sum("n_transitions").cast("long").as("t"))
        pairs.join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type"), col("n_transitions"),
            round(col("n_transitions").cast("double") / col("t").cast("double"), 4)
              .as("prob"))
          .orderBy("from_type", "to_type")
      }),

    Q("q162_sorted_neighborhood",
      // Sorted-neighborhood dedup blocking — the third classic candidate-
      // generation family beside inverted-index (q36) and LSH banding
      // (q37/q143): sort documents by a blocking key (first 5 tokens),
      // take candidate pairs within a window of 5 positions, keep pairs
      // with token-set Jaccard >= 0.5 (the threshold test 2*|A∩B| >= |A∪B|
      // is INTEGER-exact). The global sort position comes from the two-
      // pass GlobalOrder scan, not a single-partition window, and the
      // window join is an equi-join on exploded neighbor positions —
      // w scalar rows per document, never a cross join.
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS tall FROM documents),
              |k AS (SELECT doc_id, ARRAY_TO_STRING(tall[1:5], ' ') AS bkey,
              |             LIST_DISTINCT(tall) AS toks FROM t),
              |rn AS (SELECT doc_id, toks,
              |             CAST(ROW_NUMBER() OVER (ORDER BY bkey, doc_id) AS BIGINT) AS rn
              |       FROM k),
              |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |                 CAST(LEN(LIST_INTERSECT(a.toks, b.toks)) AS BIGINT) AS inter,
              |                 CAST(LEN(a.toks) + LEN(b.toks)
              |                      - LEN(LIST_INTERSECT(a.toks, b.toks)) AS BIGINT) AS uni
              |          FROM rn a JOIN rn b ON b.rn > a.rn AND b.rn <= a.rn + 5)
              |SELECT a_id, b_id, ROUND(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 4) AS jaccard
              |FROM pairs WHERE uni > 0 AND 2 * inter >= uni
              |ORDER BY a_id, b_id""".stripMargin),
      (s, d) => {
        val k = Tables.documents(s, d)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tall"))
          .select(col("doc_id"), concat_ws(" ", slice(col("tall"), 1, 5)).as("bkey"),
            array_distinct(col("tall")).as("toks"))
        val rn = GlobalOrder.rowNumber(k, Seq(col("bkey"), col("doc_id")), "rn")
          .select("doc_id", "toks", "rn")
        val probes = rn.select(col("doc_id").as("a_id"), col("toks").as("a_toks"),
          explode(sequence(col("rn") + 1, col("rn") + 5)).as("rn"))
        val inter = size(array_intersect(col("a_toks"), col("b_toks"))).cast("long")
        val uni = size(col("a_toks")).cast("long") + size(col("b_toks")).cast("long") - inter
        probes.join(rn.select(col("doc_id").as("b_id"), col("toks").as("b_toks"),
            col("rn")), "rn")
          .select(col("a_id"), col("b_id"), inter.as("inter"), uni.as("uni"))
          .filter(col("uni") > 0 && col("inter") * 2 >= col("uni"))
          .select(col("a_id"), col("b_id"),
            round(col("inter").cast("double") / col("uni").cast("double"), 4)
              .as("jaccard"))
          .orderBy("a_id", "b_id")
      }),

    Q("q163_hits_scores",
      // HITS hubs & authorities on the supplier→customer fulfillment
      // graph, two unrolled mutual-reinforcement rounds from hub=1 —
      // UNNORMALIZED, so every score is an exact BIGINT sum of BIGINTs
      // (the conventional per-round L2 normalization rescales both
      // vectors uniformly and cannot change the ranking; dropping it is
      // what makes a bit-stable cross-engine oracle possible). Top-10
      // per side via TakeOrderedAndProject, no global window. Reuses the
      // session-cached fulfillment edge relation shared with the
      // PageRank family (q139/q142/q151).
      Some("""WITH e AS (SELECT DISTINCT l_suppkey AS s, o_custkey AS c
             |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |a1 AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS a FROM e GROUP BY c),
             |h1 AS (SELECT e.s, CAST(SUM(a1.a) AS BIGINT) AS h FROM e JOIN a1 USING (c) GROUP BY e.s),
             |a2 AS (SELECT e.c, CAST(SUM(h1.h) AS BIGINT) AS a FROM e JOIN h1 USING (s) GROUP BY e.c),
             |h2 AS (SELECT e.s, CAST(SUM(a2.a) AS BIGINT) AS h FROM e JOIN a2 USING (c) GROUP BY e.s)
             |SELECT side, node, score FROM (
             |  (SELECT 'authority' AS side, CAST(c AS BIGINT) AS node, a AS score
             |   FROM a2 ORDER BY a DESC, c LIMIT 10)
             |  UNION ALL
             |  (SELECT 'hub' AS side, CAST(s AS BIGINT) AS node, h AS score
             |   FROM h2 ORDER BY h DESC, s LIMIT 10))
             |ORDER BY side, score DESC, node""".stripMargin),
      (s, d) => {
        val e = AnalyticsQueries.fulfillmentEdges(s, d)
          .select(col("src").as("s"), (col("dst") - 1000000L).as("c"))
        val a1 = e.groupBy("c").agg(count(lit(1)).as("a"))
        val h1 = e.join(a1, "c").groupBy("s").agg(sum("a").as("h"))
        val a2 = e.join(h1, "s").groupBy("c").agg(sum("h").as("a"))
        val h2 = e.join(a2, "c").groupBy("s").agg(sum("a").as("h"))
        val atop = a2.orderBy(col("a").desc, col("c")).limit(10)
          .select(lit("authority").as("side"), col("c").as("node"), col("a").as("score"))
        val htop = h2.orderBy(col("h").desc, col("s")).limit(10)
          .select(lit("hub").as("side"), col("s").as("node"), col("h").as("score"))
        atop.unionByName(htop).orderBy(col("side"), col("score").desc, col("node"))
      }),

    Q("q164_repetition_ratio",
      // Intra-document repetition — the duplicate-3-gram fraction used as
      // a generation/boilerplate quality filter (MassiveText-style): for
      // docs with >= 3 tokens, rep = (total - distinct) / total 3-gram
      // occurrences. Exact integer counts, one IEEE division, ROUND 4;
      // top-20 most repetitive (rep DESC, doc_id) via
      // TakeOrderedAndProject. Map-side only until the final top-k —
      // per-document arithmetic, no shuffle of token rows.
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |g AS (SELECT doc_id,
              |         CAST(LEN(toks) - 2 AS BIGINT) AS n_grams,
              |         CAST(LEN(LIST_DISTINCT(
              |           LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
              |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
              |           AS BIGINT) AS n_distinct
              |       FROM t WHERE LEN(toks) >= 3)
              |SELECT doc_id, n_grams, n_distinct,
              |       ROUND(CAST(n_grams - n_distinct AS DOUBLE)
              |             / CAST(n_grams AS DOUBLE), 4) AS rep
              |FROM g ORDER BY rep DESC, doc_id LIMIT 20""".stripMargin),
      (s, d) => {
        TrainingQueries.cachedDocToks(s, d)
          .select(col("doc_id"), col("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            (size(col("toks")) - 2).cast("long").as("n_grams"),
            size(TextAnalysis.shingles(col("toks"), 3)).cast("long").as("n_distinct"))
          .select(col("doc_id"), col("n_grams"), col("n_distinct"),
            round((col("n_grams") - col("n_distinct")).cast("double")
              / col("n_grams").cast("double"), 4).as("rep"))
          .orderBy(col("rep").desc, col("doc_id")).limit(20)
      }),

    Q("q165_mixture_weights",
      // Training-mixture weights per source domain: token share and the
      // temperature-scaled sampling weight w_i = sqrt(share_i) (alpha =
      // 0.5 up/down-weighting), normalized to sum 1 — the data-mixing
      // step of an LLM pretraining pipeline. sqrt IS IEEE-exact
      // (correctly rounded, unlike log/exp), its 6dp rounding goes
      // through DECIMAL so the normalizing sum is order-independent,
      // and the final normalization is one IEEE division. All
      // aggregates are broadcastable scalars (|sources| rows).
      Some(s"""WITH d AS (SELECT source, LEN($toksSql) AS ntok FROM documents),
              |src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |               CAST(SUM(ntok) AS BIGINT) AS n_tokens
              |        FROM d GROUP BY source),
              |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM src),
              |w AS (SELECT source, n_docs, n_tokens,
              |        ROUND(CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share,
              |        CAST(ROUND(SQRT(CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE)), 6)
              |             AS DECIMAL(18,6)) AS w
              |      FROM src, tot),
              |sw AS (SELECT SUM(w) AS sm FROM w)
              |SELECT source, n_docs, n_tokens, share,
              |       ROUND(CAST(w AS DOUBLE) / CAST(sm AS DOUBLE), 4) AS mix_weight
              |FROM w, sw ORDER BY source""".stripMargin),
      (s, d) => {
        // direct scan — even size(toks) pays the cached-array decode
        // (same-machine A/B q165 0.44 -> 0.96 s behind the cache)
        val dd = Tables.documents(s, d)
          .select(col("source"), size(TextAnalysis.tokens(col("text"))).cast("long").as("ntok"))
        val src = dd.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("ntok").cast("long").as("n_tokens"))
        val tot = src.agg(sum("n_tokens").cast("long").as("t"))
        val w = src.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            round(col("n_tokens").cast("double") / col("t").cast("double"), 6).as("share"),
            round(sqrt(col("n_tokens").cast("double") / col("t").cast("double")), 6)
              .cast("decimal(18,6)").as("w"))
        val sw = w.agg(sum("w").as("sm"))
        w.crossJoin(broadcast(sw))
          .select(col("source"), col("n_docs"), col("n_tokens"), col("share"),
            round(col("w").cast("double") / col("sm").cast("double"), 4).as("mix_weight"))
          .orderBy("source")
      }),

    Q("q166_bfs_levels",
      // BFS hop distance from supplier 1 over the UNDIRECTED fulfillment
      // graph (suppliers s, customers 1000000+c — the shared PageRank id
      // space), three unrolled frontier expansions: level k = neighbors
      // of level k-1 not yet visited. The graph-traversal family member
      // beside PageRank (centrality), connected components (clustering),
      // triangles (cohesion) and HITS (mutual reinforcement). Each round
      // is one equi-join + anti-join (distinct frontier, scalar keys);
      // levels and node ids are exact BIGINTs. On the bipartite graph
      // odd levels are customers, even levels suppliers.
      Some("""WITH e0 AS (SELECT CAST(l_suppkey AS BIGINT) AS a,
             |                   CAST(1000000 + o_custkey AS BIGINT) AS b
             |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |            GROUP BY 1, 2),
             |e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
             |l0 AS (SELECT CAST(1 AS BIGINT) AS node),
             |l1 AS (SELECT DISTINCT e.b AS node FROM e JOIN l0 ON e.a = l0.node
             |       WHERE e.b NOT IN (SELECT node FROM l0)),
             |l2 AS (SELECT DISTINCT e.b AS node FROM e JOIN l1 ON e.a = l1.node
             |       WHERE e.b NOT IN (SELECT node FROM l0 UNION ALL SELECT node FROM l1)),
             |l3 AS (SELECT DISTINCT e.b AS node FROM e JOIN l2 ON e.a = l2.node
             |       WHERE e.b NOT IN (SELECT node FROM l0 UNION ALL SELECT node FROM l1
             |                         UNION ALL SELECT node FROM l2))
             |SELECT node, level FROM (
             |  SELECT node, CAST(0 AS BIGINT) AS level FROM l0
             |  UNION ALL SELECT node, 1 FROM l1
             |  UNION ALL SELECT node, 2 FROM l2
             |  UNION ALL SELECT node, 3 FROM l3)
             |ORDER BY level, node""".stripMargin),
      (s, d) => {
        // shared a-partitioned doubled edges: each expansion shuffles only
        // the frontier (see AnalyticsQueries.fulfillmentUndirected)
        val e = AnalyticsQueries.fulfillmentUndirected(s, d)
        var frontier = s.range(1, 2).toDF("node")
        var visited = frontier
        val out = scala.collection.mutable.ArrayBuffer(
          frontier.select(col("node"), lit(0L).as("level")))
        for (k <- 1 to 3) {
          frontier = e.join(frontier, e("a") === frontier("node"))
            .select(col("b").as("node")).distinct()
            .join(visited, Seq("node"), "left_anti")
          // each frontier is <= |nodes| scalar rows and feeds the next
          // round's anti-join; materialize to keep the lineage flat
          frontier = frontier.localCheckpoint(true)
          visited = visited.unionByName(frontier)
          out += frontier.select(col("node"), lit(k.toLong).as("level"))
        }
        out.reduce(_ unionByName _).orderBy("level", "node")
      }),

    Q("q167_bigram_lm_score",
      // q144's CCNet-style LM quality filter lifted to the BIGRAM level:
      // per-document mean add-one-smoothed bigram probability, scaled by
      // 1e6 — score(d) = 1e6 * Σ_{g∈bigrams(d)}(cnt(g)+1)
      // / (|bigrams(d)| * (NB+VB)). A document of corpus-common word
      // PAIRS scores high even when q144's unigram view is flat (and
      // shuffled-word boilerplate scores low) — the standard next rung
      // of the n-gram quality ladder. Same determinism discipline as
      // q144: corpus-wide BIGINT counts (exact in any order), ONE IEEE
      // division, ROUND 4; the scaled numerator stays < 2^53 at every
      // test SF. Docs with < 2 tokens have no bigrams and are excluded
      // (consistently: no event stream, no score).
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents),
              |bg AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(
              |         GENERATE_SERIES(1, LEN(t) - 1), i -> t[i] || ' ' || t[i+1])) AS g
              |       FROM t WHERE LEN(t) >= 2),
              |vocab AS (SELECT g, COUNT(*) AS cnt FROM bg GROUP BY g),
              |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nb,
              |               COUNT(*) AS vb FROM vocab),
              |d AS (SELECT bg.doc_id, CAST(SUM(vocab.cnt + 1) AS BIGINT) AS s,
              |             COUNT(*) AS n_bg
              |      FROM bg JOIN vocab USING (g) GROUP BY bg.doc_id)
              |SELECT d.doc_id, d.n_bg,
              |       ROUND(CAST(d.s * 1000000 AS DOUBLE)
              |             / CAST(d.n_bg * (tot.nb + tot.vb) AS DOUBLE), 4) AS lm2_score
              |FROM d, tot ORDER BY doc_id""".stripMargin),
      (s, d) => {
        // tokenize in its OWN projection (the Dedup.shingleIndex lesson):
        // inlined, element_at inside the bigram lambda re-splits the text
        // once per accessed element. Direct scan, not cachedDocToks — the
        // row-explode consumer rule (see q144).
        val bg = Tables.documents(s, d)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            explode(TextAnalysis.ngramStream(col("toks"), 2)).as("g"))
          // exchange barrier (round 16, the q144 fix): the vocab agg and
          // the scoring join both need hash(g); without it each computes
          // its own exchange and the tokenize+bigram chain runs twice
          .repartition(col("g"))
        val vocab = bg.groupBy("g").agg(count(lit(1)).as("cnt"))
        val tot = vocab.agg(sum("cnt").as("nb"), count(lit(1)).as("vb"))
        bg.join(vocab, "g")
          .groupBy("doc_id")
          .agg(sum(col("cnt") + 1L).as("s"), count(lit(1)).as("n_bg"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("n_bg"),
            round((col("s") * 1000000L).cast("double")
              / (col("n_bg") * (col("nb") + col("vb"))).cast("double"), 4)
              .as("lm2_score"))
          .orderBy("doc_id")
      }),

    Q("q168_dsir_importance",
      // DSIR-style importance weights (Xie et al. 2023): reweight every
      // document by how much more likely its tokens are under a TARGET
      // reference slice (here the src0 domain) than under the whole
      // corpus. The true DSIR ratio p_target(d)/p_corpus(d) is a PRODUCT
      // of per-token probabilities — log-space territory, and a libm log
      // is not bit-pinned across engines — so the statistic here is the
      // engine-exact surrogate: the ratio of MEAN smoothed counts,
      // (s_T · (N_S+V)) / (s_S · (N_T+V)) with s_X = Σ_{t∈d}(cnt_X(t)+1)
      // (not a reduction of the product — a deliberate substitute scoring
      // the same target-vs-corpus signal). Both sums are exact BIGINTs; the
      // final expression is a fixed multiply/multiply/divide tree of
      // exactly-representable (< 2^53) integers, so both engines round
      // identically. Weights > 1 mark documents to up-sample toward the
      // reference domain — the data-selection step of a curated
      // pretraining mixture (beside q165's domain-level weights, this is
      // the per-document variant).
      Some(s"""WITH tok AS (SELECT doc_id, source, UNNEST($toksSql) AS tok
              |             FROM documents),
              |vs AS (SELECT tok, COUNT(*) AS cnt_s FROM tok GROUP BY tok),
              |vt AS (SELECT tok, COUNT(*) AS cnt_t FROM tok
              |       WHERE source = 'src0' GROUP BY tok),
              |tots AS (SELECT CAST(SUM(cnt_s) AS BIGINT) AS ns,
              |                COUNT(*) AS v FROM vs),
              |tott AS (SELECT CAST(COALESCE(SUM(cnt_t), 0) AS BIGINT) AS nt FROM vt),
              |d AS (SELECT tok.doc_id,
              |             CAST(SUM(vs.cnt_s + 1) AS BIGINT) AS ss,
              |             CAST(SUM(COALESCE(vt.cnt_t, 0) + 1) AS BIGINT) AS st,
              |             COUNT(*) AS n_tok
              |      FROM tok JOIN vs USING (tok) LEFT JOIN vt USING (tok)
              |      GROUP BY tok.doc_id)
              |SELECT d.doc_id, d.n_tok,
              |       ROUND(CAST(d.st AS DOUBLE) * CAST(tots.ns + tots.v AS DOUBLE)
              |             / (CAST(d.ss AS DOUBLE) * CAST(tott.nt + tots.v AS DOUBLE)),
              |             4) AS importance
              |FROM d, tots, tott ORDER BY doc_id""".stripMargin),
      (s, d) => {
        // direct scan — the row-explode consumer rule (see q144)
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val vs = tok.groupBy("tok").agg(count(lit(1)).as("cnt_s"))
        val vt = tok.filter(col("source") === "src0")
          .groupBy("tok").agg(count(lit(1)).as("cnt_t"))
        val tots = vs.agg(sum("cnt_s").as("ns"), count(lit(1)).as("v"))
        val tott = vt.agg(coalesce(sum("cnt_t"), lit(0L)).as("nt"))
        tok.join(vs, "tok").join(vt, Seq("tok"), "left_outer")
          .groupBy("doc_id")
          .agg(sum(col("cnt_s") + 1L).as("ss"),
            sum(coalesce(col("cnt_t"), lit(0L)) + 1L).as("st"),
            count(lit(1)).as("n_tok"))
          .crossJoin(broadcast(tots)).crossJoin(broadcast(tott))
          .select(col("doc_id"), col("n_tok"),
            round(col("st").cast("double") * (col("ns") + col("v")).cast("double")
              / (col("ss").cast("double") * (col("nt") + col("v")).cast("double")),
              4).as("importance"))
          .orderBy("doc_id")
      }),

    Q("q169_shortest_path_weighted",
      // Weighted single-source shortest path — the min-plus-semiring
      // sibling of q166's BFS: three unrolled Bellman-Ford relaxations
      // from supplier 1 over the undirected fulfillment graph, edge cost
      // = the pair's shipment count w (the same weight q151's PageRank
      // redistributes). Each round is one equi-join + a min-aggregation
      // (scalar keys, map-side partial min); distances are exact BIGINT
      // sums, so MIN is order-free and the oracle is bit-stable. Output
      // is every node reachable in <= 3 hops with its provisional
      // 3-round distance — on a 1000-executor graph each round is one
      // shuffle, the canonical distributed relaxation.
      Some("""WITH e0 AS (SELECT CAST(l_suppkey AS BIGINT) AS a,
             |                   CAST(1000000 + o_custkey AS BIGINT) AS b,
             |                   CAST(COUNT(*) AS BIGINT) AS w
             |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |            GROUP BY 1, 2),
             |e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
             |d0 AS (SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
             |d1 AS (SELECT node, MIN(dist) AS dist FROM (
             |         SELECT node, dist FROM d0
             |         UNION ALL
             |         SELECT e.b, d0.dist + e.w FROM e JOIN d0 ON e.a = d0.node)
             |       GROUP BY node),
             |d2 AS (SELECT node, MIN(dist) AS dist FROM (
             |         SELECT node, dist FROM d1
             |         UNION ALL
             |         SELECT e.b, d1.dist + e.w FROM e JOIN d1 ON e.a = d1.node)
             |       GROUP BY node),
             |d3 AS (SELECT node, MIN(dist) AS dist FROM (
             |         SELECT node, dist FROM d2
             |         UNION ALL
             |         SELECT e.b, d2.dist + e.w FROM e JOIN d2 ON e.a = d2.node)
             |       GROUP BY node)
             |SELECT node, dist FROM d3 ORDER BY node""".stripMargin),
      (s, d) => {
        // shared a-partitioned doubled edges: each relaxation shuffles only
        // the distance relation (see AnalyticsQueries.fulfillmentUndirected)
        val e = AnalyticsQueries.fulfillmentUndirected(s, d)
        var dist = s.range(1, 2).toDF("node").select(col("node"), lit(0L).as("dist"))
        for (_ <- 1 to 3) {
          val relaxed = e.join(dist, e("a") === dist("node"))
            .select(e("b").as("node"), (dist("dist") + e("w")).as("dist"))
          // the settled relation is <= |nodes| scalar rows per round and
          // feeds the next round's join; materialize to keep lineage flat
          dist = dist.unionByName(relaxed)
            .groupBy("node").agg(min("dist").as("dist"))
            .localCheckpoint(true)
        }
        dist.orderBy("node")
      }),

    Q("q170_ivf_cell_neardup",
      // The DATA-ADAPTIVE block-first near-dup path beside q143's
      // hyperplane bands: exact cosine pairs within each IVF cell of the
      // shared deterministic ADAPTIVE-k training (q44/q69/q153 centroids;
      // k = max(16, N/1024) derived identically on both engines —
      // ExtendedQueries.adaptiveK). Candidates ~ Σ|cell|²/2 with cells
      // bounded near 1024 rows, so pair work stays LINEAR in the corpus
      // (round 10 measured the frozen-k=16 form at 35× time for 3× data;
      // this is that fix). Output ⊆ q43's exact pairs; the oracle replays
      // the identical unrolled k-means CTEs — including the COUNT(*)-
      // derived k — so the cell partition and candidate set are bit-stable.
      Some(s"""WITH ${ExtendedQueries.kmeansCtePrefix},
              |${ExtendedQueries.cellBlockCte},
              |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              |             ROUND(${TrainingQueries.cosOf("a.embedding", "b.embedding")}, 4) AS sim
              |      FROM ablk a JOIN ablk b
              |        ON a.cid = b.cid AND a.blk = b.blk AND a.vec_id < b.vec_id)
              |SELECT a_id, b_id, sim FROM p WHERE sim >= 0.45
              |ORDER BY a_id, b_id""".stripMargin),
      (s, d) => graft.operators.Similarity.ivfCellNearDupPairs(
          Tables.embeddings(s, d), 0.45, ExtendedQueries.trainedCentroids(s, d))
        .orderBy("a_id", "b_id")),

    Q("q171_asof_nearest",
      // NEAREST-event as-of: each purchase picks the view closest in
      // time, in EITHER direction — the third as-of flavor beside
      // backward (q54) and forward (q149), and a pure COMPOSITION of
      // those two operators: the ref value is a (value, epoch-us) struct
      // so both walks surface their match's timestamp, then a scalar
      // chooser picks the smaller |Δt| (ties to the earlier view; both
      // distances are exact BIGINT micros). Purchases with no view at
      // all pick 'none'. Still two union+window passes — never a range
      // join — and the chooser is map-side.
      Some("""WITH vv AS (SELECT user_id, ts, event_id,
             |              {'v': value, 't': epoch_us(ts)} AS vt
             |            FROM events WHERE event_type = 'view'),
             |pp AS (SELECT user_id, ts, event_id, value FROM events
             |       WHERE event_type = 'purchase'),
             |up AS (SELECT user_id, ts, event_id, vt,
             |              CAST(NULL AS DOUBLE) AS pv, CAST(NULL AS BIGINT) AS pts,
             |              0 AS side
             |       FROM vv
             |       UNION ALL
             |       SELECT user_id, ts, event_id,
             |              CAST(NULL AS STRUCT(v DOUBLE, t BIGINT)), value,
             |              epoch_us(ts), 1
             |       FROM pp),
             |mp AS (SELECT user_id, event_id, pv, pts, side,
             |              LAST_VALUE(vt IGNORE NULLS) OVER (
             |                PARTITION BY user_id ORDER BY ts, side, event_id
             |                ROWS UNBOUNDED PRECEDING) AS prev
             |       FROM up),
             |mn AS (SELECT user_id, event_id, side,
             |              LAST_VALUE(vt IGNORE NULLS) OVER (
             |                PARTITION BY user_id ORDER BY ts DESC, side, event_id DESC
             |                ROWS UNBOUNDED PRECEDING) AS nxt
             |       FROM up),
             |f AS (SELECT a.user_id, a.event_id, a.pv, a.pts, a.prev, b.nxt
             |      FROM (SELECT * FROM mp WHERE side = 1) a
             |      JOIN (SELECT * FROM mn WHERE side = 1) b
             |        USING (user_id, event_id))
             |SELECT user_id, event_id, ROUND(pv, 4) AS purchase_value,
             |       CASE WHEN prev IS NULL AND nxt IS NULL THEN 'none'
             |            WHEN nxt IS NULL OR (prev IS NOT NULL
             |                 AND (pts - prev.t) <= (nxt.t - pts)) THEN 'prev'
             |            ELSE 'next' END AS picked,
             |       ROUND(CASE WHEN prev IS NULL AND nxt IS NULL THEN NULL
             |                  WHEN nxt IS NULL OR (prev IS NOT NULL
             |                       AND (pts - prev.t) <= (nxt.t - pts)) THEN prev.v
             |                  ELSE nxt.v END, 4) AS nearest_view_value,
             |       CASE WHEN prev IS NULL AND nxt IS NULL THEN NULL
             |            WHEN nxt IS NULL OR (prev IS NOT NULL
             |                 AND (pts - prev.t) <= (nxt.t - pts)) THEN pts - prev.t
             |            ELSE nxt.t - pts END AS delta_us
             |FROM f ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        import graft.Queries.r4
        val ev = Tables.events(s, d)
        val refs = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        graft.operators.AsOf
          .joinNearest(purch, refs, Seq("user_id"), "ts", "event_id", "value")
          .select(col("user_id"), col("event_id"),
            r4(col("value")).as("purchase_value"),
            col("nearest_side").as("picked"),
            r4(col("nearest_value")).as("nearest_view_value"),
            col("nearest_delta_us").as("delta_us"))
          .orderBy("user_id", "event_id")
      }),

    Q("q172_label_propagation",
      // Community detection by synchronous weighted label propagation —
      // the clustering member of the graph family beside CC (pure
      // connectivity), PageRank (centrality), HITS and triangles: two
      // unrolled rounds where every node adopts the label carrying the
      // greatest incident edge weight among its neighbors, ties to the
      // lowest label (the determinism knob async LP lacks). Weights and
      // labels are exact BIGINTs; each round is one equi-join + one
      // weighted count + a per-node ROW_NUMBER (partitioned window,
      // never global). Labels init to node ids, so round parity flips
      // sides of the bipartite graph and round 2 yields 2-hop
      // (co-purchase) communities.
      Some("""WITH e0 AS (SELECT CAST(l_suppkey AS BIGINT) AS a,
             |                   CAST(1000000 + o_custkey AS BIGINT) AS b,
             |                   CAST(COUNT(*) AS BIGINT) AS w
             |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |            GROUP BY 1, 2),
             |e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
             |l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e),
             |n1 AS (SELECT e.a AS node, l.lbl, CAST(SUM(e.w) AS BIGINT) AS wt
             |       FROM e JOIN l0 l ON e.b = l.node GROUP BY e.a, l.lbl),
             |l1 AS (SELECT node, lbl FROM (
             |         SELECT node, lbl, ROW_NUMBER() OVER (
             |           PARTITION BY node ORDER BY wt DESC, lbl) AS rn FROM n1) t
             |       WHERE rn = 1),
             |n2 AS (SELECT e.a AS node, l.lbl, CAST(SUM(e.w) AS BIGINT) AS wt
             |       FROM e JOIN l1 l ON e.b = l.node GROUP BY e.a, l.lbl),
             |l2 AS (SELECT node, lbl FROM (
             |         SELECT node, lbl, ROW_NUMBER() OVER (
             |           PARTITION BY node ORDER BY wt DESC, lbl) AS rn FROM n2) t
             |       WHERE rn = 1)
             |SELECT node, lbl AS community FROM l2 ORDER BY node""".stripMargin),
      (s, d) => graft.operators.LabelProp
        .run(AnalyticsQueries.fulfillmentEdges(s, d), "src", "dst", "w", rounds = 2)
        .select(col("node"), col("lbl").as("community")).orderBy("node")),

    Q("q173_dedup_overlap",
      // Overlap coefficient |A∩B| / min(|A|,|B|) >= 0.8 — the symmetric
      // boilerplate metric (= max of q147's two containment directions),
      // and the proof that every pairwise set-overlap metric is a pure
      // projection of the ONE shared pair-stats relation: this query adds
      // zero join work to an inventory pass that already ran q36 or q147
      // (same session-cached (inter, n_a, n_b) kernel, corpus-derived
      // skew cap).
      Some(s"""WITH ${TrainingQueries.cappedShingleCtes},
              |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
              |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
              |          FROM sh a JOIN sh b
              |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |          GROUP BY 1, 2)
              |SELECT a_id, b_id,
              |       ROUND(i::DOUBLE / LEAST(ca.n_sh, cb.n_sh), 4) AS overlap
              |FROM inter JOIN cnt ca ON ca.doc_id = a_id
              |           JOIN cnt cb ON cb.doc_id = b_id
              |WHERE ROUND(i::DOUBLE / LEAST(ca.n_sh, cb.n_sh), 4) >= 0.8
              |ORDER BY a_id, b_id""".stripMargin),
      (s, d) => graft.operators.Dedup
        .overlapFromStats(TrainingQueries.cachedPairStats(s, d), threshold = 0.8)
        .orderBy("a_id", "b_id")),

    Q("q174_dedup_resolution",
      // Dedup RESOLUTION — the step after detection that an actual
      // pipeline runs: per near-dup cluster (q56's LSH->verify->connected
      // components), keep the member with the highest q39 quality score
      // (rounded, so the tie set is engine-identical; ties to the lowest
      // doc_id) and report the survivor beside the cluster size. The
      // winner pick is the same max-struct aggregation as LabelProp
      // (two-phase, map-side partial), not a window sort.
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
              |      FROM cl JOIN q USING (doc_id))
              |SELECT cluster_id, survivor_id, survivor_quality,
              |       CAST(n_members AS BIGINT) AS n_members
              |FROM (SELECT cluster_id, doc_id AS survivor_id,
              |             quality AS survivor_quality,
              |             ROW_NUMBER() OVER (PARTITION BY cluster_id
              |               ORDER BY quality DESC, doc_id) AS rn,
              |             COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
              |      FROM m) t
              |WHERE rn = 1 ORDER BY cluster_id""".stripMargin),
      (s, d) => {
        import graft.operators.TextAnalysis
        // detection shared with q56: the session-cached cluster relation
        val cl = ExtendedQueries.cachedDupClusters(s, d)
        val q = Tables.documents(s, d).select(col("doc_id"),
          round(TextAnalysis.qualityScore(TextAnalysis.tokens(col("text"))), 4)
            .as("quality"))
        cl.join(q, "doc_id")
          .groupBy("cluster_id")
          .agg(max(struct(col("quality"), (-col("doc_id")).as("nd"),
              col("doc_id").as("sid"))).as("w"),
            count(lit(1)).as("n_members"))
          .select(col("cluster_id"), col("w.sid").as("survivor_id"),
            col("w.quality").as("survivor_quality"), col("n_members"))
          .orderBy("cluster_id")
      }),

    Q("q175_readability",
      // Flesch-style reading-ease per document — the readability member
      // of the quality-filter tier (beside q39's stopword score, q164's
      // repetition and q167's LM scores): syllables = vowel-GROUP count
      // per token (min 1), sentences = [.!?]+ run count (min 1). The
      // regex classes are literal enough that RE2 (DuckDB) and
      // java.util.regex agree (the q134 note); every count is an exact
      // BIGINT and the score is one fixed left-associated double
      // expression, so both engines round identically. Map-side per-doc
      // arithmetic, no shuffle before the ORDER BY.
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS t, text FROM documents),
              |c AS (SELECT doc_id,
              |        CAST(LEN(t) AS BIGINT) AS n_words,
              |        CAST(GREATEST(LEN(REGEXP_EXTRACT_ALL(text, '[.!?]+')), 1)
              |             AS BIGINT) AS n_sentences,
              |        CAST(LIST_SUM(LIST_TRANSFORM(t,
              |               x -> GREATEST(LEN(REGEXP_EXTRACT_ALL(LOWER(x), '[aeiouy]+')), 1)))
              |             AS BIGINT) AS n_syllables
              |      FROM t WHERE LEN(t) >= 1)
              |SELECT doc_id, n_words, n_sentences, n_syllables,
              |       ROUND(206.835
              |             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
              |             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
              |             4) AS flesch
              |FROM c ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val counted = TrainingQueries.cachedDocToks(s, d)
          .select(col("doc_id"), col("toks").as("t"), col("text"))
          .filter(size(col("t")) >= 1)
          .select(col("doc_id"),
            size(col("t")).cast("long").as("n_words"),
            greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
              .cast("long").as("n_sentences"),
            aggregate(
              transform(col("t"),
                x => greatest(regexp_count(lower(x), lit("[aeiouy]+")), lit(1)).cast("long")),
              lit(0L), (a, x) => a + x).as("n_syllables"))
        counted.select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
            round(lit(206.835)
              - lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double"))
              - lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double")),
              4).as("flesch"))
          .orderBy("doc_id")
      }),

    Q("q176_dup_ngram_frac",
      // Per-DOCUMENT corpus-duplication score (Gopher/RefinedWeb
      // duplicate-n-gram rule): the fraction of a doc's distinct 3-gram
      // shingles with corpus document-frequency >= 2. The linear sibling
      // of the pairwise dedup tier — no pair ever materializes (a viral
      // shingle is one partial-count register, not k² rows), so this is
      // the signal a 100 TB pass can afford on every document. Exact
      // long numerator/denominator, one division, ROUND 4.
      Some(s"""WITH sh AS (${TrainingQueries.shingleRowsSql}),
              |df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
              |SELECT s.doc_id, COUNT(*) AS n_sh,
              |       ROUND(CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
              |             / COUNT(*), 4) AS dup_frac
              |FROM sh s JOIN df ON s.shingle = df.shingle
              |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin),
      (s, d) => graft.operators.Dedup
        .dupShingleFractionFromToks(TrainingQueries.cachedDocToks(s, d), n = 3)
        .orderBy("doc_id")),

    Q("q177_token_diversity",
      // Lexical diversity per document: type-token ratio and the inverse
      // Simpson index n²/Σc² ("effective vocabulary size") — the
      // vocabulary-richness quality filter beside q39/q164/q175. Simpson
      // stands in for Shannon entropy because the house determinism rule
      // keeps libm transcendentals (LOG) out of hash-gated queries: both
      // measures here are exact-long ratios with ONE IEEE division each
      // (n < 2^26 per doc keeps n² exact), so the engines agree
      // bit-for-bit. SUM(BIGINT) is HUGEINT in DuckDB — cast back (the
      // q134/q139 lesson).
      Some(s"""WITH tr AS (SELECT doc_id, UNNEST(t) AS tok
              |            FROM (SELECT doc_id, ${TrainingQueries.toksSql} AS t
              |                  FROM documents) sub WHERE LEN(t) >= 1),
              |cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM tr GROUP BY doc_id, tok),
              |per AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
              |               COUNT(*) AS n_types, CAST(SUM(c * c) AS BIGINT) AS ssq
              |        FROM cnt GROUP BY doc_id)
              |SELECT doc_id, n_tok, n_types,
              |       ROUND(CAST(n_types AS DOUBLE) / CAST(n_tok AS DOUBLE), 4) AS ttr,
              |       ROUND(CAST(n_tok AS DOUBLE) * CAST(n_tok AS DOUBLE)
              |             / CAST(ssq AS DOUBLE), 4) AS inv_simpson
              |FROM per ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis
        .tokenDiversityFromToks(TrainingQueries.cachedDocToks(s, d))
        .orderBy("doc_id")),

    Q("q178_kcore",
      // Bounded k-core peeling (k=4, 3 synchronized rounds) over the
      // supplier→customer fulfillment graph — the degeneracy member of
      // the graph family (CC/PageRank/HITS/LabelProp/triangles/BFS).
      // Each round deletes nodes of degree < k and re-checks survivors;
      // a fixed round budget is the honest distributed contract (the
      // cascade depth is data-dependent) and always yields a sound
      // OVER-approximation of the true k-core. The oracle unrolls the
      // same three rounds; output is each survivor with its degree
      // inside the peeled subgraph — all exact BIGINTs.
      Some("""WITH e0 AS (SELECT CAST(l_suppkey AS BIGINT) AS a,
             |                   CAST(1000000 + o_custkey AS BIGINT) AS b
             |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |            GROUP BY 1, 2),
             |e1 AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
             |k1 AS (SELECT a FROM e1 GROUP BY a HAVING COUNT(*) >= 4),
             |e2 AS (SELECT e.a, e.b FROM e1 e JOIN k1 x ON e.a = x.a
             |       JOIN k1 y ON e.b = y.a),
             |k2 AS (SELECT a FROM e2 GROUP BY a HAVING COUNT(*) >= 4),
             |e3 AS (SELECT e.a, e.b FROM e2 e JOIN k2 x ON e.a = x.a
             |       JOIN k2 y ON e.b = y.a),
             |k3 AS (SELECT a FROM e3 GROUP BY a HAVING COUNT(*) >= 4),
             |e4 AS (SELECT e.a, e.b FROM e3 e JOIN k3 x ON e.a = x.a
             |       JOIN k3 y ON e.b = y.a)
             |SELECT a AS node, COUNT(*) AS deg FROM e4
             |GROUP BY a ORDER BY node""".stripMargin),
      (s, d) => graft.operators.KCore
        .peel(AnalyticsQueries.fulfillmentEdges(s, d), "src", "dst",
          k = 4, rounds = 3)
        .orderBy("node")),

    Q("q179_collocation_lift",
      // Corpus-level phrase mining: adjacent-pair collocations by LIFT
      // (c_ab·N)/(c_first·c_second), the log-free PMI surrogate (PMI =
      // log2 lift, same ranking — and the house rule keeps libm out of
      // the hash gate). Positional marginals come from the SAME bigram
      // relation as the pair counts, so numerator and denominator share
      // one event space. Every count is an exact long cast exactly to
      // double; the fixed multiply-multiply-divide tree rounds
      // identically in both engines at any corpus size.
      Some(s"""WITH t AS (SELECT doc_id, ${TrainingQueries.toksSql} AS t
              |           FROM documents),
              |bg AS (SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1),
              |                i -> {'a': t[i], 'b': t[i + 1]})) AS p
              |       FROM t WHERE LEN(t) >= 2),
              |pr AS (SELECT p.a AS a, p.b AS b FROM bg),
              |cab AS (SELECT a, b, COUNT(*) AS c_ab FROM pr GROUP BY a, b),
              |tot AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bg FROM cab),
              |cf AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_first
              |       FROM cab GROUP BY a),
              |cs AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_second
              |       FROM cab GROUP BY b),
              |sel AS (SELECT cab.a || ' ' || cab.b AS bigram, c_ab,
              |               ROUND(CAST(c_ab AS DOUBLE) * CAST(n_bg AS DOUBLE)
              |                     / (CAST(c_first AS DOUBLE)
              |                        * CAST(c_second AS DOUBLE)), 4) AS lift
              |        FROM cab JOIN cf USING (a) JOIN cs USING (b), tot)
              |SELECT bigram, c_ab, lift FROM sel
              |WHERE c_ab >= 5 AND lift >= 1.2
              |ORDER BY bigram""".stripMargin),
      // direct scan (collocationLift spreads + tokenizes itself) — the
      // row-explode consumer rule (A/B q179 1.01 -> 2.17 s behind the
      // cache: the bigram explode decodes every cached array)
      (s, d) => TextAnalysis
        .collocationLift(Tables.documents(s, d), "text",
          minCount = 5L, minLift = 1.2)
        .orderBy("bigram"))
  ) ++ Seq(

    Q("q180_cdc_chunk_dedup",
      // Content-defined chunking + chunk-level dedup: boundaries fall
      // where the md5-derived token hash ≡ 0 mod 16 (expected span 16
      // tokens), so an insertion only reshapes the chunks around the
      // edit and every other boundary re-synchronizes — the storage-CDC
      // idea applied to passage-level text dedup, extending the tier to
      // SUB-document granularity (q32/q45 whole-doc exact, q36+ n-gram
      // approximate, this one exact-on-spans). Per doc: chunk count and
      // the fraction of its chunk instances whose chunk hash occurs >= 2
      // times corpus-wide. Boundary selection and span slicing are pure
      // HOFs (map-side, no shuffle); the dup stats are one chunk-hash
      // count agg + a linear join — nothing pairwise. Exact longs into
      // one division, ROUND 4.
      Some(s"""WITH t AS (SELECT doc_id, ${TrainingQueries.toksSql} AS t
              |           FROM documents),
              |b AS (SELECT doc_id, t,
              |        LIST_TRANSFORM(t, x -> ${TrainingQueries.h32Sql.format("x")}) AS hs
              |      FROM t WHERE LEN(t) >= 1),
              |s1 AS (SELECT doc_id, t,
              |         LIST_FILTER(GENERATE_SERIES(1, LEN(t)),
              |                     i -> hs[i] % 16 = 0) AS brks
              |       FROM b),
              |s2 AS (SELECT doc_id, t,
              |         CASE WHEN brks[-1] = LEN(t) THEN brks
              |              ELSE LIST_APPEND(brks, LEN(t)) END AS bnds
              |       FROM s1),
              |ch AS (SELECT doc_id,
              |         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(bnds)),
              |           j -> ARRAY_TO_STRING(LIST_SLICE(t,
              |                  (CASE WHEN j = 1 THEN 0 ELSE bnds[j - 1] END) + 1,
              |                  bnds[j]), ' '))) AS chunk
              |       FROM s2),
              |hh AS (SELECT doc_id, MD5(chunk) AS h FROM ch),
              |cnt AS (SELECT h, COUNT(*) AS cnt FROM hh GROUP BY h)
              |SELECT hh.doc_id, COUNT(*) AS n_chunks,
              |       ROUND(CAST(SUM(CASE WHEN cnt.cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
              |             / COUNT(*), 4) AS dup_chunk_frac
              |FROM hh JOIN cnt USING (h)
              |GROUP BY hh.doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.Dedup
        .cdcChunkDupStatsFromToks(TrainingQueries.cachedDocToks(s, d),
          modulus = 16)
        .orderBy("doc_id"))
  )
}
