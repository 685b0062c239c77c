package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.{AsOf, Dedup, GlobalOrder, Sessionize}
import graft.sources.Tables

/** Extended relational + pipeline inventory (q49–q68): sessionization,
  * pivot, grouping sets, exact percentiles, first/last/nth_value frames,
  * the general two-relation as-of join, exact statistical moments,
  * connected-components duplicate clustering, lateral/string/bitwise/
  * date/conditional-agg/range-frame/json/array/set-op/string-agg/
  * posexplode coverage — each with a DuckDB oracle under the SURVEY §2.2
  * determinism rules (shared helpers in [[Queries]]).
  */
object ExtendedQueries {

  import Queries.{dsumD, r4}

  private val Segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  // ---- q69 oracle: deterministic Lloyd's k-means + IVF probe, unrolled --

  /** The one shared guarded cosine fragment — see TrainingQueries.cosOf. */
  private def cosOf(a: String, b: String): String = TrainingQueries.cosOf(a, b)

  /** One assignment round: every vector to its max-cosine centroid of
    * `cents`, ties to the lowest cid. */
  private def assignSql(cents: String): String =
    s"""(SELECT vec_id, embedding, cid FROM (
       |  SELECT v.vec_id, v.embedding, c.cid,
       |         ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |           ORDER BY ${cosOf("v.embedding", "c.ce")} DESC, c.cid) AS rn
       |  FROM v CROSS JOIN $cents c) r WHERE rn = 1)""".stripMargin

  /** One update round: per-dimension mean per cell (exact decimal sum ->
    * double -> IEEE division -> float); empty cells keep `prev`'s centroid. */
  private def updateSql(assigned: String, prev: String): String =
    s"""(SELECT p.cid, COALESCE(mm.ce2, p.ce) AS ce FROM $prev p LEFT JOIN (
       |  SELECT cid, LIST(m ORDER BY i) AS ce2 FROM (
       |    SELECT a.cid, t.i,
       |           CAST(CAST(SUM(CAST(a.embedding[t.i] AS DECIMAL(25,10))) AS DOUBLE)
       |                / COUNT(*) AS FLOAT) AS m
       |    FROM $assigned a, (SELECT UNNEST(GENERATE_SERIES(1, 64)) AS i) t
       |    GROUP BY a.cid, t.i) g
       |  GROUP BY cid) mm ON mm.cid = p.cid)""".stripMargin

  /** The q56 near-dup cluster relation (LSH candidates -> exact verify ->
    * connected components over the |pairs| edge list), computed once per
    * (session, sf dir) and shared with q174's resolution step: detection
    * is the expensive part of BOTH queries, and the relation is a
    * |clustered docs|-row scalar table — tiny next to the pipeline that
    * produces it. Deterministic (min-label CC over the exact pair set),
    * so reuse changes no hash. */
  private val clusterCache = new SessionCache[DataFrame]
  private[graft] def cachedDupClusters(s: org.apache.spark.sql.SparkSession,
                                       d: String): DataFrame =
    clusterCache.getOrElseUpdate(s, d)(
      Dedup.connectedComponents(
        Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
          n = 3, numHashes = 32, bands = 16, threshold = 0.8))
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
        .localCheckpoint(true))

  /** The one adaptive-k formula, shared bit-for-bit by the Spark training
    * and the oracle CTE: k = max(16, N ÷ 1024) (integer division), N = the
    * embeddings row count. Cells target ~1024 members, so the pairwise
    * tiers built on the cell partition (q170 near-dup, q184 SemDeDup) do
    * Σ|cell|²/2 ≈ N·512 work — LINEAR in N — instead of the N²/2k
    * quadratic a frozen k produces (round-10 sf3 measured that quadratic
    * at 35× time for 3× data; this knob is the fix). At the oracle's
    * sf0.01/sf0.1 sizes (N ≤ 2048·16) the formula floors at the historic
    * k = 16, so every hash-checked result is unchanged. At true 100 TB
    * (N ~ 10⁹ → k ~ 10⁶) the driver-resident centroid literal and the
    * N·k Lloyd's assignment both stop scaling — there one trains on a
    * consistent sample and assigns through a two-level (coarse→fine)
    * IVF tree; the formula's job is to keep CELLS bounded, which any
    * such refinement preserves. */
  private[graft] def adaptiveK(n: Long): Int = math.max(16L, n / 1024L).toInt

  /** Adaptive-k, 2-round Lloyd's centroids over the embeddings table,
    * trained ONCE per (session, sf dir) and shared by every kmeans-family
    * query (q69/q140/q153/q159/q170/q182/q183/q184/q199) — the training
    * is deterministic (seeded by the k lowest ids, exact-decimal means),
    * so every caller gets bit-identical centroids and reuse changes no
    * result; it just stops re-running the same Lloyd's iterations per
    * inventory pass. Keyed by the session OBJECT (LRU-bounded — see
    * [[SessionCache]]) so a stopped session's plan state is never reused
    * and dead sessions are not pinned. */
  private val centCache = new SessionCache[Seq[(Long, Array[Float])]]
  private[graft] def trainedCentroids(s: org.apache.spark.sql.SparkSession,
                                      d: String): Seq[(Long, Array[Float])] =
    centCache.getOrElseUpdate(s, d) {
      val emb = Tables.embeddings(s, d)
      graft.operators.Similarity.collectCentroids(
        graft.operators.Similarity.kmeans(emb,
          k = adaptiveK(emb.count()), iterations = 2))
    }

  /** The shared CTE chain: 2 Lloyd's rounds from the k lowest-id seeds
    * (k = GREATEST(16, N//1024), the [[adaptiveK]] formula rendered in
    * SQL so both engines derive the same cell count from the same corpus),
    * final assignment, and the query vector — the prefix of every
    * kmeans/IVF oracle (q69, q140). */
  private[graft] val kmeansCtePrefix: String =
    s"""v AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (SELECT cid, ce FROM (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
       |         embedding AS ce, COUNT(*) OVER () AS n
       |  FROM v) s0 WHERE cid < GREATEST(16, n // 1024)),
       |a0 AS ${assignSql("c0")},
       |c1 AS ${updateSql("a0", "c0")},
       |a1 AS ${assignSql("c1")},
       |c2 AS ${updateSql("a1", "c1")},
       |afinal AS ${assignSql("c2")},
       |qv AS (SELECT embedding AS qe FROM v WHERE vec_id = 0)""".stripMargin

  /** The BLOCKED assignment CTE suffix for the cell-pair tiers (q170
    * near-dup, q184 SemDeDup): cells above 1024 members split into 2^b
    * hyperplane sign-bit sub-buckets (b = the integer ladder below,
    * capped at 8 — mirrors Similarity.ivfCellNearDupPairs bit-for-bit;
    * the planes are q127's splitmix literals via Round4Queries.bucketSql,
    * the `&`-mask and `<<` are exact integer ops on both engines). At
    * every oracle-checked scale no cell exceeds 1024, so blk = 0
    * everywhere and the join is the pure cell join — hash-stable. */
  private[graft] lazy val cellBlockCte: String = {
    val ladder =
      """CASE WHEN cs.csz > 131072 THEN 8 WHEN cs.csz > 65536 THEN 7
        |     WHEN cs.csz > 32768 THEN 6 WHEN cs.csz > 16384 THEN 5
        |     WHEN cs.csz > 8192 THEN 4 WHEN cs.csz > 4096 THEN 3
        |     WHEN cs.csz > 2048 THEN 2 WHEN cs.csz > 1024 THEN 1
        |     ELSE 0 END""".stripMargin
    s"""cs AS (SELECT cid, COUNT(*) AS csz FROM afinal GROUP BY cid),
       |ablk AS (SELECT a.vec_id, a.embedding, a.cid,
       |  ${Round4Queries.bucketSql("a.embedding", 64, 8)}
       |    & ((1 << ($ladder)) - 1) AS blk
       |  FROM afinal a JOIN cs ON a.cid = cs.cid)""".stripMargin
  }

  private[graft] val kmeansIvfOracleSql: String =
    s"""WITH $kmeansCtePrefix,
       |qcell AS (SELECT cid FROM (
       |  SELECT c.cid, ROW_NUMBER() OVER (ORDER BY ${cosOf("q.qe", "c.ce")} DESC, c.cid) AS rn
       |  FROM qv q CROSS JOIN c2 c) r WHERE rn = 1)
       |SELECT a.vec_id, ROUND(${cosOf("a.embedding", "q.qe")}, 4) AS sim
       |FROM afinal a JOIN qcell ON a.cid = qcell.cid CROSS JOIN qv q
       |WHERE a.vec_id <> 0
       |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin

  /** q140 oracle: recall@10 and candidate counts of 1-probe vs 3-probe
    * IVF against the exact brute-force top-10 — same centroids, same
    * cosine fragment, ranked with UNROUNDED sims and vec_id tie-breaks
    * on both engines. */
  private[graft] val annRecallOracleSql: String = {
    def ivfTop(cellsPred: String): String =
      s"""(SELECT vec_id FROM (
         |  SELECT a.vec_id, ROW_NUMBER() OVER (
         |    ORDER BY ${cosOf("a.embedding", "q.qe")} DESC, a.vec_id) AS rn
         |  FROM afinal a CROSS JOIN qv q
         |  WHERE a.cid IN (SELECT cid FROM cellrank WHERE $cellsPred)
         |    AND a.vec_id <> 0) t WHERE rn <= 10)""".stripMargin
    s"""WITH $kmeansCtePrefix,
       |cellrank AS (
       |  SELECT c.cid, ROW_NUMBER() OVER (
       |    ORDER BY ${cosOf("q.qe", "c.ce")} DESC, c.cid) AS rn
       |  FROM qv q CROSS JOIN c2 c),
       |brute AS (SELECT vec_id FROM (
       |  SELECT v2.vec_id, ROW_NUMBER() OVER (
       |    ORDER BY ${cosOf("v2.embedding", "q.qe")} DESC, v2.vec_id) AS rn
       |  FROM v v2 CROSS JOIN qv q WHERE v2.vec_id <> 0) t WHERE rn <= 10),
       |ivf1 AS ${ivfTop("rn = 1")},
       |ivf3 AS ${ivfTop("rn <= 3")}
       |SELECT
       |  (SELECT COUNT(*) FROM afinal
       |   WHERE cid IN (SELECT cid FROM cellrank WHERE rn = 1) AND vec_id <> 0) AS cand_1probe,
       |  (SELECT COUNT(*) FROM afinal
       |   WHERE cid IN (SELECT cid FROM cellrank WHERE rn <= 3) AND vec_id <> 0) AS cand_3probe,
       |  ROUND((SELECT COUNT(*) FROM ivf1 JOIN brute USING (vec_id)) / 10.0, 4) AS recall_1probe,
       |  ROUND((SELECT COUNT(*) FROM ivf3 JOIN brute USING (vec_id)) / 10.0, 4) AS recall_3probe""".stripMargin
  }

  def all: Seq[Q] = Seq(

    Q("q49_sessionize",
      Some("""WITH b AS (
             |  SELECT user_id, ts, event_id, value,
             |         CASE WHEN LAG(ts) OVER w IS NULL
             |                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
             |              THEN 1 ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts, value,
             |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                        ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM b)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |       COUNT(*) AS n_events,
             |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
             |       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
             |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin),
      (s, d) => Sessionize.assign(Tables.events(s, d), Seq("user_id"), "ts", "event_id", 1800L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          r4(dsumD(col("value"))).as("sum_value"))
        .orderBy("user_id", "session_id")),

    Q("q50_pivot",
      Some(s"""SELECT n_name,
              |${Segments.map(g => s"       COUNT(*) FILTER (WHERE c_mktsegment = '$g') AS seg_${g.toLowerCase},").mkString("\n")}
              |       COUNT(*) AS total
              |FROM customer JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY n_name ORDER BY n_name""".stripMargin),
      (s, d) => {
        // total = sum of the pivot columns (the declared value list is
        // exhaustive for this table) — not a second scan+join.
        val pivoted = Tables.customer(s, d)
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .pivot("c_mktsegment", Segments)  // explicit values: no extra distinct scan
          .agg(count(lit(1)))
          .na.fill(0L, Segments)
        pivoted
          .select(col("n_name")
            +: Segments.map(g => col(g).as(s"seg_${g.toLowerCase}"))
            :+ Segments.map(col).reduce(_ + _).as("total"): _*)
          .orderBy("n_name")
      }),

    Q("q51_grouping_sets",
      Some("""SELECT COALESCE(n_name, '(all)') AS nation,
             |       COALESCE(c_mktsegment, '(all)') AS segment,
             |       CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS g,
             |       COUNT(*) AS cnt,
             |       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
             |ORDER BY g, nation, segment""".stripMargin),
      (s, d) => {
        // SQL form for the same reason as q12: DataFrame grouping() +
        // rewritten grouping columns trips Spark 4.1's ambiguous-self-join
        // check; the SQL path resolves cleanly.
        Tables.customer(s, d).createOrReplaceTempView("graft_cust_q51")
        Tables.nation(s, d).createOrReplaceTempView("graft_nation_q51")
        s.sql("""SELECT COALESCE(n_name, '(all)') AS nation,
                |       COALESCE(c_mktsegment, '(all)') AS segment,
                |       CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS g,
                |       COUNT(*) AS cnt,
                |       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_bal
                |FROM graft_cust_q51 JOIN graft_nation_q51 ON c_nationkey = n_nationkey
                |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
                |ORDER BY g, nation, segment""".stripMargin)
      }),

    Q("q52_percentiles",
      // Exact (interpolating) percentiles: Spark `percentile` and DuckDB
      // `quantile_cont` both linearly interpolate order statistics, so the
      // values agree bit-for-bit before the final ROUND. The approximate
      // variant (approx_percentile/KLL) is engine-specific and validated by
      // tolerance spec instead (ApproxSpec), like approx_count_distinct.
      Some("""SELECT l_returnflag,
             |       ROUND(quantile_cont(l_quantity, 0.25), 4) AS qty_p25,
             |       ROUND(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
             |       ROUND(quantile_cont(l_quantity, 0.9), 4) AS qty_p90,
             |       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS price_median
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          r4(percentile(col("l_quantity"), lit(0.25))).as("qty_p25"),
          r4(percentile(col("l_quantity"), lit(0.5))).as("qty_p50"),
          r4(percentile(col("l_quantity"), lit(0.9))).as("qty_p90"),
          r4(percentile(col("l_extendedprice"), lit(0.5))).as("price_median"))
        .orderBy("l_returnflag")),

    Q("q53_window_firstlast",
      Some("""SELECT o_custkey, o_orderkey,
             |       FIRST_VALUE(o_orderkey) OVER w AS first_ok,
             |       LAST_VALUE(o_orderkey) OVER w AS last_ok,
             |       NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("first_ok"),
            last(col("o_orderkey")).over(w).as("last_ok"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    Q("q54_asof_join",
      // General two-relation as-of join (trades⋈quotes shape): each
      // purchase picks up the latest prior-or-simultaneous view's value per
      // user. Oracle mirrors the union+window formulation — DuckDB's ASOF
      // JOIN syntax leaves equal-timestamp reference ties unspecified,
      // while (ts, side, seq) ordering pins them deterministically. The
      // reference value rides in a struct marker exactly like
      // AsOf.joinLatest: a NULL-VALUED reference is a non-null struct, so
      // it shadows older values instead of being skipped by IGNORE NULLS
      // (same semantics both engines, even on null reference values).
      Some("""WITH u AS (
             |  SELECT user_id, ts, event_id, {'v': value} AS qr, NULL AS tv, 0 AS side
             |  FROM events WHERE event_type = 'view'
             |  UNION ALL
             |  SELECT user_id, ts, event_id, CAST(NULL AS STRUCT(v DOUBLE)), value, 1
             |  FROM events WHERE event_type = 'purchase'),
             |m AS (
             |  SELECT user_id, event_id, tv, side,
             |         (LAST_VALUE(qr IGNORE NULLS) OVER (
             |           PARTITION BY user_id ORDER BY ts, side, event_id
             |           ROWS UNBOUNDED PRECEDING)).v AS av
             |  FROM u)
             |SELECT user_id, event_id, ROUND(tv, 4) AS purchase_value,
             |       ROUND(av, 4) AS last_view_value
             |FROM m WHERE side = 1 ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val views = ev.filter(col("event_type") === "view")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts", "value")
        AsOf.joinLatest(purchases, views, Seq("user_id"), "ts", "event_id",
            "value", outCol = "last_view_value")
          .select(col("user_id"), col("event_id"),
            r4(col("value")).as("purchase_value"),
            r4(col("last_view_value")).as("last_view_value"))
          .orderBy("user_id", "event_id")
      }),

    Q("q55_stats_moments",
      // Exact moments from decimal sums (s1, s2, s3), one double pass at
      // the end — same determinism pattern as q08/q10 extended to products
      // (the IEEE double products are bit-identical across engines, and
      // double->decimal casts round half-up in both).
      Some("""WITH s AS (
             |  SELECT event_type, COUNT(*) AS n,
             |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s1,
             |         CAST(SUM(CAST(value * value AS DECIMAL(20,4))) AS DOUBLE) AS s2,
             |         CAST(SUM(CAST(value * value * value AS DECIMAL(25,4))) AS DOUBLE) AS s3,
             |         ROUND(MIN(value), 4) AS min_value,
             |         ROUND(MAX(value), 4) AS max_value
             |  FROM events GROUP BY event_type)
             |SELECT event_type, n AS cnt,
             |       ROUND(s1 / n, 4) AS mean,
             |       ROUND(s2 / n - (s1 / n) * (s1 / n), 4) AS var_pop,
             |       ROUND((s3 / n - 3 * (s1 / n) * (s2 / n - (s1 / n) * (s1 / n)) - (s1 / n) * (s1 / n) * (s1 / n))
             |             / POWER(s2 / n - (s1 / n) * (s1 / n), 1.5), 4) AS skew,
             |       min_value, max_value
             |FROM s ORDER BY event_type""".stripMargin),
      (s, d) => {
        val inner = Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            dsumD(col("value")).as("s1"),
            sum((col("value") * col("value")).cast("decimal(20,4)")).cast("double").as("s2"),
            sum((col("value") * col("value") * col("value")).cast("decimal(25,4)")).cast("double").as("s3"),
            r4(min(col("value"))).as("min_value"),
            r4(max(col("value"))).as("max_value"))
        val m1 = col("s1") / col("n")
        val varPop = col("s2") / col("n") - m1 * m1
        val skew = (col("s3") / col("n") - lit(3) * m1 * varPop - m1 * m1 * m1) /
          pow(varPop, 1.5)
        inner.select(col("event_type"), col("n").as("cnt"),
            r4(m1).as("mean"), r4(varPop).as("var_pop"), r4(skew).as("skew"),
            col("min_value"), col("max_value"))
          .orderBy("event_type")
      }),

    Q("q57_lateral_topk",
      // Correlated LATERAL subquery with per-group LIMIT (Catalyst
      // decorrelates to a ranked window) — the "top-N per key" join form.
      Some("""SELECT n_name, c_custkey, ROUND(c_acctbal, 4) AS bal
             |FROM nation, LATERAL (
             |  SELECT c_custkey, c_acctbal FROM customer
             |  WHERE c_nationkey = n_nationkey
             |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
             |ORDER BY n_name, c_custkey""".stripMargin),
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_cust_q57")
        Tables.nation(s, d).createOrReplaceTempView("graft_nation_q57")
        s.sql("""SELECT n_name, c_custkey, ROUND(c_acctbal, 4) AS bal
                |FROM graft_nation_q57, LATERAL (
                |  SELECT c_custkey, c_acctbal FROM graft_cust_q57
                |  WHERE c_nationkey = n_nationkey
                |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
                |ORDER BY n_name, c_custkey""".stripMargin)
      }),

    Q("q58_string_advanced",
      Some("""SELECT p_partkey,
             |       CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
             |       split_part(p_name, ' ', 2) AS second_word,
             |       lpad(p_brand, 12, '.') AS brand_pad,
             |       reverse(p_type) AS type_rev,
             |       replace(p_name, ' ', '_') AS name_us
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"),
          split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
          lpad(col("p_brand"), 12, ".").as("brand_pad"),
          reverse(col("p_type")).as("type_rev"),
          // translate, not regexp_replace: the oracle's replace() is
          // LITERAL — a regex mirror breaks the moment the pattern gains a
          // metacharacter
          translate(col("p_name"), " ", "_").as("name_us"))
        .orderBy("p_partkey")),

    Q("q59_bitwise",
      Some("""SELECT l_orderkey, l_linenumber,
             |       l_orderkey & 255 AS and_m,
             |       l_orderkey | 256 AS or_m,
             |       xor(l_orderkey, l_partkey) AS xor_k,
             |       CAST(l_linenumber << 3 AS BIGINT) AS shl,
             |       CAST(bit_count(l_orderkey) AS BIGINT) AS bc
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, xor_k""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").bitwiseAND(lit(255L)).as("and_m"),
          col("l_orderkey").bitwiseOR(lit(256L)).as("or_m"),
          col("l_orderkey").bitwiseXOR(col("l_partkey")).as("xor_k"),
          shiftleft(col("l_linenumber"), 3).cast("long").as("shl"),
          bit_count(col("l_orderkey")).cast("long").as("bc"))
        // non-unique (orderkey, linenumber): xor_k pins l_partkey (see q02)
        .orderBy("l_orderkey", "l_linenumber", "xor_k")),

    Q("q60_date_arith",
      // dayofweek numbering differs across engines (DuckDB 0=Sun, Spark
      // 1=Sun); ISO day-of-week (1=Mon..7=Sun) is the stable contract.
      Some("""SELECT o_orderkey,
             |       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
             |       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
             |       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             |       CAST(weekofyear(o_orderdate) AS BIGINT) AS wk,
             |       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          weekofyear(col("o_orderdate")).cast("long").as("wk"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"))
        .orderBy("o_orderkey")),

    Q("q61_conditional_agg",
      Some("""SELECT l_returnflag,
             |       COUNT(*) FILTER (WHERE l_quantity > 25) AS big_cnt,
             |       BOOL_OR(l_discount > 0.09) AS any_high_disc,
             |       BOOL_AND(l_quantity >= 1) AS all_qty_pos,
             |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
             |               FILTER (WHERE l_quantity > 25) AS DOUBLE), 4) AS big_sum
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count_if(col("l_quantity") > 25).as("big_cnt"),
          bool_or(col("l_discount") > 0.09).as("any_high_disc"),
          bool_and(col("l_quantity") >= 1).as("all_qty_pos"),
          r4(sum(when(col("l_quantity") > 25, col("l_extendedprice"))
            .cast("decimal(18,4)")).cast("double")).as("big_sum"))
        .orderBy("l_returnflag")),

    Q("q62_range_window",
      // RANGE frame (value-based, peers included) vs the ROWS frames of
      // q16/q53: how many of the customer's orders fall within +-10000 of
      // each order's price.
      Some("""SELECT o_custkey, o_orderkey,
             |       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
             |         RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS near_cnt
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_orders_q62")
        s.sql("""SELECT o_custkey, o_orderkey,
                |       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                |         RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS near_cnt
                |FROM graft_orders_q62 ORDER BY o_custkey, o_orderkey""".stripMargin)
      }),

    Q("q63_histogram",
      Some("""SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bin, COUNT(*) AS cnt,
             |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_v
             |FROM events GROUP BY 1 ORDER BY bin""".stripMargin),
      (s, d) => Tables.events(s, d)
        .groupBy(floor(col("value") / 50).cast("long").as("bin"))
        .agg(count(lit(1)).as("cnt"), r4(dsumD(col("value"))).as("sum_v"))
        .orderBy("bin")),

    Q("q64_json_keys",
      Some("""SELECT event_id,
             |       array_to_string(json_keys(props), ',') AS key_list,
             |       CAST(props ->> '$.k' AS BIGINT) AS k_val
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => {
        // null-safe: concat_ws maps a null array to '' but the oracle's
        // array_to_string(NULL) is NULL — keep null/invalid props NULL on
        // both sides.
        val ks = json_object_keys(col("props"))
        Tables.events(s, d)
          .select(col("event_id"),
            when(ks.isNotNull, concat_ws(",", ks)).as("key_list"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val"))
          .orderBy("event_id")
      }),

    Q("q65_array_advanced",
      // Derived integer arrays (sequence of vec_id%5+1 elements) keep the
      // array-function surface float-free and therefore hash-stable.
      Some("""SELECT vec_id,
             |       CAST(LEN(GENERATE_SERIES(1, 1 + vec_id % 5)) AS BIGINT) AS arr_len,
             |       list_contains(GENERATE_SERIES(1, 1 + vec_id % 5), 3) AS has3,
             |       CAST(LEN(list_slice(GENERATE_SERIES(1, 1 + vec_id % 5), 2, 3)) AS BIGINT) AS slice_len,
             |       CAST(LEN(flatten([GENERATE_SERIES(1, 1 + vec_id % 5),
             |                         GENERATE_SERIES(1, 1 + vec_id % 5)])) AS BIGINT) AS flat_len,
             |       CAST(list_aggregate(GENERATE_SERIES(1, 1 + vec_id % 5), 'max') AS BIGINT) AS arr_max
             |FROM embeddings ORDER BY vec_id""".stripMargin),
      (s, d) => {
        val arr = sequence(lit(1L), lit(1L) + col("vec_id") % 5)
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            size(arr).cast("long").as("arr_len"),
            array_contains(arr, 3L).as("has3"),
            size(slice(arr, 2, 2)).cast("long").as("slice_len"),
            size(flatten(array(arr, arr))).cast("long").as("flat_len"),
            array_max(arr).cast("long").as("arr_max"))
          .orderBy("vec_id")
      }),

    Q("q66_intersect_all",
      // Bag-semantics set op (q20/q21 are the DISTINCT forms): duplicate
      // nation keys survive up to the min multiplicity on each side.
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT ALL
             |SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersectAll(Tables.supplier(s, d).select(col("s_nationkey")))
        .orderBy("nationkey")),

    Q("q67_string_agg",
      // Ordered string aggregation: Spark has no ORDER BY inside an agg, so
      // the deterministic form is collect_list -> array_sort -> array_join,
      // which equals DuckDB's string_agg(... ORDER BY ...).
      Some("""SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS names,
             |       COUNT(*) AS cnt
             |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin),
      (s, d) => Tables.supplier(s, d)
        .groupBy("s_nationkey")
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("names"),
          count(lit(1)).as("cnt"))
        .orderBy("s_nationkey")),

    Q("q68_posexplode",
      Some("""SELECT vec_id, i AS pos,
             |       ROUND(CAST(embedding[i] AS DOUBLE), 4) AS val
             |FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS t(i)
             |WHERE vec_id < 50 ORDER BY vec_id, pos""".stripMargin),
      (s, d) => Tables.embeddings(s, d)
        .filter(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
          round(col("col").cast("double"), 4).as("val"))
        .orderBy("vec_id", "pos")),

    Q("q70_train_test_split",
      // Deterministic hash-bucket splits (train 0.8 / valid 0.1 / test 0.1)
      // — the reproducible, engine-stable alternative to rand() sampling.
      Some("""SELECT split, lang, COUNT(*) AS cnt
             |FROM (SELECT lang,
             |             CASE WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 80 THEN 'train'
             |                  WHEN CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'valid'
             |                  ELSE 'test' END AS split
             |      FROM documents) t
             |GROUP BY split, lang ORDER BY split, lang""".stripMargin),
      (s, d) => graft.operators.Splits
        .assignSplit(Tables.documents(s, d), "doc_id",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .groupBy("split", "lang").agg(count(lit(1)).as("cnt"))
        .orderBy("split", "lang")),

    Q("q71_disjunctive_filter",
      // TPC-H Q19 shape: OR-of-ANDs across the join — exercises CNF
      // conversion / partial pushdown of disjunctive predicates.
      Some("""SELECT COUNT(*) AS cnt,
             |       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 5 AND 25 AND l_quantity < 20)""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) && col("l_quantity") >= 20) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(5, 25) && col("l_quantity") < 20))
        .agg(count(lit(1)).as("cnt"),
          r4(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))),

    Q("q72_unpivot",
      Some("""SELECT l_orderkey, l_linenumber, measure, ROUND(value, 4) AS value
             |FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount
             |               FROM lineitem WHERE l_orderkey < 100)
             |      ON l_quantity, l_discount INTO NAME measure VALUE value)
             |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount")), "measure", "value")
        .select(col("l_orderkey"), col("l_linenumber"), col("measure"),
          round(col("value"), 4).as("value"))
        // (l_orderkey, l_linenumber) is NOT unique in the driver testdata —
        // value completes the total order
        .orderBy("l_orderkey", "l_linenumber", "measure", "value")),

    Q("q73_tpch_q5",
      // TPC-H Q5 shape: 6-table join with the local-supplier residual
      // (c_nationkey = s_nationkey) — the join-reorder / broadcast-chain
      // workout. Dims flow into the fact, never the reverse.
      Some("""SELECT n_name,
             |       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      (s, d) => {
        // Fact-FIRST join order: lineitem streams through every join and
        // never sits on a build side (static stats would otherwise happily
        // broadcast the column-pruned fact — measured: BuildRight=lineitem
        // at sf0.1). The ASIA-filtered supplier⋈nation⋈region dim chain is
        // explicitly broadcast; orders/customer stay unhinted so AQE picks
        // build sides from runtime sizes at any scale.
        val dims = Tables.supplier(s, d)
          .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
        Tables.lineitem(s, d)
          .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(r4(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

    Q("q74_text_redact",
      // PII-style masking; n_chars>=220 keeps the output scan small while
      // still exercising every rule. Rule order (email before number) is
      // part of the contract — see TextAnalysis.DefaultRedactions.
      Some("""SELECT doc_id,
             |       regexp_replace(regexp_replace(text,
             |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
             |         '[0-9]+', '<NUM>', 'g') AS redacted,
             |       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]+')) AS BIGINT) AS n_nums
             |FROM documents WHERE n_chars >= 220
             |ORDER BY doc_id""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .filter(col("n_chars") >= 220)
        .select(col("doc_id"),
          graft.operators.TextAnalysis.redact(col("text")).as("redacted"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_nums"))
        .orderBy("doc_id")),

    Q("q75_correlation",
      // Pearson correlation from decimal-exact co-moment sums — built-in
      // corr() accumulates floats in shuffle-arrival order and drifts
      // across engines/runs, so it cannot be hash-checked; this form can.
      Some("""WITH s AS (
             |  SELECT l_returnflag, COUNT(*) AS n,
             |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
             |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
             |         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS sxy,
             |         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sxx,
             |         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS syy
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, n,
             |       ROUND((sxy / n - (sx / n) * (sy / n))
             |             / (SQRT(sxx / n - (sx / n) * (sx / n))
             |              * SQRT(syy / n - (sy / n) * (sy / n))), 4) AS corr_qty_price
             |FROM s ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val inner = Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            dsumD(col("l_quantity")).as("sx"),
            dsumD(col("l_extendedprice")).as("sy"),
            sum((col("l_quantity") * col("l_extendedprice")).cast("decimal(25,4)")).cast("double").as("sxy"),
            sum((col("l_quantity") * col("l_quantity")).cast("decimal(20,4)")).cast("double").as("sxx"),
            sum((col("l_extendedprice") * col("l_extendedprice")).cast("decimal(25,4)")).cast("double").as("syy"))
        val mx = col("sx") / col("n")
        val my = col("sy") / col("n")
        val corr = (col("sxy") / col("n") - mx * my) /
          (sqrt(col("sxx") / col("n") - mx * mx) * sqrt(col("syy") / col("n") - my * my))
        inner.select(col("l_returnflag"), col("n"), r4(corr).as("corr_qty_price"))
          .orderBy("l_returnflag")
      }),

    Q("q76_nation_pair_volume",
      // TPC-H Q7 shape: the SAME dim joined twice under different roles
      // (supplier nation vs customer nation) — alias disambiguation +
      // pair-symmetric disjunctive filter.
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |       COUNT(*) AS cnt,
             |       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
             |FROM supplier
             |JOIN lineitem ON s_suppkey = l_suppkey
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
             |GROUP BY n1.n_name, n2.n_name
             |ORDER BY supp_nation, cust_nation""".stripMargin),
      (s, d) => {
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
        Tables.supplier(s, d)
          .join(Tables.lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
          .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .filter(
            (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
          .groupBy("supp_nation", "cust_nation")
          .agg(count(lit(1)).as("cnt"),
            r4(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
          .orderBy("supp_nation", "cust_nation")
      }),

    Q("q77_decile_share",
      // Three-stage agg -> window -> agg shape: customers bucketed into
      // spend deciles, each decile's share of total revenue. Shares sum to
      // 1; decimal sums keep every stage exact until the final division.
      Some("""WITH spend AS (
             |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s
             |  FROM orders GROUP BY o_custkey),
             |ranked AS (
             |  SELECT o_custkey, s, NTILE(10) OVER (ORDER BY s DESC, o_custkey) AS decile
             |  FROM spend)
             |SELECT CAST(decile AS BIGINT) AS decile, COUNT(*) AS n_customers,
             |       ROUND(CAST(SUM(s) AS DOUBLE), 4) AS decile_spend,
             |       ROUND(CAST(SUM(s) AS DOUBLE)
             |             / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) FROM orders), 4) AS share
             |FROM ranked GROUP BY decile ORDER BY decile""".stripMargin),
      (s, d) => {
        val orders = Tables.orders(s, d)
        val spend = orders.groupBy("o_custkey")
          .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("sp"))
        // lazy scalar: the grand total rides along as a broadcast 1-row
        // frame (the oracle's scalar subquery shape) — an eager .head()
        // here would run a job at plan-construction time and NPE on an
        // empty table
        val totalDf = orders.agg(dsumD(col("o_totalprice")).as("grand_total"))
        // ntile(10).over(Window.orderBy(...)) would funnel every customer
        // through one task; GlobalOrder.ntile is the range-partitioned
        // equivalent (exact NTILE semantics, no single-partition window).
        GlobalOrder.ntile(spend, 10, Seq(col("sp").desc, col("o_custkey")), "decile")
          .groupBy("decile")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("sp")).cast("double").as("spend_d"))
          .crossJoin(broadcast(totalDf))
          .select(col("decile"), col("n_customers"),
            r4(col("spend_d")).as("decile_spend"),
            r4(col("spend_d") / col("grand_total")).as("share"))
          .orderBy("decile")
      }),

    Q("q78_exists_combo",
      // EXISTS and NOT EXISTS against the same relation in one predicate —
      // Catalyst plans a semi and an anti join over one subtree.
      Some("""SELECT c_custkey, c_name
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val orders = Tables.orders(s, d)
        Tables.customer(s, d)
          .join(orders.select("o_custkey"), col("o_custkey") === col("c_custkey"), "left_semi")
          .join(orders.filter(col("o_totalprice") > 400000).select("o_custkey"),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      }),

    Q("q79_cte_reuse",
      // One CTE consumed twice (per-nation stats vs their global average) —
      // the shared-subtree reuse shape.
      Some("""WITH stats AS (
             |  SELECT n_name, COUNT(*) AS n_cust,
             |         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY n_name)
             |SELECT s.n_name, s.n_cust, ROUND(s.bal, 4) AS nation_bal
             |FROM stats s
             |WHERE s.bal > (SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) FROM stats)
             |ORDER BY s.n_name""".stripMargin),
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_cust_q79")
        Tables.nation(s, d).createOrReplaceTempView("graft_nation_q79")
        s.sql("""WITH stats AS (
                |  SELECT n_name, COUNT(*) AS n_cust,
                |         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
                |  FROM graft_cust_q79 JOIN graft_nation_q79 ON c_nationkey = n_nationkey
                |  GROUP BY n_name)
                |SELECT s.n_name, s.n_cust, ROUND(s.bal, 4) AS nation_bal
                |FROM stats s
                |WHERE s.bal > (SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) FROM stats)
                |ORDER BY s.n_name""".stripMargin)
      }),

    Q("q80_null_funcs",
      // COALESCE/NULLIF/CASE over genuine outer-join nulls (customers with
      // no orders) — the null-handling function surface on real nulls, not
      // literals.
      // Outputs stay integer/string-exact: ROUND of an arbitrary float
      // QUOTIENT is the one place the engines' double-rounding can differ
      // by 1 ulp at a .xxxx5 boundary (measured here), so the quotient
      // form is deliberately excluded.
      Some("""SELECT c_custkey,
             |       COALESCE(CAST(cnt AS BIGINT), 0) AS order_cnt,
             |       CAST(CASE WHEN cnt IS NULL THEN 'none'
             |                 WHEN cnt >= 20 THEN 'heavy' ELSE 'light' END AS VARCHAR) AS band,
             |       CAST(NULLIF(COALESCE(cnt, 0), 0) AS BIGINT) AS nullable_cnt,
             |       ROUND(COALESCE(total, 0.0), 4) AS total_spend
             |FROM customer
             |LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt,
             |                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
             |           FROM orders GROUP BY o_custkey) o ON o_custkey = c_custkey
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val agg = Tables.orders(s, d).groupBy("o_custkey")
          .agg(count(lit(1)).as("cnt"), dsumD(col("o_totalprice")).as("total"))
        Tables.customer(s, d)
          .join(agg, col("o_custkey") === col("c_custkey"), "left_outer")
          .select(col("c_custkey"),
            coalesce(col("cnt"), lit(0L)).as("order_cnt"),
            when(col("cnt").isNull, "none").when(col("cnt") >= 20, "heavy")
              .otherwise("light").as("band"),
            nullif(coalesce(col("cnt"), lit(0L)), lit(0L)).cast("long").as("nullable_cnt"),
            r4(coalesce(col("total"), lit(0.0))).as("total_spend"))
          .orderBy("c_custkey")
      }),

    Q("q69_ann_kmeans",
      // Full Lloyd's-iteration oracle, unrolled: init = 16 lowest-id
      // vectors relabeled 0..15; each round = argmax-cosine assignment
      // (ties -> lowest cid, pinned by ROW_NUMBER) then per-dimension
      // mean as exact-decimal sum -> double -> IEEE division -> float —
      // every step engine-portable (decimal DIVISION is not: its
      // precision/scale rules differ per engine, which is why the mean is
      // divided in double). Lost cells keep their previous centroid
      // (COALESCE). Dim is fixed at 64 by the driver data (FIXTURES.md
      // embeddings row); KMeansSpec pins determinism/quality besides.
      Some(ExtendedQueries.kmeansIvfOracleSql),
      (s, d) => {
        import graft.operators.Similarity
        val emb = Tables.embeddings(s, d)
        val cents = trainedCentroids(s, d) // shared deterministic training
        val assigned = Similarity.assignToCentroidsLocal(emb, cents)
        val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        Similarity.ivfTopK(assigned.filter(col("vec_id") =!= 0), cents, query, 10,
          "vec_id", "embedding", "qe")
      }),

    Q("q56_dup_clusters",
      Some(s"""WITH RECURSIVE pairs AS (
              |  SELECT a_id, b_id FROM (${TrainingQueries.jaccardPairsExactSql})),
              |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              |          UNION ALL SELECT b_id, a_id FROM pairs),
              |reach(node, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT e.src, re.r FROM edges e JOIN reach re ON e.dst = re.node)
              |SELECT node AS doc_id, MIN(r) AS cluster_id
              |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin),
      // Edges come from the LSH pipeline (candidates -> exact verify),
      // the composition a 100 TB dedup run actually uses; its output is
      // the exact pair set (q36 ≡ q37, see TrainingQueries), so the
      // recursive-closure oracle is unchanged. Session-cached and shared
      // with q174's resolution step.
      (s, d) => cachedDupClusters(s, d).orderBy("doc_id"))
  )
}
