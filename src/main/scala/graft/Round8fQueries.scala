package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.TrainingQueries.{shingleRowsSql, toksSql}
import graft.operators.{Dedup, GlobalOrder, GroupMedian}
import graft.sources.Tables

/** Round-8 sixth batch: lifecycle and corpus-composition analytics —
  * cohort conversion latency, RFM segmentation, the revenue Lorenz
  * curve, token burstiness (Fano factor), per-source unique-passage
  * ratios, and a dedup-method agreement report. All per-group order
  * statistics go through GroupMedian/GlobalOrder (no low-cardinality
  * window funnels); ratios are floor-scaled integers. */
object Round8fQueries {

  def all: Seq[Q] = Seq(

    Q("q269_conversion_latency",
      // Signup -> first-purchase latency per signup-week cohort: counts,
      // conversions, and the exact nearest-rank median latency of the
      // converted (NULL for cohorts nobody converted from). Firsts are
      // plain min-aggs; the median runs per COHORT (low-cardinality:
      // weeks) through GroupMedian's prefix scan. The funnel-timing
      // view q136's step-count funnel cannot give.
      Some("""WITH su AS (SELECT user_id, MIN(ts) s_ts FROM events
             |           WHERE event_type = 'signup' GROUP BY 1),
             |pu AS (SELECT user_id, MIN(ts) p_ts FROM events
             |       WHERE event_type = 'purchase' GROUP BY 1),
             |j AS (SELECT su.user_id, CAST(DATE_TRUNC('week', su.s_ts) AS DATE) cohort,
             |             (epoch_us(pu.p_ts) - epoch_us(su.s_ts))//1000000 lat_s
             |      FROM su LEFT JOIN pu ON su.user_id = pu.user_id AND pu.p_ts >= su.s_ts),
             |c AS (SELECT cohort, user_id, lat_s FROM j WHERE lat_s IS NOT NULL),
             |r AS (SELECT cohort, lat_s,
             |        SUM(1) OVER (PARTITION BY cohort ORDER BY lat_s, user_id
             |                     ROWS UNBOUNDED PRECEDING) cum,
             |        COUNT(*) OVER (PARTITION BY cohort) tot FROM c)
             |SELECT STRFTIME(j.cohort, '%Y-%m-%d') cohort_week,
             |  CAST(COUNT(*) AS BIGINT) n_signups,
             |  CAST(SUM(CASE WHEN j.lat_s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) n_converted,
             |  CAST(m.med AS BIGINT) med_latency_s
             |FROM j LEFT JOIN (SELECT cohort, MIN(CASE WHEN 2*cum >= tot THEN lat_s END) med
             |                  FROM r GROUP BY cohort) m ON m.cohort = j.cohort
             |GROUP BY j.cohort, m.med ORDER BY cohort_week""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("s_ts"))
        val pu = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ts").as("p_ts"))
          .withColumnRenamed("user_id", "p_uid") // explicit: su/pu share lineage
        val j = su.join(pu,
            col("user_id") === col("p_uid") && col("p_ts") >= col("s_ts"), "left")
          .select(col("user_id"),
            date_trunc("week", col("s_ts")).cast("date").as("cohort"),
            expr("(unix_micros(p_ts) - unix_micros(s_ts)) div 1000000").as("lat_s"))
        val c = j.filter(col("lat_s").isNotNull)
          .select(col("cohort"), col("lat_s"), col("user_id"))
        val m = GroupMedian.lowerMedian(c, "cohort", "lat_s",
          Seq(col("user_id")), "med")
        j.groupBy("cohort")
          .agg(count(lit(1)).cast("long").as("n_signups"),
            sum(when(col("lat_s").isNotNull, 1L).otherwise(0L))
              .cast("long").as("n_converted"))
          .join(broadcast(m), Seq("cohort"), "left")
          .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
            col("n_signups"), col("n_converted"),
            col("med").cast("long").as("med_latency_s"))
          .orderBy("cohort_week")
      }),

    Q("q270_rfm_segments",
      // RFM segmentation: per-user recency/frequency/monetary quartiles
      // (exact SQL NTILE semantics under a TOTAL order — ties break on
      // user id, so the oracle can hash) and the population of each
      // R-F-M cell. Quartiles come from GlobalOrder.ntile's
      // range-partitioned two-pass — three global orders, zero
      // partition-less windows. The classic CRM cut of the event log.
      Some("""WITH mx AS (SELECT MAX(CAST(ts AS DATE)) d FROM events),
             |u AS (SELECT user_id,
             |        DATE_DIFF('day', MAX(CAST(ts AS DATE)), mx.d) rec_days,
             |        CAST(COUNT(*) AS BIGINT) freq,
             |        CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) mon_cents
             |      FROM events, mx GROUP BY user_id, mx.d),
             |q AS (SELECT user_id,
             |        NTILE(4) OVER (ORDER BY rec_days, user_id) r_q,
             |        NTILE(4) OVER (ORDER BY freq DESC, user_id) f_q,
             |        NTILE(4) OVER (ORDER BY mon_cents DESC, user_id) m_q
             |      FROM u)
             |SELECT CAST(r_q AS BIGINT) r_q, CAST(f_q AS BIGINT) f_q,
             |       CAST(m_q AS BIGINT) m_q, CAST(COUNT(*) AS BIGINT) n_users
             |FROM q GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin),
      (s, d) => {
        val mx = Tables.events(s, d).agg(max(col("ts").cast("date")).as("d"))
        val u = Tables.events(s, d)
          .groupBy("user_id")
          .agg(max(col("ts").cast("date")).as("last_d"),
            count(lit(1)).cast("long").as("freq"),
            sum(round(col("value") * 100).cast("long")).cast("long").as("mon_cents"))
          .crossJoin(broadcast(mx))
          .select(col("user_id"), datediff(col("d"), col("last_d")).as("rec_days"),
            col("freq"), col("mon_cents"))
        val q = GlobalOrder.ntile(
          GlobalOrder.ntile(
            GlobalOrder.ntile(u, 4, Seq(col("rec_days"), col("user_id")), "r_q"),
            4, Seq(col("freq").desc, col("user_id")), "f_q"),
          4, Seq(col("mon_cents").desc, col("user_id")), "m_q")
        q.groupBy("r_q", "f_q", "m_q")
          .agg(count(lit(1)).cast("long").as("n_users"))
          .select(col("r_q").cast("long"), col("f_q").cast("long"),
            col("m_q").cast("long"), col("n_users"))
          .orderBy("r_q", "f_q", "m_q")
      }),

    Q("q271_lorenz_curve",
      // Revenue concentration (Lorenz curve points): the ppm share of
      // total revenue held by the top 10..50% of orders by value. One
      // GlobalOrder pass assigns both the global rank and the running
      // revenue prefix over (cents DESC, orderkey); the five decile
      // cuts derive from the broadcast totals row and join back on the
      // exact rank. Complements q222's Gini with the curve itself.
      Some("""WITH o AS (SELECT l_orderkey,
             |         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) cents
             |       FROM lineitem GROUP BY 1),
             |r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents DESC, l_orderkey) rn,
             |        SUM(cents) OVER (ORDER BY cents DESC, l_orderkey
             |                         ROWS UNBOUNDED PRECEDING) cum
             |      FROM o),
             |t AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(cents) AS BIGINT) tot FROM o),
             |k AS (SELECT UNNEST([1,2,3,4,5]) dc),
             |cut AS (SELECT dc, (t.n * dc)//10 k_rows, t.tot FROM k CROSS JOIN t)
             |SELECT CAST(cut.dc*10 AS BIGINT) top_pct, CAST(cut.k_rows AS BIGINT) n_orders,
             |       CAST(r.cum*1000000//cut.tot AS BIGINT) rev_share_e6
             |FROM cut JOIN r ON r.rn = cut.k_rows
             |ORDER BY top_pct""".stripMargin),
      (s, d) => {
        val o = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .cast("long").as("cents"))
          .localCheckpoint(true) // shared by rank pass + totals
        val sort = Seq(col("cents").desc, col("l_orderkey"))
        val ranked = GlobalOrder.exclusiveRunningSum(
            GlobalOrder.rowNumber(o, sort, "rn"), sort, "cents", "ex")
          .select(col("rn"), (col("ex") + col("cents")).as("cum"))
        val t = o.agg(count(lit(1)).as("n"), sum("cents").as("tot"))
        val cut = broadcast(t).select(
            explode(array((1 to 5).map(lit): _*)).as("dc"), col("n"), col("tot"))
          .select(col("dc"), expr("(n * dc) div 10").as("k_rows"), col("tot"))
        cut.join(ranked, col("rn") === col("k_rows"))
          .select((col("dc") * 10).cast("long").as("top_pct"),
            col("k_rows").cast("long").as("n_orders"),
            expr("cum * 1000000 div tot").as("rev_share_e6"))
          .orderBy("top_pct")
      }),

    Q("q272_token_burstiness",
      // Token burstiness: the Fano factor (variance-to-mean over
      // per-document counts, zeros included) of each token with df >= 5,
      // top-20 burstiest — Fano ~ 1 is Poisson background vocabulary,
      // high Fano marks topical/bursty terms (the classical term-
      // weighting diagnostic beside q145's TF-IDF). Exact: fano_e6 =
      // (n*sum(x^2) - tot^2)*1e6 div (n*tot), all BIGINT.
      Some(s"""WITH t AS (SELECT doc_id, UNNEST($toksSql) tok FROM documents),
              |c AS (SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) x FROM t GROUP BY 1, 2),
              |s AS (SELECT tok, CAST(COUNT(*) AS BIGINT) df, CAST(SUM(x) AS BIGINT) tot,
              |             CAST(SUM(x*x) AS BIGINT) sx2 FROM c GROUP BY tok),
              |n AS (SELECT CAST(COUNT(*) AS BIGINT) nd FROM documents)
              |SELECT tok, df, tot, (n.nd*sx2 - tot*tot)*1000000//(n.nd*tot) fano_e6
              |FROM s CROSS JOIN n WHERE df >= 5
              |ORDER BY fano_e6 DESC, tok LIMIT 20""".stripMargin),
      (s, d) => {
        val c = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("tok", "doc_id").agg(count(lit(1)).cast("long").as("x"))
        val st = c.groupBy("tok")
          .agg(count(lit(1)).cast("long").as("df"),
            sum("x").cast("long").as("tot"),
            sum(col("x") * col("x")).cast("long").as("sx2"))
          .filter(col("df") >= 5)
        val n = Tables.documents(s, d).agg(count(lit(1)).cast("long").as("nd"))
        st.crossJoin(broadcast(n))
          .select(col("tok"), col("df"), col("tot"),
            expr("(nd*sx2 - tot*tot)*1000000 div (nd*tot)").as("fano_e6"))
          .orderBy(col("fano_e6").desc, col("tok")).limit(20)
      }),

    Q("q273_unique_passage_ratio",
      // Per-source unique-passage ratio: distinct 3-gram shingles and
      // the fraction occurring in exactly ONE of the source's documents
      // — high means the source contributes novel passages, low means
      // internal boilerplate (the per-source lens on q233's corpus-wide
      // dedup-reduction report, and a memorization-risk proxy). Shares
      // the q36 shingle fragment on both sides.
      Some(s"""WITH sh AS ($shingleRowsSql),
              |c AS (SELECT dd.source, sh.shingle, CAST(COUNT(*) AS BIGINT) n
              |      FROM sh JOIN documents dd ON dd.doc_id = sh.doc_id GROUP BY 1, 2),
              |s AS (SELECT source, CAST(COUNT(*) AS BIGINT) n_shingles,
              |             CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) n_unique
              |      FROM c GROUP BY source)
              |SELECT source, n_shingles, n_unique, n_unique*1000000//n_shingles unique_e6
              |FROM s ORDER BY source""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d)
        val c = Dedup.shingleIndex(docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
          .groupBy("source", "shingle").agg(count(lit(1)).cast("long").as("n"))
        c.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_shingles"),
            sum(when(col("n") === 1, 1L).otherwise(0L)).cast("long").as("n_unique"))
          .select(col("source"), col("n_shingles"), col("n_unique"),
            expr("n_unique*1000000 div n_shingles").as("unique_e6"))
          .orderBy("source")
      }),

    Q("q274_dedup_method_agreement",
      // Do two near-dup definitions agree? Jaccard >= 0.8 (q36) vs
      // MUTUAL containment >= 0.8 (both directions of q147) over the
      // SAME session-cached pair-stats relation — the report a pipeline
      // reads before swapping dedup filters, since jaccard <= each
      // containment means the mutual set can only ADD size-skewed pairs
      // the union-diluted jaccard missed. One full-outer join of two
      // projections of (inter, n_a, n_b); agreement in ppm.
      Some(s"""WITH ${TrainingQueries.cappedShingleCtes},
              |cnt AS (SELECT doc_id, COUNT(*) n_sh FROM sh GROUP BY doc_id),
              |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, COUNT(*) i
              |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |          GROUP BY 1, 2),
              |st AS (SELECT a_id, b_id, i, ca.n_sh na, cb.n_sh nb
              |       FROM inter JOIN cnt ca ON ca.doc_id = a_id
              |                  JOIN cnt cb ON cb.doc_id = b_id),
              |jc AS (SELECT a_id, b_id FROM st WHERE ROUND(i::DOUBLE/(na + nb - i), 4) >= 0.8),
              |mc AS (SELECT a_id, b_id FROM st
              |       WHERE ROUND(i::DOUBLE/na, 4) >= 0.8 AND ROUND(i::DOUBLE/nb, 4) >= 0.8),
              |m AS (SELECT CASE WHEN j.a_id IS NOT NULL THEN 1 ELSE 0 END in_j,
              |             CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END in_c
              |      FROM jc j FULL OUTER JOIN mc c ON j.a_id = c.a_id AND j.b_id = c.b_id)
              |SELECT CAST(SUM(in_j*in_c) AS BIGINT) n_both,
              |       CAST(SUM(in_j*(1-in_c)) AS BIGINT) n_jaccard_only,
              |       CAST(SUM((1-in_j)*in_c) AS BIGINT) n_mutual_only,
              |       CAST(SUM(in_j*in_c)*1000000//COUNT(*) AS BIGINT) agree_e6
              |FROM m""".stripMargin),
      (s, d) => {
        val stats = TrainingQueries.cachedPairStats(s, d)
        val jc = Dedup.jaccardFromStats(stats, 0.8).select("a_id", "b_id")
        val mc = stats
          .filter(round(col("inter").cast("double") / col("n_a"), 4) >= 0.8 &&
            round(col("inter").cast("double") / col("n_b"), 4) >= 0.8)
          .select("a_id", "b_id")
        val m = jc.withColumn("in_j", lit(1))
          .join(mc.withColumn("in_c", lit(1)), Seq("a_id", "b_id"), "full_outer")
          .select(coalesce(col("in_j"), lit(0)).as("in_j"),
            coalesce(col("in_c"), lit(0)).as("in_c"))
        m.agg(sum(col("in_j") * col("in_c")).cast("long").as("n_both"),
            sum(col("in_j") * (lit(1) - col("in_c"))).cast("long").as("n_jaccard_only"),
            sum((lit(1) - col("in_j")) * col("in_c")).cast("long").as("n_mutual_only"),
            count(lit(1)).cast("long").as("n_tot"))
          .select(col("n_both"), col("n_jaccard_only"), col("n_mutual_only"),
            expr("n_both * 1000000 div n_tot").as("agree_e6"))
      })
  )
}
