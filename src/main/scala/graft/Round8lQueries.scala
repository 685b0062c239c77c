package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.sources.Tables

/** Round-8 twelfth batch: balance and concentration audits — the
  * class-balance report every supervised dataset ships with, and
  * Herfindahl market concentration (the square-of-shares dual of
  * q286's Gini). Same arithmetic discipline: integer counts/cents,
  * one deterministic double op per term, decimal re-summation so the
  * totals are order-free. */
object Round8lQueries {

  def all: Seq[Q] = Seq(

    Q("q288_label_balance",
      // Class-balance audit over the embedding labels: class count,
      // min/max class sizes, the max/min imbalance ratio in ppm, and
      // the chi-square statistic against the uniform expectation
      // (per-class term (k*n - tot)^2/(k*tot): integer numerator, ONE
      // double division, decimal(28,12) re-sum). The first table a
      // supervised-training report prints; k is the bounded label
      // domain, so everything after the count agg is k rows.
      Some("""WITH c AS (SELECT CAST(label AS BIGINT) lbl, CAST(COUNT(*) AS BIGINT) n
             |           FROM embeddings GROUP BY 1),
             |t AS (SELECT CAST(SUM(n) AS BIGINT) tot, CAST(COUNT(*) AS BIGINT) k,
             |             CAST(MAX(n) AS BIGINT) mx, CAST(MIN(n) AS BIGINT) mn FROM c),
             |chi AS (SELECT CAST(SUM(CAST(CAST(k*n - tot AS DOUBLE)*CAST(k*n - tot AS DOUBLE)
             |                 /(CAST(k AS DOUBLE)*CAST(tot AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) chi2
             |        FROM c CROSS JOIN t)
             |SELECT t.k n_classes, t.tot n_rows, t.mn min_class, t.mx max_class,
             |       t.mx*1000000//t.mn imbalance_e6,
             |       ROUND(chi.chi2, 6) chi2_uniform
             |FROM t CROSS JOIN chi""".stripMargin),
      (s, d) => {
        val c = Tables.embeddings(s, d)
          .groupBy(col("label").cast("long").as("lbl"))
          .agg(count(lit(1)).cast("long").as("n"))
        val t = c.agg(sum("n").cast("long").as("tot"),
          count(lit(1)).cast("long").as("k"),
          max("n").cast("long").as("mx"), min("n").cast("long").as("mn"))
        val chi = c.crossJoin(broadcast(t))
          .select((((col("k") * col("n") - col("tot")).cast("double")
            * (col("k") * col("n") - col("tot")).cast("double"))
            / (col("k").cast("double") * col("tot").cast("double")))
            .cast("decimal(28,12)").as("term"))
          .agg(sum("term").cast("double").as("chi2"))
        broadcast(t).crossJoin(broadcast(chi))
          .select(col("k").as("n_classes"), col("tot").as("n_rows"),
            col("mn").as("min_class"), col("mx").as("max_class"),
            expr("mx*1000000 div mn").as("imbalance_e6"),
            round(col("chi2"), 6).as("chi2_uniform"))
      }),

    Q("q289_brand_hhi",
      // Herfindahl-Hirschman supplier concentration per brand: HHI =
      // sum of squared revenue shares (1/n = perfect competition, 1 =
      // monopoly) — the square-of-shares dual of q286's Gini, per
      // brand. Per-(brand, supplier) cents are exact; each share² is
      // one deterministic double product re-summed as decimal(28,14).
      // One join + two hash aggs; the totals broadcast back.
      Some("""WITH r AS (SELECT p.p_brand brand, l.l_suppkey sk,
             |        CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) AS BIGINT) cents
             |      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |      GROUP BY 1, 2),
             |t AS (SELECT brand, CAST(SUM(cents) AS BIGINT) tot,
             |             CAST(COUNT(*) AS BIGINT) n_sup FROM r GROUP BY brand),
             |h AS (SELECT r.brand, CAST(SUM(CAST(
             |        (CAST(r.cents AS DOUBLE)/CAST(t.tot AS DOUBLE))
             |        *(CAST(r.cents AS DOUBLE)/CAST(t.tot AS DOUBLE)) AS DECIMAL(28,14))) AS DOUBLE) hhi
             |      FROM r JOIN t ON r.brand = t.brand GROUP BY r.brand)
             |SELECT t.brand, t.n_sup, t.tot tot_cents, ROUND(h.hhi, 6) hhi
             |FROM t JOIN h ON t.brand = h.brand ORDER BY t.brand""".stripMargin),
      (s, d) => {
        val r = Tables.lineitem(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"), col("l_suppkey").as("sk"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .cast("long").as("cents"))
        val t = r.groupBy("brand")
          .agg(sum("cents").cast("long").as("tot"),
            count(lit(1)).cast("long").as("n_sup"))
        val h = r.join(broadcast(t.select(col("brand"), col("tot"))), "brand")
          .select(col("brand"),
            ((col("cents").cast("double") / col("tot").cast("double"))
              * (col("cents").cast("double") / col("tot").cast("double")))
              .cast("decimal(28,14)").as("term"))
          .groupBy("brand").agg(sum("term").cast("double").as("hhi"))
        t.join(h, "brand")
          .select(col("brand"), col("n_sup"), col("tot").as("tot_cents"),
            round(col("hhi"), 6).as("hhi"))
          .orderBy("brand")
      }),

    Q("q290_conversion_ladder",
      // Time-bound conversion ladder: of all signups, how many first-
      // purchased within 1 h / 24 h / 7 d / ever — the windowed funnel
      // q269's unbounded cohort view cannot give (a 7-day conversion
      // SLA reads off this table directly). Firsts are min-aggs, the
      // ladder is one conditional-sum pass, the rate an exact ppm floor.
      Some("""WITH su AS (SELECT user_id, MIN(ts) s_ts FROM events
             |           WHERE event_type = 'signup' GROUP BY 1),
             |pu AS (SELECT user_id, MIN(ts) p_ts FROM events
             |       WHERE event_type = 'purchase' GROUP BY 1),
             |j AS (SELECT su.user_id, (epoch_us(pu.p_ts) - epoch_us(su.s_ts))//1000000 lat_s
             |      FROM su LEFT JOIN pu ON su.user_id = pu.user_id AND pu.p_ts >= su.s_ts)
             |SELECT CAST(COUNT(*) AS BIGINT) n_signups,
             |  CAST(SUM(CASE WHEN lat_s <= 3600 THEN 1 ELSE 0 END) AS BIGINT) within_1h,
             |  CAST(SUM(CASE WHEN lat_s <= 86400 THEN 1 ELSE 0 END) AS BIGINT) within_24h,
             |  CAST(SUM(CASE WHEN lat_s <= 604800 THEN 1 ELSE 0 END) AS BIGINT) within_7d,
             |  CAST(SUM(CASE WHEN lat_s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) ever,
             |  CAST(SUM(CASE WHEN lat_s <= 604800 THEN 1 ELSE 0 END)*1000000//COUNT(*) AS BIGINT) rate_7d_e6
             |FROM j""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("s_ts"))
        val pu = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ts").as("p_ts"))
          .withColumnRenamed("user_id", "p_uid")
        su.join(pu, col("user_id") === col("p_uid") && col("p_ts") >= col("s_ts"),
            "left")
          .select(expr("(unix_micros(p_ts) - unix_micros(s_ts)) div 1000000")
            .as("lat_s"))
          .agg(count(lit(1)).cast("long").as("n_signups"),
            sum(when(col("lat_s") <= 3600, 1L).otherwise(0L)).cast("long").as("within_1h"),
            sum(when(col("lat_s") <= 86400, 1L).otherwise(0L)).cast("long").as("within_24h"),
            sum(when(col("lat_s") <= 604800, 1L).otherwise(0L)).cast("long").as("within_7d"),
            sum(when(col("lat_s").isNotNull, 1L).otherwise(0L)).cast("long").as("ever"))
          .select(col("n_signups"), col("within_1h"), col("within_24h"),
            col("within_7d"), col("ever"),
            expr("within_7d * 1000000 div n_signups").as("rate_7d_e6"))
      }),

    Q("q291_transition_baseline",
      // Majority-class next-event predictor accuracy per current type:
      // the always-predict-the-modal-successor baseline every sequence
      // model must beat, read exactly off q161's transition counts
      // (accuracy = modal count / total, ppm floor). High accuracy here
      // means the stream is near-deterministic and sequence modeling is
      // cheap; ~1/|types| means transitions are uninformative.
      Some("""WITH o AS (SELECT user_id, event_type e,
             |        LEAD(event_type) OVER (PARTITION BY user_id
             |                               ORDER BY ts, event_id) nx
             |      FROM events),
             |tr AS (SELECT e, nx, CAST(COUNT(*) AS BIGINT) n FROM o
             |       WHERE nx IS NOT NULL GROUP BY 1, 2),
             |best AS (SELECT e, MAX(n) bn, SUM(n) tn FROM tr GROUP BY e)
             |SELECT e AS event_type, CAST(best.tn AS BIGINT) n_transitions,
             |       CAST(best.bn AS BIGINT) n_correct,
             |       CAST(best.bn*1000000//best.tn AS BIGINT) accuracy_e6
             |FROM best ORDER BY event_type""".stripMargin),
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val tr = Tables.events(s, d)
          .select(col("event_type").as("e"),
            lead(col("event_type"), 1).over(w).as("nx"))
          .filter(col("nx").isNotNull)
          .groupBy("e", "nx").agg(count(lit(1)).cast("long").as("n"))
        tr.groupBy("e")
          .agg(max("n").as("bn"), sum("n").as("tn"))
          .select(col("e").as("event_type"), col("tn").cast("long").as("n_transitions"),
            col("bn").cast("long").as("n_correct"),
            expr("bn * 1000000 div tn").as("accuracy_e6"))
          .orderBy("event_type")
      })
  )
}
