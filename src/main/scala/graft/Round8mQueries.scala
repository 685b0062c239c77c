package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.{GroupMedian, GroupPrefix}
import graft.sources.Tables

/** Round-8 thirteenth batch: the nonparametric-statistics tier — a
  * pairwise-difference robust scale (the Qn-family companion to q254's
  * MAD), the Mann-Whitney U test with exact midrank ties, and Kendall
  * tau-a rank correlation (the robust companion to q251's Pearson).
  * The two pairwise members run on the md5-priority consistent sample
  * (constant O(k²) cost at any corpus scale — the q281 pattern); the
  * U statistic is computed from value-domain counts with GroupPrefix,
  * doubled so midrank halves stay integer. */
object Round8mQueries {

  def all: Seq[Q] = Seq(

    Q("q292_pairwise_diff_scale",
      // Robust scale from pairwise differences: the median |x_i - x_j|
      // over all pairs of the consistent 200-sample (the Qn/Sn family's
      // 50%-breakdown-free core, robust where q254's MAD is and more
      // efficient at the Gaussian). Integer cents differences; the
      // median runs through GroupMedian's prefix scan.
      Some("""WITH smp AS (SELECT event_id, CAST(ROUND(value*100) AS BIGINT) c
             |             FROM events WHERE event_type = 'purchase'
             |             ORDER BY MD5(CAST(event_id AS VARCHAR)), event_id LIMIT 200),
             |p AS (SELECT a.event_id ia, b.event_id ib, ABS(a.c - b.c) d
             |      FROM smp a JOIN smp b ON a.event_id < b.event_id),
             |r AS (SELECT d, ia, ib,
             |        SUM(1) OVER (ORDER BY d, ia, ib ROWS UNBOUNDED PRECEDING) cum,
             |        COUNT(*) OVER () tot FROM p)
             |SELECT CAST(MAX(tot) AS BIGINT) n_pairs,
             |       CAST(MIN(CASE WHEN 2*cum >= tot THEN d END) AS BIGINT) qn_cents
             |FROM r""".stripMargin),
      (s, d) => {
        val smp = Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("event_id"), round(col("value") * 100).cast("long").as("c"))
          .orderBy(md5(col("event_id").cast("string")), col("event_id"))
          .limit(200)
        val p = smp.as("a")
          .join(broadcast(smp.as("b")), col("a.event_id") < col("b.event_id"))
          .select(col("a.event_id").as("ia"), col("b.event_id").as("ib"),
            abs(col("a.c") - col("b.c")).as("dd"),
            lit("all").as("g"), lit(1L).as("one"))
        // n_pairs = the median scan's own weight total (weights are 1/pair)
        // — the second pass over the pairwise join it used to pay is gone
        GroupMedian.weightedLowerQuantile(p, "g", "dd", "one",
            Seq(col("ia"), col("ib")), "qn_cents", 1, 2, keepTotal = true)
          .select(col("_gm_tot").cast("long").as("n_pairs"), col("qn_cents"))
      }),

    Q("q293_mann_whitney_u",
      // Mann-Whitney U between the even- and odd-numbered sources'
      // length distributions, midrank ties EXACT: counts aggregate per
      // DISTINCT value (domain-bounded), the rank prefix comes from
      // GroupPrefix over the value order, and U rides DOUBLED
      // (u_x2 = 2R - n(n+1)) so midrank halves never hit a float. The
      // location-shift test beside q253's KS shape test; the u0+u1 =
      // 2*n0*n1 identity is structural.
      Some("""WITH g AS (SELECT n_chars v, CAST(SUBSTR(source, 4) AS INT) % 2 grp
             |           FROM documents),
             |c AS (SELECT v, CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) c0,
             |             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) c1
             |      FROM g GROUP BY v),
             |w AS (SELECT v, c0, c1,
             |        COALESCE(SUM(c0+c1) OVER (ORDER BY v
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) pre,
             |        c0 + c1 AS tierows FROM c),
             |t AS (SELECT SUM(c0) n0, SUM(c1) n1 FROM c),
             |s AS (SELECT SUM(c0*(2*w.pre + w.tierows + 1)) rs2_0 FROM w)
             |SELECT CAST(t.n0 AS BIGINT) n0, CAST(t.n1 AS BIGINT) n1,
             |       CAST(s.rs2_0 - t.n0*(t.n0+1) AS BIGINT) u0_x2,
             |       CAST(2*t.n0*t.n1 - (s.rs2_0 - t.n0*(t.n0+1)) AS BIGINT) u1_x2
             |FROM t CROSS JOIN s""".stripMargin),
      (s, d) => {
        val c = Tables.documents(s, d)
          .select(col("n_chars").as("v"),
            (substring(col("source"), 4, 10).cast("int") % 2).as("grp"))
          .groupBy("v").agg(
            sum(when(col("grp") === 0, 1L).otherwise(0L)).as("c0"),
            sum(when(col("grp") === 1, 1L).otherwise(0L)).as("c1"))
          .withColumn("both", col("c0") + col("c1"))
        val t = c.agg(sum("c0").as("n0"), sum("c1").as("n1"))
        val w = GroupPrefix.exclusiveRunningSum(
          c.withColumn("g", lit("all")), "g", Seq(col("v")), "both", "pre")
        val rs = w.agg(sum(col("c0") * (col("pre") * 2 + col("both") + 1))
          .as("rs2_0"))
        broadcast(t).crossJoin(broadcast(rs))
          .select(col("n0").cast("long").as("n0"), col("n1").cast("long").as("n1"),
            (col("rs2_0") - col("n0") * (col("n0") + 1)).cast("long").as("u0_x2"),
            (col("n0") * col("n1") * 2
              - (col("rs2_0") - col("n0") * (col("n0") + 1))).cast("long").as("u1_x2"))
      }),

    Q("q294_kendall_tau",
      // Kendall tau-a between arrival order and value on the consistent
      // 200-sample: concordant minus discordant pairs over all C(k,2),
      // in ppm — the rank-based trend test beside q281's Theil-Sen
      // slope (same sample, so the two diagnostics are mutually
      // consistent by construction). All integers; ties count in
      // neither direction (tau-a semantics).
      Some("""WITH smp AS (SELECT event_id, epoch_us(ts) t, CAST(ROUND(value*100) AS BIGINT) c
             |             FROM events WHERE event_type = 'purchase'
             |             ORDER BY MD5(CAST(event_id AS VARCHAR)), event_id LIMIT 200),
             |p AS (SELECT CASE WHEN (a.t < b.t AND a.c < b.c) OR (a.t > b.t AND a.c > b.c)
             |               THEN 1 ELSE 0 END conc,
             |             CASE WHEN (a.t < b.t AND a.c > b.c) OR (a.t > b.t AND a.c < b.c)
             |               THEN 1 ELSE 0 END disc
             |      FROM smp a JOIN smp b ON a.event_id < b.event_id),
             |t AS (SELECT CAST(SUM(conc) AS BIGINT) nc, CAST(SUM(disc) AS BIGINT) nd,
             |             CAST(COUNT(*) AS BIGINT) np FROM p)
             |SELECT nc, nd, np, (nc - nd)*1000000//np tau_a_e6 FROM t""".stripMargin),
      (s, d) => {
        val smp = Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("event_id"), expr("unix_micros(ts)").as("t"),
            round(col("value") * 100).cast("long").as("c"))
          .orderBy(md5(col("event_id").cast("string")), col("event_id"))
          .limit(200)
        smp.as("a")
          .join(broadcast(smp.as("b")), col("a.event_id") < col("b.event_id"))
          .select(
            when((col("a.t") < col("b.t") && col("a.c") < col("b.c")) ||
              (col("a.t") > col("b.t") && col("a.c") > col("b.c")), 1L)
              .otherwise(0L).as("conc"),
            when((col("a.t") < col("b.t") && col("a.c") > col("b.c")) ||
              (col("a.t") > col("b.t") && col("a.c") < col("b.c")), 1L)
              .otherwise(0L).as("disc"))
          .agg(sum("conc").cast("long").as("nc"), sum("disc").cast("long").as("nd"),
            count(lit(1)).cast("long").as("np"))
          .select(col("nc"), col("nd"), col("np"),
            expr("(nc - nd) * 1000000 div np").as("tau_a_e6"))
      })
  )
}
